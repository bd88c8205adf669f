package graft.incr

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{SaveMode, SparkSession}

/** A3/A4 made durable — the derived-table sink.
  *
  * The reference upserts/deletes rows one at a time through the Qvarn REST
  * store (clients/qvarn.py:148-209); the Spark-native equivalent is the
  * `foreachBatch` rewrite this store performs: after a batch commits, every
  * derived table is written whole to parquet under a new batch directory and
  * a manifest pointer is swapped atomically — so a crash mid-write leaves
  * the previous consistent snapshot in place (the same crash-safety the
  * reference gets from deferring tombstone purges, processor.py:141-148).
  *
  * Layout: `<root>/<target>/b<batchId>/…parquet`, `<root>/_manifest` holding
  * the committed batchId. On a cluster the same protocol runs against any
  * object store; swap the local rename for a conditional put.
  */
final class ParquetStateStore(root: String) {
  private val manifest = Paths.get(root, "_manifest")

  /** Persist all tables of `state` as batch `batchId`, then commit. */
  def save(state: MrState, batchId: Long): Unit = {
    state.tables.foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(s"$root/$name/b$batchId")
    }
    val tmp = manifest.resolveSibling("_manifest.tmp")
    Files.createDirectories(Paths.get(root))
    val names = state.tables.keys.toSeq.sorted.mkString(",")
    Files.write(tmp, s"$batchId\n$names".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifest, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Last committed batch id, if any. */
  def committedBatch: Option[Long] =
    if (!Files.exists(manifest)) None
    else new String(Files.readAllBytes(manifest), StandardCharsets.UTF_8)
      .split('\n').headOption.flatMap(_.toLongOption)

  /** Reload the last committed snapshot (crash/restart recovery). */
  def load(spark: SparkSession): Option[(MrState, Long)] =
    if (!Files.exists(manifest)) None
    else {
      val lines = new String(Files.readAllBytes(manifest), StandardCharsets.UTF_8).split('\n')
      for {
        b <- lines.headOption.flatMap(_.toLongOption)
        names <- lines.lift(1).map(_.split(',').filter(_.nonEmpty).toSeq)
      } yield (MrState(names.map(n => n -> spark.read.parquet(s"$root/$n/b$b")).toMap), b)
    }

  /** Drop batch directories older than the committed one (safe GC). */
  def vacuum(): Unit = committedBatch.foreach { keep =>
    val rootPath = Paths.get(root)
    if (Files.exists(rootPath)) {
      Files.list(rootPath).filter(Files.isDirectory(_)).forEach { tdir =>
        Files.list(tdir)
          .filter(d => d.getFileName.toString.startsWith("b")
            && d.getFileName.toString.stripPrefix("b").toLongOption.exists(_ < keep))
          .forEach { old =>
            Files.walk(old).sorted(java.util.Comparator.reverseOrder())
              .forEach(Files.deleteIfExists(_))
          }
      }
    }
  }
}
