package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** Minimal INI config reader — the worker's `read_config`
  * (reference config.py:9-42 wraps python's RawConfigParser; the subset
  * the reference's own config files use is `[section]` headers, `key =
  * value` pairs, and `;`/`#` comment lines, which is exactly what this
  * parses). Keys are case-preserved; values keep internal whitespace;
  * duplicate keys take the last value, like RawConfigParser. A `;` or `#`
  * preceded by whitespace starts an inline comment and is stripped from
  * the value (RawConfigParser's classic inline-comment rule), so
  * `master = local[32]  ; default local[*]` reads as `local[32]`.
  */
final case class IniConfig(sections: Map[String, Map[String, String]]) {
  def section(name: String): Map[String, String] =
    sections.getOrElse(name, Map.empty)
  def get(section: String, key: String): Option[String] =
    sections.get(section).flatMap(_.get(key))
  def getOrElse(section: String, key: String, default: => String): String =
    get(section, key).getOrElse(default)
  /** The reference's `config.getfloat(..., fallback=)` shape. */
  def getLongOrElse(section: String, key: String, default: => Long): Long =
    get(section, key).map(_.trim.toLong).getOrElse(default)
  def getBooleanOrElse(section: String, key: String, default: => Boolean): Boolean =
    get(section, key).map(_.trim.toBoolean).getOrElse(default)
}

object IniConfig {
  def parse(text: String): IniConfig = {
    val sections = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    var current: Option[String] = None
    for ((raw, ln) <- text.linesIterator.zipWithIndex) {
      val line = raw.trim
      if (line.isEmpty || line.startsWith(";") || line.startsWith("#")) ()
      else if (line.startsWith("[") && line.endsWith("]")) {
        val name = line.substring(1, line.length - 1).trim
        current = Some(name)
        sections.getOrElseUpdate(name,
          scala.collection.mutable.LinkedHashMap.empty)
      } else line.indexOf('=') match {
        case -1 =>
          throw new IllegalArgumentException(
            s"line ${ln + 1}: expected 'key = value' or '[section]', got: $line")
        case i =>
          val sec = current.getOrElse(throw new IllegalArgumentException(
            s"line ${ln + 1}: key/value before any [section]"))
          // strip inline comments: `;`/`#` after whitespace ends the value
          sections(sec).update(line.substring(0, i).trim,
            line.substring(i + 1).replaceAll("""\s+[;#].*$""", "").trim)
      }
    }
    IniConfig(sections.view.mapValues(_.toMap).toMap)
  }

  def read(path: Path): IniConfig =
    parse(new String(Files.readAllBytes(path), StandardCharsets.UTF_8))
}

/** The worker's "python dotted path to handlers config"
  * (scripts/worker.py:28-30, handlers.py `import_handlers_config`): a
  * fully-qualified Scala `object` implementing this trait, resolved by
  * reflection — the JVM analogue of importing a module-level config. */
trait PipelineProvider {
  def pipeline: Pipeline
}

object PipelineProvider {
  /** Resolve `com.example.MyPipeline` to its singleton instance. */
  def load(fqcn: String): PipelineProvider = {
    val cls =
      try Class.forName(fqcn + "$")
      catch {
        case _: ClassNotFoundException =>
          throw new IllegalArgumentException(
            s"no such pipeline object: $fqcn (need a top-level Scala object" +
              " extending graft.core.PipelineProvider)")
      }
    cls.getField("MODULE$").get(null) match {
      case p: PipelineProvider => p
      case other => throw new IllegalArgumentException(
        s"$fqcn is not a graft.core.PipelineProvider (got ${other.getClass})")
    }
  }
}
