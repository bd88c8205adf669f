package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-tree hygiene pin: no tracked Scala file may contain a raw NUL
  * byte. A single embedded `\0` string literal makes the file binary to
  * git/grep — diffs stop rendering and text tooling skips the file.
  * This class of defect has shipped twice (three files fixed in round
  * 11, reintroduced by a gzip-FNAME fixture in round 12's new spec), so
  * the invariant is now a test: write binary fixtures as explicit byte
  * appends (`"name".getBytes :+ 0.toByte`), never as raw literals. */
class SourceHygieneSpec extends AnyFunSuite {

  test("no Scala source file contains a raw NUL byte") {
    val root = java.nio.file.Paths.get("src")
    assert(java.nio.file.Files.isDirectory(root), s"run from repo root: $root")
    val w = java.nio.file.Files.walk(root)
    val offenders =
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala
          .filter(p => p.toString.endsWith(".scala"))
          .filter(p => java.nio.file.Files.readAllBytes(p).contains(0.toByte))
          .map(_.toString).toList
      } finally w.close()
    assert(offenders.isEmpty,
      s"raw NUL byte in: ${offenders.mkString(", ")} — use an explicit " +
        "byte append instead of a \\0 string literal")
  }
}
