package graft.sources

import org.apache.spark.sql.types._

/** §1.1 — the reference's resource-type prototype system as Spark schemas.
  *
  * Qvarn declares each resource type as a versioned JSON prototype (reference
  * testing/realqvarn.py:17-454; schema walker vendor qvarn/schema.py:23-115):
  * scalar string/int/bool, list of strings, list of dicts (max 2 levels,
  * where the inner dict may hold lists of strings), blob subresources and
  * dict subpaths. Qvarn flattens these into child tables; Spark-first we keep
  * them NESTED — `ArrayType(StringType)`, `ArrayType(StructType)` — and let
  * `exists()` / `explode()` express child-table semantics without joins.
  *
  * A prototype is modeled as a small ADT (JSON parsing is the caller's
  * concern; the reference configures prototypes in code too).
  */
object Prototypes {

  sealed trait Proto
  case object PStr extends Proto // ''
  case object PInt extends Proto // 0
  case object PBool extends Proto // false
  case object PStrList extends Proto // ['']
  final case class PDictList(fields: Map[String, Proto]) extends Proto // [{...}]
  final case class PDict(fields: Map[String, Proto]) extends Proto // subpath side-doc
  case object PBlob extends Proto // 'blob' subresource

  final case class ResourceVersion(version: String, prototype: Map[String, Proto])
  final case class ResourceType(name: String, versions: Seq[ResourceVersion]) {
    require(versions.nonEmpty, s"resource type '$name' needs at least one version")
    /** The current (last-listed) prototype version, like the reference. */
    def current: ResourceVersion = versions.last
    def schema: StructType = Prototypes.schema(current.prototype)
    def schemaOf(version: String): StructType =
      versions.find(_.version == version)
        .map(v => Prototypes.schema(v.prototype))
        .getOrElse(throw new NoSuchElementException(s"$name has no version '$version'"))
  }

  /** System fields every resource carries (id/type/revision — §1.1). */
  val systemFields: Seq[StructField] = Seq(
    StructField("id", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("revision", StringType, nullable = true))

  def schema(prototype: Map[String, Proto]): StructType =
    StructType(systemFields ++
      prototype.toSeq.sortBy(_._1).map { case (name, p) => field(name, p) })

  private def field(name: String, p: Proto): StructField = p match {
    case PStr => StructField(name, StringType, nullable = true)
    case PInt => StructField(name, LongType, nullable = true)
    case PBool => StructField(name, BooleanType, nullable = true)
    case PStrList => StructField(name, ArrayType(StringType, containsNull = false), nullable = true)
    case PDictList(fs) =>
      StructField(name,
        ArrayType(StructType(fs.toSeq.sortBy(_._1).map { case (n, q) => field(n, q) }),
          containsNull = false), nullable = true)
    case PDict(fs) =>
      StructField(name,
        StructType(fs.toSeq.sortBy(_._1).map { case (n, q) => field(n, q) }), nullable = true)
    case PBlob => StructField(name, BinaryType, nullable = true)
  }
}
