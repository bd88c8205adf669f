package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** B1-B11 — the Qvarn search API as DataFrame combinators.
  *
  * Semantics from the reference's server executor (vendor
  * qvarn-0.82/qvarn/read_only.py:74-268) and client builder
  * (qvarn-utils qvarnclient/qvarn_client.py:185-246):
  *
  *   - string `exact`/`ne`/ordered compares are case-insensitive — both
  *     sides lowercased (read_only.py:214-220);
  *   - a bare field name resolves to ANY column of that name anywhere in
  *     the document — top level, inside a struct, inside an array of
  *     structs, two levels deep — OR-ed together (read_only.py:205-224,
  *     the LEFT JOIN + DISTINCT over flattened child tables);
  *   - repeating a condition on the same field ANDs the conditions
  *     (clients/qvarn.py:222-238);
  *   - `limit`/`offset` require a sort (LimitWithoutSortError,
  *     list_resource.py:236-256); sorting on a list field sorts by its
  *     first element (read_only.py:226-260, `list_pos = 0`).
  *
  * Spark-first: instead of Qvarn's flatten-into-child-tables + LEFT JOIN +
  * SELECT DISTINCT plan, nested arrays stay nested and field resolution
  * compiles to `exists(arrayCol, x => pred)` — no join, no dedup, fully
  * codegen'd, and top-level predicates still push down to parquet.
  */
final case class QvarnSearch(
    private val df: DataFrame,
    private val conds: Seq[Column] = Nil,
    private val sortFields: Seq[String] = Nil,
    private val limitN: Option[Int] = None,
    private val offsetN: Int = 0,
    private val showFields: Option[Seq[String]] = None, // None = show_all
    private val idField: String = "id",
    private val subs: Seq[(String, DataFrame, String)] = Nil) {

  // ---- B1-B5 predicates -------------------------------------------------

  def exact(field: String, value: Any): QvarnSearch = cond(field, ciEq(value))
  def notEqual(field: String, value: Any): QvarnSearch = cond(field, c => !ciEq(value)(c))
  def gt(field: String, value: Any): QvarnSearch = cond(field, ciCmp(value, _ > _))
  def ge(field: String, value: Any): QvarnSearch = cond(field, ciCmp(value, _ >= _))
  def lt(field: String, value: Any): QvarnSearch = cond(field, ciCmp(value, _ < _))
  def le(field: String, value: Any): QvarnSearch = cond(field, ciCmp(value, _ <= _))
  def contains(field: String, value: String): QvarnSearch =
    cond(field, c => lower(c.cast("string")).contains(value.toLowerCase))
  def startswith(field: String, value: String): QvarnSearch =
    cond(field, c => lower(c.cast("string")).startsWith(value.toLowerCase))

  // ---- B8-B10 shaping ---------------------------------------------------

  /** B8: projection — named fields only (`/show/f`). */
  def show(fields: String*): QvarnSearch = copy(showFields = Some(fields))
  /** B8: whole resources (`/show_all`). */
  def showAll: QvarnSearch = copy(showFields = None)
  /** B9: order by field(s); list fields sort by first element. */
  def sort(fields: String*): QvarnSearch = copy(sortFields = sortFields ++ fields)
  /** B10: limit — only valid after sort. */
  def limit(n: Int): QvarnSearch = copy(limitN = Some(n))
  def offset(n: Int): QvarnSearch = copy(offsetN = n)

  /** Subresource stitching (clients/qvarn.py:111-118 `get(...,
    * subresources=)`; :294-311 `search_one(subresources=)`): attach the
    * subpath side-document table `side` so full-document results carry it
    * as ONE struct column named `name` (null where the parent has no
    * side-doc). The reference attaches subresources only when no `show`
    * projection is given — same here: a `show(...)` projection suppresses
    * stitching; `showAll` (the get() full-doc read) includes it.
    * The join runs AFTER filter/sort/limit, so only returned documents
    * fetch their side-docs — the per-id subresource GET, batched. */
  def withSubresource(name: String, side: DataFrame,
                      sideIdCol: String = "id"): QvarnSearch =
    copy(subs = subs :+ ((name, side, sideIdCol)))

  // ---- execution ---------------------------------------------------------

  def result(): DataFrame = {
    val filtered = conds.foldLeft(df)((d, c) => d.filter(c))
    if ((limitN.nonEmpty || offsetN > 0) && sortFields.isEmpty)
      throw QvarnSearch.LimitWithoutSortError()
    val sorted =
      if (sortFields.isEmpty) filtered
      else filtered.orderBy(sortFields.map(sortCol): _*)
    val windowed = (offsetN, limitN) match {
      case (0, None) => sorted
      case (0, Some(n)) => sorted.limit(n)
      case (off, None) => sorted.offset(off)
      case (off, Some(n)) => sorted.offset(off).limit(n)
    }
    val projected = showFields match {
      case None => windowed
      case Some(fs) =>
        val cols = (if (windowed.columns.contains(idField)) Seq(idField) else Nil) ++
          fs.filterNot(_ == idField)
        windowed.select(cols.map(col): _*)
    }
    // subresource stitching on full-document reads only (see
    // withSubresource): one left equi-join per named subpath, struct
    // column null where the parent has no side-document
    if (subs.isEmpty || showFields.nonEmpty) projected
    else subs.foldLeft(projected) { case (d, (nm, side, sid)) =>
      val payload = struct(side.columns.toSeq.filterNot(_ == sid).map(col): _*)
      d.join(side.select(col(sid).as("__sub_id"), payload.as(nm)),
        col(idField) === col("__sub_id"), "left").drop("__sub_id")
    }
  }

  /** Blob-file subresource read (clients/qvarn.py:120-122 `get_blob`; the
    * vendored server's file subresources, realqvarn.py:41-45): serve the
    * named blob column of the matched documents as `(id, blob_hex)` — the
    * per-id raw-bytes GET, batched over the search result like
    * [[withSubresource]] batches side-document GETs. Hex, not raw bytes:
    * the result is a frame, and hex is the engine-portable byte encoding.
    * A non-binary column serves its UTF-8 bytes (the reference stores
    * blobs opaquely under a client-declared content type either way). */
  def blob(name: String): DataFrame = {
    require(df.columns.contains(name), s"no blob column '$name' on the resource")
    val rows = copy(showFields = Some(Seq(name)), subs = Nil).result()
    val bytes = rows.schema(name).dataType match {
      case BinaryType => col(name)
      case _ => encode(col(name).cast("string"), "UTF-8")
    }
    rows.select(col(idField), hex(bytes).as("blob_hex"))
  }

  /** B11: exactly-one semantics (clients/qvarn.py:275-325). */
  def searchOne(): Row = {
    val rows = result().take(2)
    if (rows.isEmpty) throw QvarnSearch.NotFoundError()
    if (rows.length > 1) throw QvarnSearch.MultipleFoundError()
    rows.head
  }

  /** B11 with the client's `default=` shape: None instead of NotFound;
    * several matches still raise (clients/qvarn.py:298-304). */
  def searchOneOption(): Option[Row] = {
    val rows = result().take(2)
    if (rows.length > 1) throw QvarnSearch.MultipleFoundError()
    rows.headOption
  }

  /** URL-surface condition (vendor read_only.py:186-222, 262-268): the value
    * arrives as a string; the server lowercases it unconditionally
    * (`_cast_value`) and lowercases the COLUMN only when it is string-typed,
    * so string columns compare case-insensitively while typed columns get the
    * literal cast by the database (numeric compare). `'true'/'false'` coerce
    * to booleans. The cast-of-literal constant-folds under Catalyst, so a
    * `p_size >= '10'` URL condition still pushes down as `p_size >= 10`. */
  def urlCond(op: String, field: String, value: String): QvarnSearch = {
    val v = value.toLowerCase
    def cmp(f: (Column, Column) => Column): (Column, DataType) => Column = {
      case (c, StringType) => f(lower(c), lit(v))
      case (c, BooleanType) if v == "true" || v == "false" => f(c, lit(v.toBoolean))
      // try_cast, not cast: a value that doesn't parse as the column's type
      // must match nothing (NULL comparison), not throw ANSI
      // CAST_INVALID_INPUT at runtime — the URL surface accepts any string
      case (c, dt) => f(c, lit(v).try_cast(dt))
    }
    val pred: (Column, DataType) => Column = op match {
      case "exact" => cmp(_ === _)
      case "ne" => cmp(_ =!= _)
      case "gt" => cmp(_ > _)
      case "ge" => cmp(_ >= _)
      case "lt" => cmp(_ < _)
      case "le" => cmp(_ <= _)
      case "contains" => {
        case (c, StringType) => lower(c).contains(v)
        case (c, _) => c.cast("string").contains(v)
      }
      case "startswith" => {
        case (c, StringType) => lower(c).startsWith(v)
        case (c, _) => c.cast("string").startsWith(v)
      }
      case other => throw QvarnSearch.BadSearchCondition(s"unknown operator '$other'")
    }
    condTyped(field, pred)
  }

  // ---- internals ----------------------------------------------------------

  private def cond(field: String, pred: Column => Column): QvarnSearch =
    condTyped(field, (c, _) => pred(c))

  private def condTyped(field: String, pred: (Column, DataType) => Column): QvarnSearch = {
    val ps = QvarnSearch.fieldPredicates(df.schema, field, pred)
    require(ps.nonEmpty, s"field '$field' not found anywhere in schema")
    copy(conds = conds :+ ps.reduce(_ || _))
  }

  private def ciEq(value: Any): Column => Column = value match {
    case s: String => c => lower(c.cast("string")) === lit(s.toLowerCase)
    case b: Boolean => c => c === lit(b)
    case other => c => c === lit(other)
  }

  private def ciCmp(value: Any, op: (Column, Column) => Column): Column => Column = value match {
    case s: String => c => op(lower(c.cast("string")), lit(s.toLowerCase))
    case other => c => op(c, lit(other))
  }

  private def sortCol(field: String): Column =
    QvarnSearch.resolveSortField(df.schema, field)
      .getOrElse(throw new IllegalArgumentException(
        s"sort field '$field' not found anywhere in schema"))
}

object QvarnSearch {
  final case class LimitWithoutSortError()
      extends RuntimeException("limit/offset require sort (Qvarn LimitWithoutSortError)")
  final case class BadSearchCondition(detail: String)
      extends RuntimeException(s"bad search condition: $detail")
  final case class NotFoundError() extends RuntimeException("search_one: no match")
  final case class MultipleFoundError() extends RuntimeException("search_one: multiple matches")

  def apply(df: DataFrame): QvarnSearch = new QvarnSearch(df)
  def apply(df: DataFrame, idField: String): QvarnSearch =
    new QvarnSearch(df, idField = idField)

  /** B6: resolve a bare field name to every column of that name in the
    * schema — top level, struct subpaths, arrays of structs (≤2 levels like
    * Qvarn's flattened child tables) — returning one predicate per site.
    * The predicate receives the site's element type so callers can coerce
    * string-carried values per site (vendor read_only.py:211-213 applies
    * LOWER only to string columns). */
  private[graft] def fieldPredicates(
      schema: StructType, field: String, pred: (Column, DataType) => Column): Seq[Column] = {

    def hasMatch(dt: DataType, name: String): Boolean = dt match {
      case st: StructType =>
        st.fields.exists(f => f.name == field || hasMatch(f.dataType, f.name))
      case ArrayType(et, _) => name == field || hasMatch(et, name)
      case _ => name == field
    }

    def walk(get: String => Column, st: StructType): Seq[Column] =
      st.fields.toSeq.flatMap { f =>
        val c = get(f.name)
        f.dataType match {
          case s: StructType => walk(n => c.getField(n), s)
          case ArrayType(s: StructType, _) if hasMatch(s, f.name) =>
            Seq(exists(c, e =>
              walk(n => e.getField(n), s).reduceOption(_ || _).getOrElse(lit(false))))
          case ArrayType(et, _) if f.name == field => Seq(exists(c, e => pred(e, et)))
          case dt if f.name == field => Seq(pred(c, dt))
          case _ => Nil
        }
      }

    walk(n => col(n), schema)
  }

  /** B9: resolve a sort field like Qvarn's executor does — a child-table
    * (list) site sorts by its FIRST element only (`list_pos = 0`,
    * vendor read_only.py:226-260). First matching site wins, in schema
    * order: top level, struct subpath, array of scalars (first element),
    * array of structs (field of first struct). `try_element_at`: empty
    * list → null (ANSI `element_at` would throw). */
  private[graft] def resolveSortField(schema: StructType, field: String): Option[Column] = {
    def walk(get: String => Column, st: StructType): Option[Column] =
      st.fields.toSeq.flatMap { f =>
        val c = get(f.name)
        f.dataType match {
          case _ if f.name == field && !f.dataType.isInstanceOf[ArrayType] => Some(c)
          case ArrayType(_, _) if f.name == field => Some(try_element_at(c, lit(1)))
          case s: StructType => walk(n => c.getField(n), s)
          case ArrayType(s: StructType, _) if s.fields.exists(_.name == field) =>
            Some(try_element_at(c, lit(1)).getField(field))
          case _ => None
        }
      }.headOption
    walk(n => col(n), schema)
  }
}
