package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, struct}

/** The Qvarn search STRING front ends — the reference's entire user-facing
  * query surface — parsed onto the [[QvarnSearch]] combinators.
  *
  * Two grammars exist in the reference:
  *
  *   - the server's URL path form `GET /<type>/search/<criteria...>`
  *     (vendor qvarn-0.82/qvarn/list_resource.py:196-262): slash-separated
  *     tokens where the eight operators consume `(op, field, value)`
  *     triples, `show`/`sort`/`limit`/`offset` consume pairs, and
  *     `show_all` stands alone. Values are percent-encoded by the client
  *     (qvarn-utils qvarnclient/qvarn_client.py:243-246, `quote(safe='')`)
  *     precisely so a slash inside a value survives the split — which is
  *     why the server parses the RAW request URI and unquotes each token
  *     AFTER splitting, and so do we.
  *
  *   - the client's Django-style keyword form `field__op=value`
  *     (clients/qvarn.py:211-273): missing `__op` defaults to `exact`, a
  *     tuple value expands into one condition per element on the same
  *     field (all AND-ed, clients/qvarn.py:263-270), every value is
  *     stringified, and criteria are applied in sorted order.
  *
  * Result shape (list_resource.py:252-262 → read_only.py:270-299): with no
  * projection the search returns ids only; `show` returns the named fields
  * plus `id`; `show_all` returns whole resources.
  */
object QvarnUrl {

  final case class BadLimitValue(detail: String)
      extends RuntimeException(s"bad limit value: $detail")
  final case class BadOffsetValue(detail: String)
      extends RuntimeException(s"bad offset value: $detail")

  private val Operators = Set(
    "exact", "gt", "ge", "lt", "le", "ne", "startswith", "contains")

  /** The `/version` metadata resource (`get_version`,
    * clients/qvarn.py:144-146): one row in the exact nested shape the
    * vendored server serves from `GET /version` (qvarn-backend:30-39) —
    * `api.version` is the Qvarn API level this engine's query surface
    * mirrors; `implementation` names this library. */
  val ApiVersion = "0.82"
  val ImplementationName = "graft"
  val ImplementationVersion = "0.1.0"
  def getVersion(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.lit
    spark.range(1).select(
      struct(lit(ApiVersion).as("version")).as("api"),
      struct(lit(ImplementationName).as("name"),
        lit(ImplementationVersion).as("version")).as("implementation"))
  }

  /** Percent-decode one path token. Deliberately NOT `java.net.URLDecoder`:
    * the query-string convention decodes `+` as space, but the path
    * convention (python `urllib.parse.unquote`, used by the server at
    * list_resource.py:194) leaves `+` alone. */
  private[graft] def unquote(s: String): String = {
    if (!s.contains('%')) return s
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val out = new StringBuilder(s.length)
    val run = new java.io.ByteArrayOutputStream(8) // consecutive escape bytes = one UTF-8 run
    var i = 0
    def flushRun(): Unit = if (run.size() > 0) {
      out.append(new String(run.toByteArray, utf8)); run.reset()
    }
    while (i < s.length) {
      // a valid escape is '%' followed by two hex digits; malformed escapes
      // pass through literally, like python's unquote
      if (s.charAt(i) == '%' && i + 2 < s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        run.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else {
        flushRun()
        out.append(s.charAt(i))
        i += 1
      }
    }
    flushRun()
    out.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Parse a search URL (anything up to and including the first `/search/`
    * is ignored, so both a full resource path and a bare criteria string
    * work) into a ready-to-run [[QvarnSearch]] over `df`. Faithful to
    * list_resource.py:196-262 including its error taxonomy; the one
    * deviation is that a trailing `sort` with no field raises
    * [[QvarnSearch.BadSearchCondition]] instead of the reference's
    * unhandled IndexError. */
  def parse(df: DataFrame, url: String, idField: String = "id"): QvarnSearch = {
    val criteriaStr = {
      val ix = url.indexOf("/search/")
      if (ix >= 0) url.substring(ix + "/search/".length) else url.stripPrefix("/")
    }
    val criteria = criteriaStr.split("/", -1).toSeq.map(unquote)

    var q = QvarnSearch(df, idField)
    var showAll = false
    var showFields = Vector.empty[String]
    var sortFields = Vector.empty[String]
    var limit: Option[Int] = None
    var offset: Option[Int] = None

    def intArg(tok: String, mk: String => RuntimeException): Int = {
      val n = try tok.toInt catch { case e: NumberFormatException => throw mk(e.getMessage) }
      if (n < 0) throw mk("should be positive integer")
      n
    }

    var i = 0
    while (i < criteria.length) {
      val part = criteria(i)
      if (Operators.contains(part)) {
        if (i + 2 >= criteria.length)
          throw QvarnSearch.BadSearchCondition(s"operator '$part' needs a field and a value")
        q = q.urlCond(part, criteria(i + 1), criteria(i + 2))
        i += 3
      } else if (part == "show_all") {
        showAll = true
        i += 1
      } else if (part == "show") {
        if (i + 1 >= criteria.length)
          throw QvarnSearch.BadSearchCondition("show needs a field")
        showFields :+= criteria(i + 1)
        i += 2
      } else if (part == "sort") {
        if (i + 1 >= criteria.length)
          throw QvarnSearch.BadSearchCondition("sort needs a field")
        sortFields :+= criteria(i + 1)
        i += 2
      } else if (part == "limit") {
        if (i + 1 >= criteria.length) throw BadLimitValue("missing value")
        limit = Some(intArg(criteria(i + 1), BadLimitValue))
        i += 2
      } else if (part == "offset") {
        if (i + 1 >= criteria.length) throw BadOffsetValue("missing value")
        offset = Some(intArg(criteria(i + 1), BadOffsetValue))
        i += 2
      } else {
        throw QvarnSearch.BadSearchCondition(s"unrecognized token '$part'")
      }
    }

    if ((limit.nonEmpty || offset.nonEmpty) && sortFields.isEmpty)
      throw QvarnSearch.LimitWithoutSortError()

    if (sortFields.nonEmpty) q = q.sort(sortFields: _*)
    limit.foreach(n => q = q.limit(n))
    offset.foreach(n => q = q.offset(n))
    if (showAll) q.showAll
    else q.show(showFields: _*) // no fields → ids only, the server default
  }

  /** Parse-and-run shorthand for [[parse]]. */
  def urlSearch(df: DataFrame, url: String, idField: String = "id"): DataFrame =
    parse(df, url, idField).result()

  /** Point blob GET — `GET /<type>/<id>/<blob-subresource>`
    * (clients/qvarn.py:120-122 `get_blob`): the last two path segments are
    * the document id and the blob column name; the id compares through the
    * same typed URL-value coercion as every other URL condition. Returns
    * the one-row `(id, blob_hex)` frame ([[QvarnSearch.blob]]). */
  def getBlob(df: DataFrame, url: String, idField: String = "id"): DataFrame = {
    val parts = url.split("/").filter(_.nonEmpty).toSeq.map(unquote)
    if (parts.length < 2)
      throw QvarnSearch.BadSearchCondition(
        s"blob path needs /<type>/<id>/<subresource>, got '$url'")
    QvarnSearch(df, idField)
      .urlCond("exact", idField, parts(parts.length - 2))
      .blob(parts.last)
  }

  /** Batch subresource fan-out read — `get_multiple_subresources(resource,
    * subresource, ids)` (clients/qvarn.py:139-142): the client's N
    * parallel point GETs of `/<type>/<id>/<subresource>`, batched as ONE
    * id-pruned scan + ONE broadcastable stitch join instead of N round
    * trips. Ids absent from the parent return no row (the per-id 404);
    * parents without a side-document carry a NULL struct — the same
    * conventions as [[QvarnSearch.withSubresource]], whose struct
    * construction this reuses. Returns `(idField, <subresource>)`. */
  def multigetSubresource(df: DataFrame, side: DataFrame, subresource: String,
                          ids: Seq[String], idField: String = "id",
                          sideIdCol: String = "id"): DataFrame = {
    val parents = df.filter(col(idField).cast("string").isin(ids: _*))
      .select(col(idField))
    val payload = struct(side.columns.toSeq.filterNot(_ == sideIdCol).map(col): _*)
    parents.join(
        side.select(col(sideIdCol).as("__sub_id"), payload.as(subresource)),
        col(idField) === col("__sub_id"), "left")
      .drop("__sub_id")
  }

  /** The client's Django-style keyword search (clients/qvarn.py:211-273):
    * `"p_size__ge" -> 10`, `"p_brand" -> "Brand#13"` (bare key = exact),
    * `"p_name__contains" -> Seq("a", "b")` (multi-value AND). Values are
    * stringified like the client's `str(value)` and criteria applied in
    * sorted order; projection defaults to ids-only unless `show`/`showAll`
    * is given. */
  def paramSearch(
      df: DataFrame,
      query: Seq[(String, Any)],
      show: Seq[String] = Nil,
      showAll: Boolean = false,
      idField: String = "id"): QvarnSearch = {

    val criteria: Seq[(String, String, String)] = query.flatMap { case (key, value) =>
      val (field, op) = key.split("__", -1) match {
        case Array(f) => (f, "exact")
        case Array(f, m) => (f, m)
        case _ => throw QvarnSearch.BadSearchCondition(s"invalid search query '$key'")
      }
      if (!Operators.contains(op))
        throw QvarnSearch.BadSearchCondition(s"unknown operator '$op' in '$key'")
      val values = value match {
        case vs: Iterable[_] => vs.toSeq
        case vs: Array[_] => vs.toSeq
        case v => Seq(v)
      }
      values.map(v => (op, field, String.valueOf(v)))
    }

    var q = QvarnSearch(df, idField)
    for ((op, field, v) <- criteria.sorted)
      q = q.urlCond(op, field, v)
    if (showAll) q.showAll
    else q.show(show: _*)
  }
}
