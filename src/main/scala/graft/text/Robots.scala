package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt politeness evaluation — the crawl frontier's gate: before
  * a URL is fetched (or, in a recrawl/audit pipeline, KEPT), its path
  * is matched against the host's robots rules. RFC 9309 core
  * semantics, deterministic subset:
  *
  *  - `Allow:` / `Disallow:` lines with LITERAL path prefixes (the
  *    `*`/`$` wildcard extension is out of scope — documented, not
  *    silently mis-handled: wildcard rules are dropped at parse);
  *  - longest-prefix-match wins; on equal length `Allow` wins (RFC
  *    9309 §2.2.2's most-specific rule, encoded as an integer rank
  *    `2·len + isAllow` so the cross-engine compare never needs a
  *    tie-break convention);
  *  - no matching rule → allowed (the RFC default);
  *  - a single `User-agent: *` group per file (the common shape for a
  *    corpus-wide audit, where per-agent targeting is noise).
  *
  * Rules tables are host-keyed and SMALL relative to the URL set (one
  * robots.txt per host), so evaluation is a broadcast join + one
  * aggregation — at 100 TB the URL side never moves for the join, and
  * the only shuffle is the per-URL verdict fold. Pure expression
  * chain, no UDF. No robots surface exists in the reference (qvarnmr
  * consumes a REST API, not a crawl). */
object Robots {

  /** Parse per-host robots.txt TEXT into a rules table
    * `(host, prefix, allow, plen)`: split lines, extract
    * `Allow|Disallow` directives case-insensitively, keep literal
    * prefixes (wildcard rules and empty prefixes dropped). */
  def parseRules(robots: DataFrame, hostCol: String = "host",
                 txtCol: String = "robots_txt"): DataFrame = {
    val line = trim(col("__line"))
    robots
      .select(col(hostCol).as("host"),
        explode(split(col(txtCol), "\n")).as("__line"))
      .select(col("host"),
        lower(regexp_extract(line, "(?i)^(allow|disallow)\\s*:", 1))
          .as("__directive"),
        regexp_extract(line, "(?i)^(?:allow|disallow)\\s*:\\s*(\\S+)", 1)
          .as("prefix"))
      .filter(col("__directive") =!= "" && col("prefix") =!= "" &&
        !col("prefix").contains("*") && !col("prefix").contains("$"))
      .select(col("host"), col("prefix"),
        (col("__directive") === "allow").as("allow"),
        length(col("prefix")).as("plen"))
  }

  /** Evaluate each URL row against the rules: broadcast-join candidate
    * rules by host + prefix match, fold to the highest-rank rule per
    * URL row (longest match, allow wins ties), default allowed.
    * Returns the input columns plus `allowed` and `matched_prefix`
    * (null when no rule matched). */
  def evaluate(urls: DataFrame, rules: DataFrame,
               urlCol: String = "url"): DataFrame = {
    val inCols = urls.columns.toSeq
    val host = regexp_extract(col(urlCol), "^https?://([^/?]*)", 1)
    val path0 = regexp_replace(col(urlCol), "^https?://[^/?]*", "")
    val path = when(path0 === "", "/").otherwise(path0)
    val withKey = urls
      .withColumn("__host", host)
      .withColumn("__path", path)
    val joined = withKey.join(broadcast(rules),
      withKey("__host") === rules("host") &&
        withKey("__path").startsWith(rules("prefix")), "left")
    // RFC 9309 most-specific rule as one integer: longest prefix wins,
    // Allow beats Disallow at equal length
    val rank = col("plen") * lit(2) +
      when(col("allow"), lit(1)).otherwise(lit(0))
    joined
      .groupBy(inCols.map(col): _*)
      .agg(max_by(struct(col("allow"), col("prefix")), rank).as("__best"))
      .select(inCols.map(col) ++ Seq(
        coalesce(col("__best.allow"), lit(true)).as("allowed"),
        col("__best.prefix").as("matched_prefix")): _*)
  }

  /** One-call convenience: parse + evaluate. */
  def filterUrls(urls: DataFrame, robots: DataFrame,
                 urlCol: String = "url"): DataFrame =
    evaluate(urls, parseRules(robots), urlCol)
}
