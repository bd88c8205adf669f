package graft

import graft.text.{Curation, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val docs = sf("documents")

  test("weightedSample matches a plain-Scala E-S reference and favors weight") {
    val got = Curation.weightedSample(docs, "doc_id",
      col("n_chars").cast("double"), k = 50)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.size == 50)
    // exact plain-Scala recomputation of the nano keys and top-k
    val rows = docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)].collect()
    val expected = rows.map { case (id, w) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-wsample:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = math.max(java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0, 1e-12)
      (id, w, math.round(math.log(u) / w.toDouble * 1e9))
    }.sortBy(t => (-t._3, t._1)).take(50).toSeq
    assert(got.sortBy(t => (-t._3, t._1)) == expected)
    // weighting does its job: the sample skews long
    val sampleMeanW = got.map(_._2).sum.toDouble / got.size
    val corpusMeanW = rows.map(_._2).sum.toDouble / rows.length
    assert(sampleMeanW > corpusMeanW)
    // stable under repartitioning
    val again = Curation.weightedSample(docs.repartition(9), "doc_id",
      col("n_chars").cast("double"), k = 50).as[(Long, Long, Long)].collect().toSeq
    assert(again.toSet == got.toSet)
  }

  test("htmlExtract: subtree drops, tag strip, entity order, whitespace") {
    def clean(html: String): String =
      Seq((1L, html)).toDF("id", "h")
        .select(TextFunctions.htmlExtract(col("h")).as("c"))
        .head().getString(0)
    // script/style subtrees vanish WHOLESALE — incl. a raw '<' inside
    // the script that a tag-only strip would turn into a runaway tag
    assert(clean("<html><script>if (1 < 2) { x(); }</script>" +
      "<style>p { color: red }</style><p>Body  text</p></html>") ==
      "Body text")
    // entities decode with &amp; LAST: '&amp;lt;' is the ESCAPED string
    // '&lt;', not a '<'
    assert(clean("<p>&amp;lt; stays, &lt; decodes, &quot;q&quot; &#39;s&#39;</p>") ==
      "&lt; stays, < decodes, \"q\" 's'")
    // unknown entities pass through; whitespace (tabs/newlines) collapses
    assert(clean("<div>\n\ta &copy; b\r\n c</div>") == "a &copy; b c")
    // attributes with '>' in quotes are out of scope (documented RE2
    // simplification) — but ordinary attributed tags strip clean
    assert(clean("<a href=\"/x\" class='y'>link</a> tail") == "link tail")
  }

  test("htmlBlocks: boilerplate drops by length + link density, content stays") {
    def classify(html: String): (Int, Int, String) = {
      val r = Seq((1L, html)).toDF("id", "h")
        .select(TextFunctions.htmlBlocks(col("h")).as("bs"))
        .select(org.apache.spark.sql.functions.size(col("bs")).as("n"),
          org.apache.spark.sql.functions.size(
            org.apache.spark.sql.functions.filter(col("bs"),
              TextFunctions.isContentBlock(_))).as("k"),
          TextFunctions.htmlContentText(col("bs")).as("c"))
        .head()
      (r.getInt(0), r.getInt(0) - r.getInt(1), r.getString(2))
    }
    val prose = "The quick brown fox jumps over the lazy dog near the river bank."
    // nav (link-dense, short), title (short), footer (short) drop;
    // the prose paragraph survives; script content never reaches a block
    val (n, boiler, content) = classify(
      "<html><head><title>T</title><script>var a = 1 < 2;</script></head>" +
        s"<body><nav>Home | <a href='/a'>About</a> | <a href='/b'>Blog</a></nav>" +
        s"<p>$prose</p><footer>&copy; co.</footer></body></html>")
    assert(n == 4 && boiler == 3 && content == prose)
    // a LONG link-farm block still drops: length alone is not content
    val farm = (1 to 12).map(i => s"<a href='/$i'>Item number $i here</a>")
      .mkString(" | ")
    val (n2, boiler2, content2) =
      classify(s"<div>$farm</div><p>$prose</p>")
    assert(n2 == 2 && boiler2 == 1 && content2 == prose)
    // uppercase block tags split too ((?i))
    val (n3, _, content3) = classify(s"<P>$prose</P><NAV>x | y</NAV>")
    assert(n3 == 2 && content3 == prose)
    // no content at all → empty string, counted honestly
    val (n4, boiler4, content4) = classify("<nav><a href='/'>Home</a></nav>")
    assert(n4 == 1 && boiler4 == 1 && content4 == "")
  }

  test("urlNormalize: case-fold, default ports, fragments, param sort/strip") {
    def norm(u: String): String =
      Seq(Tuple1(u)).toDF("u")
        .select(TextFunctions.urlNormalize(col("u")).as("n"))
        .head().getString(0)
    // the five spellings of one page collapse to one canonical form
    assert(Seq(
      "https://corpus.example/page/7",
      "HTTPS://Corpus.EXAMPLE:443/page/7",
      "https://corpus.example/page/7?utm_source=feed&utm_campaign=x",
      "https://corpus.example/page/7#frag-2")
      .map(norm).distinct == Seq("https://corpus.example/page/7"))
    // params sort; tracking params drop; non-default ports SURVIVE
    assert(norm("https://h/x?b=2&a=1&utm_medium=m") == "https://h/x?a=1&b=2")
    assert(norm("http://Host:8080/p?z=1") == "http://host:8080/p?z=1")
    // :80 is default only for http, :443 only for https
    assert(norm("http://h:80/p") == "http://h/p")
    assert(norm("https://h:80/p") == "https://h:80/p")
    // empty path canonicalizes to '/'; query on empty path keeps it
    assert(norm("https://Example.COM") == "https://example.com/")
    assert(norm("https://h?a=1") == "https://h/?a=1")
    // the PATH keeps its case (RFC 3986: only scheme/host case-fold)
    assert(norm("https://h/CaseSensitive/Path") == "https://h/CaseSensitive/Path")
    // no scheme → fragment-stripped passthrough, nothing invented
    assert(norm("example.com/x#f") == "example.com/x")
  }

  test("tokenEntropy matches a plain-Scala reference on random corpora") {
    val rnd = new scala.util.Random(11)
    val words = Vector("x", "y", "zz", "w")
    val corpus = (1 to 50).map { id =>
      (id.toLong, (0 until (1 + rnd.nextInt(30)))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }
    val got = Curation.tokenEntropy(corpus.toDF("doc_id", "text"), "text", "doc_id")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val expected = corpus.map { case (id, text) =>
      val counts = text.trim.toLowerCase.split("\\s+").toSeq
        .groupBy(identity).map(_._2.size)
      val n = counts.sum.toDouble
      val h = math.log(n) - counts.map(c => c * math.log(c.toDouble)).sum / n
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, counts.sum.toLong, counts.size.toLong, r6(counts.size / n), r6(h))
    }.sortBy(_._1)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3, s"$g vs $e")
      assert(math.abs(g._4 - e._4) < 2e-6 && math.abs(g._5 - e._5) < 2e-6,
        s"$g vs $e")
    }
    // a maximally repetitive doc has entropy 0 and ttr -> 0
    val rep = Curation.tokenEntropy(Seq((99L, "a a a a a a a a")).toDF("doc_id", "text"),
      "text", "doc_id").as[(Long, Long, Long, Double, Double)].head()
    assert(rep == ((99L, 8L, 1L, 0.125, 0.0)))
  }

  test("chunkTokens matches a plain-Scala reference on random corpora") {
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "bb", "ccc", "dd", "e")
    for (trial <- 1 to 3) {
      val size = 1 + rnd.nextInt(6)
      val stride = 1 + rnd.nextInt(6)
      val corpus = (1 to 40).map { id =>
        (id.toLong, (0 until (1 + rnd.nextInt(25)))
          .map(_ => words(rnd.nextInt(words.length))).mkString(" "))
      }
      val got = Curation.chunkTokens(corpus.toDF("doc_id", "text"),
          "text", "doc_id", size, stride)
        .as[(Long, Long, Long, String)].collect()
        .map { case (id, i, n, h) => (id, i) -> (n, h) }.toMap
      val expected = corpus.flatMap { case (id, text) =>
        val toks = text.trim.toLowerCase.split("\\s+").toSeq
        (0 until toks.length by stride).zipWithIndex.map { case (st, i) =>
          val chunk = toks.slice(st, math.min(st + size, toks.length))
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(chunk.mkString(" ").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          (id, i.toLong) -> (chunk.length.toLong, md)
        }
      }.toMap
      assert(got == expected, s"trial $trial size=$size stride=$stride")
    }
  }

  test("dsirWeights: feature count, target preference, and determinism") {
    val w = Curation.dsirWeights(docs, "text", "doc_id", col("lang") === "en")
    val got = w.as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // every document scored exactly once, n_feat = unigrams + bigrams
    val ntok = docs.select(col("doc_id"),
      size(TextFunctions.tokens(col("text"))).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got.map(_._1) == ntok.keys.toSeq.sorted)
    got.foreach { case (id, nFeat, _) =>
      assert(nFeat == 2 * ntok(id) - 1, s"doc $id") }
    // the signal does its one job: English docs (the target slice) score
    // higher on average than the rest
    val langOf = docs.select(col("doc_id"), col("lang"))
      .as[(Long, String)].collect().toMap
    val (en, rest) = got.partition(r => langOf(r._1) == "en")
    val avg = (xs: Seq[(Long, Long, Double)]) => xs.map(_._3).sum / xs.size
    assert(en.nonEmpty && rest.nonEmpty && avg(en) > avg(rest))
    // stable under repartitioning
    val again = Curation.dsirWeights(docs.repartition(17), "text", "doc_id",
      col("lang") === "en").as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(again == got)
  }

  test("lengthGate keeps each source's quantile band and drops its outliers") {
    val synth = ((1 to 100).map(i => (i.toLong, "a", ("w " * 50).trim)) ++
      Seq((101L, "a", "w"), (102L, "a", ("w " * 5000).trim)) ++
      (1 to 10).map(i => (200L + i, "b", ("x " * i).trim))).toDF("doc_id", "source", "text")
    val kept = Curation.lengthGate(synth, "text", "doc_id", "source")
      .select("doc_id").as[Long].collect().toSet
    // source a: the 100 uniform docs survive, the two extremes fall outside
    // [p05, p95] of 102 values
    assert((1 to 100).forall(i => kept.contains(i.toLong)))
    assert(!kept.contains(101L) && !kept.contains(102L))
    // source b (1..10 tokens): p05 = 1.45, p95 = 9.55 -> 2..9 survive
    assert((2 to 9).forall(i => kept.contains(200L + i)))
    assert(!kept.contains(201L) && !kept.contains(210L))
  }

  test("lengthGateSketched: exact order-stat bounds over the bottom-k sample") {
    val synth = ((1 to 100).map(i => (i.toLong, "a", ("w " * 50).trim)) ++
      Seq((101L, "a", "w"), (102L, "a", ("w " * 5000).trim)) ++
      (1 to 10).map(i => (200L + i, "b", ("x " * i).trim))).toDF("doc_id", "source", "text")
    // independent Scala oracle: same md5 ladder, bottom-16 per source,
    // [ceil(n/20), ceil(19n/20)] order-stat band, then the filter
    def u(id: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-quant:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
        .toDouble / 4294967296.0
    }
    val rows = synth.as[(Long, String, String)].collect()
      .map { case (id, src, text) =>
        (id, src, if (text.trim.isEmpty) 0L else text.trim.split("\\s+").length.toLong) }
    val bounds = rows.groupBy(_._2).map { case (src, rs) =>
      val sample = rs.sortBy(r => (u(r._1), r._1.toString)).take(16).map(_._3).sorted
      val n = sample.length
      src -> (sample((n + 19) / 20 - 1), sample((19 * n + 19) / 20 - 1))
    }
    val expect = rows.collect { case (id, src, n) if {
      val (lo, hi) = bounds(src); n >= lo && n <= hi } => id }.toSet
    val got = Curation.lengthGateSketched(synth, "text", "doc_id", "source", k = 16)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expect)
    // deterministic under repartitioning
    val again = Curation.lengthGateSketched(synth.repartition(13), "text",
      "doc_id", "source", k = 16).select("doc_id").as[Long].collect().toSet
    assert(again == got)
    // the extreme outliers still fall outside the sketched band
    assert(!got.contains(102L))
  }

  test("lmBuckets is a partition per language with monotone score boundaries") {
    val out = Curation.lmBuckets(docs, "text", "doc_id", "lang")
      .select(col("doc_id"), col("lang"), col("nll"), col("bucket"))
      .as[(Long, String, Double, String)].collect()
    // every scored doc (>= 3 tokens) gets exactly one bucket
    val scoredIds = Curation.lmScore(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(out.map(_._1).toSet == scoredIds && out.length == scoredIds.size)
    out.groupBy(_._2).foreach { case (lang, rows) =>
      def nlls(b: String) = rows.filter(_._4 == b).map(_._3)
      val (h, m, t) = (nlls("head"), nlls("middle"), nlls("tail"))
      if (h.nonEmpty && m.nonEmpty)
        assert(h.max <= m.min, s"$lang head/middle boundary")
      if (m.nonEmpty && t.nonEmpty)
        assert(m.max <= t.min, s"$lang middle/tail boundary")
    }
  }

  test("temperature mixing flattens the source distribution and respects the budget") {
    def shares(alpha: Double): Map[String, Long] =
      Curation.mixByTemperature(docs, "doc_id", "text", "source",
          alpha = alpha, frac = 0.3)
        .groupBy(col("source")).agg(sum(col("n_tok")).as("t"))
        .as[(String, Long)].collect().toMap
    val sourceTotals = docs.select(col("source"),
        size(TextFunctions.subwordTokens(col("text"))).cast("long").as("n"))
      .groupBy("source").agg(sum(col("n")).as("n"))
      .as[(String, Long)].collect().toMap
    val total = sourceTotals.values.sum
    val flat = shares(0.7)
    val prop = shares(1.0)
    // selected totals stay within the asked fraction (greedy fill may
    // overshoot each source by at most one document)
    val maxDoc = docs.select(max(size(TextFunctions.subwordTokens(col("text")))))
      .as[Int].collect().head.toLong
    assert(flat.values.sum <= (0.3 * total).toLong + maxDoc * flat.size)
    // alpha < 1 gives the smallest source a strictly larger share of the
    // selection than proportional sampling does
    val smallest = sourceTotals.minBy(_._2)._1
    def shareOf(m: Map[String, Long]) =
      m.getOrElse(smallest, 0L).toDouble / m.values.sum
    assert(shareOf(flat) > shareOf(prop), s"$smallest not upsampled")
  }

  test("quality-ranked mixing allocates budget by the score ranking") {
    // synthetic per-doc scores that force the ranking to be the sources'
    // alphabetical order (first source highest mean score)
    val srcs = docs.select("source").distinct().as[String].collect().sorted
    val rankScore = srcs.zipWithIndex.foldLeft(lit(0L)) { case (acc, (s, i)) =>
      when(col("source") === s, lit(((srcs.length - i) * 1000000L))).otherwise(acc)
    }
    val scores = docs.select(col("doc_id"), rankScore.as("pred_nano"))
    val out = Curation.mixByQualityRank(docs, "doc_id", "text", "source",
        scores, "pred_nano", frac = 0.25)
      .groupBy(col("source")).agg(sum(col("n_tok")).as("t"))
      .as[(String, Long)].collect().toMap
    val picked = srcs.map(s => out.getOrElse(s, 0L))
    assert(picked.head > picked.last,
      s"top-ranked source must out-allocate the bottom: $out")
    // selections track the monotone rank weights (greedy fill can wobble
    // by at most one document per source)
    val maxDoc = docs.select(max(size(TextFunctions.subwordTokens(col("text")))))
      .as[Int].collect().head.toLong
    picked.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(a >= b - maxDoc, s"rank order violated beyond one-doc slack: $out")
    }
    // the overall budget is respected up to one doc per source
    val total = docs.select(sum(size(TextFunctions.subwordTokens(col("text")))
      .cast("long"))).as[Long].collect().head
    assert(picked.sum <= (0.25 * total).toLong + maxDoc * srcs.length)
  }

  test("hashFeatures matches a plain-Scala md5 reference") {
    val got = Curation.hashFeatures(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong(_)).toVector).toMap
    val pat = """\p{L}+|\p{N}+|[^\p{L}\p{N}\s]""".r
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect()
    rows.foreach { case (id, text) =>
      val f = Array.fill(16)(0L)
      pat.findAllIn(text.trim.toLowerCase).foreach { t =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val bucket = Integer.parseInt(hex.substring(0, 2), 16) % 16
        f(bucket) += (if (hex.charAt(2) < '8') 1L else -1L)
      }
      assert(got(id) == f.toVector, s"doc $id")
    }
    // the random-sign trick centers across the HASH draws — i.e. across
    // UNIQUE tokens (repeated Zipfian tokens share one draw and need not
    // cancel): |Σ sign| over n uniques is O(√n)
    val uniq = rows.flatMap(r => pat.findAllIn(r._2.trim.toLowerCase)).distinct
    val signSum = uniq.map { t =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (hex.charAt(2) < '8') 1L else -1L
    }.sum
    assert(math.abs(signSum) < 6 * math.sqrt(uniq.size.toDouble) + 1,
      s"signed sum $signSum over ${uniq.size} unique tokens")
  }

  test("cdcChunks re-synchronizes after an insertion (fixed spans do not)") {
    val base = (1 to 120).map(i => s"w$i").mkString(" ")
    val shifted = "zzz " + base // one-token insertion at the front
    val synth = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val chunks = Curation.cdcChunks(synth, "text", "doc_id")
      .select(col("doc_id"), col("chunk_hash")).as[(Long, String)].collect()
    val a = chunks.filter(_._1 == 1L).map(_._2).toSet
    val b = chunks.filter(_._1 == 2L).map(_._2).toSet
    val shared = (a intersect b).size.toDouble / a.size
    // boundaries re-sync within the 4-token window: most chunks survive
    assert(shared > 0.5, s"only ${(shared * 100).round}% of chunks shared")
    // and the dedup stats see the duplication
    val stats = Curation.cdcDedupStats(synth, "text", "doc_id")
      .select(col("doc_id"), col("n_dup")).as[(Long, Long)].collect().toMap
    assert(stats(1L) > 0 && stats(2L) > 0)
    // control: fixed 10-token passages all shift — zero shared passages
    val fixedDup = Curation.scrubDupSpans(synth, "text", "doc_id", span = 10)
      .select(col("doc_id"), col("n_removed")).as[(Long, Long)].collect().toMap
    assert(fixedDup(1L) == 0 && fixedDup(2L) == 0)
  }

  test("cdc chunk concatenation reproduces the token stream in order") {
    val sample = docs.filter(col("doc_id") < 20)
    val rebuilt = Curation.cdcChunks(sample, "text", "doc_id")
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("cid"), col("chunk")))),
        s => s.getField("chunk"))).as("joined"))
    val orig = sample.select(col("doc_id"),
      concat_ws(" ", TextFunctions.tokens(col("text"))).as("expect"))
    val diff = rebuilt.join(orig, Seq("doc_id"))
      .filter(col("joined") =!= col("expect")).count()
    assert(diff == 0)
  }

  test("contamination flags benchmark docs themselves and near-dups, nothing vocab-random") {
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val hits = Curation.contamination(docs, bench, "text", "doc_id", n = 5)
      .as[(Long, Long)].collect().toMap
    val benchIds = bench.select("doc_id").as[Long].collect().toSet
    // every benchmark doc with >=1 shingle overlaps itself
    assert(benchIds.forall(hits.contains), "benchmark docs must self-flag")
    // hit counts are bounded by the doc's own distinct shingle count
    val shingleCounts = docs
      .select(col("doc_id"),
        size(array_distinct(graft.dedup.DocDedup.shingles(col("text"), 5))).as("n"))
      .as[(Long, Int)].collect().toMap
    hits.foreach { case (id, n) => assert(n <= shingleCounts(id)) }
  }

  test("PII scrub redacts email, IP and phone without double-counting overlaps") {
    val rows = Seq(
      (1L, "mail me at bob.smith+x@corp.example.com today"),
      (2L, "server 192.168.0.1 and backup 10.0.0.2"),
      (3L, "call 555-0142 or 555 0143"),
      (4L, "clean text with no identifiers"),
      (5L, "a@b.io at 1.2.3.4 tel 123-4567")
    ).toDF("id", "t")
    val out = rows.select(col("id"),
      Curation.piiCount(col("t")).as("n"),
      Curation.scrubPii(col("t")).as("s"))
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((1L, "mail me at <EMAIL> today")))
    assert(out(2L) == ((2L, "server <IP> and backup <IP>")))
    assert(out(3L) == ((2L, "call <PHONE> or <PHONE>")))
    assert(out(4L) == ((0L, "clean text with no identifiers")))
    assert(out(5L) == ((3L, "<EMAIL> at <IP> tel <PHONE>")))
  }

  test("stratified sample is a deterministic subset with roughly the configured rate") {
    val rates = Map("en" -> 0.5, "zh" -> 0.1)
    val s1 = Curation.stratifiedSample(docs, "doc_id", "lang", rates)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Curation.stratifiedSample(docs.repartition(7), "doc_id", "lang", rates)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "sample must not depend on partitioning")
    val en = docs.filter(col("lang") === "en").select("doc_id").as[Long].collect().toSet
    val enKept = s1.intersect(en).size.toDouble / en.size
    assert(enKept > 0.3 && enKept < 0.7, s"en keep rate $enKept far from 0.5")
    // unlisted strata are dropped entirely
    val other = docs.filter(!col("lang").isin("en", "zh")).select("doc_id")
      .as[Long].collect().toSet
    assert(s1.intersect(other).isEmpty)
  }

  test("trigram LM score ranks gibberish above corpus-typical prose") {
    val corpus = (
      (1L to 20L).map(i => (i, s"the quick brown fox jumps over the lazy dog $i")) :+
        (99L, "zxqj vwkp qqzz xjvw kpzx")  // trigrams the corpus never repeats
      ).toDF("doc_id", "text")
    val scored = Curation.lmScore(corpus, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val typical = (1L to 20L).map(scored).max
    assert(scored(99L) > typical,
      s"gibberish nll ${scored(99L)} must exceed typical max $typical")
    // deterministic under repartition (the FP round masks order jitter)
    val again = Curation.lmScore(corpus.repartition(7), "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(again == scored)
    // sub-trigram docs are absent, not scored
    val tiny = Curation.lmScore(Seq((1L, "ab")).toDF("doc_id", "text"),
      "text", "doc_id")
    assert(tiny.count() == 0)
    graft.ops.Caches.release() // lmScore tracks its trigram stream per call
  }

  test("dup spans flags exactly the verbatim chunk shared by two docs") {
    val chunk = (1 to 25).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, s"alpha beta $chunk gamma"),
      (2L, s"$chunk delta epsilon"),
      (3L, (100 to 160).map(i => s"u$i").mkString(" "))).toDF("doc_id", "text")
    val out = Curation.dupSpans(corpus, "text", "doc_id", span = 20)
      .select("doc_id", "n_spans", "n_dup")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // a 25-token chunk contains 6 complete 20-token windows; both carriers
    // flag exactly those, the unrelated doc flags none
    assert(out(1L)._2 == 6 && out(2L)._2 == 6)
    assert(out(3L)._2 == 0)
    assert(out(1L)._1 == 28 - 19 && out(2L)._1 == 27 - 19) // window counts
    graft.ops.Caches.release() // dupSpans tracks its span stream
  }

  test("split assignment is exhaustive, partition-invariant, near the fractions") {
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val split = Curation.assignSplit(col("doc_id"), fr)
    val counts = docs.select(split.as("s")).groupBy("s").count()
      .as[(String, Long)].collect().toMap
    val n = docs.count()
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum == n, "every doc gets exactly one split")
    assert(counts("train") > n * 6 / 10, "train should hold the bulk")
    // identical assignment regardless of physical partitioning
    val a = docs.select(col("doc_id"), split.as("s")).as[(Long, String)].collect().toSet
    val b = docs.repartition(13).select(col("doc_id"), split.as("s"))
      .as[(Long, String)].collect().toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Curation.assignSplit(col("doc_id"), Seq("a" -> 0.5, "b" -> 0.6))
    }
  }

  test("packing fills each lane's budget: consecutive docs share a sequence until it overflows") {
    val packed = Curation.packSequences(docs, "doc_id", "text", "lang",
      budgetTokens = 500, nShards = 2)
      .as[(Long, String, Int, Long, Long)].collect()
    // per (lang, shard) lane, seq_id is nondecreasing in doc order and each
    // sequence's exclusive-prefix start is exactly budget*seq_id tokens in
    packed.groupBy(r => (r._2, r._3)).foreach { case (_, lane) =>
      val sorted = lane.sortBy(_._1)
      var cum = 0L
      sorted.foreach { case (_, _, _, nTok, seqId) =>
        assert(seqId == cum / 500, "seq id must be the exclusive prefix / budget")
        cum += nTok
      }
    }
    // shard spreads work: both shards populated per major language
    val enShards = packed.filter(_._2 == "en").map(_._3).toSet
    assert(enShards == Set(0, 1))
  }

  test("int8 quantization round-trips within one step and is scan-order independent") {
    val emb = sf("embeddings")
    val q = emb.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"),
        Curation.quantizeInt8(col("embedding")).as("q"))
      .as[(Long, Seq[Double], Seq[Int])].collect()
    q.foreach { case (_, v, codes) =>
      assert(codes.forall(c => c >= -128 && c <= 127))
      val mn = v.min; val mx = v.max
      if (mx > mn) {
        val step = (mx - mn) / 255.0
        v.zip(codes).foreach { case (x, c) =>
          val rec = mn + (c + 128) * step
          assert(math.abs(rec - x) <= step / 2 + 1e-9,
            s"dequantized $rec vs $x exceeds half a step")
        }
      } else assert(codes.forall(_ == 0))
    }
  }

  test("pii scrub count equals scrub placeholder occurrences on the injected corpus") {
    // the driver-checked query's injection, cross-checked structurally
    val injected = concat(col("text"),
      lit(" contact u"), col("doc_id").cast("string"),
      lit("@mail.example.org or 555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
      lit(" from 10.1."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".9"))
    val out = docs.select(
      Curation.piiCount(injected).as("n"),
      Curation.scrubPii(injected).as("s"))
      .as[(Long, String)].collect()
    out.foreach { case (n, s) =>
      val placeholders = Seq("<EMAIL>", "<IP>", "<PHONE>")
        .map(p => s.sliding(p.length).count(_ == p)).sum
      assert(n == placeholders)
      assert(n >= 3, "every injected row carries at least email+ip+phone")
    }
  }

  test("capPerGroup keeps at most n per group, deterministically under repartitioning") {
    val n = 7
    val kept = Curation.capPerGroup(docs, "doc_id", "source", n)
      .select("doc_id", "source").as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2)
    assert(bySrc.values.forall(_.length <= n))
    // a group smaller than the cap is kept whole
    val sizes = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    sizes.foreach { case (src, total) =>
      assert(bySrc.get(src).map(_.length.toLong).getOrElse(0L) == math.min(total, n.toLong))
    }
    val kept2 = Curation.capPerGroup(docs.repartition(11), "doc_id", "source", n)
      .select("doc_id", "source").as[(Long, String)].collect()
    assert(kept.toSet == kept2.toSet, "survivors must not depend on partitioning")
    // and the rank filter compiles to a WindowGroupLimit (map-side top-n)
    val plan = Curation.capPerGroup(docs, "doc_id", "source", n)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("winnow guarantees coverage: any shared k+w-1 token run yields a shared fingerprint") {
    val k = 5; val w = 4
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 = k+w-1 tokens
    val rows = Seq(
      (1L, s"one two three $shared four five six seven"),
      (2L, s"red blue $shared green yellow purple orange pink"),
      (3L, "totally unrelated words nothing in common here at all ok")
    ).toDF("doc_id", "text")
    val fp = Curation.winnow(rows, "text", "doc_id", k, w)
      .as[(Long, Int, String)].collect()
    val byDoc = fp.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._3).toSet }
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
      "docs sharing a k+w-1 run must share a fingerprint")
    assert(byDoc(3L).intersect(byDoc(1L) ++ byDoc(2L)).isEmpty)
    // at least one fingerprint per w consecutive windows → gaps ≤ w
    fp.groupBy(_._1).values.foreach { xs =>
      val ps = xs.map(_._2).sorted
      ps.zip(ps.tail).foreach { case (a, b) => assert(b - a <= w) }
    }
    // deterministic under repartitioning
    val fp2 = Curation.winnow(rows.repartition(5), "text", "doc_id", k, w)
      .as[(Long, Int, String)].collect()
    assert(fp.toSet == fp2.toSet)
  }

  test("scrubDupSpans matches a plain-Scala reference on random corpora") {
    def ref(docs: Seq[(Long, String)], span: Int): Map[Long, (Long, Long, String)] = {
      val seen = scala.collection.mutable.Set.empty[String]
      docs.sortBy(_._1).map { case (id, text) =>
        val toks = text.trim.toLowerCase.split("\\s+").toSeq
        val chunks = toks.grouped(span).map(_.mkString(" ")).toSeq
        val kept = chunks.filter { c =>
          val fresh = !seen(c); seen += c; fresh
        }
        id -> (chunks.size.toLong, (chunks.size - kept.size).toLong,
          kept.mkString(" "))
      }.toMap
    }
    val rng = new scala.util.Random(31)
    val words = Seq("a", "b", "c", "d")
    for (trial <- 0 until 5) {
      val span = 2 + rng.nextInt(4)
      // tiny vocab + short docs force heavy cross-doc chunk collisions
      val docs = (0L until 25L).map { id =>
        (id, Seq.fill(rng.nextInt(15) + 1)(words(rng.nextInt(words.size)))
          .mkString(" "))
      }
      val got = Curation.scrubDupSpans(docs.toDF("doc_id", "text"),
          "text", "doc_id", span)
        .select(col("doc_id"), col("n_chunks"), col("n_removed"),
          col("text_scrubbed"))
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(got == ref(docs, span), s"trial $trial span=$span")
    }
  }

  test("cdcChunks matches a plain-Scala reference on random corpora") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def ref(text: String, window: Int, div: Int): Seq[(Long, String)] = {
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      val bounds = toks.indices.map { p =>
        p >= window - 1 && {
          val win = toks.slice(p - window + 1, p + 1).mkString(" ")
          java.lang.Long.parseLong(md5hex(win).take(4), 16) % div == 0
        }
      }
      val cids = toks.indices.map(p => bounds.take(p).count(identity).toLong)
      toks.zip(cids).groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (cid, xs) => (cid, xs.map(_._1).mkString(" ")) }
    }
    val rng = new scala.util.Random(47)
    val words = Seq("p", "q", "r", "s", "t", "u")
    for (trial <- 0 until 5) {
      val window = 2 + rng.nextInt(3)
      val div = 2 + rng.nextInt(7)
      val docs = (0L until 15L).map { id =>
        (id, Seq.fill(rng.nextInt(30) + 1)(words(rng.nextInt(words.size)))
          .mkString(" "))
      }
      val got = Curation.cdcChunks(docs.toDF("doc_id", "text"),
          "text", "doc_id", window, div)
        .select(col("doc_id"), col("cid"), col("chunk"))
        .as[(Long, Long, String)].collect()
        .groupBy(_._1).map { case (d, xs) =>
          d -> xs.map(x => (x._2, x._3)).sortBy(_._1).toSeq }
      docs.foreach { case (id, text) =>
        assert(got.getOrElse(id, Seq.empty) == ref(text, window, div),
          s"trial $trial doc $id window=$window div=$div text='$text'")
      }
    }
  }

  test("winnow matches a plain-Scala MOSS reference on random corpora") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def ref(text: String, k: Int, w: Int): Set[(Int, String)] = {
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      val hs = toks.sliding(k).filter(_.size == k).zipWithIndex
        .map { case (sh, p) => (p, md5hex(sh.mkString(" "))) }.toSeq
      hs.sliding(w).filter(_.size == w)
        .map(_.minBy { case (p, h) => (h, p) }).toSet
    }
    val rng = new scala.util.Random(23)
    val words = Seq("a", "b", "c", "d", "e", "f", "g", "h")
    for (trial <- 0 until 5) {
      val k = 2 + rng.nextInt(4)
      val w = 1 + rng.nextInt(5)
      val docs = (0L until 20L).map { id =>
        // small vocab forces hash ties; lengths straddle the k+w-1 edge
        (id, Seq.fill(rng.nextInt(25) + 1)(words(rng.nextInt(words.size)))
          .mkString(" "))
      }
      val got = Curation.winnow(docs.toDF("doc_id", "text"), "text", "doc_id", k, w)
        .as[(Long, Int, String)].collect()
        .groupBy(_._1).map { case (d, xs) => d -> xs.map(x => (x._2, x._3)).toSet }
      docs.foreach { case (id, text) =>
        assert(got.getOrElse(id, Set.empty) == ref(text, k, w),
          s"trial $trial doc $id k=$k w=$w text='$text'")
      }
    }
  }
}
