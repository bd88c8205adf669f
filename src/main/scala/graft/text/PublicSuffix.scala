package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Registrable-domain (eTLD+1) resolution over a PINNED public-suffix
  * rule subset — the rollup key real per-site governance uses: caps,
  * link analysis, and domain mixing must treat `blog.example.co.uk`
  * and `www.example.co.uk` as ONE site, which keying on the raw host
  * gets wrong for every multi-label registry suffix.
  *
  * The rule set is a deterministic, versioned SUBSET of the public
  * suffix list idea (publicsuffix.org): multi-label registry suffixes
  * plus the common private-registry platform suffixes, pinned as a
  * literal so the DuckDB oracle replays the SAME table byte for byte
  * ([[sqlListLiteral]]). Single-label TLDs need no table under the
  * PSL's default `*` rule — an unlisted final label is itself a
  * suffix, so the registrable domain is the last two labels either
  * way; rules here are capped at two labels (the subset trades the
  * long tail of 3-label registry rules for exact cross-engine replay).
  *
  * Resolution (longest-match, lowercase host in — normalize first):
  * last two labels in the table → last THREE labels; otherwise → last
  * TWO labels; hosts with fewer labels pass through unchanged. Pure
  * codegen'd expressions, no UDF. */
object PublicSuffix {

  /** Two-label public suffixes: registry rules + private platform
    * registries. Sorted; lowercase; pinned (additions are fine, edits
    * invalidate recorded oracles). */
  val MultiLabel: Seq[String] = Seq(
    // uk family
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    // au
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    // nz
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "iwi.nz", "kiwi.nz",
    "maori.nz", "net.nz", "org.nz", "school.nz",
    // jp
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    // cn
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "net.cn", "org.cn",
    // kr
    "ac.kr", "co.kr", "go.kr", "ne.kr", "or.kr", "pe.kr", "re.kr",
    // in
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "net.in", "nic.in", "org.in", "res.in",
    // br
    "com.br", "edu.br", "gov.br", "net.br", "org.br",
    // mx / ar / cl / co / pe / uy / ve
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "net.ar", "org.ar",
    "com.co", "edu.co", "gov.co", "net.co", "org.co",
    "com.pe", "edu.pe", "gob.pe", "net.pe", "org.pe",
    "com.uy", "edu.uy", "gub.uy", "net.uy", "org.uy",
    "com.ve", "edu.ve", "gob.ve", "net.ve", "org.ve",
    // za / ng / ke / eg / ma
    "ac.za", "co.za", "gov.za", "net.za", "org.za", "web.za",
    "com.ng", "edu.ng", "gov.ng", "net.ng", "org.ng",
    "ac.ke", "co.ke", "go.ke", "ne.ke", "or.ke", "sc.ke",
    "com.eg", "edu.eg", "gov.eg", "net.eg", "org.eg",
    "ac.ma", "co.ma", "gov.ma", "net.ma", "org.ma", "press.ma",
    // tr / il / sa / ae / pk / bd / lk / np
    "av.tr", "bel.tr", "com.tr", "edu.tr", "gov.tr", "net.tr", "org.tr",
    "ac.il", "co.il", "gov.il", "muni.il", "net.il", "org.il",
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa", "sch.sa",
    "ac.ae", "co.ae", "gov.ae", "net.ae", "org.ae", "sch.ae",
    "com.pk", "edu.pk", "gob.pk", "gov.pk", "net.pk", "org.pk",
    "ac.bd", "com.bd", "edu.bd", "gov.bd", "net.bd", "org.bd",
    "ac.lk", "com.lk", "edu.lk", "gov.lk", "net.lk", "org.lk",
    "com.np", "edu.np", "gov.np", "net.np", "org.np",
    // sg / hk / tw / my / th / ph / vn / id
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.tw", "edu.tw", "gov.tw", "idv.tw", "net.tw", "org.tw",
    "com.my", "edu.my", "gov.my", "net.my", "org.my",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "com.ph", "edu.ph", "gov.ph", "net.ph", "ngo.ph", "org.ph",
    "ac.vn", "com.vn", "edu.vn", "gov.vn", "net.vn", "org.vn",
    "ac.id", "co.id", "go.id", "my.id", "net.id", "or.id", "sch.id",
    "web.id",
    // eu ccTLD second levels
    "com.pl", "edu.pl", "gov.pl", "net.pl", "org.pl", "waw.pl",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "com.ru", "msk.ru", "net.ru", "org.ru", "spb.ru",
    "co.at", "gv.at", "or.at", "priv.at",
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "com.es", "edu.es", "gob.es", "nom.es", "org.es",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "org.pt",
    "com.gr", "edu.gr", "gov.gr", "net.gr", "org.gr",
    "com.ro", "nom.ro", "nt.ro", "org.ro", "rec.ro", "store.ro",
    "co.hu", "edu.hu", "gov.hu", "info.hu", "org.hu", "priv.hu",
    "ac.be", "com.cy", "com.mt", "edu.mt", "gov.mt", "net.mt", "org.mt",
    // north america second levels
    "co.us", "gc.ca", "on.ca", "qc.ca",
    // private platform registries (PSL private section)
    "appspot.com", "azurewebsites.net", "blogspot.com", "cloudfront.net",
    "firebaseapp.com", "github.io", "gitlab.io", "glitch.me",
    "herokuapp.com", "netlify.app", "ngrok.io", "onrender.com",
    "pages.dev", "readthedocs.io", "repl.co", "surge.sh", "vercel.app",
    "web.app", "wordpress.com")

  private val MultiSet: Set[String] = MultiLabel.toSet
  require(MultiSet.size == MultiLabel.size, "duplicate suffix rule")
  require(MultiLabel.forall(s => s.count(_ == '.') == 1 && s == s.toLowerCase),
    "suffix rules must be two lowercase labels")

  /** eTLD+1 of an already-NORMALIZED (lowercase) host, as a pure
    * expression chain: table-listed two-label suffix → last three
    * labels; anything else → last two (PSL default rule); short hosts
    * pass through. */
  def registrableDomain(host: Column): Column = {
    val ls = split(host, "\\.")
    val n = size(ls)
    val last2 = array_join(slice(ls, -2, 2), ".")
    when(n >= 3 && last2.isInCollection(MultiLabel),
        array_join(slice(ls, -3, 3), "."))
      .when(n >= 2, last2)
      .otherwise(host)
  }

  /** The SAME rule table as a DuckDB list literal — the oracle replays
    * the table, it doesn't re-model it. */
  def sqlListLiteral: String =
    MultiLabel.map(s => s"'$s'").mkString("[", ", ", "]")

  /** DuckDB replay of [[registrableDomain]] over a host column named
    * `hostCol`, given a precomputed `string_split(hostCol, '.')` list
    * column named `lsCol`. */
  def sqlRegistrableDomain(hostCol: String, lsCol: String): String =
    s"""CASE WHEN len($lsCol) >= 3 AND list_contains($sqlListLiteral,
       array_to_string(list_slice($lsCol, len($lsCol)-1, len($lsCol)), '.'))
       THEN array_to_string(list_slice($lsCol, len($lsCol)-2, len($lsCol)), '.')
       WHEN len($lsCol) >= 2
       THEN array_to_string(list_slice($lsCol, len($lsCol)-1, len($lsCol)), '.')
       ELSE $hostCol END"""
}
