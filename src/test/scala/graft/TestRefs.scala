package graft

/** Plain-Scala (non-Spark) reference implementations shared across specs. */
object TestRefs {

  /** Chained md5 rolling fingerprint — the independent reference for
    * [[graft.text.TextFunctions.rollingHashMd5]]: acc := lowercase
    * md5hex(acc + "|" + token) folded from the seed over whitespace tokens
    * of the lowercased trimmed text. */
  def rollingMd5(text: String, seed: String = "graft"): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    text.trim.toLowerCase.split("\\s+").foldLeft(seed) { (acc, t) =>
      md.digest((acc + "|" + t).getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
  }

  /** md5-nibble SimHash — the independent reference for
    * [[graft.dedup.DocDedup.simhashMd5]]: bit j (0..63, MSB-first) of a
    * token = bit (3 - j%4) of nibble j/4 of md5(token); signature bit =
    * strict majority of ones across whitespace tokens of the lowercased
    * trimmed text. */
  def simhashMd5(text: String): Long = {
    val toks = text.trim.toLowerCase.split("\\s+")
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](64)
    for (t <- toks) {
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      for (j <- 0 until 64) {
        val nib = Integer.parseInt(hex.substring(j / 4, j / 4 + 1), 16)
        if (((nib >> (3 - j % 4)) & 1) == 1) counts(j) += 1
      }
    }
    (0 until 64).foldLeft(0L) { (acc, j) =>
      (acc << 1) | (if (counts(j) * 2 > toks.length) 1L else 0L)
    }
  }
}
