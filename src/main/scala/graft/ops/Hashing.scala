package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, oracle-reproducible hashing and tokenization used by
  * the dedup / similarity / fingerprint operators.
  *
  * Everything here compiles to built-in Catalyst expressions (md5, conv,
  * regexp) so the hot path stays inside whole-stage codegen — no UDFs —
  * and every value is bit-for-bit reproducible in external engines
  * (DuckDB: `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`), which is
  * what the per-round oracle checks.
  */
object Hashing {

  /** 60-bit hash: first 15 hex chars of md5, as a non-negative Long.
    * 60 bits keeps downstream bit arithmetic (simhash fingerprints,
    * band keys) inside a signed 64-bit Long with no overflow.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Driver-side twin of [[hash60]] — bit-identical, used to bake
    * deterministic constants (minhash permutations, LSH hyperplanes)
    * into plans and oracles.
    */
  def hash60Jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.substring(0, 15), 16)
  }

  /** Whitespace tokens; empty tokens never produced. */
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit("\\S+"), lit(0))

  /** Ordered word k-shingles joined by single spaces; docs shorter than
    * k tokens emit no shingles (they never participate in shingle-based
    * similarity — the standard convention).
    *
    * A single-pass UDF rather than transform/element_at: Catalyst
    * higher-order lambdas are interpreted and re-evaluate the token
    * regex per element (measured ~6× slower on 3 KB docs).
    */
  private val tokenPattern = java.util.regex.Pattern.compile("\\S+")
  private val shingleUdf = udf { (text: String, k: Int) =>
    if (text == null) Array.empty[String]
    else {
      val toks = scala.collection.mutable.ArrayBuffer.empty[String]
      val m = tokenPattern.matcher(text)
      while (m.find()) toks += m.group()
      if (toks.length < k) Array.empty[String]
      else Array.tabulate(toks.length - k + 1) { i =>
        val sb = new StringBuilder(toks(i))
        var j = i + 1
        while (j < i + k) { sb += ' '; sb ++= toks(j); j += 1 }
        sb.result()
      }
    }
  }

  def shingles(text: Column, k: Int): Column = shingleUdf(text, lit(k))
}
