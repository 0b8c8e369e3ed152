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

  /** Seeded family of hash60s (minhash permutations, LSH planes). */
  def hash60Seeded(seed: Int, c: Column): Column =
    hash60(concat(lit(s"$seed|"), c))

  /** Whitespace tokens; empty tokens never produced. */
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit("\\S+"), lit(0))

  /** Ordered word k-shingles joined by single spaces; docs shorter than
    * k tokens emit no shingles (they never participate in shingle-based
    * similarity — the standard convention).
    */
  def shingles(text: Column, k: Int): Column = {
    val w = tokens(text)
    when(size(w) >= k,
      transform(sequence(lit(0), size(w) - k), i =>
        concat_ws(" ", (0 until k).map(j => element_at(w, i + j + lit(1))): _*)))
      .otherwise(array().cast("array<string>"))
  }
}
