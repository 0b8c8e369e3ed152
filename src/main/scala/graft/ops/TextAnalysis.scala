package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID
  * (stopword heuristic), quality scoring, token counting, and document
  * fingerprinting (rolling hash). All integer/exact arithmetic — no FP —
  * and built-in expressions only (codegen'd, oracle-reproducible).
  */
object TextAnalysis {

  /** Minimal per-language stopword lists for the n-gram-free heuristic.
    * Deliberately small: the operator shape (token explode → broadcast
    * stopword join → per-doc argmax) is what scales, not the lists.
    */
  val stopwords: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of", "en" -> "and", "en" -> "to",
    "en" -> "in", "en" -> "is", "en" -> "it", "en" -> "for", "en" -> "on",
    "de" -> "der", "de" -> "die", "de" -> "das", "de" -> "und", "de" -> "ist",
    "de" -> "nicht", "de" -> "mit", "de" -> "ein", "de" -> "zu", "de" -> "den",
    "fr" -> "le", "fr" -> "la", "fr" -> "les", "fr" -> "et", "fr" -> "est",
    "fr" -> "un", "fr" -> "une", "fr" -> "des", "fr" -> "du", "fr" -> "pas",
    "es" -> "el", "es" -> "la", "es" -> "los", "es" -> "las", "es" -> "es",
    "es" -> "un", "es" -> "una", "es" -> "y", "es" -> "de", "es" -> "que")

  /** Language ID: per-doc stopword hit counts per language; prediction =
    * argmax with (hits desc, lang asc) tie-break; docs with zero hits
    * predict "und". One explode + broadcast join + one shuffle.
    */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sw = stopwords.toDF("lang", "word")
    val ids = docs.select(col(idCol).as("doc_id"))
    val hits = docs
      .select(col(idCol).as("doc_id"), explode(Hashing.tokens(lower(col(textCol)))).as("token"))
      .join(broadcast(sw), col("token") === col("word"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("hits"))
    val best = hits
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("hits").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("predicted_lang"), col("hits"))
    ids.join(best, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("predicted_lang"), lit("und")).as("predicted_lang"),
        coalesce(col("hits"), lit(0L)).as("hits"))
  }

  /** Quality features + a deterministic integer score in [0, 1000]:
    * rewards lexical diversity (unique/total tokens) and length up to a
    * 400-token cap. All ratios are scaled-integer division — exact.
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Hashing.tokens(col(textCol))
    docs.select(
      col(idCol).as("doc_id"),
      length(col(textCol)).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_uniq_tokens"),
      size(regexp_extract_all(col(textCol), lit("[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("n_punct"))
      .withColumn("uniq_permille",
        expr("(cast(n_uniq_tokens as bigint) * 1000) div greatest(n_tokens, 1)"))
      .withColumn("quality_score",
        expr("""(cast(n_uniq_tokens as bigint) * 500) div greatest(n_tokens, 1)
                + (cast(least(n_tokens, 400) as bigint) * 500) div 400"""))
      .select("doc_id", "n_chars", "n_tokens", "n_uniq_tokens", "n_punct",
        "uniq_permille", "quality_score")
  }

  /** Token counting: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs | digit runs | single other non-space).
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(Hashing.tokens(col(textCol))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .cast("long").as("bpe_tokens"),
      length(col(textCol)).cast("long").as("n_chars"))

  /** Document fingerprinting: a polynomial rolling hash of the whole
    * text (mod 1e9+7, exact in Long) plus the min hash over all 8-char
    * windows (winnowing-style content anchor robust to local edits).
    * Pure sequential folds over codepoints — codegen'd, no UDF.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.TextHashes.ensureRegistered(docs.sparkSession)
    graft.Tables.fanOut(docs).select(
      col(idCol).as("doc_id"),
      call_function("graft_poly_hash", col(textCol)).as("poly_hash"),
      call_function("graft_min_window_hash", col(textCol)).as("min_window_hash"))
  }
}
