package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID
  * (stopword heuristic), quality scoring, token counting, and document
  * fingerprinting (rolling hash). All integer/exact arithmetic — no FP.
  * The counting/argmax paths run as one-pass native kernels
  * (functions/TextStats.scala) inside a single narrow projection — the
  * semantically-equivalent regex/join forms are kept in the oracle SQL.
  *
  * NULL-text contract: [[langId]] is null-total (NULL text predicts
  * ("und", 0), same as a zero-hit doc). The counting operators
  * ([[qualityScore]], [[tokenCounts]], [[fingerprints]]) propagate
  * NULL through every derived field — callers curating corpora with
  * nullable text should filter or coalesce upstream. (The legacy
  * regex forms returned -1 counts for NULL under sizeOfNull; the
  * kernels deliberately do not reproduce that sentinel.)
  */
object TextAnalysis {

  /** Per-language stopword lists (baked into the LangHits kernel). */
  val stopwords: Seq[(String, String)] = graft.functions.LangHits.stopwords

  /** Language ID: per-doc stopword hit counts per language; prediction =
    * argmax with (hits desc, lang asc) tie-break; docs with zero hits
    * predict "und" — and so does NULL text (the kernel yields a NULL
    * struct there; the coalesce keeps this operator null-total). One
    * narrow projection (LangHits kernel) — the explode →
    * broadcast-join → groupBy → window form costs two shuffles and a
    * corpus-tokens-sized intermediate for the same answer.
    */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.TextStatsFns.ensureRegistered(docs.sparkSession)
    docs
      .select(
        col(idCol).as("doc_id"),
        call_function("graft_lang_hits", lower(col(textCol))).as("lh"))
      .select(
        col("doc_id"),
        coalesce(col("lh").getField("predicted_lang"), lit("und")).as("predicted_lang"),
        coalesce(col("lh").getField("hits"), lit(0L)).as("hits"))
  }

  /** Quality features + a deterministic integer score in [0, 1000]:
    * rewards lexical diversity (unique/total tokens) and length up to a
    * 400-token cap. All ratios are scaled-integer division — exact.
    * Counts come from the one-pass TextStats kernel (the regex form
    * materialized three match arrays per row just to size them).
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.TextStatsFns.ensureRegistered(docs.sparkSession)
    val st = call_function("graft_text_stats", col(textCol))
    docs
      .select(
        col(idCol).as("doc_id"),
        length(col(textCol)).cast("long").as("n_chars"),
        st.getField("n_tokens").as("n_tokens"),
        st.getField("n_uniq_tokens").as("n_uniq_tokens"),
        st.getField("n_punct").as("n_punct"))
      .withColumn("uniq_permille",
        expr("(cast(n_uniq_tokens as bigint) * 1000) div greatest(n_tokens, 1)"))
      .withColumn("quality_score",
        expr("""(cast(n_uniq_tokens as bigint) * 500) div greatest(n_tokens, 1)
                + (cast(least(n_tokens, 400) as bigint) * 500) div 400"""))
      .select("doc_id", "n_chars", "n_tokens", "n_uniq_tokens", "n_punct",
        "uniq_permille", "quality_score")
  }

  /** Token counting: whitespace tokens and a BPE-ish segmentation
    * (letter runs | digit runs | single other non-space), one kernel pass.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.TextStatsFns.ensureRegistered(docs.sparkSession)
    val st = call_function("graft_text_stats", col(textCol))
    docs.select(
      col(idCol).as("doc_id"),
      st.getField("n_tokens").as("ws_tokens"),
      st.getField("bpe_tokens").as("bpe_tokens"),
      length(col(textCol)).cast("long").as("n_chars"))
  }

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

  /** Repetition metrics (the Gopher-style repetition filter family):
    * per document, the total and duplicated word-bigram mass and the
    * most frequent token's share — high duplicate-bigram or
    * single-token mass marks boilerplate, keyword stuffing and
    * degenerate generations that plain length/uniqueness scores
    * (qualityScore) miss. All-integer permille ratios, so the result
    * is engine-reproducible.
    *
    * Plan shape: two explode → per-doc-key aggregations (bigrams and
    * tokens), joined on doc_id. Each aggregation combines map-side;
    * nothing is corpus-quadratic.
    */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ids = docs.select(col(idCol).as("doc_id"))
    val bg = docs
      .select(col(idCol).as("doc_id"),
        explode(Hashing.shingles(col(textCol), 2)).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg(
        sum(col("n")).as("n_bigrams"),
        sum(when(col("n") >= 2, col("n")).otherwise(0L)).as("dup_bigram_tokens"))
    val tk = docs
      .select(col(idCol).as("doc_id"),
        explode(Hashing.tokens(col(textCol))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg(
        sum(col("n")).as("n_tokens"),
        max(col("n")).as("max_token_freq"))
    ids.join(bg, Seq("doc_id"), "left").join(tk, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("dup_bigram_tokens"), lit(0L)).as("dup_bigram_tokens"),
        expr("coalesce(dup_bigram_tokens, 0) * 1000 div greatest(coalesce(n_bigrams, 0), 1)")
          .as("rep_permille"),
        expr("coalesce(max_token_freq, 0) * 1000 div greatest(coalesce(n_tokens, 0), 1)")
          .as("top_token_permille"))
  }

  /** Gopher-style rule battery (Rae et al. 2021, table A1 subset):
    * the standard heuristic document filter, as per-rule flags plus
    * the composite keep decision —
    *   1. word count in [50, 100000]
    *   2. mean word length in [3, 10] chars
    *   3. symbol-to-word ratio ("#" or "...") below 0.1
    *   4. at least 2 hits from the 8-word English stop list
    *      (the/be/to/of/and/that/have/with)
    *   5. at least 80% of words contain an alphabetic character
    * All ratios in exact integer permille / ×100 fixed point, so the
    * flags are engine-reproducible. The word array is projected ONCE
    * and the higher-order folds reference that attribute (no
    * per-element re-tokenization — the interpreted-lambda gotcha);
    * per-doc work is O(len), a single narrow projection, zero
    * shuffles. Returns metrics + rule flags + keep.
    */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    withGopherCols(docs.select(col(idCol).as("doc_id"), col(textCol).as("text")))
      .select("doc_id", "n_words", "mean_word_len_x100", "symbol_permille",
        "stop_hits", "alpha_word_permille", "rule_word_count", "rule_word_len",
        "rule_symbols", "rule_stopwords", "rule_alpha", "keep")

  /** Append the Gopher metric/rule/keep columns to a frame carrying a
    * `text` column — the composition hook for one-pass meta scans
    * (q102/q111 compute digest + quality + split + token count in a
    * single corpus scan instead of joining per-stage frames). Stacked
    * projections over one scan; the non-cheap `w` array is referenced
    * 4× so CollapseProject keeps it materialized once per row.
    */
  private[graft] def withGopherCols(docs: DataFrame): DataFrame = {
    docs
      .withColumn("w", expr("regexp_extract_all(text, '\\\\S+', 0)"))
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("word_chars", expr("aggregate(w, 0L, (acc, x) -> acc + length(x))"))
      .withColumn("alpha_words",
        size(expr("filter(w, x -> x rlike '[A-Za-z]')")).cast("long"))
      .withColumn("symbols",
        (expr("size(regexp_extract_all(text, '#', 0))") +
          expr("size(regexp_extract_all(text, '\\\\.\\\\.\\\\.', 0))")).cast("long"))
      .withColumn("stop_hits",
        size(expr(
          "filter(w, x -> array_contains(array('the','be','to','of','and','that','have','with'), lower(x)))"))
          .cast("long"))
      .withColumn("mean_word_len_x100", expr("word_chars * 100 div greatest(n_words, 1)"))
      .withColumn("symbol_permille", expr("symbols * 1000 div greatest(n_words, 1)"))
      .withColumn("alpha_word_permille", expr("alpha_words * 1000 div greatest(n_words, 1)"))
      .withColumn("rule_word_count", col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("rule_word_len",
        col("mean_word_len_x100") >= 300 && col("mean_word_len_x100") <= 1000)
      .withColumn("rule_symbols", col("symbol_permille") < 100)
      .withColumn("rule_stopwords", col("stop_hits") >= 2)
      .withColumn("rule_alpha", col("alpha_word_permille") >= 800)
      .withColumn("keep",
        col("rule_word_count") && col("rule_word_len") && col("rule_symbols") &&
          col("rule_stopwords") && col("rule_alpha"))
      .drop("w", "word_chars", "alpha_words", "symbols")
  }

  /** PII scrub: redact email addresses and phone-shaped digit runs
    * with fixed placeholders, counting each — the cleaning pass every
    * public-web corpus runs before training. Patterns are deliberately
    * RE2-safe (no backtracking constructs) so the same regexes run
    * under Java regex here and RE2 in the oracle, and redaction is
    * sequential (emails first, then phones over the already-redacted
    * text) so both engines see identical intermediate strings.
    * Pure map-side: codegen'd regexp passes, zero shuffles.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{7,14}[0-9]"

  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      regexp_replace(
        regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>").as("clean_text"),
      size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(
        regexp_replace(col(textCol), EmailRe, "<EMAIL>"), lit(PhoneRe), lit(0)))
        .cast("long").as("n_phones"))
}
