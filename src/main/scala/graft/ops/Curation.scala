package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for a training-data pipeline: benchmark
  * decontamination, deterministic stratified quota sampling, and
  * canonical-representative selection per near-dup cluster.
  *
  * All three are declarative single-to-few-shuffle plans sized for the
  * 100 TB corpus: the decontamination vocabulary is a broadcast-sized
  * side input (benchmark sets are MBs against a corpus of TBs), the
  * quota sample's rank filter is pushed map-side by Spark's
  * WindowGroupLimit rewrite, and canonical selection rides the capped
  * dup-pair stream (corpus-size independent, see Components).
  */
object Curation {

  /** Benchmark decontamination: flag every corpus document sharing at
    * least one word `k`-gram with the evaluation set — the test-set
    * overlap pass every serious training pipeline runs before
    * pretraining (n-gram collision form).
    *
    * Plan shape: the eval vocabulary reduces to DISTINCT 60-bit
    * shingle hashes (benchmark sets are tiny next to the corpus, so
    * this side is explicitly `broadcast`); the corpus explodes through
    * the one-pass ShingleHashes kernel (per-doc set semantics, no
    * distinct() shuffle) and takes a broadcast-hash semi-join plus one
    * doc-keyed count — the only shuffle. At 100 TB the corpus never
    * repartitions; scaling the benchmark set only grows the broadcast.
    *
    * Returns every NON-eval document: (doc_id,
    * n_contaminated_shingles, contaminated).
    */
  def decontaminate(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3): DataFrame =
    decontaminateWithVocab(corpus,
      evalShingleVocab(evalSet, idCol, textCol, k), idCol, textCol, k)

  /** The eval set's distinct shingle-hash vocabulary — precompute once
    * (and checkpoint) when the eval set is immutable state, as the
    * curation gate does, instead of re-shingling it every micro-batch.
    */
  def evalShingleVocab(
      evalSet: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    graft.functions.DedupKernels.ensureRegistered(evalSet.sparkSession)
    graft.Tables.fanOut(evalSet).select(
        explode(call_function("graft_shingle_hashes", col(textCol), lit(k))).as("h"))
      .distinct()
  }

  /** [[decontaminate]] against a prebuilt eval vocabulary. */
  def decontaminateWithVocab(
      corpus: DataFrame,
      evalVocab: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3): DataFrame = {
    graft.functions.DedupKernels.ensureRegistered(corpus.sparkSession)
    def shingleHashes(df: DataFrame) = graft.Tables.fanOut(df).select(
      col(idCol).as("doc_id"),
      explode(call_function("graft_shingle_hashes", col(textCol), lit(k))).as("h"))
    val hits = shingleHashes(corpus)
      .join(broadcast(evalVocab), Seq("h"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated_shingles"))
    corpus.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_contaminated_shingles"), lit(0L)).as("n_contaminated_shingles"),
        (coalesce(col("n_contaminated_shingles"), lit(0L)) > 0).as("contaminated"))
  }

  /** Bloom-membership decontamination — the 100 TB form of
    * [[decontaminateWithVocab]] for when the eval-side vocabulary
    * outgrows a broadcastable hash set (a big decontamination corpus,
    * a URL blocklist, a digest denylist): instead of shipping the
    * vocabulary, ship its CONSTANT-SIZE Bloom filter. Build = one
    * mergeable aggregation over the vocabulary (per-partition bitsets
    * OR together — `graft_bloom_agg`, Spark's own runtime-filter
    * sketch); probe = a map-side codegen'd membership expression
    * against the filter embedded as a literal (`graft_bloom_contains`)
    * — the corpus side needs NO join at all. A Bloom filter has no
    * false negatives, so the flagged set is a superset of the exact
    * one by construction; false positives are bounded by the sizing
    * (`fpp` per probe, compounding over a doc's shingles).
    *
    * The exact leg rides along for the gate (the q125 discipline):
    *  - `bloom_ok` = 1 iff this doc's exact contamination is covered
    *    by the Bloom flag (completeness — must ALWAYS hold);
    *  - `fp_ok` = 1 iff the corpus-wide false-positive rate among
    *    exactly-clean docs stays within `maxFpPermille` (the sizing
    *    bound actually holding at this corpus' shingle counts).
    * Both are computed from the sketch, replayed by the oracle as
    * literal 1s — a regression in either fails the hash compare.
    * Production calls drop the exact leg and keep build + probe.
    */
  def decontaminateBloom(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      fpp: Double = 1e-6,
      maxFpPermille: Long = 20L): DataFrame = {
    graft.functions.DedupKernels.ensureRegistered(corpus.sparkSession)
    graft.functions.BloomFns.ensureRegistered(corpus.sparkSession)
    // consumed three times (sizing, build, exact leg) — query-layer
    // persist, released by the caller's clearCache cadence
    val vocab = evalShingleVocab(evalSet, idCol, textCol, k).persist()
    // sketch sizing: one bounded scalar (the sketch itself is the
    // point — its size must not depend on reading the data twice more)
    val nItems = math.max(vocab.count(), 1L)
    val nBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(nItems, fpp)
    val bloomBin = vocab
      .agg(call_function("graft_bloom_agg", col("h"), lit(nItems), lit(nBits))
        .as("bf"))
      .head().getAs[Array[Byte]](0)
    val bloomFlags = graft.Tables.fanOut(corpus).select(
        col(idCol).as("doc_id"),
        explode(call_function("graft_shingle_hashes", col(textCol), lit(k))).as("h"))
      .filter(call_function("graft_bloom_contains", lit(bloomBin), col("h")))
      .select("doc_id").distinct()
      .withColumn("bloom_flag", lit(true))
    val exact = decontaminateWithVocab(corpus, vocab, idCol, textCol, k)
    // consumed twice (global gate scalar + final projection)
    val joined = exact.join(bloomFlags, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_contaminated_shingles"), col("contaminated"),
        coalesce(col("bloom_flag"), lit(false)).as("bloom_flag"))
      .persist()
    // the corpus-wide FP gate is ONE audited driver-side scalar (the
    // gate-constant pattern): a constant-key join here would fold into
    // a nested-loop plan, and a global window would single-partition
    // the corpus — both worse at scale than one 2-long collect
    val g = joined.agg(
      sum(when(col("bloom_flag") && !col("contaminated"), 1L).otherwise(0L)).as("fp"),
      sum(when(!col("contaminated"), 1L).otherwise(0L)).as("clean")).head()
    val fpOk = (if (g.isNullAt(0)) 0L else g.getLong(0)) * 1000L <=
      math.max(if (g.isNullAt(1)) 0L else g.getLong(1), 1L) * maxFpPermille
    joined.select(col("doc_id"), col("n_contaminated_shingles"), col("contaminated"),
      when(!col("contaminated") || col("bloom_flag"), 1L).otherwise(0L).as("bloom_ok"),
      lit(if (fpOk) 1L else 0L).as("fp_ok"))
  }

  /** Deterministic stratified quota sample: the first `k` documents of
    * every stratum in md5(text) order (doc_id tie-break) — the mixture
    * / data-budget step of corpus curation, reproducible across runs
    * and engines because the order key is a content hash, not a seed.
    *
    * Plan shape: one shuffle on the strata columns. The `rank <= k`
    * filter is rewritten by Spark into a WindowGroupLimit, so every
    * map task pre-truncates its partition to k rows per stratum before
    * the exchange — a skewed stratum ships O(k × maps), not its full
    * size (PlanAuditSpec asserts the rewrite fires).
    */
  def quotaSample(
      docs: DataFrame,
      strataCols: Seq[String],
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(textCol)), col(idCol))
    val out = col(idCol).as("doc_id") +: strataCols.map(col) :+
      col("sample_rank").cast("long").as("sample_rank")
    docs
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
      .select(out: _*)
  }

  /** Temperature-scaled mixture sampling: a `budget`-sized sample
    * whose per-stratum quotas follow the T=2 smoothed distribution
    * quota_s = budget × √n_s / Σ√n — the standard move that keeps
    * low-resource strata (languages, sources) from vanishing under
    * proportional sampling while still favoring the head. Fully
    * integer/deterministic: weights are floor(√n) and quotas integer
    * divisions, so the sample is reproducible across engines; within
    * a stratum, docs are taken in md5(text) order (doc_id tie-break),
    * as in [[quotaSample]].
    *
    * Scale shape: the quota table is strata-sized (broadcast); the
    * per-stratum rank filters FIRST against the literal `budget` —
    * which Spark rewrites to a map-side WindowGroupLimit, bounding
    * what any skewed stratum ships — and only then against its
    * stratum's (column-valued, non-rewritable) quota.
    */
  def mixtureSample(
      docs: DataFrame,
      strataCol: String,
      idCol: String,
      textCol: String,
      budget: Long): DataFrame = {
    val counts = docs.groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .withColumn("w", expr("cast(floor(sqrt(cast(n as double))) as bigint)"))
    // Σw via an unpartitioned window: the frame is strata-sized, so the
    // single-partition exchange is trivial — and unlike a 1-row
    // crossJoin it introduces no nested-loop join for the plan audit
    // to reason about.
    val quotas = counts
      .withColumn("tw", sum("w").over(Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col(strataCol), expr(s"(${budget}L * w) div tw").as("quota"))
    val w = Window.partitionBy(strataCol).orderBy(md5(col(textCol)), col(idCol))
    docs
      .withColumn("mix_rank", row_number().over(w))
      .filter(col("mix_rank") <= lit(budget))
      .join(broadcast(quotas), Seq(strataCol))
      .filter(col("mix_rank") <= col("quota"))
      .select(col(idCol).as("doc_id"), col(strataCol),
        col("mix_rank").cast("long").as("mix_rank"))
  }

  /** Token-budget shard packing: assign every document a training
    * shard and an offset inside it, by cumulative token count over a
    * deterministic content-hash order — the sequence-packing prep step
    * that turns a curated corpus into fixed-budget training shards.
    * shard_id = floor(tokens_before / tokensPerShard); a doc belongs
    * to the shard its first token lands in.
    *
    * The naive form is a GLOBAL cumulative sum — a single-partition
    * window sort, the classic 100 TB cliff. This runs the distributed
    * two-level prefix sum instead: range-repartition on the order key
    * (partitions tile the global order), a per-partition running sum,
    * and a broadcast of the per-partition totals' prefix sums (one
    * tiny frame, rows = partition count). Every row is shuffled once;
    * no stage sees more than a partition. The result is independent of
    * where the range boundaries fall, so partition count never changes
    * the assignment.
    */
  /** Per-doc token count under the named tokenizer: "ws" — whitespace
    * tokens (the graft_text_stats field, q86/q88's historical unit);
    * "bpe" — deterministic subword tokens (graft_bpe_count, the unit
    * real training-shard budgets use; see
    * [[graft.functions.BpeTokenizer]]). One switch shared by
    * [[shardPack]], [[corpusStats]] and the curation gate's counter so
    * the shard math can never mix units.
    */
  private[graft] def tokenCountCol(textCol: Column, tokenizer: String): Column =
    tokenizer match {
      case "ws" => call_function("graft_text_stats", textCol).getField("n_tokens")
      case "bpe" => call_function("graft_bpe_count", textCol)
      case other => throw new IllegalArgumentException(
        s"unknown tokenizer '$other' (expected 'ws' or 'bpe')")
    }

  private[graft] def registerTokenizers(df: DataFrame): Unit = {
    graft.functions.TextStatsFns.ensureRegistered(df.sparkSession)
    graft.functions.BpeFns.ensureRegistered(df.sparkSession)
  }

  def shardPack(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tokensPerShard: Long,
      tokenizer: String = "ws"): DataFrame =
    shardPackWithScratch(docs, idCol, textCol, tokensPerShard, tokenizer)._1

  /** [[shardPack]] exposing its internal checkpoint for callers that
    * fold per micro-batch (the curation gate): the scratch frame must
    * be released once the pack output is materialized, or every batch
    * pins a kept-train-sized block set — the O(batches × delta) growth
    * `Streams.releaseCheckpoint` exists to prevent.
    */
  private[graft] def shardPackWithScratch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tokensPerShard: Long,
      tokenizer: String = "ws"): (DataFrame, Seq[DataFrame]) = {
    registerTokenizers(docs)
    shardPackFromCounts(docs.select(
      col(idCol).as("doc_id"),
      tokenCountCol(col(textCol), tokenizer).as("n_tokens"),
      md5(col(textCol)).as("okey")), tokensPerShard)
  }

  /** [[shardPack]] from precomputed per-doc rows (doc_id, n_tokens,
    * okey) — the composition form for pipelines that already carry
    * token counts and digests in a meta frame (q102/q111): packing
    * then never re-reads or re-tokenizes the text. okey is md5(text)
    * in the standard pipelines, so digest doubles as the pack order.
    */
  private[graft] def shardPackFromCounts(
      toks: DataFrame,
      tokensPerShard: Long): (DataFrame, Seq[DataFrame]) = {
    val parted = toks.repartitionByRange(col("okey"), col("doc_id"))
      .withColumn("part", spark_partition_id())
      .localCheckpoint() // two consumers (totals + rows); the range
                         // exchange must also not re-plan between them
    val wLocal = Window.partitionBy("part").orderBy("okey", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wParts = Window.orderBy("part")
      .rowsBetween(Window.unboundedPreceding, -1)
    // partition-count rows: the single-partition window is on the TINY
    // totals frame, never the corpus
    val offsets = parted.groupBy("part").agg(sum("n_tokens").as("ptot"))
      .withColumn("poff", coalesce(sum("ptot").over(wParts), lit(0L)))
      .select("part", "poff")
    val out = parted
      .withColumn("lcum", coalesce(sum("n_tokens").over(wLocal), lit(0L)))
      .join(broadcast(offsets), Seq("part"))
      .select(
        col("doc_id"), col("n_tokens"),
        expr(s"(poff + lcum) div ${tokensPerShard}L").as("shard_id"),
        expr(s"(poff + lcum) % ${tokensPerShard}L").as("offset_tokens"))
    (out, Seq(parted))
  }

  /** Corpus profiling: per-stratum document counts, token mass, and
    * EXACT p50/p95 token-count percentiles (discrete: the ceil(q·n)-th
    * smallest value, doc_id tie-break) — the stats pass that sizes
    * mixtures and flags degenerate strata before training. All-integer
    * rank arithmetic, so the result is reproducible across engines.
    *
    * One shuffle on the strata column (the rank window); the agg rides
    * the same partitioning. Exact per-stratum percentiles sort each
    * stratum — the oracle-able form; at 100 TB swap in
    * `percentile_approx` (one pass, mergeable sketch) where exactness
    * isn't required.
    */
  def corpusStats(
      docs: DataFrame,
      strataCol: String,
      idCol: String,
      textCol: String,
      tokenizer: String = "ws"): DataFrame = {
    registerTokenizers(docs)
    val tk = docs.select(
      col(strataCol),
      col(idCol).as("doc_id"),
      tokenCountCol(col(textCol), tokenizer).as("nt"))
    val w = Window.partitionBy(strataCol).orderBy(col("nt"), col("doc_id"))
    val wn = Window.partitionBy(strataCol)
    tk
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy(col(strataCol))
      .agg(
        max(col("n")).as("n_docs"),
        sum(col("nt")).as("sum_tokens"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("nt"))).as("p50_tokens"),
        max(when(col("rn") === expr("(19 * n + 19) div 20"), col("nt"))).as("p95_tokens"))
  }

  /** Sketched corpus statistics — the 100 TB twin of [[corpusStats]],
    * with the vocabulary axis added. Exact per-stratum stats need a
    * per-stratum SORT (the rank window) and exact vocabulary needs a
    * DISTINCT over every token occurrence — both full shuffles of the
    * corpus at cluster scale. The production path here is two
    * map-side-partial, constant-state aggregations instead:
    * HyperLogLog++ (`approx_count_distinct`) for per-stratum
    * vocabulary and a mergeable quantile sketch
    * (`percentile_approx`) for token percentiles — no sort, no
    * distinct shuffle, sketch state merges associatively across
    * executors.
    *
    * Like q34's exact-verifier role and q109's recall gate, the
    * returned frame carries the EXACT figures (oracle-able across
    * engines) plus `sketch_ok` — 1 iff every sketched figure lands
    * within its bound of the exact one (vocabulary within
    * `vocabBoundPermille`; percentiles within max(2 tokens, 5%)).
    * A sketch regression flips the column and fails the driver's
    * hash compare; production calls drop the exact legs and keep the
    * sketch aggregations.
    */
  def corpusStatsSketched(
      docs: DataFrame,
      strataCol: String,
      idCol: String,
      textCol: String,
      vocabBoundPermille: Long = 50L): DataFrame = {
    registerTokenizers(docs)
    // doc-grain legs (exact rank percentiles + the quantile sketch)
    // fused into ONE tokenize + ONE strata shuffle: the sketch agg
    // rides the window's partitioning, as in corpusStats
    val tk = docs.select(
      col(strataCol),
      col(idCol).as("doc_id"),
      tokenCountCol(col(textCol), "ws").as("nt"))
    val w = Window.partitionBy(strataCol).orderBy(col("nt"), col("doc_id"))
    val wn = Window.partitionBy(strataCol)
    val exact = tk
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy(col(strataCol))
      .agg(
        max(col("n")).as("n_docs"),
        sum(col("nt")).as("sum_tokens"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("nt"))).as("p50_tokens"),
        max(when(col("rn") === expr("(19 * n + 19) div 20"), col("nt"))).as("p95_tokens"),
        percentile_approx(col("nt"), array(lit(0.5), lit(0.95)),
          lit(10000)).as("pcts"))
    // token occurrences: one explode shared by the exact-distinct leg
    // and the HLL leg (identical token multiset to the oracle's \S+)
    val vocab = docs.select(
      col(strataCol),
      explode(split(col(textCol), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(strataCol).agg(
        countDistinct(col("tok")).as("n_vocab"),
        approx_count_distinct(col("tok"), 0.01).as("n_vocab_hll"))
    def near(sk: Column, ex: Column): Column =
      abs(sk - ex) * 20 <= greatest(lit(40L), ex)
    exact.join(vocab, Seq(strataCol))
      .select(col(strataCol), col("n_docs"), col("sum_tokens"),
        col("p50_tokens"), col("p95_tokens"), col("n_vocab"),
        when(
          abs(col("n_vocab_hll") - col("n_vocab")) * 1000 <=
            col("n_vocab") * vocabBoundPermille &&
          near(col("pcts").getItem(0), col("p50_tokens")) &&
          near(col("pcts").getItem(1), col("p95_tokens")), 1L)
          .otherwise(0L).as("sketch_ok"))
  }

  /** The PRODUCTION form of [[corpusStatsSketched]] — sketches only,
    * no exact legs: two constant-state, map-side-partial aggregations
    * (count/sum + mergeable quantile sketch at doc grain; HLL++ at
    * token grain). No rank window, no per-stratum sort, no DISTINCT
    * shuffle — the shape that stays flat at 100 TB. Accuracy is
    * certified separately: [[corpusStatsSketched]] (q125) carries the
    * exact legs and the `sketch_ok` gate as the verify-only oracle
    * twin, so this benched path stays honest without paying the
    * oracle's sort every run.
    */
  def corpusStatsSketchOnly(
      docs: DataFrame,
      strataCol: String,
      idCol: String,
      textCol: String): DataFrame = {
    registerTokenizers(docs)
    val st = docs.select(
        col(strataCol),
        tokenCountCol(col(textCol), "ws").as("nt"))
      .groupBy(strataCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("sum_tokens"),
        percentile_approx(col("nt"), array(lit(0.5), lit(0.95)),
          lit(10000)).as("pcts"))
    val vocab = docs.select(
        col(strataCol),
        explode(split(col(textCol), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(strataCol)
      .agg(approx_count_distinct(col("tok"), 0.01).as("n_vocab_sketch"))
    st.join(vocab, Seq(strataCol))
      .select(col(strataCol), col("n_docs"), col("sum_tokens"),
        col("pcts").getItem(0).as("p50_sketch"),
        col("pcts").getItem(1).as("p95_sketch"),
        col("n_vocab_sketch"))
  }

  /** The PRODUCTION form of [[decontaminateBloom]] — probe only, no
    * exact legs: build the constant-size Bloom sketch from the eval
    * vocabulary (one mergeable agg), then flag corpus docs with a
    * map-side codegen'd membership probe. The corpus is never joined,
    * never shuffled; flags are a (bounded-rate) SUPERSET of the exact
    * contamination set — no false negatives by construction, FP rate
    * certified by [[decontaminateBloom]] (q126), the verify-only
    * oracle twin that carries the exact legs and both audit gates.
    */
  def decontaminateBloomProbeOnly(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      fpp: Double = 1e-6): DataFrame = {
    graft.functions.DedupKernels.ensureRegistered(corpus.sparkSession)
    graft.functions.BloomFns.ensureRegistered(corpus.sparkSession)
    val vocab = evalShingleVocab(evalSet, idCol, textCol, k)
    val nItems = math.max(vocab.count(), 1L)
    val nBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(nItems, fpp)
    val bloomBin = vocab
      .agg(call_function("graft_bloom_agg", col("h"), lit(nItems), lit(nBits))
        .as("bf"))
      .head().getAs[Array[Byte]](0)
    val hits = graft.Tables.fanOut(corpus).select(
        col(idCol).as("doc_id"),
        explode(call_function("graft_shingle_hashes", col(textCol), lit(k))).as("h"))
      .filter(call_function("graft_bloom_contains", lit(bloomBin), col("h")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"))
    corpus.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).as("n_bloom_hits"),
        (coalesce(col("n"), lit(0L)) > 0).as("flagged"))
  }

  /** Fuzzy (near-dup) benchmark decontamination: flag corpus documents
    * whose n-gram Jaccard overlap with ANY eval document exceeds
    * `num/den` — the paraphrase-robust complement of [[decontaminate]]
    * (exact n-gram collision misses a reworded eval item; a 0.3
    * Jaccard band catches it). Runs the banded MinHash delta machinery
    * with the EVAL SET as the broadcast delta: candidates are
    * eval×corpus band collisions only (never corpus×corpus), the
    * standing corpus contributes one map-side band-key kernel pass and
    * is never shuffled for the candidate join, and verification is
    * exact Jaccard restricted to candidate docs — identical plan
    * economics to the ingest gate, pointed at contamination.
    *
    * Returns every corpus document: (doc_id, n_eval_matches,
    * max_overlap_permille, contaminated).
    */
  def decontaminateFuzzy(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      numPerm: Int = 64,
      bands: Int = 16,
      num: Int = 3,
      den: Int = 10): DataFrame = {
    // Namespace the two sides into disjoint string keys ("c:"/"e:"
    // prefixes): the delta machinery anti-joins ids present on both
    // sides as "re-ingested stale twins" — correct for an ingest gate,
    // but here corpus and eval are keyed INDEPENDENTLY, and a corpus
    // doc sharing a raw id with an eval doc would silently escape the
    // contamination check. The prefix makes collisions impossible for
    // any id domains; the machinery is key-type-agnostic (the gate
    // already runs it string-keyed).
    val corpusDocs = corpus.select(
      concat(lit("c:"), col(idCol).cast("string")).as("gid"), col(textCol))
    val evalDocs = evalSet.select(
      concat(lit("e:"), col(idCol).cast("string")).as("gid"), col(textCol))
    val pairs = Dedup.minhashLshDeltaPairsIndexed(
      Dedup.minhashBandKeys(corpusDocs, "gid", textCol, k, numPerm, bands),
      corpusDocs, evalDocs, "gid", textCol, k, numPerm, bands, num, den,
      broadcastDelta = true)
    val flagged = pairs
      .groupBy(col("corpus_id").as("gid"))
      .agg(
        count(lit(1)).as("n_eval_matches"),
        max(expr("(inter * 1000) div union_size")).as("max_overlap_permille"))
    corpus.select(
        col(idCol).as("doc_id"),
        concat(lit("c:"), col(idCol).cast("string")).as("gid"))
      .join(flagged, Seq("gid"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_eval_matches"), lit(0L)).as("n_eval_matches"),
        coalesce(col("max_overlap_permille"), lit(0L)).as("max_overlap_permille"),
        (coalesce(col("n_eval_matches"), lit(0L)) > 0).as("contaminated"))
  }

  /** SEMANTIC benchmark decontamination — the embedding-space third
    * leg next to [[decontaminate]] (exact n-gram collision) and
    * [[decontaminateFuzzy]] (lexical near-dup): flag every corpus
    * document whose EMBEDDING is within `threshold` cosine of any eval
    * embedding — the paraphrase mode neither lexical pass catches (a
    * reworded eval item shares no shingles but lands next to it in
    * embedding space).
    *
    * Runs the q93 LSH bucket machinery with the EVAL SET as the
    * broadcast delta: candidates are eval×corpus bucket collisions
    * only (never corpus×corpus), the standing corpus contributes one
    * map-side signature pass and is never shuffled (in production: the
    * persisted cosineLshIndex), and verification is exact cosine on
    * the candidates. The flagged set is the deterministic
    * LSH-candidate subset (q93's recall discipline — both engines
    * derive identical buckets, so the subset is reproducible
    * bit-for-bit). Plane count derives from the combined corpus+eval
    * count, the geometry the corpus itself would use.
    *
    * Sides are namespaced into disjoint string keys ("c:"/"e:"), as
    * [[decontaminateFuzzy]]: corpus and eval ids are independent, and
    * a shared raw id would be silently anti-joined as a re-ingested
    * twin. Returns every corpus row: (doc_id, n_eval_matches,
    * contaminated).
    */
  def decontaminateSemantic(
      corpusEmb: DataFrame,
      evalEmb: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      targetBucket: Long = Similarity.LshTargetBucket): DataFrame = {
    val corpus = corpusEmb.select(
      concat(lit("c:"), col(idCol).cast("string")).as("gid"), col(vecCol).as("v"))
    val evals = evalEmb.select(
      concat(lit("e:"), col(idCol).cast("string")).as("gid"), col(vecCol).as("v"))
    val pairs = Similarity.cosinePairsLshDeltaAuto(
      corpus, evals, "gid", "v", dim, threshold, targetBucket)
    val flagged = pairs
      .groupBy(col("corpus_id").as("gid"))
      .agg(count(lit(1)).as("n_eval_matches"))
    corpusEmb.select(
        col(idCol).as("doc_id"),
        concat(lit("c:"), col(idCol).cast("string")).as("gid"))
      .join(flagged, Seq("gid"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_eval_matches"), lit(0L)).as("n_eval_matches"),
        (coalesce(col("n_eval_matches"), lit(0L)) > 0).as("contaminated"))
  }

  /** Leakage-free train/val/test split: assign every document to a
    * split by hashing its near-dup CLUSTER id, not its own id — so a
    * pair of near-duplicate documents can never straddle the
    * train/test boundary (the contamination mode that silently
    * inflates held-out metrics when splits are drawn per-document).
    * `clusters` is (doc_id, component_id) from [[Components]].
    *
    * Deterministic and engine-portable: the bucket is the first two
    * hex chars of md5(component_id as decimal string) — 256 buckets
    * compared LEXICALLY (fixed-width lowercase hex, so lexical order
    * IS numeric order), no hex-to-int conversion any SQL engine could
    * disagree on. Percents quantize to 1/256ths (90/5/5 → 230/13/13
    * buckets). Plan shape: a pure per-row projection over the cluster
    * frame — zero shuffles beyond what clustering already paid; at
    * 100 TB the split column is free.
    */
  /** The content-hash split rule as a column (90/5/5 via md5-prefix
    * hex buckets) — shared by the pipeline, its delta form, and the
    * curation gate so the split can never drift between them.
    */
  def splitColumn(text: Column): Column =
    splitFromBucket(substring(md5(text), 1, 2), trainPct = 90, valPct = 5)

  /** train/val/test from a 2-hex-char md5 bucket column: percents
    * quantize to 1/256ths; fixed-width lowercase hex compares LEXICALLY
    * in numeric order, so no engine-dependent hex-to-int conversion.
    * Single source of the cut encoding for [[leakageFreeSplit]],
    * [[splitColumn]] and [[curationPipeline]].
    */
  private def splitFromBucket(bucket: Column, trainPct: Int, valPct: Int): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"invalid split percents: train=$trainPct val=$valPct")
    val trainCut = f"${(256 * trainPct) / 100}%02x"
    val valCut = f"${(256 * (trainPct + valPct)) / 100}%02x"
    when(bucket < trainCut, "train").when(bucket < valCut, "val").otherwise("test")
  }

  def leakageFreeSplit(
      clusters: DataFrame,
      trainPct: Int = 90,
      valPct: Int = 5): DataFrame = {
    val bucket = substring(md5(col("component_id").cast("string")), 1, 2)
    clusters.select(
      col("doc_id"),
      col("component_id"),
      splitFromBucket(bucket, trainPct, valPct).as("split"))
  }

  /** End-to-end curation: the full pre-training pipeline as ONE
    * declarative DAG — exact dedup (keep canonicals), the Gopher rule
    * battery, benchmark decontamination against the held-out eval
    * slice, a content-hash train/val/test split (exact dups share a
    * digest, so dup groups can never straddle the boundary — and only
    * canonicals survive anyway), and token-budget shard packing of the
    * train split. Returns every surviving doc:
    * (doc_id, split, shard_id, offset_tokens) — shard −1 for val/test.
    *
    * The point is composition: five operators, one optimizer plan per
    * stage family, all semi-joins on doc_id (never a row-multiplying
    * join), with the expensive corpus scans shared where Catalyst can
    * prove them common. Every stage is individually oracle-gated
    * (q30/q100/q82/q95/q86); this query gates their COMPOSITION.
    */
  /** The per-doc curation meta frame — ONE corpus scan computing every
    * per-doc column the pipeline stages need: digest (exact-dedup key
    * AND pack order), Gopher keep, contamination vs the prebuilt eval
    * vocabulary, content-hash split, and token count. This is the ONE
    * definition [[curationPipeline]], [[curationPipelineDelta]] and
    * [[standingCurationState]] all compose, so the batch pipeline and
    * the gate/delta seed state cannot drift — and the round-15 fusion:
    * the previous per-stage frames re-scanned the corpus (and re-ran
    * the regex/shingle kernels) once per stage plus once per semi-join.
    * Plan shape: stacked projections over one scan (the word array is
    * CSE'd), plus one shingle explode → broadcast-vocab semi-join →
    * distinct for the contaminated id set (contaminated docs are a
    * vanishing fraction, so the left join back is a broadcast).
    * Returns (doc_id, digest, keep_q, contaminated, split, n_tokens).
    */
  /** Vocabulary sizes up to this many shingle hashes ride the
    * collected-probe fast path in [[curatedMeta]] (an 8 MB sorted
    * long array broadcast — the same boundedness contract that
    * justifies broadcasting the vocab as a join build). Above it the
    * explode → broadcast-semi-join path engages unchanged.
    */
  private val VocabProbeCap = 1000000

  private def curatedMeta(
      corpus: DataFrame,
      evalVocab: DataFrame,
      idCol: String,
      textCol: String,
      tokenizer: String = "ws",
      carryCols: Seq[String] = Nil): DataFrame = {
    registerTokenizers(corpus)
    graft.functions.DedupKernels.ensureRegistered(corpus.sparkSession)
    // carryCols ride through untouched and join into the row identity
    // (the delta pipeline fuses standing+batch into one tagged scan; a
    // re-ingested id present on both sides must keep per-SIDE flags).
    val keyCols = "doc_id" +: carryCols
    val base = TextAnalysis.withGopherCols(
        corpus.select(col(idCol).as("doc_id") +: col(textCol).as("text") +:
          carryCols.map(col): _*))
      .select((keyCols.map(col) :+ col("text") :+ col("keep").as("keep_q")): _*)
      .withColumn("digest", md5(col("text")))
      .withColumn("split", splitColumn(col("text")))
      .withColumn("n_tokens", tokenCountCol(col("text"), tokenizer))
    // Contamination: probe the collected, sorted vocab per doc inside
    // the SAME scan (zero joins, zero broadcast-exchange jobs — worth
    // two jobs and ~0.9 s at bench scale) when the vocab is bounded;
    // identical semantics to the explode → semi-join path (hit iff any
    // shingle hash is in the vocab), which remains the >cap fallback.
    val head = evalVocab.limit(VocabProbeCap + 1).collect()
    if (head.length <= VocabProbeCap) {
      val sorted = head.map(_.getLong(0)).sorted
      val bc = corpus.sparkSession.sparkContext.broadcast(sorted)
      val probe = udf { (text: String) =>
        if (text == null) false
        else {
          val hs = graft.functions.ShingleHashes.compute(
            org.apache.spark.unsafe.types.UTF8String.fromString(text), 3)
          hs != null && (0 until hs.numElements()).exists(i =>
            java.util.Arrays.binarySearch(bc.value, hs.getLong(i)) >= 0)
        }
      }
      base.withColumn("contaminated", probe(col("text"))).drop("text")
    } else {
      val contamIds = graft.Tables.fanOut(corpus).select(
          col(idCol).as("doc_id") +: carryCols.map(col) :+
          explode(call_function("graft_shingle_hashes", col(textCol), lit(3))).as("h"): _*)
        .join(broadcast(evalVocab), Seq("h"), "left_semi")
        .select(keyCols.map(col): _*).distinct()
      base.drop("text")
        .join(contamIds.withColumn("contam_hit", lit(true)), keyCols, "left")
        .withColumn("contaminated", coalesce(col("contam_hit"), lit(false)))
        .drop("contam_hit")
    }
  }

  /** Single-partition twin of [[shardPackFromCounts]] for inputs
    * bounded by the delta contract: one global window (Spark plans the
    * empty partition spec as a single-partition sort) — no range
    * sampling pass, no scratch checkpoint, no offsets broadcast.
    * Output-identical: the same (okey, doc_id) global order and
    * exclusive prefix sum.
    */
  private def shardPackSmall(toks: DataFrame, tokensPerShard: Long): DataFrame = {
    val w = Window.orderBy("okey", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks.withColumn("lcum", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"lcum div ${tokensPerShard}L").as("shard_id"),
        expr(s"lcum % ${tokensPerShard}L").as("offset_tokens"))
  }

  /** Canonical filter over a meta frame: keep the min-doc_id row of
    * each digest group (exact-dedup canonical, the q30 rule).
    */
  private def canonicalOnly(meta: DataFrame): DataFrame = {
    val w = Window.partitionBy("digest").orderBy("doc_id")
    meta.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  def curationPipeline(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tokensPerShard: Long): DataFrame = {
    val corpus = docs.filter(col(idCol) % 97 =!= 0)
    val evalSet = docs.filter(col(idCol) % 97 === 0)
    // One heavy scan, checkpointed narrow; every stage below derives
    // from it (canonical rank, keep filters, packing from counts).
    val meta = curatedMeta(
        corpus, evalShingleVocab(evalSet, idCol, textCol, 3), idCol, textCol)
      .transform(Ckpt.fresh)
    val withSplit = canonicalOnly(meta)
      .filter(col("keep_q") && !col("contaminated"))
    val packed = shardPackFromCounts(
        withSplit.filter(col("split") === "train")
          .select(col("doc_id"), col("n_tokens"), col("digest").as("okey")),
        tokensPerShard)._1
      .select(col("doc_id"), col("shard_id"), col("offset_tokens"))
    withSplit.select(col("doc_id"), col("split"))
      .join(packed, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("split"),
        coalesce(col("shard_id"), lit(-1L)).as("shard_id"),
        coalesce(col("offset_tokens"), lit(-1L)).as("offset_tokens"))
  }

  /** Incremental curation — the delta twin of [[curationPipeline]] and
    * the capstone of the delta family (q85/q93/q99/q103): a NEW batch
    * flows through the same five stages against STANDING state, with
    * append-stream semantics (standing is immutable — shards already
    * written never re-pack):
    *
    *  1. exact dedup: a batch doc is dropped if its digest exists in
    *     the STANDING corpus (standing wins — the gate rule) or a
    *     lower-id batch doc shares it;
    *  2–4. Gopher quality / decontamination / split are per-doc and
    *     run on the batch alone (eval vocabulary broadcast, as q82);
    *  5. shard APPEND: kept train docs pack continuing from the
    *     standing pipeline's cumulative train-token total — md5 order
    *     within the batch, so a batch doc may share the standing tail
    *     shard (exactly how an immutable shard stream grows).
    *
    * Plan shape per batch: the standing side contributes ONE
    * digest-index probe (broadcast batch digests; delta-bounded
    * output) and ONE scalar (the carried train-token total). Both are
    * recomputed here from the raw standing corpus so the q111 oracle
    * can replay them; a production pipeline carries the digest index
    * and the counter as state (the gate/LSM shape) and pays O(delta).
    * Output: (doc_id, split, shard_id, offset_tokens) for KEPT batch
    * docs — q102's shape restricted to the batch.
    */
  /** The carried state a curation gate/delta derives from an
    * already-curated STANDING corpus: (distinct digests of every
    * standing doc, kept-train token total of the standing pipeline's
    * output). Recomputed from raw docs here so oracles can replay it;
    * production maintains both incrementally.
    */
  def standingCurationState(
      standing: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      tokenizer: String = "ws"): (DataFrame, Long) = {
    val meta = curatedMeta(
        standing, evalShingleVocab(evalSet, idCol, textCol, 3),
        idCol, textCol, tokenizer)
      .transform(Ckpt.fresh)
    val trainTokens = canonicalOnly(meta)
      .filter(col("keep_q") && !col("contaminated") && col("split") === "train")
      .agg(coalesce(sum("n_tokens"), lit(0L)).cast("long"))
      .head().getLong(0)
    (meta.select("digest").distinct(), trainTokens)
  }

  def curationPipelineDelta(
      standing: DataFrame,
      delta: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      tokensPerShard: Long,
      broadcastDeltaCap: Long = 4000000L): DataFrame = {
    // Round-15 stage fusion: ONE eval shingle pass (inlined — the eval
    // slice is broadcast-build-sized by contract) and ONE tagged scan
    // over standing ∪ delta — every stage below derives from a single
    // meta checkpoint (previously the standing corpus was scanned
    // twice, the batch ~four times, and the eval set shingled twice;
    // even split standing/batch meta passes paid two checkpoint jobs
    // and two vocab broadcasts). The is_delta tag joins into the row
    // identity so a re-ingested id keeps per-side flags.
    val vocab = evalShingleVocab(evalSet, idCol, textCol, 3)
    val tagged = standing
      .select(col(idCol), col(textCol)).withColumn("is_delta", lit(false))
      .unionByName(
        delta.select(col(idCol), col(textCol)).withColumn("is_delta", lit(true)))
    val meta = curatedMeta(tagged, vocab, idCol, textCol,
        carryCols = Seq("is_delta"))
      .transform(Ckpt.fresh)
    val sMeta = meta.filter(!col("is_delta"))
    // Standing carried state, recomputed for oracle-ability: the
    // cumulative train-token total of the standing pipeline's output
    // plus the digest index, both off the one meta checkpoint. The
    // token total stays a 1-ROW FRAME (cross-joined broadcast below),
    // not a collected scalar — one fewer driver-blocking job.
    val sTok = canonicalOnly(sMeta)
      .filter(col("keep_q") && !col("contaminated") && col("split") === "train")
      .agg(coalesce(sum("n_tokens"), lit(0L)).cast("long").as("standing_train_tokens"))
    // Batch meta rows cover the FULL delta (per-doc flags are
    // unaffected by the dedup filter below, which only removes rows).
    // The delta-derived build sides broadcast under the cap and fall
    // back to shuffle joins for backfill-sized deltas — the same
    // two-regime rule as the other delta operators.
    val bMeta = meta.filter(col("is_delta"))
    val bDigests = bMeta.select("digest").distinct()
    val deltaSmall = bDigests.count() <= broadcastDeltaCap
    def sized(df: DataFrame): DataFrame = if (deltaSmall) broadcast(df) else df
    // Batch exact dedup vs standing (digest-index probe over the meta
    // checkpoint — standing never reshuffles) and within the batch
    // (min id per digest).
    val standingHit = sMeta.select("digest")
      .join(sized(bDigests), Seq("digest"), "left_semi")
      .distinct()
    val kept = canonicalOnly(bMeta.join(sized(standingHit), Seq("digest"), "left_anti"))
      .filter(col("keep_q") && !col("contaminated"))
    // Append packing: q86's prefix sum over the batch (straight from
    // the meta counts — no re-tokenization), shifted by the standing
    // total. A cap-bounded batch packs in one partition (no range
    // sampling / scratch checkpoint); backfills take the distributed
    // two-level pack.
    val keptTrain = kept.filter(col("split") === "train")
      .select(col("doc_id"), col("n_tokens"), col("digest").as("okey"))
    val packed = (if (deltaSmall) shardPackSmall(keptTrain, tokensPerShard)
                  else shardPackFromCounts(keptTrain, tokensPerShard)._1)
      .crossJoin(broadcast(sTok))
      .select(col("doc_id"),
        (col("shard_id") * tokensPerShard + col("offset_tokens") +
          col("standing_train_tokens")).as("cum"))
      .select(col("doc_id"),
        expr(s"cum div $tokensPerShard").as("shard_id"),
        expr(s"cum % $tokensPerShard").as("offset_tokens"))
    kept.select(col("doc_id"), col("split"))
      .join(packed, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("split"),
        coalesce(col("shard_id"), lit(-1L)).as("shard_id"),
        coalesce(col("offset_tokens"), lit(-1L)).as("offset_tokens"))
  }

  /** Canonical-representative selection: for every near-dup cluster,
    * keep the member with the highest quality score (min doc_id
    * tie-break) — the retention decision a dedup pipeline makes after
    * clustering, instead of blindly keeping the lowest id.
    *
    * `clusters` is (doc_id, component_id) from [[Components]], `quality`
    * is (doc_id, quality_score) from [[TextAnalysis.qualityScore]].
    * Returns (doc_id, component_id, canonical_id, keep). Plan shape:
    * the quality join shuffles on doc_id; the per-cluster argmax is a
    * WindowGroupLimit-rewritten rank over component_id. Non-singleton
    * clusters are a vanishing fraction of any corpus worth deduping,
    * but the plan is safe even when they are not.
    */
  def clusterCanonical(clusters: DataFrame, quality: DataFrame): DataFrame = {
    val joined = clusters.join(
      quality.select(col("doc_id"), col("quality_score")), Seq("doc_id"))
    val w = Window.partitionBy("component_id")
      .orderBy(col("quality_score").desc, col("doc_id"))
    val canon = joined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("component_id"), col("doc_id").as("canonical_id"))
    clusters.join(canon, Seq("component_id"))
      .select(col("doc_id"), col("component_id"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("keep"))
  }
}
