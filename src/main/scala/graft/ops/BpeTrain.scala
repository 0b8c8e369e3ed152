package graft.ops

import graft.functions.BpeTokenizer
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed BPE TRAINING (q153): learn the merges table from the
  * corpus by iterated pair-count aggregation — the actual pipeline
  * operation that precedes tokenization and shard packing (Sennrich et
  * al. 2016; reference analog: the engine treats tokenizer state as
  * derived data over the corpus, like its gram index,
  * assemblage_db/src/lib.rs:47-53).
  *
  * Per round: one distributed pass counts ALL adjacent token pairs
  * (overlapping occurrences included — the standard counting), the
  * argmax pair (count DESC, then (a, b) lexicographic — binary string
  * order on BOTH engines) becomes the round's merge, and one map-side
  * pass applies it with [[BpeTokenizer.mergePass]]'s exact
  * left-to-right non-overlapping semantics — the same pass the fixed
  * merges table uses at inference, so learned tables drop into the
  * existing `graft_bpe_*` kernels unchanged.
  *
  * Scale shape: each round is ONE shuffle (pair -> count, map-side
  * partial aggregation) plus an embarrassingly-parallel re-tokenize;
  * the corpus state is checkpointed per round ([[Ckpt.fresh]] — the
  * loop-carried-stats lesson), and the only driver-side data is the
  * k argmax rows. k rounds = k passes over token arrays whose length
  * SHRINKS monotonically; this is the honest distributed BPE (the
  * delta-pair-maintenance optimization trades a full recount for
  * corpus-sized mutable state, the wrong trade under Spark's
  * immutable-stage model).
  *
  * The per-round pair counts are SQL-replayable: the oracle unrolls k
  * rounds of (split -> pair count -> argmax -> separator-wrapped
  * replace) over the q118 encoding, deriving the SAME merges with the
  * SAME counts — tokenizer training is oracle-gated end to end.
  */
object BpeTrain {

  /** Learn `rounds` merges; returns (round, a, b, pair_count), one row
    * per round in learning order. Stops early (fewer rows) if the
    * corpus runs out of repeated pairs — every remaining pair count
    * would be ambiguous noise.
    *
    * VOCAB-SCALE BATCHING (round 12): each distributed pass learns up
    * to `maxBatchPerPass` merges instead of one, so a 1k-merge vocab
    * costs ~tens of passes, not 1k. The batch is PROVABLY identical to
    * the sequential algorithm — the selection rule is:
    *
    *  1. take the count-sorted (cnt DESC, a, b) candidate PREFIX —
    *     no skipping — while pairs stay pairwise TOKEN-DISJOINT;
    *  2. let B = the count of the first EXCLUDED candidate (by
    *     collision, cap, or end-of-table → B = 1, under the cnt ≥ 2
    *     filter); trim the prefix to members with cnt > B.
    *
    * Why this equals sequential, merge by merge: batch members are
    * token-disjoint, so applying p₁..pᵢ₋₁ leaves cnt(pᵢ) unchanged;
    * every pair NOT in the batch has cnt ≤ B (sorted prefix, no
    * skips); merging pⱼ only creates pairs (x,aⱼbⱼ)/(aⱼbⱼ,y) whose
    * counts are bounded by old cnt(x,aⱼ)/cnt(bⱼ,y) — pairs that share
    * a token with pⱼ, hence NOT selected, hence ≤ B — and only
    * decreases pairs that share tokens. So at sequential step i the
    * strict argmax is still pᵢ (cnt(pᵢ) > B beats everything else,
    * and within the batch the (cnt, a, b) order IS the sequential
    * tie-break). Ties with newly-created pairs are impossible by the
    * STRICT trim. When the trim empties the batch (p₁ itself ties the
    * boundary), the pass falls back to the always-correct single
    * sequential merge. BpeSpec pins batched ≡ sequential on
    * constructed corpora; the q153 oracle re-derives every count.
    */
  def learnMerges(
      docs: DataFrame,
      textCol: String,
      rounds: Int,
      maxBatchPerPass: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // The oracle replays token state through a chr(31)-separated
    // encoding (the q118 contract): a corpus containing the separator
    // would silently diverge, so fail loudly up front.
    require(docs.filter(col(textCol).contains("\u001f")).isEmpty,
      "bpe train: corpus contains the reserved separator chr(31)")
    val state = docs
      .select(col(textCol).cast("string").as("t"))
      .as[String]
      .map(s => (s.codePoints().toArray, 1L))
    learnCore(state, rounds, maxBatchPerPass)
  }

  /** WORD-HISTOGRAM training (round 13) — the corpus-size-independent
    * rung: pre-tokenize on whitespace, aggregate ONCE to a
    * (word, count) histogram, and run the same batched merge loop
    * with count-WEIGHTED pair statistics. Each merge pass then costs
    * O(distinct words), not O(corpus) — the standard scale move for a
    * true 32k vocab — and the one corpus-sized pass is the initial
    * histogram aggregation (one shuffle, map-side combined).
    *
    * Exactness: this equals [[learnMerges]] run over the corpus with
    * EVERY WORD OCCURRENCE AS ITS OWN DOCUMENT (BpeHistogramSpec pins
    * it). It is NOT the same as stream training over raw documents —
    * there merges may cross word boundaries; pre-tokenized training
    * deliberately forbids that (Sennrich et al. 2016 train within
    * word boundaries for exactly this cost reason). Weighted counts
    * keep the equivalence exact: a pair occurring p times inside a
    * word of multiplicity w contributes p·w in both framings, and the
    * batched-≡-sequential argument in [[learnMerges]]'s scaladoc only
    * inspects counts, never row multiplicity.
    */
  def learnMergesHistogram(
      docs: DataFrame,
      textCol: String,
      rounds: Int,
      maxBatchPerPass: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(docs.filter(col(textCol).contains("\u001f")).isEmpty,
      "bpe train: corpus contains the reserved separator chr(31)")
    // Explicit whitespace class shared by BOTH regex engines: Java's
    // \s includes \x0B (vertical tab) but RE2's — which DuckDB's
    // regexp_extract_all(text,'\S+') oracle twin uses — does not, so
    // splitting on \s+ here would diverge on a corpus containing \x0B
    // (round-13 advice). [ \t\n\f\r] means the same thing in both.
    val hist = docs
      .select(explode(split(col(textCol).cast("string"), "[ \\t\\n\\f\\r]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .as[(String, Long)]
      .map { case (w, wc) => (w.codePoints().toArray, wc) }
    learnCore(hist, rounds, maxBatchPerPass)
  }

  /** The shared batched merge loop over weighted token rows — see
    * [[learnMerges]] for the batching equivalence argument (counts
    * here are Σ weights; the argument is count-only, so it applies
    * verbatim).
    */
  private def learnCore(
      state0: Dataset[(Array[Int], Long)],
      rounds: Int,
      maxBatchPerPass: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 4096, s"rounds $rounds out of range 1..4096")
    require(maxBatchPerPass >= 1, s"maxBatchPerPass $maxBatchPerPass must be >= 1")
    val spark = state0.sparkSession
    import spark.implicits._
    // Token representation: INT ids, globally consistent with zero
    // coordination — a code point IS its own id (< 0x110000), learned
    // merge r gets id MergeBase + r. Adjacent pairs pack into one
    // Long key for the count shuffle; only the AGGREGATED pair table
    // (tiny) ever materializes strings, via the driver-side id→string
    // map broadcast into the decode step. At 100 TB this is the
    // difference between shuffling billions of boxed strings per
    // round and shuffling longs.
    val MergeBase = 0x110000
    def pack(a: Int, b: Int): Long = (a.toLong << 32) | (b.toLong & 0xffffffffL)
    var mergeStr = Map.empty[Int, String] // learned ids only
    var stateDf = Ckpt.fresh(state0.toDF("toks", "w"))
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var dry = false
    while (r <= rounds && !dry) {
      val mergedSoFar = mergeStr // stable copy for the executor closure
      val cap = math.min(rounds - r + 1, maxBatchPerPass)
      // candidate list: enough rows past the cap that the batch
      // boundary (first excluded candidate) is always visible
      val limit = 2 * cap + 16
      // candidates with the STRING-order tie-break (count DESC, a, b
      // in binary string order — the oracle's ORDER BY): strings are
      // decoded only on the AGGREGATED pair table, and only the tiny
      // candidate head reaches the driver
      val top = stateDf.as[(Array[Int], Long)]
        .flatMap { case (t, w) =>
          val n = t.length - 1
          val out = new Array[(Long, Long)](math.max(0, n))
          var i = 0
          while (i < n) { out(i) = (pack(t(i), t(i + 1)), w); i += 1 }
          out
        }
        .toDF("pk", "w")
        .groupBy("pk").agg(sum(col("w")).as("cnt"))
        .filter(col("cnt") >= 2) // a pair seen once carries no signal
        .as[(Long, Long)]
        .map { case (pk, cnt) =>
          val aId = (pk >>> 32).toInt; val bId = pk.toInt
          val aStr = if (aId >= MergeBase) mergedSoFar(aId)
            else new String(Character.toChars(aId))
          val bStr = if (bId >= MergeBase) mergedSoFar(bId)
            else new String(Character.toChars(bId))
          (aId, bId, aStr, bStr, cnt)
        }
        .toDF("aid", "bid", "a", "b", "cnt")
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(limit)
        .collect()
        .map(row => (row.getInt(0), row.getInt(1),
          row.getString(2), row.getString(3), row.getLong(4)))
      if (top.isEmpty) dry = true
      else {
        // 1. disjoint sorted prefix, 2. strict-boundary trim (see the
        // equivalence argument in the scaladoc)
        val usedTokens = scala.collection.mutable.HashSet.empty[Int]
        val prefix = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Int, String, String, Long)]
        var boundary = 1L // end-of-table: unseen pairs sit under the cnt>=2 filter
        var stopped = false
        var j = 0
        while (j < top.length && !stopped) {
          val cand = top(j)
          if (prefix.length == cap ||
              usedTokens.contains(cand._1) || usedTokens.contains(cand._2)) {
            boundary = cand._5
            stopped = true
          } else {
            prefix += cand
            usedTokens += cand._1
            usedTokens += cand._2
          }
          j += 1
        }
        val trimmed = prefix.takeWhile(_._5 > boundary)
        // the trim can empty the batch (p1 ties the boundary): fall
        // back to the always-correct single sequential merge
        val batch = if (trimmed.nonEmpty) trimmed.toSeq else Seq(prefix.head)
        val batchMap: Map[Long, Int] = batch.zipWithIndex.map {
          case ((aId, bId, _, _, _), i) => pack(aId, bId) -> (MergeBase + (r - 1) + i)
        }.toMap
        batch.zipWithIndex.foreach { case ((_, _, aStr, bStr, cnt), i) =>
          mergeStr += (MergeBase + (r - 1) + i) -> (aStr + bStr)
          learned += ((r + i, aStr, bStr, cnt))
        }
        val next = Ckpt.fresh(stateDf.as[(Array[Int], Long)].map { case (t, wgt) =>
          // the exact left-to-right non-overlapping merge pass of
          // BpeTokenizer.mergePass, on ids — token-disjoint batch
          // members have non-overlapping sites, so one simultaneous
          // scan IS the sequential pass composition
          val n = t.length
          val out = new Array[Int](n)
          var w = 0; var i = 0
          while (i < n) {
            val hit = if (i + 1 < n) batchMap.get(pack(t(i), t(i + 1))) else None
            hit match {
              case Some(id) => out(w) = id; i += 2
              case None => out(w) = t(i); i += 1
            }
            w += 1
          }
          (java.util.Arrays.copyOf(out, w), wgt)
        }.toDF("toks", "w"))
        // release the superseded corpus-sized checkpoint (the
        // GraphOps.reachPairs loop discipline): without this, up to
        // `rounds` token-array snapshots pile up in executor storage
        graft.streaming.Streams.releaseCheckpoint(stateDf)
        stateDf = next
        r += batch.length
      }
    }
    graft.streaming.Streams.releaseCheckpoint(stateDf)
    learned.toSeq.toDF("round", "a", "b", "pair_count")
      .select(col("round").cast("long"), col("a"), col("b"), col("pair_count"))
  }
}
