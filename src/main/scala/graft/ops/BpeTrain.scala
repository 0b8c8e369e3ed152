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
    */
  def learnMerges(
      docs: DataFrame,
      textCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds $rounds out of range 1..64")
    val spark = docs.sparkSession
    import spark.implicits._
    // The oracle replays token state through a chr(31)-separated
    // encoding (the q118 contract): a corpus containing the separator
    // would silently diverge, so fail loudly up front.
    require(docs.filter(col(textCol).contains("\u001f")).isEmpty,
      "bpe train: corpus contains the reserved separator chr(31)")
    var state: Dataset[Seq[String]] = docs
      .select(col(textCol).cast("string").as("t"))
      .as[String]
      .map(s => BpeTokenizer.tokensWith(IndexedSeq.empty, s).toSeq)
    var stateDf = Ckpt.fresh(state.toDF("toks"))
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var dry = false
    while (r <= rounds && !dry) {
      val top = stateDf.as[Seq[String]]
        .flatMap(t => (0 until math.max(0, t.length - 1)).map(i => (t(i), t(i + 1))))
        .toDF("a", "b")
        .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2) // a pair seen once carries no signal
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) dry = true
      else {
        val a = top(0).getString(0); val b = top(0).getString(1)
        val cnt = top(0).getLong(2)
        learned += ((r, a, b, cnt))
        stateDf = Ckpt.fresh(stateDf.as[Seq[String]].map { t =>
          val arr = t.toArray
          val n = BpeTokenizer.mergePass(arr, arr.length, a, b)
          arr.take(n).toSeq
        }.toDF("toks"))
        r += 1
      }
    }
    learned.toSeq.toDF("round", "a", "b", "pair_count")
      .select(col("round").cast("long"), col("a"), col("b"), col("pair_count"))
  }
}
