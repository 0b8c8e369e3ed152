package graft.bulk

import graft.index.Grams
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed inverted gram index — the bulk-path form of the
  * reference's slot-2/slot-3 index (assemblage_db/src/index.rs:194-356),
  * re-expressed as DataFrame pipelines:
  *
  *   - postings: one row per (doc, gram) with its occurrence count —
  *     built map-side (tokenize + explode) then one shuffle to combine.
  *   - counts: total gram count per doc (= byte length + 3, slot 3).
  *   - search: the `find` kernel (index.rs:194-240) as a broadcast join
  *     of the term's gram multiset against the postings.
  *   - overlapPairs: materialized symmetric overlaps (index.rs:302-347)
  *     as a postings self-join.
  *
  * Scale notes (100 TB): the tokenize stage is embarrassingly parallel;
  * postings aggregation shuffles on (id, gram) which is near-uniform.
  * The self-join shuffles on gram and is skewed by hot grams (spaces,
  * common trigrams) — AQE skew-join handles moderate skew, and
  * `prunedPostings` caps posting-list length (df-style stop-gram
  * pruning) for the approximate scale path.
  */
object GramIndex {

  /** (id, gram, occurrences) — the slot-2 postings table. The native
    * GramPostings kernel tokenizes AND aggregates per document inside
    * one projection (every (id, gram) group's rows all come from that
    * id's single input row), so the postings build is a pure map-side
    * pipeline with zero shuffles — the composed explode + groupBy twin
    * below shuffles the full (id, gram) stream. Grams are
    * unsigned-u32-in-Long so values match external oracles for any
    * byte content (Int would sign-flip for bytes >= 0x80).
    *
    * CONTRACT: `idCol` must be unique across input rows. The kernel
    * aggregates within one row only, so duplicate ids yield duplicate
    * (id, gram) rows — unlike the old groupBy form, which silently
    * MERGED the gram multisets of both rows (a corrupt document state);
    * write-batch callers dedupe per id first (Streams.applyWriteBatch).
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GramPostings.ensureRegistered(docs.sparkSession)
    // The kernel fans each doc out ~len+3×: fan out the compact
    // pre-explode rows when the scan is under-parallel (Tables.fanOut).
    graft.Tables.fanOut(docs)
      .select(col(idCol).as("id"),
        explode(call_function("graft_gram_postings", col(textCol))).as("p"))
      .select(col("id"), col("p.gram").as("gram"), col("p.occurrences").as("occurrences"))
  }

  /** Composed explode + groupBy postings — the cross-check twin of the
    * one-pass kernel form (GramTokensSpec parity).
    */
  def postingsComposed(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GramTokens.ensureRegistered(docs.sparkSession)
    docs
      .select(col(idCol).as("id"),
        explode(call_function("graft_grams", col(textCol))).as("gram"))
      .groupBy(col("id"), col("gram"))
      .agg(count(lit(1)).as("occurrences"))
  }

  /** df-pruning scale path: drop postings of grams occurring in more
    * than `maxDocFreq` docs. Stop-grams (spaces, common trigrams)
    * contribute O(df²) pairs to the overlap self-join and almost no
    * discriminative signal; pruning bounds the join superlinearity at
    * corpus scale. Approximate — the exact operators keep full
    * postings.
    *
    * Agg→broadcast-anti, NOT a window df count: a window would leave
    * the output partitioned on the self-join key (one postings-size
    * shuffle saved) and wins at sf0.1 (1.12 vs 1.66 s), but windows
    * SORT their partitions, and at the 62× leg sorting the postings
    * costs more than the hash shuffle it saves (6.3 vs 3.7 s warm —
    * tools/Prof "pruned" keeps both variants). Hash-agg plus a tiny
    * broadcast anti-join is sort-free: the scale-correct shape.
    */
  def prunedPostings(postings: DataFrame, maxDocFreq: Long): DataFrame = {
    val hot = postings.groupBy("gram")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq)
      .select("gram")
    postings.join(broadcast(hot), Seq("gram"), "left_anti")
  }

  /** (id, cnt) — the slot-3 per-doc total gram count (len(bytes)+3). */
  def counts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), (octet_length(col(textCol)) + lit(3)).cast("long").as("cnt"))

  /** The `find` kernel in AsymmetricBasedOnSourceOnly mode
    * (index.rs:173-240): term → trimmed gram multiset → broadcast join
    * with postings → per-doc intersection → u8 quantization → score
    * filter. Thresholds are compared in integer space (i*10 >= 3*min is
    * exact for u8 operands, avoiding f32 round-trip mismatches).
    *
    * Returns (id, a, b, intersection) sorted by the Overlap ordering
    * (intersection desc, a desc, b desc — data.rs:582-596).
    */
  def search(postings: DataFrame, term: String, minScorePermille: Int = 300): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val grams = Grams.trimForSearch(Grams.indexText(term))
    val sourceCount = grams.length.toLong
    if (!grams.exists(_ != 0)) return emptyResult(postings)
    val src = Grams.occurrences(grams).toSeq
      .map { case (g, occ) => (g & 0xffffffffL, occ.toLong) }
      .toDF("gram", "socc")
    postings
      .join(broadcast(src), "gram")
      .groupBy(col("id"))
      .agg(sum(least(col("socc"), col("occurrences"))).as("inter"))
      .select(
        col("id"),
        lit(255L).as("a"),
        lit(255L).as("b"),
        expr(s"(255 * inter) div $sourceCount").as("intersection"))
      .filter(col("intersection") * 1000 >= lit(minScorePermille.toLong) * least(col("a"), col("b")))
      .orderBy(col("intersection").desc, col("a").desc, col("b").desc, col("id"))
  }

  /** Zero-row result with the SAME schema the non-empty search path
    * produces — `id` preserves the postings' id type (a hardcoded Long
    * would break unions with real results downstream).
    */
  private def emptyResult(postings: DataFrame): DataFrame = {
    val spark = postings.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", postings.schema("id").dataType),
      org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("intersection", org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
  }

  /** Diff::new (index.rs:768-813) as ONE full-outer join — the bulk
    * write path's incremental reindex: `before`/`after` are the
    * postings of the ids touched by a write batch (both restricted to
    * the dirty set); the diff row for every (id, gram) present in
    * either state carries the AFTER occurrence count, 0 for vanished
    * grams — exactly the reference's per-id map merge, flattened.
    * At 100 TB the write path IS this delta: one dirty-sized shuffle
    * instead of a corpus rebuild.
    */
  def gramDiff(before: DataFrame, after: DataFrame): DataFrame = {
    val b = before.select(col("id"), col("gram"), col("occurrences").as("bocc"))
    val a = after.select(col("id"), col("gram"), col("occurrences").as("aocc"))
    b.join(a, Seq("id", "gram"), "full_outer")
      .select(col("id"), col("gram"), coalesce(col("aocc"), lit(0L)).as("occurrences"))
  }

  /** store_grams (index.rs:286-300): merge a [[gramDiff]] into the
    * postings table — diffed (id, gram) slots are replaced by their new
    * count, everything else is untouched. Divergence from the
    * reference (which leaves Occurrences(0) tombstones in the stored
    * maps): zero-count rows are DROPPED — query-equivalent (a zero
    * occurrence contributes nothing to search/overlap intersections)
    * and the right call for a columnar store. The invariant
    * `applyGramDiff(postings(old), gramDiff(...)) == postings(new)` is
    * oracle-checked end-to-end by q69 and spec-checked in
    * BulkReindexSpec.
    */
  def applyGramDiff(postings: DataFrame, diff: DataFrame): DataFrame =
    postings.join(diff.select("id", "gram"), Seq("id", "gram"), "left_anti")
      .unionByName(diff.filter(col("occurrences") > 0))

  /** Salted variant of the overlap join for skewed gram distributions:
    * the zero-padding grams ([0,0,0,x] etc.) appear in EVERY document,
    * so a plain hash join on `gram` sends all their postings to single
    * reducers. Salting splits each hot key `saltFactor` ways: the
    * match side scatters each posting to one random-but-deterministic
    * salt, the source side replicates each posting to all salts —
    * every (gram, salt) partition then holds 1/saltFactor of the hot
    * key's pairs. Identical results to the unsalted join (the
    * pair-level aggregation is salt-agnostic); use when AQE's runtime
    * skew splitting isn't available (e.g. cached inputs).
    */
  def overlapPairsSalted(
      sourcePostings: DataFrame,
      postings: DataFrame,
      counts: DataFrame,
      saltFactor: Int): DataFrame = {
    val p1 = sourcePostings.select(col("id").as("id"), col("gram"), col("occurrences").as("occ1"))
      .withColumn("salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    val p2 = postings.select(col("id").as("match_id"), col("gram"), col("occurrences").as("occ2"))
      .withColumn("salt", pmod(hash(col("match_id")), lit(saltFactor)))
    val pairs = p1
      .join(p2, Seq("gram", "salt"))
      .filter(col("id") =!= col("match_id"))
      .groupBy(col("id"), col("match_id"))
      .agg(sum(least(col("occ1"), col("occ2"))).as("inter"))
    quantizePairs(pairs, counts)
  }

  /** Materialized symmetric overlap pairs (index.rs:302-347): postings
    * self-join on gram, per-pair intersection = sum(min(occ_a, occ_b)),
    * u8 quantization against max(count_a, count_b), score > 0.5 kept
    * (2*intersection > min(a, b), exact in integers). Both directions
    * are emitted, matching the reference's forward + reverse rows.
    */
  def overlapPairs(postings: DataFrame, counts: DataFrame): DataFrame =
    overlapPairsFrom(postings, postings, counts)

  /** Incremental form of store_overlaps (index.rs:302-347): the
    * reference recomputes overlaps only for the dirty ids touched by a
    * mutation; here `sourcePostings` is the dirty subset and the cost is
    * linear in it instead of quadratic in the corpus.
    */
  def overlapPairsFrom(
      sourcePostings: DataFrame,
      postings: DataFrame,
      counts: DataFrame): DataFrame = {
    val p1 = sourcePostings.select(col("id").as("id"), col("gram"), col("occurrences").as("occ1"))
    val p2 = postings.select(col("id").as("match_id"), col("gram"), col("occurrences").as("occ2"))
    val pairs = p1
      .join(p2, Seq("gram"))
      .filter(col("id") =!= col("match_id"))
      .groupBy(col("id"), col("match_id"))
      .agg(sum(least(col("occ1"), col("occ2"))).as("inter"))
    quantizePairs(pairs, counts)
  }

  /** u8 quantization + score-threshold tail shared by the overlap
    * joins: (id, match_id, inter) × counts → (id, match_id, a, b,
    * intersection) with 2*intersection > min(a, b).
    */
  private def quantizePairs(pairs: DataFrame, counts: DataFrame): DataFrame = {
    val c1 = counts.select(col("id"), col("cnt").as("cnt1"))
    val c2 = counts.select(col("id").as("match_id"), col("cnt").as("cnt2"))
    pairs
      .join(c1, "id")
      .join(c2, "match_id")
      .withColumn("maxc", greatest(col("cnt1"), col("cnt2")))
      .select(
        col("id"),
        col("match_id"),
        expr("(255 * cnt1) div maxc").as("a"),
        expr("(255 * cnt2) div maxc").as("b"),
        expr("(255 * inter) div maxc").as("intersection"))
      .filter(col("intersection") * 2 > least(col("a"), col("b")))
  }
}
