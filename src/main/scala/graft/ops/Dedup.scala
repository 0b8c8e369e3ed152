package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines:
  * exact (digest groupBy), n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (100 TB):
  *   - exact dedup is one hash shuffle on the digest — near-uniform keys.
  *   - Jaccard pairs go through an inverted shingle index (join on
  *     shingle), never a cross join; hot shingles are the skew risk —
  *     `maxShingleFreq` drops stop-shingles (df-pruning) on the scale
  *     path, and AQE skew-join splits the rest.
  *   - MinHash signatures are one groupBy with `numPerm` min() aggregates
  *     (columns, not a numPerm× row blowup); LSH banding turns the
  *     quadratic candidate space into equi-joins on (band, key).
  *   - SimHash reduces each doc to one 60-bit fingerprint; the
  *     Hamming-ball join uses the pigeonhole chunk trick (4 chunks →
  *     any pair within distance d shares a chunk if d < 4) so it is
  *     also an equi-join, verified by bit_count(xor).
  */
object Dedup {

  /** Exact dedup: every row mapped to its group's canonical (min) id.
    * One shuffle on the content digest; `group_size > 1` marks dups.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy("digest")
    docs
      .select(col(idCol).as("id"), md5(col(textCol)).as("digest"))
      .withColumn("canonical_id", min("id").over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select(col("id"), col("canonical_id"), col("group_size"))
  }

  /** Distinct (id, shingle) pairs — the inverted index feeding Jaccard
    * and MinHash. `maxShingleFreq` (scale path) drops shingles appearing
    * in more than that many docs: stop-shingles contribute O(df²) join
    * pairs but almost no discriminative signal.
    */
  def shingleSets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      maxShingleFreq: Option[Int] = None): DataFrame = {
    val sets = docs
      .select(col(idCol).as("id"), explode(Hashing.shingles(col(textCol), k)).as("shingle"))
      .distinct()
    maxShingleFreq.fold(sets) { cap =>
      val hot = sets.groupBy("shingle").count().filter(col("count") > cap).select("shingle")
      sets.join(hot, Seq("shingle"), "left_anti")
    }
  }

  /** Scale-path Jaccard near-dup pairs from raw docs: the native
    * ShingleSet kernel dedups per doc in memory (no distinct()
    * shuffle), and the df-cap is ALWAYS applied — shingles appearing
    * in more than `maxShingleFreq` docs are stop-shingles that
    * contribute O(df²) join pairs and almost no signal; dropping them
    * is what keeps the inverted-index self-join alive at 100 TB. The
    * df aggregation shuffles on the same key as the pair join, so its
    * exchange is reused; the hot set and per-doc sizes are broadcast.
    * Set sizes count KEPT shingles only (cap mirrored by the oracle).
    */
  def jaccardPairsNative(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      num: Int,
      den: Int,
      maxShingleFreq: Int): DataFrame = {
    graft.functions.DedupKernels.ensureRegistered(docs.sparkSession)
    // the index joins on 60-bit shingle HASHES, not strings — 8-byte
    // shuffle keys with cheap equality (the reference's gram index
    // makes the same move to integer grams); the oracle hashes
    // identically, so any collision merges the same pair on both sides.
    // fanOut: the shingle kernel fans each doc out ~token-count×, so an
    // under-parallel scan (single small row group) would run the whole
    // map side serially — no-op on real cluster scans.
    // The exploded frame is NOT checkpointed, although the shingle
    // kernel consequently runs twice (df agg + kept materialization):
    // a round-16 A/B of the one-kernel-pass shape (Ckpt.fresh here,
    // both consumers reading it) measured WORSE — q31 2.01→2.41,
    // q37 2.02→2.52, q103 3.74→4.04 s on a paired subset — the raw
    // exploded materialization (pre-prune, every stop-shingle row)
    // costs more than the second kernel pass it saves, the same trade
    // the audio-winnow fingerprint checkpoint lost (AudioWinnow
    // round-15 note) and the LSH band keys WON (they explode 16×
    // fewer rows per doc). Kernel cost vs materialized bytes decides
    // this per operator; do not re-try without new evidence.
    val exploded = graft.Tables.fanOut(docs).select(
      col(idCol).as("id"),
      explode(call_function("graft_shingle_hashes", col(textCol), lit(k))).as("shingle"))
    // Stop-shingle prune stays agg→broadcast-anti, NOT a window df
    // count — the round-13 lesson holds (windows sort the whole
    // exploded table; the hash agg's shuffle carries only map-side
    // partial (shingle, count) rows, never the frame). See tools/Prof
    // "jacprune".
    val hot = exploded.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxShingleFreq).select("shingle")
    // Checkpoint the KEPT frame in SCAN layout (round 16 — reverting
    // round 15's repartition(shingle)-then-checkpoint): the
    // shingle-clustered layout was a local-bench wash and a SCALE
    // REGRESSION. Evidence (tools/Prof "jacshape", interleaved warm
    // A/B, AQE on): at sf0.1 shipped-vs-scan-layout 1.73-1.91 vs
    // 1.74-1.84 s (neutral — the self-join goes BROADCAST here, so
    // layout only moves probe-task balance); at the ScaleGen 62× leg,
    // where the self-join is a SortMergeJoin (executed plan committed,
    // plans/r16/jaccard_pairs_executed.txt), 24.6-43.7 vs 10.8-11.9 s
    // — the repartition pays a full exchange of the corpus-sized kept
    // frame that buys NOTHING downstream, because the eager
    // localCheckpoint reports UnknownPartitioning(0) and the SMJ
    // re-exchanges both sides regardless (the round-15 plan dump
    // itself showed the partitioning loss). Guide §2.4: remove
    // shuffles outright. Per-doc `sizes` is corpus-proportional, so
    // it carries NO broadcast hint — AQE picks the join strategy from
    // its actual size (broadcast at bench scale, shuffle at 100 TB
    // where forcing it through the driver would OOM).
    val kept = exploded.join(broadcast(hot), Seq("shingle"), "left_anti")
      .localCheckpoint()
    val sizes = kept.groupBy("id").agg(count(lit(1)).as("setsize"))
    // Pair generation stays the codegen'd self-join: a collect_list +
    // combinations-explode variant (one exchange instead of two) was
    // A/B-benched and LOST (2.20 vs 1.50 s at sf0.1) — interpreted
    // higher-order lambdas and the non-codegen object aggregate cost
    // more than the second exchange read saves.
    val a = kept.select(col("id").as("id_a"), col("shingle"))
    val b = kept.select(col("id").as("id_b"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("id_a"), col("setsize").as("size_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("setsize").as("size_b")), "id_b")
      .withColumn("union_size", col("size_a") + col("size_b") - col("inter"))
      .filter(col("inter") * den > col("union_size") * num)
      .select(col("id_a"), col("id_b"), col("inter"), col("union_size"))
  }

  /** Near-dup pairs by exact n-gram Jaccard: inverted-index self-join,
    * |∩| per pair, |∪| from per-doc set sizes. The threshold is a
    * rational `num/den` compared in integer space (no FP) — e.g.
    * (1, 2) keeps jaccard > 0.5. Emits id_a < id_b once.
    */
  def jaccardPairs(shingleSets: DataFrame, num: Int, den: Int): DataFrame = {
    val sizes = shingleSets.groupBy("id").agg(count(lit(1)).as("setsize"))
    val a = shingleSets.select(col("id").as("id_a"), col("shingle"))
    val b = shingleSets.select(col("id").as("id_b"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("id_a"), col("setsize").as("size_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("setsize").as("size_b")), "id_b")
      .withColumn("union_size", col("size_a") + col("size_b") - col("inter"))
      .filter(col("inter") * den > col("union_size") * num)
      .select(col("id_a"), col("id_b"), col("inter"), col("union_size"))
  }

  /** Minhash permutation family: universal affine hashes
    * `(A_i * h + B_i) mod P` over ONE base md5 hash per shingle —
    * one md5 instead of numPerm md5s per shingle row (the md5s were
    * ~80% of signature cost). P = 2^31 - 1 keeps A*h + B < 2^63.
    * Constants are md5-derived so any external engine can re-derive
    * the exact signatures.
    */
  val MinhashPrime: Long = 2147483647L
  def minhashCoeffs(numPerm: Int): IndexedSeq[(Long, Long)] =
    (0 until numPerm).map(i => (
      Hashing.hash60Jvm(s"a$i") % (MinhashPrime - 1) + 1,
      Hashing.hash60Jvm(s"b$i") % MinhashPrime))

  /** MinHash signatures in one pass: the native MinHashSig kernel
    * tokenizes, shingles, hashes and folds the numPerm minima per doc
    * inside a single projection — the doc never leaves its input
    * partition (the composed form below costs a shingle explode +
    * distinct shuffle + a 64-aggregate groupBy). Docs with fewer than
    * k tokens have no shingles and are dropped, matching the composed
    * form's groupBy output.
    */
  def minhashSignaturesNative(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      numPerm: Int): DataFrame = {
    graft.functions.DedupKernels.ensureRegistered(docs.sparkSession)
    docs
      .select(
        col(idCol).as("id"),
        call_function("graft_minhash_sig", col(textCol), lit(k), lit(numPerm)).as("sig"))
      .filter(col("sig").isNotNull)
  }

  /** Composed MinHash signatures: one groupBy over the shingle sets
    * with `numPerm` min(affine hash) aggregates — signature as columns,
    * then assembled into the `sig` array. Kept as the cross-check twin
    * of [[minhashSignaturesNative]] (DedupKernelsSpec parity).
    */
  def minhashSignatures(shingleSets: DataFrame, numPerm: Int): DataFrame = {
    val coeffs = minhashCoeffs(numPerm)
    val withBase = shingleSets.withColumn("h", Hashing.hash60(col("shingle")) % MinhashPrime)
    val aggs = coeffs.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % MinhashPrime).as(s"h$i")
    }
    withBase
      .groupBy("id")
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("sig", array((0 until numPerm).map(i => col(s"h$i")): _*))
      .select("id", "sig")
  }

  /** LSH banding: each signature split into `bands` bands of `rowsPerBand`
    * values; band key = md5 of the comma-joined slice. Docs colliding in
    * any band become candidate pairs (id_a < id_b, distinct) — an
    * equi-join on (band, key), no quadratic work.
    */
  def lshCandidates(signatures: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val keys = signatures.select(
      col("id"),
      explode(array((0 until bands).map { j =>
        struct(
          lit(j).as("band"),
          md5(concat_ws(",",
            (0 until rowsPerBand).map(r =>
              element_at(col("sig"), j * rowsPerBand + r + 1).cast("string")): _*)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    keys.as("x")
      .join(keys.as("y"), Seq("band", "key"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
  }

  /** MinHash+LSH near-dup pairs, verified: LSH candidates filtered by
    * exact Jaccard above num/den. The verification joins the shingle
    * sets down to candidate ids FIRST, so exact-Jaccard cost is linear
    * in the candidate set, never quadratic in the corpus — this is the
    * whole point of the LSH path vs. plain jaccardPairs.
    */
  def minhashLshPairs(
      shingleSets: DataFrame,
      numPerm: Int,
      bands: Int,
      num: Int,
      den: Int): DataFrame = {
    // The band-key self-join and the two downstream uses would each
    // recompute the signature pipeline — localCheckpoint materializes
    // both layers once (auto-reclaimed, unlike a leaked persist); the
    // candidate frames are corpus-proportional, so no broadcast hints —
    // AQE sizes the joins.
    val signatures = minhashSignatures(shingleSets, numPerm).localCheckpoint()
    val candidates = lshCandidates(signatures, bands, numPerm / bands).localCheckpoint()
    val candidateIds = candidates.select(col("id_a").as("id"))
      .unionByName(candidates.select(col("id_b").as("id")))
      .distinct()
    val subset = shingleSets.join(candidateIds, Seq("id"), "left_semi")
    jaccardPairs(subset, num, den)
      .join(candidates, Seq("id_a", "id_b"), "left_semi")
  }

  /** Scale-path MinHash+LSH near-dup pairs, starting from raw docs:
    * native one-pass signatures (no shingle materialization for the
    * signature phase), LSH banding for candidates, then exact-Jaccard
    * verification with the shingle explode restricted to candidate
    * docs only — at 100 TB the expensive inverted index is built over
    * the (tiny) candidate set, never the corpus. Result-identical to
    * [[minhashLshPairs]] over the full shingle sets.
    */
  def minhashLshPairsNative(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      numPerm: Int,
      bands: Int,
      num: Int,
      den: Int,
      maxBandFreq: Int = 0): DataFrame = {
    graft.functions.DedupKernels.ensureRegistered(docs.sparkSession)
    // Band keys straight from the kernel: posexplode references the
    // expression once (a sig-array intermediate would be inlined into
    // every per-band element_at — numPerm recomputes per row), and
    // null (sub-k-token) docs vanish in the explode for free. (No
    // fanOut: the band self-join gives the heavy stage its parallelism,
    // and the extra exchange measured slower — 1.35 vs 1.97 s at sf0.1.)
    // Hot-bucket discipline (maxBandFreq > 0): a band key shared by M
    // docs yields M²/2 pairs in ONE bucket of the self-join — under
    // the mass duplication a web crawl actually has (boilerplate,
    // templated pages) a single hot key is a straggler task that never
    // finishes at 100 TB. Keys above the cap are stop-buckets: they
    // assert "these docs are all near-identical", and the capped
    // operator's contract is that such pairs are handled by the
    // CLUSTERING path (lshStarEdges ≡ same components at O(M) edges),
    // not enumerated pairwise. Same agg → broadcast-anti shape as the
    // stop-shingle prune above (sort-free, scan-sided — the 100 TB
    // shape). 0 = off (the exact-LSH contract, oracle-pinned by q32).
    // The raw band-key frame is referenced 2-3× downstream (df-cap agg
    // + anti + both self-join sides) and each reference re-runs the
    // minhash kernel — checkpoint it once (round 15; same move as the
    // jaccard kept-frame, delta-proportional cost: ~numPerm/bands keys
    // per doc).
    val rawKeys = docs.select(
      col(idCol).as("id"),
      posexplode(call_function(
        "graft_minhash_bands", col(textCol), lit(k), lit(numPerm), lit(bands))).as(Seq("band", "key")))
      .localCheckpoint()
    val keys = lshBandFreqPrune(rawKeys, maxBandFreq)
    // candidates feed two consumers (id restriction + final semi-join):
    // localCheckpoint materializes the band self-join once and is
    // reclaimed with the frame (persist leaked cache between queries).
    // Candidate frames scale with the dup rate, not a constant — no
    // broadcast hints, AQE sizes the joins at runtime.
    val candidates = keys.as("x")
      .join(keys.as("y"), Seq("band", "key"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
      .localCheckpoint()
    val candidateIds = candidates.select(col("id_a").as("id"))
      .unionByName(candidates.select(col("id_b").as("id")))
      .distinct()
    val candidateDocs = docs.join(
      candidateIds, col(idCol) === candidateIds("id"), "left_semi")
    val subset = shingleSets(candidateDocs, idCol, textCol, k)
    jaccardPairs(subset, num, den)
      .join(candidates, Seq("id_a", "id_b"), "left_semi")
  }

  /** Incremental dedup: near-dup pairs of a DELTA batch against a
    * STANDING corpus — the shape a growing corpus actually runs (every
    * ingest checks the new batch against everything already kept;
    * re-running the full self-join per batch would be quadratic in
    * corpus count). Candidates = delta band keys equi-joined against
    * standing band keys — never standing×standing, so candidate volume
    * scales with the DELTA; verification is exact Jaccard restricted
    * to candidate docs, as in [[minhashLshPairsNative]].
    *
    * Here the standing band keys are recomputed (one zero-shuffle
    * map-side kernel pass over the corpus feeding the join); in
    * production they are the persisted signature index — a versioned
    * table bucketed by (band, key), maintained by the same write-batch
    * delta fold as the gram postings (GramIndex.applyGramDiff) — which
    * turns the candidate join co-located. Returns (delta_id, corpus_id,
    * inter, union_size).
    */
  def minhashLshDeltaPairsNative(
      standing: DataFrame,
      delta: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      numPerm: Int,
      bands: Int,
      num: Int,
      den: Int): DataFrame =
    minhashLshDeltaPairsIndexed(
      minhashBandKeys(standing, idCol, textCol, k, numPerm, bands),
      standing, delta, idCol, textCol, k, numPerm, bands, num, den)

  /** Band-key index rows (id, band, key) for a doc frame — the
    * PERSISTED-SIGNATURE-INDEX form of an LSH corpus: maintain these
    * rows incrementally (append per ingested batch, like the gram
    * postings) and the per-batch delta join never re-runs the minhash
    * kernel over the standing corpus. Sub-k-token docs vanish in the
    * explode (no index rows), matching the pair semantics.
    */
  def minhashBandKeys(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      numPerm: Int,
      bands: Int): DataFrame = {
    graft.functions.DedupKernels.ensureRegistered(docs.sparkSession)
    docs.select(
      col(idCol).as("id"),
      posexplode(call_function(
        "graft_minhash_bands", col(textCol), lit(k), lit(numPerm), lit(bands))).as(Seq("band", "key")))
  }

  /** Drop band keys whose document frequency exceeds `cap` (0 = off).
    * Same discipline as the stop-shingle prune: hash-agg the df on the
    * join key (exchange reused by the downstream equi-join), broadcast
    * the tiny hot set, anti-join — no window sort, standing side stays
    * a scan. Shared by the self-join, delta, and star-edge paths so
    * the cap means the same thing everywhere.
    */
  private def lshBandFreqPrune(bandKeys: DataFrame, cap: Int): DataFrame =
    if (cap <= 0) bandKeys
    else {
      val hot = bandKeys.groupBy("band", "key").agg(count(lit(1)).as("df"))
        .filter(col("df") > cap).select("band", "key")
      bandKeys.join(broadcast(hot), Seq("band", "key"), "left_anti")
    }

  /** Anchored star-edge LSH candidates: one (anchor, member) edge per
    * non-anchor bucket member, anchor = min id per `(band, key)`
    * bucket — O(M) edges where the all-pairs self-join emits M²/2.
    * For any consumer that only needs CONNECTED COMPONENTS of the
    * bucket co-membership graph (dedup clustering: same bucket ⇒ same
    * cluster), the star graph is provably equivalent: within one
    * bucket every member connects to the anchor (star ⊆ pairs, and
    * any all-pairs edge u−v is covered by u−anchor−v), so the
    * components — and the min-id labels — are identical. This is the
    * 100 TB hot-bucket discipline: a boilerplate key shared by 10M
    * docs costs 10M edges, not 5·10¹³ pairs, and the per-bucket work
    * is a window min over ONE sorted partition (linear, no join).
    *
    * Returns (id_a = anchor, id_b = member) with id_a < id_b, distinct
    * across buckets. Sub-k-token docs vanish with their band keys.
    *
    * Shape: hash-agg the anchor per (band, key), equi-join back on the
    * same key — NOT a window min, which would sort the entire band-key
    * table (the jacprune lesson: at the 62× leg sorting the exploded
    * frame costs more than the hash shuffle it saves). Both stages
    * partition on (band, key), so the join reuses the agg's exchange.
    */
  def lshStarEdges(bandKeys: DataFrame): DataFrame = {
    val anchors = bandKeys.groupBy("band", "key").agg(min(col("id")).as("anchor"))
    bandKeys.join(anchors, Seq("band", "key"))
      .filter(col("id") =!= col("anchor"))
      .select(col("anchor").as("id_a"), col("id").as("id_b"))
      .distinct()
  }

  /** MinHash+LSH dedup CLUSTERS straight from raw docs: components of
    * the band-bucket co-membership graph via [[lshStarEdges]], labels
    * from [[Components.dedupClusters]] (min id per component; isolated
    * docs label themselves). This — not pairwise enumeration — is the
    * production near-dup grouping shape for a mass-duplicated corpus:
    * candidate volume is linear in the index size under ANY skew, and
    * there is no Jaccard verification stage (the bucket graph IS the
    * near-dup relation; callers needing verified pairs use
    * [[minhashLshPairsNative]], optionally df-capped). `maxBandFreq`
    * composes: capped keys drop out of the bucket graph on both the
    * Spark and oracle sides.
    */
  def minhashLshClustersNative(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      numPerm: Int,
      bands: Int,
      maxBandFreq: Int = 0): DataFrame = {
    // Checkpoint the band keys once: lshStarEdges references them
    // twice (anchor agg + join back) and the df-cap prune adds two
    // more — each reference otherwise re-runs the minhash kernel.
    val keys = lshBandFreqPrune(
      minhashBandKeys(docs, idCol, textCol, k, numPerm, bands)
        .localCheckpoint(), maxBandFreq)
    Components.dedupClusters(
      docs.select(col(idCol).as("id")), lshStarEdges(keys))
  }

  /** Delta near-dup pairs against a PRE-COMPUTED standing band-key
    * index ([[minhashBandKeys]] rows of `standing`). Result-identical
    * to [[minhashLshDeltaPairsNative]]; the difference is the cost
    * model — the standing side contributes one columnar index scan to
    * the candidate equi-join instead of a full minhash-kernel pass, so
    * a long-running ingest gate pays O(delta) kernel work per batch,
    * not O(corpus). `standing` itself is only consulted for candidate
    * verification (semi-join restricted to candidate ids).
    *
    * `broadcastDelta = true` pins the delta side of every join as the
    * broadcast build: the standing index and corpus are then pure
    * probe-side SCANS — zero shuffle of standing state per batch. This
    * is THE 100 TB ingest shape (a micro-batch's band keys are KBs
    * against a TB-scale index; a sort-merge plan would re-shuffle the
    * whole index every batch). Leave it false for deltas of unbounded
    * size (backfills) — AQE then sizes the joins from runtime stats.
    */
  /** The candidate stage of [[minhashLshDeltaPairsIndexed]]: the
    * delta's band keys equi-joined against the standing index (minus
    * the delta's own re-ingested ids), one (delta_id, corpus_id) row
    * per colliding pair. Exposed so plan audits pin the production
    * subtree (the full operator localCheckpoints this frame, which
    * detaches it from the inspected plan) and so custom pipelines can
    * consume raw candidates.
    */
  def lshDeltaCandidates(
      standingIndex: DataFrame,
      delta: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      numPerm: Int,
      bands: Int,
      broadcastDelta: Boolean = false,
      maxBandFreq: Int = 0): DataFrame = {
    graft.functions.DedupKernels.ensureRegistered(delta.sparkSession)
    def small(df: DataFrame): DataFrame = if (broadcastDelta) broadcast(df) else df
    val deltaIds = delta.select(col(idCol).as("delta_dup_id"))
    // Hot-bucket cap on the STANDING index (maxBandFreq > 0): one hot
    // standing key matched by one delta doc yields df(standing)
    // candidates — under mass boilerplate that is a per-batch
    // straggler. The df agg shuffles on the candidate join's own key
    // (exchange reused); in the persisted-index production shape the
    // df column is maintained WITH the index, making the prune a scan
    // filter. 0 = off (gate/oracle contract unchanged).
    val indexOnly = lshBandFreqPrune(standingIndex, maxBandFreq).join(
      small(deltaIds), col("id") === col("delta_dup_id"), "left_anti")
    indexOnly.as("s")
      .join(small(minhashBandKeys(delta, idCol, textCol, k, numPerm, bands).as("d")),
        Seq("band", "key"))
      .select(col("d.id").as("delta_id"), col("s.id").as("corpus_id"))
      .distinct()
  }

  def minhashLshDeltaPairsIndexed(
      standingIndex: DataFrame,
      standing: DataFrame,
      delta: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      numPerm: Int,
      bands: Int,
      num: Int,
      den: Int,
      broadcastDelta: Boolean = false,
      maxBandFreq: Int = 0): DataFrame = {
    graft.functions.DedupKernels.ensureRegistered(standing.sparkSession)
    def small(df: DataFrame): DataFrame = if (broadcastDelta) broadcast(df) else df
    // A re-ingested id present on both sides (Streams.DedupGate replays)
    // would pair against its own stale copy and double its (id, shingle)
    // rows in the verify stage, corrupting inter/union_size. The delta
    // copy is authoritative: drop the standing twin (index rows AND
    // verify-side doc rows) before the candidate join.
    val deltaIds = delta.select(col(idCol).as("delta_dup_id"))
    val standingOnly = standing.join(
      small(deltaIds), col(idCol) === col("delta_dup_id"), "left_anti")
    val candidates = lshDeltaCandidates(
        standingIndex, delta, idCol, textCol, k, numPerm, bands, broadcastDelta,
        maxBandFreq)
      .localCheckpoint() // three consumers; band-key pipelines are expensive
    val candIds = candidates.select(col("delta_id").as("id"))
      .unionByName(candidates.select(col("corpus_id").as("id")))
      .distinct()
    // candIds is candidate-pair-sized — delta-bounded, so it rides the
    // same broadcast rule against the corpus-sized doc frame
    val candDocs = standingOnly.unionByName(delta)
      .join(small(candIds), col(idCol) === candIds("id"), "left_semi")
    val verified = jaccardPairs(shingleSets(candDocs, idCol, textCol, k), num, den)
    candidates.join(verified,
        col("id_a") === least(col("delta_id"), col("corpus_id")) &&
        col("id_b") === greatest(col("delta_id"), col("corpus_id")))
      .select("delta_id", "corpus_id", "inter", "union_size")
  }

  /** 60-bit SimHash fingerprints over tf-weighted tokens: per bit, the
    * signed sum of token counts (+cnt if the token hash has the bit,
    * −cnt otherwise); fingerprint has bit b set iff the sum is positive.
    * One-pass native kernel: the whole tokenize → tf → 60 signed sums →
    * fingerprint fold runs inside a single projection, so the
    * fingerprint phase has ZERO shuffles (the composed form costs a
    * token explode + two groupBy shuffles with 60 sum() aggregates —
    * measured 13.4 s vs ~0.5 s at sf0.1).
    */
  def simhashFingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.DedupKernels.ensureRegistered(docs.sparkSession)
    graft.Tables.fanOut(docs)
      .select(
        col(idCol).as("id"),
        call_function("graft_simhash60", col(textCol)).as("fingerprint"))
      .filter(col("fingerprint").isNotNull)
  }

  /** Composed SimHash fingerprints (explode + groupBy form) — kept as
    * the cross-check twin of the native kernel (DedupKernelsSpec
    * parity).
    */
  def simhashFingerprintsComposed(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(Hashing.tokens(col(textCol))).as("token"))
      .groupBy("id", "token")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("th", Hashing.hash60(col("token")))
    val bitSums = (0 until 60).map(b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(1) === 1, col("cnt")).otherwise(-col("cnt")))
        .as(s"s$b"))
    val fp = (0 until 60)
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    tf.groupBy("id")
      .agg(bitSums.head, bitSums.tail: _*)
      .withColumn("fingerprint", fp)
      .select("id", "fingerprint")
  }

  /** Near-dup pairs within Hamming distance `maxHamming` of the 60-bit
    * SimHash: pigeonhole over 4 15-bit chunks (any pair with distance
    * ≤ 3 collides on some chunk; larger budgets still prune massively),
    * then exact bit_count(xor) verification. Equi-joins only.
    */
  def simhashPairs(fingerprints: DataFrame, maxHamming: Int): DataFrame = {
    val chunks = fingerprints.select(
      col("id"),
      col("fingerprint"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("fingerprint"), c * 15).bitwiseAND(0x7fff).as("ckey"))
      }: _*)).as("ck"))
      .select(col("id"), col("fingerprint"), col("ck.chunk"), col("ck.ckey"))
    chunks.as("x")
      .join(chunks.as("y"), Seq("chunk", "ckey"))
      .filter(col("x.id") < col("y.id"))
      .select(
        col("x.id").as("id_a"),
        col("y.id").as("id_b"),
        bit_count(col("x.fingerprint").bitwiseXOR(col("y.fingerprint"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact-substring repetition analysis (the repeated-span pass of
    * Lee et al. 2021, "Deduplicating Training Data Makes Language
    * Models Better"): for every document, how many of its `width`-char
    * windows occur more than once ANYWHERE in the corpus (including
    * elsewhere in the same document). Long verbatim repeats — licence
    * boilerplate, templated pages, copy-paste — light up as high
    * `repeated_permille`; the downstream curation decision (drop the
    * doc, or cut the spans) is the caller's.
    *
    * Plan shape: the native WindowHashes kernel emits all stride-1
    * window hashes in one rolling pass; the exploded (doc, h) stream
    * is O(corpus chars) rows of 16 bytes. Three structural savings
    * keep the rest cheap:
    *   - `n_windows` is just length − width + 1 — computed from the
    *     doc row, never aggregated from the window stream;
    *   - only hashes with global multiplicity > 1 matter, so the
    *     multiplicity table is filtered to the REPEATED set before any
    *     join (one map-combined groupBy on `h` — the only wide shuffle
    *     of the window stream);
    *   - the repeated set is materialized and, when it fits (it is
    *     the near-dup/boilerplate mass, a sliver of the corpus on
    *     anything worth training on), BROADCAST into a semi-join — the
    *     window stream is then never sorted or reshuffled; above the
    *     cap it degrades to the shuffle semi-join with AQE skew
    *     handling.
    * Linear end to end — the published suffix-array build needs a
    * global sort; this is the shuffle-native equivalent for fixed
    * window width. At 100 TB, raise the stride to S ≤ width/2
    * (detects every repeat of length ≥ width + S) to cut the row
    * stream S×; stride 1 is the exact, oracle-able form.
    */
  def exactSubstrRepeats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      width: Int,
      broadcastRepCap: Long = 4000000L): DataFrame = {
    graft.functions.TextHashes.ensureRegistered(docs.sparkSession)
    val w = graft.Tables.fanOut(docs).select(
      col(idCol).as("doc_id"),
      explode(call_function("graft_window_hashes", col(textCol), lit(width))).as("h"))
    val rep = w.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .select("h")
      .localCheckpoint()
    val repSide = if (rep.count() <= broadcastRepCap) broadcast(rep) else rep
    val hits = w.join(repSide, Seq("h"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_repeated"))
    docs.select(
        col(idCol).as("doc_id"),
        greatest(length(col(textCol)) - (width - 1), lit(0)).cast("long").as("n_windows"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_windows"),
        coalesce(col("n_repeated"), lit(0L)).as("n_repeated"),
        expr("(coalesce(n_repeated, 0L) * 1000) div greatest(n_windows, 1)")
          .as("repeated_permille"))
  }

  /** The 100 TB scale path of [[exactSubstrRepeats]] — previously only
    * documented, now a real operator: winnowed fingerprints
    * (graft.functions.WinnowedHashes — the leftmost-argmin of every
    * stride-window of rolling hashes) replace the full window stream,
    * cutting the exploded row volume to ~2/(stride+1) of stride 1
    * while KEEPING the detection guarantee: every repeated substring
    * of length ≥ width + stride − 1 spans a full stride-window of
    * content-determined hashes in each copy, so both copies select its
    * minimum and collide in the multiplicity index (the winnowing
    * theorem; ExactSubstrSpec plants misaligned copies at exactly the
    * guarantee length and asserts detection, plus measures the row
    * reduction). Naive every-S-th-window striding has NO such
    * guarantee — misaligned copies sample different windows.
    *
    * Same plan shape as stride 1: one kernel pass, map-combined
    * multiplicity agg, broadcast-semi join under the cap. Counts are
    * over SELECTED fingerprints (a content-deterministic sample), so
    * `selected_rep_permille` is the detection-pass statistic, not
    * q96's exact per-window mass — the flagged set is what a 100 TB
    * pipeline feeds to the exact pass or the span trimmer.
    */
  def exactSubstrRepeatsStrided(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      width: Int,
      stride: Int,
      broadcastRepCap: Long = 4000000L): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    graft.functions.TextHashes.ensureRegistered(docs.sparkSession)
    val w = graft.Tables.fanOut(docs).select(
      col(idCol).as("doc_id"),
      explode(call_function("graft_winnowed_hashes",
        col(textCol), lit(width), lit(stride))).as("h"))
    val rep = w.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .select(col("h"), lit(1).as("is_rep"))
      .transform(Ckpt.fresh)
    val repSide = if (rep.count() <= broadcastRepCap) broadcast(rep) else rep
    // One left join + one agg computes BOTH per-doc counts, so the
    // winnowing kernel — the operator's dominant cost — runs exactly
    // twice (rep build + this pass), matching stride 1's pass count.
    val per = w.join(repSide, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_selected"), count(col("is_rep")).as("n_repeated"))
    docs.select(col(idCol).as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        coalesce(col("n_repeated"), lit(0L)).as("n_repeated"),
        expr("(coalesce(n_repeated, 0L) * 1000) div greatest(coalesce(n_selected, 0L), 1)")
          .as("selected_rep_permille"))
  }

  /** Incremental exact-substring check — the substring member of the
    * delta family (q85 MinHash, q93 embeddings): a new batch's windows
    * tested against the STANDING corpus's window-multiplicity index
    * plus within-batch repeats, without re-scanning standing documents'
    * text. Result-identical to [[exactSubstrRepeats]] over
    * standing ∪ delta restricted to the delta docs (the spec parity).
    *
    * Plan shape: the standing side contributes ONE probe — its
    * multiplicity index semi-joined against the broadcast delta-hash
    * set (emitting only delta-relevant rows, a delta-bounded frame);
    * in production that index is a persisted table bucketed by hash,
    * maintained by the same append fold as the band-key index, making
    * the probe a bucket-pruned lookup instead of a scan. Everything
    * downstream (combined multiplicity, repeated set, per-doc counts)
    * is delta-bounded and broadcast-joined. Re-ingested ids are
    * anti-joined out of the standing side first (the delta copy is
    * authoritative), as in the MinHash delta.
    */
  /** The shared delta-probe plumbing of the two incremental
    * exact-substring forms (stride-1 q99 / winnowed q116): build the
    * delta's fingerprint stream with `fingerprints`, probe the
    * standing side's multiplicity index (recomputed here with the same
    * builder; maintained state in production), and return
    * (delta fingerprint stream, repeated-hash set (h, is_rep) with the
    * broadcast decision applied).
    *
    * Two-regime rule: micro-batch deltas broadcast (the gate shape); a
    * backfill-sized delta above the cap falls back to shuffle joins
    * instead of blowing the broadcast limit. The hash-keyed build
    * sides gate on the distinct-fingerprint count; the re-ingest
    * anti-join gates on the DOC count separately, because a backfill
    * of near-identical (or sub-width) docs can carry millions of rows
    * behind a tiny — or zero — distinct-hash count.
    */
  private def substrDeltaRepeatedSet(
      standing: DataFrame,
      delta: DataFrame,
      idCol: String,
      fingerprints: DataFrame => DataFrame,
      broadcastDeltaCap: Long): (DataFrame, DataFrame) = {
    // wd is deliberately NOT checkpointed even though it is consumed
    // twice (multiplicity agg + the caller's hits pass): A/B-measured
    // in round 15 — materializing the stride-1 window stream (~width×
    // the text) costs more than the second kernel pass it saves (q99
    // 1.41 → 1.80 s with the ckpt), and the winnowed form's gain was
    // within noise. The kernel re-run is the cheaper side of this
    // trade at every stride measured.
    val wd = fingerprints(delta)
    val deltaCounts = wd.groupBy("h").agg(count(lit(1)).as("cd")).localCheckpoint()
    val deltaSmall = deltaCounts.count() <= broadcastDeltaCap
    def sized(df: DataFrame): DataFrame = if (deltaSmall) broadcast(df) else df
    val idsSmall = delta.count() <= broadcastDeltaCap
    def idsSized(df: DataFrame): DataFrame = if (idsSmall) broadcast(df) else df
    val deltaIds = delta.select(col(idCol).as("delta_dup_id"))
    val standingOnly = standing.join(
      idsSized(deltaIds), col(idCol) === col("delta_dup_id"), "left_anti")
    // In production this is the maintained index, not a kernel pass.
    val standingIdx = fingerprints(standingOnly).groupBy("h").agg(count(lit(1)).as("cs"))
    val standingHits = standingIdx
      .join(sized(deltaCounts.select("h")), Seq("h"), "left_semi")
      .localCheckpoint()
    val rep = deltaCounts.join(standingHits, Seq("h"), "left")
      .filter(col("cd") + coalesce(col("cs"), lit(0L)) > 1)
      .select(col("h"), lit(1).as("is_rep"))
    (wd, sized(rep))
  }

  def exactSubstrDeltaRepeats(
      standing: DataFrame,
      delta: DataFrame,
      idCol: String,
      textCol: String,
      width: Int,
      broadcastDeltaCap: Long = 4000000L): DataFrame = {
    graft.functions.TextHashes.ensureRegistered(standing.sparkSession)
    def windows(df: DataFrame) = graft.Tables.fanOut(df).select(
      col(idCol).as("doc_id"),
      explode(call_function("graft_window_hashes", col(textCol), lit(width))).as("h"))
    val (wd, rep) = substrDeltaRepeatedSet(
      standing, delta, idCol, windows, broadcastDeltaCap)
    val hits = wd.join(rep.select("h"), Seq("h"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_repeated"))
    delta.select(
        col(idCol).as("doc_id"),
        greatest(length(col(textCol)) - (width - 1), lit(0)).cast("long").as("n_windows"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_windows"),
        coalesce(col("n_repeated"), lit(0L)).as("n_repeated"),
        expr("(coalesce(n_repeated, 0L) * 1000) div greatest(n_windows, 1)")
          .as("repeated_permille"))
  }

  /** Incremental WINNOWED exact-substring — the delta twin of
    * [[exactSubstrRepeatsStrided]] (q106) and the index a 100 TB
    * pipeline would actually maintain: the standing side's state is
    * the winnowed fingerprint-multiplicity index — ~2/(stride+1) the
    * row volume of the stride-1 index [[exactSubstrDeltaRepeats]]
    * (q99) probes — and each batch pays the winnowing kernel on the
    * DELTA only. Result-identical to [[exactSubstrRepeatsStrided]]
    * over standing ∪ delta restricted to the delta docs
    * (ExactSubstrSpec parity), with the same detection guarantee
    * (repeats ≥ width + stride − 1 always collide; the selection is
    * content-determined, so a batch copy and a standing copy of a
    * repeat select the same fingerprints no matter their offsets).
    *
    * Plan shape mirrors q99's: the standing index contributes ONE
    * probe — semi-joined against the broadcast delta-hash set,
    * emitting a delta-bounded frame (in production a bucket-pruned
    * lookup of the maintained index, not a kernel pass); everything
    * downstream is delta-bounded. The two-regime broadcast rule gates
    * the hash-keyed build sides on the distinct-fingerprint count and
    * the re-ingest anti-join on the doc count separately.
    */
  def exactSubstrDeltaRepeatsStrided(
      standing: DataFrame,
      delta: DataFrame,
      idCol: String,
      textCol: String,
      width: Int,
      stride: Int,
      broadcastDeltaCap: Long = 4000000L): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    graft.functions.TextHashes.ensureRegistered(standing.sparkSession)
    def winnowed(df: DataFrame) = graft.Tables.fanOut(df).select(
      col(idCol).as("doc_id"),
      explode(call_function("graft_winnowed_hashes",
        col(textCol), lit(width), lit(stride))).as("h"))
    val (wd, rep) = substrDeltaRepeatedSet(
      standing, delta, idCol, winnowed, broadcastDeltaCap)
    val per = wd.join(rep, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_selected"), count(col("is_rep")).as("n_repeated"))
    delta.select(col(idCol).as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        coalesce(col("n_repeated"), lit(0L)).as("n_repeated"),
        expr("(coalesce(n_repeated, 0L) * 1000) div greatest(coalesce(n_selected, 0L), 1)")
          .as("selected_rep_permille"))
  }

  /** Repeated-span resolution — the CUT decision of the exact-substring
    * pass: merge [[exactSubstrRepeats]]'s repeated windows into maximal
    * character spans per document (gaps-and-islands over window start
    * positions: a window starting inside the running span extends it;
    * one past its end opens a new span) and report what a span-trim
    * rewrite would remove. Overlapping stride-1 windows collapse, so a
    * k-char verbatim repeat (k ≥ width) yields ONE span of exactly k
    * chars, not k−width+1 window counts.
    *
    * Returns (doc_id, n_chars, n_spans, removed_chars, kept_chars).
    *
    * Plan shape: q96's pipeline (rolling kernel, repeated-set broadcast
    * semi-join) keeping window POSITIONS, then one doc-keyed window
    * (lag + running flag-sum — positions are monotone, so the running
    * span end is just lag(pos)+width−1) and two doc-keyed aggs riding
    * the same partitioning. The per-doc window group is bounded by doc
    * length, never by corpus size.
    */
  def repeatedSpanTrim(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      width: Int,
      broadcastRepCap: Long = 4000000L): DataFrame = {
    graft.functions.TextHashes.ensureRegistered(docs.sparkSession)
    val w = graft.Tables.fanOut(docs).select(
      col(idCol).as("doc_id"),
      posexplode(call_function("graft_window_hashes", col(textCol), lit(width))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("h"))
    val rep = w.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .select("h")
      .localCheckpoint()
    val repSide = if (rep.count() <= broadcastRepCap) broadcast(rep) else rep
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val spans = w.join(repSide, Seq("h"), "left_semi")
      .withColumn("prev", lag(col("pos"), 1).over(byDoc))
      .withColumn("f",
        when(col("prev").isNull || col("pos") > col("prev") + (width - 1), 1L).otherwise(0L))
      .withColumn("g", sum("f").over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "g")
      .agg(min("pos").as("s"), (max("pos") + (width - 1)).as("e"))
    val per = spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum(col("e") - col("s") + 1).as("removed"))
    docs.select(col(idCol).as("doc_id"), length(col(textCol)).cast("long").as("n_chars"))
      .join(per, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_chars"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("removed"), lit(0L)).as("removed_chars"),
        (col("n_chars") - coalesce(col("removed"), lit(0L))).as("kept_chars"))
  }
}
