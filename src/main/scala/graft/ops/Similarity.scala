package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a deterministic
  * random-hyperplane LSH variant as the scale path.
  *
  * FP discipline: cosine is a sequential left-fold dot product in
  * double — the same IEEE op order as the external oracle's
  * `list_reduce`, so results are bit-identical. The fold runs in a
  * tight-loop Scala UDF (Catalyst higher-order lambdas are interpreted
  * per element — ~20× slower for 64-dim vectors at millions of pairs);
  * per-vector norms are computed once per row, not per pair, which is
  * also exactly what the oracle's sqrt(dot(a,a)) evaluates to.
  *
  * Scale design (100 TB): queries are broadcast (they are the small
  * side by construction); the corpus side never shuffles for the
  * brute-force scan. The LSH path prunes the scan to one bucket per
  * query — the candidate join is an equi-join on the signature.
  */
object Similarity {

  /** Sequential left-fold double dot product (IEEE order = oracle's
    * list_reduce with 0.0 prepended).
    */
  private val dotUdf = udf { (a: Seq[Double], b: Seq[Double]) =>
    var s = 0.0
    var i = 0
    val n = a.length
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** One packing routine for EVERY producer of packed vectors (the UDF
    * and the driver-side centroid code): a single byte layout means
    * dotBytes can never compare two different encodings.
    */
  private def packDoubles(v: Seq[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(v.length * 8)
    v.foreach(bb.putDouble)
    bb.array()
  }

  /** Exact inverse of [[packDoubles]] — lets a maintained index
    * reconstruct raw vectors from its own postings (re-seeding) with
    * bit-identical doubles. */
  private def unpackDoubles(b: Array[Byte]): Seq[Double] = {
    val bb = java.nio.ByteBuffer.wrap(b)
    Seq.tabulate(b.length / 8)(i => bb.getDouble(i * 8))
  }
  private[graft] val unpackUdf = udf(unpackDoubles _)

  /** The hot-path form: vectors pre-packed into byte buffers so the
    * per-pair fold reads primitive doubles with zero boxing (boxed
    * Seq[Double] was the dominant cost at millions of pairs).
    * Identical IEEE sequence → identical results.
    */
  private val packUdf = udf(packDoubles _)

  /** Raw form shared by the UDF and the driver-side centroid closures
    * (same code path ⇒ same IEEE sequence everywhere cosine is computed).
    */
  private def dotBytes(a: Array[Byte], b: Array[Byte]): Double = {
    val ba = java.nio.ByteBuffer.wrap(a)
    val bb = java.nio.ByteBuffer.wrap(b)
    var s = 0.0
    var i = 0
    val n = a.length / 8
    while (i < n) { s += ba.getDouble(i * 8) * bb.getDouble(i * 8); i += 1 }
    s
  }

  private val dotPacked = udf(dotBytes _)

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Column-expression cosine (kept for composability; the operators
    * below use the precomputed-norm fast path).
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a)
    val bd = asDouble(b)
    dotUdf(ad, bd) / (sqrt(dotUdf(ad, ad)) * sqrt(dotUdf(bd, bd)))
  }

  /** (id, packed vector, norm) — packing and norms once per vector.
    * No fanOut here: the top-k paths score against a BROADCAST query
    * side map-side, and measured at bench scale the extra exchange
    * costs more than the serial packing saves (q35 0.40 vs 0.61 s);
    * the heavy all-pairs path fans its inputs out itself.
    */
  private def withNorm(emb: DataFrame, idCol: String, vecCol: String, prefix: String): DataFrame =
    emb.select(col(idCol).as(s"${prefix}id"), packUdf(asDouble(col(vecCol))).as(s"${prefix}v"))
      .withColumn(s"${prefix}nrm", sqrt(dotPacked(col(s"${prefix}v"), col(s"${prefix}v"))))

  /** Near-dup pairs at cosine ≥ threshold (id_a < id_b). All-pairs —
    * exact but quadratic; the LSH path below is the scale variant.
    * The `aid < bid` condition makes this a BroadcastNestedLoopJoin:
    * fine at spec scale, impossible at 100 TB (the whole corpus would
    * broadcast) — [[cosinePairsBlocked]] is the distributed form.
    */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = withNorm(emb, idCol, vecCol, "a")
    val b = withNorm(emb, idCol, vecCol, "b")
    a.join(b, col("aid") < col("bid"))
      .withColumn("sim", dotPacked(col("av"), col("bv")) / (col("anrm") * col("bnrm")))
      .filter(col("sim") >= threshold)
      .select(col("aid").as("id_a"), col("bid").as("id_b"))
  }

  /** Exact all-pairs cosine as a block-symmetric EQUI-join — the
    * distributed form of [[cosinePairs]], result-identical (spec-
    * checked): vectors hash into `numBlocks` blocks; the B(B+1)/2
    * ordered block pairs (broadcast — B² rows of two ints) drive two
    * hash joins, so every unordered vector pair is evaluated exactly
    * once in exactly one task and the per-task work is uniform by
    * construction. No non-equi join, no corpus broadcast, no skew:
    * this is how exact thresholded similarity survives a cluster.
    *
    * Exact near-dup at a loose cosine threshold is intrinsically
    * Θ(n²) on unstructured embeddings (the near-threshold pairs LSH
    * would have to examine anyway are spread across all buckets —
    * measured: the q34 result pairs sit at sim 0.45-0.6, i.e. random
    * tails, not planted clusters). The sub-quadratic paths with
    * recall < 1 are [[lshTopK]]/[[ivfTopK]]; this operator is the
    * exact verifier one runs over THEIR candidates when recall must
    * be 1 within a candidate set (the q32 pattern).
    */
  def cosinePairsBlocked(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numBlocks: Int = 16): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val blockPairs = (for { i <- 0 until numBlocks; j <- i until numBlocks } yield (i, j))
      .toDF("ga", "gb")
    // per-task pair work is quadratic in block size — fan the inputs
    // out so packing + the block join spread (measured q34 0.64→0.42 s)
    val src = graft.Tables.fanOut(emb)
    val a = withNorm(src, idCol, vecCol, "a")
      .withColumn("blka", pmod(hash(col("aid")), lit(numBlocks)))
    val b = withNorm(src, idCol, vecCol, "b")
      .withColumn("blkb", pmod(hash(col("bid")), lit(numBlocks)))
    a.join(broadcast(blockPairs), col("blka") === col("ga"))
      .join(b, col("blkb") === col("gb"))
      // same-block pairs once by id order; cross-block pairs appear in
      // exactly one (ga < gb) task already
      .filter(col("ga") =!= col("gb") || col("aid") < col("bid"))
      .withColumn("sim", dotPacked(col("av"), col("bv")) / (col("anrm") * col("bnrm")))
      .filter(col("sim") >= threshold)
      .select(
        least(col("aid"), col("bid")).as("id_a"),
        greatest(col("aid"), col("bid")).as("id_b"))
  }

  /** Exact brute-force cosine top-k for a query subset: queries are
    * broadcast against the full corpus; rank ties broken by id so the
    * result is fully deterministic. Emits (query_id, rank, neighbor_id).
    */
  def bruteForceTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      k: Int): DataFrame = {
    val corpus = withNorm(emb, idCol, vecCol, "n")
    val q = withNorm(queries, idCol, vecCol, "q")
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    corpus.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("sim", dotPacked(col("qv"), col("nv")) / (col("qnrm") * col("nnrm")))
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"), col("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
  }

  /** int8 scalar quantization: per-vector symmetric scale 127/max|x|,
    * components truncated toward zero — the 8×-smaller storage encoding
    * a 100 TB vector store actually ships (4 bytes/dim → 1). Truncation
    * (not rounding) because both engines define it identically; the
    * scale and the quantized ints are bit-reproducible from the floats.
    */
  private def quantizeBytes(v: Seq[Double]): Array[Byte] = {
    var m = 0.0
    v.foreach { x => val a = math.abs(x); if (a > m) m = a }
    val out = new Array[Byte](v.length)
    if (m == 0.0) return out
    val scale = 127.0 / m
    var i = 0
    v.foreach { x => out(i) = (x * scale).toLong.toByte; i += 1 }
    out
  }
  private val quantizeUdf = udf(quantizeBytes _)

  /** Exact integer dot over int8-packed vectors — the SIMD-shaped inner
    * loop of quantized search; no FP until the final normalization.
    */
  private def dotQ(a: Array[Byte], b: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < a.length) { s += a(i).toLong * b(i); i += 1 }
    s
  }
  private val dotQPacked = udf(dotQ _)

  /** (prefix)id / int8-quantized vector / its integer-dot norm — the
    * shared quantized projection of the recall operators.
    */
  private def withQuantized(
      df: DataFrame, idCol: String, vecCol: String, prefix: String): DataFrame =
    df.select(col(idCol).as(s"${prefix}id"),
        quantizeUdf(asDouble(col(vecCol))).as(s"${prefix}qv"))
      .withColumn(s"${prefix}qn",
        sqrt(dotQPacked(col(s"${prefix}qv"), col(s"${prefix}qv")).cast("double")))

  /** Recall@k of an approximate (query_id, neighbor_id) frame against
    * the exact float top-k for the same queries — the shared judgment
    * tail of every quantized/ANN accept gate; one definition keeps all
    * gates synchronized with the DuckDB reconstruction rules.
    */
  private def recallVsExact(
      approx: DataFrame,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      k: Int): DataFrame = {
    val exact = bruteForceTopK(emb, idCol, vecCol, queries, k)
      .select("query_id", "neighbor_id")
    val overlap = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_overlap"))
    queries.select(col(idCol).as("query_id"))
      .join(overlap, Seq("query_id"), "left")
      .select(
        col("query_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        expr(s"coalesce(n_overlap, 0L) * 100 div $k").as("recall_x100"))
  }

  /** Quantization QA: brute-force top-k over the int8-quantized
    * vectors (integer dots, float only in the final norm division),
    * judged by recall against the EXACT float top-k for the same
    * queries. Returns (query_id, n_overlap, recall_x100) — the
    * accept/reject measurement for switching a 100 TB store to int8.
    * Same broadcast-queries plan shape as [[bruteForceTopK]]: the
    * corpus is scanned once per side, never shuffled; the two top-k
    * frames are query-subset-sized and hash-join map-side.
    */
  def quantizedTopKRecall(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      k: Int): DataFrame = {
    val corpus = withQuantized(emb, idCol, vecCol, "n")
    val q = withQuantized(queries, idCol, vecCol, "q")
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    val qTop = corpus.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("sim",
        dotQPacked(col("qqv"), col("nqv")).cast("double") / (col("qqn") * col("nqn")))
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"), col("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id")
    recallVsExact(qTop, emb, idCol, vecCol, queries, k)
  }

  /** Quantized IVF, the composition q101's accept gate exists for: the
    * 1-byte/dim ANN store at corpus scale. The corpus is held int8-
    * QUANTIZED; cell assignment, probe selection and the candidate
    * SHORTLIST all run on integer dots (the SIMD-shaped inner loop, no
    * float vector touched); only the shortlist — queries × shortlist
    * rows, corpus-size independent — is reranked with exact float
    * cosine. Returns the recall@k of the composed pipeline against the
    * exact float ranking at the same probe budget (q109's gate):
    * (query_id, n_overlap, recall_x100).
    *
    * Plan shape: driver-side centroid closure (≤ numCentroids rows,
    * the audited ivfTopK pattern) ⇒ map-side argmax assignment, zero
    * corpus shuffle; probes broadcast; the float rerank joins the
    * query-bounded shortlist back to the corpus as a broadcast
    * semi-restriction. At 100 TB the float vectors live in cold
    * storage and only shortlist rows are ever fetched — an 8× byte
    * reduction on the hot path at (measured) matching recall.
    * All tie-breaks (cell: sim DESC, cid; shortlist: simq DESC, id;
    * rerank: sim DESC, id) mirror the DuckDB twin's row_number rules.
    */
  def ivfTopKQuantizedRecall(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      numCentroids: Int,
      nprobe: Int,
      shortlist: Int,
      k: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    // Quantized centroid closure (the shared CentroidClosure kernel —
    // ONE copy of the argmax/tie-break rule): centroids are the ids
    // below numCentroids, the q109 selection the DuckDB twin replays
    // as WHERE id < n.
    val cc = CentroidClosure.fromRows(
      withQuantized(emb.filter(col(idCol) < numCentroids), idCol, vecCol, "c")
        .collect()
        .map(r => (r.getLong(0), r.getAs[Array[Byte]](1), r.getDouble(2))))
    val cellUdf = udf((v: Array[Byte], nrm: Double) => cc.cellOf(v, nrm))
    val probeUdf = udf((v: Array[Byte], nrm: Double) => cc.probesOf(nprobe)(v, nrm))
    val cells = withQuantized(emb, idCol, vecCol, "n")
      .withColumn("cell", cellUdf(col("nqv"), col("nqn")))
    val probes = withQuantized(queries, idCol, vecCol, "q")
      .withColumn("cell", explode(probeUdf(col("qqv"), col("qqn"))))
    val ws = Window.partitionBy("query_id").orderBy(col("simq").desc, col("neighbor_id"))
    val short = cells.join(broadcast(probes), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("simq",
        dotQPacked(col("qqv"), col("nqv")).cast("double") / (col("qqn") * col("nqn")))
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"), col("simq"))
      .withColumn("srank", row_number().over(ws))
      .filter(col("srank") <= shortlist)
      .select("query_id", "neighbor_id")
    recallVsExact(exactRerank(short, emb, queries, idCol, vecCol, k),
      emb, idCol, vecCol, queries, k)
  }

  /** Exact float re-rank of a (query_id, neighbor_id) shortlist — the
    * sole stage that touches float vectors: corpus restricted by the
    * BROADCAST query-bounded shortlist (at 100 TB the float vectors
    * live in cold storage and only shortlist rows are ever fetched),
    * top-k by (sim DESC, id) mirroring the DuckDB row_number rule.
    * Shared by the IVF-quantized and PQ-ADC serving paths.
    */
  private def exactRerank(
      short: DataFrame,
      emb: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val nFloat = withNorm(emb, idCol, vecCol, "n")
    val qFloat = withNorm(queries, idCol, vecCol, "q")
    val wr = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    nFloat
      .join(broadcast(short), col("nid") === col("neighbor_id"))
      .join(broadcast(qFloat), col("qid") === col("query_id"))
      .withColumn("sim", dotPacked(col("qv"), col("nv")) / (col("qnrm") * col("nnrm")))
      .select(col("query_id"), col("neighbor_id"), col("sim"))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id")
  }

  /** Driver-side quantized-centroid closure — the fixed coordinate
    * system of a maintained IVF index (bounded: ≤ numCentroids rows,
    * the audited ivfTopK collect). Built ONCE at index construction
    * from the initial corpus and shipped inside the assignment/probe
    * UDF closures; persisted as a small frame so a resumed index
    * probes the IDENTICAL cells. cid-ascending, strict > — ties to
    * the lower cell id, the shared training/probing rule.
    */
  private[graft] final class CentroidClosure(
      val cids: Array[Long],
      val cqvs: Array[Array[Byte]],
      val cqns: Array[Double]) extends Serializable {
    /** Centroid count — the occupancy-reseed input (corpus / nc). */
    def numCentroids: Int = cids.length
    private def nc = cids.length
    /** Cell of `v`: argmax centroid similarity, strict > — ties (and
      * the all-NaN case of a zero-norm vector, where no comparison
      * ever fires) resolve to the LOWEST cell id, matching the DuckDB
      * twin's NaN-sorts-first / row_number(cid) rule. */
    private[Similarity] def cellOf(v: Array[Byte], nrm: Double): Long = {
      var best = cids(0); var bestSim = Double.NegativeInfinity
      var c = 0
      while (c < nc) {
        val s = dotQ(v, cqvs(c)).toDouble / (nrm * cqns(c))
        if (s > bestSim) { bestSim = s; best = cids(c) }
        c += 1
      }
      best
    }
    private[Similarity] def probesOf(nprobe: Int)(v: Array[Byte], nrm: Double): Array[Long] =
      Array.tabulate(nc)(c => (dotQ(v, cqvs(c)).toDouble / (nrm * cqns(c)), cids(c)))
        .sortBy { case (s, cid) => (-s, cid) }
        .take(nprobe)
        .map(_._2)
    /** The closure as a persistable frame (cid, cqv, cqn). */
    def toFrame(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      cids.indices.map(i => (cids(i), cqvs(i), cqns(i)))
        .toDF("cid", "cqv", "cqn")
    }
  }

  private[graft] object CentroidClosure {
    /** Closure over the `numCentroids` LOWEST ids of `initial` — the
      * maintained-index seed rule (deterministic, SQL-replayable as
      * ORDER BY id LIMIT n). */
    def fromInitial(initial: DataFrame, idCol: String, vecCol: String,
        numCentroids: Int): CentroidClosure =
      fromRows(withQuantized(
          initial.orderBy(col(idCol)).limit(numCentroids), idCol, vecCol, "c")
        .collect()
        .map(r => (r.getLong(0), r.getAs[Array[Byte]](1), r.getDouble(2))))
    /** Rebuild from a persisted (cid, cqv, cqn) frame. */
    def fromFrame(df: DataFrame): CentroidClosure =
      fromRows(df.collect()
        .map(r => (r.getLong(0), r.getAs[Array[Byte]](1), r.getDouble(2))))
    private[Similarity] def fromRows(
        rows: Array[(Long, Array[Byte], Double)]): CentroidClosure = {
      require(rows.nonEmpty, "centroid closure needs at least one centroid")
      val s = rows.sortBy(_._1)
      new CentroidClosure(s.map(_._1), s.map(_._2), s.map(_._3))
    }
  }

  /** One vector frame projected to maintained-IVF postings:
    * (vec_id, cell, qv int8, qn, fv packed-float, fnrm) — the int8
    * codes drive cell assignment and the shortlist, the packed floats
    * ride along for the exact rerank so serving never rejoins the raw
    * corpus. One UDF projection per axis, map-side, zero shuffle.
    */
  private[graft] def quantizedPostings(
      df: DataFrame, idCol: String, vecCol: String,
      cc: CentroidClosure): DataFrame = {
    val cellUdf = udf((v: Array[Byte], nrm: Double) => cc.cellOf(v, nrm))
    df.select(
        col(idCol).cast("long").as("vec_id"),
        quantizeUdf(asDouble(col(vecCol))).as("qv"),
        packUdf(asDouble(col(vecCol))).as("fv"))
      .withColumn("qn", sqrt(dotQPacked(col("qv"), col("qv")).cast("double")))
      .withColumn("fnrm", sqrt(dotPacked(col("fv"), col("fv"))))
      .withColumn("cell", cellUdf(col("qv"), col("qn")))
      .select("vec_id", "cell", "qv", "qn", "fv", "fnrm")
  }

  /** Annotate one batch of postings with its top-k neighbors among
    * `standing` ∪ the batch itself — the per-fold kernel of the
    * maintained IVF index (the q109 pipeline with the corpus split
    * into a standing table and a delta): probes broadcast, the
    * standing side enters ONLY as a scan semi-restricted by the
    * batch's probed cells (it never shuffles), integer-dot shortlist,
    * float rerank of shortlist rows only. Returns
    * (query_id, rank, neighbor_id), rank 1..k — found-only rows,
    * all tie-breaks mirroring the DuckDB replay's row_number rules.
    */
  private[graft] def ivfAnnotateBatch(
      standing: DataFrame,
      batch: DataFrame,
      cc: CentroidClosure,
      nprobe: Int,
      shortlist: Int,
      k: Int,
      includeBatchAsCandidates: Boolean = true): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val probeUdf = udf((v: Array[Byte], nrm: Double) => cc.probesOf(nprobe)(v, nrm))
    val probes = batch.select(
        col("vec_id").as("qid"), col("qv").as("qqv"), col("qn").as("qqn"),
        col("fv").as("qfv"), col("fnrm").as("qfnrm"),
        explode(probeUdf(col("qv"), col("qn"))).as("cell"))
    // On a FOLD the standing anti-join is delta-authoritative: a
    // re-ingested id's standing copy yields to the batch copy (which
    // joins the pool below). On a SEARCH the batch is a query frame,
    // not new corpus — anti-joining would suppress a standing vector
    // from EVERY query's pool whenever ANY query reuses its id, so
    // search keeps the full index and relies on the per-query
    // self-skip (qid =!= vec_id) alone.
    val standingLive =
      if (includeBatchAsCandidates)
        standing.join(broadcast(batch.select("vec_id")), Seq("vec_id"), "left_anti")
      else standing
    val standingC = standingLive
      .join(broadcast(probes.select("cell").distinct()), Seq("cell"), "left_semi")
    val candidates =
      if (includeBatchAsCandidates) standingC.unionByName(batch) else standingC
    val ws = Window.partitionBy("query_id").orderBy(col("simq").desc, col("neighbor_id"))
    val short = candidates.join(broadcast(probes), Seq("cell"))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("simq",
        dotQPacked(col("qqv"), col("qv")).cast("double") / (col("qqn") * col("qn")))
      .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
        col("simq"), col("qfv"), col("qfnrm"), col("fv"), col("fnrm"))
      .withColumn("srank", row_number().over(ws))
      .filter(col("srank") <= shortlist)
    val wr = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    // A standing corpus may transiently hold >1 version of a vec_id
    // (re-ingest before the next compaction — the gate's LSM
    // multi-version window); keep only the best-scoring copy per
    // (query, neighbor) so one neighbor never occupies two ranks.
    // With unique ids (the common case) this window is a logical
    // no-op over the shortlist-bounded frame.
    val wv = Window.partitionBy("query_id", "neighbor_id").orderBy(col("sim").desc)
    short
      .withColumn("sim", dotPacked(col("qfv"), col("fv")) / (col("qfnrm") * col("fnrm")))
      .select(col("query_id"), col("neighbor_id"), col("sim"))
      .withColumn("vrank", row_number().over(wv))
      .filter(col("vrank") === 1)
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
  }

  /** Embedding-space quality eval: for each query, how many of its k
    * exact-cosine nearest neighbors share the query's label — the kNN
    * label-consistency metric a training pipeline runs on an embedding
    * column before trusting it (clustered labels ⇒ usable space).
    * Returns (query_id, label, n_same, purity). The top-k frame is
    * query-subset-sized, so it broadcasts into the corpus-sized label
    * lookup — the corpus is scanned once, never shuffled.
    */
  def knnLabelPurity(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      queries: DataFrame,
      k: Int): DataFrame = {
    val topk = bruteForceTopK(emb, idCol, vecCol, queries, k)
    val labels = emb.select(col(idCol).as("nid"), col(labelCol).as("n_label"))
    val qLabels = queries.select(col(idCol).as("query_id"), col(labelCol).as("label"))
    labels
      .join(broadcast(topk), col("nid") === col("neighbor_id"))
      .join(broadcast(qLabels), Seq("query_id"))
      .groupBy(col("query_id"), col("label"))
      .agg(count(when(col("n_label") === col("label"), 1)).as("n_same"))
      .withColumn("purity", col("n_same").cast("double") / lit(k))
  }

  /** Deterministic hyperplane component p,j in [-1000, 1000]:
    * hash60("p_j") % 2001 - 1000. Reproducible anywhere md5 exists.
    */
  private def planeMatrix(dim: Int, numPlanes: Int): Array[Array[Long]] =
    Array.tabulate(numPlanes, dim)((p, j) => Hashing.hash60Jvm(s"${p}_$j") % 2001 - 1000)

  /** `numPlanes`-bit signature over the integer-quantized embedding
    * (floor(x*1000)): bit p set iff the integer dot with plane p is
    * positive — exact integer math, zero FP boundary risk.
    */
  private def signatureUdf(dim: Int, numPlanes: Int) = {
    val planes = planeMatrix(dim, numPlanes)
    udf { (v: Seq[Float]) =>
      val q = new Array[Long](v.length)
      var j = 0
      while (j < v.length) { q(j) = math.floor(v(j).toDouble * 1000).toLong; j += 1 }
      var bucket = 0L
      var p = 0
      while (p < numPlanes) {
        var d = 0L
        var i = 0
        val plane = planes(p)
        while (i < q.length) { d += q(i) * plane(i); i += 1 }
        if (d > 0) bucket |= (1L << p)
        p += 1
      }
      bucket
    }
  }

  /** IVF-style ANN: the corpus is partitioned into `numCentroids`
    * cells by nearest centroid (deterministic training-free centroids:
    * the vectors with the lowest ids); a query probes its `nprobe`
    * nearest cells and reranks exactly within them. At 100 TB the
    * assignment is one broadcast pass, cells are the partitioning key,
    * and a query touches nprobe/numCentroids of the corpus.
    */
  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      numCentroids: Int,
      nprobe: Int,
      k: Int): DataFrame = {
    // Centroids are tiny by construction (numCentroids rows): collect
    // once on the driver and close over them, so cell assignment is a
    // per-row argmax — ZERO shuffle of the corpus. (The previous shape
    // — broadcast-join × numCentroids blowup + full-corpus row_number
    // window — shuffled the whole corpus just to pick each row's cell.)
    // Tie-break matches the oracle's (sim DESC, cid ASC) row_number:
    // centroids are scanned in cid order with a strict `>`.
    val centRows = withNorm(emb.filter(col(idCol) < numCentroids), idCol, vecCol, "c")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1), r.getDouble(2)))
      .sortBy(_._1)
    ivfTopKWith(emb, idCol, vecCol, queries, centRows, nprobe, k)
  }

  /** The ONE nearest-centroid rule, shared by training (kmeansCentroids)
    * and serving (ivfTopKWith): argmax over cid-ordered centroids with a
    * strict `>` — ties break toward the lower cell id, matching the
    * oracle's (sim DESC, cid ASC) row_number. Training and probing
    * assigning cells by different rules would silently degrade recall.
    */
  private def nearestCentroid(
      cids: Array[Long], cvs: Array[Array[Byte]], cnrms: Array[Double])(
      v: Array[Byte], nrm: Double): Long = {
    var best = 0L
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cids.length) {
      val s = dotBytes(v, cvs(c)) / (nrm * cnrms(c))
      if (s > bestSim) { bestSim = s; best = cids(c) }
      c += 1
    }
    best
  }

  /** Shared IVF probe/rerank machinery over a driver-side centroid
    * table (seeded or k-means-trained): map-side argmax assignment,
    * nprobe cell probes per query, exact-cosine rerank inside the
    * probed cells only.
    */
  private def ivfTopKWith(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      centRows: Array[(Long, Array[Byte], Double)],
      nprobe: Int,
      k: Int): DataFrame = {
    val cids = centRows.map(_._1)
    val cvs = centRows.map(_._2)
    val cnrms = centRows.map(_._3)
    val nc = centRows.length

    val cellUdf = udf(nearestCentroid(cids, cvs, cnrms) _)
    val probeUdf = udf { (v: Array[Byte], nrm: Double) =>
      Array.tabulate(nc)(c => (dotBytes(v, cvs(c)) / (nrm * cnrms(c)), cids(c)))
        .sortBy { case (s, cid) => (-s, cid) }
        .take(nprobe)
        .map(_._2)
    }

    val cells = withNorm(emb, idCol, vecCol, "n")
      .withColumn("cell", cellUdf(col("nv"), col("nnrm")))
    val probes = withNorm(queries, idCol, vecCol, "q")
      .withColumn("cell", explode(probeUdf(col("qv"), col("qnrm"))))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    cells.join(broadcast(probes), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", dotPacked(col("qv"), col("nv")) / (col("qnrm") * col("nnrm")))
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"), col("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
  }

  /** Lloyd's k-means (cosine/spherical form) over the embedding
    * column, for TRAINED IVF centroids — the training-free
    * `vec_id < numCentroids` seed cells in [[ivfTopK]] are
    * oracle-reproducible but track data geometry poorly.
    *
    * Execution shape: ONE Spark job draws the bounded deterministic
    * training sample — the `sampleCap` lowest-`xxhash64(id)` vectors
    * (per-partition top-K + small merge, one narrow corpus pass, NO
    * corpus shuffle) — and collects it; Lloyd's then iterates entirely
    * driver-side over ≤ sampleCap × dim doubles. At 100 TB the corpus
    * is touched exactly once here (the sample draw) and once more at
    * assignment time by the caller; iteration count prices at
    * nanoseconds of driver arithmetic instead of cluster job rounds.
    * (The previous distributed form shuffled k × dim means per
    * iteration — its cost was the job-scheduling floor × 3 iterations,
    * ~3 s of wall clock to average 4096 vectors.) A corpus at or under
    * the cap trains on every row, unchanged.
    *
    * Seeds are the k lowest-id vectors of the sample, assignment uses
    * the shared [[nearestCentroid]] rule (argmax, ties toward the lower
    * cell id), empty cells keep their previous centroid, and means
    * accumulate in ascending-id sample order — so for a given corpus
    * the trained centroids are BIT-deterministic, independent of
    * partitioning (the distributed form could not promise that; the
    * recall contract in KMeansIvfSpec is unchanged).
    *
    * @param sampleCap training-sample bound (default 4096): Lloyd's
    *        sees only the sampleCap lowest-xxhash64(id) vectors; on a
    *        corpus above the cap, seeds and means come from that sample,
    *        not the full corpus. Raise it (with driver memory to match)
    *        if centroid fidelity on >>cap corpora matters more than
    *        training cost.
    * @return (cellId 0..k-1, packed centroid bytes, norm)
    */
  def kmeansCentroids(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      sampleCap: Int = 4096): Array[(Long, Array[Byte], Double)] = {
    val sample = emb.select(
        col(idCol).cast("long").as("id"),
        packUdf(asDouble(col(vecCol))).as("pv"))
      .orderBy(xxhash64(col("id"))).limit(sampleCap)
      .collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getAs[Array[Byte]]("pv")))
    val n = sample.length
    if (n == 0) return Array.empty // empty corpus: no centroids, no crash
    val dim = sample.head._2.length / 8
    val vecs = sample.map { case (_, pv) =>
      val bb = java.nio.ByteBuffer.wrap(pv)
      Array.tabulate(dim)(j => bb.getDouble(j * 8))
    }
    val norms = sample.map { case (_, pv) => math.sqrt(dotBytes(pv, pv)) }
    var cents: Array[(Long, Array[Byte], Double)] =
      sample.take(k).zipWithIndex.map { case ((_, pv), i) =>
        (i.toLong, pv, math.sqrt(dotBytes(pv, pv)))
      }
    var it = 0
    while (it < iters) {
      val cids = cents.map(_._1)
      val cvs = cents.map(_._2)
      val cnrms = cents.map(_._3)
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      var i = 0
      while (i < n) {
        val cell = nearestCentroid(cids, cvs, cnrms)(sample(i)._2, norms(i)).toInt
        val s = sums(cell)
        val v = vecs(i)
        var j = 0
        while (j < dim) { s(j) += v(j); j += 1 }
        counts(cell) += 1
        i += 1
      }
      cents = cents.map { case (cid, oldPv, oldNrm) =>
        val c = counts(cid.toInt)
        if (c == 0) (cid, oldPv, oldNrm) // empty cell keeps its centroid
        else {
          val s = sums(cid.toInt)
          val mean = new Array[Double](dim)
          var j = 0
          while (j < dim) { mean(j) = s(j) / c; j += 1 }
          val pv = packDoubles(mean)
          (cid, pv, math.sqrt(dotBytes(pv, pv)))
        }
      }
      it += 1
    }
    cents
  }

  /** [[ivfTopKTrained]] with the trained centroid table also EXPORTED
    * as parquet `(cid BIGINT, cv ARRAY<DOUBLE>)` — the external-oracle
    * hook. The centroids are bit-deterministic for a given corpus
    * (ascending-id accumulation over the deterministic sample, see
    * [[kmeansCentroids]]), and the export unpacks the exact doubles the
    * serving path dots against, so an external engine reading the file
    * and replaying probe+rerank with a sequential-fold cosine
    * reproduces the result hash-for-hash. Export cost is `numCentroids`
    * rows — negligible at any scale.
    */
  def ivfTopKTrainedExport(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      numCentroids: Int,
      trainIters: Int,
      nprobe: Int,
      k: Int,
      exportPath: String,
      sampleCap: Int = 4096): DataFrame = {
    val cents = kmeansCentroids(emb, idCol, vecCol, numCentroids, trainIters, sampleCap)
    val spark = emb.sparkSession
    val rows = cents.toSeq.map { case (cid, pv, _) =>
      val bb = java.nio.ByteBuffer.wrap(pv)
      (cid, (0 until pv.length / 8).map(j => bb.getDouble(j * 8)))
    }
    import spark.implicits._
    // Deferred: registering instead of writing keeps query CONSTRUCTION
    // side-effect-free (plan audits build this plan without touching the
    // filesystem); graft.Verify flushes before the oracle reads.
    graft.OracleAux.register(exportPath) {
      rows.toDF("cid", "cv").coalesce(1)
        .write.mode("overwrite").parquet(exportPath)
    }
    ivfTopKWith(emb, idCol, vecCol, queries, cents, nprobe, k)
  }

  /** [[ivfTopK]] with k-means-trained centroids instead of the
    * deterministic seed cells: same probe/rerank machinery, better
    * cell balance/recall on clustered data. Training sweeps a bounded
    * sample (one narrow corpus pass to draw it — see
    * [[kmeansCentroids]]), so only the single assignment pass scales
    * with the corpus.
    *
    * @param sampleCap training-sample bound (default 4096) — above it,
    *        centroids train on the sampleCap lowest-xxhash64(id)
    *        vectors, not the full corpus; see [[kmeansCentroids]].
    */
  def ivfTopKTrained(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      numCentroids: Int,
      trainIters: Int,
      nprobe: Int,
      k: Int,
      sampleCap: Int = 4096): DataFrame = {
    val cents = kmeansCentroids(emb, idCol, vecCol, numCentroids, trainIters, sampleCap)
    ivfTopKWith(emb, idCol, vecCol, queries, cents, nprobe, k)
  }

  /** LSH-bucketed ANN: candidates share the query's full signature
    * bucket, reranked by exact cosine. Trades recall for a pruned scan;
    * with B planes the corpus scan shrinks ~2^B-fold in expectation.
    */
  def lshTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      dim: Int,
      numPlanes: Int,
      k: Int): DataFrame = {
    val sig = signatureUdf(dim, numPlanes)
    val corpus = emb.select(col(idCol).as("nid"),
        packUdf(asDouble(col(vecCol))).as("nv"), sig(col(vecCol)).as("bucket"))
      .withColumn("nnrm", sqrt(dotPacked(col("nv"), col("nv"))))
    val q = queries.select(col(idCol).as("qid"),
        packUdf(asDouble(col(vecCol))).as("qv"), sig(col(vecCol)).as("bucket"))
      .withColumn("qnrm", sqrt(dotPacked(col("qv"), col("qv"))))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    corpus.join(broadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", dotPacked(col("qv"), col("nv")) / (col("qnrm") * col("nnrm")))
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"), col("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
  }

  /** Default expected LSH bucket size for [[cosinePairsLshAuto]]: the
    * plane count is chosen so a bucket holds ~this many vectors, which
    * bounds the per-bucket self-join at ~targetBucket²/2 pairs
    * regardless of corpus size.
    */
  val LshTargetBucket = 125L

  /** Plane count for a corpus of `n` vectors: the smallest B ≥ 4 with
    * expected bucket size ceil(n/2^B) ≤ targetBucket — i.e.
    * B = max(4, ceil(log2(ceil(n/targetBucket)))), in pure integer math
    * (no FP log2 boundary risk) so an external engine derives the SAME
    * B from the same count: ceil(log2(m)) = bit-length of (m-1).
    * A fixed B makes the bucket self-join grow Θ(n²/2^B); recomputing B
    * from n keeps bucket population constant, so candidate volume grows
    * ~linearly with the corpus — the 100 TB shape.
    */
  def autoPlanes(n: Long, targetBucket: Long = LshTargetBucket): Int = {
    val m = (n + targetBucket - 1) / targetBucket
    val ceilLog2 = if (m <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.max(4, ceilLog2)
  }

  /** [[cosinePairsLsh]] with the plane count derived from the corpus
    * count via [[autoPlanes]] — one O(1) metadata-ish count() pass, then
    * the banded join. At 2000 vectors this is B=4 (identical to the
    * fixed form); at the 62× scale leg it is B=10, flattening the
    * (growth)² candidate curve the fixed B showed (BASELINE.md scale
    * table).
    */
  def cosinePairsLshAuto(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      targetBucket: Long = LshTargetBucket): DataFrame =
    cosinePairsLsh(emb, idCol, vecCol, dim, autoPlanes(emb.count(), targetBucket), threshold)

  /** Embedding near-dup pairs at cosine ≥ threshold, restricted to LSH
    * bucket-mates — the sub-quadratic SCALE PATH for embedding dedup
    * that [[cosinePairsBlocked]]'s docs promise: candidates come from a
    * bucket equi-join (~2^B-fold pruning with B planes, never all
    * pairs), the exact cosine verifies each candidate. Output is a
    * deterministic SUBSET of the exact pairs (recall trades against the
    * pruning factor; raise recall by unioning over plane-family
    * rotations). Signatures use the same baked integer-quantized
    * hyperplanes as [[lshTopK]], so external engines reproduce the
    * buckets bit-for-bit.
    */
  /** Incremental embedding near-dup: DELTA×STANDING LSH bucket-mates
    * at cosine ≥ threshold — the embedding twin of the minhash delta
    * pairs (q85). An ingest batch is checked only against
    * bucket-colliding standing vectors (never standing×standing, so
    * candidate volume scales with the delta), and with
    * `broadcastDelta` the batch's signatures/vectors are the broadcast
    * build of every join: the standing corpus is a pure probe-side
    * scan per batch, zero standing shuffle at any corpus size. A
    * re-ingested id follows q85's delta-authoritative rule (the
    * standing twin is dropped before bucketing). Returns
    * (delta_id, corpus_id).
    */
  /** The LSH "side" frame for a vector table — (id, pv packed vector,
    * nrm, bucket). This is ALSO the persisted signature index of an
    * embedding corpus: carry these rows (append per ingested batch)
    * and a delta join needs no per-batch signature recompute of the
    * standing side. Self-contained: the cosine verify reads pv/nrm
    * straight from the index, no doc lookback.
    */
  def cosineLshIndex(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      numPlanes: Int): DataFrame = {
    val sig = signatureUdf(dim, numPlanes)
    emb.select(col(idCol).as("id"),
        packUdf(asDouble(col(vecCol))).as("pv"), sig(col(vecCol)).as("bucket"))
      .withColumn("nrm", sqrt(dotPacked(col("pv"), col("pv"))))
  }

  /** Re-derive the bucket column of a [[cosineLshIndex]] frame at a
    * NEW plane count from the packed vectors alone — bit-identical to
    * re-running cosineLshIndex over the raw floats, because pv stores
    * exactly the doubles the quantizer reads (float→double is exact).
    * This is what makes the embedding gate's amortized auto-B rebuild
    * possible without any raw-vector lookback.
    */
  def resignIndex(index: DataFrame, dim: Int, numPlanes: Int): DataFrame = {
    val planes = planeMatrix(dim, numPlanes)
    val sigFromPacked = udf { (pv: Array[Byte]) =>
      val bb = java.nio.ByteBuffer.wrap(pv)
      val n = pv.length / 8
      val q = new Array[Long](n)
      var j = 0
      while (j < n) { q(j) = math.floor(bb.getDouble(j * 8) * 1000).toLong; j += 1 }
      var bucket = 0L
      var p = 0
      while (p < numPlanes) {
        var d = 0L
        var i = 0
        val plane = planes(p)
        while (i < q.length) { d += q(i) * plane(i); i += 1 }
        if (d > 0) bucket |= (1L << p)
        p += 1
      }
      bucket
    }
    index.withColumn("bucket", sigFromPacked(col("pv")))
  }

  /** Delta near-dup pairs against a PRE-COMPUTED standing
    * [[cosineLshIndex]] (same plane count on both sides). The delta
    * side broadcasts by default; re-ingested ids are dropped from the
    * standing index first (delta-authoritative).
    */
  def cosinePairsLshIndexed(
      standingIndex: DataFrame,
      delta: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      numPlanes: Int,
      threshold: Double,
      broadcastDelta: Boolean = true): DataFrame = {
    def small(df: DataFrame) = if (broadcastDelta) broadcast(df) else df
    val deltaIds = delta.select(col(idCol).as("delta_dup_id"))
    val indexOnly = standingIndex.join(
      small(deltaIds), col("id") === col("delta_dup_id"), "left_anti")
    val d = cosineLshIndex(delta, idCol, vecCol, dim, numPlanes)
      .select(col("id").as("delta_id"), col("pv").as("dv"), col("nrm").as("dn"), col("bucket"))
    indexOnly
      .select(col("id").as("corpus_id"), col("pv").as("sv"), col("nrm").as("sn"), col("bucket"))
      .join(small(d), Seq("bucket"))
      .filter(dotPacked(col("dv"), col("sv")) / (col("dn") * col("sn")) >= threshold)
      .select(col("delta_id"), col("corpus_id"))
  }

  def cosinePairsLshDelta(
      standing: DataFrame,
      delta: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      numPlanes: Int,
      threshold: Double,
      broadcastDelta: Boolean = true): DataFrame = {
    def small(df: DataFrame) = if (broadcastDelta) broadcast(df) else df
    val deltaIds = delta.select(col(idCol).as("delta_dup_id"))
    val standingOnly = standing.join(
      small(deltaIds), col(idCol) === col("delta_dup_id"), "left_anti")
    cosinePairsLshIndexed(
      cosineLshIndex(standingOnly, idCol, vecCol, dim, numPlanes),
      delta, idCol, vecCol, dim, numPlanes, threshold, broadcastDelta)
  }

  /** [[cosinePairsLshDelta]] with the plane count derived from the
    * COMBINED corpus count (standing + delta) via [[autoPlanes]] — the
    * same B an external engine derives from the full table, and the
    * same bucket geometry the standing corpus would use once the delta
    * folds in.
    */
  def cosinePairsLshDeltaAuto(
      standing: DataFrame,
      delta: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      targetBucket: Long = LshTargetBucket,
      broadcastDelta: Boolean = true): DataFrame =
    cosinePairsLshDelta(standing, delta, idCol, vecCol, dim,
      autoPlanes(standing.count() + delta.count(), targetBucket), threshold, broadcastDelta)

  def cosinePairsLsh(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      numPlanes: Int,
      threshold: Double): DataFrame = {
    val sig = signatureUdf(dim, numPlanes)
    val side = emb.select(col(idCol).as("id"),
        packUdf(asDouble(col(vecCol))).as("pv"), sig(col(vecCol)).as("bucket"))
      .withColumn("nrm", sqrt(dotPacked(col("pv"), col("pv"))))
    val a = side.select(col("id").as("id_a"), col("pv").as("pa"), col("nrm").as("na"), col("bucket"))
    val b = side.select(col("id").as("id_b"), col("pv").as("pb"), col("nrm").as("nb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .filter(dotPacked(col("pa"), col("pb")) / (col("na") * col("nb")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  // ── Product quantization (round 12): the compression rung past int8
  // SQ (q101). m subspaces × ksub centroids ⇒ m bytes/vector (64× on
  // 64-dim float32 stores), queries scored by ADC lookup tables. ──

  /** Train per-subspace codebooks on the deterministic capped sample
    * ([[kmeansCentroids]]' exact draw: lowest xxhash64(id), ascending-
    * id accumulation), Lloyd in doubles, then quantize every centroid
    * to the q105 integer lattice (floor(x·1000)) ONCE at the end —
    * integer codebooks make encode (argmin integer L2) and ADC
    * (integer dots) bit-replayable in SQL with zero float hazards.
    * Returns [m][ksub'][subdim] with ksub' ≤ ksub when the sample is
    * smaller than the codebook (empty cells keep their init, the
    * kmeansCentroids convention).
    */
  private[graft] def pqTrainCodebooksInt(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ksub: Int,
      iters: Int,
      sampleCap: Int = 4096,
      perm: Option[Array[Int]] = None): Array[Array[Array[Long]]] = {
    val sample = emb.select(
        col(idCol).cast("long").as("id"),
        packUdf(asDouble(col(vecCol))).as("pv"))
      .orderBy(xxhash64(col("id"))).limit(sampleCap)
      .collect()
      .sortBy(_.getLong(0))
      .map(r => r.getAs[Array[Byte]]("pv"))
    require(sample.nonEmpty, "pq: empty corpus")
    val dim = sample.head.length / 8
    require(dim % m == 0, s"pq: dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val vecs = sample.map { pv =>
      val bb = java.nio.ByteBuffer.wrap(pv)
      val raw = Array.tabulate(dim)(j => bb.getDouble(j * 8))
      perm.fold(raw)(p => Array.tabulate(dim)(k => raw(p(k))))
    }
    kmeansSubspaces(vecs, m, ksub, iters, scale = 1000.0)
  }

  /** Per-subspace k-means over driver-side sample vectors, codebook
    * entries floored onto the integer lattice at `scale` — the shared
    * trainer of [[pqTrainCodebooksInt]] (raw floats, scale 1000) and
    * [[pqTrainResidualCodebooksInt]] (already-lattice residuals,
    * scale 1). */
  private def kmeansSubspaces(
      vecs: Array[Array[Double]],
      m: Int,
      ksub: Int,
      iters: Int,
      scale: Double): Array[Array[Array[Long]]] = {
    val dim = vecs.head.length
    require(dim % m == 0, s"pq: dim $dim not divisible into $m subspaces")
    val sub = dim / m
    // Subspaces are trained independently and deterministically — fan
    // the m trainings across driver cores (round 15): the driver-side
    // k-means is ksub·|sample|·subdim·iters flops per subspace and ran
    // single-threaded while 32 cores idled. Java parallel streams keep
    // the per-subspace math (and thus every codebook bit) identical.
    val out = new Array[Array[Array[Long]]](m)
    java.util.stream.IntStream.range(0, m).parallel().forEach { ms =>
      out(ms) = trainSubspace(vecs, ms, sub, ksub, iters, scale)
    }
    out
  }

  private def trainSubspace(
      vecs: Array[Array[Double]],
      ms: Int,
      sub: Int,
      ksub: Int,
      iters: Int,
      scale: Double): Array[Array[Long]] = {
      val subs = vecs.map(_.slice(ms * sub, (ms + 1) * sub))
      var cents = Array.tabulate(math.min(ksub, subs.length))(i => subs(i).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(cents.length)(new Array[Double](sub))
        val counts = new Array[Long](cents.length)
        subs.foreach { v =>
          // argmin L2, ties to the lowest centroid index
          var best = 0; var bestD = Double.MaxValue
          var j = 0
          while (j < cents.length) {
            var d = 0.0; var t = 0
            while (t < sub) { val x = v(t) - cents(j)(t); d += x * x; t += 1 }
            if (d < bestD) { bestD = d; best = j }
            j += 1
          }
          val s = sums(best)
          var t = 0
          while (t < sub) { s(t) += v(t); t += 1 }
          counts(best) += 1
        }
        cents = cents.zipWithIndex.map { case (c, j) =>
          if (counts(j) == 0) c
          else Array.tabulate(sub)(t => sums(j)(t) / counts(j))
        }
        it += 1
      }
      cents.map(_.map(x => math.floor(x * scale).toLong))
  }

  /** Variance-balancing dimension permutation — the non-parametric
    * allocation OPQ builds on (Ge, He, Ke, Sun: "Optimized Product
    * Quantization", CVPR 2013: balance the variance each sub-quantizer
    * must spend its 8 bits on; their parametric rotation needs float
    * eigendecompositions, but the PERMUTATION family is fully
    * integer-lattice and oracle-replayable). Per-dimension variance
    * over the deterministic sample (integer sums on the ×1000
    * lattice), dims sorted by variance DESC, greedy-assigned to the
    * subspace with the lowest variance sum and free slots; each
    * subspace's dims then sort ascending so the exported (pos, src)
    * table is canonical. Dot products are permutation-invariant, so
    * ADC scoring and every downstream consumer work unchanged on the
    * permuted lattice.
    */
  private[graft] def pqTrainPermutation(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      sampleCap: Int = 4096): Array[Int] = {
    val sample = emb.select(
        col(idCol).cast("long").as("id"),
        packUdf(asDouble(col(vecCol))).as("pv"))
      .orderBy(xxhash64(col("id"))).limit(sampleCap)
      .collect()
      .sortBy(_.getLong(0))
      .map(r => r.getAs[Array[Byte]]("pv"))
    require(sample.nonEmpty, "pq perm: empty corpus")
    val dim = sample.head.length / 8
    require(dim % m == 0, s"pq perm: dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val s1 = new Array[Long](dim)
    val s2 = new Array[Long](dim)
    sample.foreach { pv =>
      val bb = java.nio.ByteBuffer.wrap(pv)
      var j = 0
      while (j < dim) {
        val v = math.floor(bb.getDouble(j * 8) * 1000).toLong
        s1(j) += v; s2(j) += v * v
        j += 1
      }
    }
    val n = sample.length.toLong
    // n·Σv² − (Σv)² — the integer variance numerator (scale-free for
    // ordering); Long-safe at |v| ≤ ~2^13 over ≤4096 samples
    val varNum = Array.tabulate(dim)(j => n * s2(j) - s1(j) * s1(j))
    val order = (0 until dim).sortBy(j => (-varNum(j), j))
    val sums = new Array[Long](m)
    val slots = Array.fill(m)(0)
    val assign = Array.fill(m)(Vector.empty[Int])
    order.foreach { j =>
      val ms = (0 until m).filter(slots(_) < sub).minBy(k => (sums(k), k))
      sums(ms) += varNum(j); slots(ms) += 1
      assign(ms) = assign(ms) :+ j
    }
    assign.flatMap(_.sorted).toArray
  }

  /** Apply a trained permutation to a lattice vector. */
  private[graft] def permute(perm: Array[Int], qv: Array[Long]): Array[Long] =
    Array.tabulate(qv.length)(k => qv(perm(k)))

  /** Residual codebooks for IVFADC (Jégou, Douze, Schmid: "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011 §III):
    * each sample vector is assigned to its integer-L2-nearest coarse
    * centroid (the [[pqEncode]] rule over `ccb` — a ONE-subspace
    * codebook of `numCells` full-dim entries), and the per-subspace
    * k-means trains on the RESIDUALS qvInt(v) − centroid, which are
    * already on the ×1000 lattice (scale 1 at the floor). Residuals
    * concentrate around 0 far more tightly than raw vectors spread
    * over the whole space, so the same m·log2(ksub) bits quantize
    * them with less error — the recall lift at equal bytes.
    */
  private[graft] def pqTrainResidualCodebooksInt(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      ccb: Array[Array[Array[Long]]],
      m: Int,
      ksub: Int,
      iters: Int,
      sampleCap: Int = 4096): Array[Array[Array[Long]]] = {
    val sample = emb.select(
        col(idCol).cast("long").as("id"),
        packUdf(asDouble(col(vecCol))).as("pv"))
      .orderBy(xxhash64(col("id"))).limit(sampleCap)
      .collect()
      .sortBy(_.getLong(0))
      .map(r => r.getAs[Array[Byte]]("pv"))
    require(sample.nonEmpty, "ivfadc: empty corpus")
    val dim = sample.head.length / 8
    val residuals = sample.map { pv =>
      val bb = java.nio.ByteBuffer.wrap(pv)
      val qv = qvInt(Array.tabulate(dim)(j => bb.getDouble(j * 8)).toSeq)
      val cent = ccb(0)(pqEncode(ccb, qv)(0))
      Array.tabulate(dim)(t => (qv(t) - cent(t)).toDouble)
    }
    kmeansSubspaces(residuals, m, ksub, iters, scale = 1.0)
  }

  /** Integer-lattice projection of a vector (the q105 convention). */
  private[graft] def qvInt(v: Seq[Double]): Array[Long] =
    v.map(x => math.floor(x * 1000).toLong).toArray
  private val qvIntUdf = udf((v: Seq[Double]) => qvInt(v))

  /** PQ-encode: per subspace, the index of the integer-L2-nearest
    * codebook entry (ties to the lowest index — the SQL row_number
    * rule). */
  private[graft] def pqEncode(cb: Array[Array[Array[Long]]], qv: Array[Long]): Array[Int] = {
    val m = cb.length
    val sub = qv.length / m
    Array.tabulate(m) { ms =>
      val cents = cb(ms)
      var best = 0; var bestD = Long.MaxValue
      var j = 0
      while (j < cents.length) {
        var d = 0L; var t = 0
        while (t < sub) { val x = qv(ms * sub + t) - cents(j)(t); d += x * x; t += 1 }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      best
    }
  }

  /** Flat PQ-ADC top-k, recall-gated against the exact float ranking
    * (the q101 judgment tail), with the integer codebooks EXPORTED as
    * parquet `(msub, j, cv ARRAY<BIGINT>)` for the external oracle.
    *
    * Plan shape at 100 TB: codebooks are m·ksub·subdim longs (a few
    * hundred KB) — broadcast; the corpus is encoded map-side to m
    * bytes/vector in ONE narrow pass and never shuffled; each query
    * carries its precomputed ADC lookup table (m·ksub longs), so
    * scoring a candidate is m array reads instead of a dim-length
    * dot; only the query-bounded top-k frames shuffle. The float
    * vectors are touched exactly twice — once to encode, once inside
    * the recall judge — never on the serving path.
    */
  def pqTopKRecallExport(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      m: Int,
      ksub: Int,
      trainIters: Int,
      k: Int,
      exportPath: String,
      sampleCap: Int = 4096): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cb = pqTrainCodebooksInt(emb, idCol, vecCol, m, ksub, trainIters, sampleCap)
    graft.OracleAux.register(exportPath) {
      pqCbToFrame(spark, cb).coalesce(1).write.mode("overwrite").parquet(exportPath)
    }
    val approx = pqAdcTopK(emb, idCol, vecCol, queries, cb, k)
    recallVsExact(approx, emb, idCol, vecCol, queries, k)
  }

  /** [[pqTopKRecallExport]] over the variance-balanced PERMUTED
    * lattice ([[pqTrainPermutation]]): codebooks train on permuted
    * sample vectors, encode/LUT permute before scoring, and BOTH the
    * permutation table (pos, src) and the codebooks export for the
    * oracle. On anisotropic corpora (variance concentrated in a few
    * contiguous dims) the balanced allocation lifts recall at equal
    * bytes — PqSpec pins permuted ≥ contiguous on such a corpus.
    */
  def pqPermutedTopKRecallExport(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      m: Int,
      ksub: Int,
      trainIters: Int,
      k: Int,
      permExportPath: String,
      cbExportPath: String,
      sampleCap: Int = 4096): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val perm = pqTrainPermutation(emb, idCol, vecCol, m, sampleCap)
    val cb = pqTrainCodebooksInt(emb, idCol, vecCol, m, ksub, trainIters,
      sampleCap, Some(perm))
    graft.OracleAux.register(permExportPath) {
      perm.zipWithIndex.map { case (src, pos) => (pos, src) }.toSeq
        .toDF("pos", "src").coalesce(1).write.mode("overwrite").parquet(permExportPath)
    }
    graft.OracleAux.register(cbExportPath) {
      pqCbToFrame(spark, cb).coalesce(1).write.mode("overwrite").parquet(cbExportPath)
    }
    val approx = pqAdcTopK(emb, idCol, vecCol, queries, cb, k, perm = Some(perm))
    recallVsExact(approx, emb, idCol, vecCol, queries, k)
  }

  /** PQ-ADC shortlist + EXACT float re-rank — the standard two-stage
    * PQ serving pattern: the 8-byte codes prune the corpus to a
    * query-bounded shortlist of `shortlist` candidates (integer ADC
    * only — the compressed scan), then [[exactRerank]] fetches float
    * vectors for shortlist rows alone and re-orders by true cosine.
    * Codebooks exported as in [[pqTopKRecallExport]] so the DuckDB
    * twin replays shortlist AND re-rank bit-for-bit.
    *
    * Recall dominance is structural: ADC-top-k ⊆ ADC-top-shortlist,
    * and exact re-rank keeps every true-top-k member that reached the
    * shortlist — so recall@k(re-rank) ≥ recall@k(raw ADC) per query,
    * monotone in `shortlist` (PqSpec pins both).
    */
  def pqRerankTopKRecallExport(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      m: Int,
      ksub: Int,
      trainIters: Int,
      shortlist: Int,
      k: Int,
      exportPath: String,
      sampleCap: Int = 4096): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val spark = emb.sparkSession
    import spark.implicits._
    val cb = pqTrainCodebooksInt(emb, idCol, vecCol, m, ksub, trainIters, sampleCap)
    graft.OracleAux.register(exportPath) {
      pqCbToFrame(spark, cb).coalesce(1).write.mode("overwrite").parquet(exportPath)
    }
    val short = pqAdcTopK(emb, idCol, vecCol, queries, cb, shortlist)
    recallVsExact(exactRerank(short, emb, queries, idCol, vecCol, k),
      emb, idCol, vecCol, queries, k)
  }

  /** The shared ADC scorer: encode the corpus against `cb`, build
    * per-query lookup tables, rank by integer ADC score (DESC, id).
    * Returns (query_id, neighbor_id), k rows per query.
    */
  /** Integer ADC lookup table of one query against the codebooks —
    * LUT[ms*ksub + j] = dot(query subvector, codebook entry); the ADC
    * score of a coded vector is then m array reads. Shared by the
    * flat scan and the maintained-gate kernel.
    */
  private[graft] def pqLutOf(
      cbv: Array[Array[Array[Long]]], ksubN: Int, qv: Array[Long]): Array[Long] = {
    val sub = qv.length / cbv.length
    val lut = new Array[Long](cbv.length * ksubN)
    var ms = 0
    while (ms < cbv.length) {
      var j = 0
      while (j < cbv(ms).length) {
        var s = 0L; var t = 0
        while (t < sub) { s += qv(ms * sub + t) * cbv(ms)(j)(t); t += 1 }
        lut(ms * ksubN + j) = s
        j += 1
      }
      ms += 1
    }
    lut
  }

  /** Codebooks as the (msub, j, cv) frame the DuckDB twins read. */
  private[graft] def pqCbToFrame(
      spark: SparkSession, cb: Array[Array[Array[Long]]]): DataFrame = {
    import spark.implicits._
    cb.zipWithIndex.toSeq.flatMap { case (cents, ms) =>
      cents.zipWithIndex.map { case (cv, j) => (ms, j, cv.toSeq) }
    }.toDF("msub", "j", "cv")
  }

  /** Inverse of [[pqCbToFrame]] (manifest resume). */
  private[graft] def pqCbFromFrame(df: DataFrame): Array[Array[Array[Long]]] = {
    val rows = df.select("msub", "j", "cv").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toArray))
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, g) =>
      g.sortBy(_._2).map(_._3).toArray
    }.toArray
  }

  /** Append 8-byte PQ codes to a postings frame: codes derive from
    * the packed floats (bit-identical doubles → the q160 floor
    * lattice), so re-deriving at compaction/reseed/resume is
    * deterministic and the codebooks never retrain.
    */
  /** Mean ADC recall@k (×100) against the exact float top-k, over a
    * deterministic ≤`sampleCap` query sample of the corpus (lowest
    * xxhash64(id) — the q39 sample discipline). The mean is INTEGER
    * arithmetic (sum of per-query overlaps), so the drift trigger it
    * feeds is bit-deterministic across partitionings. Cost: one
    * corpus scan per call against the broadcast sample (the
    * allowlisted flat-ADC/exact-judge class), bounded at any scale.
    */
  private[graft] def pqMeanRecallX100(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Array[Array[Array[Long]]],
      k: Int,
      sampleCap: Int): Long = {
    val queries = corpus
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(sampleCap)
    val approx = pqAdcTopK(corpus, idCol, vecCol, queries, cb, k)
    val rec = recallVsExact(approx, corpus, idCol, vecCol, queries, k)
    val r = rec.agg(
      sum(col("n_overlap")).as("s"), count(lit(1)).as("n")).head()
    val n = r.getLong(1)
    if (n == 0L) 100L else r.getLong(0) * 100L / (n * k)
  }

  /** The residual-mode drift judge: mean ADC recall@k (×100) where
    * candidates score as dot(q, cent_cell) + residual-ADC — the same
    * estimate the serving shortlist uses — against the exact float
    * top-k over the [[pqMeanRecallX100]] deterministic query sample.
    * Flat scan (every posting a candidate): the judge measures CODE
    * quality, not probe coverage.
    */
  private[graft] def pqMeanRecallX100Residual(
      postings: DataFrame,
      cb: Array[Array[Array[Long]]],
      centInt: Map[Long, Array[Long]],
      k: Int,
      sampleCap: Int): Long = {
    val spark = postings.sparkSession
    val sc = spark.sparkContext
    val bcb = sc.broadcast(cb)
    val bci = sc.broadcast(centInt)
    val ksubN = cb.map(_.length).max
    val raw = postings.select(col("vec_id"), col("cell"), col("fv"),
      unpackUdf(col("fv")).as("v"))
    val queries = raw.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(sampleCap)
    val coded = withPqCodesResidual(raw, cb, centInt)
    val lutUdf = udf { (fv: Array[Byte]) =>
      val lut = pqLutOf(bcb.value, ksubN, qvInt(unpackDoubles(fv)))
      val bb = java.nio.ByteBuffer.allocate(lut.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < lut.length) { bb.putLong(i * 8, lut(i)); i += 1 }
      bb.array()
    }
    val adcUdf = udf { (lut: Array[Byte], codes: Seq[Int]) =>
      val bb = java.nio.ByteBuffer.wrap(lut)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var s = 0L; var ms = 0
      while (ms < codes.length) { s += bb.getLong((ms * ksubN + codes(ms)) * 8); ms += 1 }
      s
    }
    val qdUdf = udf { (qfv: Array[Byte], cell: Long) =>
      val qv = qvInt(unpackDoubles(qfv))
      val c = bci.value(cell)
      var s = 0L; var t = 0
      while (t < qv.length) { s += qv(t) * c(t); t += 1 }
      s
    }
    val q = queries.select(col("vec_id").as("query_id"),
      lutUdf(col("fv")).as("lut"), col("fv").as("qfv"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("nid"))
    val approx = coded.select(col("vec_id").as("nid"), col("cell"), col("codes"))
      .crossJoin(broadcast(q))
      .filter(col("nid") =!= col("query_id"))
      .withColumn("score",
        adcUdf(col("lut"), col("codes")) + qdUdf(col("qfv"), col("cell")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nid").as("neighbor_id"))
    val rec = recallVsExact(approx, raw, "vec_id", "v", queries.select("vec_id", "v"), k)
    val r = rec.agg(
      sum(col("n_overlap")).as("s"), count(lit(1)).as("n")).head()
    val n = r.getLong(1)
    if (n == 0L) 100L else r.getLong(0) * 100L / (n * k)
  }

  private[graft] def withPqCodes(
      postings: DataFrame, cb: Array[Array[Array[Long]]]): DataFrame = {
    val bcb = postings.sparkSession.sparkContext.broadcast(cb)
    val enc = udf((fv: Array[Byte]) => pqEncode(bcb.value, qvInt(unpackDoubles(fv))))
    postings.withColumn("codes", enc(col("fv")))
  }

  /** The RESIDUAL form of [[withPqCodes]] (IVFADC inside the
    * maintained gate): codes quantize qvInt(v) − centInt(cell) — the
    * posting's residual to its own cell's lattice centroid — so the
    * same 8 bytes carry the tighter residual distribution. `centInt`
    * maps each closure cell id to floor(centroid_vector × 1000).
    */
  private[graft] def withPqCodesResidual(
      postings: DataFrame,
      cb: Array[Array[Array[Long]]],
      centInt: Map[Long, Array[Long]]): DataFrame = {
    val sc = postings.sparkSession.sparkContext
    val bcb = sc.broadcast(cb)
    val bci = sc.broadcast(centInt)
    val enc = udf { (cell: Long, fv: Array[Byte]) =>
      val qv = qvInt(unpackDoubles(fv))
      val c = bci.value(cell)
      pqEncode(bcb.value, Array.tabulate(qv.length)(t => qv(t) - c(t)))
    }
    postings.withColumn("codes", enc(col("cell"), col("fv")))
  }

  /** cid → floor(centroid × 1000) for a closure seeded from the
    * `ids`' own raw vectors — the residual sidecar's lattice centroid
    * table. Bounded collect (one row per centroid).
    */
  private[graft] def latticeCentroids(
      raw: DataFrame, idCol: String, vecCol: String,
      ids: Array[Long]): Map[Long, Array[Long]] = {
    val idSet = ids.toSet
    raw.select(col(idCol).cast("long").as("id"), asDouble(col(vecCol)).as("v"))
      .filter(col("id").isin(ids: _*))
      .collect()
      .map(r => r.getLong(0) -> qvInt(r.getSeq[Double](1)))
      .toMap
      .ensuring(m => idSet.forall(m.contains),
        "residual pq: a closure centroid id is missing from the corpus")
  }

  /** Residual codebooks trained from POSTINGS rows (vec_id, cell,
    * fv): sample residuals to the assigned cell's lattice centroid,
    * then the shared per-subspace k-means (scale 1 — residuals are
    * already on the ×1000 lattice). The gate-side twin of
    * [[pqTrainResidualCodebooksInt]].
    */
  private[graft] def pqTrainResidualCodebooksFromPostings(
      postings: DataFrame,
      centInt: Map[Long, Array[Long]],
      m: Int,
      ksub: Int,
      iters: Int,
      sampleCap: Int = 4096): Array[Array[Array[Long]]] = {
    val sample = postings.select(col("vec_id"), col("cell"), col("fv"))
      .orderBy(xxhash64(col("vec_id"))).limit(sampleCap)
      .collect()
      .sortBy(_.getLong(0))
    require(sample.nonEmpty, "residual pq: empty postings")
    val residuals = sample.map { r =>
      val qv = qvInt(unpackDoubles(r.getAs[Array[Byte]]("fv")))
      val c = centInt(r.getLong(1))
      Array.tabulate(qv.length)(t => (qv(t) - c(t)).toDouble)
    }
    kmeansSubspaces(residuals, m, ksub, iters, scale = 1.0)
  }

  /** [[ivfAnnotateBatch]] with the shortlist scored by integer PQ-ADC
    * instead of the int8 dot: candidates are pruned by their 8-byte
    * codes against each query's lookup table (the compressed-scan
    * serving path — at 100 TB the codes table is ~16 B/vector hot,
    * floats touched only for shortlist rows at the exact re-rank).
    * Probe cells, fold semantics, multi-version dedupe, and every
    * tie-break mirror the int8 kernel; with shortlist ≥ candidate
    * count the two kernels are decision-identical (the re-rank sees
    * the same set — VectorIndexGateSpec pins it).
    */
  private[graft] def ivfAnnotateBatchPq(
      standing: DataFrame,
      batch: DataFrame,
      cc: CentroidClosure,
      cb: Array[Array[Array[Long]]],
      nprobe: Int,
      shortlist: Int,
      k: Int,
      includeBatchAsCandidates: Boolean = true,
      // IVFADC mode: cid → floor(centroid × 1000). When set, `codes`
      // are RESIDUAL codes (withPqCodesResidual) and the shortlist
      // score becomes dot(q, cent_cell) + Σ LUT[code] — the raw-query
      // LUT estimates dot(q, r̂), the scalar restores the cell offset
      // (dot(q, cent + r̂) = q·cent + q·r̂).
      residualCentInt: Option[Map[Long, Array[Long]]] = None,
      // false = COMPRESSED-ONLY serving (round 15): rank directly by
      // the integer ADC score, never touching the float vectors — the
      // deployment where floats live in cold storage and the hot index
      // is codes-only (8-16 B/vector). true = the two-stage default
      // (ADC shortlist, exact float re-rank of shortlist rows only).
      rerankFloat: Boolean = true): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val spark = standing.sparkSession
    val bcb = spark.sparkContext.broadcast(cb)
    val ksubN = cb.map(_.length).max
    val probeUdf = udf((v: Array[Byte], nrm: Double) => cc.probesOf(nprobe)(v, nrm))
    // binary-packed LUT — see pqAdcTopK: a bigint-array column boxes
    // all m·ksub longs per candidate row inside the UDF
    val lutUdf = udf { (fv: Array[Byte]) =>
      val lut = pqLutOf(bcb.value, ksubN, qvInt(unpackDoubles(fv)))
      val bb = java.nio.ByteBuffer.allocate(lut.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < lut.length) { bb.putLong(i * 8, lut(i)); i += 1 }
      bb.array()
    }
    val adcUdf = residualCentInt match {
      case None => udf { (lut: Array[Byte], codes: Seq[Int], _: Long) =>
        val bb = java.nio.ByteBuffer.wrap(lut)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var s = 0L; var ms = 0
        while (ms < codes.length) { s += bb.getLong((ms * ksubN + codes(ms)) * 8); ms += 1 }
        s
      }
      case Some(_) => udf { (lut: Array[Byte], codes: Seq[Int], qdotc: Long) =>
        val bb = java.nio.ByteBuffer.wrap(lut)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var s = qdotc; var ms = 0
        while (ms < codes.length) { s += bb.getLong((ms * ksubN + codes(ms)) * 8); ms += 1 }
        s
      }
    }
    // per-(query, probed cell) offset scalar in residual mode; a
    // constant 0 column otherwise (one codegen'd shape either way)
    val qdotcCol = residualCentInt match {
      case None => lit(0L)
      case Some(ci) =>
        val bci = spark.sparkContext.broadcast(ci)
        udf { (fv: Array[Byte], cell: Long) =>
          val qv = qvInt(unpackDoubles(fv))
          val c = bci.value(cell)
          var s = 0L; var t = 0
          while (t < qv.length) { s += qv(t) * c(t); t += 1 }
          s
        }.apply(col("qfv"), col("cell"))
    }
    val probes = batch.select(
        col("vec_id").as("qid"), lutUdf(col("fv")).as("lut"),
        col("fv").as("qfv"), col("fnrm").as("qfnrm"),
        explode(probeUdf(col("qv"), col("qn"))).as("cell"))
      .withColumn("qdotc", qdotcCol)
    val standingLive =
      if (includeBatchAsCandidates)
        standing.join(broadcast(batch.select("vec_id")), Seq("vec_id"), "left_anti")
      else standing
    val standingC = standingLive
      .join(broadcast(probes.select("cell").distinct()), Seq("cell"), "left_semi")
    val candidates =
      if (includeBatchAsCandidates) standingC.unionByName(batch) else standingC
    val ws = Window.partitionBy("query_id").orderBy(col("adc").desc, col("neighbor_id"))
    val scored = candidates.join(broadcast(probes), Seq("cell"))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("adc", adcUdf(col("lut"), col("codes"), col("qdotc")))
    if (!rerankFloat) {
      // a posting lives in exactly ONE cell and probe cells are
      // distinct per query, so (query, neighbor) appears once — rank
      // straight off the ADC order, no dedupe, no float columns
      scored
        .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"), col("adc"))
        .withColumn("rank", row_number().over(ws))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    } else {
      val short = scored
        .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
          col("adc"), col("qfv"), col("qfnrm"), col("fv"), col("fnrm"))
        .withColumn("srank", row_number().over(ws))
        .filter(col("srank") <= shortlist)
      val wr = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
      val wv = Window.partitionBy("query_id", "neighbor_id").orderBy(col("sim").desc)
      short
        .withColumn("sim", dotPacked(col("qfv"), col("fv")) / (col("qfnrm") * col("fnrm")))
        .select(col("query_id"), col("neighbor_id"), col("sim"))
        .withColumn("vrank", row_number().over(wv))
        .filter(col("vrank") === 1)
        .withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }
  }

  private[graft] def pqAdcTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      cb: Array[Array[Array[Long]]],
      k: Int,
      candidates: Option[DataFrame] = None,
      broadcastLutCap: Int = 4096,
      // variance-balancing dimension permutation (pqTrainPermutation):
      // applied to every lattice vector before encode/LUT — dot
      // products are permutation-invariant so scores need no unmapping
      perm: Option[Array[Int]] = None): DataFrame = {
    val spark = emb.sparkSession
    val bcb = spark.sparkContext.broadcast(cb)
    // the permutation is tiny (dim ints) — captured directly; a local
    // helper def here would drag the whole enclosing scope (DataFrames
    // included) into every UDF closure and fail serialization
    val pArr: Array[Int] = perm.orNull
    val mSub = cb.length
    val ksubN = cb.map(_.length).max
    val encodeUdf = udf { (v: Seq[Double]) =>
      val qv0 = qvInt(v)
      pqEncode(bcb.value, if (pArr == null) qv0 else permute(pArr, qv0))
    }
    // BOUNDED query sets (the common serving shape — ≤ cap rows) skip
    // carrying the LUT through the join entirely: the driver collects
    // the query vectors once (the q39 bounded-closure pattern), builds
    // the integer LUTs, and broadcasts a plain map — the scoring UDF
    // then reads primitive longs with ZERO per-pair array transfer.
    // Even binary-packed, a per-pair LUT column costs a 16 KB copy per
    // candidate (measured: the q169 62× leg spent ~80% of its wall
    // there); the map path is pure lookups. Above the cap the packed
    // binary column flow below remains (still never boxes).
    //
    // NOTE this probe collect runs a bounded job at PLAN-CONSTRUCTION
    // time (limit cap+1 → at most a few thousand tiny rows) — query
    // construction here is not job-free, unlike the OracleAux-deferred
    // exports. Audit contexts that must build plans without running
    // jobs (PlanAuditSpec-style inspection) pass broadcastLutCap = 0
    // to force the column path, which constructs lazily (the probe
    // collect below is skipped entirely at cap 0).
    val qHead: Array[org.apache.spark.sql.Row] =
      if (broadcastLutCap <= 0) Array.empty
      else queries
        .select(col(idCol).cast("long").as("query_id"),
          asDouble(col(vecCol)).as("qv"))
        .limit(broadcastLutCap + 1).collect()
    if (broadcastLutCap > 0 && qHead.length <= broadcastLutCap) {
      val lutMap = qHead.map(r =>
        r.getLong(0) -> {
          val qv0 = qvInt(r.getSeq[Double](1))
          pqLutOf(bcb.value, ksubN, if (pArr == null) qv0 else permute(pArr, qv0))
        }).toMap
      // A duplicate query id would silently collapse to one LUT here
      // while the column path would keep both rows — refuse loudly
      // instead of diverging between the two paths (round-13 advice).
      require(lutMap.size == qHead.length,
        s"pq adc: duplicate query ids in bounded query set " +
          s"(${qHead.length} rows, ${lutMap.size} distinct ids)")
      val blut = spark.sparkContext.broadcast(lutMap)
      val adcUdf = udf { (qid: Long, codes: Seq[Int]) =>
        val lut = blut.value(qid)
        var s = 0L; var ms = 0
        while (ms < codes.length) { s += lut(ms * ksubN + codes(ms)); ms += 1 }
        s
      }
      val codes = emb.select(col(idCol).cast("long").as("nid"),
        encodeUdf(asDouble(col(vecCol))).as("codes"))
      val q = queries.select(col(idCol).cast("long").as("query_id"))
      val scoredBase = candidates match {
        case None => codes.crossJoin(broadcast(q))
        case Some(cand) =>
          codes.join(cand.select(col("query_id"), col("neighbor_id").as("nid")), Seq("nid"))
            .join(broadcast(q), Seq("query_id"))
      }
      val w = Window.partitionBy("query_id").orderBy(col("adc").desc, col("nid"))
      return scoredBase
        .filter(col("nid") =!= col("query_id"))
        .withColumn("adc", adcUdf(col("query_id"), col("codes")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("nid").as("neighbor_id"))
    }
    // LUT[ms*ksub + j] = dot(query subvector, codebook entry) — all
    // integer; ADC score of x is then Σ_ms LUT[ms*ksub + code_ms(x)].
    // The LUT crosses the join PACKED AS BYTES: a bigint-array column
    // would box all m·ksub longs into a Seq PER PAIR inside the Scala
    // UDF (measured ~60 µs/pair — 10× the whole scan's cost at 256
    // queries); a binary column hands the UDF the raw byte[] and the
    // loop reads the 8 hit slots directly.
    val lutUdf = udf { (v: Seq[Double]) =>
      val qv0 = qvInt(v)
      val lut = pqLutOf(bcb.value, ksubN, if (pArr == null) qv0 else permute(pArr, qv0))
      val bb = java.nio.ByteBuffer.allocate(lut.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < lut.length) { bb.putLong(i * 8, lut(i)); i += 1 }
      bb.array()
    }
    val adcUdf = udf { (lut: Array[Byte], codes: Seq[Int]) =>
      val bb = java.nio.ByteBuffer.wrap(lut)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var s = 0L; var ms = 0
      while (ms < codes.length) { s += bb.getLong((ms * ksubN + codes(ms)) * 8); ms += 1 }
      s
    }
    val codes = emb.select(col(idCol).cast("long").as("nid"),
      encodeUdf(asDouble(col(vecCol))).as("codes"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      lutUdf(asDouble(col(vecCol))).as("lut"))
    val scoredBase = candidates match {
      case None => codes.crossJoin(broadcast(q))
      case Some(cand) => // probe-restricted: only (query, neighbor) pairs in cand
        codes.join(cand.select(col("query_id"), col("neighbor_id").as("nid")), Seq("nid"))
          .join(broadcast(q), Seq("query_id"))
    }
    val w = Window.partitionBy("query_id").orderBy(col("adc").desc, col("nid"))
    scoredBase
      .filter(col("nid") =!= col("query_id"))
      .withColumn("adc", adcUdf(col("lut"), col("codes")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nid").as("neighbor_id"))
  }

  /** IVF + PQ: coarse cells from [[kmeansCentroids]] (float training,
    * the q39 machinery), candidates from the query's `nprobe` nearest
    * cells, ADC scoring within the candidate set. The scale path for
    * PQ serving — candidate count is probe-bounded, the scan never
    * touches unprobed cells. Returns the recall@k judgment
    * (query_id, n_overlap, recall_x100); [[ivfPqCandidates]] exposes
    * the raw candidate sets, whose exact-top-k overlap is MONOTONE in
    * nprobe by construction (probing more cells only grows the set) —
    * the property PqSpec pins.
    */
  /** IVFADC serving scan (Jégou et al. 2011 §IV): every corpus vector
    * is stored as (cell, 8-byte residual codes); a query probes its
    * `nprobe` integer-L2-nearest cells and scores each candidate as
    *
    *   dot(q, x) ≈ dot(q, cent_cell) + Σ_ms LUT_cell[ms, code_ms]
    *
    * where LUT is the RAW query's table against the residual
    * codebooks (dot(q, cent + r̂) = q·cent + q·r̂ — under the house
    * inner-product scoring the query-residual LUT of the L2 IVFADC
    * formulation would bias every candidate by −cent·r̂). One LUT per
    * query regardless of nprobe, plus a per-cell scalar; all on the
    * ×1000 integer lattice so the DuckDB twin replays scores
    * bit-for-bit.
    *
    * Plan shape at 100 TB: coarse centroids + residual codebooks are
    * a few hundred KB — broadcast; the corpus encodes map-side once
    * (cell + codes, ~9 B/vector) and is never reshuffled; probing is
    * a broadcast semi-restriction to the probed cells. Bounded query
    * sets ride a broadcast (query, cell) → LUT map (zero per-pair
    * transfer — the q160/q163 LUT lesson); above the cap the packed
    * binary LUT column crosses the join (never boxes).
    */
  private[graft] def ivfadcTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      ccb: Array[Array[Array[Long]]],
      rcb: Array[Array[Array[Long]]],
      nprobe: Int,
      k: Int,
      broadcastLutCap: Int = 4096): DataFrame = {
    val spark = emb.sparkSession
    val numCells = ccb(0).length
    val bccb = spark.sparkContext.broadcast(ccb)
    val brcb = spark.sparkContext.broadcast(rcb)
    val mSub = rcb.length
    val ksubN = rcb.map(_.length).max
    // one narrow pass: cell assignment (the pqEncode integer-L2 +
    // lowest-index rule over the one-subspace coarse book) + residual
    // codes
    val encodeUdf = udf { (v: Seq[Double]) =>
      val qv = qvInt(v)
      val cell = pqEncode(bccb.value, qv)(0)
      val cent = bccb.value(0)(cell)
      val r = Array.tabulate(qv.length)(t => qv(t) - cent(t))
      (cell, pqEncode(brcb.value, r))
    }
    val codes = emb.select(col(idCol).cast("long").as("nid"),
      encodeUdf(asDouble(col(vecCol))).as("cc"))
      .select(col("nid"), col("cc._1").as("cell"), col("cc._2").as("codes"))
    // probe list of one query vector: nprobe nearest cells by integer
    // L2 (d ASC, cell ASC — the oracle's row_number order), each with
    // its dot(q, cent) scalar; ONE raw-query LUT per query
    def probesOf(qv: Array[Long]): Array[(Int, Long)] = {
      val cents = bccb.value(0)
      val byD = Array.tabulate(cents.length) { j =>
        var d = 0L; var t = 0
        while (t < qv.length) { val x = qv(t) - cents(j)(t); d += x * x; t += 1 }
        (d, j)
      }.sortBy(identity).take(nprobe)
      byD.map { case (_, cell) =>
        val cent = cents(cell)
        var qc = 0L; var t = 0
        while (t < qv.length) { qc += qv(t) * cent(t); t += 1 }
        (cell, qc)
      }
    }
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("nid"))
    val qHead: Array[org.apache.spark.sql.Row] =
      if (broadcastLutCap <= 0) Array.empty
      else queries
        .select(col(idCol).cast("long").as("query_id"),
          asDouble(col(vecCol)).as("qv"))
        .limit(broadcastLutCap + 1).collect()
    // the broadcast-map fast path prepends a per-cell scalar slot per
    // query, so it only engages for closure-sized cell counts; a
    // 100 TB index with thousands of cells rides the packed-binary
    // column path below, which has no cell-count bound
    if (broadcastLutCap > 0 && qHead.length <= broadcastLutCap && numCells <= 4096) {
      // bounded: broadcast qid → [qdotc per cell…, lut…]; the scoring
      // UDF reads primitive longs, zero per-pair transfer
      val lutMap: Map[Long, Array[Long]] = qHead.iterator.map { r =>
        val qid = r.getLong(0)
        val qv = qvInt(r.getSeq[Double](1))
        val head = new Array[Long](numCells)
        probesOf(qv).foreach { case (cell, qc) => head(cell) = qc }
        qid -> (head ++ pqLutOf(brcb.value, ksubN, qv))
      }.toMap
      require(lutMap.size == qHead.length,
        "ivfadc: duplicate query ids in bounded query set")
      val blut = spark.sparkContext.broadcast(lutMap)
      val adcUdf = udf { (qid: Long, cell: Int, codes: Seq[Int]) =>
        val a = blut.value(qid)
        var s = a(cell); var ms = 0
        while (ms < codes.length) { s += a(numCells + ms * ksubN + codes(ms)); ms += 1 }
        s
      }
      import spark.implicits._
      val probeRows = qHead.iterator.flatMap { r =>
        val qid = r.getLong(0)
        probesOf(qvInt(r.getSeq[Double](1))).iterator.map { case (cell, _) => (qid, cell) }
      }.toSeq.toDF("query_id", "cell")
      return codes.join(broadcast(probeRows), Seq("cell"))
        .filter(col("nid") =!= col("query_id"))
        .withColumn("score", adcUdf(col("query_id"), col("cell"), col("codes")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("nid").as("neighbor_id"))
    }
    // above the cap: the (query, cell) probe frame carries qdotc and
    // the packed-binary raw-query LUT through the join
    val probeUdf = udf { (v: Seq[Double]) =>
      val qv = qvInt(v)
      val lut = pqLutOf(brcb.value, ksubN, qv)
      val bb = java.nio.ByteBuffer.allocate(lut.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < lut.length) { bb.putLong(i * 8, lut(i)); i += 1 }
      val packed = bb.array()
      probesOf(qv).map { case (cell, qc) => (cell, qc, packed) }
    }
    val adcUdf = udf { (qc: Long, lut: Array[Byte], codes: Seq[Int]) =>
      val bb = java.nio.ByteBuffer.wrap(lut)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var s = qc; var ms = 0
      while (ms < codes.length) { s += bb.getLong((ms * ksubN + codes(ms)) * 8); ms += 1 }
      s
    }
    val probes = queries.select(col(idCol).cast("long").as("query_id"),
        explode(probeUdf(asDouble(col(vecCol)))).as("p"))
      .select(col("query_id"), col("p._1").as("cell"),
        col("p._2").as("qdotc"), col("p._3").as("lut"))
    codes.join(broadcast(probes), Seq("cell"))
      .filter(col("nid") =!= col("query_id"))
      .withColumn("score", adcUdf(col("qdotc"), col("lut"), col("codes")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nid").as("neighbor_id"))
  }

  /** IVFADC with the recall judgment and the oracle exports: coarse
    * centroids (one-subspace codebook) and residual codebooks land as
    * the standard (msub, j, cv) frames, so the DuckDB twin replays
    * assignment, residual encode, probe order, and every score. The
    * residual encoding lifts recall at EQUAL bytes vs direct PQ
    * (q160/q169's form) — PqSpec pins the ≥ on a clustered corpus and
    * BASELINE records the measured lift.
    */
  def ivfadcTopKRecallExport(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      numCells: Int,
      coarseIters: Int,
      m: Int,
      ksub: Int,
      pqIters: Int,
      nprobe: Int,
      k: Int,
      coarseExportPath: String,
      cbExportPath: String,
      sampleCap: Int = 4096): DataFrame = {
    val spark = emb.sparkSession
    val ccb = pqTrainCodebooksInt(emb, idCol, vecCol, 1, numCells, coarseIters, sampleCap)
    val rcb = pqTrainResidualCodebooksInt(emb, idCol, vecCol, ccb, m, ksub, pqIters, sampleCap)
    graft.OracleAux.register(coarseExportPath) {
      pqCbToFrame(spark, ccb).coalesce(1).write.mode("overwrite").parquet(coarseExportPath)
    }
    graft.OracleAux.register(cbExportPath) {
      pqCbToFrame(spark, rcb).coalesce(1).write.mode("overwrite").parquet(cbExportPath)
    }
    val approx = ivfadcTopK(emb, idCol, vecCol, queries, ccb, rcb, nprobe, k)
    recallVsExact(approx, emb, idCol, vecCol, queries, k)
  }

  /** IVFADC shortlist + EXACT float re-rank — the two-stage serving
    * pattern (q163's discipline) over residual codes: the probed-cell
    * residual-ADC scan prunes to a `shortlist`-deep candidate frame,
    * the float cosine re-ranks shortlist rows only. Recall dominance
    * over raw IVFADC@k is structural within the probed candidate set
    * (ADC-top-k ⊆ ADC-top-shortlist; the re-rank keeps every true
    * neighbor that reached the shortlist).
    */
  def ivfadcRerankTopKRecallExport(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      numCells: Int,
      coarseIters: Int,
      m: Int,
      ksub: Int,
      pqIters: Int,
      nprobe: Int,
      shortlist: Int,
      k: Int,
      coarseExportPath: String,
      cbExportPath: String,
      sampleCap: Int = 4096): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val spark = emb.sparkSession
    val ccb = pqTrainCodebooksInt(emb, idCol, vecCol, 1, numCells, coarseIters, sampleCap)
    val rcb = pqTrainResidualCodebooksInt(emb, idCol, vecCol, ccb, m, ksub, pqIters, sampleCap)
    graft.OracleAux.register(coarseExportPath) {
      pqCbToFrame(spark, ccb).coalesce(1).write.mode("overwrite").parquet(coarseExportPath)
    }
    graft.OracleAux.register(cbExportPath) {
      pqCbToFrame(spark, rcb).coalesce(1).write.mode("overwrite").parquet(cbExportPath)
    }
    val short = ivfadcTopK(emb, idCol, vecCol, queries, ccb, rcb, nprobe, shortlist)
    recallVsExact(exactRerank(short, emb, queries, idCol, vecCol, k),
      emb, idCol, vecCol, queries, k)
  }

  def ivfPqTopKRecall(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      numCentroids: Int,
      trainIters: Int,
      nprobe: Int,
      m: Int,
      ksub: Int,
      pqIters: Int,
      k: Int,
      sampleCap: Int = 4096): DataFrame = {
    val cand = ivfPqCandidates(emb, idCol, vecCol, queries, numCentroids,
      trainIters, nprobe, sampleCap)
    val cb = pqTrainCodebooksInt(emb, idCol, vecCol, m, ksub, pqIters, sampleCap)
    val approx = pqAdcTopK(emb, idCol, vecCol, queries, cb, k, Some(cand))
    recallVsExact(approx, emb, idCol, vecCol, queries, k)
  }

  /** The probe-bounded candidate sets of [[ivfPqTopKRecall]]:
    * (query_id, neighbor_id) for every corpus vector in one of the
    * query's `nprobe` nearest coarse cells (self excluded). Growing
    * `nprobe` only ADDS rows — supersets by construction.
    */
  def ivfPqCandidates(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      numCentroids: Int,
      trainIters: Int,
      nprobe: Int,
      sampleCap: Int = 4096): DataFrame = {
    val cents = kmeansCentroids(emb, idCol, vecCol, numCentroids, trainIters, sampleCap)
    val cids = cents.map(_._1)
    val cvs = cents.map(_._2)
    val cnrms = cents.map(_._3)
    val spark = emb.sparkSession
    import spark.implicits._
    val assignUdf = udf { (v: Seq[Double]) =>
      val pv = packDoubles(v)
      nearestCentroid(cids, cvs, cnrms)(pv, math.sqrt(dotBytes(pv, pv)))
    }
    val probeUdf = udf { (v: Seq[Double]) =>
      val pv = packDoubles(v)
      val nrm = math.sqrt(dotBytes(pv, pv))
      // nprobe nearest cells by the same cosine order as assignment
      val sims = cids.indices.map { i =>
        val d = dotBytes(pv, cvs(i))
        val s = if (nrm == 0.0 || cnrms(i) == 0.0) 0.0 else d / (nrm * cnrms(i))
        (s, cids(i))
      }
      sims.sortBy { case (s, cid) => (-s, cid) }.take(nprobe).map(_._2).toArray
    }
    val cells = emb.select(col(idCol).cast("long").as("neighbor_id"),
      assignUdf(asDouble(col(vecCol))).as("cell"))
    val probes = queries.select(col(idCol).cast("long").as("query_id"),
        explode(probeUdf(asDouble(col(vecCol)))).as("cell"))
    probes.join(cells, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
      .distinct()
  }
}
