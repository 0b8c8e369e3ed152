package graft

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Product quantization (q160): integer codebooks, ADC lookup-table
  * scoring, and the IVF-PQ composition. The oracle gates the flat ADC
  * row end to end; these specs pin what the oracle can't see — encode
  * semantics, the probe-budget monotonicity theorem, and the
  * flat/probed agreement at full probe budget.
  */
class PqSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-pq-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Clustered synthetic corpus: `nClusters` unit-ish centers, each
    * vector = center + small noise — the regime where coarse cells and
    * PQ codes are meaningful (recall on white noise is uninformative).
    */
  private def clustered(n: Int, dim: Int, nClusters: Int, seed: Int): DataFrame = {
    val s = spark
    import s.implicits._
    val rnd = new Random(seed)
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian())
    (0 until n).map { i =>
      val c = centers(i % nClusters)
      val raw = (0 until dim).map(j => c(j) + 0.15 * rnd.nextGaussian())
      // unit-normalize: ADC ranks by inner product, the exact judge by
      // cosine — on the unit sphere they agree, so recall measures PQ
      // quantization loss, not the metric mismatch
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      (i.toLong, raw.map(x => (x / nrm).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("encode picks the integer-L2-nearest codebook entry, ties to the lowest index") {
    // hand-built codebooks: m=2 subspaces over dim 4
    val cb: Array[Array[Array[Long]]] = Array(
      Array(Array(0L, 0L), Array(1000L, 0L), Array(0L, 1000L)),
      Array(Array(500L, 500L), Array(500L, 500L), Array(-500L, 0L)))
    // qv = floor(v*1000); v = (0.9, 0.1, 0.5, 0.5)
    val qv = Similarity.qvInt(Seq(0.9, 0.1, 0.5, 0.5))
    assert(qv.toSeq == Seq(900L, 100L, 500L, 500L))
    val codes = Similarity.pqEncode(cb, qv)
    // subspace 0: d(0,0)=820k; d(1000,0)=20k; d(0,1000)=1.62M -> 1
    // subspace 1: entries 0 and 1 tie at distance 0 -> lowest index 0
    assert(codes.toSeq == Seq(1, 0))
  }

  test("flat PQ-ADC recall on clustered data beats noise and the export round-trips") {
    // clusters of TEN at noise 0.15 with k = 10: the exact top-10 is
    // (almost) exactly the query's cluster, so overlap measures
    // whether ADC preserves cluster identity — not whether it can
    // reproduce fine within-cluster order (it can't and needn't:
    // with 20-member clusters the same test caps at ~5.3 overlap no
    // matter how good the codes are)
    val emb = clustered(160, 64, 16, seed = 7)
    val queries = emb.filter(col("vec_id") % 40 === 0)
    val path = java.nio.file.Files.createTempDirectory("graft-pq").toString + "/cb"
    val rec = Similarity.pqTopKRecallExport(emb, "vec_id", "embedding", queries,
      m = 8, ksub = 16, trainIters = 2, k = 10, exportPath = path)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rec.length == 4)
    val mean = rec.map(_._2).sum.toDouble / rec.length
    assert(mean >= 7.0, s"mean overlap@10 $mean — ADC lost the clusters")
    // export holds one row per (subspace, centroid), integer arrays
    // (deferred by construction — flush materializes it, as Verify does)
    graft.OracleAux.flush()
    val cbDf = spark.read.parquet(path)
    assert(cbDf.count() == 8L * 16)
    assert(cbDf.select(max(size(col("cv")))).head().getInt(0) == 8)
  }

  test("IVF-PQ candidate sets are supersets in nprobe; overlap with exact top-k is monotone") {
    val emb = clustered(160, 64, 8, seed = 11)
    val queries = emb.filter(col("vec_id") % 40 === 0)
    def candSet(np: Int): Map[Long, Set[Long]] =
      Similarity.ivfPqCandidates(emb, "vec_id", "embedding", queries,
        numCentroids = 8, trainIters = 2, nprobe = np)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val c1 = candSet(1); val c2 = candSet(2); val c4 = candSet(4)
    queries.collect().map(_.getLong(0)).foreach { q =>
      val s1 = c1.getOrElse(q, Set.empty)
      val s2 = c2.getOrElse(q, Set.empty)
      val s4 = c4.getOrElse(q, Set.empty)
      assert(s1.subsetOf(s2) && s2.subsetOf(s4), s"query $q: probes not nested")
    }
    // overlap with the exact float top-10 can only grow with the set
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    exact.foreach { case (q, top) =>
      val o1 = (c1.getOrElse(q, Set.empty) & top).size
      val o2 = (c2.getOrElse(q, Set.empty) & top).size
      val o4 = (c4.getOrElse(q, Set.empty) & top).size
      assert(o1 <= o2 && o2 <= o4, s"query $q: overlap not monotone ($o1, $o2, $o4)")
    }
  }

  test("at full probe budget, IVF-PQ equals the flat ADC ranking") {
    val emb = clustered(120, 64, 6, seed = 23)
    val queries = emb.filter(col("vec_id") % 30 === 0)
    val cb = Similarity.pqTrainCodebooksInt(emb, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 2)
    val flat = Similarity.pqAdcTopK(emb, "vec_id", "embedding", queries, cb, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Similarity.ivfPqCandidates(emb, "vec_id", "embedding", queries,
      numCentroids = 6, trainIters = 2, nprobe = 6) // every cell probed
    val probed = Similarity.pqAdcTopK(emb, "vec_id", "embedding", queries, cb,
      k = 10, candidates = Some(cand))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probed == flat, "full probe budget must reduce to the flat scan")
  }

  test("broadcast-map and packed-column LUT paths score identically") {
    // pqAdcTopK routes bounded query sets through a driver-broadcast
    // LUT map (zero per-pair transfer) and large ones through the
    // binary LUT column; the integer scores must be identical — pin
    // the boundary by forcing cap=0 (column path) on the same input.
    val emb = clustered(160, 64, 16, seed = 23)
    val queries = emb.filter(col("vec_id") % 40 === 0)
    val cb = Similarity.pqTrainCodebooksInt(emb, "vec_id", "embedding", 8, 16, 2)
    def rows(cap: Int) = Similarity.pqAdcTopK(
        emb, "vec_id", "embedding", queries, cb, 10, broadcastLutCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(4096) === rows(0))
  }

  test("IVFADC residual encoding lifts recall at equal bytes (full probe isolates the codes)") {
    // At nprobe = numCells the candidate set equals the flat scan's,
    // so the ONLY difference from direct PQ is residual-vs-raw
    // encoding at the same m·log2(ksub) bits — the Jégou et al. 2011
    // claim: residuals concentrate near 0, the codes quantize tighter.
    val emb = clustered(160, 64, 16, seed = 7)
    val queries = emb.filter(col("vec_id") % 20 === 0)
    val base = java.nio.file.Files.createTempDirectory("graft-ivfadc").toString
    def mean(df: org.apache.spark.sql.DataFrame): Double = {
      val r = df.collect().map(_.getLong(1))
      r.sum.toDouble / r.length
    }
    val direct = mean(Similarity.pqTopKRecallExport(emb, "vec_id", "embedding",
      queries, m = 8, ksub = 16, trainIters = 2, k = 10, exportPath = s"$base/d"))
    val residual = mean(Similarity.ivfadcTopKRecallExport(emb, "vec_id", "embedding",
      queries, numCells = 16, coarseIters = 3, m = 8, ksub = 16, pqIters = 2,
      nprobe = 16, k = 10,
      coarseExportPath = s"$base/c", cbExportPath = s"$base/r"))
    assert(residual >= direct,
      s"residual encoding must not lose to direct at equal bytes " +
        s"(residual $residual < direct $direct)")
    assert(residual >= 7.0, s"mean overlap@10 $residual — IVFADC lost the clusters")
  }

  test("variance-balanced permutation lifts recall on an anisotropic corpus") {
    // variance concentrated in the FIRST 8 dims: contiguous grouping
    // hands all of it to sub-quantizer 0 (8 bits for all the signal,
    // 8 bits apiece for noise), while the balanced allocation spreads
    // one high-variance dim per subspace
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41)
    val centers = Array.fill(16, 64)(0.0)
    for (c <- 0 until 16; j <- 0 until 64)
      centers(c)(j) = rnd.nextGaussian() * (if (j < 8) 5.0 else 0.3)
    val emb = (0 until 160).map { i =>
      val c = centers(i % 16)
      val raw = (0 until 64).map(j => c(j) + 0.15 * rnd.nextGaussian())
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      (i.toLong, raw.map(x => (x / nrm).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") % 20 === 0)
    val base = java.nio.file.Files.createTempDirectory("graft-pqperm").toString
    def mean(df: org.apache.spark.sql.DataFrame): Double = {
      val r = df.collect().map(_.getLong(1)); r.sum.toDouble / r.length
    }
    // ksub = 4 STARVES the sub-quantizers (4 centroids for 16 cluster
    // patterns): under contiguous grouping subspace 0 holds ALL the
    // signal and can only separate ~4 of 16 clusters, while the
    // balanced allocation gives every subspace one signal dim
    val contiguous = mean(Similarity.pqTopKRecallExport(emb, "vec_id", "embedding",
      queries, m = 8, ksub = 4, trainIters = 2, k = 10, exportPath = s"$base/d"))
    val permuted = mean(Similarity.pqPermutedTopKRecallExport(emb, "vec_id", "embedding",
      queries, m = 8, ksub = 4, trainIters = 2, k = 10,
      permExportPath = s"$base/p", cbExportPath = s"$base/c"))
    assert(permuted >= contiguous,
      s"balanced allocation must not lose on anisotropic data " +
        s"(permuted $permuted < contiguous $contiguous)")
    // and the permutation actually moved something: one high-variance
    // dim per subspace, not the identity
    val perm = Similarity.pqTrainPermutation(emb, "vec_id", "embedding", 8)
    val highPerSub = (0 until 8).map(ms =>
      (ms * 8 until (ms + 1) * 8).count(k => perm(k) < 8))
    assert(highPerSub.forall(_ == 1),
      s"expected one high-variance dim per subspace, got $highPerSub")
  }

  test("ivfadc exact re-rank dominates raw ivfadc per query at the same probe budget") {
    // structural within the probed candidate set: ADC-top-10 ⊆
    // ADC-top-50, and the float re-rank keeps every true neighbor
    // that reached the shortlist
    val emb = clustered(160, 64, 16, seed = 13)
    val queries = emb.filter(col("vec_id") % 20 === 0)
    val base = java.nio.file.Files.createTempDirectory("graft-ivfadcrr").toString
    def byQuery(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val raw = byQuery(Similarity.ivfadcTopKRecallExport(emb, "vec_id", "embedding",
      queries, numCells = 8, coarseIters = 3, m = 8, ksub = 16, pqIters = 2,
      nprobe = 2, k = 10,
      coarseExportPath = s"$base/c0", cbExportPath = s"$base/r0"))
    val rr = byQuery(Similarity.ivfadcRerankTopKRecallExport(emb, "vec_id", "embedding",
      queries, numCells = 8, coarseIters = 3, m = 8, ksub = 16, pqIters = 2,
      nprobe = 2, shortlist = 50, k = 10,
      coarseExportPath = s"$base/c1", cbExportPath = s"$base/r1"))
    raw.foreach { case (q, n) =>
      assert(rr(q) >= n, s"query $q: re-rank $n -> ${rr(q)} regressed")
    }
  }

  test("ivfadc broadcast-map and packed-column LUT paths score identically") {
    val emb = clustered(160, 64, 16, seed = 29)
    val queries = emb.filter(col("vec_id") % 40 === 0)
    val ccb = Similarity.pqTrainCodebooksInt(emb, "vec_id", "embedding", 1, 16, 3)
    val rcb = Similarity.pqTrainResidualCodebooksInt(
      emb, "vec_id", "embedding", ccb, 8, 16, 2)
    def rows(cap: Int) = Similarity.ivfadcTopK(
        emb, "vec_id", "embedding", queries, ccb, rcb,
        nprobe = 4, k = 10, broadcastLutCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(4096) === rows(0), "map and column ivfadc paths diverged")
  }

  test("sampled judge equals the full judgment restricted to the sample") {
    // per-query judgment is independent, so the 256-cap sample form
    // (q169) must agree row-for-row with the all-queries form on the
    // sampled ids — the pin that makes the bounded 62x verifier leg
    // trustworthy
    val emb = clustered(160, 64, 16, seed = 11)
    val base = java.nio.file.Files.createTempDirectory("graft-pqsmp").toString
    val sample = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(5)
    val sampleIds = sample.collect().map(_.getLong(0)).toSet
    val sampled = Similarity.pqTopKRecallExport(emb, "vec_id", "embedding",
      sample, m = 8, ksub = 16, trainIters = 2, k = 10, exportPath = s"$base/a")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = Similarity.pqTopKRecallExport(emb, "vec_id", "embedding",
      emb, m = 8, ksub = 16, trainIters = 2, k = 10, exportPath = s"$base/b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      .view.filterKeys(sampleIds).toMap
    assert(sampled === full)
  }

  test("exact re-rank dominates raw ADC per query and is monotone in shortlist depth") {
    val emb = clustered(160, 64, 16, seed = 31)
    val queries = emb.filter(col("vec_id") % 40 === 0)
    val base = java.nio.file.Files.createTempDirectory("graft-pqrr").toString
    def recallAt(shortlist: Int): Map[Long, Long] =
      Similarity.pqRerankTopKRecallExport(emb, "vec_id", "embedding", queries,
        m = 8, ksub = 16, trainIters = 2, shortlist = shortlist, k = 10,
        exportPath = s"$base/cb$shortlist")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val raw = Similarity.pqTopKRecallExport(emb, "vec_id", "embedding", queries,
      m = 8, ksub = 16, trainIters = 2, k = 10, exportPath = s"$base/cbraw")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val r10 = recallAt(10); val r20 = recallAt(20); val r50 = recallAt(50)
    raw.keys.foreach { q =>
      // shortlist = k re-orders the SAME candidate set, so overlap is
      // identical to raw ADC — the degenerate end of the dominance
      assert(r10(q) == raw(q), s"query $q: depth-10 re-rank must equal raw ADC")
      // deeper shortlists keep every true-top-k member they catch
      assert(raw(q) <= r20(q) && r20(q) <= r50(q),
        s"query $q: recall not monotone (${raw(q)}, ${r20(q)}, ${r50(q)})")
    }
    // on clusters of ten, a 50-deep shortlist recovers the cluster
    val mean50 = r50.values.sum.toDouble / r50.size
    assert(mean50 >= 8.0, s"mean overlap@10 after re-rank $mean50")
  }
}
