package graft

import graft.bulk.ManifestStore
import graft.streaming.Streams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streams.VectorIndexGate — the maintained quantized-IVF serving
  * index: decision immutability, restart parity at a fold boundary
  * (persist→release→resume, the crash discipline), the
  * batch-visibility contract (a neighbor never arrives from the
  * future), nprobe cell locality, and the ad-hoc search surface.
  * Numeric parity with the full replay chain is the q127 oracle's job.
  */
class VectorIndexGateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-vectorindexgate-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()

  override def afterAll(): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    super.afterAll()
  }

  private def tmpStore(): ManifestStore =
    new ManifestStore(spark,
      java.nio.file.Files.createTempDirectory("graft-gate-store").toString)

  // two clean clusters along axes 0 and 1; ids 0/1 seed the centroids
  private def vecs(rows: (Long, Seq[Double])*) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }
  private val initial = vecs(
    0L -> Seq(1.0, 0.1, 0.0, 0.0), 1L -> Seq(0.1, 1.0, 0.0, 0.0),
    2L -> Seq(0.9, 0.2, 0.0, 0.0), 3L -> Seq(0.2, 0.9, 0.0, 0.0))
  private val b1 = vecs(10L -> Seq(0.95, 0.15, 0.0, 0.0), 11L -> Seq(0.15, 0.95, 0.0, 0.0))
  private val b2 = vecs(20L -> Seq(0.92, 0.18, 0.0, 0.0))
  private val b3 = vecs(30L -> Seq(0.18, 0.92, 0.0, 0.0))
  private val batchOf = Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
    10L -> 1L, 11L -> 1L, 20L -> 2L, 30L -> 3L)

  private def newGate() = Streams.newVectorIndexGate(
    initial, "vec_id", "embedding",
    numCentroids = 2, nprobe = 1, shortlist = 4, k = 2, compactEvery = 2)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("restart at a fold boundary ≡ uninterrupted; decisions immutable; no future neighbors") {
    val live = newGate()
    Seq(b1, b2).foreach(b => live.foldRaw(b, "vec_id", "embedding"))
    val afterTwo = rows(live.decisions)
    val store = tmpStore()
    live.persist(store)
    live.foldRaw(b3, "vec_id", "embedding")
    val uninterrupted = rows(live.decisions)
    // immutability: fold 3 only appended
    assert(afterTwo.subsetOf(uninterrupted))
    assert(uninterrupted.filter(_._2 == 3L).nonEmpty)
    live.release()

    val resumed = Streams.resumeVectorIndexGate(store,
      nprobe = 1, shortlist = 4, k = 2, compactEvery = 2)
    assert(rows(resumed.decisions) === afterTwo)
    resumed.foldRaw(b3, "vec_id", "embedding")
    assert(rows(resumed.decisions) === uninterrupted)

    // visibility: a neighbor's batch never exceeds the query's
    for ((q, b, _, n) <- uninterrupted) {
      assert(batchOf(q) === b)
      assert(batchOf(n) <= b, s"query $q (batch $b) saw future neighbor $n")
    }
    // nprobe=1 cell locality on these clean clusters: axis-0 queries
    // only ever meet axis-0 neighbors (and symmetrically)
    val axis0 = Set(0L, 2L, 10L, 20L)
    for ((q, _, _, n) <- uninterrupted)
      assert(axis0(q) === axis0(n), s"cross-cell pair $q -> $n under nprobe=1")
    // the nearest same-cluster vector ranks first: 20's exact-cosine
    // order among visible axis-0 candidates {0, 2, 10}
    // candidates {0, 2, 10}: angular distance to 20 is 1.5° (id 2),
    // 2.1° (id 10), 5.4° (id 0)
    val top20 = resumed.decisions.filter(col("query_id") === 20L)
      .orderBy("rank").collect().map(_.getLong(3)).toSeq
    assert(top20 === Seq(2L, 10L))
    resumed.release()
  }

  test("reseed rebuilds from own postings: content identical, decisions carried, folds continue") {
    val gate = newGate()
    Seq(b1, b2).foreach(b => gate.foldRaw(b, "vec_id", "embedding"))
    val decBefore = rows(gate.decisions)
    val postBefore = gate.postingsNow.select("vec_id", "qv", "fv").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq, r.getAs[Array[Byte]](2).toSeq)).toSet
    val reseeded = gate.reseed(numCentroids = 4)
    // packed floats and int8 codes survive the unpack->requantize
    // round-trip bit-identically; only cell assignments may change
    val postAfter = reseeded.postingsNow.select("vec_id", "qv", "fv").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq, r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(postAfter === postBefore)
    assert(rows(reseeded.decisions) === decBefore)
    reseeded.foldRaw(b3, "vec_id", "embedding")
    val b3rows = rows(reseeded.decisions).filter(_._2 == 3L)
    assert(b3rows.nonEmpty && b3rows.forall(_._1 == 30L))
    reseeded.release()
  }

  test("occupancy auto-reseed: fires at compaction, doubles until bounded, pre-reseed decisions immutable") {
    // target occupancy 1 with a 7-vector corpus at the fold-2
    // compaction: 2 -> 4 -> 8 centroids (two doublings in one check)
    val auto = Streams.newVectorIndexGate(
      initial, "vec_id", "embedding",
      numCentroids = 2, nprobe = 1, shortlist = 4, k = 2, compactEvery = 2,
      targetCellOccupancy = 1L)
    val plain = newGate()
    Seq(b1, b2).foreach { b =>
      auto.foldRaw(b, "vec_id", "embedding")
      plain.foldRaw(b, "vec_id", "embedding")
    }
    // doubling 2 -> 4 -> 8, then naturally capped at the 7-row corpus
    assert(auto.centroidCount === 7,
      "two doublings fire in one check; closure caps at corpus size")
    assert(plain.centroidCount === 2)
    // decisions made BEFORE the reseed are identical to the
    // fixed-closure gate's — the reseed changes future probes only
    assert(rows(auto.decisions) === rows(plain.decisions))
    // postings content survives the requantize bit-identically
    val pAuto = auto.postingsNow.select("vec_id", "qv", "fv").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq, r.getAs[Array[Byte]](2).toSeq)).toSet
    val pPlain = plain.postingsNow.select("vec_id", "qv", "fv").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq, r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(pAuto === pPlain)
    // the widened closure persists: resume carries it and keeps folding
    val store = tmpStore()
    auto.persist(store)
    auto.release()
    val resumed = Streams.resumeVectorIndexGate(store,
      nprobe = 1, shortlist = 4, k = 2, compactEvery = 2,
      targetCellOccupancy = 1L)
    assert(resumed.centroidCount === 7)
    resumed.foldRaw(b3, "vec_id", "embedding")
    assert(rows(resumed.decisions).exists(_._1 == 30L))
    resumed.release()
    plain.release()
  }

  test("search serves the current index without mutating state; resume validates params") {
    val gate = newGate()
    gate.foldRaw(b1, "vec_id", "embedding")
    val before = rows(gate.decisions)
    // two ad-hoc queries near cluster B, one reusing an INDEXED id:
    // results come from the index only (the two queries never match
    // each other despite probing the same cell); 11 skips its own
    // stored copy but still gets its neighbors, and 11's STANDING
    // copy still serves the OTHER query — the self-skip is per-query,
    // never batch-wide
    val res = gate.search(
        vecs(99L -> Seq(0.2, 0.88, 0.0, 0.0), 11L -> Seq(0.15, 0.95, 0.0, 0.0)),
        "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(res.map(_._1).toSet === Set(99L, 11L) && res.length === 4)
    assert(res.map(_._3).forall(Set(1L, 3L, 11L)))
    assert(res.filter(_._1 == 11L).map(_._3).toSet === Set(1L, 3L))
    // 99's exact-cosine top-2 among {1, 3, 11} is {3, 11}: the
    // indexed copy of 11 must rank for 99 even though 11 is also a
    // query id in the same search frame
    assert(res.filter(_._1 == 99L).map(_._3).toSet === Set(3L, 11L))
    assert(!res.exists(p => p._1 == 99L && p._3 == 99L))
    assert(rows(gate.decisions) === before)

    val store = tmpStore()
    gate.persist(store)
    gate.release()
    val e = intercept[IllegalArgumentException] {
      Streams.resumeVectorIndexGate(store, nprobe = 2, shortlist = 4, k = 2)
    }
    assert(e.getMessage.contains("nprobe"))
  }

  test("re-ingest supersedes: compaction keeps one newest copy; stale cell stops serving") {
    val gate = Streams.newVectorIndexGate(
      initial, "vec_id", "embedding",
      numCentroids = 2, nprobe = 1, shortlist = 8, k = 4, compactEvery = 2)
    gate.foldRaw(b1, "vec_id", "embedding") // 10 lives on axis 0
    // fold 2 re-ingests 10 MOVED to axis 1 and triggers compaction
    gate.foldRaw(vecs(10L -> Seq(0.1, 0.99, 0.0, 0.0)), "vec_id", "embedding")
    assert(gate.postingsNow.filter(col("vec_id") === 10L).count() === 1L)
    // the surviving copy is the NEW vector: an axis-1 search finds 10,
    // an axis-0 search no longer sees the superseded copy
    val near1 = gate.search(vecs(99L -> Seq(0.15, 0.9, 0.0, 0.0)), "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(near1.exists(_._2 == 10L), s"re-ingested 10 missing from axis-1 serve: ${near1.toSeq}")
    val near0 = gate.search(vecs(98L -> Seq(0.95, 0.1, 0.0, 0.0)), "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(!near0.exists(_._2 == 10L), s"stale axis-0 copy of 10 still serving: ${near0.toSeq}")
    // persist→resume round-trips the deduped postings
    val store = tmpStore()
    gate.persist(store)
    gate.release()
    val resumed = Streams.resumeVectorIndexGate(store,
      nprobe = 1, shortlist = 8, k = 4, compactEvery = 2)
    assert(resumed.postingsNow.filter(col("vec_id") === 10L).count() === 1L)
    resumed.release()
  }

  test("multi-version window pre-compaction: a neighbor never occupies two ranks") {
    val gate = Streams.newVectorIndexGate(
      initial, "vec_id", "embedding",
      numCentroids = 2, nprobe = 1, shortlist = 8, k = 4, compactEvery = 8)
    gate.foldRaw(b1, "vec_id", "embedding") // 10 = (0.95, 0.15), axis 0
    // re-ingest 10 still on axis 0 — both versions share the probed
    // cell until the (distant) compaction
    gate.foldRaw(vecs(10L -> Seq(0.9, 0.05, 0.0, 0.0)), "vec_id", "embedding")
    assert(gate.postingsNow.filter(col("vec_id") === 10L).count() === 2L)
    val res = gate.search(vecs(97L -> Seq(0.93, 0.1, 0.0, 0.0)), "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // candidates {0, 2, 10v1, 10v2} with k=4: 10 appears exactly once
    assert(res.count(_._3 == 10L) === 1, s"double-ranked neighbor: ${res.toSeq}")
    assert(res.map(_._3).toSet === Set(0L, 2L, 10L))
    assert(res.map(_._2).sorted === Seq(1L, 2L, 3L), s"ranks not dense: ${res.toSeq}")
    gate.release()
  }

  test("pq sidecar at full shortlist ≡ the int8 kernel (re-rank sees the same set)") {
    // shortlist ≥ every candidate pool ⇒ the shortlist SCORER (ADC vs
    // int8 dot) cannot change which rows reach the exact re-rank, so
    // decisions must match row-for-row — the regime-identity argument
    // for swapping scorers under a wide-enough shortlist.
    def run(pqM: Int): Set[(Long, Long, Long, Long)] = {
      val g = Streams.newVectorIndexGate(
        initial, "vec_id", "embedding",
        numCentroids = 2, nprobe = 2, shortlist = 16, k = 3,
        compactEvery = 2, pqM = pqM, pqKsub = 4, pqIters = 2)
      g.foldRaw(b1, "vec_id", "embedding")
      g.foldRaw(b2, "vec_id", "embedding")
      g.foldRaw(b3, "vec_id", "embedding")
      val out = rows(g.decisions)
      g.release()
      out
    }
    assert(run(pqM = 2) === run(pqM = 0))
  }

  test("pq gate ingest() accepts codes-less projected postings (the gateStream path)") {
    // Regression (round-13 advice): the generic IngestGate path hands
    // caller-projected postings to fold() verbatim; a PQ gate's
    // standing segments carry a `codes` column only foldRaw added, so
    // the first ingest() micro-batch failed at the unionByName. fold()
    // now derives the codes itself — ingest() ≡ foldRaw fold-for-fold.
    def pqGate() = Streams.newVectorIndexGate(
      initial, "vec_id", "embedding",
      numCentroids = 2, nprobe = 1, shortlist = 4, k = 2,
      compactEvery = 2, pqM = 2, pqKsub = 4, pqIters = 2)
    val viaRaw = pqGate()
    Seq(b1, b2, b3).foreach(b => viaRaw.foldRaw(b, "vec_id", "embedding"))
    val expect = rows(viaRaw.decisions)
    viaRaw.release()
    // identical deterministic training reproduces the factory closure,
    // so the external projection matches the gate's coordinate system
    val cc = graft.ops.Similarity.CentroidClosure.fromInitial(
      initial, "vec_id", "embedding", 2)
    val viaIngest = pqGate()
    Seq(b1, b2, b3).foreach { b =>
      viaIngest.ingest(graft.ops.Similarity.quantizedPostings(
        b, "vec_id", "embedding", cc))
    }
    assert(rows(viaIngest.decisions) === expect)
    viaIngest.release()
  }

  test("pq gate restart at a fold boundary ≡ uninterrupted; codebooks ride the manifest") {
    def pqGate() = Streams.newVectorIndexGate(
      initial, "vec_id", "embedding",
      numCentroids = 2, nprobe = 1, shortlist = 4, k = 2,
      compactEvery = 2, pqM = 2, pqKsub = 4, pqIters = 2)
    val uninterrupted = pqGate()
    Seq(b1, b2, b3).foreach(b => uninterrupted.foldRaw(b, "vec_id", "embedding"))
    val expect = rows(uninterrupted.decisions)
    uninterrupted.release()

    val g1 = pqGate()
    Seq(b1, b2).foreach(b => g1.foldRaw(b, "vec_id", "embedding"))
    val store = tmpStore()
    g1.persist(store)
    g1.release()
    val resumed = Streams.resumeVectorIndexGate(store,
      nprobe = 1, shortlist = 4, k = 2, compactEvery = 2)
    assert(resumed.pqFrame.isDefined, "resumed gate lost the pq codebooks")
    resumed.foldRaw(b3, "vec_id", "embedding")
    assert(rows(resumed.decisions) === expect)
    // the search path also runs the ADC kernel on the resumed state
    val res = resumed.search(vecs(98L -> Seq(0.94, 0.12, 0.0, 0.0)),
      "vec_id", "embedding")
    assert(res.count() > 0)
    resumed.release()
  }

  test("residual (IVFADC) gate restart ≡ uninterrupted; pqcents rides the manifest") {
    def rGate() = Streams.newVectorIndexGate(
      initial, "vec_id", "embedding",
      numCentroids = 2, nprobe = 1, shortlist = 4, k = 2,
      compactEvery = 2, pqM = 2, pqKsub = 4, pqIters = 2, pqResidual = true)
    val uninterrupted = rGate()
    Seq(b1, b2, b3).foreach(b => uninterrupted.foldRaw(b, "vec_id", "embedding"))
    val expect = rows(uninterrupted.decisions)
    uninterrupted.release()

    val g1 = rGate()
    Seq(b1, b2).foreach(b => g1.foldRaw(b, "vec_id", "embedding"))
    val store = tmpStore()
    g1.persist(store)
    g1.release()
    assert(store.read("pqcents").isDefined, "residual gate must stage pqcents")
    val resumed = Streams.resumeVectorIndexGate(store,
      nprobe = 1, shortlist = 4, k = 2, compactEvery = 2)
    resumed.foldRaw(b3, "vec_id", "embedding")
    assert(rows(resumed.decisions) === expect)
    val res = resumed.search(vecs(98L -> Seq(0.94, 0.12, 0.0, 0.0)),
      "vec_id", "embedding")
    assert(res.count() > 0)
    resumed.release()
  }

  test("residual gate reseed rebuilds the centroid table; decisions carry over") {
    val g = Streams.newVectorIndexGate(
      initial, "vec_id", "embedding",
      numCentroids = 2, nprobe = 1, shortlist = 4, k = 2,
      compactEvery = 8, pqM = 2, pqKsub = 4, pqIters = 2, pqResidual = true)
    Seq(b1, b2).foreach(b => g.foldRaw(b, "vec_id", "embedding"))
    val before = rows(g.decisions)
    val wide = g.reseed(4)
    assert(wide.centroidCount == 4)
    assert(rows(wide.decisions) === before, "reseed must carry decisions verbatim")
    wide.foldRaw(b3, "vec_id", "embedding")
    assert(rows(wide.decisions).size > before.size)
    wide.release()
  }

  test("relative drift trigger: no thrash on undrifted growth, fires on a genuine shift") {
    val s = spark
    import s.implicits._
    // clustered corpus at a scale the codes resolve (the PqSpec
    // clustered() regime: unit-ish centers + small noise, dim 64);
    // per-row rng seeded by id so batches are deterministic and
    // independent of generation order. The SHIFT phase draws from a
    // DIFFERENT center set — a genuine distribution change the
    // trailing mean has not yet absorbed.
    def batchOf(ids: Range, drift: Boolean): org.apache.spark.sql.DataFrame = {
      val dim = 64; val nClusters = 8
      val crnd = new scala.util.Random(7)
      val centers = Array.fill(nClusters, dim)(crnd.nextGaussian())
      ids.map { i =>
        val rnd = new scala.util.Random(i * 2654435761L)
        val c = centers(i % nClusters)
        val raw = (0 until dim).map { j =>
          val x = c(j) + 0.15 * rnd.nextGaussian()
          // the q165 drift shape: per-dimension scaling skews the
          // distribution away from what the codebooks trained on
          if (drift) x * (1 + j) else x
        }
        val nrm = math.sqrt(raw.map(x => x * x).sum)
        (i.toLong, raw.map(_ / nrm))
      }.toDF("vec_id", "embedding")
    }
    val g = Streams.newVectorIndexGate(
      batchOf(0 until 64, drift = false), "vec_id", "embedding",
      numCentroids = 4, nprobe = 4, shortlist = 16, k = 5,
      compactEvery = 1, pqM = 8, pqKsub = 16, pqIters = 2,
      pqRefreshDropFracX100 = 80L)
    // growing, SAME distribution over 8 compactions: density decay
    // is smooth per step (a few percent), the single-step relative
    // trigger must not thrash even as the cumulative decay exceeds
    // the 20% margin
    (1 to 8).foreach(b => g.foldRaw(
      batchOf(1000 * b until 1000 * b + 8, drift = false),
      "vec_id", "embedding"))
    assert(g.pqRefreshCount == 0,
      s"thrash on undrifted growth: ${g.pqRefreshCount} refreshes " +
        s"(history ${g.pqRecallHistory})")
    // distribution SHIFT: two folds of per-dimension-scaled vectors
    // (the q165 drift shape) — old codebooks quantize the skewed
    // subvectors badly, the sampled recall drops abruptly against
    // the previous compaction's measurement
    (9 to 10).foreach(b => g.foldRaw(
      batchOf(1000 * b until 1000 * b + 48, drift = true),
      "vec_id", "embedding"))
    assert(g.pqRefreshCount >= 1,
      s"shift not caught (history ${g.pqRecallHistory})")
    g.release()
  }

  test("residual drift gate: an impossible floor triggers exactly one refresh per compaction") {
    val g = Streams.newVectorIndexGate(
      initial, "vec_id", "embedding",
      numCentroids = 2, nprobe = 1, shortlist = 4, k = 2,
      compactEvery = 2, pqM = 2, pqKsub = 4, pqIters = 2, pqResidual = true,
      pqRefreshMinRecallX100 = 101L) // > 100: every compaction judge fails the floor
    Seq(b1, b2).foreach(b => g.foldRaw(b, "vec_id", "embedding"))
    assert(g.pqRefreshCount == 1, s"expected one refresh, got ${g.pqRefreshCount}")
    // the refreshed RESIDUAL codebooks still serve — fold and search run
    g.foldRaw(b3, "vec_id", "embedding")
    val res = g.search(vecs(99L -> Seq(0.2, 0.9, 0.0, 0.0)), "vec_id", "embedding")
    assert(res.count() > 0)
    g.release()
  }

  test("re-rank serving recall >= ADC-only serving recall at equal probes (q190 contract)") {
    // the sf0.01 embeddings replayed through two IVFADC gates that
    // differ ONLY in rerankFloat; truth = exact double cosine top-10
    // within each query's fold-visible corpus (batch <= own batch,
    // standing %4=0 always visible)
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    def replay(rerank: Boolean) = {
      val g = Streams.newVectorIndexGate(
        emb.filter(col("vec_id") % 4 === 0), "vec_id", "embedding",
        numCentroids = 16, nprobe = 2, shortlist = 40, k = 10,
        compactEvery = 2, pqM = 8, pqKsub = 256, pqIters = 2,
        pqResidual = true, rerankFloat = rerank)
      (1 to 3).foreach(i => g.foldRaw(
        emb.filter(col("vec_id") % 4 === i), "vec_id", "embedding"))
      val dec = g.decisions.collect()
        .map(r => (r.getLong(0), r.getLong(3))) // (query_id, neighbor_id)
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      g.release()
      dec
    }
    val all = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Number](1).map(_.doubleValue()).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    def truth(q: Long): Set[Long] = {
      val qb = q % 4
      all.keys.filter(n => n != q && (n % 4 == 0 || n % 4 <= qb))
        .toSeq.map(n => (cos(all(q), all(n)), n))
        .sortBy { case (s, n) => (-s, n) }.take(10).map(_._2).toSet
    }
    def recall(dec: Map[Long, Set[Long]]): Double = {
      val qs = all.keys.filter(_ % 4 != 0).toSeq
      qs.map(q => dec.getOrElse(q, Set.empty).intersect(truth(q)).size.toDouble / 10.0)
        .sum / qs.size
    }
    val rr = recall(replay(rerank = true))
    val adc = recall(replay(rerank = false))
    info(f"gate recall@10: rerank $rr%.4f vs adc-only $adc%.4f")
    assert(rr >= adc, f"float re-rank recall $rr%.4f fell under ADC-only $adc%.4f")
    // plausibility floor only: 2/16 probed cells bounds recall well
    // under 1 (reads ~0.29 vs ~0.25 on the current corpus)
    assert(rr > 0.15 && adc > 0.05, "degenerate replay — recalls implausibly low")
  }
}
