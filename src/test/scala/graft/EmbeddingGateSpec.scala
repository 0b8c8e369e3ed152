package graft

import graft.ops.Similarity
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Online embedding ingest dedup gate (Streams.EmbeddingDedupGate):
  * vector batches rejected vs the standing signature index and within
  * the batch; the loop-carried index is self-contained (packed
  * vectors + buckets) and rebuilds at a higher plane count when the
  * corpus outgrows its bucket geometry — bit-identically to signing
  * the raw floats.
  */
class EmbeddingGateSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-embedding-gate-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()

  private val dim = 64

  /** Deterministic unit-ish vector for id; ids in the same family
    * (id / 100) are near-identical (cosine ~1), different families are
    * decorrelated.
    */
  private def vec(family: Long, jitter: Int): Seq[Float] = {
    val rnd = new scala.util.Random(family)
    val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
    if (jitter != 0) base(jitter % dim) += 0.01f
    base.toSeq
  }

  private def frame(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("batches reject near-dups vs corpus and within batch; clean vectors fold forward") {
    val gate = Streams.newEmbeddingDedupGate(
      frame(Seq(1L -> vec(1, 0), 2L -> vec(2, 0))), "vec_id", "embedding",
      dim = dim, threshold = 0.95)
    // batch 1: 10 ~= corpus vec 1 (reject), 11/12 ~= each other
    // (higher id 12 rejected within batch), 13 novel
    gate.ingest(frame(Seq(
      10L -> vec(1, 1), 11L -> vec(3, 0), 12L -> vec(3, 1), 13L -> vec(4, 0))))
    val r1 = gate.rejected.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r1.keySet === Set(10L, 12L))
    assert(r1(10L) === "near-dup of corpus")
    assert(r1(12L) === "near-dup within batch")
    // batch 2: 20 ~= 11 (admitted in batch 1 — proves the index grew)
    gate.ingest(frame(Seq(20L -> vec(3, 2), 21L -> vec(5, 0))))
    assert(gate.rejected.collect().map(_.getLong(0)).toSet === Set(10L, 12L, 20L))
    assert(gate.corpusCount === 5L) // 2 initial + batch1's 11,13 + batch2's 21
    assert(gate.indexNow.select("id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L, 11L, 13L, 21L))
    // Cluster state (round 8): rejected vectors are members of the
    // clusters they duplicated — {1,10}, {11,12,20}, singletons.
    val clusters = gate.clustersNow.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters === Map(
      1L -> 1L, 2L -> 2L, 10L -> 1L, 11L -> 11L, 12L -> 11L, 13L -> 13L,
      20L -> 11L, 21L -> 21L))
  }

  test("cluster labels survive the auto-B resign rebuild (labels compact with it)") {
    // targetBucket tiny so the resign fires mid-stream; clusters must
    // stay exact across both the index rewrite and label compaction.
    val gate = Streams.newEmbeddingDedupGate(
      frame(Seq(1L -> vec(1, 0), 2L -> vec(2, 0))), "vec_id", "embedding",
      dim = dim, threshold = 0.95, targetBucket = 2L, compactEvery = 2)
    gate.ingest(frame(Seq(30L -> vec(1, 3), 31L -> vec(6, 0))))
    gate.ingest(frame(Seq(32L -> vec(6, 1), 33L -> vec(7, 0))))
    gate.ingest(frame(Seq(34L -> vec(6, 2), 35L -> vec(1, 4))))
    val clusters = gate.clustersNow.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters === Map(
      1L -> 1L, 2L -> 2L, 30L -> 1L, 31L -> 31L, 32L -> 31L, 33L -> 33L,
      34L -> 31L, 35L -> 1L))
    // Independent rebuild cross-check over the pairs the gate could
    // have discovered.
    val s = spark
    import s.implicits._
    val rebuilt = graft.ops.Components.dedupClusters(
        Seq(1L, 2L, 30L, 31L, 32L, 33L, 34L, 35L).toDF("id"),
        Seq((30L, 1L), (32L, 31L), (34L, 31L), (35L, 1L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters === rebuilt)
  }

  test("auto-B rebuild: crossing the bucket threshold re-signs the index bit-identically") {
    // targetBucket=4 so B grows quickly: initial 8 vectors → B=4 (floor);
    // admitting past 64 vectors forces ceil(log2(n/4)) > 4 → rebuild
    val initial = frame((1L to 8L).map(i => i -> vec(i, 0)))
    val gate = Streams.newEmbeddingDedupGate(
      initial, "vec_id", "embedding", dim = dim, threshold = 0.95, targetBucket = 4L)
    assert(gate.numPlanes === Similarity.autoPlanes(8, 4))
    val b0 = gate.numPlanes
    // feed 9 batches of 8 novel vectors each → corpus 80 → B must rise
    (0 until 9).foreach { k =>
      gate.ingest(frame((1L to 8L).map { j =>
        val id = 100L + k * 8 + j
        id -> vec(1000 + id, 0)
      }))
    }
    assert(gate.corpusCount === 80L)
    assert(gate.numPlanes > b0)
    assert(gate.numPlanes === Similarity.autoPlanes(80, 4))
    // the rebuilt index's buckets equal a fresh signing of the same
    // vectors at the new B (resignIndex is bit-identical by design)
    val fresh = Similarity.resignIndex(
      gate.indexNow.select("id", "pv", "nrm", "bucket"), dim, gate.numPlanes)
    val got = gate.indexNow.select("id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = fresh.select("id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    // plan width stays bounded after the rebuild collapsed the segments
    assert(gate.indexNow.queryExecution.analyzed.collectLeaves().size <= 9)
  }

  test("indexed delta pairs equal the from-scratch delta computation") {
    val standing = frame((1L to 20L).map(i => i -> vec(i, 0)))
    val delta = frame(Seq(100L -> vec(7, 1), 101L -> vec(500, 0)))
    val b = Similarity.autoPlanes(22, Similarity.LshTargetBucket)
    val viaIndex = Similarity.cosinePairsLshIndexed(
        Similarity.cosineLshIndex(standing, "vec_id", "embedding", dim, b),
        delta, "vec_id", "embedding", dim, b, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Similarity.cosinePairsLshDelta(
        standing, delta, "vec_id", "embedding", dim, b, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex === direct)
    assert(viaIndex === Set((100L, 7L)))
  }
}
