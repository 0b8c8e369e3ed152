package graft

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** LSH-bucketed embedding near-dup pairs: a deterministic SUBSET of the
  * exact cosine pairs (the bucket join may only PRUNE candidates, never
  * invent them), non-trivial at the test threshold, and emitted once
  * per unordered pair.
  */
class LshPairsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-lsh-pairs-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  test("LSH pairs are a non-trivial subset of the exact pairs, each emitted once") {
    val emb = Tables.load(spark, dir, "embeddings")
    val exact = Similarity.cosinePairsBlocked(emb, "vec_id", "embedding", threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosinePairsLsh(emb, "vec_id", "embedding",
      dim = 64, numPlanes = 4, threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lsh.length === lsh.toSet.size, "duplicate pairs emitted")
    assert(lsh.toSet.subsetOf(exact), s"LSH invented pairs: ${lsh.toSet.diff(exact)}")
    assert(lsh.nonEmpty, "bucket join pruned everything at this SF")
    lsh.foreach { case (a, b) => assert(a < b) }
  }

  test("autoPlanes: integer ceil-log2 of ceil(n/target), floored at 4") {
    // Below/at one target bucket: the floor.
    assert(Similarity.autoPlanes(0) === 4)
    assert(Similarity.autoPlanes(1) === 4)
    assert(Similarity.autoPlanes(125) === 4)
    // Both test SFs stay at the historical B=4 (bench continuity).
    assert(Similarity.autoPlanes(500) === 4)
    assert(Similarity.autoPlanes(2000) === 4)
    // Exact power-of-two boundary: n/target = 16 → exactly 4, not 5
    // (the FP-log2 hazard this integer form exists to avoid).
    assert(Similarity.autoPlanes(16 * 125) === 4)
    assert(Similarity.autoPlanes(16 * 125 + 1) === 5)
    // 62× scale leg: 124k vectors → m = 992 → B = 10.
    assert(Similarity.autoPlanes(124000) === 10)
    // Growth is logarithmic: 100 TB-ish corpus counts stay joinable.
    assert(Similarity.autoPlanes(1L << 40) === 34)
  }

  test("auto-B pairs remain a subset of exact and match fixed B=4 at this SF") {
    val emb = Tables.load(spark, dir, "embeddings")
    val fixed = Similarity.cosinePairsLsh(emb, "vec_id", "embedding",
      dim = 64, numPlanes = 4, threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = Similarity.cosinePairsLshAuto(emb, "vec_id", "embedding",
      dim = 64, threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 500 vectors → autoPlanes = 4, so the outputs are identical.
    assert(auto === fixed)
  }

  test("delta pairs equal the full self-join restricted to delta×standing") {
    val emb = Tables.load(spark, dir, "embeddings")
    val standing = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 5 =!= 0)
    val delta = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 5 === 0)
    // the full self-join's pairs (id_a < id_b), re-keyed to
    // (delta_id, corpus_id) and restricted to cross pairs
    val full = Similarity.cosinePairsLshAuto(emb, "vec_id", "embedding",
        dim = 64, threshold = 0.30)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) =>
        (a % 5 == 0, b % 5 == 0) match {
          case (true, false) => Some((a, b))
          case (false, true) => Some((b, a))
          case _             => None
        }
      }.toSet
    val deltaPairs = Similarity.cosinePairsLshDeltaAuto(
        standing, delta, "vec_id", "embedding", dim = 64, threshold = 0.30)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(deltaPairs === full)
    assert(deltaPairs.nonEmpty, "delta join pruned everything at this SF")
    // a re-ingested id never pairs with its own standing twin
    val reingest = Similarity.cosinePairsLshDeltaAuto(
        standing, standing.limit(5), "vec_id", "embedding", dim = 64, threshold = 0.30)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    reingest.foreach { case (d, c) => assert(d != c) }
  }
}
