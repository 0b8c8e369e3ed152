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
}
