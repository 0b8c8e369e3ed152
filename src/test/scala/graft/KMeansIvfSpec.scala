package graft

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trained-IVF: distributed Lloyd's k-means centroids + the shared IVF
  * probe/rerank machinery. Pins the operator contracts — structure,
  * empty-cell survival, and recall against brute-force ground truth at
  * least as good as the training-free seed cells (the point of
  * training).
  */
class KMeansIvfSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-kmeans-ivf-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  private def recallAt10(result: org.apache.spark.sql.DataFrame,
                         truth: org.apache.spark.sql.DataFrame): Double = {
    val hits = result.join(truth, Seq("query_id", "neighbor_id"), "left_semi").count().toDouble
    hits / truth.count().toDouble
  }

  test("kmeansCentroids returns k well-formed centroids and tolerates empty cells") {
    val emb = Tables.load(spark, dir, "embeddings")
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(cents.length === 8)
    assert(cents.map(_._1).toSeq === (0L until 8L))
    cents.foreach { case (_, pv, nrm) =>
      assert(pv.length % 8 === 0 && pv.nonEmpty)
      assert(nrm > 0.0)
    }
    // k > distinct vectors: the surplus cells keep their seed centroid
    // (no NaN/zero-norm collapse)
    val tiny = emb.limit(5)
    val cents2 = Similarity.kmeansCentroids(tiny, "vec_id", "embedding", k = 5, iters = 3)
    assert(cents2.forall(_._3 > 0.0))
    // empty corpus: no centroids, no crash
    val none = Similarity.kmeansCentroids(
      emb.filter(col("vec_id") < 0), "vec_id", "embedding", k = 4, iters = 2)
    assert(none.isEmpty)
  }

  test("trained IVF recall >= training-free seed IVF recall (both vs brute force)") {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, k = 10)
      .localCheckpoint()
    val seed = Similarity.ivfTopK(emb, "vec_id", "embedding", queries,
      numCentroids = 16, nprobe = 2, k = 10)
    val trained = Similarity.ivfTopKTrained(emb, "vec_id", "embedding", queries,
      numCentroids = 16, trainIters = 3, nprobe = 2, k = 10)
    val rSeed = recallAt10(seed, truth)
    val rTrained = recallAt10(trained, truth)
    info(f"recall@10: seed=$rSeed%.3f trained=$rTrained%.3f")
    assert(rTrained >= rSeed - 1e-9,
      f"training degraded recall: $rTrained%.3f < $rSeed%.3f")
    assert(rTrained > 0.2, f"trained recall implausibly low: $rTrained%.3f")
    // contract shape: ranks are 1..10 per query
    val badRanks = trained.groupBy("query_id")
      .agg(min("rank").as("lo"), max("rank").as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") > 10 || col("n") > 10)
    assert(badRanks.count() === 0)
  }
}
