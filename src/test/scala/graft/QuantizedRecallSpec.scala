package graft

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** int8 quantization QA (q101): recall semantics and the degenerate
  * shapes the corpus never exercises.
  */
class QuantizedRecallSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-quantized-recall-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  test("recall is in [0, k] per query, and high on the real corpus") {
    val emb = Tables.load(spark, dir, "embeddings")
    val out = Similarity.quantizedTopKRecall(emb, "vec_id", "embedding",
        queries = emb.filter(col("vec_id") % 100 === 0), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 5)
    out.foreach { case (_, n, rx) =>
      assert(n >= 0L && n <= 10L)
      assert(rx === n * 100 / 10)
    }
    // 64-dim int8 quantization should preserve most of the ranking.
    assert(out.map(_._2).sum >= 40L, out.mkString(", "))
  }

  test("orthogonal axis vectors: quantization cannot perturb a clean ranking") {
    val s = spark; import s.implicits._
    // Query = axis 0; neighbors at decreasing alignment. Quantized and
    // float rankings must agree exactly → recall k/k.
    def vec(axis: Int, main: Double, leak: Double): Seq[Float] =
      Seq.tabulate(8)(i => if (i == axis) main.toFloat else if (i == (axis + 1) % 8) leak.toFloat else 0f)
    val rows = Seq(
      (0L, vec(0, 1.0, 0.0)),
      (1L, vec(0, 1.0, 0.1)),
      (2L, vec(0, 1.0, 0.5)),
      (3L, vec(0, 1.0, 1.0)),
      (4L, vec(1, 1.0, 0.0)) // orthogonal to the query
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizedTopKRecall(rows, "vec_id", "embedding",
        queries = rows.filter(col("vec_id") === 0), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((0L, 3L, 100L)))
  }

  test("quantized IVF at full probe budget reduces to the exact ranking (recall 100)") {
    // With every cell probed and the shortlist covering the corpus,
    // the integer-dot stages only SELECT candidates; the float rerank
    // then IS the exact top-k — the composition's correctness anchor.
    val s = spark
    import s.implicits._
    val emb = Tables.load(s, "/root/testdata/sf0.01", "embeddings").limit(120)
    val out = Similarity.ivfTopKQuantizedRecall(emb, "vec_id", "embedding",
        queries = emb.filter(col("vec_id") % 40 === 0),
        numCentroids = 8, nprobe = 8, shortlist = 200, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.nonEmpty)
    out.foreach { case (q, recall) => assert(recall === 100L, s"query $q recall $recall") }
  }

  test("quantized IVF recall degrades gracefully as the shortlist shrinks") {
    val s = spark
    import s.implicits._
    val emb = Tables.load(s, "/root/testdata/sf0.01", "embeddings").limit(200)
    def recallAt(shortlist: Int): Double = {
      val rows = Similarity.ivfTopKQuantizedRecall(emb, "vec_id", "embedding",
          queries = emb.filter(col("vec_id") % 50 === 0),
          numCentroids = 8, nprobe = 4, shortlist = shortlist, k = 10)
        .collect().map(_.getLong(2))
      rows.sum.toDouble / rows.length
    }
    val wide = recallAt(120)
    val narrow = recallAt(10)
    assert(wide >= narrow, s"widening the shortlist must not lose recall: $wide < $narrow")
  }
}
