package graft.tools

import graft.streaming.Streams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the PQ codebook DRIFT gate (round 13):
  * replays the q164-shaped 6-batch fold with a distribution shift
  * injected from batch 3 on, printing the sampled ADC recall the gate
  * measures at each compaction and the resulting refresh decisions —
  * the numbers that pick q165's drift transform and recall floor, and
  * the BASELINE "recall held across a drifted replay" table.
  *
  * Usage: runMain graft.tools.PqDriftProbe <sfDir> [minRecallX100]
  */
object PqDriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val floor = args.lift(1).map(_.toLong).getOrElse(0L)
    val drift = args.lift(2).getOrElse("neg") // none | neg | collapse
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .appName("pq-drift-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    // The drift: from batch 3 on, vectors collapse toward a constant
    // direction the initial codebooks never saw.
    def batchOf(i: Int) = {
      val b = emb.filter(col("vec_id") % 6 === i)
      if (i >= 3 && drift == "neg")
        b.withColumn("embedding", transform(col("embedding"), x => -x))
      else if (i >= 3 && drift == "shift")
        b.withColumn("embedding", transform(col("embedding"), x => x + lit(8.0f)))
      else if (i >= 3 && drift == "rev")
        b.withColumn("embedding", reverse(col("embedding")))
      else if (i >= 3 && drift == "dimscale")
        b.withColumn("embedding", transform(col("embedding"),
          (x, i) => x * (lit(1.0f) + i.cast("float"))))
      else if (i >= 3 && drift == "collapse")
        b.withColumn("embedding",
          transform(col("embedding"), x => x * lit(0.05f) + lit(0.9f)))
      else b
    }

    val gate = Streams.newVectorIndexGate(
      batchOf(0), "vec_id", "embedding",
      numCentroids = 16, nprobe = 2, shortlist = 40, k = 10,
      compactEvery = 2, pqM = 8, pqKsub = 256, pqIters = 2,
      pqRefreshMinRecallX100 = floor)
    // mean recall over the whole corpus, plus split by mode (raw ids
    // %6 in 0..2 vs drifted %6 in 3..5) — the BASELINE table showing
    // WHERE the refreshed codebooks spend their capacity
    def recallNow(): (Long, Long, Long) = {
      val raw = gate.postingsNow.select(col("vec_id"),
        graft.ops.Similarity.unpackUdf(col("fv")).as("v"))
      val cb = graft.ops.Similarity.pqCbFromFrame(gate.pqFrame.get)
      def m(f: org.apache.spark.sql.DataFrame) =
        graft.ops.Similarity.pqMeanRecallX100(f, "vec_id", "v", cb, 10, 256)
      (m(raw), m(raw.filter(col("vec_id") % 6 <= 2)),
        m(raw.filter(col("vec_id") % 6 >= 3)))
    }
    println(s"initial recallX100=${recallNow()}")
    (1 to 5).foreach { i =>
      val t0 = System.nanoTime()
      gate.foldRaw(batchOf(i), "vec_id", "embedding")
      val (all, rawM, drift) = recallNow()
      println(f"fold $i%d: refreshes=${gate.pqRefreshCount}%d " +
        f"recallX100 all=$all%d raw=$rawM%d drifted=$drift%d " +
        f"(${(System.nanoTime() - t0) / 1e9}%.2f s)")
    }
    val n = gate.decisions.count()
    println(s"decisions: $n, refreshes: ${gate.pqRefreshCount}")
    gate.release()
    spark.stop()
  }
}
