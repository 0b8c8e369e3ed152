package graft.tools

import org.apache.spark.sql.SparkSession

/** Vocab-scale BPE training leg: time learnMerges at real vocabulary
  * sizes (hundreds of rounds) and report the pass count the batched
  * selection actually needed. Usage:
  *   sbt "runMain graft.tools.BpeTrainBench <sfDir> <rounds> [maxBatch]"
  */
object BpeTrainBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 256
    val maxBatch = if (args.length > 2) args(2).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, dir, "documents")
    docs.count() // warm the scan
    val hist = args.length > 3 && args(3) == "hist"
    val t0 = System.nanoTime()
    val merges = (if (hist)
        graft.ops.BpeTrain.learnMergesHistogram(docs, "text", rounds, maxBatch)
      else graft.ops.BpeTrain.learnMerges(docs, "text", rounds, maxBatch))
      .collect()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[bpebench] dir=$dir rounds=$rounds maxBatch=$maxBatch hist=$hist " +
      f"learned=${merges.length} wall=$sec%.2f s")
    println("[bpebench] last merges: " + merges.takeRight(5).map(r =>
      s"(${r.getString(1)}|${r.getString(2)}@${r.getLong(3)})").mkString(" "))
    spark.stop()
  }
}
