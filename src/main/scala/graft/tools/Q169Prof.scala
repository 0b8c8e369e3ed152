package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profile of the q169 sampled PQ judge. */
object Q169Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.count()
    def time(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[q169prof] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val qs = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(256).localCheckpoint()
    time("sample")(qs.count())
    val cb = graft.ops.Similarity.pqTrainCodebooksInt(
      emb, "vec_id", "embedding", 8, 256, 2)
    time("train")(())
    val approx = graft.ops.Similarity.pqAdcTopK(
      emb, "vec_id", "embedding", qs, cb, 10)
    time("adc-md5-256")(approx.write.format("noop").mode("overwrite").save())
    val approx2 = graft.ops.Similarity.pqAdcTopK(
      emb, "vec_id", "embedding", emb.filter(col("vec_id") % 100 === 0), cb, 10)
    time("adc-filter-200")(approx2.write.format("noop").mode("overwrite").save())
    val approx3 = graft.ops.Similarity.pqAdcTopK(
      emb, "vec_id", "embedding",
      emb.join(qs.select(col("vec_id")), Seq("vec_id"), "left_semi"), cb, 10)
    time("adc-semijoin-256")(approx3.write.format("noop").mode("overwrite").save())
    val ids = qs.select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    time("adc-isin-256")(graft.ops.Similarity.pqAdcTopK(
      emb, "vec_id", "embedding",
      emb.filter(col("vec_id").isInCollection(ids)), cb, 10)
      .write.format("noop").mode("overwrite").save())
    // bisect: md5 sample at 64 queries; raw cross+adc agg without window
    val qs64 = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(64).localCheckpoint()
    time("adc-md5-64")(graft.ops.Similarity.pqAdcTopK(
      emb, "vec_id", "embedding", qs64, cb, 10)
      .write.format("noop").mode("overwrite").save())
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/q169_plan_md5.txt"),
      approx.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/q169_plan_filter.txt"),
      approx2.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    time("full")(graft.ops.Similarity.pqTopKRecallExport(
      emb, "vec_id", "embedding", qs, 8, 256, 2, 10,
      exportPath = "/tmp/q169prof-cb")
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
