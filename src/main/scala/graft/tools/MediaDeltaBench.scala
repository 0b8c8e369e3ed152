package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Production-shape cost of the media frame-digest delta (q113's
  * operator): the benched q113 row re-derives the standing
  * frame-digest index inside the query solely so the DuckDB oracle
  * can replay it (the q103 cost-model discipline). In production that
  * index is the gate's durable state — a fold pays ONLY the delta
  * decode plus probes of the materialized index. This main pins that
  * number: the standing index is built and checkpointed OUTSIDE the
  * timed region, then the indexed operator runs over it.
  *
  * Usage: runMain graft.tools.MediaDeltaBench [sfDir] [folds]
  */
object MediaDeltaBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val folds = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    // standing = 6/7 of the corpus; its frame-digest index is the
    // MAINTAINED state — built once, untimed
    val standingIdx = graft.ops.Ckpt.fresh(
      graft.ops.Media.ppmFrameDigests(
        graft.ops.Media.asPpm(docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text"))
        .toDF()
        .select(col("doc_id"), col("frame_md5").as("fh")).distinct())
    standingIdx.count() // materialize before the clock starts
    val delta = graft.ops.Media.asPpm(
      docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
    var i = 0
    while (i < folds) {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      graft.ops.Media.mediaNearDupDeltaPairsIndexed(standingIdx, delta)
        .write.format("noop").mode("overwrite").save()
      println(f"""{"fold":$i,"sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      i += 1
    }
    spark.stop()
  }
}
