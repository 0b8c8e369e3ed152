package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Winnow-gate state-growth measurement (round 9): drive
  * Streams.WinnowGate for N micro-batches over a large corpus and
  * print, per batch, the numbers that decide whether the maintained
  * winnowed multiplicity index survives at stream scale — wall time,
  * index rows (distinct fingerprints), block-manager bytes,
  * cached-RDD count, and carried plan widths. Flat wall time + bounded
  * storage/plan width = pass (BASELINE.md records the table).
  * The index-rows column doubles as the volume argument: the winnowed
  * index should sit at roughly 2/(stride+1) of the corpus's window
  * count.
  *
  * Usage: runMain graft.tools.WinnowGateBench [docsDir] [batches] [batchSize] [initRows]
  */
object WinnowGateBench {

  def main(args: Array[String]): Unit = {
    val docsDir = args.headOption.getOrElse("/tmp/sfscale")
    val batches = if (args.length > 1) args(1).toInt else 50
    val batchSize = if (args.length > 2) args(2).toInt else 1000
    val initRows = if (args.length > 3) args(3).toInt else 5000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$docsDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")
      .limit(initRows + batches * batchSize)
      .collect()
    require(docs.length > initRows, s"need > $initRows docs in $docsDir")
    import spark.implicits._
    def frame(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getString(1))).toSeq.toDF("doc_id", "text")

    val gate = Streams.newWinnowGate(
      frame(docs.take(initRows)), "doc_id", "text", width = 40, stride = 20)
    def storage(): (Long, Int) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.map(i => i.memSize + i.diskSize).sum, infos.length)
    }
    def planLeaves(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collectLeaves().size

    val stream = docs.drop(initRows).grouped(batchSize).take(batches).toVector
    val walls = stream.zipWithIndex.map { case (rows, i) =>
      val t0 = System.nanoTime()
      gate.ingest(frame(rows))
      val wall = (System.nanoTime() - t0) / 1e9
      val idxRows = gate.indexNow.count()
      val (bytes, nRdds) = storage()
      println(s"""{"batch":${i + 1},"wall_sec":${graft.Bench.fmt(wall, 3)},"index_rows":$idxRows,"ckpt_bytes":$bytes,"cached_rdds":$nRdds,"index_plan_leaves":${planLeaves(gate.indexNow)},"decision_plan_leaves":${planLeaves(gate.decisions)}}""")
      wall
    }
    val head5 = walls.take(5).sum / math.min(5, walls.size)
    val tail5 = walls.takeRight(5).sum / math.min(5, walls.size)
    val flagged = gate.decisions.filter(col("n_repeated") > 0).count()
    println(s"""{"summary":"winnow-gate","batches":${walls.size},"batch_size":$batchSize,"first5_avg_sec":${graft.Bench.fmt(head5, 3)},"last5_avg_sec":${graft.Bench.fmt(tail5, 3)},"growth":${if (head5 > 0) graft.Bench.fmt(tail5 / head5, 2) else "null"},"annotated_docs":${gate.decisions.count()},"flagged_docs":$flagged,"final_index_rows":${gate.indexNow.count()}}""")
    spark.stop()
  }
}
