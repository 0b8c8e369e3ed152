package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Vector-index-gate state-growth measurement (round 9): drive
  * Streams.VectorIndexGate for N micro-batches of embeddings and
  * print, per batch, the numbers that decide whether the maintained
  * IVF index survives at stream scale — wall time, postings rows,
  * block-manager bytes, cached-RDD count, and carried plan widths.
  * Flat wall time + bounded storage/plan width = pass (BASELINE.md
  * records the table). Quantization/assignment happens inside foldRaw
  * (it IS the gate's map-side ingest stage), so `wall_sec` is the full
  * per-batch serving-index maintenance cost.
  *
  * A sixth argument sets `targetCellOccupancy` (> 0 turns on the
  * occupancy auto-reseed); per-batch rows then also report the live
  * centroid count, so reseed fold(s) are visible in the table.
  *
  * Usage: runMain graft.tools.VectorIndexGateBench [dir] [batches] [batchSize] [initRows] [numCentroids] [targetOccupancy]
  */
object VectorIndexGateBench {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfscale")
    val batches = if (args.length > 1) args(1).toInt else 50
    val batchSize = if (args.length > 2) args(2).toInt else 1000
    val initRows = if (args.length > 3) args(3).toInt else 5000
    val numCentroids = if (args.length > 4) args(4).toInt else 64
    val targetOccupancy = if (args.length > 5) args(5).toLong else 0L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .orderBy("vec_id")
      .limit(initRows + batches * batchSize)
      .collect()
    require(emb.length > initRows, s"need > $initRows vectors in $dir")
    import spark.implicits._
    def frame(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getSeq[Float](1)))
        .toSeq.toDF("vec_id", "embedding")

    val gate = Streams.newVectorIndexGate(
      frame(emb.take(initRows)), "vec_id", "embedding",
      numCentroids, nprobe = 2, shortlist = 40, k = 10,
      targetCellOccupancy = targetOccupancy)
    def storage(): (Long, Int) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.map(i => i.memSize + i.diskSize).sum, infos.length)
    }
    def planLeaves(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collectLeaves().size

    val stream = emb.drop(initRows).grouped(batchSize).take(batches).toVector
    val walls = stream.zipWithIndex.map { case (rows, i) =>
      val t0 = System.nanoTime()
      gate.foldRaw(frame(rows), "vec_id", "embedding")
      val wall = (System.nanoTime() - t0) / 1e9
      val postRows = gate.postingsNow.count()
      val (bytes, nRdds) = storage()
      println(s"""{"batch":${i + 1},"wall_sec":${graft.Bench.fmt(wall, 3)},"postings_rows":$postRows,"centroids":${gate.centroidCount},"ckpt_bytes":$bytes,"cached_rdds":$nRdds,"postings_plan_leaves":${planLeaves(gate.postingsNow)},"decision_plan_leaves":${planLeaves(gate.decisions)}}""")
      wall
    }
    val head5 = walls.take(5).sum / math.min(5, walls.size)
    val tail5 = walls.takeRight(5).sum / math.min(5, walls.size)
    println(s"""{"summary":"vector-index-gate","num_centroids":$numCentroids,"final_centroids":${gate.centroidCount},"target_occupancy":$targetOccupancy,"batches":${walls.size},"batch_size":$batchSize,"first5_avg_sec":${graft.Bench.fmt(head5, 3)},"last5_avg_sec":${graft.Bench.fmt(tail5, 3)},"growth":${if (head5 > 0) graft.Bench.fmt(tail5 / head5, 2) else "null"},"annotation_rows":${gate.decisions.count()},"final_postings_rows":${gate.postingsNow.count()}}""")
    spark.stop()
  }
}
