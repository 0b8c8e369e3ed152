package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** EmbeddingDedupGate state-growth measurement — the vector twin of
  * [[DedupGateBench]]: N micro-batches of vectors through the gate,
  * per-batch wall time / corpus count / checkpoint bytes / plan width,
  * plus the auto-B rebuild events (tiny targetBucket so rebuilds
  * actually fire inside the run). Flat wall + bounded width + correct
  * rebuilds = pass; BASELINE.md records the table.
  *
  * Usage: runMain graft.tools.EmbeddingGateBench [embDir] [batches] [batchSize] [initRows] [targetBucket]
  */
object EmbeddingGateBench {

  def main(args: Array[String]): Unit = {
    val embDir = args.headOption.getOrElse("/tmp/sfscale")
    val batches = if (args.length > 1) args(1).toInt else 45
    val batchSize = if (args.length > 2) args(2).toInt else 400
    val initRows = if (args.length > 3) args(3).toInt else 2000
    val targetBucket = if (args.length > 4) args(4).toLong else 125L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vecs = spark.read.parquet(s"$embDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .orderBy("vec_id")
      .limit(initRows + batches * batchSize)
      .collect()
    require(vecs.length > initRows, s"need > $initRows vectors in $embDir")
    import spark.implicits._
    def frame(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq.toDF("vec_id", "embedding")

    val gate = Streams.newEmbeddingDedupGate(
      frame(vecs.take(initRows)), "vec_id", "embedding",
      dim = 64, threshold = 0.45, targetBucket = targetBucket)
    def storage(): (Long, Int) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.map(i => i.memSize + i.diskSize).sum, infos.length)
    }
    var lastB = gate.numPlanes
    val stream = vecs.drop(initRows).grouped(batchSize).take(batches).toVector
    val walls = stream.zipWithIndex.map { case (rows, i) =>
      val t0 = System.nanoTime()
      gate.ingest(frame(rows))
      val wall = (System.nanoTime() - t0) / 1e9
      val (bytes, nRdds) = storage()
      val rebuilt = gate.numPlanes != lastB
      lastB = gate.numPlanes
      println(s"""{"batch":${i + 1},"wall_sec":${graft.Bench.fmt(wall, 3)},"corpus_rows":${gate.corpusCount},"planes":${gate.numPlanes},"rebuild":$rebuilt,"ckpt_bytes":$bytes,"cached_rdds":$nRdds,"index_plan_leaves":${gate.indexNow.queryExecution.analyzed.collectLeaves().size}}""")
      wall
    }
    val head5 = walls.take(5).sum / math.min(5, walls.size)
    val tail5 = walls.takeRight(5).sum / math.min(5, walls.size)
    println(s"""{"summary":"embedding-gate","batches":${walls.size},"batch_size":$batchSize,"first5_avg_sec":${graft.Bench.fmt(head5, 3)},"last5_avg_sec":${graft.Bench.fmt(tail5, 3)},"final_planes":${gate.numPlanes},"rejected_total":${gate.rejected.count()}}""")
    spark.stop()
  }
}
