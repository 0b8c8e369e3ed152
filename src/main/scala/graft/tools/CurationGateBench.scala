package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Curation-gate state-growth measurement (round 9, completing the
  * gate-bench family next to DedupGateBench / EmbeddingGateBench /
  * WinnowGateBench): drive Streams.CurationGate — with the near-dup
  * stage ENABLED, the most state-heavy configuration — for N
  * micro-batches and print, per batch, wall time, decision count,
  * carried train-token total, block-manager bytes, cached-RDD count,
  * and carried plan widths. Flat wall time + bounded storage/plan
  * width = pass (BASELINE.md records the table). The q114/q115 replay
  * queries time 3 oracle-shaped folds INCLUDING standing-state
  * derivation; this table is the per-batch cost a production stream
  * pays.
  *
  * Usage: runMain graft.tools.CurationGateBench [docsDir] [batches] [batchSize] [initRows]
  */
object CurationGateBench {

  def main(args: Array[String]): Unit = {
    val docsDir = args.headOption.getOrElse("/tmp/sfscale")
    val batches = if (args.length > 1) args(1).toInt else 30
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

    // a small fixed eval slice (shingled once at construction — its
    // cost must NOT recur per batch; a growing wall would expose that)
    val evalSet = frame(docs.take(initRows)).filter(col("doc_id") % 97 === 0)
    val gate = Streams.newCurationGate(
      frame(docs.take(initRows)), evalSet, "doc_id", "text",
      tokensPerShard = 16384L,
      nearDup = Some(Streams.NearDupParams()))
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
      val nDecisions = gate.decisions.count()
      val (bytes, nRdds) = storage()
      println(s"""{"batch":${i + 1},"wall_sec":${graft.Bench.fmt(wall, 3)},"decisions":$nDecisions,"train_tokens":${gate.trainTokensNow},"ckpt_bytes":$bytes,"cached_rdds":$nRdds,"digest_plan_leaves":${planLeaves(gate.digestsNow)},"decision_plan_leaves":${planLeaves(gate.decisions)}}""")
      wall
    }
    val head5 = walls.take(5).sum / math.min(5, walls.size)
    val tail5 = walls.takeRight(5).sum / math.min(5, walls.size)
    val byStatus = gate.decisions.groupBy("status").count().collect()
      .map(r => s""""${r.getString(0)}":${r.getLong(1)}""").sorted.mkString(",")
    println(s"""{"summary":"curation-gate","batches":${walls.size},"batch_size":$batchSize,"first5_avg_sec":${graft.Bench.fmt(head5, 3)},"last5_avg_sec":${graft.Bench.fmt(tail5, 3)},"growth":${if (head5 > 0) graft.Bench.fmt(tail5 / head5, 2) else "null"},"decisions":{$byStatus},"train_tokens":${gate.trainTokensNow}}""")
    spark.stop()
  }
}
