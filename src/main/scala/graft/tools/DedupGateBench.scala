package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Dedup-gate state-growth measurement: drive Streams.DedupGate for N
  * micro-batches over a large corpus and print, per batch, the numbers
  * that decide whether a long-running ingest gate survives at stream
  * scale — wall time, corpus rows, block-manager bytes for the
  * loop-carried checkpoints, cached-RDD count, and the width of the
  * carried plans. Flat wall time + bounded storage/plan width = pass
  * (BASELINE.md records the adjudicated table).
  *
  * Also prints a two-point cost comparison at the final corpus size:
  * the indexed delta join (what the gate runs) vs the kernel-recompute
  * form (what it ran before the band-key index landed).
  *
  * Usage: runMain graft.tools.DedupGateBench [docsDir] [batches] [batchSize] [initRows]
  * docsDir defaults to the ScaleGen 10× corpus at /tmp/sfscale.
  */
object DedupGateBench {

  def main(args: Array[String]): Unit = {
    val docsDir = args.headOption.getOrElse("/tmp/sfscale")
    val batches = if (args.length > 1) args(1).toInt else 50
    val batchSize = if (args.length > 2) args(2).toInt else 1000
    val initRows = if (args.length > 3) args(3).toInt else 5000
    // 5th arg forces the relabel broadcast cap (0 = every fold takes
    // the DISTRIBUTED shuffle regime — the 100 TB backfill path)
    val relabelCap = if (args.length > 4) Some(args(4).toLong) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    relabelCap.foreach(c =>
      spark.conf.set("spark.graft.relabelBroadcastCap", c.toString))

    // deterministic id-ordered split: first initRows docs seed the
    // corpus, the next batches×batchSize stream through the gate
    val docs = spark.read.parquet(s"$docsDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")
      .limit(initRows + batches * batchSize)
      .collect()
    require(docs.length > initRows, s"need > $initRows docs in $docsDir")
    import spark.implicits._
    def frame(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getString(1))).toSeq.toDF("doc_id", "text")

    val gate = Streams.newDedupGate(frame(docs.take(initRows)), "doc_id", "text")
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
      val rowsNow = gate.corpusNow.count()
      val (bytes, nRdds) = storage()
      println(s"""{"batch":${i + 1},"wall_sec":${graft.Bench.fmt(wall, 3)},"corpus_rows":$rowsNow,"ckpt_bytes":$bytes,"cached_rdds":$nRdds,"corpus_plan_leaves":${planLeaves(gate.corpusNow)},"index_plan_leaves":${planLeaves(gate.indexNow)},"label_plan_leaves":${planLeaves(gate.clustersNow)}}""")
      wall
    }
    val head5 = walls.take(5).sum / math.min(5, walls.size)
    val tail5 = walls.takeRight(5).sum / math.min(5, walls.size)
    val clusterStats = gate.clustersNow
      .agg(count(lit(1)), countDistinct(col("component_id")),
        sum(when(col("doc_id") =!= col("component_id"), 1L).otherwise(0L)))
      .head()
    println(s"""{"summary":"dedup-gate","batches":${walls.size},"batch_size":$batchSize,"first5_avg_sec":${graft.Bench.fmt(head5, 3)},"last5_avg_sec":${graft.Bench.fmt(tail5, 3)},"growth":${if (head5 > 0) graft.Bench.fmt(tail5 / head5, 2) else "null"},"rejected_total":${gate.rejected.count()},"labeled_docs":${clusterStats.getLong(0)},"clusters":${clusterStats.getLong(1)},"non_singleton_members":${clusterStats.getLong(2)}}""")

    // two-point comparison at final corpus size: indexed vs recompute.
    // Each form runs once for codegen warmup, then best-of-2 timed runs
    // (same protocol as Bench) so plan-compile cost and run order don't
    // bias the comparison.
    val lastBatch = frame(stream.last)
    val corpusF = gate.corpusNow.localCheckpoint()
    val indexF = gate.indexNow.localCheckpoint()
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
    }
    def bestOf2(f: => Long): (Double, Long) = {
      f; val (t1, n) = time(f); val (t2, _) = time(f); (math.min(t1, t2), n)
    }
    val (tIdx, nIdx) = bestOf2(graft.ops.Dedup.minhashLshDeltaPairsIndexed(
      indexF, corpusF, lastBatch, "doc_id", "text", 3, 64, 16, 1, 2).count())
    val (tRec, nRec) = bestOf2(graft.ops.Dedup.minhashLshDeltaPairsNative(
      corpusF, lastBatch, "doc_id", "text", 3, 64, 16, 1, 2).count())
    println(s"""{"summary":"indexed_vs_recompute","corpus_rows":${corpusF.count()},"indexed_sec":${graft.Bench.fmt(tIdx, 3)},"recompute_sec":${graft.Bench.fmt(tRec, 3)},"pairs_indexed":$nIdx,"pairs_recompute":$nRec}""")
    spark.stop()
  }
}
