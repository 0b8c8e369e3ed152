package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Band-hash-gate state-growth measurement (round 9): drive
  * Streams.BandHashGate for N micro-batches of perceptual hashes over
  * a large corpus and print, per batch, the numbers that decide
  * whether the maintained hash index survives at stream scale — wall
  * time, hash-table rows, block-manager bytes, cached-RDD count, and
  * carried plan widths. Flat wall time + bounded storage/plan width =
  * pass (BASELINE.md records the table). Hashing (PPM encode + aHash)
  * happens map-side per batch BEFORE the fold, as a caller's pipeline
  * would, so `wall_sec` isolates the gate cost the way production
  * sees it: the decode/hash stage is the stream transform, the fold
  * is the state maintenance.
  *
  * A fifth argument picks the modality: `ppm` (default — PPM encode +
  * aHash) or `wav` (WAV encode + PCM envelope hash), so the AUDIO
  * maintained path gets its own per-batch cost row (the q123
  * production shape: only the batch decodes; the standing corpus is
  * the carried hash table).
  *
  * Usage: runMain graft.tools.BandHashGateBench [docsDir] [batches] [batchSize] [initRows] [ppm|wav]
  */
object BandHashGateBench {

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
    val mode = if (args.length > 4) args(4) else "ppm"
    def hashed(rows: Array[org.apache.spark.sql.Row]) = {
      val df = rows.map(r => (r.getLong(0), r.getString(1))).toSeq
        .toDF("doc_id", "text")
      (mode match {
        case "wav" => graft.ops.Media.wavEnvelopeHash(
          graft.ops.Media.asWav(df, "doc_id", "text"))
        case _ => graft.ops.Media.ppmAHash(
          graft.ops.Media.asPpm(df, "doc_id", "text"))
      }).toDF()
    }

    val gate = Streams.newBandHashGate(hashed(docs.take(initRows)))
    def storage(): (Long, Int) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.map(i => i.memSize + i.diskSize).sum, infos.length)
    }
    def planLeaves(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collectLeaves().size

    val stream = docs.drop(initRows).grouped(batchSize).take(batches).toVector
    val walls = stream.zipWithIndex.map { case (rows, i) =>
      val batch = hashed(rows).localCheckpoint() // hash stage materialized here
      val t0 = System.nanoTime()
      gate.ingest(batch)
      val wall = (System.nanoTime() - t0) / 1e9
      val tblRows = gate.hashesNow.count()
      val (bytes, nRdds) = storage()
      println(s"""{"batch":${i + 1},"wall_sec":${graft.Bench.fmt(wall, 3)},"hash_rows":$tblRows,"ckpt_bytes":$bytes,"cached_rdds":$nRdds,"hash_plan_leaves":${planLeaves(gate.hashesNow)},"decision_plan_leaves":${planLeaves(gate.decisions)}}""")
      wall
    }
    val head5 = walls.take(5).sum / math.min(5, walls.size)
    val tail5 = walls.takeRight(5).sum / math.min(5, walls.size)
    val flagged = gate.decisions.filter(col("n_partners") > 0).count()
    println(s"""{"summary":"band-hash-gate","mode":"$mode","batches":${walls.size},"batch_size":$batchSize,"first5_avg_sec":${graft.Bench.fmt(head5, 3)},"last5_avg_sec":${graft.Bench.fmt(tail5, 3)},"growth":${if (head5 > 0) graft.Bench.fmt(tail5 / head5, 2) else "null"},"annotated_docs":${gate.decisions.count()},"flagged_docs":$flagged,"final_hash_rows":${gate.hashesNow.count()}}""")
    spark.stop()
  }
}
