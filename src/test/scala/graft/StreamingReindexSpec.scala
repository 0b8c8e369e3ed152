package graft

import graft.bulk.GramIndex
import graft.streaming.Streams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming incremental index maintenance: a stream of write events
  * (upserts + deletes) maintains the postings table through
  * foreachBatch + the batch gram-diff delta (Streams.applyWriteBatch);
  * the maintained table must equal a rebuild from the final corpus —
  * the streaming twin of q69's delta ≡ rebuild invariant.
  */
class StreamingReindexSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-streaming-reindex")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  final case class Write(doc_id: Long, text: String) // text null = delete

  test("streamed write batches maintain postings equal to a rebuild") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val initial = Seq(
      (1L, "hello world"), (2L, "foo bar baz"), (3L, "to be deleted"), (4L, "unchanged"))
      .toDF("doc_id", "text")
    var standing = GramIndex.postings(initial, "doc_id", "text").localCheckpoint()

    val input = MemoryStream[Write]
    val query = input.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // localCheckpoint: each batch folds into materialized state,
        // not an ever-growing logical plan
        standing = Streams.applyWriteBatch(standing, batch, "doc_id", "text")
          .localCheckpoint()
      }
      .start()

    input.addData(Write(1L, "hello brave world"), Write(3L, null)) // update + delete
    query.processAllAvailable()
    input.addData(Write(5L, "brand new document"), Write(1L, "hello final world"))
    query.processAllAvailable()
    query.stop()

    val finalCorpus = Seq(
      (1L, "hello final world"), (2L, "foo bar baz"), (4L, "unchanged"),
      (5L, "brand new document"))
      .toDF("doc_id", "text")
    val rebuilt = GramIndex.postings(finalCorpus, "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(standing) === rows(rebuilt))
    assert(standing.filter(col("occurrences") <= 0).isEmpty)
  }

  test("episode-file stream maintains postings equal to a rebuild (consumer watermark)") {
    // The full episode path: hub layout (<dir>/<bid>/ep_<ts>.parquet)
    // → readEpisodes file stream → foreachBatch gram-diff fold. Covers
    // the fetch-style consumer watermark (sinceTs skips an episode
    // already in the store), intra-batch last-write-wins by
    // episode_ts, REMOVE tombstones, and structural rows (LIST) that
    // carry no indexed text.
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-episodes").toString

    def writeEpisode(bid: String, ts: Long, rows: Seq[(Array[Byte], String, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-ep-stage").toString
      rows.map { case (nid, kind, payload) => (bid, ts, nid, kind, payload) }
        .toDF("broadcast_id", "episode_ts", "node_id", "kind", "payload")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(dir, bid)
      java.nio.file.Files.createDirectories(dst)
      java.nio.file.Files.move(part.toPath, dst.resolve(s"ep_$ts.parquet"))
    }

    def id(b: Byte) = Array[Byte](b)
    val initialCorpus = Seq((id(1), "hello world"), (id(2), "stable doc"), (id(3), "doomed"))
      .toDF("node_id", "text")
    val initial = GramIndex.postings(initialCorpus, "node_id", "text")

    // pre-watermark episode: its content is already in the store
    writeEpisode("b1", 50L, Seq((id(3), "TEXT", "doomed")))

    val (handle, query) = Streams.maintainIndexFromEpisodes(s, dir, initial, sinceTs = 50L)
    try {
      writeEpisode("b1", 100L,
        Seq((id(1), "TEXT", "hello brave world"), (id(3), "REMOVE", null)))
      writeEpisode("b1", 110L,
        Seq((id(1), "TEXT", "hello final world"), (id(4), "TEXT", "brand new"),
          (id(5), "LIST", null)))
      query.processAllAvailable()

      val finalCorpus = Seq(
        (id(1), "hello final world"), (id(2), "stable doc"), (id(4), "brand new"))
        .toDF("node_id", "text")
      val rebuilt = GramIndex.postings(finalCorpus, "node_id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Array[Byte]]("id").toSeq, r.getLong(1), r.getLong(2))).toSet
      assert(rows(handle.current) === rows(rebuilt))
      assert(handle.current.filter(col("occurrences") <= 0).isEmpty)
    } finally query.stop()
  }

  test("durable restart: persist mid-stream, resume from the manifest, catch up — equals a rebuild") {
    // The reference's reopen-then-catch-up (log replay + fetch
    // watermark): kill the maintaining stream after some episodes,
    // persist (postings + consumer watermark) through ManifestStore,
    // write MORE episodes — including a rewrite of a node the dead
    // stream already indexed, which a watermark-less resume would risk
    // clobbering whenever old and new episodes land in different
    // micro-batches — then resume and assert the maintained table
    // equals a rebuild from final states.
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-episodes-resume").toString
    def writeEpisode(bid: String, ts: Long, rows: Seq[(Array[Byte], String, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-ep-stage").toString
      rows.map { case (nid, kind, payload) => (bid, ts, nid, kind, payload) }
        .toDF("broadcast_id", "episode_ts", "node_id", "kind", "payload")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(dir, bid)
      java.nio.file.Files.createDirectories(dst)
      java.nio.file.Files.move(part.toPath, dst.resolve(s"ep_$ts.parquet"))
    }
    def id(b: Byte) = Array[Byte](b)
    val initial = GramIndex.postings(
      Seq((id(1), "hello world"), (id(2), "stable doc")).toDF("node_id", "text"),
      "node_id", "text")

    // leg 1: two episodes, then kill + persist
    val (h1, q1) = Streams.maintainIndexFromEpisodes(s, dir, initial)
    val store = new graft.bulk.ManifestStore(s,
      java.nio.file.Files.createTempDirectory("graft-index-store").toString)
    try {
      writeEpisode("b1", 100L, Seq((id(1), "TEXT", "hello brave world")))
      writeEpisode("b1", 110L, Seq((id(3), "TEXT", "third doc arrives")))
      q1.processAllAvailable()
      assert(h1.lastUpdated === 110L)
      h1.persist(store)
    } finally q1.stop()

    // leg 2: more episodes AFTER the kill — including node 1 again
    writeEpisode("b1", 120L, Seq((id(1), "TEXT", "hello final world"), (id(3), "REMOVE", null)))
    writeEpisode("b1", 130L, Seq((id(4), "TEXT", "brand new")))

    val (h2, q2) = Streams.resumeMaintainedIndexFromEpisodes(s, dir, store)
    try {
      assert(h2.lastUpdated === 110L)
      q2.processAllAvailable()
      assert(h2.lastUpdated === 130L)
      val rebuilt = GramIndex.postings(
        Seq((id(1), "hello final world"), (id(2), "stable doc"), (id(4), "brand new"))
          .toDF("node_id", "text"),
        "node_id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Array[Byte]]("id").toSeq, r.getLong(1), r.getLong(2))).toSet
      assert(rows(h2.current) === rows(rebuilt))
    } finally q2.stop()
  }

  test("per-broadcast watermarks: resume folds another broadcast's lower-ts episode") {
    // episode_ts is only totally ordered WITHIN one broadcast's own
    // sequence — a resume filtering on a single global max(episode_ts)
    // would permanently skip broadcast b2's ep_105 here because the
    // dead stream had already folded b1's ep_110. The per-broadcast
    // marks must fold it (b2 was never seen) while still skipping
    // b1's already-applied episodes.
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-episodes-multib").toString
    def writeEpisode(bid: String, ts: Long, rows: Seq[(Array[Byte], String, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-ep-stage").toString
      rows.map { case (nid, kind, payload) => (bid, ts, nid, kind, payload) }
        .toDF("broadcast_id", "episode_ts", "node_id", "kind", "payload")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(dir, bid)
      java.nio.file.Files.createDirectories(dst)
      java.nio.file.Files.move(part.toPath, dst.resolve(s"ep_$ts.parquet"))
    }
    def id(b: Byte) = Array[Byte](b)
    val initial = GramIndex.postings(
      Seq((id(1), "hello world")).toDF("node_id", "text"), "node_id", "text")

    val (h1, q1) = Streams.maintainIndexFromEpisodes(s, dir, initial)
    val store = new graft.bulk.ManifestStore(s,
      java.nio.file.Files.createTempDirectory("graft-index-store-mb").toString)
    try {
      writeEpisode("b1", 110L, Seq((id(1), "hello brave world")).map {
        case (nid, t) => (nid, "TEXT", t)
      })
      q1.processAllAvailable()
      assert(h1.watermarks === Map("b1" -> 110L))
      h1.persist(store)
    } finally q1.stop()

    // after the kill: b2's own sequence starts at 105 (< b1's mark),
    // and b1 advances past its mark
    writeEpisode("b2", 105L, Seq((id(2), "TEXT", "second feed")))
    writeEpisode("b1", 120L, Seq((id(1), "TEXT", "hello final world")))

    val (h2, q2) = Streams.resumeMaintainedIndexFromEpisodes(s, dir, store)
    try {
      q2.processAllAvailable()
      assert(h2.watermarks === Map("b1" -> 120L, "b2" -> 105L))
      val rebuilt = GramIndex.postings(
        Seq((id(1), "hello final world"), (id(2), "second feed"))
          .toDF("node_id", "text"),
        "node_id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Array[Byte]]("id").toSeq, r.getLong(1), r.getLong(2))).toSet
      assert(rows(h2.current) === rows(rebuilt))
    } finally q2.stop()
  }

  test("duplicate writes to one id within a batch keep the postings table keyed") {
    // postings()' one-pass kernel aggregates per input ROW, so a batch
    // with two upserts of the same id would emit duplicate (id, gram)
    // rows and corrupt the keyed diff/merge — applyWriteBatch must
    // resolve to ONE final state per id before indexing.
    val s = spark
    import s.implicits._
    val standing0 = GramIndex.postings(
      Seq((1L, "hello world")).toDF("doc_id", "text"), "doc_id", "text")
    val batch = Seq((1L, "first rewrite"), (1L, "second rewrite"), (2L, "fresh doc"))
      .toDF("doc_id", "text")
    val after = Streams.applyWriteBatch(standing0, batch, "doc_id", "text")
    // keyed: exactly one row per (id, gram)
    assert(after.groupBy("id", "gram").count().filter(col("count") > 1).isEmpty)
    // id 1's postings match exactly ONE of the two candidate states —
    // never a merge of both
    val g1 = after.filter(col("id") === 1L).select("gram", "occurrences")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Seq("first rewrite", "second rewrite").map { t =>
      GramIndex.postings(Seq((1L, t)).toDF("doc_id", "text"), "doc_id", "text")
        .select("gram", "occurrences")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(cand.contains(g1))
  }
}
