package graft

import java.sql.Timestamp

import graft.streaming.Streams
import graft.streaming.Streams.UserEvent
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

final case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
final case class Doc(doc_id: Long, ts: Timestamp, text: String)

/** Structured Streaming semantics: the same operator definitions run
  * in batch and as incremental streaming queries with state.
  */
class StreamsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-streams-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  private val events = Seq(
    Ev(1, ts(5), 1, "click", 1.5),
    Ev(2, ts(20), 1, "view", 2.0),
    Ev(3, ts(65), 2, "click", 3.25),
    Ev(4, ts(70), 1, "click", 4.0),
    Ev(5, ts(130), 2, "view", 0.5))

  test("hourlyEventStats: streaming result equals batch result") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val batch = Streams.hourlyEventStats(events.toDF(), withWatermark = false)
      .collect().map(_.toSeq).toSet

    val input = MemoryStream[Ev]
    val query = Streams.hourlyEventStats(input.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode(OutputMode.Complete())
      .start()
    input.addData(events: _*)
    query.processAllAvailable()
    val streamed = s.table("hourly").collect().map(_.toSeq).toSet
    query.stop()

    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("dedupStream keeps the first row per content digest") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val input = MemoryStream[Doc]
    val query = Streams.dedupStream(input.toDF(), "text", "ts")
      .writeStream.format("memory").queryName("dedup").outputMode(OutputMode.Append())
      .start()
    input.addData(
      Doc(1, ts(0), "same text"),
      Doc(2, ts(1), "same text"),
      Doc(3, ts(2), "other text"))
    query.processAllAvailable()
    input.addData(Doc(4, ts(3), "same text"), Doc(5, ts(4), "third text"))
    query.processAllAvailable()
    val rows = s.table("dedup").as[Doc].collect()
    query.stop()

    assert(rows.map(_.text).sorted.toSeq === Seq("other text", "same text", "third text"))
    // within a micro-batch the survivor is arbitrary, but the batch-2
    // duplicate (doc 4) must lose to batch-1 state
    assert(Set(1L, 2L).contains(rows.filter(_.text == "same text").map(_.doc_id).head))
  }

  test("dedupStream evicts state past the watermark (bounded state)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val input = MemoryStream[Doc]
    val query = Streams.dedupStream(input.toDF(), "text", "ts")
      .writeStream.format("memory").queryName("dedup_evict").outputMode(OutputMode.Append())
      .start()
    input.addData(Doc(1, ts(100), "evict me"))
    query.processAllAvailable() // watermark → ts(40)
    input.addData(Doc(2, ts(300), "unrelated"))
    query.processAllAvailable() // watermark → ts(240): doc 1's state (expires ts(160)) evicted
    input.addData(Doc(3, ts(310), "evict me"))
    query.processAllAvailable()
    val rows = s.table("dedup_evict").as[Doc].collect()
    query.stop()

    // beyond the watermark the duplicate SURVIVES — the price of
    // bounded state; plain dropDuplicates would have dropped doc 3
    // while growing state forever
    assert(rows.map(_.doc_id).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("runningUserStats accumulates keyed state across batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val input = MemoryStream[UserEvent]
    val query = Streams.runningUserStats(input.toDS())
      .writeStream.format("memory").queryName("userstats").outputMode(OutputMode.Update())
      .start()
    input.addData(UserEvent(1, ts(0), 1.0), UserEvent(1, ts(1), 2.0), UserEvent(2, ts(2), 5.0))
    query.processAllAvailable()
    input.addData(UserEvent(1, ts(3), 4.0))
    query.processAllAvailable()
    val finalStats = s.table("userstats").as[Streams.UserStats].collect()
      .groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.n_events) }
    query.stop()

    assert(finalStats(1L) === Streams.UserStats(1L, 3L, 7.0))
    assert(finalStats(2L) === Streams.UserStats(2L, 1L, 5.0))
  }

  test("sessionize closes sessions on gap and on watermark timeout") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val input = MemoryStream[UserEvent]
    val query = Streams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions").outputMode(OutputMode.Append())
      .start()
    // timestamps must sit above the initial (epoch) watermark or the
    // first rows are dropped as late
    val base = 8640000000L // 100 days in ms
    def bts(minutes: Long) = new Timestamp(base + minutes * 60000L)
    // user 1: two events 10 min apart (one session), then a 2h gap event
    input.addData(UserEvent(1, bts(0), 1.0), UserEvent(1, bts(10), 2.0), UserEvent(2, bts(5), 1.0))
    query.processAllAvailable()
    input.addData(UserEvent(1, bts(130), 3.0))
    query.processAllAvailable()
    // the gap closes user 1's first session explicitly
    val afterGap = s.table("sessions").as[Streams.Session].collect()
    assert(afterGap.exists(se => se.user_id == 1 && se.n_events == 2 &&
      se.start_us == base * 1000 && se.end_us == (base + 10L * 60000) * 1000))
    // advancing the watermark far enough times out user 2's idle session
    input.addData(UserEvent(3, bts(500), 1.0))
    query.processAllAvailable()
    input.addData(UserEvent(3, bts(501), 1.0))
    query.processAllAvailable()
    val all = s.table("sessions").as[Streams.Session].collect()
    query.stop()
    assert(all.exists(se => se.user_id == 2 && se.n_events == 1))
  }

  test("episode file stream aggregates per-broadcast stats") {
    val s = spark
    import s.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-episodes").toString
    Seq(
      ("b1", 100L, Array[Byte](1), "TEXT", "hello"),
      ("b1", 100L, Array[Byte](2), "TEXT", "world"),
      ("b2", 105L, Array[Byte](3), "TEXT", "other"))
      .toDF("broadcast_id", "episode_ts", "node_id", "kind", "payload")
      .write.mode("append").parquet(dir)

    val query = Streams.episodeStats(Streams.readEpisodes(s, dir))
      .writeStream.format("memory").queryName("episodes").outputMode(OutputMode.Complete())
      .start()
    query.processAllAvailable()

    // a later episode arrives as a new file
    Seq(("b1", 110L, Array[Byte](4), "TEXT", "update"))
      .toDF("broadcast_id", "episode_ts", "node_id", "kind", "payload")
      .write.mode("append").parquet(dir)
    query.processAllAvailable()
    val rows = s.table("episodes").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    query.stop()

    assert(rows("b1") === ((3L, 110L)))
    assert(rows("b2") === ((1L, 105L)))
  }

  test("text-analysis kernels run unchanged in a streaming projection") {
    // TextStats/LangHits are stateless scalar expressions, so the same
    // TextAnalysis operators run per micro-batch with no state store —
    // the streaming ingest path gets language ID / quality / token
    // counts for free. Streamed results must equal the batch run.
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val docs = Seq(
      Doc(1, ts(10), "der die das the quick brown fox"),
      Doc(2, ts(11), "le la les et est un pas !!"),
      Doc(3, ts(12), "   "),
      Doc(4, ts(13), "abc123 mixed 42 tokens, two la la"))
    val ops = Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)](
      "lang" -> (df => graft.ops.TextAnalysis.langId(df, "doc_id", "text")),
      "qual" -> (df => graft.ops.TextAnalysis.qualityScore(df, "doc_id", "text")),
      "toks" -> (df => graft.ops.TextAnalysis.tokenCounts(df, "doc_id", "text")))
    ops.foreach { case (name, op) =>
      val batch = op(docs.toDF()).collect().map(_.toSeq).toSet
      val input = MemoryStream[Doc]
      val query = op(input.toDF())
        .writeStream.format("memory").queryName(s"textstats_$name")
        .outputMode(OutputMode.Append())
        .start()
      input.addData(docs: _*)
      query.processAllAvailable()
      val streamed = s.table(s"textstats_$name").collect().map(_.toSeq).toSet
      query.stop()
      assert(streamed === batch, s"operator $name diverged between batch and stream")
      assert(batch.size === 4)
    }
  }
}
