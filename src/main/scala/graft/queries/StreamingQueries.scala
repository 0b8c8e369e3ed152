package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.Tables
import graft.streaming.Streams

/** Oracle-gated STREAMING forms: the driver's events table replayed
  * through the real Structured Streaming path (MemoryStream →
  * watermarked stateful operator → memory sink), hash-compared against
  * DuckDB's batch reconstruction of the same semantics. This pins the
  * streaming operators themselves — watermarks, flatMapGroupsWithState
  * session state, append-mode window finalization — to the oracle, not
  * just their batch twins (q13/q16).
  *
  * Replay protocol: events are fed in global event-time order in
  * `ReplayBatches` micro-batches, so no row is ever late against the
  * watermark (batch N's min ts ≥ batch N-1's max ts ≥ watermark). A
  * final far-future sentinel batch closes every open session (gap rule)
  * and advances the watermark past every real window, so the streamed
  * append-mode output equals the complete batch answer. The driver-side
  * collect is replay harness, not engine: at cluster scale the same
  * operators consume a real source (Kafka/files) partition-parallel.
  */
object StreamingQueries {

  private val ReplayBatches = 16

  /** Typed row for the windowed replay (encoder needs a top-level class). */
  final case class StreamEv(ts: java.sql.Timestamp, event_type: String, value: Double)

  private def sinkName(prefix: String): String =
    prefix + "_" + java.util.UUID.randomUUID().toString.replace("-", "")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Streaming sessionization (30-min gap), replayed to completion:
    // one row per CLOSED session; the sentinel closes each user's last
    // real session and its own never emits (stays in state at stop).
    "q91_stream_sessions" -> ((s, dir) => {
      import s.implicits._
      implicit val ctx = s.sqlContext
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("value"))
        .as[Streams.UserEvent]
        .collect()
        .sortBy(e => Streams.tsMicros(e.ts))
      val input = MemoryStream[Streams.UserEvent]
      val sink = sinkName("q91_sessions")
      val query = Streams.sessionize(input.toDS(), gapMinutes = 30)
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append())
        .start()
      try {
        val chunk = math.max(1, (ev.length + ReplayBatches - 1) / ReplayBatches)
        ev.grouped(chunk).foreach { b =>
          input.addData(b.toIndexedSeq); query.processAllAvailable()
        }
        val maxUs = ev.iterator.map(e => Streams.tsMicros(e.ts)).foldLeft(0L)(math.max)
        val flushTs = new java.sql.Timestamp(maxUs / 1000L + 30L * 86400000L)
        input.addData(ev.map(_.user_id).distinct.toIndexedSeq
          .map(u => Streams.UserEvent(u, flushTs, 0.0)))
        query.processAllAvailable()
      } finally query.stop()
      s.table(sink)
        .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
    }),

    // Streaming tumbling 1-hour windows (2-hour watermark), replayed to
    // completion: append mode emits a window only once the watermark
    // passes its end, so two sentinel batches drive finalization (the
    // first advances the watermark, the second triggers the batch that
    // evicts + emits under it).
    "q92_stream_hourly" -> ((s, dir) => {
      import s.implicits._
      implicit val ctx = s.sqlContext
      val ev = Tables.load(s, dir, "events")
        .select(col("ts"), col("event_type"), col("value"))
        .as[StreamEv]
        .collect()
        .sortBy(e => Streams.tsMicros(e.ts))
      val input = MemoryStream[StreamEv]
      val sink = sinkName("q92_hourly")
      val query = Streams.hourlyEventStats(input.toDF())
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append())
        .start()
      try {
        val chunk = math.max(1, (ev.length + ReplayBatches - 1) / ReplayBatches)
        ev.grouped(chunk).foreach { b =>
          input.addData(b.toIndexedSeq); query.processAllAvailable()
        }
        val maxUs = ev.iterator.map(e => Streams.tsMicros(e.ts)).foldLeft(0L)(math.max)
        def flush(offsetMs: Long): Unit = {
          input.addData(IndexedSeq(
            StreamEv(new java.sql.Timestamp(maxUs / 1000L + offsetMs), "_sentinel", 0.0)))
          query.processAllAvailable()
        }
        flush(30L * 86400000L)
        flush(31L * 86400000L)
      } finally query.stop()
      s.table(sink)
        .filter(col("event_type") =!= "_sentinel")
        .select(col("hour_us"), col("event_type"), col("n_events"),
          col("sum_value").cast("double").as("sum_value"))
    }))

  val oracleSql: Map[String, String] = Map(
    // Batch reconstruction of the streamed sessions: gap>30min starts a
    // session; one row per session with its micro-second bounds.
    "q91_stream_sessions" ->
      """SELECT user_id,
                min(us) AS start_us,
                max(us) AS end_us,
                count(*) AS n_events
         FROM (
           SELECT user_id, us,
                  sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_id
           FROM (
             SELECT user_id, event_id, epoch_us(ts) AS us,
                    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                          OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > 1800000000
                         THEN 1 ELSE 0 END AS new_session
             FROM events))
         GROUP BY user_id, session_id""",

    "q92_stream_hourly" ->
      """SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS hour_us, event_type,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""")
}
