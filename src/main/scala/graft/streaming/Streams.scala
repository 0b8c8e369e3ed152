package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Streaming-shaped operators, written once against the unified
  * DataFrame API so the SAME definition runs as a batch job or a
  * Structured Streaming query (readStream → transform → writeStream).
  *
  * The reference's only streaming semantics are append-only timestamped
  * broadcast episodes with a consumer watermark (SURVEY §2.8) — late
  * data cannot occur there by construction. The generalized operators
  * here add real event-time watermarks for the training-pipeline case.
  */
object Streams {

  /** Tumbling 1-hour event stats (the streaming form of q16): with a
    * 2-hour watermark a streaming run emits finalized windows and
    * bounds state; on a batch frame the watermark is a no-op and the
    * result is identical to the batch query — one definition, two
    * execution modes.
    */
  def hourlyEventStats(events: DataFrame, withWatermark: Boolean = true): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "2 hours") else events
    src
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("hour_us"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  /** Streaming exact dedup: first-seen row per content digest wins;
    * the watermark bounds the dedup state (duplicates farther apart
    * than the watermark may both survive — the standard streaming
    * trade-off, resolved by a periodic batch compaction pass).
    *
    * dropDuplicatesWithinWatermark is what makes that sentence true:
    * plain dropDuplicates only evicts state when the event-time column
    * is part of the dedup keys — keyed on digest alone it would grow
    * state forever and OOM a long-running query.
    */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String): DataFrame =
    docs
      .withColumn("digest", md5(col(textCol)))
      .withWatermark(tsCol, "1 hour")
      .dropDuplicatesWithinWatermark("digest")

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserStats(user_id: Long, n_events: Long, sum_value: Double)

  /** Running per-user stats via explicit state (the
    * mapGroupsWithState form of custom incremental maintenance —
    * the engine's gram-index delta maintenance is the same shape:
    * keyed state + per-batch delta).
    */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(user, 0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          rows.foreach { e => n += 1; s += e.value }
          val next = UserStats(user, n, s)
          state.update(next)
          next
      }
  }

  final case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)
  final case class SessionState(start_us: Long, end_us: Long, n: Long)

  /** Full microsecond value of a Timestamp — `getTime` alone is
    * millisecond-truncated, and the driver's events carry sub-ms
    * micros, so session boundaries computed at ms precision would
    * diverge from the epoch_us() oracle.
    */
  private[graft] def tsMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Event-time sessionization with explicit state
    * (flatMapGroupsWithState + EventTimeTimeout): a session closes when
    * a gap larger than `gapMinutes` arrives for the key, or when the
    * watermark passes the session end + gap (timeout). This is the
    * streaming twin of the batch lag()-window sessionization (q13):
    * same session boundaries, emitted incrementally with bounded state
    * (one open session per active user). All session math runs in
    * MICROSECONDS (the events tables' native precision) so emitted
    * boundaries equal the batch/oracle epoch_us() values bit-for-bit.
    */
  def sessionize(events: Dataset[UserEvent], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start_us, s.end_us, s.n))
          } else {
            var closed = List.empty[Session]
            var cur = state.getOption.orNull
            rows.toSeq.sortBy(e => (tsMicros(e.ts), e.value)).foreach { e =>
              val t = tsMicros(e.ts)
              cur match {
                case null => cur = SessionState(t, t, 1)
                case s if t - s.end_us <= gapUs =>
                  cur = SessionState(s.start_us, math.max(s.end_us, t), s.n + 1)
                case s =>
                  closed ::= Session(user, s.start_us, s.end_us, s.n)
                  cur = SessionState(t, t, 1)
              }
            }
            if (cur != null) {
              state.update(cur)
              // timeout runs on the ms watermark clock; round UP so a
              // timeout never fires before end + gap in micros
              // (ceilDiv is Java 18+; Java 17 spelling)
              state.setTimeoutTimestamp(-Math.floorDiv(-(cur.end_us + gapUs), 1000L))
            }
            closed.reverseIterator
          }
      }
  }

  /** One micro-batch step of STREAMING incremental index maintenance —
    * the foreachBatch body of a streaming reindex query, running the
    * exact batch delta path (GramIndex.gramDiff/applyGramDiff, q69):
    * the write batch holds upserts (doc with text) and deletes (text
    * null); its ids are the dirty set, their standing postings the
    * "before" side, the upserts' fresh postings the "after" side, and
    * the gram diff merges in. State per batch = one dirty-sized
    * shuffle against the standing table — the write path's 100 TB
    * shape, incrementally. StreamingReindexSpec drives it from a
    * MemoryStream and proves the maintained table equals a rebuild.
    */
  def applyWriteBatch(
      standing: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    // One FINAL state per dirty id: micro-batches carry no intra-batch
    // order, so duplicate writes to one id resolve arbitrarily-but-
    // deterministically here (upstreams that need last-write-wins must
    // carry a sequence column). This also upholds postings()' unique-id
    // contract — without it, duplicate upserts would yield duplicate
    // (id, gram) rows and corrupt the keyed diff/merge joins.
    val finalStates = batch.dropDuplicates(idCol)
    val dirtyIds = finalStates.select(col(idCol).as("id")).distinct()
    val beforeDirty = standing.join(dirtyIds, Seq("id"), "left_semi")
    val afterDirty = graft.bulk.GramIndex.postings(
      finalStates.filter(col(textCol).isNotNull), idCol, textCol)
    graft.bulk.GramIndex.applyGramDiff(
      standing, graft.bulk.GramIndex.gramDiff(beforeDirty, afterDirty))
  }

  /** Broadcast-episode ingestion: the hub's object-store layout
    * (`<dir>/<broadcastId>/ep_<ts>.parquet`) consumed as a file-arrival
    * stream — the Spark-native form of fetch_broadcast's episode
    * watermark (new files == episodes newer than last_updated; the
    * source tracks processed files, so the watermark is free).
    * recursiveFileLookup makes the nested per-broadcast directories
    * visible to the file source (the layout is NOT partition-encoded).
    */
  def readEpisodes(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("broadcast_id STRING, episode_ts LONG, node_id BINARY, kind STRING, payload STRING")
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(dir)

  /** One micro-batch of EPISODE rows folded into the standing postings
    * — the episode-sourced twin of [[applyWriteBatch]] (reference: the
    * delta reindex the serving write path runs per mutation,
    * index.rs:768-813, driven by the watermarked episode pulls of
    * index.rs:61-84). Episodes are totally ordered per broadcast by
    * `episode_ts`, so duplicate writes to one node within a batch
    * resolve LAST-WRITE-WINS by (episode_ts, broadcast_id, kind) —
    * unlike raw write batches, which carry no order. TEXT rows upsert
    * their payload (NULL payload = delete), REMOVE rows delete;
    * structural kinds (LIST/STYLED) carry no indexed text and pass
    * through untouched.
    */
  def applyEpisodeBatch(standing: DataFrame, episodes: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("node_id")
      .orderBy(col("episode_ts").desc, col("broadcast_id").desc, col("kind").desc)
    val latest = episodes
      .filter(col("kind").isin("TEXT", "REMOVE"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("node_id").as("id"),
        when(col("kind") === "TEXT", col("payload")).as("text"))
    applyWriteBatch(standing, latest, "id", "text")
  }

  /** Drop a superseded localCheckpoint's cached blocks. localCheckpoint
    * materializes eagerly into the block manager and NOTHING evicts the
    * blocks when the loop-carried variable moves on — without this,
    * every micro-batch retains a full copy of the frame and a
    * long-running stream accumulates O(batches × frame) storage (the
    * quiet OOM at 100 TB stream length). The new checkpoint holds its
    * own blocks, so freeing the predecessor after the successor is
    * materialized is safe. Blocking=false: eviction is cleanup, not a
    * barrier on the batch path.
    */
  private[graft] def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** The live handle of [[maintainIndexFromEpisodes]]: `current` is the
    * postings table as of the last completed micro-batch (each batch is
    * localCheckpoint-materialized, so the plan never grows with stream
    * length — the loop-carried-frame rule; superseded checkpoints are
    * unpersisted so the block store doesn't grow with it either).
    *
    * The CONSUMER WATERMARK (fetch_broadcast's last_updated,
    * assemblage_db/src/broadcasts.rs watermark semantics) is kept PER
    * BROADCAST: episode_ts is only totally ordered within one
    * broadcast's own sequence ([[applyEpisodeBatch]]'s contract), so a
    * single global max could permanently skip another broadcast's
    * not-yet-folded episode whose ts happens to sit below it. The
    * marks map (broadcast_id → highest ts folded) travels with
    * [[persist]]'s manifest, so a RESUMED stream re-reads the episode
    * files fresh (no Spark checkpoint needed) and skips exactly what
    * was already applied — replaying an old episode would REGRESS
    * nodes a newer episode already rewrote, which is why the watermark
    * is state, not an optimization. The map is gate METADATA, bounded
    * by the subscription count, never by stream length.
    */
  final class MaintainedIndex private[streaming] (
      initial: DataFrame,
      initialFloor: Long = Long.MinValue,
      initialMarks: Map[String, Long] = Map.empty) {
    @volatile private var standing: DataFrame = initial.transform(graft.ops.Ckpt.fresh)
    @volatile private var marks: Map[String, Long] = initialMarks
    def current: DataFrame = standing
    /** Highest episode_ts folded across all broadcasts (the reference's
      * last_updated) — reporting only; the RESUME filter uses the
      * per-broadcast [[watermarks]].
      */
    def lastUpdated: Long = (marks.values ++ Iterator(initialFloor)).max
    def watermarks: Map[String, Long] = marks
    private[streaming] def fold(batch: DataFrame): Unit = synchronized {
      val prev = standing
      // one subscription-bounded collect per batch: the per-broadcast
      // watermark advance (the same audited driver-side-scalar shape
      // as the curation gate's token counter)
      val mx = batch.groupBy("broadcast_id")
        .agg(max(col("episode_ts")).as("ts"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      standing = applyEpisodeBatch(prev, batch).transform(graft.ops.Ckpt.fresh)
      marks = mx.foldLeft(marks) { case (m, (bid, ts)) =>
        if (ts > m.getOrElse(bid, Long.MinValue)) m.updated(bid, ts) else m
      }
      // release AFTER publishing the successor: a concurrent `current`
      // reader sees either frame fully materialized (a reader that holds
      // prev across a batch boundary must re-read `current` instead —
      // the usual snapshot contract)
      releaseCheckpoint(prev)
    }

    /** Durably commit (postings, late-subscriber floor, per-broadcast
      * watermarks) as ONE manifest version — see [[DedupGate.persist]]
      * for the contract; [[Streams.resumeMaintainedIndexFromEpisodes]]
      * restarts the stream from it.
      */
    def persist(store: graft.bulk.ManifestStore): Long = synchronized {
      val spark = standing.sparkSession
      val txn = store.begin()
      txn.stage("postings", standing)
      txn.stage("meta",
        spark.range(1).select(lit(initialFloor).as("floor_ts")))
      txn.stage("marks", spark.createDataFrame(
        marks.toSeq.map(p => MaintainedIndexMark(p._1, p._2))))
      txn.commit().fold(throw _, identity)
    }
  }

  /** One (broadcast_id, last_ts) consumer-watermark row of
    * [[MaintainedIndex.persist]]'s `marks` slot.
    */
  final case class MaintainedIndexMark(broadcast_id: String, last_ts: Long)

  /** STREAMING incremental index maintenance over the episode source:
    * `readEpisodes(dir)` → foreachBatch → [[applyEpisodeBatch]]. The
    * maintained postings equal a batch rebuild from the final node
    * states after every processed episode (StreamingReindexSpec proves
    * the invariant end-to-end over real episode files). `sinceTs`
    * reproduces fetch_broadcast's consumer watermark: episodes at or
    * below it are skipped even if their files are new to the source
    * (a late-subscribing consumer whose store already contains them).
    * State per batch = one dirty-sized shuffle against the standing
    * table — the serving write path's shape, at stream cadence; no
    * stateful operator, so no event-time watermark is needed (file
    * tracking dedups arrivals).
    */
  def maintainIndexFromEpisodes(
      spark: SparkSession,
      dir: String,
      initial: DataFrame,
      sinceTs: Long = Long.MinValue,
      sinceBy: Map[String, Long] = Map.empty): (MaintainedIndex, org.apache.spark.sql.streaming.StreamingQuery) = {
    val handle = new MaintainedIndex(initial, sinceTs, sinceBy)
    // Global floor (the late-subscriber cut) AND the per-broadcast
    // consumer watermark: element_at on the map literal is null for an
    // unseen broadcast → MinValue → everything above the floor folds.
    val marksFilter =
      if (sinceBy.isEmpty) lit(true)
      else col("episode_ts") > coalesce(
        element_at(typedLit(sinceBy), col("broadcast_id")), lit(Long.MinValue))
    val query = readEpisodes(spark, dir)
      .filter(col("episode_ts") > sinceTs && marksFilter)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => handle.fold(batch) }
      .start()
    (handle, query)
  }

  /** Resume [[maintainIndexFromEpisodes]] from `store`'s latest
    * committed manifest — the durable restart of the streaming
    * reindex, the reference's reopen-then-catch-up (log replay +
    * fetch watermark). The restarted file stream re-lists everything
    * under `dir` (it is a FRESH query — no Spark checkpoint), and the
    * persisted consumer watermark skips every episode the dead stream
    * already folded; only episodes newer than the manifest replay.
    */
  def resumeMaintainedIndexFromEpisodes(
      spark: SparkSession,
      dir: String,
      store: graft.bulk.ManifestStore): (MaintainedIndex, org.apache.spark.sql.streaming.StreamingQuery) = {
    val postings = store.read("postings").getOrElse(throw new IllegalStateException(
      s"no committed index state in '${store.name}' (missing 'postings' slot)"))
    val floor = store.read("meta").getOrElse(throw new IllegalStateException(
      s"index manifest in '${store.name}' has no 'meta' slot"))
      .head().getAs[Long]("floor_ts")
    val marks = store.read("marks").getOrElse(throw new IllegalStateException(
      s"index manifest in '${store.name}' has no 'marks' slot"))
      .collect().map(r => r.getAs[String]("broadcast_id") -> r.getAs[Long]("last_ts")).toMap
    maintainIndexFromEpisodes(spark, dir, postings, sinceTs = floor, sinceBy = marks)
  }

  /** Loop-carried duplicate-cluster state shared by the ingest gates:
    * append-only base label segments (every doc labeled at first
    * sight) plus a changed-root remap composed per fold and applied
    * lazily at read time; [[compact]] folds the remap into the base at
    * the owning gate's LSM cadence. Maintained only for integral id
    * columns (the min-id canonical labeling is an id-order property);
    * a non-integral-id gate still dedups, it just has no cluster
    * surface. Per-fold cost: one base-label probe (inside
    * deltaRelabel), a delta-bounded contraction, and two
    * broadcast-sized joins. All carried frames are Ckpt.fresh
    * checkpoints — statistics-free, see [[graft.ops.Ckpt]].
    */
  private[streaming] final class ClusterState private (
      initLabels: Option[DataFrame],
      idColInfo: String) {
    val integralIds: Boolean = initLabels.isDefined
    /** Base segments + remap published as ONE immutable snapshot:
      * fold()/compact() mutate both together, and a reader on another
      * thread (clustersNow concurrent with a foreachBatch-driven fold)
      * must never pair a base snapshot with a mismatched or reset
      * remap — two separate volatile fields allowed exactly that
      * transiently inconsistent read (round-8 advice).
      */
    private final case class Snapshot(labelSegs: Vector[DataFrame], rootRemap: Option[DataFrame])
    @volatile private var snap: Snapshot = Snapshot(
      initLabels.fold(Vector.empty[DataFrame])(l =>
        Vector(l.transform(graft.ops.Ckpt.fresh))),
      None)

    /** (doc_id, component_id) over every doc folded so far; the
      * component's min id, exactly as Components.dedupClusters labels
      * a batch rebuild. Read cost: one scan of the base segments + a
      * broadcast remap join.
      *
      * Snapshot contract (as [[MaintainedIndex.current]]): the frame
      * reflects one consistent fold; a reader that holds it across the
      * owning gate's NEXT compaction may touch released checkpoint
      * blocks and must re-read instead.
      */
    def clustersNow: DataFrame = {
      require(integralIds,
        s"cluster maintenance needs an integral id column; $idColInfo")
      val s = snap
      val base = s.labelSegs.reduce(_ unionByName _)
      s.rootRemap.fold(base) { rm =>
        base.join(broadcast(rm), base("component_id") === rm("old_root"), "left")
          .select(base("doc_id"),
            coalesce(col("new_root"), base("component_id")).as("component_id"))
      }
    }

    /** Fold one batch's ids + near-dup edge stream (no-op for
      * non-integral ids). Returns the per-fold scratch checkpoints;
      * the caller releases them once its own state is materialized.
      */
    def fold(batchIds: => DataFrame, edges: => DataFrame): Seq[DataFrame] = {
      if (!integralIds) return Seq.empty
      val d = graft.ops.Components.deltaRelabel(clustersNow, batchIds, edges)
      def sized(df: DataFrame): DataFrame =
        if (d.deltaSmall) broadcast(df) else df
      // First-sight docs only: a re-ingested id already has a base row
      // (knownIds is the delta-bounded membership deltaRelabel probed).
      val newSeg = d.newDocLabels
        .join(sized(d.knownIds.select(col("id").as("doc_id"))),
          Seq("doc_id"), "left_anti")
        .transform(graft.ops.Ckpt.fresh)
      val prev = snap
      val prevRemap = prev.rootRemap
      // d.rootMap is a view over deltaRelabel's scratch (released by
      // the caller after this returns), so the carried remap is always
      // this state's OWN checkpoint.
      val nextRemap =
        if (d.rootMap.isEmpty) prevRemap
        else prevRemap match {
          case None => Some(d.rootMap.transform(graft.ops.Ckpt.fresh))
          case Some(old) =>
            // Compose: stale roots follow their chain through this
            // fold's map; this fold's (current-root) keys are disjoint
            // from the stale keys, so the union is key-unique.
            val step = d.rootMap
              .select(col("old_root").as("o2"), col("new_root").as("n2"))
            val composed = old
              .join(sized(step), old("new_root") === col("o2"), "left")
              .select(old("old_root"),
                coalesce(col("n2"), old("new_root")).as("new_root"))
              .unionByName(d.rootMap)
              .transform(graft.ops.Ckpt.fresh)
            Some(composed)
        }
      snap = Snapshot(prev.labelSegs :+ newSeg, nextRemap)
      // the superseded remap is released only AFTER the new snapshot is
      // published — a concurrent clustersNow reader sees either state
      // fully materialized
      if (nextRemap ne prevRemap) prevRemap.foreach(releaseCheckpoint)
      d.scratch
    }

    /** Fold the remap into the base labels — the label table's LSM
      * compaction; the remap resets to empty.
      */
    def compact(): Unit = if (integralIds) {
      val old = snap
      snap = Snapshot(Vector(clustersNow.transform(graft.ops.Ckpt.fresh)), None)
      old.labelSegs.foreach(releaseCheckpoint)
      old.rootRemap.foreach(releaseCheckpoint)
    }

    /** Drop every carried checkpoint — terminal; the state must not be
      * folded or read after this. For abandoning a gate whose standing
      * state has been persisted (or is no longer needed).
      */
    private[streaming] def release(): Unit = {
      val old = snap
      snap = Snapshot(Vector.empty, None)
      old.labelSegs.foreach(releaseCheckpoint)
      old.rootRemap.foreach(releaseCheckpoint)
    }
  }

  private[streaming] object ClusterState {
    /** Fresh state over an initial corpus: every doc a singleton
      * (non-integral id columns get a stateless no-op instance).
      */
    def apply(initial: DataFrame, idCol: String): ClusterState = {
      val integral = initial.schema(idCol).dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType => true
        case _ => false
      }
      new ClusterState(
        if (integral) Some(initial.select(col(idCol).cast("long").as("doc_id"))
          .withColumn("component_id", col("doc_id"))) else None,
        s"'$idCol' is " + initial.schema(idCol).dataType.simpleString)
    }

    /** State restored from a persisted (doc_id, component_id) label
      * table — the durable-resume path. Restoration is equivalent to a
      * [[ClusterState.compact]]: one base segment, empty remap.
      */
    def restored(labels: Option[DataFrame]): ClusterState =
      new ClusterState(labels, "(restored without a label slot)")
  }

  /** Online ingest dedup gate: the streaming composition of the
    * incremental near-dup check (ops/Dedup.minhashLshDeltaPairsIndexed,
    * q85). Each micro-batch of incoming documents is checked (a)
    * against the standing corpus — delta×standing band joins only —
    * and (b) within itself (the full pipeline on the batch, which is
    * batch-sized); docs flagged either way are rejected, the rest fold
    * into the standing corpus for the next batch. Within a batch the
    * LOWER id of a near-dup pair survives, matching the exact-dedup
    * canonical rule.
    *
    * Scale shape of the loop-carried state (the 100 TB stream
    * contract, measured in BASELINE.md's dedup-gate table):
    *  - The gate carries the corpus's BAND-KEY INDEX
    *    (Dedup.minhashBandKeys rows) alongside the doc rows, so each
    *    batch pays the minhash kernel on the DELTA only — the standing
    *    side enters the candidate join as a columnar index scan, never
    *    a kernel recompute (the persisted-signature-index production
    *    shape; reference analog: the gram postings maintained by delta
    *    fold, assemblage_db/src/index.rs:768-813).
    *  - Corpus and index grow by APPEND-ONLY per-batch segments
    *    (O(delta) checkpoint writes per batch, not an O(corpus)
    *    re-materialization), compacted into one segment every
    *    `compactEvery` folds — LSM shape, so plan width stays
    *    ≤ compactEvery + 1 leaves and amortized write cost per batch
    *    is O(corpus / compactEvery).
    *  - Superseded checkpoints are unpersisted (block-manager usage is
    *    O(corpus), not O(batches × corpus)).
    *  - The rejection log is reject-sized; it stays a single
    *    re-checkpointed frame.
    *  - CLUSTER state (round 8): the gate maintains the full duplicate
    *    clustering — (doc_id, component_id) over every doc ever seen,
    *    accepted or rejected — by the delta-CC fold
    *    (Components.deltaRelabel over the batch's pair stream), the
    *    incremental-maintenance shape the reference's diff-fold index
    *    implies (assemblage_db/src/index.rs:768-813). Base labels are
    *    append-only delta-sized segments; merges accumulate in a
    *    CHANGED-ROOT REMAP (old_root → current_root, merge-history-
    *    sized) composed per batch from two broadcast-sized joins and
    *    applied lazily at read time — so a batch's cluster cost is
    *    O(delta + |remap|), never an O(corpus) label rewrite. The
    *    remap folds into the base segments at the same `compactEvery`
    *    LSM cadence as the corpus/index.
    */
  /** Common surface of the five durable ingest gates (text dedup,
    * embedding dedup, curation, winnowed-substring, band-hash): a
    * synchronous micro-batch fold, an atomic durable commit of the
    * full standing state through [[graft.bulk.ManifestStore]], and a
    * terminal checkpoint release. [[Streams.gateStream]] wires any of
    * them to a Structured Streaming source with periodic durable
    * commits — the production restartable-ingest shape.
    */
  trait IngestGate {
    /** Synchronously fold one micro-batch (the foreachBatch body) —
      * the batch-replay / non-streaming entry point. */
    def ingest(batch: DataFrame): Unit
    /** Durably commit the gate's standing state to `store` as ONE
      * manifest-CAS version; returns the committed version. */
    def persist(store: graft.bulk.ManifestStore): Long
    /** Drop every carried checkpoint — terminal. */
    def release(): Unit
  }

  final class DedupGate private[graft] (
      initial: DataFrame,
      idCol: String,
      textCol: String,
      k: Int, numPerm: Int, bands: Int, num: Int, den: Int,
      compactEvery: Int = 8,
      restored: Option[Streams.DedupGateState] = None) extends IngestGate {
    require(compactEvery >= 1, "compactEvery must be >= 1")
    // newest-last segment lists; every element is localCheckpoint-
    // materialized so no segment's plan depends on another
    @volatile private var corpusSegs: Vector[DataFrame] =
      Vector(initial.transform(graft.ops.Ckpt.fresh))
    @volatile private var indexSegs: Vector[DataFrame] =
      Vector(restored.map(_.index).getOrElse(graft.ops.Dedup.minhashBandKeys(
        initial, idCol, textCol, k, numPerm, bands)).transform(graft.ops.Ckpt.fresh))
    @volatile private var rejectedLog: Option[DataFrame] =
      restored.flatMap(_.rejected).map(_.transform(graft.ops.Ckpt.fresh))
    // Cluster state: the initial corpus seeds as singletons — the gate
    // clusters what it SEES; pre-existing standing labels can be
    // folded in upfront via Components.dedupClustersDelta. On resume,
    // the persisted label table restores directly (restore ≡ compact).
    private val clusterState = restored.fold(ClusterState(initial, idCol))(
      st => ClusterState.restored(st.labels))
    private var foldsSinceCompact = 0

    private def unionAll(segs: Vector[DataFrame]): DataFrame =
      segs.reduce(_ unionByName _)
    def corpusNow: DataFrame = unionAll(corpusSegs)
    /** (doc_id, component_id) over EVERY doc the gate has ever seen —
      * accepted and rejected — maintained by the per-batch delta-CC
      * fold; component_id is the component's min doc id, exactly as
      * [[graft.ops.Components.dedupClusters]] labels a batch rebuild
      * (DedupGateSpec pins the equivalence per batch).
      */
    def clustersNow: DataFrame = clusterState.clustersNow
    /** The standing band-key index (id, band, key) as of the last
      * completed batch — the gate's persisted-signature-index twin.
      */
    def indexNow: DataFrame = unionAll(indexSegs)
    /** (id, reason) rows for every rejected doc so far (before the
      * first batch: an empty bigint-id frame).
      */
    def rejected: DataFrame = rejectedLog.getOrElse(
      corpusSegs.head.sparkSession.emptyDataFrame
        .select(lit(0L).as("id"), lit("").as("reason")).limit(0))

    /** Synchronously fold one micro-batch (the foreachBatch body) —
      * the batch-replay / non-streaming entry point.
      */
    def ingest(batch: DataFrame): Unit = fold(batch)

    /** Durably commit the gate's standing state to `store` as ONE
      * manifest version (corpus + band-key index + rejection log +
      * cluster labels): the manifest CAS makes the commit atomic —
      * a crash anywhere before it leaves the previous version intact,
      * exactly the reference store's log-replay durability contract
      * (assemblage_kv/src/lib.rs:602-652). [[Streams.resumeDedupGate]]
      * reconstructs a live gate from the committed version; the
      * restored gate's decisions are fold-for-fold identical to the
      * uninterrupted gate's (GatePersistenceSpec + the q104 restart
      * leg), because a restore is equivalent to an LSM compaction —
      * which the replay oracles already prove semantics-preserving.
      * Returns the committed version.
      */
    def persist(store: graft.bulk.ManifestStore): Long = synchronized {
      val txn = store.begin()
      txn.stage("corpus", corpusNow)
      txn.stage("index", indexNow)
      rejectedLog.foreach(r => txn.stage("rejected", r))
      if (clusterState.integralIds) txn.stage("labels", clustersNow)
      txn.commit().fold(throw _, identity)
    }

    /** Drop every carried checkpoint — terminal; the gate must not be
      * used after this. For abandoning a gate whose state was just
      * persisted (the restart legs) or is no longer needed — without
      * it the orphaned blocks pin block-manager memory for the rest
      * of the session.
      */
    def release(): Unit = synchronized {
      (corpusSegs ++ indexSegs).foreach(releaseCheckpoint)
      rejectedLog.foreach(releaseCheckpoint)
      corpusSegs = Vector.empty
      indexSegs = Vector.empty
      rejectedLog = None
      clusterState.release()
    }

    private[graft] def fold(batch: DataFrame): Unit = synchronized {
      import graft.ops.Dedup
      // the micro-batch frame lives on a CLONED session whose function
      // registry was snapshot before any kernel registration on the
      // main session — register there explicitly
      graft.functions.DedupKernels.ensureRegistered(batch.sparkSession)
      // broadcastDelta: a micro-batch's band keys broadcast against the
      // standing index/corpus, which stay pure probe-side scans — the
      // standing state is never shuffled, per batch, at any corpus size
      // (checkpointed: each pair frame feeds both the rejection flags
      // and the cluster fold's edge stream)
      val vsPairs = Dedup.minhashLshDeltaPairsIndexed(
          indexNow, corpusNow, batch, idCol, textCol, k, numPerm, bands, num, den,
          broadcastDelta = true)
        .transform(graft.ops.Ckpt.fresh)
      val withinPairs = Dedup.minhashLshPairsNative(
          batch, idCol, textCol, k, numPerm, bands, num, den)
        .transform(graft.ops.Ckpt.fresh)
      val vsStanding = vsPairs
        .select(col("delta_id").as("id"), lit("near-dup of corpus").as("reason"))
      val within = withinPairs
        .select(greatest(col("id_a"), col("id_b")).as("id"),
          lit("near-dup within batch").as("reason"))
      val flagged = vsStanding.unionByName(within)
        .groupBy("id").agg(min(col("reason")).as("reason"))
        .transform(graft.ops.Ckpt.fresh)
      val prevLog = rejectedLog
      rejectedLog = Some(prevLog
        .fold(flagged)(_ unionByName flagged).transform(graft.ops.Ckpt.fresh))
      val clean = batch.join(flagged, batch(idCol) === flagged("id"), "left_anti")
        .select(corpusSegs.head.columns.map(col): _*)
        .transform(graft.ops.Ckpt.fresh)
      // the clean segment's index rows: the batch's band keys restricted
      // to admitted ids — delta-sized, no extra kernel pass
      val cleanIndex = Dedup.minhashBandKeys(
          clean, idCol, textCol, k, numPerm, bands)
        .transform(graft.ops.Ckpt.fresh)
      corpusSegs = corpusSegs :+ clean
      indexSegs = indexSegs :+ cleanIndex
      // Cluster maintenance: fold the batch's full pair stream (both
      // rejected and surviving docs are cluster members) into the
      // standing labels via delta-CC (see [[ClusterState]]).
      val foldScratch = clusterState.fold(
        batch.select(col(idCol).cast("long").as("id")),
        vsPairs.select(col("delta_id").as("id_a"), col("corpus_id").as("id_b"))
          .unionByName(withinPairs.select(col("id_a"), col("id_b"))))
      foldsSinceCompact += 1
      if (foldsSinceCompact >= compactEvery) {
        val (oldCorpus, oldIndex) = (corpusSegs, indexSegs)
        corpusSegs = Vector(unionAll(oldCorpus).transform(graft.ops.Ckpt.fresh))
        indexSegs = Vector(unionAll(oldIndex).transform(graft.ops.Ckpt.fresh))
        clusterState.compact()
        foldsSinceCompact = 0
        oldCorpus.foreach(releaseCheckpoint)
        oldIndex.foreach(releaseCheckpoint)
      }
      // free superseded checkpoints: without this every batch pins a
      // full log copy (and pre-compaction, corpus copies) in the block
      // manager — O(batches×corpus) storage growth on a long-running
      // gate. The successors above are already materialized.
      prevLog.foreach(releaseCheckpoint)
      releaseCheckpoint(flagged)
      releaseCheckpoint(vsPairs)
      releaseCheckpoint(withinPairs)
      foldScratch.foreach(releaseCheckpoint)
    }
  }

  /** Construct a standalone [[DedupGate]] (batch replay / measurement
    * use — `ingest` folds one micro-batch synchronously).
    */
  def newDedupGate(
      initialCorpus: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3, numPerm: Int = 64, bands: Int = 16,
      num: Int = 1, den: Int = 2, compactEvery: Int = 8): DedupGate =
    new DedupGate(initialCorpus, idCol, textCol, k, numPerm, bands, num, den, compactEvery)

  /** Restored standing state of a [[DedupGate]] (the non-corpus slots
    * of [[DedupGate.persist]]'s manifest; `labels` is None for gates
    * over non-integral id columns, `rejected` before the first fold).
    */
  private[graft] final case class DedupGateState(
      index: DataFrame,
      rejected: Option[DataFrame],
      labels: Option[DataFrame])

  /** Resume a [[DedupGate]] from `store`'s latest committed manifest
    * (the durable twin of [[newDedupGate]]): standing corpus, band-key
    * index, rejection log, and cluster labels reload from the
    * versioned slots; the minhash kernel is NOT re-run over the
    * corpus. `foldsSinceCompact` restarts at 0 — a restore IS a
    * compaction (one segment per table, remap folded in), which the
    * gate replays prove semantics-preserving. The k/numPerm/bands/
    * num/den parameters must match the persisting gate's — they are
    * pipeline configuration, not state (a mismatch would probe the
    * index with incompatible band keys).
    */
  def resumeDedupGate(
      store: graft.bulk.ManifestStore,
      idCol: String,
      textCol: String,
      k: Int = 3, numPerm: Int = 64, bands: Int = 16,
      num: Int = 1, den: Int = 2, compactEvery: Int = 8): DedupGate = {
    val corpus = store.read("corpus").getOrElse(throw new IllegalStateException(
      s"no committed dedup-gate state in '${store.name}' (missing 'corpus' slot)"))
    val index = store.read("index").getOrElse(throw new IllegalStateException(
      s"dedup-gate manifest in '${store.name}' has no 'index' slot"))
    new DedupGate(corpus, idCol, textCol, k, numPerm, bands, num, den, compactEvery,
      restored = Some(DedupGateState(index, store.read("rejected"), store.read("labels"))))
  }

  /** Online EMBEDDING ingest dedup gate — the vector-modality twin of
    * [[DedupGate]]: each micro-batch of (id, vector) rows is checked
    * against the standing corpus via the LSH bucket join
    * (Similarity.cosinePairsLshIndexed — delta broadcast, standing
    * index a pure probe scan) and within itself; flagged rows are
    * rejected (lower id survives within a batch), clean rows fold
    * forward. Loop state is the SIGNATURE INDEX itself
    * (Similarity.cosineLshIndex rows: id, packed vector, norm,
    * bucket) in append-only compacted segments — self-contained, so
    * no raw-vector lookback is ever needed.
    *
    * Auto-B over a GROWING corpus: a fixed plane count B degrades as
    * buckets fill (Θ(n²/2^B) candidates), but changing B invalidates
    * every carried signature. The gate resolves the tension the LSM
    * way: when `autoPlanes(count)` exceeds the index's B it REBUILDS
    * the index at the new B from the carried packed vectors — an
    * O(corpus) pass that happens O(log n) times over a stream's life,
    * so the amortized per-batch cost stays O(delta) while bucket
    * population stays bounded forever.
    *
    * Cluster state (round 8): like [[DedupGate]], the gate maintains
    * the full duplicate clustering over every vector seen via the
    * per-batch delta-CC fold (Components.deltaRelabel) — append-only
    * label segments + a changed-root remap, compacted whenever the
    * index compacts OR resigns. Oracle-gated end-to-end by q105.
    */
  final class EmbeddingDedupGate private[graft] (
      initial: DataFrame,
      idCol: String, vecCol: String,
      dim: Int, threshold: Double, targetBucket: Long,
      compactEvery: Int = 8,
      restored: Option[Streams.EmbeddingGateState] = None) extends IngestGate {
    import graft.ops.Similarity
    require(compactEvery >= 1, "compactEvery must be >= 1")
    @volatile private var planes: Int =
      restored.map(_.planes).getOrElse(
        Similarity.autoPlanes(initial.count(), targetBucket))
    @volatile private var indexSegs: Vector[DataFrame] =
      Vector(restored.map(_.index).getOrElse(
        Similarity.cosineLshIndex(initial, idCol, vecCol, dim, planes))
        .transform(graft.ops.Ckpt.fresh))
    @volatile private var count: Long = indexSegs.head.count()
    @volatile private var rejectedLog: Option[DataFrame] =
      restored.flatMap(_.rejected).map(_.transform(graft.ops.Ckpt.fresh))
    // Cluster state — the same delta-CC fold as the text gate
    // (shared [[ClusterState]] machinery; labels compact with the
    // index, including across auto-B resigns). On resume, the
    // persisted label table restores directly (restore ≡ compact).
    private val clusterState = restored.fold(ClusterState(initial, idCol))(
      st => ClusterState.restored(st.labels))
    private var foldsSinceCompact = 0

    private def unionAll(segs: Vector[DataFrame]): DataFrame =
      segs.reduce(_ unionByName _)
    /** The standing signature index (id, pv, nrm, bucket) at the
      * current plane count. */
    def indexNow: DataFrame = unionAll(indexSegs)
    def numPlanes: Int = planes
    def corpusCount: Long = count
    def rejected: DataFrame = rejectedLog.getOrElse(
      indexSegs.head.sparkSession.emptyDataFrame
        .select(lit(0L).as("id"), lit("").as("reason")).limit(0))

    /** (doc_id, component_id) over every vector the gate has ever
      * seen — accepted and rejected — maintained by the per-batch
      * delta-CC fold, exactly as [[DedupGate.clustersNow]].
      */
    def clustersNow: DataFrame = clusterState.clustersNow

    /** Synchronously fold one micro-batch of (id, vector) rows. */
    def ingest(batch: DataFrame): Unit = fold(batch)

    /** Durably commit the gate's standing state (signature index —
      * self-contained, packed vectors included — plus plane count,
      * rejection log, cluster labels) as ONE manifest version; see
      * [[DedupGate.persist]] for the contract.
      * [[Streams.resumeEmbeddingDedupGate]] reconstructs a live gate;
      * the carried plane count rides a 1-row `meta` slot so a resumed
      * gate probes with the exact signatures the index was built at
      * (auto-B resigns after resume work unchanged — the packed
      * vectors travel with the index).
      */
    def persist(store: graft.bulk.ManifestStore): Long = synchronized {
      val spark = indexSegs.head.sparkSession
      val txn = store.begin()
      txn.stage("index", indexNow)
      txn.stage("meta", spark.range(1).select(lit(planes).as("planes")))
      rejectedLog.foreach(r => txn.stage("rejected", r))
      if (clusterState.integralIds) txn.stage("labels", clustersNow)
      txn.commit().fold(throw _, identity)
    }

    /** Drop every carried checkpoint — terminal; see
      * [[DedupGate.release]]. */
    def release(): Unit = synchronized {
      indexSegs.foreach(releaseCheckpoint)
      rejectedLog.foreach(releaseCheckpoint)
      indexSegs = Vector.empty
      rejectedLog = None
      clusterState.release()
    }

    private[graft] def fold(batch: DataFrame): Unit = synchronized {
      val vsPairs = Similarity.cosinePairsLshIndexed(
          indexNow, batch, idCol, vecCol, dim, planes, threshold)
        .transform(graft.ops.Ckpt.fresh)
      val withinPairs = Similarity.cosinePairsLsh(
          batch, idCol, vecCol, dim, planes, threshold)
        .transform(graft.ops.Ckpt.fresh)
      val vsStanding = vsPairs
        .select(col("delta_id").as("id"), lit("near-dup of corpus").as("reason"))
      val within = withinPairs
        .select(greatest(col("id_a"), col("id_b")).as("id"),
          lit("near-dup within batch").as("reason"))
      val flagged = vsStanding.unionByName(within)
        .groupBy("id").agg(min(col("reason")).as("reason"))
        .transform(graft.ops.Ckpt.fresh)
      val prevLog = rejectedLog
      rejectedLog = Some(prevLog
        .fold(flagged)(_ unionByName flagged).transform(graft.ops.Ckpt.fresh))
      val clean = batch.join(flagged, batch(idCol) === flagged("id"), "left_anti")
      val cleanIdx = Similarity.cosineLshIndex(clean, idCol, vecCol, dim, planes)
        .transform(graft.ops.Ckpt.fresh)
      indexSegs = indexSegs :+ cleanIdx
      count += cleanIdx.count()
      // Cluster maintenance — identical shape to DedupGate.fold: the
      // batch's full pair stream folds into standing labels via
      // delta-CC (shared [[ClusterState]]); rejected vectors are
      // cluster members too.
      val foldScratch = clusterState.fold(
        batch.select(col(idCol).cast("long").as("id")),
        vsPairs.select(col("delta_id").as("id_a"), col("corpus_id").as("id_b"))
          .unionByName(withinPairs.select(col("id_a"), col("id_b"))))
      foldsSinceCompact += 1
      val wantPlanes = Similarity.autoPlanes(count, targetBucket)
      if (wantPlanes > planes) {
        // amortized re-signature at the new B: unpack the carried
        // vectors (pv is the exact quantization input), re-bucket
        val resigned = Similarity.resignIndex(unionAll(indexSegs), dim, wantPlanes)
          .transform(graft.ops.Ckpt.fresh)
        val old = indexSegs
        indexSegs = Vector(resigned)
        planes = wantPlanes
        foldsSinceCompact = 0
        old.foreach(releaseCheckpoint)
        clusterState.compact()
      } else if (foldsSinceCompact >= compactEvery) {
        val old = indexSegs
        indexSegs = Vector(unionAll(old).transform(graft.ops.Ckpt.fresh))
        foldsSinceCompact = 0
        old.foreach(releaseCheckpoint)
        clusterState.compact()
      }
      prevLog.foreach(releaseCheckpoint)
      releaseCheckpoint(flagged)
      releaseCheckpoint(vsPairs)
      releaseCheckpoint(withinPairs)
      foldScratch.foreach(releaseCheckpoint)
    }
  }

  /** Construct a standalone [[EmbeddingDedupGate]]. */
  def newEmbeddingDedupGate(
      initialCorpus: DataFrame,
      idCol: String, vecCol: String,
      dim: Int, threshold: Double,
      targetBucket: Long = graft.ops.Similarity.LshTargetBucket,
      compactEvery: Int = 8): EmbeddingDedupGate =
    new EmbeddingDedupGate(initialCorpus, idCol, vecCol, dim, threshold, targetBucket, compactEvery)

  /** Restored standing state of an [[EmbeddingDedupGate]]. */
  private[graft] final case class EmbeddingGateState(
      index: DataFrame,
      planes: Int,
      rejected: Option[DataFrame],
      labels: Option[DataFrame])

  /** Resume an [[EmbeddingDedupGate]] from `store`'s latest committed
    * manifest — the durable twin of [[newEmbeddingDedupGate]]. The
    * signature index is self-contained (packed vectors + norms +
    * buckets), so nothing is recomputed; the corpus count (the auto-B
    * input) is the index's row count by construction.
    */
  def resumeEmbeddingDedupGate(
      store: graft.bulk.ManifestStore,
      idCol: String, vecCol: String,
      dim: Int, threshold: Double,
      targetBucket: Long = graft.ops.Similarity.LshTargetBucket,
      compactEvery: Int = 8): EmbeddingDedupGate = {
    val index = store.read("index").getOrElse(throw new IllegalStateException(
      s"no committed embedding-gate state in '${store.name}' (missing 'index' slot)"))
    val planes = store.read("meta").getOrElse(throw new IllegalStateException(
      s"embedding-gate manifest in '${store.name}' has no 'meta' slot"))
      .head().getAs[Int]("planes")
    new EmbeddingDedupGate(
      index.select(col("id").as(idCol)), idCol, vecCol, dim, threshold, targetBucket,
      compactEvery,
      restored = Some(EmbeddingGateState(
        index, planes, store.read("rejected"), store.read("labels"))))
  }

  /** Run [[EmbeddingDedupGate]] over a streaming frame via
    * foreachBatch. Returns the live gate handle + the query.
    */
  def embeddingDedupGateStream(
      vectors: DataFrame,
      initialCorpus: DataFrame,
      idCol: String, vecCol: String,
      dim: Int, threshold: Double): (EmbeddingDedupGate, org.apache.spark.sql.streaming.StreamingQuery) = {
    val gate = newEmbeddingDedupGate(initialCorpus, idCol, vecCol, dim, threshold)
    (gate, gateStream(gate, vectors))
  }

  /** Online CURATION gate — the stateful streaming form of
    * Curation.curationPipelineDelta (q111) and the pipeline a training
    * run actually ingests through: each micro-batch of documents is
    * exact-deduped against every digest EVER SEEN (carried digest
    * index; within a batch the lower id wins), quality-filtered
    * (Gopher rules), decontaminated against the broadcast eval
    * vocabulary, split, and its kept train docs are APPENDED to the
    * shard stream continuing from the carried train-token total.
    * Decisions are immutable once emitted — shards already written
    * never re-pack, the append-stream contract.
    *
    * Carried state (the 100 TB shape):
    *  - the digest index: append-only DISTINCT-digest segments,
    *    compacted every `compactEvery` folds (LSM, as the dedup gate);
    *    the per-batch check is a broadcast-delta semi probe — the
    *    standing side never shuffles;
    *  - ONE scalar: the cumulative kept-train token total;
    *  - the decision log: delta-sized append-only segments of
    *    (doc_id, batch, status, split, shard_id, offset_tokens).
    * Per-batch cost is O(delta + digest-index scan); q114 replays
    * three folds and hash-matches every decision and shard offset
    * against a DuckDB fold-forward reconstruction.
    */
  /** MinHash-LSH configuration of [[CurationGate]]'s optional near-dup
    * stage — the q85 kernel's parameters (shingle k, permutations,
    * bands, jaccard threshold num/den).
    */
  final case class NearDupParams(
      k: Int = 3, numPerm: Int = 64, bands: Int = 16, num: Int = 1, den: Int = 2)

  final class CurationGate private[graft] (
      initialDigests: DataFrame,
      initialTrainTokens: Long,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      tokensPerShard: Long,
      compactEvery: Int = 8,
      restoredDecisions: Option[DataFrame] = None,
      initialBatchIdx: Long = 0L,
      nearDup: Option[NearDupParams] = None,
      initialRepCorpus: Option[DataFrame] = None,
      restoredRepIndex: Option[DataFrame] = None,
      tokenizer: String = "ws") extends IngestGate {
    require(compactEvery >= 1, "compactEvery must be >= 1")
    require(nearDup.isEmpty || initialRepCorpus.isDefined,
      "a near-dup-enabled gate needs the standing rep corpus (doc_id, text)")
    @volatile private var digestSegs: Vector[DataFrame] =
      Vector(initialDigests.select(col("digest")).distinct()
        .transform(graft.ops.Ckpt.fresh))
    @volatile private var trainTokens: Long = initialTrainTokens
    @volatile private var decisionSegs: Vector[DataFrame] =
      restoredDecisions.map(d => Vector(d.transform(graft.ops.Ckpt.fresh)))
        .getOrElse(Vector.empty)
    // Near-dup stage state (round-9, verdict task 2): the standing
    // REP corpus — one (doc_id, text) row per distinct-content
    // representative ever ingested (every doc not rejected as
    // duplicate/near-dup, regardless of its quality/contamination
    // outcome: its content is decided, so later near-copies are
    // rejected, mirroring the carried-digest rule) — plus its
    // band-key index, both in LSM segments exactly as [[DedupGate]]
    // carries them. Empty vectors when the stage is off.
    @volatile private var repSegs: Vector[DataFrame] =
      if (nearDup.isEmpty) Vector.empty
      else Vector(initialRepCorpus.get.transform(graft.ops.Ckpt.fresh))
    @volatile private var repIdxSegs: Vector[DataFrame] =
      nearDup.fold(Vector.empty[DataFrame]) { p =>
        Vector(restoredRepIndex.getOrElse(graft.ops.Dedup.minhashBandKeys(
            initialRepCorpus.get, "doc_id", "text", p.k, p.numPerm, p.bands))
          .transform(graft.ops.Ckpt.fresh))
      }
    // The eval set is immutable gate state: shingle its vocabulary
    // ONCE at construction instead of re-running the eval-side kernel
    // every micro-batch.
    private val evalVocab: DataFrame =
      graft.ops.Curation.evalShingleVocab(
        evalSet.select(col(idCol).as("doc_id"), col(textCol).as("text")),
        "doc_id", "text", k = 3)
      .transform(graft.ops.Ckpt.fresh)
    private var foldsSinceCompact = 0
    private var batchIdx = initialBatchIdx

    def digestsNow: DataFrame = digestSegs.reduce(_ unionByName _)
    def trainTokensNow: Long = trainTokens
    /** The standing near-dup rep corpus (doc_id, text); only when the
      * near-dup stage is enabled. */
    def repCorpusNow: DataFrame = {
      require(nearDup.isDefined, "the near-dup stage is not enabled on this gate")
      repSegs.reduce(_ unionByName _)
    }
    private def repIdxNow: DataFrame = repIdxSegs.reduce(_ unionByName _)
    /** Every decision emitted so far (empty frame before the first
      * fold): (doc_id, batch, status, split, shard_id, offset_tokens).
      */
    def decisions: DataFrame = decisionSegs match {
      case segs if segs.nonEmpty => segs.reduce(_ unionByName _)
      case _ => digestSegs.head.sparkSession.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0L).as("batch"),
          lit("").as("status"), lit("").as("split"),
          lit(-1L).as("shard_id"), lit(-1L).as("offset_tokens"))
        .limit(0)
    }

    /** Synchronously fold one micro-batch (the foreachBatch body). */
    def ingest(batch: DataFrame): Unit = fold(batch)

    /** Durably commit the gate's standing state (digest index +
      * decision log + the train-token/batch counters in a 1-row `meta`
      * slot) as ONE manifest version; see [[DedupGate.persist]] for
      * the contract. The eval set is configuration, not state — the
      * resume constructor re-shingles it once, as the live constructor
      * does.
      */
    def persist(store: graft.bulk.ManifestStore): Long = synchronized {
      val spark = digestSegs.head.sparkSession
      val txn = store.begin()
      txn.stage("digests", digestsNow)
      if (decisionSegs.nonEmpty) txn.stage("decisions", decisions)
      if (nearDup.isDefined) {
        txn.stage("corpus", repCorpusNow)
        txn.stage("bandindex", repIdxNow)
      }
      // the tokenizer RIDES the manifest: the carried train-token
      // counter is denominated in its units, and a resume under a
      // different tokenizer would silently mix units in the shard
      // arithmetic — resumeCurationGate validates the match.
      txn.stage("meta", spark.range(1).select(
        lit(trainTokens).as("train_tokens"), lit(batchIdx).as("batch_idx"),
        lit(tokenizer).as("tokenizer")))
      txn.commit().fold(throw _, identity)
    }

    /** Drop every carried checkpoint (digests, decisions, rep corpus +
      * band index, eval vocabulary) — terminal; see
      * [[DedupGate.release]]. */
    def release(): Unit = synchronized {
      (digestSegs ++ decisionSegs ++ repSegs ++ repIdxSegs).foreach(releaseCheckpoint)
      digestSegs = Vector.empty
      decisionSegs = Vector.empty
      repSegs = Vector.empty
      repIdxSegs = Vector.empty
      releaseCheckpoint(evalVocab)
    }

    private[graft] def fold(batch: DataFrame): Unit = synchronized {
      import graft.ops.{Curation, Dedup, TextAnalysis}
      graft.functions.TextStatsFns.ensureRegistered(batch.sparkSession)
      graft.functions.DedupKernels.ensureRegistered(batch.sparkSession)
      batchIdx += 1
      val b = batch.select(col(idCol).cast("long").as("doc_id"),
          col(textCol).as("text"))
        .withColumn("digest", md5(col("text")))
        .transform(graft.ops.Ckpt.fresh)
      // dedup: carried digests win; within the batch the min id per
      // digest survives (broadcast-delta probe of the standing index)
      val seen = digestsNow
        .join(broadcast(b.select("digest").distinct()), Seq("digest"), "left_semi")
        .transform(graft.ops.Ckpt.fresh)
      val wDig = org.apache.spark.sql.expressions.Window
        .partitionBy("digest").orderBy("doc_id")
      val withDup = b
        .join(broadcast(seen.withColumn("seen", lit(true))), Seq("digest"), "left")
        .withColumn("rn", row_number().over(wDig))
        .withColumn("dup", coalesce(col("seen"), lit(false)) || col("rn") > 1)
      // Near-dup stage (when enabled): exact-canonical batch reps
      // (non-duplicates) checked against the standing rep corpus via
      // the q85 delta band join (broadcast delta, standing index a
      // pure probe scan) and within themselves (higher id of a pair
      // flagged, as DedupGate); unflagged reps fold into the rep
      // corpus + band index. Precedence: an exact duplicate is never
      // re-labeled near-dup (the kernel only sees non-duplicates).
      var ndScratch = List.empty[DataFrame]
      val ndFlagOpt: Option[DataFrame] = nearDup.map { p =>
        val nodup = withDup.filter(!col("dup")).select(col("doc_id"), col("text"))
          .transform(graft.ops.Ckpt.fresh)
        val vs = Dedup.minhashLshDeltaPairsIndexed(
            repIdxNow, repCorpusNow, nodup, "doc_id", "text",
            p.k, p.numPerm, p.bands, p.num, p.den, broadcastDelta = true)
          .transform(graft.ops.Ckpt.fresh)
        val within = Dedup.minhashLshPairsNative(
            nodup, "doc_id", "text", p.k, p.numPerm, p.bands, p.num, p.den)
          .transform(graft.ops.Ckpt.fresh)
        val flagged = vs.select(col("delta_id").as("doc_id"))
          .unionByName(within.select(greatest(col("id_a"), col("id_b")).as("doc_id")))
          .distinct()
          .transform(graft.ops.Ckpt.fresh)
        val newReps = nodup.join(flagged, Seq("doc_id"), "left_anti")
          .transform(graft.ops.Ckpt.fresh)
        val newIdx = Dedup.minhashBandKeys(
            newReps, "doc_id", "text", p.k, p.numPerm, p.bands)
          .transform(graft.ops.Ckpt.fresh)
        repSegs = repSegs :+ newReps
        repIdxSegs = repIdxSegs :+ newIdx
        ndScratch = List(nodup, vs, within)
        flagged
      }
      val withNd = ndFlagOpt.fold(withDup.withColumn("ndup", lit(false))) { f =>
        withDup
          .join(broadcast(f.withColumn("nd_hit", lit(true))), Seq("doc_id"), "left")
          .withColumn("ndup", coalesce(col("nd_hit"), lit(false)))
      }
      val quality = TextAnalysis.gopherRules(b, "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      val contaminated = Curation.decontaminateWithVocab(
          b, evalVocab, "doc_id", "text", k = 3)
        .select(col("doc_id"), col("contaminated"))
      val judged = withNd
        .join(quality, Seq("doc_id"))
        .join(contaminated, Seq("doc_id"))
        .withColumn("status",
          when(col("dup"), "duplicate")
            .when(col("ndup"), "near-dup")
            .when(!col("keep"), "quality")
            .when(col("contaminated"), "contaminated")
            .otherwise("ok"))
        .withColumn("split",
          when(col("status") =!= "ok", lit("none"))
            .otherwise(Curation.splitColumn(col("text"))))
        .transform(graft.ops.Ckpt.fresh)
      // shard append for kept train docs, continuing from the counter;
      // shardPack already tokenizes each doc, so its output ALSO feeds
      // the counter advance — one kernel pass, not two.
      val (packRaw, packScratch) = Curation.shardPackWithScratch(
        judged.filter(col("split") === "train"), "doc_id", "text", tokensPerShard,
        tokenizer)
      val packed = packRaw
        .select(col("doc_id"), col("n_tokens"),
          (col("shard_id") * tokensPerShard + col("offset_tokens") +
            lit(trainTokens)).as("cum"))
        .select(col("doc_id"), col("n_tokens"),
          expr(s"cum div $tokensPerShard").as("shard_id"),
          expr(s"cum % $tokensPerShard").as("offset_tokens"))
        .transform(graft.ops.Ckpt.fresh)
      val decisionSeg = judged
        .join(packed.drop("n_tokens"), Seq("doc_id"), "left")
        .select(col("doc_id"), lit(batchIdx).as("batch"), col("status"), col("split"),
          coalesce(col("shard_id"), lit(-1L)).as("shard_id"),
          coalesce(col("offset_tokens"), lit(-1L)).as("offset_tokens"))
        .transform(graft.ops.Ckpt.fresh)
      decisionSegs = decisionSegs :+ decisionSeg
      trainTokens += packed
        .agg(coalesce(sum("n_tokens"), lit(0L)).cast("long")).head().getLong(0)
      // every ingested doc's digest folds forward (a later identical
      // doc is a duplicate even if this one was quality-rejected —
      // its decision is already made)
      val newDigests = b.select("digest").distinct()
        .join(broadcast(seen), Seq("digest"), "left_anti")
        .transform(graft.ops.Ckpt.fresh)
      digestSegs = digestSegs :+ newDigests
      foldsSinceCompact += 1
      if (foldsSinceCompact >= compactEvery) {
        // Digest index AND decision log compact on the same LSM
        // cadence: without the latter, decisions' plan grows one leaf
        // per fold for the stream's whole life. The near-dup rep
        // corpus + band index (when enabled) ride the same cadence.
        val (oldDig, oldDec) = (digestSegs, decisionSegs)
        digestSegs = Vector(digestsNow.transform(graft.ops.Ckpt.fresh))
        decisionSegs = Vector(decisions.transform(graft.ops.Ckpt.fresh))
        if (nearDup.isDefined) {
          val (oldRep, oldIdx) = (repSegs, repIdxSegs)
          repSegs = Vector(repCorpusNow.transform(graft.ops.Ckpt.fresh))
          repIdxSegs = Vector(repIdxNow.transform(graft.ops.Ckpt.fresh))
          oldRep.foreach(releaseCheckpoint)
          oldIdx.foreach(releaseCheckpoint)
        }
        foldsSinceCompact = 0
        oldDig.foreach(releaseCheckpoint)
        oldDec.foreach(releaseCheckpoint)
      }
      (Seq(b, seen, judged, packed) ++ packScratch ++
        ndFlagOpt.toSeq ++ ndScratch).foreach(releaseCheckpoint)
    }
  }

  /** Construct a [[CurationGate]] whose standing state derives from an
    * already-curated standing corpus: digests of every standing doc,
    * train-token total of the standing pipeline's kept-train output.
    */
  def newCurationGate(
      standing: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      tokensPerShard: Long,
      compactEvery: Int = 8,
      nearDup: Option[NearDupParams] = None,
      tokenizer: String = "ws"): CurationGate = {
    val (digests, tokens) =
      graft.ops.Curation.standingCurationState(standing, evalSet, idCol, textCol, tokenizer)
    // With the near-dup stage on, every standing doc seeds the rep
    // corpus (its content is decided state, as with digests); the
    // standing token total stays the exact-dedup pipeline's — the
    // q102/standingCurationState keep — so a near-dup gate over an
    // exact-curated standing corpus appends consistently to its shards.
    new CurationGate(digests, tokens, evalSet, idCol, textCol,
      tokensPerShard, compactEvery,
      nearDup = nearDup,
      initialRepCorpus = nearDup.map(_ => standing.select(
        col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))),
      tokenizer = tokenizer)
  }

  /** Resume a [[CurationGate]] from `store`'s latest committed
    * manifest — the durable twin of [[newCurationGate]]: digest index,
    * decision log, cumulative train-token total, and the batch counter
    * reload from the versioned slots (decisions keep their original
    * batch numbers; the next fold continues the sequence). `evalSet` /
    * `tokensPerShard` are pipeline configuration and must match the
    * persisting gate's.
    */
  def resumeCurationGate(
      store: graft.bulk.ManifestStore,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      tokensPerShard: Long,
      compactEvery: Int = 8,
      nearDup: Option[NearDupParams] = None,
      tokenizer: String = "ws"): CurationGate = {
    val digests = store.read("digests").getOrElse(throw new IllegalStateException(
      s"no committed curation-gate state in '${store.name}' (missing 'digests' slot)"))
    val metaDf = store.read("meta").getOrElse(throw new IllegalStateException(
      s"curation-gate manifest in '${store.name}' has no 'meta' slot"))
    val meta = metaDf.head()
    // the persisted counter's unit must match the resuming gate's —
    // a mismatch would mix token units in the shard arithmetic. A
    // manifest written before the column existed could only have been
    // produced by a whitespace-counting gate, so its unit is "ws".
    val stored =
      if (metaDf.columns.contains("tokenizer")) meta.getAs[String]("tokenizer")
      else "ws"
    require(stored == tokenizer,
      s"curation-gate manifest in '${store.name}' was persisted with " +
        s"tokenizer='$stored' but resume requested '$tokenizer' — the " +
        "carried train-token counter is denominated in the persisted unit")
    val repCorpus = nearDup.map(_ => store.read("corpus").getOrElse(
      throw new IllegalStateException(
        s"near-dup resume needs a 'corpus' slot in '${store.name}' — " +
          "was the persisting gate near-dup-enabled?")))
    new CurationGate(digests, meta.getAs[Long]("train_tokens"), evalSet,
      idCol, textCol, tokensPerShard, compactEvery,
      restoredDecisions = store.read("decisions"),
      initialBatchIdx = meta.getAs[Long]("batch_idx"),
      nearDup = nearDup,
      initialRepCorpus = repCorpus,
      restoredRepIndex = if (nearDup.isDefined) store.read("bandindex") else None,
      tokenizer = tokenizer)
  }

  /** Online WINNOWED exact-substring gate — the q116 delta operator's
    * standing index as ACTUALLY-MAINTAINED (and durable) gate state:
    * the loop carries the winnowed fingerprint MULTIPLICITY index
    * (h → count over every doc ever seen, at ~2/(stride+1) the row
    * volume of a stride-1 window index) in LSM segments; each
    * micro-batch of documents is annotated with its repeated-content
    * statistics against everything seen so far PLUS itself (the
    * q106/q116 semantics: an occurrence is repeated iff its
    * fingerprint's total multiplicity over seen ∪ batch exceeds 1),
    * then its fingerprint counts fold into the index. Decisions are
    * immutable once emitted — an early doc is NOT re-flagged when a
    * later copy arrives (the copy itself flags), exactly the one-shot
    * ingest-annotation a 100 TB dedup pipeline runs before the exact
    * pass (q112's stage 1, incrementally).
    *
    * Per-batch cost: one winnowing kernel pass over the DELTA, one
    * broadcast-restricted probe of the standing index (never
    * shuffled), and a delta-sized segment append. Width/stride are
    * pipeline configuration and RIDE the persistence manifest —
    * resuming under different values would probe an incompatible
    * fingerprint space, so [[Streams.resumeWinnowGate]] validates
    * them (as the curation gate's tokenizer).
    */
  final class WinnowGate private[graft] (
      initial: DataFrame,
      idCol: String,
      textCol: String,
      width: Int,
      stride: Int,
      compactEvery: Int = 8,
      restoredIndex: Option[DataFrame] = None,
      restoredDecisions: Option[DataFrame] = None,
      initialBatchIdx: Long = 0L) extends IngestGate {
    require(compactEvery >= 1, "compactEvery must be >= 1")
    require(width >= 1 && stride >= 1, "width and stride must be >= 1")

    private def winnowed(df: DataFrame): DataFrame = {
      graft.functions.TextHashes.ensureRegistered(df.sparkSession)
      graft.Tables.fanOut(df).select(
        col(idCol).as("doc_id"),
        explode(call_function("graft_winnowed_hashes",
          col(textCol), lit(width), lit(stride))).as("h"))
    }

    // (h, c) multiplicity segments, newest last; summed across
    // segments at read time, merged at compaction.
    @volatile private var indexSegs: Vector[DataFrame] =
      Vector(restoredIndex.getOrElse(
          winnowed(initial).groupBy("h").agg(count(lit(1)).as("c")))
        .transform(graft.ops.Ckpt.fresh))
    @volatile private var decisionSegs: Vector[DataFrame] =
      restoredDecisions.map(d => Vector(d.transform(graft.ops.Ckpt.fresh)))
        .getOrElse(Vector.empty)
    private var foldsSinceCompact = 0
    private var batchIdx = initialBatchIdx

    /** The standing multiplicity index (h, c) as of the last fold —
      * segment counts summed. */
    def indexNow: DataFrame = indexSegs.reduce(_ unionByName _)
      .groupBy("h").agg(sum("c").as("c"))
    /** Every annotation emitted so far: (doc_id, batch, n_selected,
      * n_repeated, selected_rep_permille). */
    def decisions: DataFrame = decisionSegs match {
      case segs if segs.nonEmpty => segs.reduce(_ unionByName _)
      case _ => indexSegs.head.sparkSession.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0L).as("batch"),
          lit(0L).as("n_selected"), lit(0L).as("n_repeated"),
          lit(0L).as("selected_rep_permille"))
        .limit(0)
    }

    /** Synchronously fold one micro-batch (the foreachBatch body). */
    def ingest(batch: DataFrame): Unit = fold(batch)

    /** Durably commit (multiplicity index, decision log, counters +
      * width/stride config) as ONE manifest version; see
      * [[DedupGate.persist]] for the contract. */
    def persist(store: graft.bulk.ManifestStore): Long = synchronized {
      val spark = indexSegs.head.sparkSession
      val txn = store.begin()
      txn.stage("index", indexNow)
      if (decisionSegs.nonEmpty) txn.stage("decisions", decisions)
      txn.stage("meta", spark.range(1).select(
        lit(batchIdx).as("batch_idx"), lit(width).as("width"),
        lit(stride).as("stride")))
      txn.commit().fold(throw _, identity)
    }

    /** Drop every carried checkpoint — terminal; see
      * [[DedupGate.release]]. */
    def release(): Unit = synchronized {
      (indexSegs ++ decisionSegs).foreach(releaseCheckpoint)
      indexSegs = Vector.empty
      decisionSegs = Vector.empty
    }

    private[graft] def fold(batch: DataFrame): Unit = synchronized {
      batchIdx += 1
      val b = batch.select(col(idCol).cast("long").as(idCol), col(textCol))
        .transform(graft.ops.Ckpt.fresh)
      // two consumers (probe + per-doc agg) + the segment append —
      // the kernel runs once
      val wd = winnowed(b).transform(graft.ops.Ckpt.fresh)
      val deltaCounts = wd.groupBy("h").agg(count(lit(1)).as("cd"))
        .transform(graft.ops.Ckpt.fresh)
      // broadcast-delta probe: the standing index is a pure scan,
      // never shuffled per batch (the gate contract)
      val standingHits = indexNow
        .join(broadcast(deltaCounts.select("h")), Seq("h"), "left_semi")
        .transform(graft.ops.Ckpt.fresh)
      val rep = deltaCounts
        .join(broadcast(standingHits), Seq("h"), "left")
        .filter(col("cd") + coalesce(col("c"), lit(0L)) > 1)
        .select(col("h"), lit(1).as("is_rep"))
      val per = wd.join(broadcast(rep), Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_selected"), count(col("is_rep")).as("n_repeated"))
      val decisionSeg = b.select(col(idCol).as("doc_id"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"), lit(batchIdx).as("batch"),
          coalesce(col("n_selected"), lit(0L)).as("n_selected"),
          coalesce(col("n_repeated"), lit(0L)).as("n_repeated"),
          expr("(coalesce(n_repeated, 0L) * 1000) div greatest(coalesce(n_selected, 0L), 1)")
            .as("selected_rep_permille"))
        .transform(graft.ops.Ckpt.fresh)
      decisionSegs = decisionSegs :+ decisionSeg
      indexSegs = indexSegs :+ deltaCounts
        .select(col("h"), col("cd").as("c")).transform(graft.ops.Ckpt.fresh)
      foldsSinceCompact += 1
      if (foldsSinceCompact >= compactEvery) {
        val (oldIdx, oldDec) = (indexSegs, decisionSegs)
        indexSegs = Vector(indexNow.transform(graft.ops.Ckpt.fresh))
        decisionSegs = Vector(decisions.transform(graft.ops.Ckpt.fresh))
        foldsSinceCompact = 0
        oldIdx.foreach(releaseCheckpoint)
        oldDec.foreach(releaseCheckpoint)
      }
      Seq(b, wd, standingHits).foreach(releaseCheckpoint)
      // deltaCounts' checkpoint is superseded by the re-checkpointed
      // segment projection above
      releaseCheckpoint(deltaCounts)
    }
  }

  /** Construct a standalone [[WinnowGate]] whose standing index seeds
    * from an initial corpus. */
  def newWinnowGate(
      initialCorpus: DataFrame,
      idCol: String,
      textCol: String,
      width: Int,
      stride: Int,
      compactEvery: Int = 8): WinnowGate =
    new WinnowGate(initialCorpus, idCol, textCol, width, stride, compactEvery)

  /** Resume a [[WinnowGate]] from `store`'s latest committed manifest;
    * width/stride must match the persisting gate's (validated against
    * the meta slot — a mismatch would probe an incompatible
    * fingerprint space).
    */
  def resumeWinnowGate(
      store: graft.bulk.ManifestStore,
      idCol: String,
      textCol: String,
      width: Int,
      stride: Int,
      compactEvery: Int = 8): WinnowGate = {
    val index = store.read("index").getOrElse(throw new IllegalStateException(
      s"no committed winnow-gate state in '${store.name}' (missing 'index' slot)"))
    val meta = store.read("meta").getOrElse(throw new IllegalStateException(
      s"winnow-gate manifest in '${store.name}' has no 'meta' slot")).head()
    require(meta.getAs[Int]("width") == width && meta.getAs[Int]("stride") == stride,
      s"winnow-gate manifest in '${store.name}' was persisted with " +
        s"width=${meta.getAs[Int]("width")} stride=${meta.getAs[Int]("stride")} " +
        s"but resume requested width=$width stride=$stride")
    new WinnowGate(index.limit(0).select(lit(0L).as(idCol), lit("").as(textCol)),
      idCol, textCol, width, stride, compactEvery,
      restoredIndex = Some(index),
      restoredDecisions = store.read("decisions"),
      initialBatchIdx = meta.getAs[Long]("batch_idx"))
  }

  /** The maintained perceptual-hash index as durable gate state
    * (round 9, completing the gate family across modalities): ingests
    * micro-batches of ALREADY-HASHED frames — (doc_id, b0..b3), any
    * 4×16-bit-band perceptual hash ([[graft.ops.Media.ppmAHash]] for
    * images, [[graft.ops.Media.wavEnvelopeHash]] for audio; decode +
    * hash stay map-side in the caller's pipeline) — and annotates each
    * batch doc with its near-dup partners among everything seen so far
    * plus the batch itself: the streaming form of the q121/q123 delta
    * operators, hash-agnostic by construction.
    *
    * State: hash segments (doc_id, b0..b3 — 1 row/blob, newest last)
    * plus the (band, key, c) band-multiplicity segments that make the
    * stop-band decision O(delta) (the winnow gate's maintained-counter
    * discipline: without it every fold would re-aggregate the standing
    * band rows — an O(corpus) shuffle per batch). Per fold the standing
    * side is ONE narrow scan (band rows derived in-map) restricted by a
    * broadcast of the batch's kept band keys; it never shuffles.
    * Decisions are immutable at fold time: partners arriving in LATER
    * batches do not revise an earlier annotation (the carried-digest
    * rule's analog).
    *
    * Re-ingesting a doc_id supersedes its earlier hash: segments are
    * fold-seq-tagged and compaction/persist keep only the newest copy
    * per doc_id, with the band multiplicities REBUILT from the
    * deduped hashes (the [[VectorIndexGate]] discipline). Between
    * compactions a superseded copy can still appear as a partner —
    * the same bounded staleness window the vector gate accepts. For
    * the video-frame variant, doc_id is the packed (video, frame)
    * key, so a re-encoded SHORTER video leaves its trailing frames
    * standing until the caller re-ingests tombstone hashes for them.
    */
  final class BandHashGate private[graft] (
      initialHashes: DataFrame,
      maxHamming: Int = 3,
      maxBandFreq: Long = 1000L,
      compactEvery: Int = 8,
      restoredBands: Option[DataFrame] = None,
      restoredDecisions: Option[DataFrame] = None,
      initialBatchIdx: Long = 0L) extends IngestGate {
    require(compactEvery >= 1, "compactEvery must be >= 1")
    require(maxHamming >= 0 && maxHamming < 4,
      "pigeonhole over 4 bands covers hamming <= 3")

    private def hashCols(df: DataFrame): DataFrame = df.select(
      col("doc_id").cast("long").as("doc_id"),
      col("b0").cast("int").as("b0"), col("b1").cast("int").as("b1"),
      col("b2").cast("int").as("b2"), col("b3").cast("int").as("b3"))

    @volatile private var hashSegs: Vector[DataFrame] =
      Vector(hashCols(initialHashes).transform(graft.ops.Ckpt.fresh))
    // Fold seq of each hash segment (lockstep with hashSegs): the
    // version order that lets compaction drop a SUPERSEDED copy of a
    // re-ingested doc_id — newest segment wins.
    private var hashSeqs: Vector[Long] = Vector(initialBatchIdx)
    @volatile private var bandSegs: Vector[DataFrame] =
      Vector(restoredBands.getOrElse(
          graft.ops.Media.phashBandRows(hashCols(initialHashes))
            .groupBy("band", "key").agg(count(lit(1)).as("c")))
        .transform(graft.ops.Ckpt.fresh))
    @volatile private var decisionSegs: Vector[DataFrame] =
      restoredDecisions.map(d => Vector(d.transform(graft.ops.Ckpt.fresh)))
        .getOrElse(Vector.empty)
    private var foldsSinceCompact = 0
    private var batchIdx = initialBatchIdx

    /** The standing hash table (doc_id, b0..b3) as of the last fold. */
    def hashesNow: DataFrame = hashSegs.reduce(_ unionByName _)
    private def bandsNow: DataFrame = bandSegs.reduce(_ unionByName _)
      .groupBy("band", "key").agg(sum("c").as("c"))
    /** Newest-wins view of the hash table: one row per doc_id, the
      * copy from the highest-seq segment. One window shuffle, run only
      * at compaction/persist — never on the fold path. */
    private def dedupedHashes: DataFrame =
      if (hashSegs.size == 1) hashSegs.head
      else {
        val tagged = hashSegs.lazyZip(hashSeqs)
          .map((seg, sq) => seg.withColumn("_seq", lit(sq)))
          .reduce(_ unionByName _)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("_seq").desc,
            col("b0"), col("b1"), col("b2"), col("b3"))
        tagged.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .drop("_seq", "_rn")
      }
    /** Band multiplicities REBUILT from a deduped hash table — the
      * only counts consistent with newest-wins (the running segment
      * sums would keep a superseded copy's contribution). */
    private def bandsOf(hashes: DataFrame): DataFrame =
      graft.ops.Media.phashBandRows(hashes)
        .groupBy("band", "key").agg(count(lit(1)).as("c"))
    /** Every annotation emitted so far: (doc_id, batch, n_partners,
      * min_hamming — -1 when no partner).
      */
    def decisions: DataFrame = decisionSegs match {
      case segs if segs.nonEmpty => segs.reduce(_ unionByName _)
      case _ => hashSegs.head.sparkSession.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0L).as("batch"),
          lit(0L).as("n_partners"), lit(-1L).as("min_hamming"))
        .limit(0)
    }

    /** Synchronously fold one micro-batch of hash rows. */
    def ingest(batchHashes: DataFrame): Unit = fold(batchHashes)

    /** Durably commit (hash table, band multiplicities, decision log,
      * counters + hash-space config) as ONE manifest version; see
      * [[DedupGate.persist]] for the contract.
      */
    def persist(store: graft.bulk.ManifestStore): Long = synchronized {
      val spark = hashSegs.head.sparkSession
      val txn = store.begin()
      val dh = dedupedHashes.transform(graft.ops.Ckpt.fresh)
      txn.stage("hashes", dh)
      txn.stage("bands", bandsOf(dh))
      if (decisionSegs.nonEmpty) txn.stage("decisions", decisions)
      txn.stage("meta", spark.range(1).select(
        lit(batchIdx).as("batch_idx"), lit(maxHamming).as("max_hamming"),
        lit(maxBandFreq).as("max_band_freq")))
      val v = txn.commit().fold(throw _, identity)
      releaseCheckpoint(dh)
      v
    }

    /** Drop every carried checkpoint — terminal; see
      * [[DedupGate.release]]. */
    def release(): Unit = synchronized {
      (hashSegs ++ bandSegs ++ decisionSegs).foreach(releaseCheckpoint)
      hashSegs = Vector.empty
      bandSegs = Vector.empty
      decisionSegs = Vector.empty
    }

    private[graft] def fold(batchHashes: DataFrame): Unit = synchronized {
      batchIdx += 1
      val hd = hashCols(batchHashes).transform(graft.ops.Ckpt.fresh)
      val bd = graft.ops.Media.phashBandRows(hd)
        .transform(graft.ops.Ckpt.fresh)
      val deltaCounts = bd.groupBy("band", "key").agg(count(lit(1)).as("cd"))
        .transform(graft.ops.Ckpt.fresh)
      // stop-band decision from the MAINTAINED multiplicities — only
      // keys the delta touches can generate candidates, so the
      // standing side is a broadcast-semi-restricted scan of the
      // (band, key, c) index, never a standing re-aggregation
      val standingHits = bandsNow
        .join(broadcast(deltaCounts.select("band", "key")),
          Seq("band", "key"), "left_semi")
        .transform(graft.ops.Ckpt.fresh)
      val hot = deltaCounts
        .join(broadcast(standingHits), Seq("band", "key"), "left")
        .filter(col("cd") + coalesce(col("c"), lit(0L)) > maxBandFreq)
        .select("band", "key")
      val keptD = bd.join(broadcast(hot), Seq("band", "key"), "left_anti")
        .transform(graft.ops.Ckpt.fresh)
      // candidate standing band rows: derived IN-MAP from the hash
      // segments (4 narrow rows/blob), anti'd on re-ingested ids
      // (delta-authoritative), restricted to the batch's kept keys —
      // delta-bounded output, the standing table never shuffles
      val candS = graft.ops.Media.phashBandRows(hashesNow)
        .join(broadcast(hd.select("doc_id")), Seq("doc_id"), "left_anti")
        .join(broadcast(keptD.select("band", "key").distinct()),
          Seq("band", "key"), "left_semi")
        .join(broadcast(hot), Seq("band", "key"), "left_anti")
      def pairs(x: DataFrame, y: DataFrame, ordered: Boolean): DataFrame = {
        val j = x.as("x").join(y.as("y"), Seq("band", "key"))
        val lim = if (ordered) j.where(col("x.doc_id") < col("y.doc_id"))
          else j.where(col("x.doc_id") =!= col("y.doc_id"))
        lim.select(
          least(col("x.doc_id"), col("y.doc_id")).as("id_a"),
          greatest(col("x.doc_id"), col("y.doc_id")).as("id_b"),
          graft.ops.Media.phashHamming("x", "y").cast("long").as("hamming"))
      }
      val pr = pairs(keptD, keptD, ordered = true)
        .unionByName(pairs(keptD, candS, ordered = false))
        .distinct()
        .filter(col("hamming") <= maxHamming)
      val both = pr.select(col("id_a").as("doc_id"), col("hamming"))
        .unionByName(pr.select(col("id_b").as("doc_id"), col("hamming")))
      val per = both
        .join(broadcast(hd.select("doc_id")), Seq("doc_id"), "left_semi")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_partners"), min("hamming").as("min_hamming"))
      val decisionSeg = hd.select("doc_id")
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"), lit(batchIdx).as("batch"),
          coalesce(col("n_partners"), lit(0L)).as("n_partners"),
          coalesce(col("min_hamming"), lit(-1L)).as("min_hamming"))
        .transform(graft.ops.Ckpt.fresh)
      decisionSegs = decisionSegs :+ decisionSeg
      hashSegs = hashSegs :+ hd
      hashSeqs = hashSeqs :+ batchIdx
      bandSegs = bandSegs :+ deltaCounts
        .select(col("band"), col("key"), col("cd").as("c"))
        .transform(graft.ops.Ckpt.fresh)
      foldsSinceCompact += 1
      if (foldsSinceCompact >= compactEvery) {
        val (oldH, oldB, oldD) = (hashSegs, bandSegs, decisionSegs)
        val deduped = dedupedHashes.transform(graft.ops.Ckpt.fresh)
        hashSegs = Vector(deduped)
        hashSeqs = Vector(batchIdx)
        bandSegs = Vector(bandsOf(deduped).transform(graft.ops.Ckpt.fresh))
        decisionSegs = Vector(decisions.transform(graft.ops.Ckpt.fresh))
        foldsSinceCompact = 0
        (oldH ++ oldB ++ oldD).foreach(releaseCheckpoint)
      }
      Seq(bd, standingHits, keptD).foreach(releaseCheckpoint)
      // hd's checkpoint lives on as a hash segment; deltaCounts' is
      // superseded by the re-checkpointed segment projection above
      releaseCheckpoint(deltaCounts)
    }
  }

  /** Construct a standalone [[BandHashGate]] whose standing hash table
    * seeds from already-hashed initial frames (doc_id, b0..b3). */
  def newBandHashGate(
      initialHashes: DataFrame,
      maxHamming: Int = 3,
      maxBandFreq: Long = 1000L,
      compactEvery: Int = 8): BandHashGate =
    new BandHashGate(initialHashes, maxHamming, maxBandFreq, compactEvery)

  /** Resume a [[BandHashGate]] from `store`'s latest committed
    * manifest; maxHamming/maxBandFreq must match the persisting
    * gate's (validated against the meta slot — a mismatch would
    * change which partners past decisions were allowed to see).
    */
  def resumeBandHashGate(
      store: graft.bulk.ManifestStore,
      maxHamming: Int = 3,
      maxBandFreq: Long = 1000L,
      compactEvery: Int = 8): BandHashGate = {
    val hashes = store.read("hashes").getOrElse(throw new IllegalStateException(
      s"no committed band-hash-gate state in '${store.name}' (missing 'hashes' slot)"))
    val bands = store.read("bands").getOrElse(throw new IllegalStateException(
      s"band-hash-gate manifest in '${store.name}' has no 'bands' slot"))
    val meta = store.read("meta").getOrElse(throw new IllegalStateException(
      s"band-hash-gate manifest in '${store.name}' has no 'meta' slot")).head()
    require(meta.getAs[Int]("max_hamming") == maxHamming &&
        meta.getAs[Long]("max_band_freq") == maxBandFreq,
      s"band-hash-gate manifest in '${store.name}' was persisted with " +
        s"maxHamming=${meta.getAs[Int]("max_hamming")} " +
        s"maxBandFreq=${meta.getAs[Long]("max_band_freq")} but resume requested " +
        s"maxHamming=$maxHamming maxBandFreq=$maxBandFreq")
    new BandHashGate(hashes, maxHamming, maxBandFreq, compactEvery,
      restoredBands = Some(bands),
      restoredDecisions = store.read("decisions"),
      initialBatchIdx = meta.getAs[Long]("batch_idx"))
  }

  /** UNIFIED multimodal ingest gate (round 11, q154): blobs arrive as
    * a MIXED stream of every container this engine decodes — content
    * type untrusted, bytes decide — and one
    * [[graft.ops.Media.mixedMediaHash]] pass sniffs, decodes, and
    * hashes each blob into its modality's hash space; the rows route
    * to per-modality [[BandHashGate]]s (image RGB-aHash, jpeg
    * gray-aHash, audio envelope, video packed frame keys). Modalities
    * never cross-pair — the tag names the hash space, and comparing
    * an envelope hash to a pixel grid is noise, not dedup signal.
    *
    * EVERY batch folds into EVERY modality gate (empty slices
    * included), so per-gate batch counters stay lockstep with the
    * global stream and decisions carry the stream's fold index
    * regardless of which modalities a batch happened to contain.
    * Persist/resume commits each modality's gate into its own
    * manifest store (one durable version per modality per persist).
    */
  final class MixedMediaGate private[graft] (
      gates: Map[String, BandHashGate]) {

    def ingest(blobs: org.apache.spark.sql.Dataset[graft.ops.MediaRow]): Unit = {
      val hashed = graft.ops.Ckpt.fresh(graft.ops.Media.mixedMediaHash(blobs))
      MixedMediaGate.Modalities.foreach { m =>
        gates(m).ingest(
          hashed.filter(col("modality") === m)
            .select("doc_id", "b0", "b1", "b2", "b3"))
      }
      releaseCheckpoint(hashed)
    }

    /** Union of per-modality decisions, tagged. Video rows carry the
      * packed (doc·8+frame) key as doc_id — the q129 convention. */
    def decisions: DataFrame =
      MixedMediaGate.Modalities.map(m =>
        gates(m).decisions.withColumn("modality", lit(m)))
        .reduce(_ unionByName _)

    def persist(storeFor: String => graft.bulk.ManifestStore): Unit =
      MixedMediaGate.Modalities.foreach(m => gates(m).persist(storeFor(m)))

    def release(): Unit = gates.valuesIterator.foreach(_.release())
  }

  object MixedMediaGate {
    /** The hash spaces [[graft.ops.Media.mixedMediaHash]] emits. */
    val Modalities: Seq[String] = Seq("image", "jpeg", "audio", "video", "text")
  }

  private def emptyHashFrame(spark: SparkSession): DataFrame =
    spark.emptyDataFrame.select(
      lit(0L).as("doc_id"), lit(0).as("b0"), lit(0).as("b1"),
      lit(0).as("b2"), lit(0).as("b3")).limit(0)

  /** Construct a [[MixedMediaGate]] with empty standing state. */
  def newMixedMediaGate(
      spark: SparkSession,
      maxHamming: Int = 3,
      maxBandFreq: Long = 1000L,
      compactEvery: Int = 8): MixedMediaGate =
    new MixedMediaGate(MixedMediaGate.Modalities.map(m =>
      m -> newBandHashGate(emptyHashFrame(spark), maxHamming, maxBandFreq,
        compactEvery)).toMap)

  /** Resume a [[MixedMediaGate]] from per-modality stores. */
  def resumeMixedMediaGate(
      storeFor: String => graft.bulk.ManifestStore,
      maxHamming: Int = 3,
      maxBandFreq: Long = 1000L,
      compactEvery: Int = 8): MixedMediaGate =
    new MixedMediaGate(MixedMediaGate.Modalities.map(m =>
      m -> resumeBandHashGate(storeFor(m), maxHamming, maxBandFreq,
        compactEvery)).toMap)

  /** The maintained vector SEARCH index as durable gate state (round
    * 9, the serving-side complement of [[EmbeddingDedupGate]]'s
    * near-dup rejection): a quantized IVF index
    * ([[graft.ops.Similarity.ivfTopKQuantizedRecall]]'s pipeline with
    * the corpus split into standing state and a delta) kept fresh as
    * embeddings stream in. Each micro-batch is quantized and
    * cell-assigned map-side against the FIXED centroid closure
    * (seeded from the initial corpus, persisted with the index so a
    * resumed gate probes identical cells), annotated with its top-k
    * neighbors among everything seen so far plus the batch itself
    * (integer-dot shortlist, float rerank riding the postings — the
    * raw corpus is never rejoined), and appended to the postings
    * segments. Decisions are immutable at fold time: a neighbor
    * arriving later never revises an earlier top-k (the gate-family
    * contract, and what lets the oracle collapse the fold-forward into
    * one batch-restricted q109 chain).
    *
    * Per fold the standing side is ONE narrow scan semi-restricted by
    * a broadcast of the batch's probed cells — it never shuffles; the
    * shortlist/rerank windows partition on the DELTA's query ids, so
    * per-batch cost is O(delta × probed-cell mass), not O(corpus).
    */
  final class VectorIndexGate private[graft] (
      initialPostings: DataFrame,
      initialClosure: graft.ops.Similarity.CentroidClosure,
      nprobe: Int,
      shortlist: Int,
      k: Int,
      compactEvery: Int = 8,
      targetCellOccupancy: Long = 0L,
      restoredDecisions: Option[DataFrame] = None,
      initialBatchIdx: Long = 0L,
      // PQ sidecar: when set, postings carry 8-byte ADC codes and the
      // fold/search shortlist is scored by integer ADC instead of the
      // int8 dot (the compressed-scan serving path). Codebooks train
      // once (factory); codes re-derive from the packed floats
      // deterministically at compaction/reseed/resume. With the drift
      // gate enabled (below) they can additionally RETRAIN at a
      // compaction whose measured ADC recall fell under the floor.
      pqCb: Option[Array[Array[Array[Long]]]] = None,
      // Codebook DRIFT gate (round 13): 0 disables. When > 0, each
      // compaction measures mean ADC recall@k (×100) against the
      // exact float top-k over a deterministic ≤pqRefreshSampleCap
      // query sample of the deduped corpus (the q39 sample
      // discipline; integer mean, so the trigger is bit-
      // deterministic); below the floor, codebooks retrain on the
      // CURRENT corpus and all standing codes re-derive. Decisions
      // stay immutable — only future folds see the new codebooks —
      // and the refreshed codebooks ride the manifest's pqcb slot
      // (the q136 reseed contract, applied to the PQ sidecar).
      //
      // SIZING THE ABSOLUTE FLOOR: sampled ADC recall decays with
      // corpus DENSITY alone — as an undrifted corpus grows, more
      // near-ties crowd each query's exact top-k and the integer mean
      // drifts down without any distribution shift (BASELINE's q165
      // no-drift control decays to ~41 where the drifted run reads
      // ~36). A floor above the density plateau THRASHES: every
      // compaction retrains, recall stays at the plateau, and the
      // recode cost is pure waste. Recipe: run the gate with the
      // floor at 0 over a representative growth window, read the
      // trailing mean of the logged compaction measurements, and set
      // the floor at ~70-80% of that plateau — or use the RELATIVE
      // trigger below, which tracks the plateau automatically.
      pqRefreshMinRecallX100: Long = 0L,
      // RELATIVE drift trigger (round 14, the auto-floor): 0
      // disables. When > 0 (a percentage ×100, e.g. 80 = "fire on a
      // >20% drop"), each compaction's measured recall is compared
      // against the PREVIOUS compaction's measurement: a refresh
      // fires when current × 100 < frac × previous. The single-step
      // form is deliberate — density decay on an undrifted growing
      // corpus is SMOOTH at the compaction cadence (a few percent
      // per compaction; any longer trailing-mean window lags the
      // decay and misreads the cumulative slope as drift), while a
      // genuine distribution shift lands abruptly between two
      // compactions (VectorIndexGateSpec pins both directions).
      // After a refresh the history resets — the refreshed codebooks
      // are a new baseline, and the next compaction's measurement
      // seeds it. The history is in-memory only — a resumed gate
      // re-learns its baseline at its first post-resume compaction.
      // Composable with the absolute floor (either trigger
      // refreshes); pqRecallHistory exposes the trailing plateau for
      // sizing an absolute floor by the scaladoc recipe above.
      pqRefreshDropFracX100: Long = 0L,
      pqRefreshSampleCap: Int = 256,
      pqTrainIters: Int = 2,
      // RESIDUAL sidecar (round 14, IVFADC): cid → floor(centroid ×
      // 1000). When set (requires pqCb), every posting's codes
      // quantize its residual to its own cell's lattice centroid and
      // the shortlist scores dot(q, cent) + residual-ADC — tighter
      // codes at the same 8 bytes. The table rides the manifest's
      // pqcents slot and rebuilds from the new closure's seed vectors
      // at every reseed (raw vectors reconstruct from the packed
      // floats bit-identically).
      pqResidualCentInt: Option[Map[Long, Array[Long]]] = None,
      // COMPRESSED-ONLY serving (round 15): false ranks decisions by
      // the integer ADC score alone — the deployment where the hot
      // index is codes-only (8-16 B/vector) and floats are cold
      // storage. true (default) keeps the two-stage ADC-shortlist →
      // exact-float-re-rank serving. PQ-mode only: the raw-postings
      // gate always scores exact.
      rerankFloat: Boolean = true) extends IngestGate {
    require(compactEvery >= 1, "compactEvery must be >= 1")
    require(pqResidualCentInt.isEmpty || pqCb.isDefined,
      "residual centroids need the PQ sidecar (pqCb)")
    require(rerankFloat || pqCb.isDefined,
      "ADC-only serving (rerankFloat = false) needs the PQ sidecar")
    require(nprobe >= 1 && shortlist >= k && k >= 1,
      "need nprobe >= 1 and shortlist >= k >= 1")

    // The coordinate system is MUTABLE under the occupancy policy: an
    // auto-reseed at compaction swaps in a wider closure (decisions
    // are immutable, so only FUTURE probes change — the contract the
    // manual reseed() documents, now self-triggering).
    @volatile private var closure: graft.ops.Similarity.CentroidClosure =
      initialClosure
    /** Current centroid count — occupancy-reseed observability. */
    def centroidCount: Int = closure.numCentroids

    // The LIVE codebooks (the constructor's pqCb until a drift-gated
    // refresh swaps in retrained ones).
    @volatile private var pqCbNow: Option[Array[Array[Array[Long]]]] = pqCb
    // The LIVE residual centroid table (rebuilt at every reseed).
    @volatile private var pqCentIntNow: Option[Map[Long, Array[Long]]] = pqResidualCentInt
    /** Encode postings with the live codebooks — residual codes when
      * the residual table is set, direct codes otherwise. */
    private def encodePq(p: DataFrame, cb: Array[Array[Array[Long]]]): DataFrame =
      pqCentIntNow match {
        case Some(ci) => graft.ops.Similarity.withPqCodesResidual(p, cb, ci)
        case None => graft.ops.Similarity.withPqCodes(p, cb)
      }
    @volatile private var pqRefreshes: Int = 0
    /** Completed drift-gated codebook refreshes — observability for
      * the q165 oracle's phase boundary. */
    def pqRefreshCount: Int = pqRefreshes
    // Trailing compaction recall measurements since the last refresh
    // (the relative trigger's baseline; bounded window of 4).
    private var pqRecallHist: Vector[Long] = Vector.empty
    /** Compaction recall measurements since the last refresh — the
      * floor-sizing observability (read the plateau here). */
    def pqRecallHistory: Seq[Long] = pqRecallHist

    /** The PQ codebooks as the (msub, j, cv) frame the DuckDB twin
      * reads (None when the gate runs the int8 kernel). */
    def pqFrame: Option[DataFrame] = pqCbNow.map(cb =>
      graft.ops.Similarity.pqCbToFrame(postSegs.head.sparkSession, cb))

    @volatile private var postSegs: Vector[DataFrame] =
      Vector(initialPostings.transform(graft.ops.Ckpt.fresh))
    // Fold seq of each postings segment (lockstep with postSegs):
    // the version order that lets compaction drop a SUPERSEDED copy
    // of a re-ingested vec_id — newest segment wins.
    private var postSeqs: Vector[Long] = Vector(initialBatchIdx)
    @volatile private var decisionSegs: Vector[DataFrame] =
      restoredDecisions.map(d => Vector(d.transform(graft.ops.Ckpt.fresh)))
        .getOrElse(Vector.empty)
    private var foldsSinceCompact = 0
    private var batchIdx = initialBatchIdx

    /** The standing postings (vec_id, cell, qv, qn, fv, fnrm). A
      * re-ingested id keeps BOTH versions visible here until the next
      * compaction (the LSM multi-version window — the reference's
      * versions-until-merge contract, assemblage_kv/src/lib.rs:602);
      * the serving kernel collapses duplicates per (query, neighbor)
      * and compaction/persist/reseed all run newest-wins. */
    def postingsNow: DataFrame = postSegs.reduce(_ unionByName _)

    /** Newest-wins view of the postings: one row per vec_id, the copy
      * from the highest-seq segment (ties inside one batch break on
      * the packed-float payload for determinism). One window shuffle,
      * run only at compaction/persist/reseed — never on the fold or
      * search path. */
    private def dedupedPostings: DataFrame =
      if (postSegs.size == 1) postSegs.head
      else {
        val tagged = postSegs.lazyZip(postSeqs)
          .map((seg, sq) => seg.withColumn("_seq", lit(sq)))
          .reduce(_ unionByName _)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(col("_seq").desc, col("fv"))
        tagged.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .drop("_seq", "_rn")
      }
    /** Every annotation emitted so far:
      * (query_id, batch, rank, neighbor_id) — found-only rows. */
    def decisions: DataFrame = decisionSegs match {
      case segs if segs.nonEmpty => segs.reduce(_ unionByName _)
      case _ => postSegs.head.sparkSession.emptyDataFrame
        .select(lit(0L).as("query_id"), lit(0L).as("batch"),
          lit(0L).as("rank"), lit(0L).as("neighbor_id"))
        .limit(0)
    }
    /** Rebuild this index under a NEW centroid count from its own
      * postings — the occupancy-sizing move (cell size ∝ corpus/nc;
      * BASELINE's vector-gate table measures the knob): raw vectors
      * reconstruct bit-identically from the packed floats, the new
      * closure seeds from the lowest `numCentroids` ids of the
      * CURRENT corpus, every posting re-assigns map-side, and the
      * decision log carries over verbatim (decisions are immutable —
      * re-seeding changes FUTURE probes only). The old gate's
      * checkpoints are released; use the returned gate. */
    def reseed(numCentroids: Int): VectorIndexGate = synchronized {
      val raw = dedupedPostings.select(col("vec_id"),
        graft.ops.Similarity.unpackUdf(col("fv")).as("v"))
      val cc = graft.ops.Similarity.CentroidClosure.fromInitial(
        raw, "vec_id", "v", numCentroids)
      // residual mode: the lattice centroid table follows the closure
      // (codes re-derive against the NEW cells; the codebooks stand —
      // the drift gate catches any distribution shift)
      val nci = pqCentIntNow.map(_ =>
        graft.ops.Similarity.latticeCentroids(raw, "vec_id", "v", cc.cids))
      val reposted = graft.ops.Similarity.quantizedPostings(raw, "vec_id", "v", cc)
      val fresh = new VectorIndexGate(
        pqCbNow.fold(reposted)(cb => nci match {
          case Some(ci) => graft.ops.Similarity.withPqCodesResidual(reposted, cb, ci)
          case None => graft.ops.Similarity.withPqCodes(reposted, cb)
        }),
        cc, nprobe, shortlist, k, compactEvery,
        targetCellOccupancy = targetCellOccupancy,
        restoredDecisions = if (decisionSegs.nonEmpty) Some(decisions) else None,
        initialBatchIdx = batchIdx,
        pqCb = pqCbNow,
        pqRefreshMinRecallX100 = pqRefreshMinRecallX100,
        pqRefreshSampleCap = pqRefreshSampleCap,
        pqRefreshDropFracX100 = pqRefreshDropFracX100,
        pqTrainIters = pqTrainIters,
        pqResidualCentInt = nci,
        rerankFloat = rerankFloat)
      release()
      fresh
    }

    /** Serve the CURRENT index for an ad-hoc query frame of raw
      * vectors — same kernel as the fold, no state change. Results
      * come from the INDEX only (queries never match each other), and
      * a query whose id exists in the index skips its own stored copy
      * but still gets its neighbors. */
    def search(queries: DataFrame, idCol: String, vecCol: String): DataFrame = {
      val q = graft.ops.Similarity.quantizedPostings(queries, idCol, vecCol, closure)
      pqCbNow.fold(
        graft.ops.Similarity.ivfAnnotateBatch(
          postingsNow, q, closure, nprobe, shortlist, k,
          includeBatchAsCandidates = false))(cb =>
        graft.ops.Similarity.ivfAnnotateBatchPq(
          postingsNow, q, closure, cb, nprobe, shortlist, k,
          includeBatchAsCandidates = false,
          residualCentInt = pqCentIntNow,
          rerankFloat = rerankFloat))
    }

    /** Synchronously fold one micro-batch of postings-projected rows —
      * callers project raw vectors via [[Streams.newVectorIndexGate]]'s
      * companion projection or feed raw frames through
      * [[foldRaw]]. */
    def ingest(batch: DataFrame): Unit = fold(batch)
    /** Fold a raw (idCol, vecCol) frame. */
    def foldRaw(batch: DataFrame, idCol: String, vecCol: String): Unit = {
      val p = graft.ops.Similarity.quantizedPostings(batch, idCol, vecCol, closure)
      fold(pqCbNow.fold(p)(cb => encodePq(p, cb)))
    }

    def persist(store: graft.bulk.ManifestStore): Long = synchronized {
      val spark = postSegs.head.sparkSession
      val txn = store.begin()
      txn.stage("postings", dedupedPostings)
      txn.stage("centroids", closure.toFrame(spark))
      pqCbNow.foreach(cb => txn.stage("pqcb",
        graft.ops.Similarity.pqCbToFrame(spark, cb)))
      pqCentIntNow.foreach { ci =>
        import spark.implicits._
        txn.stage("pqcents",
          ci.toSeq.sortBy(_._1).map { case (cid, cv) => (cid, cv.toSeq) }
            .toDF("cid", "civ"))
      }
      if (decisionSegs.nonEmpty) txn.stage("decisions", decisions)
      txn.stage("meta", spark.range(1).select(
        lit(batchIdx).as("batch_idx"), lit(nprobe).as("nprobe"),
        lit(shortlist).as("shortlist"), lit(k).as("k")))
      txn.commit().fold(throw _, identity)
    }

    def release(): Unit = synchronized {
      (postSegs ++ decisionSegs).foreach(releaseCheckpoint)
      postSegs = Vector.empty
      postSeqs = Vector.empty
      decisionSegs = Vector.empty
    }

    private[graft] def fold(batchPostings: DataFrame): Unit = synchronized {
      batchIdx += 1
      // A PQ gate's standing segments carry a `codes` column; derive it
      // here when the incoming projection lacks it (the generic
      // ingest()/gateStream path hands over caller-projected postings
      // verbatim), so every entry path — foldRaw, ingest, streaming —
      // folds identically. Map-side, one narrow pass, no shuffle.
      val coded = pqCbNow match {
        case Some(cb) if !batchPostings.columns.contains("codes") =>
          encodePq(batchPostings, cb)
        case _ => batchPostings
      }
      val bp = coded.transform(graft.ops.Ckpt.fresh)
      val decisionSeg = pqCbNow.fold(
          graft.ops.Similarity.ivfAnnotateBatch(
            postingsNow, bp, closure, nprobe, shortlist, k))(cb =>
          graft.ops.Similarity.ivfAnnotateBatchPq(
            postingsNow, bp, closure, cb, nprobe, shortlist, k,
            residualCentInt = pqCentIntNow,
            rerankFloat = rerankFloat))
        .select(col("query_id"), lit(batchIdx).as("batch"),
          col("rank"), col("neighbor_id"))
        .transform(graft.ops.Ckpt.fresh)
      decisionSegs = decisionSegs :+ decisionSeg
      // delta-authoritative: a re-ingested id supersedes its standing
      // posting. The fold's anti-join prefers the delta immediately;
      // both versions stay visible to OTHER queries until the next
      // compaction (the LSM multi-version window), where the
      // newest-wins dedupe physically drops the superseded copy.
      postSegs = postSegs :+ bp
      postSeqs = postSeqs :+ batchIdx
      foldsSinceCompact += 1
      if (foldsSinceCompact >= compactEvery) {
        val (oldP, oldD) = (postSegs, decisionSegs)
        var deduped = dedupedPostings.transform(graft.ops.Ckpt.fresh)
        // Occupancy-triggered auto-reseed (the LSM auto-B analog the
        // embedding gate runs for its plane count): when mean cell
        // occupancy crosses the target, DOUBLE the centroid count —
        // geometric growth bounds reseeds to O(log corpus) over the
        // gate's lifetime, and the doubling rule is SQL-replayable
        // (the q127 oracle models the widened closure as "lowest 2nc
        // ids of the corpus at the reseed fold"). The deduped corpus
        // requantizes once, map-side; probes from the NEXT fold on
        // use the wider closure, keeping per-batch probed-cell mass
        // (≈ nprobe × occupancy) bounded as the corpus grows.
        if (targetCellOccupancy > 0L) {
          val n = deduped.count()
          var nc = closure.numCentroids
          while (n > targetCellOccupancy * nc) nc *= 2
          if (nc != closure.numCentroids) {
            val raw = deduped.select(col("vec_id"),
              graft.ops.Similarity.unpackUdf(col("fv")).as("v"))
            val cc = graft.ops.Similarity.CentroidClosure.fromInitial(
              raw, "vec_id", "v", nc)
            // residual table follows the widened closure before any
            // re-encode (encodePq reads it)
            pqCentIntNow = pqCentIntNow.map(_ =>
              graft.ops.Similarity.latticeCentroids(raw, "vec_id", "v", cc.cids))
            val reposted = graft.ops.Similarity
              .quantizedPostings(raw, "vec_id", "v", cc)
            val requantized = pqCbNow.fold(reposted)(cb => encodePq(reposted, cb))
              .transform(graft.ops.Ckpt.fresh)
            releaseCheckpoint(deduped)
            deduped = requantized
            closure = cc
          }
        }
        // Codebook drift gate: a bounded sampled exact-vs-ADC recall
        // measurement (integer mean — deterministic), retrain + recode
        // when it falls under the floor. Cost: one corpus scan per
        // compaction against a ≤sampleCap broadcast query side (the
        // allowlisted ADC-scan class), zero when disabled.
        if (pqCbNow.isDefined &&
            (pqRefreshMinRecallX100 > 0L || pqRefreshDropFracX100 > 0L)) {
          val cb = pqCbNow.get
          val meanX100 = pqCentIntNow match {
            case Some(ci) =>
              // residual judge: scores with the serving estimate
              // dot(q, cent) + residual-ADC over the same sample
              graft.ops.Similarity.pqMeanRecallX100Residual(
                deduped, cb, ci, k, pqRefreshSampleCap)
            case None =>
              val raw = deduped.select(col("vec_id"),
                graft.ops.Similarity.unpackUdf(col("fv")).as("v"))
              graft.ops.Similarity.pqMeanRecallX100(
                raw, "vec_id", "v", cb, k, pqRefreshSampleCap)
          }
          val absTrip = pqRefreshMinRecallX100 > 0L &&
            meanX100 < pqRefreshMinRecallX100
          // SINGLE-STEP comparison: density decay is smooth at the
          // compaction cadence (a few percent per compaction — any
          // longer window's mean LAGS the decay and misreads the
          // cumulative slope as drift), while genuine distribution
          // drift lands abruptly between two compactions. So the
          // trigger compares against the PREVIOUS measurement only;
          // the 4-entry history is observability (pqRecallHistory —
          // read the plateau there when sizing an absolute floor).
          val relTrip = pqRefreshDropFracX100 > 0L && pqRecallHist.nonEmpty &&
            meanX100 * 100L < pqRefreshDropFracX100 * pqRecallHist.last
          if (absTrip || relTrip) {
            val ncb = pqCentIntNow match {
              case Some(ci) => graft.ops.Similarity.pqTrainResidualCodebooksFromPostings(
                deduped, ci, cb.length, cb.map(_.length).max, pqTrainIters)
              case None =>
                val raw = deduped.select(col("vec_id"),
                  graft.ops.Similarity.unpackUdf(col("fv")).as("v"))
                graft.ops.Similarity.pqTrainCodebooksInt(
                  raw, "vec_id", "v", cb.length, cb.map(_.length).max, pqTrainIters)
            }
            val recoded = encodePq(deduped.drop("codes"), ncb)
              .transform(graft.ops.Ckpt.fresh)
            releaseCheckpoint(deduped)
            deduped = recoded
            pqCbNow = Some(ncb)
            pqRefreshes += 1
            // refreshed codebooks are a NEW baseline — the drifted
            // measurement must not pollute the trailing mean
            pqRecallHist = Vector.empty
          } else {
            pqRecallHist = (pqRecallHist :+ meanX100).takeRight(4)
          }
        }
        postSegs = Vector(deduped)
        postSeqs = Vector(batchIdx)
        decisionSegs = Vector(decisions.transform(graft.ops.Ckpt.fresh))
        foldsSinceCompact = 0
        (oldP ++ oldD).foreach(releaseCheckpoint)
      }
    }
  }

  /** Construct a standalone [[VectorIndexGate]]: centroid closure from
    * the `numCentroids` lowest ids of the initial corpus, postings
    * from the whole of it. */
  def newVectorIndexGate(
      initialCorpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCentroids: Int,
      nprobe: Int = 2,
      shortlist: Int = 40,
      k: Int = 10,
      compactEvery: Int = 8,
      targetCellOccupancy: Long = 0L,
      // pqM > 0 turns on the PQ sidecar: codebooks train ONCE on the
      // initial corpus's deterministic sample (the q160 trainer) and
      // the shortlist is scored by integer ADC over 8-byte codes.
      pqM: Int = 0,
      pqKsub: Int = 256,
      pqIters: Int = 2,
      // drift gate: mean sampled ADC recall@k (×100) floor; 0 = never
      // retrain (the q164 contract). See VectorIndexGate's scaladoc
      // for the floor-sizing recipe and the relative auto-trigger.
      pqRefreshMinRecallX100: Long = 0L,
      pqRefreshSampleCap: Int = 256,
      // relative drift trigger: fire when a compaction's recall falls
      // under this fraction (×100) of the PREVIOUS compaction's
      // measurement (single-step comparison — deliberately not a
      // trailing-window mean, which thrashes on genuine density
      // decay; see the class scaladoc); 0 = off.
      pqRefreshDropFracX100: Long = 0L,
      // IVFADC (round 14): codes quantize each posting's RESIDUAL to
      // its cell's lattice centroid instead of the raw vector —
      // tighter codes at the same bytes; the shortlist scores
      // dot(q, cent) + residual-ADC and the centroid table rides the
      // manifest's pqcents slot. Requires pqM > 0.
      pqResidual: Boolean = false,
      rerankFloat: Boolean = true): VectorIndexGate = {
    require(!pqResidual || pqM > 0, "pqResidual needs the PQ sidecar (pqM > 0)")
    val cc = graft.ops.Similarity.CentroidClosure.fromInitial(
      initialCorpus, idCol, vecCol, numCentroids)
    val centInt =
      if (!pqResidual) None
      else Some(graft.ops.Similarity.latticeCentroids(
        initialCorpus, idCol, vecCol, cc.cids))
    val postings = graft.ops.Similarity.quantizedPostings(
      initialCorpus, idCol, vecCol, cc)
    val cb =
      if (pqM <= 0) None
      else if (pqResidual) Some(graft.ops.Similarity.pqTrainResidualCodebooksFromPostings(
        postings, centInt.get, pqM, pqKsub, pqIters))
      else Some(graft.ops.Similarity.pqTrainCodebooksInt(
        initialCorpus, idCol, vecCol, pqM, pqKsub, pqIters))
    new VectorIndexGate(
      cb.fold(postings)(c => centInt match {
        case Some(ci) => graft.ops.Similarity.withPqCodesResidual(postings, c, ci)
        case None => graft.ops.Similarity.withPqCodes(postings, c)
      }),
      cc, nprobe, shortlist, k, compactEvery,
      targetCellOccupancy = targetCellOccupancy,
      pqCb = cb,
      pqRefreshMinRecallX100 = pqRefreshMinRecallX100,
      pqRefreshSampleCap = pqRefreshSampleCap,
      pqRefreshDropFracX100 = pqRefreshDropFracX100,
      pqTrainIters = pqIters,
      pqResidualCentInt = centInt,
      rerankFloat = rerankFloat)
  }

  /** Resume a [[VectorIndexGate]] from `store`'s latest committed
    * manifest; nprobe/shortlist/k must match the persisting gate's
    * (validated against the meta slot — a mismatch would change which
    * neighbors past decisions were allowed to see). The centroid
    * closure restores from its own slot, so the resumed index probes
    * the identical cells. */
  def resumeVectorIndexGate(
      store: graft.bulk.ManifestStore,
      nprobe: Int = 2,
      shortlist: Int = 40,
      k: Int = 10,
      compactEvery: Int = 8,
      targetCellOccupancy: Long = 0L,
      pqRefreshMinRecallX100: Long = 0L,
      pqRefreshSampleCap: Int = 256,
      pqRefreshDropFracX100: Long = 0L,
      pqTrainIters: Int = 2,
      rerankFloat: Boolean = true): VectorIndexGate = {
    val postings = store.read("postings").getOrElse(throw new IllegalStateException(
      s"no committed vector-index state in '${store.name}' (missing 'postings' slot)"))
    val cents = store.read("centroids").getOrElse(throw new IllegalStateException(
      s"vector-index manifest in '${store.name}' has no 'centroids' slot"))
    val meta = store.read("meta").getOrElse(throw new IllegalStateException(
      s"vector-index manifest in '${store.name}' has no 'meta' slot")).head()
    require(meta.getAs[Int]("nprobe") == nprobe &&
        meta.getAs[Int]("shortlist") == shortlist && meta.getAs[Int]("k") == k,
      s"vector-index manifest in '${store.name}' was persisted with " +
        s"nprobe=${meta.getAs[Int]("nprobe")} shortlist=${meta.getAs[Int]("shortlist")} " +
        s"k=${meta.getAs[Int]("k")} but resume requested " +
        s"nprobe=$nprobe shortlist=$shortlist k=$k")
    new VectorIndexGate(postings,
      graft.ops.Similarity.CentroidClosure.fromFrame(cents),
      nprobe, shortlist, k, compactEvery,
      targetCellOccupancy = targetCellOccupancy,
      restoredDecisions = store.read("decisions"),
      initialBatchIdx = meta.getAs[Long]("batch_idx"),
      pqCb = store.read("pqcb").map(graft.ops.Similarity.pqCbFromFrame),
      pqRefreshMinRecallX100 = pqRefreshMinRecallX100,
      pqRefreshSampleCap = pqRefreshSampleCap,
      pqRefreshDropFracX100 = pqRefreshDropFracX100,
      pqTrainIters = pqTrainIters,
      // presence of the pqcents slot IS the residual flag — a direct
      // PQ (or int8) gate never stages it
      pqResidualCentInt = store.read("pqcents").map(_.collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap),
      rerankFloat = rerankFloat)
  }

  /** Wire any [[IngestGate]] — live-constructed or resumed from a
    * manifest — to a Structured Streaming source via foreachBatch,
    * durably committing the gate's standing state to `store` every
    * `persistEvery` folds (one manifest-CAS version per commit): the
    * production restartable-ingest shape. On driver loss, resume the
    * gate from the store's latest committed version
    * (`resumeDedupGate`/`resumeWinnowGate`/…) and re-feed the source
    * from the offsets of that commit — the gates' decision
    * immutability plus restore ≡ compaction make the replay
    * fold-for-fold identical to the uninterrupted run
    * (GateStreamSpec, GatePersistenceSpec, the q104–q124 restart
    * legs). Each commit stages the FULL standing state (the
    * restore-≡-compact contract's price): choose `persistEvery` so
    * the amortized commit cost stays below the fold cost — the
    * per-batch tables in BASELINE.md give both sides.
    */
  def gateStream(
      gate: IngestGate,
      batches: DataFrame,
      store: Option[graft.bulk.ManifestStore] = None,
      persistEvery: Int = 8): org.apache.spark.sql.streaming.StreamingQuery = {
    require(persistEvery >= 1, "persistEvery must be >= 1")
    val folds = new java.util.concurrent.atomic.AtomicLong(0L)
    batches.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        gate.ingest(batch)
        if (store.isDefined && folds.incrementAndGet() % persistEvery == 0)
          store.foreach(gate.persist(_))
      }
      .start()
  }

  /** Run [[DedupGate]] over a streaming frame of documents via
    * [[gateStream]]. Returns the live gate handle + the query.
    */
  def dedupGateStream(
      docs: DataFrame,
      initialCorpus: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3, numPerm: Int = 64, bands: Int = 16,
      num: Int = 1, den: Int = 2): (DedupGate, org.apache.spark.sql.streaming.StreamingQuery) = {
    val gate = new DedupGate(initialCorpus, idCol, textCol, k, numPerm, bands, num, den)
    (gate, gateStream(gate, docs))
  }

  /** Per-broadcast episode/node counts over the episode stream. */
  def episodeStats(episodes: DataFrame): DataFrame =
    episodes
      .groupBy(col("broadcast_id"))
      .agg(
        approx_count_distinct(col("episode_ts")).as("n_episodes"),
        count(lit(1)).as("n_rows"),
        max(col("episode_ts")).as("last_updated"))
}
