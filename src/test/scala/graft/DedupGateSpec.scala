package graft

import graft.streaming.Streams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Online ingest dedup gate (Streams.dedupGateStream): near-dups are
  * rejected against the standing corpus AND within a batch, clean docs
  * fold into the corpus, and later batches are checked against
  * everything earlier batches admitted.
  */
class DedupGateSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-dedupgate-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.streaming.checkpointLocation",
      java.nio.file.Files.createTempDirectory("graft-gate-ckpt").toString)
    .getOrCreate()

  final case class Doc(doc_id: Long, text: String)

  test("batches reject vs corpus and within-batch; admitted docs gate later batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")

    val input = MemoryStream[Doc]
    val (gate, query) = Streams.dedupGateStream(
      input.toDF(), corpus, "doc_id", "text")
    try {
      // batch 1: 10 dups corpus doc 1 (reject vs corpus); 11/12 are
      // near-dups of each other (higher id 12 rejected within batch);
      // 13 is novel
      input.addData(
        Doc(10L, "the quick brown fox jumps over the lazy dog"),
        Doc(11L, "brand new content first variant here today"),
        Doc(12L, "brand new content first variant here today"),
        Doc(13L, "completely different and unrelated text"))
      query.processAllAvailable()
      val r1 = gate.rejected.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(r1.keySet === Set(10L, 12L))
      assert(r1(10L) === "near-dup of corpus")
      assert(r1(12L) === "near-dup within batch")
      // Cluster state after batch 1: rejected docs are members too —
      // 10 joins corpus doc 1's component, the within-batch pair
      // {11,12} roots at 11, the rest are singletons.
      assert(clusters(gate) === Map(
        1L -> 1L, 2L -> 2L, 10L -> 1L, 11L -> 11L, 12L -> 11L, 13L -> 13L))

      // batch 2: 20 dups doc 11 — admitted only in batch 1, so the
      // rejection proves the corpus actually grew
      input.addData(
        Doc(20L, "brand new content first variant here today"),
        Doc(21L, "yet another novel document entirely fresh"))
      query.processAllAvailable()
      val r2 = gate.rejected.collect().map(_.getLong(0)).toSet
      assert(r2 === Set(10L, 12L, 20L))

      val ids = gate.corpusNow.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 2L, 11L, 13L, 21L))
      // 20 folded into the {11,12} cluster across batches.
      assert(clusters(gate) === Map(
        1L -> 1L, 2L -> 2L, 10L -> 1L, 11L -> 11L, 12L -> 11L, 13L -> 13L,
        20L -> 11L, 21L -> 21L))
    } finally query.stop()
  }

  private def clusters(gate: Streams.DedupGate): Map[Long, Long] =
    gate.clustersNow.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cluster maintenance merges standing components and survives compaction") {
    val s = spark
    import s.implicits._
    // Docs 5 and 6 carry identical text but seed as SINGLETONS (the
    // initial corpus is never self-checked) — the merge must come from
    // a later batch's pair stream.
    val shared = "xx yy zz ww vv uu tt ss"
    val corpus = Seq((5L, shared), (6L, shared)).toDF("doc_id", "text")
    val gate = Streams.newDedupGate(corpus, "doc_id", "text", compactEvery = 2)

    // b1: 40 dups BOTH standing docs -> components {5} and {6} merge
    // under min root 5; 40 itself is rejected but stays a member.
    gate.ingest(Seq((40L, shared)).toDF("doc_id", "text"))
    assert(clusters(gate) === Map(5L -> 5L, 6L -> 5L, 40L -> 5L))

    // b2: a fresh within-batch near-dup pair; this fold triggers the
    // compactEvery=2 compaction (remap folds into base, resets).
    val novel = "aa bb cc dd ee ff gg hh"
    gate.ingest(Seq((41L, novel), (42L, novel)).toDF("doc_id", "text"))
    assert(clusters(gate) === Map(
      5L -> 5L, 6L -> 5L, 40L -> 5L, 41L -> 41L, 42L -> 41L))

    // b3 (post-compaction): joins the folded {41,42} cluster.
    gate.ingest(Seq((43L, novel)).toDF("doc_id", "text"))
    assert(clusters(gate) === Map(
      5L -> 5L, 6L -> 5L, 40L -> 5L, 41L -> 41L, 42L -> 41L, 43L -> 41L))

    // b4: joins the MERGED {5,6,40} cluster via the standing side —
    // the folded labels must still carry the pre-compaction merge.
    gate.ingest(Seq((44L, shared)).toDF("doc_id", "text"))
    val finalClusters = clusters(gate)
    assert(finalClusters === Map(
      5L -> 5L, 6L -> 5L, 40L -> 5L, 41L -> 41L, 42L -> 41L, 43L -> 41L,
      44L -> 5L))
    // Independent cross-check: a batch rebuild over every doc seen and
    // every pair the gate could have discovered labels identically.
    val allIds = Seq(5L, 6L, 40L, 41L, 42L, 43L, 44L).toDF("id")
    val allPairs = Seq(
      (40L, 5L), (40L, 6L), (41L, 42L), (43L, 41L), (43L, 42L),
      (44L, 5L), (44L, 6L)).toDF("id_a", "id_b")
    val rebuilt = graft.ops.Components.dedupClusters(allIds, allPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(finalClusters === rebuilt)
  }

  test("a non-integral-id gate dedups but exposes no cluster surface") {
    val s = spark
    import s.implicits._
    val corpus = Seq(("a", "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val gate = Streams.newDedupGate(corpus, "doc_id", "text")
    gate.ingest(Seq(("b", "the quick brown fox jumps over the lazy dog"),
      ("c", "unrelated fresh text entirely new")).toDF("doc_id", "text"))
    assert(gate.rejected.collect().map(_.getString(0)).toSet === Set("b"))
    intercept[IllegalArgumentException](gate.clustersNow)
  }

  final case class SDoc(doc_id: String, text: String)

  test("the rejection log keeps a non-long id type (lazy first-batch init)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val corpus = Seq(("keep-a", "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val input = MemoryStream[SDoc]
    val (gate, query) = Streams.dedupGateStream(input.toDF(), corpus, "doc_id", "text")
    try {
      input.addData(SDoc("dup-b", "the quick brown fox jumps over the lazy dog"))
      query.processAllAvailable()
      val rej = gate.rejected.collect().map(r => (r.getString(0), r.getString(1)))
      assert(rej.toSeq === Seq(("dup-b", "near-dup of corpus")))
    } finally query.stop()
  }

  test("loop-carried state is bounded: plan width, cached blocks, and rejects survive compaction") {
    val s = spark
    import s.implicits._
    // fresh baseline for cached-RDD accounting
    s.sharedState.cacheManager.clearCache()
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val gate = Streams.newDedupGate(corpus, "doc_id", "text", compactEvery = 3)
    // Baseline BEFORE the folds: suites share the forked test JVM's
    // SparkSession, so blocks left by earlier suites (gate specs hold
    // live carried checkpoints) must not count against THIS gate's
    // growth bound — the assertion below is on the delta.
    val cachedBefore = s.sparkContext.getRDDStorageInfo.length
    val nBatches = 10
    (1 to nBatches).foreach { b =>
      // one duplicate of the seed (always rejected) + one novel doc per batch
      gate.ingest(Seq(
        (100L + b, "the quick brown fox jumps over the lazy dog"),
        (200L + b, s"novel content number $b entirely different words ${('a' + b).toChar}"))
        .toDF("doc_id", "text"))
    }
    // every batch's duplicate rejected, novels admitted — correctness
    // across multiple compaction boundaries (10 folds, compactEvery=3)
    val rejects = gate.rejected.collect().map(_.getLong(0)).toSet
    assert(rejects === (1 to nBatches).map(100L + _).toSet)
    assert(gate.corpusNow.count() === 1L + nBatches)
    // plan width bounded by the compaction window, NOT the batch count:
    // after 10 folds at compactEvery=3 the union has at most
    // compactEvery+1 segments
    def leaves(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collectLeaves().size
    assert(leaves(gate.corpusNow) <= 4, s"corpus plan grew: ${leaves(gate.corpusNow)} leaves")
    assert(leaves(gate.indexNow) <= 4, s"index plan grew: ${leaves(gate.indexNow)} leaves")
    // block-manager residue bounded: live checkpoints are the carried
    // segments + rejection log plus a handful of GC-pending transients
    // (per-batch candidate/flagged checkpoints are reclaimed by the
    // ContextCleaner, not eagerly) — far below one-per-batch growth,
    // which would sit at ≥40 here (4+ transient checkpoints × 10
    // batches on top of the carried frames)
    val cached = s.sparkContext.getRDDStorageInfo.length - cachedBefore
    assert(cached <= 25, s"cached RDDs grew with batch count: $cached new blocks")
  }

  test("broadcastDelta plan: the standing index streams through broadcast joins, never a shuffle") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.{RDDScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec}
    // static plans (AQE off) so the assertion sees the planner's choice,
    // not a runtime rewrite that would mask a scale-unsafe static plan
    val aqeBefore = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val standing = (1L to 50L)
        .map(i => (i, s"standing document number $i with plenty of words here"))
        .toDF("doc_id", "text")
      val index = graft.ops.Dedup.minhashBandKeys(
        standing, "doc_id", "text", 3, 64, 16).localCheckpoint()
      val delta = Seq((100L, "standing document number 7 with plenty of words here"))
        .toDF("doc_id", "text")
      // audit the candidate stage itself: the full operator
      // localCheckpoints this frame, detaching it from the final plan
      val cand = graft.ops.Dedup.lshDeltaCandidates(
        index, delta, "doc_id", "text", 3, 64, 16, broadcastDelta = true)

      // The index's localCheckpoint scan (id, band, key). Downstream
      // aggregates/joins over candidate-bounded frames may shuffle —
      // that is fine. What must NOT happen is the INDEX side itself
      // being exchanged into its join: every join the index scan feeds
      // DIRECTLY (reached without crossing another join, i.e. the scan
      // is that side's input relation) must be a broadcast hash join
      // with no shuffle on the path from scan to join.
      def isIndexScan(p: SparkPlan): Boolean = p match {
        case r: RDDScanExec =>
          val names = r.output.map(_.name).toSet
          names.contains("band") && names.contains("key")
        case _ => false
      }
      // path from this node down to the index scan, crossing no join
      def directPath(p: SparkPlan): Option[Seq[SparkPlan]] =
        if (isIndexScan(p)) Some(Seq(p))
        else p match {
          case _: BaseJoinExec => None
          case _ => p.children.flatMap(directPath).headOption.map(p +: _)
        }
      val exec = cand.queryExecution.executedPlan
      val joinsFedByIndex = exec.collect {
        case j: BaseJoinExec =>
          j.children.flatMap(directPath).headOption.map(path => (j, path))
      }.flatten
      assert(joinsFedByIndex.nonEmpty, "expected the index scan to feed a join directly\n" + exec)
      joinsFedByIndex.foreach { case (j, path) =>
        assert(j.isInstanceOf[BroadcastHashJoinExec],
          s"index-side join is ${j.getClass.getSimpleName}, not broadcast:\n$j")
        assert(!path.exists(_.isInstanceOf[ShuffleExchangeExec]),
          s"index side passes through a shuffle before its join:\n$j")
      }
      // and the full operator's result is still the right one
      val pairs = graft.ops.Dedup.minhashLshDeltaPairsIndexed(
        index, standing, delta, "doc_id", "text", 3, 64, 16, 1, 2, broadcastDelta = true)
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSeq === Seq((100L, 7L)))
    } finally s.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }
}
