package graft

import graft.ops.Components
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** DataFrame-native alternating star contraction vs the GraphX Pregel
  * CC it replaced: identical (doc_id, component_id) labeling — the
  * component minimum — on randomized graphs, chains (the log-round
  * contraction case), and the degenerate shapes (empty pair set,
  * self-loops, duplicated/reversed pairs).
  */
class ComponentsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-components-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(ids: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.dedupClusters(
        ids.toDF("id"), pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def runGraphX(ids: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.dedupClustersGraphX(
        ids.toDF("id"), pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("random graphs: native star contraction matches GraphX exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    for (seed <- Seq(7, 21, 99)) {
      val rnd = new Random(seed)
      val n = 120
      val ids = (0L until n).toSeq
      // Sparse random pairs (~0.8 * n edges): a mix of small clusters,
      // chains and singletons, like real near-dup output.
      val pairs = Seq.fill((n * 0.8).toInt) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      val native = run(ids, pairs)
      val graphx = runGraphX(ids, pairs)
      assert(native === graphx, s"divergence at seed=$seed")
      assert(native.size === n)
      // Both contraction regimes agree: the single-task union-find
      // (production fast path at this size) and the log-round star
      // loop (forced via cap=0).
      val loopLabels = Components.starContract(
          pairs.toDF("u", "v").select(col("u"), col("v")), singleTaskCap = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      loopLabels.foreach { case (d, c) =>
        assert(native(d) === c, s"loop-path divergence at seed=$seed doc=$d")
      }
    }
  }

  test("long chain contracts to one component rooted at the minimum") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val n = 257L // odd, > 2^8: forces multiple contraction rounds
    val ids = 0L until n
    val pairs = (0L until n - 1).map(i => (i + 1, i)) // reversed order on purpose
    val native = run(ids, pairs)
    assert(native.values.toSet === Set(0L))
    // The star loop (cap=0) must also collapse the chain — the
    // logarithmic-round case the fast path never exercises.
    val loop = Components.starContract(
        pairs.toDF("u", "v").select(col("u"), col("v")), singleTaskCap = 0L)
      .collect().map(r => r.getLong(1)).toSet
    assert(loop === Set(0L))
  }

  test("empty pair set: every doc is its own singleton component") {
    val ids = Seq(3L, 8L, 15L)
    assert(run(ids, Seq.empty) === Map(3L -> 3L, 8L -> 8L, 15L -> 15L))
  }

  test("self-loops, duplicates and reversed pairs do not perturb labels") {
    val ids = 0L to 6L
    val pairs = Seq((1L, 2L), (2L, 1L), (2L, 2L), (1L, 2L), (4L, 5L), (5L, 6L), (6L, 4L))
    val native = run(ids, pairs)
    assert(native === Map(
      0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 4L, 6L -> 4L))
  }

  private def runDelta(
      standing: Map[Long, Long],
      deltaIds: Seq[Long],
      deltaPairs: Seq[(Long, Long)],
      cap: Long = Components.SingleTaskEdgeCap): Map[Long, Long] = {
    import spark.implicits._
    Components.dedupClustersDelta(
        standing.toSeq.toDF("doc_id", "component_id"),
        deltaIds.toDF("id"),
        deltaPairs.toDF("id_a", "id_b"),
        singleTaskCap = cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("delta fold == full recompute over the union (random graphs, both regimes)") {
    for (seed <- Seq(5, 42, 333)) {
      val rnd = new Random(seed)
      val n = 140
      val standingIds = (0L until 90L).toSeq
      val deltaIds = (90L until n).toSeq
      val allPairs = Seq.fill((n * 1.1).toInt) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      // Standing edges live wholly inside the standing corpus; every
      // pair touching a delta doc arrives with the batch — the dedup
      // delta operators' exact output contract.
      val (standingPairs, deltaPairs) =
        allPairs.partition { case (a, b) => a < 90L && b < 90L }
      val standingLabels = run(standingIds, standingPairs)
      val full = run(standingIds ++ deltaIds, standingPairs ++ deltaPairs)
      assert(runDelta(standingLabels, deltaIds, deltaPairs) === full,
        s"delta fold divergence at seed=$seed")
      assert(runDelta(standingLabels, deltaIds, deltaPairs, cap = 0L) === full,
        s"star-loop delta fold divergence at seed=$seed")
      // the session knob forces the DISTRIBUTED regime through the
      // gates' default-cap call path (the backfill/bench hook) — same
      // labels as the fused micro-batch regime
      spark.conf.set("spark.graft.relabelBroadcastCap", "0")
      try assert(runDelta(standingLabels, deltaIds, deltaPairs) === full,
        s"conf-forced shuffle regime divergence at seed=$seed")
      finally spark.conf.unset("spark.graft.relabelBroadcastCap")
    }
  }

  test("successive delta folds stay canonical (3 batches == one full recompute)") {
    val rnd = new Random(17)
    val n = 160
    val cut = Seq(60L, 100L, 130L, 160L)
    val allPairs = Seq.fill(200)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    var labels = run(0L until cut.head, allPairs.filter {
      case (a, b) => a < cut.head && b < cut.head })
    for (i <- 1 until cut.length) {
      val (lo, hi) = (cut(i - 1), cut(i))
      val batchIds = lo until hi
      val batchPairs = allPairs.filter { case (a, b) =>
        (a < hi && b < hi) && (a >= lo || b >= lo) }
      labels = runDelta(labels, batchIds, batchPairs)
      val full = run(0L until hi, allPairs.filter { case (a, b) => a < hi && b < hi })
      assert(labels === full, s"divergence after batch $i")
    }
  }

  test("delta edge merging two standing components relabels both to the joint min") {
    // Standing: {1,2,3} rooted at 1, {10,11} rooted at 10. New doc 20
    // bridges them; a second new doc 0 then undercuts the min.
    val standing = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    val merged = runDelta(standing, Seq(20L), Seq((3L, 20L), (20L, 11L)))
    assert(merged === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L, 20L -> 1L))
    val undercut = runDelta(merged, Seq(0L), Seq((0L, 20L)))
    assert(undercut.values.toSet === Set(0L))
  }

  test("deltaRelabel emits only changed roots; untouched components never appear") {
    import spark.implicits._
    val standing = Map(1L -> 1L, 2L -> 1L, 50L -> 50L, 51L -> 50L, 90L -> 90L)
    val d = Components.deltaRelabel(
      standing.toSeq.toDF("doc_id", "component_id"),
      Seq(100L).toDF("id"),
      Seq((2L, 100L)).toDF("id_a", "id_b"))
    // 100 joins component 1: the only changed root is 100's self-root
    // (100 -> 1); roots 1, 50, 90 keep their labels and stay absent.
    val rm = d.rootMap.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rm === Map(100L -> 1L))
    val nd = d.newDocLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nd === Map(100L -> 1L))
  }

  test("re-ingested delta id keeps a single row with a consistent label") {
    val standing = Map(1L -> 1L, 2L -> 1L, 3L -> 3L)
    val out = runDelta(standing, Seq(2L, 7L), Seq((2L, 3L)))
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L))
    // Map construction would mask duplicates — assert row count too.
    import spark.implicits._
    val rows = Components.dedupClustersDelta(
        standing.toSeq.toDF("doc_id", "component_id"),
        Seq(2L, 7L).toDF("id"),
        Seq((2L, 3L)).toDF("id_a", "id_b"))
      .count()
    assert(rows === 4L)
  }

  test("two stars joined by a bridge merge under the bridge's min") {
    // Hub 10 with leaves 11..14, hub 20 with leaves 21..24, bridge 14-24.
    val ids = Seq(10L, 11L, 12L, 13L, 14L, 20L, 21L, 22L, 23L, 24L)
    val pairs = Seq(11L, 12L, 13L, 14L).map(l => (10L, l)) ++
      Seq(21L, 22L, 23L, 24L).map(l => (20L, l)) :+ (14L, 24L)
    val native = run(ids, pairs)
    assert(native.values.toSet === Set(10L))
    assert(native === runGraphX(ids, pairs))
  }
}
