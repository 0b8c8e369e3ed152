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
