package graft

import graft.ops.AsOfJoin
import graft.plans.{AsOfJoinExec, NativeAsOf}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of join (custom LogicalPlan + Strategy + SparkPlan)
  * against the composed union+window operator as the executable spec,
  * on the driver's events table.
  */
class NativeAsOfSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-native-asof-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("native as-of equals the composed union+window as-of") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_id").as("click_id"))

    val native = NativeAsOf.leftAsOf(purchases, clicks,
        "user_id", "r_user", "ts", "r_ts")
      .select(col("event_id"), col("click_id"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet

    val composed = AsOfJoin.leftAsOf(
        purchases,
        clicks.select(col("r_user").as("user_id"), col("r_ts").as("ts"), col("click_id")),
        leftKey = "user_id", rightKey = "user_id",
        leftTs = "ts", rightTs = "ts",
        rightVals = Seq("click_id"))
      .select(col("event_id"), col("click_id"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet

    assert(native.nonEmpty)
    assert(native === composed)
  }

  test("the physical plan contains AsOfJoinExec (no union, no window)") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L), (1L, 20L), (2L, 15L)).toDF("k", "t")
    val right = Seq((1L, 5L, "a"), (1L, 20L, "b"), (2L, 99L, "c")).toDF("rk", "rt", "v")
    val joinedDf = NativeAsOf.leftAsOf(left, right, "k", "rk", "t", "rt")
    val plan = joinedDf.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))

    val rows = joinedDf.select(col("k"), col("t"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)).getOrElse("-")))
      .toSet
    // inclusive match at equal ts; key 2 has no right row <= 15
    assert(rows === Set((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "-")))
  }

  test("null keys and timestamps never match and never crash") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (Some(1L), Some(10L), "l1"),
      (None, Some(10L), "lnullkey"),
      (Some(1L), None, "lnullts"),
      (Some(2L), Some(50L), "l2")
    ).toDF("k", "t", "lv")
    val right = Seq(
      (Some(1L), Some(5L), "r1"),
      (None, Some(1L), "rnullkey"), // sorts first; must be skipped
      (Some(2L), None, "rnullts"), // null ts: never a match
      (Some(2L), Some(40L), "r2")
    ).toDF("rk", "rt", "v")
    val rows = NativeAsOf.leftAsOf(left, right, "k", "rk", "t", "rt")
      .select(col("lv"), col("v")).collect()
      .map(r => (r.getString(0), Option(r.getString(1)).getOrElse("-")))
      .toSet
    // all 4 left rows survive (left-join), null-key/ts left rows pad,
    // null-key/ts right rows match nothing
    assert(rows === Set(
      ("l1", "r1"), ("lnullkey", "-"), ("lnullts", "-"), ("l2", "r2")))
  }

  test("duplicate right timestamps resolve to the last in sort order; empty right yields nulls") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq.empty[(Long, Long, String)].toDF("rk", "rt", "v")
    val out = NativeAsOf.leftAsOf(left, right, "k", "rk", "t", "rt")
      .select(col("v")).collect()
    assert(out.length === 1 && out.head.isNullAt(0))
  }
}
