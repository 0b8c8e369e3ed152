package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational substrate of the engine: scans, filters, aggregation,
  * joins (broadcast/semi/anti), windows, set ops, rollup, top-k.
  *
  * The reference has no relational operators of its own (SURVEY §2.9);
  * these exercise the Spark substrate every generalized operator is
  * built on, each with an exact DuckDB oracle.
  *
  * Numeric policy: all aggregated money flows through DECIMAL so
  * results are exact and independent of partition/aggregation order
  * (FP sums would drift under AQE re-plans at scale). OUTPUT columns
  * are then cast to plain int64/float64/string: the exact decimal sum
  * converts to the one nearest double on both engines (unscaled values
  * stay < 2^53 at oracle scale), while DECIMAL/DATE outputs round-trip
  * differently through arrow/pandas readers (Decimal('4.90') vs 4.9,
  * date vs timestamp) and break representation-level hashing.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)
  private val m = Tables.money _
  private def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 2)).cast("double")
  private def dec4(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 4)).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: single scan, map-side partial agg, 6 groups.
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-02").cast("date"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dec2(sum(m("l_quantity"))).as("sum_qty"),
          dec2(sum(m("l_extendedprice"))).as("sum_base_price"),
          dec4(sum(m("l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - m("l_discount"))))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // TPC-H Q6 shape: pure filter+scan reduction; predicate pushdown to parquet.
    "q02_forecast_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("date") &&
            col("l_shipdate") < lit("1998-01-01").cast("date") &&
            col("l_discount").between(0.03, 0.07) &&
            col("l_quantity") < 24)
        .agg(dec4(sum(m("l_extendedprice") * m("l_discount"))).as("revenue"))
    }),

    // Broadcast-hash join: fact × small dim (part is broadcastable at any SF
    // where dims stay ~1e6 rows; at 100 TB lineitem shuffles nothing here).
    "q03_revenue_by_brand" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          dec4(sum(m("l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - m("l_discount"))))
            .as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q3 shape: 3-way join, agg, top-k with deterministic tie-break.
    "q04_top_orders" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .agg(dec4(sum(m("l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - m("l_discount"))))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // Left-semi join (EXISTS).
    "q05_semi_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      o.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    }),

    // Left-anti join (NOT EXISTS).
    "q06_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
    }),

    // Window top-k per group with deterministic tie-break.
    "q07_topk_per_customer" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("rnk").cast("long").as("rnk"),
          col("o_orderkey"), col("o_totalprice").as("totalprice"))
    }),

    // Set ops on key domains.
    "q08_except_nations" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct()
      c.except(sup)
    }),
    "q09_intersect_nations" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct()
      c.intersect(sup)
    }),

    // Distinct aggregation per dim join.
    "q10_nation_profile" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          countDistinct(col("c_mktsegment")).as("n_segments"),
          count(lit(1)).as("n_customers"),
          dec2(sum(m("c_acctbal"))).as("sum_acctbal"))
    }),

    // Global top-k, deterministic.
    "q11_global_top_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice").as("totalprice"))
    }),

    // Latest-version-per-key window: the engine's MVCC "latest" primitive
    // (SURVEY §1.5) expressed over the events stream table.
    "q12_latest_event_per_user" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
    }),

    // Sessionization via lag(): gap > 30 min starts a new session.
    "q13_sessions_per_user" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1)
            .otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // Rollup (grouping sets) over a dim join.
    "q14_rollup_nation_segment" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"), dec2(sum(m("c_acctbal"))).as("sum_acctbal"))
    }),

    // Fixed-depth "descendants" over the star schema (region→nation→customer→orders):
    // the relational analog of the reference's subtree aggregation.
    "q15_region_rollout" -> ((s, dir) => {
      val r = t(s, dir, "region")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          countDistinct(col("c_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"),
          dec2(sum(m("o_totalprice"))).as("sum_totalprice"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= DATE '2000-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
           AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""",
    "q03_revenue_by_brand" ->
      """SELECT p_brand,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""",
    "q04_top_orders" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d')
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "q05_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
         GROUP BY o_orderpriority""",
    "q06_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY c_mktsegment""",
    "q07_topk_per_customer" ->
      """SELECT o_custkey, rnk, o_orderkey, o_totalprice AS totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
           FROM orders) WHERE rnk <= 3""",
    "q08_except_nations" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer
         EXCEPT SELECT DISTINCT s_nationkey AS nationkey FROM supplier""",
    "q09_intersect_nations" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer
         INTERSECT SELECT DISTINCT s_nationkey AS nationkey FROM supplier""",
    "q10_nation_profile" ->
      """SELECT n_name, count(DISTINCT c_mktsegment) AS n_segments, count(*) AS n_customers,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    "q11_global_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice AS totalprice
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
    "q12_latest_event_per_user" ->
      """SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1""",
    "q13_sessions_per_user" ->
      """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
           SELECT user_id,
                  CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                       THEN 1 ELSE 0 END AS new_session
           FROM events) GROUP BY user_id""",
    "q14_rollup_nation_segment" ->
      """SELECT n_name, c_mktsegment, count(*) AS n_customers,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY ROLLUP (n_name, c_mktsegment)""",
    "q15_region_rollout" ->
      """SELECT r_name, count(DISTINCT c_custkey) AS n_customers, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""")
}
