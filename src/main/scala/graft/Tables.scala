package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampNTZType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Money/discount columns carry 2-decimal semantics stored as double;
  * `Money` casts them to DECIMAL(18,2) so aggregation is exact and
  * order-independent — required for bit-exact oracle (DuckDB) parity
  * and the right choice at 100 TB anyway (no FP drift across partition
  * orders / AQE re-plans).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped in two parquet encodings: TIMESTAMP(NANOS)
      // (which Spark 4 only maps to raw int64 under nanosAsLong) and
      // TIMESTAMP_MICROS without UTC adjustment (→ TIMESTAMP_NTZ).
      // Branch on the LOADED dtype so both normalize to TimestampType
      // epoch-micros, matching DuckDB's view of the same file. Session
      // timezone is pinned to UTC, so the NTZ→TZ cast is an identity on
      // the stored micros value.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      val ts = raw.schema("ts").dataType match {
        case LongType         => timestamp_micros(expr("ts div 1000")) // nanos-as-long: exact floor to micros
        case TimestampNTZType => col("ts").cast("timestamp")
        case _                => col("ts") // already TimestampType
      }
      raw.withColumn("ts", ts)
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** DECIMAL(18,2) view of a 2-decimal double column (exact). */
  def money(c: String) = col(c).cast(DecimalType(18, 2))

  /** Fan an under-parallel frame out to defaultParallelism before
    * feeding a per-row kernel that fans work out (tokenize, shingle,
    * signature, decode). Scan partitions are sized for scan BYTES; a
    * small single-row-group parquet file is ONE partition, which would
    * run the whole map-side kernel stage serially. At cluster scale a
    * big scan already has >> defaultParallelism splits and this is a
    * no-op — the repartition only fires where it is cheap by
    * construction (the input is small enough to be under-parallel).
    */
  def fanOut(df: DataFrame): DataFrame = {
    // Only scan-stage (fully narrow) frames qualify: anything with a
    // shuffle-introducing operator gets (and sizes) its parallelism
    // from its own exchange — and, under AQE, touching .rdd on such a
    // plan would EXECUTE the upstream stages just to count partitions,
    // without shuffle reuse. Checked on the ANALYZED logical plan
    // (physical exchanges are only inserted at executedPlan time,
    // inside the AQE wrapper) with a default-DENY whitelist: an
    // unrecognized operator skips the optimization, never risks it.
    // .rdd on a narrow plan schedules no jobs.
    import org.apache.spark.sql.catalyst.plans.logical._
    def narrowOnly(p: LogicalPlan): Boolean = {
      val nodeOk = p match {
        case _: Project | _: Filter | _: Union | _: Generate | _: SubqueryAlias => true
        case r: Repartition => !r.shuffle // coalesce
        case _: LeafNode => true
        case _ => false
      }
      nodeOk && p.children.forall(narrowOnly)
    }
    if (!narrowOnly(df.queryExecution.analyzed)) return df
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
