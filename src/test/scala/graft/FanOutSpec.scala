package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tables.fanOut contract: results unchanged, under-parallel narrow
  * frames gain partitions, and frames that already contain an exchange
  * are returned untouched (they get parallelism from their own
  * shuffle, and planning must not execute their upstream stages).
  */
class FanOutSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-fanout-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("under-parallel narrow frame fans out to defaultParallelism, same rows") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).toDF("x").coalesce(1)
    val fanned = Tables.fanOut(df)
    assert(fanned.rdd.getNumPartitions === s.sparkContext.defaultParallelism)
    assert(fanned.collect().map(_.getInt(0)).sorted === (1 to 100).toArray)
  }

  test("already-parallel frame is returned as-is") {
    val s = spark
    import s.implicits._
    val par = s.sparkContext.defaultParallelism
    val df = (1 to 100).toDF("x").repartition(par + 4).localCheckpoint()
    assert(Tables.fanOut(df).rdd.getNumPartitions === par + 4)
  }

  test("frame with an exchange in its plan is untouched") {
    val s = spark
    import s.implicits._
    val agg = (1 to 100).toDF("x").coalesce(1)
      .groupBy(col("x") % 3).count()
    val out = Tables.fanOut(agg)
    // same object back: no repartition layered on the aggregation
    assert(out eq agg)
  }
}
