package graft

import graft.ops.Ckpt
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ckpt.fresh must actually strip the carried statistics on the
  * running Spark version: its LogicalRDD match is structural, and a
  * Spark upgrade changing localCheckpoint's plan shape would silently
  * fall through to the stats-carrying checkpoint — reintroducing the
  * per-fold size-estimate squaring the object exists to prevent
  * (round-8 advice: make that regression detectable).
  */
class CkptSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ckpt-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("fresh() output plans with defaultSizeInBytes, not carried stats") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("id")
      .withColumn("pad", concat_ws("", (1 to 20).map(_ => md5(col("id").cast("string"))): _*))
    val plain = df.localCheckpoint()
    val fresh = Ckpt.fresh(df)
    val defaultSize = BigInt(spark.sessionState.conf.defaultSizeInBytes)
    val plainStats = plain.queryExecution.optimizedPlan.stats.sizeInBytes
    val freshStats = fresh.queryExecution.optimizedPlan.stats.sizeInBytes
    // the plain localCheckpoint carries origin stats (the hazard);
    // if Spark ever stops doing that this assertion flags the spec
    // for re-evaluation rather than silently passing
    assert(plainStats != defaultSize,
      s"localCheckpoint no longer carries origin stats ($plainStats) — re-check Ckpt.fresh's rationale")
    assert(freshStats == defaultSize,
      s"Ckpt.fresh output carries stats $freshStats instead of defaultSizeInBytes $defaultSize — " +
        "the LogicalRDD strip path did not fire")
    // same rows, same order-insensitive content
    assert(fresh.count() == 1000L)
  }

  test("loop fold: stats stay flat across fresh-checkpointed iterations") {
    import spark.implicits._
    val defaultSize = BigInt(spark.sessionState.conf.defaultSizeInBytes)
    var carried = Ckpt.fresh((1L to 100L).toDF("id"))
    (1 to 4).foreach { _ =>
      val joined = carried.as("a").join(carried.as("b"), "id").select(col("id"))
      carried = Ckpt.fresh(joined)
      assert(carried.queryExecution.optimizedPlan.stats.sizeInBytes == defaultSize)
    }
    assert(carried.count() == 100L)
  }
}
