package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Tables.load("events") must normalize every `ts` encoding the driver's
  * testdata has shipped to TimestampType epoch-micros:
  *  - raw int64 nanos (how Spark 4 reads parquet TIMESTAMP(NANOS) under
  *    spark.sql.legacy.parquet.nanosAsLong — fabricated here as a plain
  *    long column, which loads identically),
  *  - TIMESTAMP_MICROS without UTC adjustment (TIMESTAMP_NTZ),
  *  - TIMESTAMP_MICROS UTC-adjusted (plain TimestampType).
  */
class TablesLoadSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-tables-load-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // 2021-03-04T05:06:07.123456Z in epoch micros.
  private val micros = 1614834367123456L

  private def loadFrom(write: String => Unit): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("graft-events-enc").toString
    write(s"$dir/events.parquet")
    Tables.load(spark, dir, "events")
  }

  test("nanos-as-long encoding narrows to TimestampType micros") {
    val s = spark
    import s.implicits._
    val df = loadFrom { path =>
      Seq((1L, micros * 1000L + 999L)).toDF("event_id", "ts")
        .write.parquet(path)
    }
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.select(unix_micros(col("ts"))).as[Long].head()
    assert(got === micros) // exact floor division, no rounding up
  }

  test("TIMESTAMP_NTZ encoding casts to TimestampType, identical micros under UTC") {
    val s = spark
    import s.implicits._
    val df = loadFrom { path =>
      Seq((1L, micros)).toDF("event_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
        .write.parquet(path)
    }
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select(unix_micros(col("ts"))).as[Long].head() === micros)
  }

  test("plain TimestampType encoding passes through unchanged") {
    val s = spark
    import s.implicits._
    val df = loadFrom { path =>
      Seq((1L, micros)).toDF("event_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
        .write.parquet(path)
    }
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select(unix_micros(col("ts"))).as[Long].head() === micros)
  }

  test("driver testdata events loads and ts is TimestampType") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.count() > 0)
  }
}
