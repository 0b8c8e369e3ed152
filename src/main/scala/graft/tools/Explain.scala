package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of every driver query — the plan
  * audit loop: check PushedFilters reach the parquet scans, small dims
  * broadcast, and codegen spans stay wide.
  * Usage: sbt "runMain graft.tools.Explain <sfDir> <outFile>"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "/tmp/plans.txt"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      sb ++= s"\n========== $name ==========\n"
      try sb ++= fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      catch { case e: Throwable => sb ++= s"EXPLAIN FAILED: $e\n" }
      spark.sharedState.cacheManager.clearCache()
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[explain] wrote $out")
    spark.stop()
  }
}
