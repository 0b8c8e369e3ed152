package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of SELECTED queries to per-query
  * files — the round-deliverable form of [[Explain]] (plans/rNN/
  * <query>_<suffix>.txt). Session conf mirrors the bench (AQE on), so
  * the committed plans describe the shapes the bench actually runs.
  * Usage: sbt "runMain graft.tools.ExplainOne <sfDir> <outDir> <suffix> <q1,q2,...>"
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(dir, outDir, suffix, qs) = args.take(4)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    qs.split(',').map(_.trim).filter(_.nonEmpty).foreach { name =>
      val body =
        try graft.SparkEntry.queries(name)(spark, dir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"EXPLAIN FAILED: $e\n" }
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), body)
      println(s"[explain] wrote $outDir/${name}_$suffix.txt")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
