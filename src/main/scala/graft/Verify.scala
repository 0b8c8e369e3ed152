package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // Pin the oracle side-channel root to THIS run's sibling aux dir
    // before any query object initializes (the oracleSql vals
    // interpolate it) — a concurrent sbt test in the same repo then
    // writes to its own temp root and can never clobber the exports our
    // oracle reads. The root sits OUTSIDE outDir (`<outDir>.aux`): the
    // driver's comparator globs every subdirectory of outDir as a query
    // dump, and the aux exports (mixed float/int schemas) are not query
    // dumps — placing them inside produced a phantom err row in
    // CORRECTNESS_r13. The oracle SQL interpolates absolute paths, so
    // DuckDB reads the exports from anywhere.
    sys.props.getOrElseUpdate("graft.oracleAuxDir",
      new java.io.File(outDir.stripSuffix("/") + ".aux", "oracle-aux").getAbsolutePath)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional subset (comma-separated query names) for local iteration;
    // the driver sets nothing and always dumps the full surface.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(f => SparkEntry.queries.filter(kv => f(kv._1)))
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
      }
      finally spark.sharedState.cacheManager.clearCache()
    }
    // Materialize the deferred oracle-twin exports (trained centroids /
    // PQ codebooks) the queries above registered — must precede the
    // oracle_sql.json dump whose SQL reads them.
    OracleAux.flush()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Failed queries must be VISIBLE in the artifact, not inferred from a
    // missing dump: one error row per failure for the driver/judge.
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    spark.stop()
  }
}
