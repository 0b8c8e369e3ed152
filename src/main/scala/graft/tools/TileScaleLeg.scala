package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused cluster leg for the fused-graph regime at the 62× graph
  * (~310k nodes + ~370k edges): times the DISTRIBUTED tile fixpoint
  * (cap=0 — the above-cap plan, whose wall scales with graph DEPTH,
  * not row count) against the FUSED broadcast kernel (the production
  * regime below the 1M-row cap) under `local-cluster` worker JVMs.
  *
  * Usage:
  *   sbt package
  *   SPARK_SCALA_VERSION=2.13 sbt "runMain graft.tools.TileScaleLeg <jar> [scaleDir]"
  */
object TileScaleLeg {
  def main(args: Array[String]): Unit = {
    val jar = args.headOption.getOrElse(sys.error("first arg: packaged graft jar"))
    val dir = if (args.length > 1) args(1) else "/tmp/sfscale62"
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master("local-cluster[2,16,16384]")
      .appName("graft-tile-scale-leg")
      .config("spark.jars", jar)
      .config("spark.executor.memory", "14g")
      .config("spark.executor.extraJavaOptions", opens)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (nodes, edges) = graft.queries.GraphQueries.graphTables(spark, dir)
    val nodesC = nodes.persist(); val edgesC = edges.persist()
    println(s"[tile-scale] nodes=${nodesC.count()} edges=${edgesC.count()}")
    val roots = nodesC.filter(col("layout") === "PAGE").select("id")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[tile-scale] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // production regime for tiles at this size (sub-cap): broadcast +
    // serving kernel
    time("tile_skeletons @62x (fused)")(noop(
      graft.bulk.TileOps.tileSkeletons(nodesC, edgesC, roots)))
    // preview's PRODUCTION regime at 310k nodes is distributed (its
    // fused cap is 100k — the measured crossover this tool found);
    // force-fuse it here to keep the crossover measurement repeatable
    spark.conf.set("spark.graft.fusedPreviewCap", "100000000")
    time("preview_all @62x (fused, forced)")(noop(
      graft.bulk.GraphOps.previewAll(nodesC, edgesC)))
    spark.conf.unset("spark.graft.fusedPreviewCap")
    // above-cap plan forced: the distributed fixpoints (wall is
    // rounds × per-job cost + frontier shuffles — depth-bound)
    spark.conf.set("spark.graft.fusedGraphCap", "0")
    time("tile_skeletons @62x (distributed)")(noop(
      graft.bulk.TileOps.tileSkeletons(nodesC, edgesC, roots)))
    time("preview_all @62x (distributed)")(noop(
      graft.bulk.GraphOps.previewAll(nodesC, edgesC)))
    spark.conf.unset("spark.graft.fusedGraphCap")
    spark.stop()
  }
}
