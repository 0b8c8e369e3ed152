package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused cluster leg for the fused-graph regime at the 62× graph
  * (~310k nodes + ~370k edges): times the DISTRIBUTED tile fixpoint
  * (cap=0 — the above-cap plan, whose wall scales with graph DEPTH,
  * not row count) against the FUSED broadcast kernel (the production
  * regime below the 1M-row cap) under `local-cluster` worker JVMs.
  *
  * Round 13 adds the OTHER side of the cap: an optional third arg
  * names a >1M-row scale dir (ScaleGen reps ≥ 100) whose graph
  * exceeds `fusedGraphCap`, so the PRODUCTION regime there is the
  * distributed fixpoint — timed with no conf fiddling. Together the
  * two legs pin both regimes at both sides of the measured boundary.
  *
  * Usage:
  *   sbt package
  *   SPARK_SCALA_VERSION=2.13 sbt "runMain graft.tools.TileScaleLeg <jar> [scaleDir] [bigDir]"
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

    if (dir == "-") { aboveCapLeg(spark, args); spark.stop(); return }
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

    if (args.length > 2) aboveCapLeg(spark, args)
    spark.stop()
  }

  /** The above-cap leg: the graph alone exceeds the 1M-row fused cap,
    * so these calls take the distributed plans NATURALLY — the
    * production regime on the far side of the boundary, pinned
    * without any conf override.
    */
  private def aboveCapLeg(spark: SparkSession, args: Array[String]): Unit = {
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[tile-scale] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    locally {
      val (n2, e2) = graft.queries.GraphQueries.graphTables(spark, args(2))
      val n2c = n2.persist(); val e2c = e2.persist()
      val total = n2c.count() + e2c.count()
      println(s"[tile-scale] above-cap graph: ${n2c.count()} nodes + " +
        s"${e2c.count()} edges = $total rows (cap 1000000)")
      require(total > 1000000L,
        s"above-cap leg needs >1M node+edge rows, got $total — raise reps")
      val roots2 = n2c.filter(col("layout") === "PAGE").select("id")
      time("tile_skeletons @above-cap (distributed, production)")(noop(
        graft.bulk.TileOps.tileSkeletons(n2c, e2c, roots2)))
      time("preview_all @above-cap (distributed, production)")(noop(
        graft.bulk.GraphOps.previewAll(n2c, e2c)))
      val s2 = spark
      import s2.implicits._
      time("descendants @above-cap (distributed, production)")(noop(
        graft.bulk.GraphOps.descendantsFrom(e2c,
          roots2.limit(1000).select(col("id")))))
    }
  }
}
