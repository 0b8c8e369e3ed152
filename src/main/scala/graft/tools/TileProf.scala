package graft.tools

import org.apache.spark.sql.functions._

/** Local profile of the batch-tile path: times tileSkeletons over all
  * page roots of a testdata dir and prints wall + Spark job count —
  * the job-count-bound leg ClusterSanity measures under
  * local-cluster, reproducible here in seconds instead of minutes.
  *
  * Usage: runMain graft.tools.TileProf [sfDir]
  */
object TileProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.getOrCreate("graft-tile-prof")
    val (nodes, edges) = graft.queries.GraphQueries.graphTables(spark, dir)
    val nodesC = nodes.cache(); val edgesC = edges.cache()
    nodesC.count(); edgesC.count()
    val roots = nodesC.filter(col("kind") === "LIST" && col("layout") === "PAGE")
      .select("id")
    val t0 = System.nanoTime()
    val n = graft.bulk.TileOps.tileSkeletons(nodesC, edgesC, roots).count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"""{"leg":"tile_skeletons","rows":$n,"wall_sec":$wall%.2f}""")
    spark.stop()
  }
}
