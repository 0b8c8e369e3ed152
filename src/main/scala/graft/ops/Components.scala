package graft.ops

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster resolution: near-dup pairs (from any dedup
  * operator) form an undirected graph; connected components give the
  * transitive duplicate clusters; every doc maps to its cluster's min
  * id as the canonical representative.
  *
  * Uses GraphX connected components (Pregel small-label propagation):
  * converges in O(diameter) supersteps with shuffle volume proportional
  * to the edge set — dup clusters are tiny and sparse, so this scales
  * linearly with the corpus where an iterative DataFrame fixpoint would
  * re-shuffle the full vertex set every round.
  */
object Components {

  /** @param allIds  one row per doc (`id`: long) — singletons included
    * @param pairs   near-dup pairs (`id_a`, `id_b`)
    * @return (doc_id, component_id) for every input doc
    */
  def dedupClusters(allIds: DataFrame, pairs: DataFrame): DataFrame = {
    val spark = allIds.sparkSession
    import spark.implicits._
    // Pregel only over vertices that appear in a pair: a singleton is
    // its own component BY DEFINITION, so shipping the whole corpus
    // through every CC superstep is pure waste — the iterated graph is
    // O(dup pairs), corpus-size independent; singletons join back in
    // one broadcast-sized left join (dup clusters are small relative
    // to any corpus worth deduping).
    val edgeDf = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .localCheckpoint() // consumed twice (vertices + edges); pairs
                         // pipelines are expensive — compute once
    val vertices = edgeDf.select(col("id_a").as("id"))
      .unionByName(edgeDf.select(col("id_b").as("id")))
      .distinct()
      .as[Long].rdd.map(id => (id: VertexId, ()))
    val edges = edgeDf.as[(Long, Long)].rdd.map { case (a, b) => Edge(a, b, ()) }
    val graph = Graph(vertices, edges, (),
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
    // GraphX labels each component with its lowest vertex id.
    val cc = graph.connectedComponents().vertices
      .toDF("doc_id", "component_id")
    allIds.select(col("id").cast("long").as("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component_id"), col("doc_id")).as("component_id"))
  }
}
