package graft.bulk

import graft.core.GraftDb
import graft.model.{Child, Layout, Node, Styles}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed forms of the document-graph traversals (SURVEY §2.3):
  * the serving path (GraftDb) walks node-by-node; these run the same
  * semantics as DataFrame fixpoints over the nodes/edges tables, the
  * shape that survives a 100 TB graph:
  *
  *   - descendants: iterative frontier-join BFS — each round shuffles
  *     only the frontier against the edges table (edges pre-partitioned
  *     by parent id, so every round reuses the same partitioning);
  *     cycle-safe because the visited set is subtracted (anti-join).
  *   - spanClass: bottom-up rendering classification (is_span) as a
  *     fixpoint — non-styled nodes classify immediately; span-styled
  *     nodes iterate until their transitive child resolves.
  *
  * GraphX connected components for dup-clusters lives in
  * graft.ops.Components; the same Pregel route applies to these
  * traversals when many roots are queried at once.
  */
object GraphOps {

  /** Flatten a GraftDb into (nodes, edges) DataFrames — the bridge
    * from the serving path to the bulk path. Edges are (parent_id,
    * child_id, child_index) from the forward child lists.
    */
  def tablesFrom(db: GraftDb, spark: SparkSession): (DataFrame, DataFrame) = {
    import spark.implicits._
    val rows = db.nodes.liveKeys.map { id =>
      val n = db.get(id).get
      val (kind, layout, styleKind, styles, text) = n match {
        case Node.Text(l) => ("TEXT", null, null, Seq.empty[String], l)
        case Node.List(Layout.Chain, _) => ("LIST", "CHAIN", null, Seq.empty[String], null)
        case Node.List(Layout.Page, _) => ("LIST", "PAGE", null, Seq.empty[String], null)
        case Node.Styled(Styles.Block(st), _) => ("STYLED", null, "BLOCK", st.toSeq, null)
        case Node.Styled(Styles.Span(st), _) => ("STYLED", null, "SPAN", st.toSeq, null)
      }
      (id.toString, kind, layout, styleKind, styles, text)
    }.toVector
    val nodes = rows.toDF("id", "kind", "layout", "style_kind", "styles", "text")
    val edges = db.nodes.liveKeys.flatMap { id =>
      db.get(id).get.children.zipWithIndex.map {
        case (Child.Lazy(c), i) => (id.toString, c.toString, i)
        case (Child.Eager(_), _) =>
          throw new IllegalStateException("stored nodes are normalized to lazy children")
      }
    }.toVector.toDF("parent_id", "child_id", "child_index")
    (nodes, edges)
  }

  /** All descendant ids of `rootId` (including itself): iterative
    * frontier BFS over the edges table. Rounds = graph depth; shuffle
    * volume per round = frontier × matching edges, not the whole graph.
    */
  def descendants(edges: DataFrame, rootId: String): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("parent_id"), col("child_id")).distinct().cache()
    var visited = Seq(rootId).toDF("id").localCheckpoint()
    var frontier = visited
    var growing = true
    while (growing) {
      val next = e.join(frontier, e("parent_id") === frontier("id"))
        .select(col("child_id").as("id"))
        .distinct()
        .join(visited, Seq("id"), "left_anti")
        .localCheckpoint()
      if (next.isEmpty) growing = false
      else {
        visited = visited.unionByName(next).localCheckpoint()
        frontier = next
      }
    }
    e.unpersist()
    visited
  }

  /** Link-aware descendants (descendants_until_links, lib.rs:771-797):
    * the BFS stops at children rendered as links (block child of a
    * span parent) — link targets are included but not expanded. Uses
    * the bulk span classification to derive the link predicate, so the
    * whole computation stays in DataFrame land.
    */
  def descendantsUntilLinks(nodes: DataFrame, edges: DataFrame, rootId: String): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val spans = spanClass(nodes, edges)
    // an edge may be traversed unless the child renders as a link
    val traversable = edges
      .join(spans.withColumnRenamed("id", "parent_id").withColumnRenamed("is_span", "parent_span"), "parent_id")
      .join(spans.withColumnRenamed("id", "child_id").withColumnRenamed("is_span", "child_span"), "child_id")
      .select(col("parent_id"), col("child_id"),
        (col("parent_span") && !col("child_span")).as("is_link"))
      .distinct()
      .cache()
    // localCheckpoint truncates lineage each round — without it the
    // round-N plan nests all earlier rounds and codegen/planning blows
    // up exponentially (the standard iterative-DataFrame-loop trap).
    var visited = Seq(rootId).toDF("id").localCheckpoint()
    var frontier = visited
    var growing = true
    while (growing) {
      val reached = traversable.join(frontier, traversable("parent_id") === frontier("id"))
        .select(col("child_id").as("id"), col("is_link"))
        .join(visited, Seq("id"), "left_anti")
        .localCheckpoint()
      // link targets are collected but never expanded
      val next = reached.filter(!col("is_link")).select("id").distinct().localCheckpoint()
      val linked = reached.filter(col("is_link")).select("id").distinct()
      val newIds = next.unionByName(linked).distinct()
      if (newIds.isEmpty) growing = false
      else {
        visited = visited.unionByName(newIds).localCheckpoint()
        frontier = next
      }
    }
    traversable.unpersist()
    visited
  }

  /** Rendering class per node (is_span, lib.rs:347-380) as a bulk
    * fixpoint: Text/Chain → span, Page/Styled(Block) → block,
    * Styled(Span) inherits from its child transitively.
    */
  def spanClass(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val base = nodes.withColumn("is_span",
      when(col("kind") === "TEXT", true)
        .when(col("kind") === "LIST" && col("layout") === "CHAIN", true)
        .when(col("kind") === "LIST", false)
        .when(col("kind") === "STYLED" && col("style_kind") === "BLOCK", false)
        .otherwise(lit(null).cast("boolean")))
    var resolved = base.filter(col("is_span").isNotNull)
      .select(col("id"), col("is_span")).cache()
    var pending = base.filter(col("is_span").isNull).select(col("id")).cache()
    val styledEdge = edges.select(col("parent_id"), col("child_id"))
    var progress = true
    while (progress && pending.count() > 0) {
      val step = pending
        .join(styledEdge, pending("id") === styledEdge("parent_id"))
        .join(resolved.withColumnRenamed("id", "rid"), col("child_id") === col("rid"))
        .select(pending("id"), col("is_span"))
      val n = step.count()
      if (n == 0) progress = false // unresolvable = cyclic styled chains
      else {
        resolved = resolved.unionByName(step).localCheckpoint()
        pending = pending.join(step.select("id"), Seq("id"), "left_anti").localCheckpoint()
      }
    }
    resolved
  }
}
