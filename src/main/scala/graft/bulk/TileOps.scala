package graft.bulk

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch tile rendering (assemblage_view/src/lib.rs:460-588, serving
  * twin view/View.scala:107-161): the TILE SKELETON — section
  * decomposition, ordered subsection leaves, per-subsection
  * before/after branches with inline-ancestor promotion, and linking
  * parent branches — for N roots in ONE composed job, instead of the
  * serving path's per-root recursive walk.
  *
  * The skeleton carries every id and ordering decision of
  * `View.tile`; the remaining per-leaf text/styles rendering is a
  * projection over the `nodes` table (and is what `View.subsections`
  * adds on the serving side). BulkTileSpec proves skeleton parity
  * against `View.tile` on the ported tile scenarios.
  *
  * Scale shape: two bounded ordered descents (sections, subsections)
  * expand frontier rows with fixed-width order paths; the sibling walk
  * and its promotion climb are bounded fixpoints; the per-root in-view
  * sets and shared-descendant flags are root-tagged BFS closures. No
  * per-root driver work — a million tiles is one job.
  */
object TileOps {

  private def key(idx: org.apache.spark.sql.Column) =
    lpad(idx.cast("string"), 6, "0")

  /** Max descent depth for the two linearizations — cycle guard (the
    * serving recursion would not terminate on cyclic section paths
    * either; reference documents are trees at section level).
    */
  private val MaxDepth = 100

  /** (root, id) pairs: id is in root's view = descendants stopping at
    * links (the tagged form of GraphOps.descendantsUntilLinksFrom).
    */
  def viewReach(nodes: DataFrame, edges: DataFrame, roots: DataFrame): DataFrame = {
    val spans = GraphOps.spanClass(nodes, edges)
    val traversable = edges
      .join(spans.select(col("id").as("parent_id"), col("is_span").as("psp")), "parent_id")
      .join(spans.select(col("id").as("child_id"), col("is_span").as("csp")), "child_id")
      .select(col("parent_id"), col("child_id"), (col("psp") && !col("csp")).as("is_link"))
      .distinct().cache()
    var all = roots.select(col("id").as("root"), col("id")).localCheckpoint()
    var expanded = all
    var frontier = all
    var growing = true
    while (growing) {
      val reached = traversable.join(frontier, traversable("parent_id") === frontier("id"))
        .select(col("root"), col("child_id").as("id"), col("is_link"))
        .localCheckpoint()
      val newExp = reached.filter(!col("is_link")).select("root", "id").distinct()
        .join(expanded, Seq("root", "id"), "left_anti").localCheckpoint()
      val newAll = reached.select("root", "id").distinct()
        .join(all, Seq("root", "id"), "left_anti").localCheckpoint()
      if (!newAll.isEmpty) all = all.unionByName(newAll).localCheckpoint()
      if (newExp.isEmpty) growing = false
      else {
        expanded = expanded.unionByName(newExp).localCheckpoint()
        frontier = newExp
      }
    }
    traversable.unpersist()
    all
  }

  /** Roots whose child walk reaches a node with ≥ 2 parent slots
    * (has_shared_descendants_until_links per root, tagged — the bulk
    * form of the per-root GraphOps.hasSharedDescendantsUntilLinks).
    */
  def sharedDescendantRoots(edges: DataFrame, roots: DataFrame): DataFrame = {
    val e = edges.select(col("parent_id"), col("child_id")).distinct()
    val slotCounts = edges.groupBy("child_id").agg(count(lit(1)).as("np"))
    var reach = roots.select(col("id").as("root"), col("id")).localCheckpoint()
    var frontier = reach
    var growing = true
    while (growing) {
      val next = e.join(frontier, e("parent_id") === frontier("id"))
        .select(col("root"), col("child_id").as("id")).distinct()
        .join(reach, Seq("root", "id"), "left_anti").localCheckpoint()
      if (next.isEmpty) growing = false
      else { reach = reach.unionByName(next).localCheckpoint(); frontier = next }
    }
    // reachable CHILDREN of reached nodes, with global slot count ≥ 2
    val reachedChildren = e.join(
      reach.select(col("root"), col("id").as("parent_id")), Seq("parent_id"))
      .select(col("root"), col("child_id"))
      .distinct()
    reachedChildren.join(slotCounts.filter(col("np") >= 2), Seq("child_id"))
      .select(col("root").as("id")).distinct()
  }

  /** The section decomposition (lib.rs:381-458 `sections`): for each
    * root, the ordered section items (order_path, section anchor,
    * shared flag, subsection-root id). Descends pages (and top-level
    * chains — splitSpans), stops at text/chain leaves and multi-parent
    * children.
    */
  private def sectionItems(nodes: DataFrame, edges: DataFrame, roots: DataFrame): DataFrame = {
    val kinds = nodes.select(col("id").as("cur"), col("kind"), col("layout"))
    val childEdges = edges
      .join(edges.groupBy("child_id").agg(count(lit(1)).as("np")), Seq("child_id"))
      .select(col("parent_id"), col("child_id"), col("child_index"), (col("np") >= 2).as("multi"))
      .cache()
    var frontier = roots.select(col("id").as("root"), col("id").as("cur"),
      lit("").as("path"), lit(true).as("split")).localCheckpoint()
    var emitted = frontier.limit(0)
      .select(col("root"), col("path"), col("cur").as("sub_root"), lit("LEAF").as("item"))
      .localCheckpoint()
    var depth = 0
    while (!frontier.isEmpty && depth < MaxDepth) {
      depth += 1
      val info = frontier.join(kinds, Seq("cur"))
      // text always terminates; a chain terminates unless splitting
      val leaf = info.filter(col("kind") === "TEXT" ||
          (col("kind") === "LIST" && col("layout") === "CHAIN" && !col("split")))
        .select(col("root"), col("path"), col("cur").as("sub_root"), lit("LEAF").as("item"))
      val stepped = info
        .filter((col("kind") === "LIST" && (col("layout") === "PAGE" || col("split"))) ||
          col("kind") === "STYLED")
        .join(childEdges, col("cur") === childEdges("parent_id"))
        .select(col("root"), col("child_id"), col("multi"),
          concat(col("path"), key(col("child_index"))).as("npath"),
          when(col("kind") === "STYLED", col("split")).otherwise(lit(false)).as("nsplit"))
      val multiLeaf = stepped.filter(col("multi"))
        .select(col("root"), col("npath").as("path"), col("child_id").as("sub_root"),
          lit("MULTI").as("item"))
      emitted = emitted.unionByName(leaf).unionByName(multiLeaf).localCheckpoint()
      frontier = stepped.filter(!col("multi"))
        .select(col("root"), col("child_id").as("cur"), col("npath").as("path"),
          col("nsplit").as("split"))
        .localCheckpoint()
    }
    childEdges.unpersist()
    emitted
  }

  /** Ordered subsection leaves under one subsection root
    * (lib.rs:336-379 `subsections`, followLinks — structure only):
    * text/chain leaves in order; pages and styled wrappers descend.
    * Context-free per sub_root, so shared section roots flatten once.
    */
  private def subsectionLeaves(nodes: DataFrame, edges: DataFrame, subRoots: DataFrame): DataFrame = {
    val kinds = nodes.select(col("id").as("cur"), col("kind"), col("layout"))
    var frontier = subRoots.select(col("id").as("sr"), col("id").as("cur"), lit("").as("p2"))
      .localCheckpoint()
    var leaves = frontier.limit(0)
      .select(col("sr"), col("p2"), col("cur").as("leaf")).localCheckpoint()
    var depth = 0
    while (!frontier.isEmpty && depth < MaxDepth) {
      depth += 1
      val info = frontier.join(kinds, Seq("cur"))
      val leaf = info.filter(col("kind") === "TEXT" ||
          (col("kind") === "LIST" && col("layout") === "CHAIN"))
        .select(col("sr"), col("p2"), col("cur").as("leaf"))
      leaves = leaves.unionByName(leaf).localCheckpoint()
      frontier = info
        .filter((col("kind") === "LIST" && col("layout") === "PAGE") || col("kind") === "STYLED")
        .join(edges, col("cur") === edges("parent_id"))
        .select(col("sr"), col("child_id").as("cur"),
          concat(col("p2"), key(col("child_index"))).as("p2"))
        .localCheckpoint()
    }
    leaves
  }

  /** Promotion of a sibling to its largest still-inline ancestor
    * (lib.rs:493-529): climb while the current node renders as a span
    * AND has exactly one parent slot, cycle-safe. Returns (sid,
    * promoted).
    */
  private def promote(nodes: DataFrame, edges: DataFrame, sibIds: DataFrame): DataFrame = {
    val spanIds = GraphOps.spanClass(nodes, edges).filter(col("is_span")).select(col("id"))
    val uniq = edges.groupBy("child_id").agg(count(lit(1)).as("np"), min("parent_id").as("pid"))
      .filter(col("np") === 1).select(col("child_id").as("id"), col("pid"))
    var state = sibIds.select(col("id").as("s0"), col("id").as("cur")).localCheckpoint()
    var visited = state
    var finals = state.limit(0).select(col("s0"), col("cur").as("promoted")).localCheckpoint()
    while (!state.isEmpty) {
      val j = state
        .join(spanIds.select(col("id").as("cur"), lit(true).as("isSpan")), Seq("cur"), "left")
        .join(uniq.select(col("id").as("cur"), col("pid")), Seq("cur"), "left")
      val climbable = j.filter(col("isSpan").isNotNull && col("pid").isNotNull)
        .join(visited.select(col("s0"), col("cur").as("pid")) // cycle: next already visited?
          .withColumn("seen", lit(true)),
          Seq("s0", "pid"), "left")
      val stop = j.filter(col("isSpan").isNull || col("pid").isNull)
        .select(col("s0"), col("cur").as("promoted"))
        .unionByName(climbable.filter(col("seen").isNotNull)
          .select(col("s0"), col("pid").as("promoted")))
      finals = finals.unionByName(stop).localCheckpoint()
      state = climbable.filter(col("seen").isNull)
        .select(col("s0"), col("pid").as("cur")).localCheckpoint()
      visited = visited.unionByName(state).localCheckpoint()
    }
    finals
  }

  /** The tile skeleton for every root: one row per (root, section,
    * subsection) with ordered indexes, the section anchor id (null =
    * editable section), the shared flag, the subsection leaf id, and
    * the sorted before/after branch ids (siblings promoted to their
    * largest inline ancestor, minus anything already in the root's
    * view).
    */
  def tileSkeletons(nodes: DataFrame, edges: DataFrame, roots: DataFrame): DataFrame = {
    val items = sectionItems(nodes, edges, roots).localCheckpoint()
    // shared flags for text/chain leaves (multi sections are always shared)
    val leafRoots = items.filter(col("item") === "LEAF")
      .select(col("sub_root").as("id")).distinct()
    val shared = sharedDescendantRoots(edges, leafRoots)
      .select(col("id").as("sub_root"), lit(true).as("sh")).localCheckpoint()
    val chainKinds = nodes.select(col("id").as("sub_root"),
      (col("kind") === "LIST" && col("layout") === "CHAIN").as("isChain"))
    val sections = items
      .join(shared, Seq("sub_root"), "left")
      .join(chainKinds, Seq("sub_root"))
      .select(col("root"), col("path"), col("sub_root"),
        when(col("item") === "MULTI", col("sub_root"))
          .when(col("isChain") && col("sh").isNotNull, col("sub_root"))
          .as("section_anchor"),
        (col("item") === "MULTI" || col("sh").isNotNull).as("section_shared"))

    // ordered leaves per section root
    val leaves = subsectionLeaves(nodes, edges,
      sections.select(col("sub_root").as("id")).distinct()).localCheckpoint()

    // branches per (root, leaf, side)
    val leafIds = leaves.select(col("leaf").as("id")).distinct().localCheckpoint()
    def branches(before: Boolean): DataFrame = {
      val sibs = GraphOps.siblingAdjacency(nodes, edges, before)
        .join(leafIds, Seq("id"), "left_semi").localCheckpoint()
      val promoted = promote(nodes, edges,
        sibs.select(col("sibling_id").as("id")).distinct())
      sibs.join(promoted.withColumnRenamed("s0", "sibling_id"), Seq("sibling_id"))
        .select(col("id").as("leaf"), col("promoted"))
    }
    val inView = viewReach(nodes, edges, roots).localCheckpoint()
    def branchArrays(before: Boolean, cname: String): DataFrame = {
      // a leaf's branches are per TILE: drop promoted ids already in
      // the root's view, then aggregate the survivors
      val perRoot = sections.select(col("root"), col("sub_root")).distinct()
        .join(leaves.select(col("sr").as("sub_root"), col("leaf")), Seq("sub_root"))
        .select(col("root"), col("leaf")).distinct()
      perRoot.join(branches(before), Seq("leaf"))
        .join(inView.select(col("root"), col("id").as("promoted"))
          .withColumn("inv", lit(true)), Seq("root", "promoted"), "left")
        .filter(col("inv").isNull)
        .groupBy("root", "leaf")
        .agg(array_sort(collect_set(col("promoted"))).as(cname))
    }
    val beforeB = branchArrays(before = true, "before_ids")
    val afterB = branchArrays(before = false, "after_ids")

    val emptyArr = array().cast("array<string>")
    val wSec = Window.partitionBy("root").orderBy("path")
    val wSub = Window.partitionBy("root", "path").orderBy("p2")
    sections
      .join(leaves.withColumnRenamed("sr", "sub_root"), Seq("sub_root"))
      .join(beforeB, Seq("root", "leaf"), "left")
      .join(afterB, Seq("root", "leaf"), "left")
      .withColumn("sec_idx", dense_rank().over(wSec))
      .withColumn("sub_idx", row_number().over(wSub))
      .select(col("root").as("root_id"),
        col("sec_idx").cast("long").as("sec_idx"),
        col("sub_idx").cast("long").as("sub_idx"),
        col("section_anchor"), col("section_shared"),
        col("leaf").as("subsection_id"),
        coalesce(col("before_ids"), emptyArr).as("before_ids"),
        coalesce(col("after_ids"), emptyArr).as("after_ids"))
  }

  /** Linking parent branches of each root (lib.rs:547-576 parent
    * branches): parents whose containment renders the root as a link
    * (block root inside span parent). Distinct per (root, parent).
    */
  def tileParentBranches(nodes: DataFrame, edges: DataFrame, roots: DataFrame): DataFrame = {
    val spans = GraphOps.spanClass(nodes, edges)
    edges
      .join(roots.select(col("id").as("child_id")), Seq("child_id"), "left_semi")
      .join(spans.select(col("id").as("child_id"), col("is_span").as("csp")), "child_id")
      .join(spans.select(col("id").as("parent_id"), col("is_span").as("psp")), "parent_id")
      .filter(!col("csp") && col("psp"))
      .select(col("child_id").as("root_id"), col("parent_id")).distinct()
  }
}
