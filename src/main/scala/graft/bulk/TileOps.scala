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

  /** Descent levels folded into one checkpoint + emptiness probe per
    * round (the loops are job-floor bound, not data bound — see
    * sectionItems).
    */
  private val LevelsPerRound = 1

  /** (root, id) pairs: id is in root's view = descendants stopping at
    * links (the tagged form of GraphOps.descendantsUntilLinksFrom).
    */
  def viewReach(nodes: DataFrame, edges: DataFrame, roots: DataFrame): DataFrame =
    viewReach(nodes, edges, roots, None)

  def viewReach(nodes: DataFrame, edges: DataFrame, roots: DataFrame,
      precomputedSpans: Option[DataFrame]): DataFrame = {
    val spans = precomputedSpans.getOrElse(GraphOps.spanClass(nodes, edges))
    val traversable = edges
      .join(spans.select(col("id").as("parent_id"), col("is_span").as("psp")), "parent_id")
      .join(spans.select(col("id").as("child_id"), col("is_span").as("csp")), "child_id")
      .select(col("parent_id"), col("child_id"), (col("psp") && !col("csp")).as("is_link"))
      .distinct().cache()
    // POINTER-DOUBLED reach (round 10 — the frontier BFS paid one
    // round per DAG level, and the batch-tile wall is round-count
    // bound): a link edge can only ever be the LAST edge of a view
    // path (link children enter the view but never expand), so
    //   view(root) = {root} ∪ Cn[root] ∪ L[{root} ∪ Cn[root]]
    // with Cn the transitive closure of the NON-link traversable
    // edges — and Cn squares in log2(depth) doubling rounds
    // ([[GraphOps.reachPairs]], the q68 previewAll discipline).
    // Complexity note, stated not hidden: the closure is all-sources
    // (O(Σ_nodes reach) pairs vs the BFS's O(Σ_roots reach)) — the
    // right trade for the shallow-wide document DAGs this engine
    // stores, where depth ≲ 20 and most nodes sit inside some root's
    // view anyway; a deep-narrow graph would prefer the old frontier
    // form.
    val nonLink = traversable.filter(!col("is_link"))
      .select(col("parent_id").as("src"), col("child_id").as("dst"))
    val linkE = traversable.filter(col("is_link"))
      .select(col("parent_id").as("src"), col("child_id").as("dst"))
    val cn = GraphOps.reachPairs(nonLink)
    val r = roots.select(col("id").as("root"))
    val inViewNoLinks = r.select(col("root"), col("root").as("id"))
      .unionByName(r.join(cn, col("root") === col("src"))
        .select(col("root"), col("dst").as("id")))
    val linked = inViewNoLinks
      .join(linkE, col("id") === col("src"))
      .select(col("root"), col("dst").as("id"))
    val out = inViewNoLinks.unionByName(linked).distinct()
      .localCheckpoint()
    traversable.unpersist()
    out
  }

  /** Roots whose child walk reaches a node with ≥ 2 parent slots
    * (has_shared_descendants_until_links per root, tagged — the bulk
    * form of the per-root GraphOps.hasSharedDescendantsUntilLinks).
    */
  def sharedDescendantRoots(edges: DataFrame, roots: DataFrame): DataFrame = {
    val e = edges.select(col("parent_id"), col("child_id")).distinct()
    val slotCounts = edges.groupBy("child_id").agg(count(lit(1)).as("np"))
    // a root qualifies iff its child walk reaches a ≥2-slot node:
    // reach = identity ∪ closure, via log-round pointer doubling
    // (complexity trade documented at viewReach)
    val ce = GraphOps.reachPairs(e.select(col("parent_id").as("src"),
      col("child_id").as("dst")))
    val r = roots.select(col("id").as("root"))
    val reach = r.select(col("root"), col("root").as("parent_id"))
      .unionByName(r.join(ce, col("root") === col("src"))
        .select(col("root"), col("dst").as("parent_id")))
    // reachable CHILDREN of reached nodes, with global slot count ≥ 2
    val reachedChildren = e.join(reach, Seq("parent_id"))
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
  private val emptyStyles = array().cast("array<string>")

  /** bs/ss accumulate the styled-wrapper styles crossed on the descent
    * — the distributed form of the serving side's styledWith unwinding
    * (every styled ancestor on the path contributes to the rendered
    * block/span styles of the blocks below it, lib.rs:381-458).
    */
  private def sectionItems(nodes: DataFrame, edges: DataFrame, roots: DataFrame): DataFrame = {
    val kinds = nodes.select(col("id").as("cur"), col("kind"), col("layout"),
      col("style_kind"), coalesce(col("styles"), emptyStyles).as("styles"))
    val childEdges = edges
      .join(edges.groupBy("child_id").agg(count(lit(1)).as("np")), Seq("child_id"))
      .select(col("parent_id"), col("child_id"), col("child_index"), (col("np") >= 2).as("multi"))
      .cache()
    var frontier = roots.select(col("id").as("root"), col("id").as("cur"),
      lit("").as("path"), lit(true).as("split"),
      emptyStyles.as("bs"), emptyStyles.as("ss")).localCheckpoint()
    // emitted pieces stay lazy plans over the checkpointed frontiers;
    // only the loop-carried frontier pays a per-round checkpoint job
    // (accumulator-vs-frontier rationale at viewReach)
    var emittedParts = Vector(frontier.limit(0)
      .select(col("root"), col("path"), col("cur").as("sub_root"), lit("LEAF").as("item"),
        col("bs"), col("ss")))
    // LevelsPerRound descent levels share one checkpoint + one
    // emptiness probe (round 10 — the one-level form paid a
    // job-floor-bound round per tree level): the intermediate
    // frontiers stay lazy joins over the last checkpointed one, so
    // per-round plan depth is bounded by LevelsPerRound small joins.
    var depth = 0
    while (!frontier.isEmpty && depth < MaxDepth) {
      var f = frontier
      var lvl = 0
      while (lvl < LevelsPerRound && depth < MaxDepth) {
        depth += 1; lvl += 1
        val info = f.join(kinds, Seq("cur"))
        // text always terminates; a chain terminates unless splitting
        val leaf = info.filter(col("kind") === "TEXT" ||
            (col("kind") === "LIST" && col("layout") === "CHAIN" && !col("split")))
          .select(col("root"), col("path"), col("cur").as("sub_root"), lit("LEAF").as("item"),
            col("bs"), col("ss"))
        val stepped = info
          .filter((col("kind") === "LIST" && (col("layout") === "PAGE" || col("split"))) ||
            col("kind") === "STYLED")
          .join(childEdges, col("cur") === childEdges("parent_id"))
          .select(col("root"), col("child_id"), col("multi"),
            concat(col("path"), key(col("child_index"))).as("npath"),
            when(col("kind") === "STYLED", col("split")).otherwise(lit(false)).as("nsplit"),
            when(col("kind") === "STYLED" && col("style_kind") === "BLOCK",
              array_union(col("bs"), col("styles"))).otherwise(col("bs")).as("nbs"),
            when(col("kind") === "STYLED" && col("style_kind") === "SPAN",
              array_union(col("ss"), col("styles"))).otherwise(col("ss")).as("nss"))
        val multiLeaf = stepped.filter(col("multi"))
          .select(col("root"), col("npath").as("path"), col("child_id").as("sub_root"),
            lit("MULTI").as("item"), col("nbs").as("bs"), col("nss").as("ss"))
        emittedParts ++= Vector(leaf, multiLeaf)
        f = stepped.filter(!col("multi"))
          .select(col("root"), col("child_id").as("cur"), col("npath").as("path"),
            col("nsplit").as("split"), col("nbs").as("bs"), col("nss").as("ss"))
      }
      frontier = f.localCheckpoint()
    }
    // materialize before dropping the childEdges cache the lazy pieces
    // reference
    val emitted = emittedParts.reduce(_ unionByName _).localCheckpoint()
    childEdges.unpersist()
    emitted
  }

  /** Ordered subsection leaves under one subsection root
    * (lib.rs:336-379 `subsections`, followLinks — structure only):
    * text/chain leaves in order; pages and styled wrappers descend.
    * Context-free per sub_root, so shared section roots flatten once.
    */
  private def subsectionLeaves(nodes: DataFrame, edges: DataFrame, subRoots: DataFrame): DataFrame = {
    val kinds = nodes.select(col("id").as("cur"), col("kind"), col("layout"),
      col("style_kind"), coalesce(col("styles"), emptyStyles).as("styles"))
    // p2 is the leaf's DESCENT PATH as an array of (child_index,
    // child_id) structs — NOT an index-only string: two sibling
    // subtrees sharing a duplicate child_index with identical index
    // paths to their leaves must order by the first-divergent SIBLING
    // id (the fused DFS walk's (index, id) child sort), not by leaf id
    // (round-13 advice). Spark orders array<struct> element-wise in
    // the id column's native type, so Long-id graphs tie 9 < 10.
    val idT = edges.schema("child_id").dataType
    val emptyP2 = array().cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("i", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("d", idT)))))
    var frontier = subRoots.select(col("id").as("sr"), col("id").as("cur"), emptyP2.as("p2"),
      emptyStyles.as("bs2"), emptyStyles.as("ss2"))
      .localCheckpoint()
    // leaf pieces stay lazy plans over the checkpointed frontiers
    var leafParts = Vector(frontier.limit(0)
      .select(col("sr"), col("p2"), col("cur").as("leaf"), col("bs2"), col("ss2")))
    // LevelsPerRound levels per checkpoint (see sectionItems)
    var depth = 0
    while (!frontier.isEmpty && depth < MaxDepth) {
      var f = frontier
      var lvl = 0
      while (lvl < LevelsPerRound && depth < MaxDepth) {
        depth += 1; lvl += 1
        val info = f.join(kinds, Seq("cur"))
        leafParts :+= info.filter(col("kind") === "TEXT" ||
            (col("kind") === "LIST" && col("layout") === "CHAIN"))
          .select(col("sr"), col("p2"), col("cur").as("leaf"), col("bs2"), col("ss2"))
        f = info
          .filter((col("kind") === "LIST" && col("layout") === "PAGE") || col("kind") === "STYLED")
          .join(edges, col("cur") === edges("parent_id"))
          .select(col("sr"), col("child_id").as("cur"),
            concat(col("p2"), array(struct(
              col("child_index").cast("int").as("i"),
              col("child_id").as("d")))).as("p2"),
            when(col("kind") === "STYLED" && col("style_kind") === "BLOCK",
              array_union(col("bs2"), col("styles"))).otherwise(col("bs2")).as("bs2"),
            when(col("kind") === "STYLED" && col("style_kind") === "SPAN",
              array_union(col("ss2"), col("styles"))).otherwise(col("ss2")).as("ss2"))
      }
      frontier = f.localCheckpoint()
    }
    leafParts.reduce(_ unionByName _)
  }

  /** Flat inline span list per leaf (lib.rs:310-334 `spans`,
    * serving twin View.spans): chains recurse in slot order, span-
    * styled wrappers recurse adding their styles, text terminates as a
    * span row, pages / block-styled nodes terminate as LINK markers.
    * Context-free per leaf — a leaf shared by many tiles flattens
    * once. Emits (leaf, spath, ss, text, is_link).
    */
  private def leafSpans(nodes: DataFrame, edges: DataFrame, leafIds: DataFrame): DataFrame = {
    val kinds = nodes.select(col("id").as("cur"), col("kind"), col("layout"),
      col("style_kind"), coalesce(col("styles"), emptyStyles).as("styles"), col("text"))
    var frontier = leafIds.select(col("id").as("leaf"), col("id").as("cur"),
      lit("").as("spath"), emptyStyles.as("ss")).localCheckpoint()
    var spanParts = Vector(frontier.limit(0)
      .select(col("leaf"), col("spath"), col("ss"),
        lit(null).cast("string").as("text"), lit(false).as("is_link")))
    // LevelsPerRound levels per checkpoint (see sectionItems)
    var depth = 0
    while (!frontier.isEmpty && depth < MaxDepth) {
      var f = frontier
      var lvl = 0
      while (lvl < LevelsPerRound && depth < MaxDepth) {
        depth += 1; lvl += 1
        val info = f.join(kinds, Seq("cur"))
        spanParts :+= info.filter(col("kind") === "TEXT")
          .select(col("leaf"), col("spath"), col("ss"), col("text"), lit(false).as("is_link"))
        spanParts :+= info.filter((col("kind") === "LIST" && col("layout") === "PAGE") ||
            (col("kind") === "STYLED" && col("style_kind") === "BLOCK"))
          .select(col("leaf"), col("spath"), col("ss"),
            lit(null).cast("string").as("text"), lit(true).as("is_link"))
        f = info
          .filter((col("kind") === "LIST" && col("layout") === "CHAIN") ||
            (col("kind") === "STYLED" && col("style_kind") === "SPAN"))
          .join(edges, col("cur") === edges("parent_id"))
          .select(col("leaf"), col("child_id").as("cur"),
            concat(col("spath"), key(col("child_index"))).as("spath"),
            when(col("style_kind") === "SPAN", array_union(col("ss"), col("styles")))
              .otherwise(col("ss")).as("ss"))
      }
      frontier = f.localCheckpoint()
    }
    spanParts.reduce(_ unionByName _)
  }

  /** block_to_markup distributed (markup.rs:234-239 via the serving
    * serializer view/Markup.fromBlock, run inside executors): the
    * rendered markup of every tile subsection — block styles and
    * context span styles accumulated along the section + subsection
    * descents, the leaf's inline span list flattened in slot order,
    * and the EXACT serving serializer (open/close toggle tracking,
    * escapes, block-prefix escape rule) applied per subsection.
    *
    * Blocks containing LINK spans are excluded: fromBlock defines
    * serialization only for text spans (q78 proves link branches
    * structurally). Emits DISTINCT (root_id, subsection_id, markup) —
    * a leaf reached under two style contexts renders once per context.
    *
    * Styles must be markup style names (BOLD/ITALIC/STRUCK/CODE,
    * HEADING/LIST/QUOTE/ASIDE); callers with synthetic style
    * vocabularies remap before calling.
    */
  def subsectionMarkup(nodes: DataFrame, edges0: DataFrame, roots: DataFrame): DataFrame = {
    // sub-cap: serving serializer over broadcast graph (see tileSkeletons)
    FusedGraph.subsectionMarkup(nodes, edges0, roots) match {
      case Some(df) => return df
      case None => ()
    }
    val edges = GraphOps.liveEdges(nodes, edges0).localCheckpoint()
    val items = sectionItems(nodes, edges, roots)
    val leaves = subsectionLeaves(nodes, edges,
      items.select(col("sub_root").as("id")).distinct())
    val spans = leafSpans(nodes, edges, leaves.select(col("leaf").as("id")).distinct())
    // encode each span as one sortable string: fixed-width slot path,
    // then styles, then text LAST (text may contain the separator)
    val enc = spans.groupBy("leaf").agg(
      sort_array(collect_list(when(!col("is_link"),
        concat_ws("\u0001", col("spath"),
          concat_ws(",", array_sort(col("ss"))), coalesce(col("text"), lit("")))))).as("enc"),
      max(col("is_link").cast("int")).as("has_link"))
    val ctx = items
      .join(leaves.withColumnRenamed("sr", "sub_root"), Seq("sub_root"))
      .select(col("root"), col("leaf"),
        array_union(col("bs"), col("bs2")).as("bsAll"),
        array_union(col("ss"), col("ss2")).as("ssAll"))
      .distinct()
    ctx.join(enc, Seq("leaf"), "left")
      .filter(coalesce(col("has_link"), lit(0)) === 0)
      .select(col("root").as("root_id"), col("leaf").as("subsection_id"),
        markupUdf(col("bsAll"), col("ssAll"),
          coalesce(col("enc"), array().cast("array<string>"))).as("markup"))
      .distinct()
  }

  /** The serving serializer over the encoded span list: decode, add
    * the descent span styles to every span, serialize with
    * Markup.fromBlock — the SAME code path the serving View renders
    * with, so bulk and serving markup can only diverge if the
    * flattening itself diverges.
    */
  private val markupUdf = udf { (bs: Seq[String], ctxSs: Seq[String], enc: Seq[String]) =>
    val spans = enc.map { e =>
      val i1 = e.indexOf('\u0001')
      val i2 = e.indexOf('\u0001', i1 + 1)
      val styleStr = e.substring(i1 + 1, i2)
      val text = e.substring(i2 + 1)
      val st = (if (styleStr.isEmpty) Seq.empty[String] else styleStr.split(',').toSeq) ++ ctxSs
      graft.view.VSpan.Text(
        scala.collection.immutable.SortedSet.empty[String] ++ st, text): graft.view.VSpan
    }
    graft.view.Markup.fromBlock(graft.view.VBlock.Text(
      scala.collection.immutable.SortedSet.empty[String] ++ bs, spans.toVector))
  }

  /** Promotion of a sibling to its largest still-inline ancestor
    * (lib.rs:493-529): climb while the current node renders as a span
    * AND has exactly one parent slot, cycle-safe. Returns (sid,
    * promoted).
    */
  private def promote(edges: DataFrame, sibIds: DataFrame, spans: DataFrame): DataFrame = {
    val spanIds = spans.filter(col("is_span")).select(col("id"))
    val uniq = edges.groupBy("child_id").agg(count(lit(1)).as("np"), min("parent_id").as("pid"))
      .filter(col("np") === 1).select(col("child_id").as("id"), col("pid"))
    // POINTER-DOUBLED climb (round 10): promoted(s0) = the first
    // NON-climbable node on s0's unique-parent chain (climbable =
    // span-rendered AND exactly one parent slot), and the chain is a
    // functional graph — so a jump table J(x) = (position after 2^k
    // hops, terminal once inside the window) squares per round
    // (log2(height) rounds; the spanClass discipline). Walkers whose
    // chain CYCLES never acquire a terminal: they fall back to the
    // stepwise walk below, whose visited-set emission (the first
    // revisited node) is the serving recursion's cycle rule — the
    // fallback input is empty on well-formed graphs, costing one
    // emptiness probe.
    val climb = spanIds.join(uniq, Seq("id"))
    var jump = climb.as("c")
      .join(climb.select(col("id").as("pid")).withColumn("t", lit(true)),
        Seq("pid"), "left")
      .select(col("id"), col("pid").as("nxt"),
        when(col("t").isNull, col("pid")).as("fin"))
      .localCheckpoint()
    var resolved = jump.filter(col("fin").isNotNull).count()
    var growing = jump.filter(col("fin").isNull).limit(1).count() > 0
    while (growing) {
      val doubled = jump.as("a")
        .join(jump.select(col("id").as("nxt"), col("nxt").as("nxt2"),
          col("fin").as("fin2")).as("b"), Seq("nxt"), "left")
        .select(col("a.id").as("id"),
          when(col("a.fin").isNotNull, col("nxt")).otherwise(col("nxt2")).as("nxt"),
          coalesce(col("a.fin"), col("fin2")).as("fin"))
        .localCheckpoint()
      val now = doubled.filter(col("fin").isNotNull).count()
      jump.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
      jump = doubled
      if (now == resolved) growing = false else resolved = now
    }
    val s0s = sibIds.select(col("id"))
    val looked = s0s.join(jump.select(col("id"), col("fin")), Seq("id"), "left")
    val immediate = looked.filter(col("fin").isNull)
      .join(climb.select("id"), Seq("id"), "left_anti")
      .select(col("id").as("s0"), col("id").as("promoted"))
    val chained = looked.filter(col("fin").isNotNull)
      .select(col("id").as("s0"), col("fin").as("promoted"))
    val cyclic = looked.filter(col("fin").isNull)
      .join(climb.select("id"), Seq("id"), "left_semi")
      .select("id")
    immediate.unionByName(chained)
      .unionByName(promoteStepwise(edges, cyclic, spans))
  }

  /** The stepwise climb — now only the cycle fallback of [[promote]]
    * (its visited-set walk is the serving recursion's cycle rule).
    */
  private def promoteStepwise(edges: DataFrame, sibIds: DataFrame, spans: DataFrame): DataFrame = {
    val spanIds = spans.filter(col("is_span")).select(col("id"))
    val uniq = edges.groupBy("child_id").agg(count(lit(1)).as("np"), min("parent_id").as("pid"))
      .filter(col("np") === 1).select(col("child_id").as("id"), col("pid"))
    var state = sibIds.select(col("id").as("s0"), col("id").as("cur")).localCheckpoint()
    // visited ≡ the union of every state frame so far; both it and the
    // finals accumulate as lazy unions of the checkpointed states
    var stateParts = Vector(state)
    var finalParts = Vector(state.limit(0).select(col("s0"), col("cur").as("promoted")))
    while (!state.isEmpty) {
      val visited = stateParts.reduce(_ unionByName _)
      val j = state
        .join(spanIds.select(col("id").as("cur"), lit(true).as("isSpan")), Seq("cur"), "left")
        .join(uniq.select(col("id").as("cur"), col("pid")), Seq("cur"), "left")
      val climbable = j.filter(col("isSpan").isNotNull && col("pid").isNotNull)
        .join(visited.select(col("s0"), col("cur").as("pid")) // cycle: next already visited?
          .withColumn("seen", lit(true)),
          Seq("s0", "pid"), "left")
      finalParts :+= j.filter(col("isSpan").isNull || col("pid").isNull)
        .select(col("s0"), col("cur").as("promoted"))
        .unionByName(climbable.filter(col("seen").isNotNull)
          .select(col("s0"), col("pid").as("promoted")))
      state = climbable.filter(col("seen").isNull)
        .select(col("s0"), col("pid").as("cur")).localCheckpoint()
      stateParts :+= state
    }
    finalParts.reduce(_ unionByName _)
  }

  /** The tile skeleton for every root: one row per (root, section,
    * subsection) with ordered indexes, the section anchor id (null =
    * editable section), the shared flag, the subsection leaf id, and
    * the sorted before/after branch ids (siblings promoted to their
    * largest inline ancestor, minus anything already in the root's
    * view).
    */
  // GRAFT_TILE_TIMING=1 prints per-phase wall to stderr (TileProf's
  // drill-down; no cost when unset).
  private def phase[T](name: String)(f: => T): T = {
    if (!sys.env.contains("GRAFT_TILE_TIMING")) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[tile-phase] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
  }

  def tileSkeletons(nodes: DataFrame, edges0: DataFrame, roots: DataFrame): DataFrame = {
    // Two-regime split (the Components.deltaRelabel discipline): below
    // the cap the whole graph is a broadcast dimension and every tile
    // renders through the serving View in one map-side pass — the
    // ~30-job fixpoint chain below exists because the graph may NOT
    // fit, and running it on a sub-cap graph times the scheduler, not
    // the operator. FusedGraphSpec pins regime identity via the cap=0
    // hook.
    FusedGraph.tileSkeletons(nodes, edges0, roots) match {
      case Some(df) => return df
      case None => ()
    }
    // dangling-edge normalization (shared contract with the fused
    // kernel — see GraphOps.liveEdges); checkpointed once, every
    // fixpoint below re-reads the pruned table
    val edges = GraphOps.liveEdges(nodes, edges0).localCheckpoint()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    // the span-classification fixpoint feeds the sibling walks (x2),
    // the promotion climb and the in-view reach - pay for it once
    val spans = phase("spanClass")(GraphOps.spanClass(nodes, edges).localCheckpoint())
    // The batch-tile wall is JOB-COUNT bound (one driver job per BFS
    // round per loop); the loops below are independent until the final
    // assembly, so they submit from concurrent driver threads (round
    // 10) — wall = the longest dependency CHAIN
    // (items → leaves → siblings → promote), with the in-view reach,
    // the shared-flag walk, and the sibling core hidden behind it.
    val inViewF = Future(phase("viewReach")(
      viewReach(nodes, edges, roots, Some(spans)).localCheckpoint()))
    val sibCoreF = Future(phase("sibCore")(
      GraphOps.siblingCore(nodes, edges, Some(spans))))
    // both sibling walks' fixpoints (nodeRepr + delegation) are
    // leaf-independent — only the final restriction needs leafIds, so
    // the walks overlap the whole section chain
    val sibWalkF = Seq(true, false).map { before =>
      before -> sibCoreF.map(core => phase(s"sibWalk($before)")(
        GraphOps.siblingAdjacencyFrom(nodes, core, before)
          .localCheckpoint()))
    }.toMap
    // the promotion climb is per-sibling context-free, so it runs over
    // the UNRESTRICTED union of both walks' sibling ids the moment
    // they land — concurrent with the whole section chain; the
    // leaf-restricted sides join against it later
    val promotedF = Future.sequence(sibWalkF.values.toSeq).map { walks =>
      phase("promote")(promote(edges,
        walks.reduce(_ unionByName _)
          .select(col("sibling_id").as("id")).distinct(), spans)
        .localCheckpoint())
    }
    val items = phase("sectionItems")(sectionItems(nodes, edges, roots))
    // shared flags for text/chain leaves (multi sections are always shared)
    val leafRoots = items.filter(col("item") === "LEAF")
      .select(col("sub_root").as("id")).distinct()
    val sharedF = Future(phase("sharedRoots")(sharedDescendantRoots(edges, leafRoots)
      .select(col("id").as("sub_root"), lit(true).as("sh")).localCheckpoint()))
    // ordered leaves per section root — needs only the sub_root SET,
    // which the shared join below does not change: runs concurrently
    // with the shared-flag walk
    val leaves = phase("subsectionLeaves")(subsectionLeaves(nodes, edges,
      items.select(col("sub_root").as("id")).distinct()).localCheckpoint())
    val chainKinds = nodes.select(col("id").as("sub_root"),
      (col("kind") === "LIST" && col("layout") === "CHAIN").as("isChain"))
    // checkpointed: consumed by BOTH branch sides' per-root frames and
    // the final assembly — a lazy plan would re-run its joins 3×
    val sections = items
      .join(Await.result(sharedF, Duration.Inf), Seq("sub_root"), "left")
      .join(chainKinds, Seq("sub_root"))
      .select(col("root"), col("path"), col("sub_root"),
        when(col("item") === "MULTI", col("sub_root"))
          .when(col("isChain") && col("sh").isNotNull, col("sub_root"))
          .as("section_anchor"),
        (col("item") === "MULTI" || col("sh").isNotNull).as("section_shared"))
      .localCheckpoint()

    // branches per (root, leaf, side) — the two directions share the
    // sibling walk's side-independent prefix (non-blank closure +
    // candidate classification) AND one promotion climb over the
    // union of both sides' sibling ids (round 10: the climb is
    // per-sibling context-free, so two identical loops were one)
    val leafIds = leaves.select(col("leaf").as("id")).distinct().localCheckpoint()
    val perRoot = sections.select(col("root"), col("sub_root")).distinct()
      .join(leaves.select(col("sr").as("sub_root"), col("leaf")), Seq("sub_root"))
      .select(col("root"), col("leaf")).distinct()
      .localCheckpoint()
    // each side's restriction + per-tile branch aggregation
    // materializes on its own thread; the final assembly reads two
    // small checkpointed (root, leaf, ids) frames
    val branchArrayF = Seq((true, "before_ids"), (false, "after_ids")).map {
      case (before, cname) =>
        val f = for {
          walk <- sibWalkF(before)
          promoted <- promotedF
          inView <- inViewF
        } yield phase(s"branchArray($before)") {
          val sibs = walk.join(leafIds, Seq("id"), "left_semi")
          val branch = sibs
            .join(promoted.withColumnRenamed("s0", "sibling_id"), Seq("sibling_id"))
            .select(col("id").as("leaf"), col("promoted"))
          // a leaf's branches are per TILE: drop promoted ids already
          // in the root's view, then aggregate the survivors
          perRoot.join(branch, Seq("leaf"))
            .join(inView.select(col("root"), col("id").as("promoted"))
              .withColumn("inv", lit(true)), Seq("root", "promoted"), "left")
            .filter(col("inv").isNull)
            .groupBy("root", "leaf")
            .agg(array_sort(collect_set(col("promoted"))).as(cname))
            .localCheckpoint()
        }
        (cname, f)
    }.toMap
    val beforeB = Await.result(branchArrayF("before_ids"), Duration.Inf)
    val afterB = Await.result(branchArrayF("after_ids"), Duration.Inf)

    val emptyArr = array().cast("array<string>")
    val wSec = Window.partitionBy("root").orderBy("path")
    // p2 now carries the full (child_index, child_id) pair per step,
    // so duplicate-index siblings order by the first-divergent sibling
    // id exactly like the fused DFS walk; the trailing leaf key only
    // covers the degenerate duplicate-edge case (same parent, index,
    // and child twice) for determinism.
    val wSub = Window.partitionBy("root", "path").orderBy(col("p2"), col("leaf"))
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
    val spans = GraphOps.spanClass(nodes, edges)  // single use: no sharing to exploit
    edges
      .join(roots.select(col("id").as("child_id")), Seq("child_id"), "left_semi")
      .join(spans.select(col("id").as("child_id"), col("is_span").as("csp")), "child_id")
      .join(spans.select(col("id").as("parent_id"), col("is_span").as("psp")), "parent_id")
      .filter(!col("csp") && col("psp"))
      .select(col("child_id").as("root_id"), col("parent_id")).distinct()
  }
}
