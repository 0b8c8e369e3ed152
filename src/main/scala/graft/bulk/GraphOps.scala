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
    descendantsFrom(edges, Seq(rootId).toDF("id"))
  }

  /** [[descendants]] with an arbitrary typed seed frame (one `id`
    * column matching the edge id type) — the form the oracle-checked
    * q61 uses over the Long-keyed derived graph.
    */
  /** All-pairs transitive closure (src, dst), src ≠ dst paths of
    * length ≥ 1, by pointer doubling: C_{k+1} = C_k ∪ C_k∘C_k, so a
    * depth-d DAG closes in ⌈log2 d⌉ rounds (one distinct-join +
    * checkpoint each) instead of d frontier rounds — the round-count
    * lever for the job-floor-bound batch-tile path (the q68
    * previewAll discipline). Output volume is O(Σ_nodes reach(n)); on
    * the shallow-wide document DAGs this engine stores that is the
    * same magnitude as the per-root reach the callers project out of
    * it. Cycle-safe: a cycle's pairs saturate (distinct) and the
    * no-growth round terminates the loop.
    */
  private[graft] def reachPairs(edges01: DataFrame): DataFrame = {
    var c = edges01.select(col("src"), col("dst")).distinct().localCheckpoint()
    var n = c.count()
    // Closure-size guard: on a deep/high-fanout DAG the all-pairs set
    // is Θ(Σ reach(n)) and can go quadratic in nodes even when callers
    // only need a small projection. Rather than silently grinding into
    // an executor-OOM shuffle, fail loudly once the pair set passes the
    // cap (session-tunable) and point at the frontier-BFS alternative.
    val maxPairs = edges01.sparkSession.conf
      .getOption("spark.graft.reachPairsMaxPairs").map(_.toLong)
      .getOrElse(1L << 28)
    var growing = n > 0
    while (growing) {
      require(n <= maxPairs,
        s"reachPairs: transitive closure exceeded $maxPairs pairs (now $n); " +
          "this graph is too deep/dense for the all-pairs form — use " +
          "descendantsFrom (frontier BFS) per seed, or raise " +
          "spark.graft.reachPairsMaxPairs")
      val doubled = c
        .unionByName(c.as("a")
          .join(c.select(col("src").as("mid"), col("dst").as("dst2")).as("b"),
            col("a.dst") === col("b.mid"))
          .select(col("a.src").as("src"), col("b.dst2").as("dst")))
        .distinct()
        .localCheckpoint()
      val n2 = doubled.count()
      c.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
      c = doubled
      if (n2 == n) growing = false else n = n2
    }
    c
  }

  /** Drop edges whose endpoints are not BOTH present in `nodes` —
    * the graph/tile family's input normalization. The serving model
    * cannot represent a parent assertion from a node that does not
    * exist (parents derive from existing nodes' child vectors), so a
    * dangling edge in a partial/derived corpus is noise, not data:
    * both regimes drop it identically (round-13 advice — previously
    * the fused kernel errored and the distributed plans dropped the
    * child side at their joins but COUNTED dangling parents in the
    * shared-section aggregate). Two semi-joins against the node-id
    * set — a small fraction of the fixpoints that follow, and they
    * prune the edge table every later join re-reads.
    */
  private[bulk] def liveEdges(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val ids = nodes.select(col("id"))
    edges
      .join(ids.withColumnRenamed("id", "parent_id"), Seq("parent_id"), "left_semi")
      .join(ids.withColumnRenamed("id", "child_id"), Seq("child_id"), "left_semi")
  }

  def descendantsFrom(edges: DataFrame, seed: DataFrame): DataFrame = {
    // sub-cap: broadcast adjacency, partition-local BFS from the seeds
    // (FusedGraph's two-regime split; cap=0 re-enables the frontier
    // loop). The fit check IS the fused collect — one bounded pass,
    // no separate count job (round-13 advice).
    FusedGraph.descendantsFrom(edges, seed) match {
      case Some(df) => return df
      case None => ()
    }
    val e = edges.select(col("parent_id"), col("child_id")).distinct().cache()
    // frontier pieces checkpointed; the visited set stays a lazy union
    // of them — checkpointing the accumulator re-writes all prior
    // rounds' blocks each round for one extra job of no benefit.
    // distinct(): the output is a SET of reached ids in both regimes —
    // duplicate seed rows must not yield duplicate output rows here
    // while the fused per-partition BFS dedupes (round-13 advice).
    val seedCp = seed.select(col("id")).distinct().localCheckpoint()
    var visitedParts = Vector(seedCp)
    var frontier = seedCp
    var growing = true
    while (growing) {
      val next = e.join(frontier, e("parent_id") === frontier("id"))
        .select(col("child_id").as("id"))
        .distinct()
        .join(visitedParts.reduce(_ unionByName _), Seq("id"), "left_anti")
        .localCheckpoint()
      if (next.isEmpty) growing = false
      else {
        visitedParts :+= next
        frontier = next
      }
    }
    e.unpersist()
    visitedParts.reduce(_ unionByName _)
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
    descendantsUntilLinksFrom(nodes, edges, Seq(rootId).toDF("id"))
  }

  /** Link-aware descendants with order-independent semantics: a node
    * is EXPANDED iff some root-path to it crosses no link edge, and
    * REACHED (included) iff it is a child of any expanded node. The
    * reference's serving walk (lib.rs:771-797) is a DFS whose result
    * can depend on pop order when a node is reachable both through a
    * link and a non-link path; the monotone formulation here is
    * deterministic, equals the DFS on link-unambiguous graphs
    * (BulkGraphSpec parity), and is the only form a distributed
    * fixpoint or a recursive SQL oracle can state.
    */
  def descendantsUntilLinksFrom(nodes: DataFrame, edges: DataFrame, seed: DataFrame): DataFrame = {
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
    // accumulators as lazy unions of checkpointed pieces (see
    // descendantsFrom)
    val seedCp = seed.select(col("id")).localCheckpoint()
    var allParts = Vector(seedCp)
    var expParts = Vector(seedCp)
    var frontier = seedCp
    var growing = true
    while (growing) {
      val reached = traversable.join(frontier, traversable("parent_id") === frontier("id"))
        .select(col("child_id").as("id"), col("is_link"))
        .localCheckpoint()
      // newly expandable: non-link children not yet expanded (a node
      // reached through a link earlier can become expandable now)
      val newExp = reached.filter(!col("is_link")).select("id").distinct()
        .join(expParts.reduce(_ unionByName _), Seq("id"), "left_anti")
        .localCheckpoint()
      val newAll = reached.select("id").distinct()
        .join(allParts.reduce(_ unionByName _), Seq("id"), "left_anti")
        .localCheckpoint()
      if (!newAll.isEmpty) allParts :+= newAll
      if (newExp.isEmpty) growing = false
      else {
        expParts :+= newExp
        frontier = newExp
      }
    }
    traversable.unpersist()
    allParts.reduce(_ unionByName _)
  }

  /** Ancestors of the seed nodes with BFS depth (min hops), walking
    * the edges upward (ancestor_path, lib.rs:552-639, as a bulk
    * traversal: the serving path returns one parent chain, the bulk
    * form the full min-depth ancestor closure — multi-parent DAGs
    * return every ancestor once).
    */
  def ancestorPathFrom(edges: DataFrame, seed: DataFrame): DataFrame = {
    val e = edges.select(col("parent_id"), col("child_id")).distinct().cache()
    // frontier pieces checkpointed, accumulator lazy (see descendantsFrom)
    val seedCp = seed.select(col("id")).withColumn("depth", lit(0L)).localCheckpoint()
    var resultParts = Vector(seedCp)
    var frontier = seedCp.select("id")
    var depth = 0L
    var growing = true
    while (growing) {
      depth += 1
      val next = e.join(frontier, e("child_id") === frontier("id"))
        .select(col("parent_id").as("id")).distinct()
        .join(resultParts.map(_.select("id")).reduce(_ unionByName _), Seq("id"), "left_anti")
        .localCheckpoint()
      if (next.isEmpty) growing = false
      else {
        resultParts :+= next.withColumn("depth", lit(depth))
        frontier = next
      }
    }
    e.unpersist()
    resultParts.reduce(_ unionByName _)
  }

  /** Conservative cycle check (is_cyclic, lib.rs:424-442): true iff
    * the child walk from `rootId` revisits any node — true cycles AND
    * diamonds, matching the reference. A revisit happens iff some
    * reachable node has ≥ 2 incoming child-slot edges from reachable
    * nodes, or the root is re-entered; duplicate child slots of one
    * parent count separately (edges are per child_index).
    */
  def isCyclic(edges: DataFrame, rootId: String): Boolean = {
    val desc = descendants(edges, rootId)
    val e = edges.select(col("parent_id"), col("child_id"), col("child_index")).distinct()
    val inDesc = e
      .join(desc.withColumnRenamed("id", "parent_id"), "parent_id")
      .join(desc.withColumnRenamed("id", "child_id"), "child_id")
    !inDesc
      .groupBy("child_id").agg(count(lit(1)).as("indeg"))
      .filter(col("indeg") >= 2 || col("child_id") === rootId)
      .isEmpty
  }

  /** ∃ reachable child with more than one parent slot globally
    * (has_shared_descendants_until_links — which, matching the
    * reference, stops at nothing despite its name).
    */
  def hasSharedDescendantsUntilLinks(edges: DataFrame, rootId: String): Boolean = {
    val desc = descendants(edges, rootId)
    val e = edges.select(col("parent_id"), col("child_id"), col("child_index")).distinct()
    val reachableChildren = e
      .join(desc.withColumnRenamed("id", "parent_id"), "parent_id")
      .select(col("child_id")).distinct()
    !e.groupBy("child_id").agg(count(lit(1)).as("np"))
      .join(reachableChildren, "child_id")
      .filter(col("np") >= 2)
      .isEmpty
  }

  /** The unique-ancestor chain walk (ancestor_path / ancestor_path_
    * until_link, lib.rs:552-639): from each seed, walk upward while
    * the current node has EXACTLY one parent, stopping at
    * multi-parent/parentless nodes, cycles, and (optionally) at a
    * parent that renders its child as a link. Returns (id, depth) of
    * the chain ancestors, depth 1 = immediate parent — the serving
    * path's path order, as a column.
    */
  def uniqueAncestorPathFrom(
      nodes: DataFrame,
      edges: DataFrame,
      seed: DataFrame,
      stopAtLinks: Boolean): DataFrame = {
    val par = edges.select(col("parent_id"), col("child_id")).distinct()
    val uniq = par.groupBy("child_id")
      .agg(count(lit(1)).as("np"), min(col("parent_id")).as("parent_id"))
      .filter(col("np") === 1)
      .select(col("child_id"), col("parent_id"))
    val walk = (if (!stopAtLinks) uniq else {
      val spans = spanClass(nodes, edges)
      uniq
        .join(spans.select(col("id").as("parent_id"), col("is_span").as("parent_span")), "parent_id")
        .join(spans.select(col("id").as("child_id"), col("is_span").as("child_span")), "child_id")
        .filter(!(col("parent_span") && !col("child_span")))
        .select(col("child_id"), col("parent_id"))
    }).cache()
    // per-seed tracking: chains from different seeds never interfere;
    // frontier pieces checkpointed, accumulator lazy (descendantsFrom)
    val seedCp = seed.select(col("id").as("start_id"), col("id"))
      .withColumn("depth", lit(0L)).localCheckpoint()
    var resultParts = Vector(seedCp)
    var frontier = seedCp.select("start_id", "id")
    var depth = 0L
    var growing = true
    while (growing) {
      depth += 1
      val next = walk.join(frontier, walk("child_id") === frontier("id"))
        .select(col("start_id"), col("parent_id").as("id")).distinct()
        .join(resultParts.map(_.select("start_id", "id")).reduce(_ unionByName _),
          Seq("start_id", "id"), "left_anti") // cycle-safe
        .localCheckpoint()
      if (next.isEmpty) growing = false
      else {
        resultParts :+= next.withColumn("depth", lit(depth))
        frontier = next
      }
    }
    walk.unpersist()
    resultParts.reduce(_ unionByName _).filter(col("depth") > 0)
  }

  /** The swap obsolete-subtree fixpoint (core.rs:364-550, serving twin
    * core/Db.scala:329-409) as a distributed iterative job: after node
    * `swappedId` drops the `removed` children, a candidate node is
    * OBSOLETE iff it is not among the replacement's children and every
    * one of its parents is the swapped node or already obsolete;
    * children of newly obsolete nodes become candidates (diamond
    * re-checking: a node kept alive by a second parent is re-examined
    * when that parent becomes obsolete). The serving walk computes this
    * least fixpoint with a stack; here each round is one join over the
    * candidate frontier, so a swap that orphans a million-node subtree
    * runs in O(depth) rounds of frontier-sized shuffles.
    *
    * Inputs are pre-swap tables: `parents` (id, parent_id) flattened
    * parent edges, `childEdges` (parent_id, child_id) forward edges,
    * `removed` = old children minus replacement children, `newChildIds`
    * = the replacement's children. Returns the obsolete ids (the set
    * the serving path tombstones). BulkSwapSpec proves equality with
    * GraftDb.swap on randomized diamond graphs.
    */
  def swapObsoleteFixpoint(
      parents: DataFrame,
      childEdges: DataFrame,
      swappedId: Any,
      removed: DataFrame,
      newChildIds: DataFrame): DataFrame = {
    val par = parents.select(col("id"), col("parent_id")).distinct().cache()
    val fwd = childEdges.select(col("parent_id"), col("child_id")).distinct().cache()
    val newIds = newChildIds.select(col("id")).distinct().localCheckpoint()
    // accumulators as lazy unions of checkpointed pieces (see
    // descendantsFrom); newCand pieces are checkpointed because the
    // next round's eligible/blocked joins consume them
    var obsParts = Vector(removed.select(col("id")).limit(0).localCheckpoint())
    var candParts = Vector(removed.select(col("id")).distinct().localCheckpoint())
    var growing = true
    while (growing) {
      val obsolete = obsParts.reduce(_ unionByName _)
      val eligible = candParts.reduce(_ unionByName _)
        .join(newIds, Seq("id"), "left_anti")
        .join(obsolete, Seq("id"), "left_anti")
      // a candidate is blocked while any parent is neither the swapped
      // node nor obsolete; parentless candidates are never blocked
      val blocked = par.join(eligible, Seq("id"))
        .filter(col("parent_id") =!= swappedId)
        .join(obsolete.withColumnRenamed("id", "parent_id"), Seq("parent_id"), "left_anti")
        .select("id").distinct()
      val newObs = eligible.join(blocked, Seq("id"), "left_anti").localCheckpoint()
      if (newObs.isEmpty) growing = false
      else {
        obsParts :+= newObs
        val newCand = fwd
          .join(newObs.withColumnRenamed("id", "parent_id"), Seq("parent_id"))
          .select(col("child_id").as("id")).distinct()
          .join(candParts.reduce(_ unionByName _), Seq("id"), "left_anti")
          .localCheckpoint()
        candParts :+= newCand
      }
    }
    par.unpersist()
    fwd.unpersist()
    obsParts.reduce(_ unionByName _)
  }

  /** The sibling walk (before/after, core.rs:152-299, serving twin
    * core/Db.scala:251-299) for EVERY node at once, with the full
    * reference semantics: blank and aside candidates are skipped, the
    * search descends into nested containers (nearest-first) until it
    * hits a rendered atom or link, and when a container has no sibling
    * on the requested side the walk recurses into its parents — unless
    * the node renders as a link there (link boundaries are never
    * crossed).
    *
    * `nodes` must carry (id, kind, layout, style_kind, aside, text):
    * `aside` marks aside-styled blocks, `text` the atom payload (for
    * subtree blankness — a node is blank iff its subtree contains only
    * blank text, lib.rs:389-416). [[tablesFrom]] graphs get them via
    * [[siblingNodes]].
    *
    * Decomposition (each piece a bounded fixpoint or one window — the
    * shape that survives a 100 TB graph):
    *
    *   1. `nonblank`: upward closure of non-blank text leaves
    *      (frontier BFS, rounds = depth).
    *   2. Per-edge candidate class — skip (blank/aside), hit (atom or
    *      link), or descend — is one static join against span class +
    *      blankness.
    *   3. `nodeRepr`: the first rendered leaf inside each container in
    *      scan direction, as a bottom-up fixpoint (rounds = depth). A
    *      candidate subtree the serving DFS skips via its visited set
    *      is exactly a subtree that resolved to None here, so the
    *      context-free fixpoint equals the serving walk on DAGs
    *      (BulkSiblingSpec); pure-container CYCLES stall and resolve
    *      to None — the monotone reading of the visited-set cutoff.
    *   4. Occurrence resolution: one window per parent — the nearest
    *      candidate on the requested side with a non-null repr.
    *   5. Parent delegation: unresolved non-link occurrences inherit
    *      the parent's siblings (transitive closure, rounds = depth).
    *
    * Returns (id, sibling_id) pairs — the set union over all of each
    * node's occurrences, exactly `before(id)` / `after(id)`.
    */
  def siblingAdjacency(nodes: DataFrame, edges: DataFrame, before: Boolean): DataFrame =
    siblingAdjacency(nodes, edges, before, None)

  /** [[siblingAdjacency]] with an optionally precomputed span
    * classification — the spanClass fixpoint is the costliest shared
    * sub-computation, and a composite caller (batch tiles runs this
    * TWICE, plus viewReach and two promotion climbs) should pay for it
    * once.
    */
  def siblingAdjacency(
      nodes: DataFrame,
      edges: DataFrame,
      before: Boolean,
      precomputedSpans: Option[DataFrame]): DataFrame =
    siblingAdjacencyFrom(nodes, siblingCore(nodes, edges, precomputedSpans), before)

  /** The side-independent prefix of the sibling walk — span classes,
    * the non-blank closure (a fixpoint), and the per-edge candidate
    * classification. Everything a before- AND after-walk caller (batch
    * tiles) would otherwise compute twice; all pieces checkpointed so
    * both directions read materialized blocks.
    */
  final case class SiblingCore(e: DataFrame, spans: DataFrame, nonblank: DataFrame, cls: DataFrame)

  def siblingCore(
      nodes: DataFrame,
      edges: DataFrame,
      precomputedSpans: Option[DataFrame] = None): SiblingCore = {
    val e = edges.select(col("parent_id"), col("child_id"), col("child_index")).localCheckpoint()
    val spans = precomputedSpans.getOrElse(spanClass(nodes, edges).localCheckpoint())

    // 1. subtree blankness (a subtree with only blank text can never
    // yield a sibling, so blank candidates classify N below).
    val nonblank = nonblankClosure(nodes, e).localCheckpoint()

    // 2. static candidate class per edge: N = skipped, S = sibling hit
    // (rendered atom, or block child of span parent = link), D = descend.
    val cls = e
      .join(spans.select(col("id").as("parent_id"), col("is_span").as("psp")), "parent_id")
      .join(spans.select(col("id").as("child_id"), col("is_span").as("csp")), "child_id")
      .join(nodes.select(col("id").as("child_id"),
        coalesce(col("aside"), lit(false)).as("aside"),
        (col("kind") === "TEXT").as("atom")), "child_id")
      .join(nonblank.select(col("id").as("child_id")).withColumn("nb", lit(true)),
        Seq("child_id"), "left")
      .select(col("parent_id"), col("child_id"), col("child_index"),
        when(col("aside") || col("nb").isNull, "N")
          .when(col("atom") || (col("psp") && !col("csp")), "S")
          .otherwise("D").as("cls"))
      .localCheckpoint()
    SiblingCore(e, spans, nonblank, cls)
  }

  /** One direction of the sibling walk over a prebuilt [[SiblingCore]]. */
  def siblingAdjacencyFrom(nodes: DataFrame, core: SiblingCore, before: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val idType = nodes.schema("id").dataType
    val spans = core.spans
    val nonblank = core.nonblank
    val cls = core.cls

    // 3. nodeRepr fixpoint: first rendered leaf of each container in
    // scan direction. before = scan children from the END (the serving
    // stack pops nearest-first), after = from the start.
    val scanOrder =
      if (before) Seq(col("child_index").desc, col("child_id").desc)
      else Seq(col("child_index").asc, col("child_id").asc)
    val ids = nodes.select("id").localCheckpoint()
    var st = ids.select(col("id"), lit("U").as("state"), lit(null).cast(idType).as("repr"))
      .localCheckpoint()
    var uCount = Long.MaxValue
    var stalled = false
    while (!stalled) {
      val ce = cls
        .join(st.select(col("id").as("child_id"), col("state").as("cst"), col("repr").as("crepr")),
          "child_id")
        .select(col("parent_id"), col("child_index"), col("child_id"),
          when(col("cls") === "S", "S").when(col("cls") === "N", "N").otherwise(col("cst")).as("vst"),
          when(col("cls") === "S", col("child_id"))
            .when(col("cls") === "D" && col("cst") === "S", col("crepr")).as("vrepr"))
      // the node resolves from its first non-skipped candidate: a hit
      // resolves Some, an unresolved child keeps it pending
      val w = Window.partitionBy("parent_id").orderBy(scanOrder: _*)
      val firstRel = ce.filter(col("vst") =!= "N")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("parent_id").as("id"), col("vst"), col("vrepr"))
      val newSt = ids.join(firstRel, Seq("id"), "left")
        .select(col("id"), coalesce(col("vst"), lit("N")).as("state"), col("vrepr").as("repr"))
        .localCheckpoint()
      val newU = newSt.filter(col("state") === "U").count()
      st = newSt
      if (newU == 0L || newU >= uCount) {
        stalled = true
        if (newU > 0L) // cyclic container chains yield no sibling
          st = st.select(col("id"),
            when(col("state") === "U", "N").otherwise(col("state")).as("state"), col("repr"))
            .localCheckpoint()
      } else uCount = newU
    }

    // 4. per-occurrence nearest resolved candidate on the requested side
    val ceF = cls
      .join(st.select(col("id").as("child_id"), col("state"), col("repr")), "child_id")
      .select(col("parent_id"), col("child_id"), col("child_index"),
        when(col("cls") === "S", col("child_id"))
          .when(col("cls") === "D" && col("state") === "S", col("repr")).as("candval"))
    val w2 = Window.partitionBy("parent_id").orderBy(col("child_index").asc, col("child_id").asc)
    val sibCol =
      if (before) last(col("candval"), ignoreNulls = true)
        .over(w2.rowsBetween(Window.unboundedPreceding, -1))
      else first(col("candval"), ignoreNulls = true)
        .over(w2.rowsBetween(1, Window.unboundedFollowing))
    val occ = ceF.withColumn("s", sibCol)
      .join(spans.select(col("id").as("parent_id"), col("is_span").as("psp")), "parent_id")
      .join(spans.select(col("id").as("child_id"), col("is_span").as("nsp")), "child_id")
      .join(nonblank.select(col("id").as("child_id")), Seq("child_id")) // blank start → ∅
      .select(col("child_id").as("nid"), col("parent_id").as("pid"),
        col("s"), col("psp"), col("nsp"))
      .localCheckpoint()

    // 5. delegation closure: unresolved occurrences inherit the
    // parent's siblings unless the node renders as a link there
    val direct = occ.filter(col("s").isNotNull)
      .select(col("nid").as("id"), col("s").as("sibling_id")).distinct()
    val deleg = occ.filter(col("s").isNull && !(col("psp") && !col("nsp")))
      .select(col("nid"), col("pid")).distinct().localCheckpoint()
    // inherited pieces checkpointed; the result accumulates as a lazy
    // union of them (accumulator-vs-frontier: a per-round checkpoint of
    // the accumulator costs a job per round for no correctness gain)
    var resultParts = Vector(direct.localCheckpoint())
    var growing = true
    while (growing) {
      val result = resultParts.reduce(_ unionByName _)
      val inherited = deleg.join(result.withColumnRenamed("id", "pid"), "pid")
        .select(col("nid").as("id"), col("sibling_id")).distinct()
        .join(result, Seq("id", "sibling_id"), "left_anti").localCheckpoint()
      if (inherited.isEmpty) growing = false
      else resultParts :+= inherited
    }
    resultParts.reduce(_ unionByName _)
  }

  /** [[tablesFrom]] nodes extended with the `aside` flag the sibling
    * walk needs (text is already carried).
    */
  def siblingNodes(nodes: DataFrame): DataFrame =
    nodes.withColumn("aside", array_contains(coalesce(col("styles"),
      array().cast("array<string>")), "ASIDE"))

  /** Upward closure of non-blank text leaves: exactly the ids for
    * which is_blank (lib.rs:389-416) is FALSE — a node is blank iff
    * its subtree contains only blank text. Frontier BFS, rounds =
    * graph depth.
    */
  def nonblankClosure(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // ancestors-of-nonblank-text = closure sources reaching a seed —
    // pointer-doubled ([[reachPairs]], log2(depth) rounds; the
    // complexity trade is documented there)
    val seedCp = nodes
      .filter(col("kind") === "TEXT" && trim(coalesce(col("text"), lit(""))) =!= "")
      .select("id").localCheckpoint()
    val c = reachPairs(edges.select(col("parent_id").as("src"),
      col("child_id").as("dst")))
    seedCp.unionByName(
        c.join(seedCp.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
          .select(col("src").as("id")))
      .distinct()
  }

  /** is_cyclic (lib.rs:424-442) for MANY roots in one tagged BFS:
    * a root is cyclic iff its per-slot child walk revisits any node —
    * true cycles AND diamonds AND duplicate child slots, matching the
    * serving walk's visited-set check. Each round steps the (root, id)
    * frontier through the edges once; a root is flagged when a child
    * arrives twice in one round (≥2 slots) or lands on an
    * already-visited node, and flagged roots stop expanding.
    */
  def cyclicRootsFrom(edges: DataFrame, roots: DataFrame): DataFrame = {
    val e = edges.select(col("parent_id"), col("child_id"), col("child_index"))
    val seedCp = roots.select(col("id").as("root"), col("id")).localCheckpoint()
    var seenParts = Vector(seedCp)
    var frontier = seedCp
    var cycParts = Vector(roots.select(col("id").as("root")).limit(0).localCheckpoint())
    var growing = true
    while (growing) {
      val seen = seenParts.reduce(_ unionByName _)
      val cyclic = cycParts.reduce(_ unionByName _)
      val arrivals = e.join(frontier, e("parent_id") === frontier("id"))
        .groupBy(col("root"), col("child_id").as("id"))
        .agg(count(lit(1)).as("slots"))
        .localCheckpoint()
      val newCyc = arrivals.filter(col("slots") >= 2).select("root")
        .unionByName(arrivals.join(seen, Seq("root", "id")).select("root"))
        .distinct()
        .join(cyclic, Seq("root"), "left_anti")
        .localCheckpoint()
      if (!newCyc.isEmpty) cycParts :+= newCyc
      val next = arrivals.select("root", "id")
        .join(seen, Seq("root", "id"), "left_anti")
        .join(cycParts.reduce(_ unionByName _), Seq("root"), "left_anti")
        .localCheckpoint()
      if (next.isEmpty) growing = false
      else {
        seenParts :+= next
        frontier = next
      }
    }
    cycParts.reduce(_ unionByName _).select(col("root").as("id"))
  }

  /** The preview descent (lib.rs:462-509, serving twin
    * core/Db.scala:134-167) for EVERY node at once. The descent is a
    * FUNCTIONAL walk — each node has exactly one next hop (a page or
    * styled node steps to its first child; text, chains and childless
    * containers terminate) — so the bulk form is pointer doubling: a
    * jump table J(v) = (landing node, styles seen) that squares its
    * reach every round, resolving all N descents in O(log depth)
    * rounds of one self-join each (vs O(depth) rounds for naive
    * stepping); walks still unresolved once 2^rounds exceeds the node
    * count are on-path cycles. Style sets accumulate through
    * `array_union` along the composed hops — the sorted-set semantics
    * of the serving accumulator.
    *
    * Returns (id, outcome ∈ BLOCK/EMPTY/CYCLIC, block_id,
    * block_styles, span_styles); block_id/styles are null unless
    * outcome = BLOCK (styles comma-joined sorted, matching
    * `Styles.Block/Span`'s SortedSet order). Chain terminals resolve
    * EMPTY when blank, CYCLIC when their subtree walk revisits
    * ([[cyclicRootsFrom]]), else BLOCK — exactly the serving branch
    * order (childless chains are EMPTY via the childless check first).
    */
  def previewAll(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // sub-cap: one serving GraftDb.preview per node over the broadcast
    // graph (FusedGraph's two-regime split; cap=0 re-enables this
    // plan). Preview fuses under a LOWER cap than the tile family —
    // see FusedGraph.previewCap for the measured crossover.
    FusedGraph.previewAll(nodes, edges) match {
      case Some(df) => return df
      case None => ()
    }
    val e = liveEdges(nodes, edges)
      .select(col("parent_id"), col("child_id"), col("child_index"))
    val emptyArr = array().cast("array<string>")
    // ties on duplicate child_index break by native child_id order —
    // min_by over the (index, id) struct, matching the fused kernel's
    // child sort (round-13 advice; plain min_by ties are unspecified)
    val firstChild = e.groupBy("parent_id")
      .agg(min_by(col("child_id"),
        struct(col("child_index"), col("child_id"))).as("nxt"))
      .withColumnRenamed("parent_id", "id")
    val cl = nodes
      .join(firstChild, Seq("id"), "left")
      .select(col("id"), col("kind"), col("layout"), col("style_kind"),
        coalesce(col("styles"), emptyArr).as("sts"), col("text"), col("nxt"))
      .withColumn("step",
        when(col("kind") === "TEXT", "TEXT")
          .when(col("nxt").isNull, "EMPTY") // childless list/styled → Empty
          .when(col("kind") === "LIST" && col("layout") === "CHAIN", "CHAIN")
          .otherwise("STEP"))
      .localCheckpoint()
    val nodeCount = cl.count()
    val term = cl.filter(col("step") =!= "STEP")
      .select(col("id").as("tgt"), lit(true).as("tdone"))
      .localCheckpoint()
    def settle(df: DataFrame): DataFrame = df
      .join(term, Seq("tgt"), "left")
      .withColumn("settled", coalesce(col("tdone"), lit(false))).drop("tdone")
    var j = settle(cl.select(col("id"),
      when(col("step") === "STEP", col("nxt")).otherwise(col("id")).as("tgt"),
      when(col("step") === "STEP" && col("style_kind") === "BLOCK", col("sts"))
        .otherwise(emptyArr).as("bst"),
      when(col("step") === "STEP" && col("style_kind") === "SPAN", col("sts"))
        .otherwise(emptyArr).as("sst"))).localCheckpoint()
    var rounds = 0
    val maxRounds = 2 + (64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, nodeCount)))
    var pending = j.filter(!col("settled")).count()
    while (pending > 0 && rounds < maxRounds) {
      val jT = j.select(col("id").as("tid"), col("tgt").as("t2"),
        col("bst").as("b2"), col("sst").as("s2"))
      val stepped = j.filter(!col("settled"))
        .join(jT, col("tgt") === col("tid"))
        .select(col("id"), col("t2").as("tgt"),
          array_union(col("bst"), col("b2")).as("bst"),
          array_union(col("sst"), col("s2")).as("sst"))
      j = settle(stepped).unionByName(j.filter(col("settled"))).localCheckpoint()
      pending = j.filter(!col("settled")).count()
      rounds += 1
    }
    // terminal resolution: chain blankness + chain subtree cyclicity
    val nonblank = nonblankClosure(nodes, e)
      .select(col("id").as("tgt"), lit(true).as("tnb"))
    val chains = cl.filter(col("step") === "CHAIN").select("id")
    val cyc = cyclicRootsFrom(e, chains)
      .select(col("id").as("tgt"), lit(true).as("tcyc"))
    val out = j
      .join(cl.select(col("id").as("tgt"), col("step").as("tstep"), col("text").as("ttext")), "tgt")
      .join(nonblank, Seq("tgt"), "left")
      .join(cyc, Seq("tgt"), "left")
      .withColumn("outcome",
        when(!col("settled"), "CYCLIC")
          .when(col("tstep") === "EMPTY", "EMPTY")
          .when(col("tstep") === "TEXT",
            when(trim(coalesce(col("ttext"), lit(""))) === "", "EMPTY").otherwise("BLOCK"))
          .when(col("tnb").isNull, "EMPTY")       // blank chain
          .when(col("tcyc").isNotNull, "CYCLIC")  // cyclic chain subtree
          .otherwise("BLOCK"))
    out.select(col("id"), col("outcome"),
      when(col("outcome") === "BLOCK", col("tgt")).as("block_id"),
      when(col("outcome") === "BLOCK", concat_ws(",", array_sort(col("bst")))).as("block_styles"),
      when(col("outcome") === "BLOCK", concat_ws(",", array_sort(col("sst")))).as("span_styles"))
  }

  /** The write-path parent propagation (update_parent_index,
    * index.rs:242-284) as a bulk closure: the ids to reindex after a
    * write batch = the dirty ids plus every ancestor reached by
    * ascending from them — a block-rendered parent is reindexed (its
    * stored block index absorbs the change) but the ascent STOPS
    * there; span-rendered parents keep ascending, exactly the
    * reference's stack walk. Parents whose rendering class is
    * unresolvable (cyclic styled chains) do not ascend. Frontier BFS
    * upward: rounds = ancestor depth, shuffles frontier-sized.
    */
  def dirtyPropagation(nodes: DataFrame, edges: DataFrame, dirty: DataFrame): DataFrame = {
    val spanIds = spanClass(nodes, edges).filter(col("is_span")).select("id").cache()
    val up = edges.select(col("parent_id"), col("child_id")).distinct()
    val seedCp = dirty.select(col("id")).distinct().localCheckpoint()
    var reachedParts = Vector(seedCp)
    var frontier = seedCp
    var growing = true
    while (growing) {
      val parents = up.join(frontier, up("child_id") === frontier("id"))
        .select(col("parent_id").as("id")).distinct()
        .join(reachedParts.reduce(_ unionByName _), Seq("id"), "left_anti")
        .localCheckpoint()
      if (parents.isEmpty) growing = false
      else {
        reachedParts :+= parents
        frontier = parents.join(spanIds, Seq("id")).localCheckpoint()
        if (frontier.isEmpty) growing = false
      }
    }
    spanIds.unpersist()
    reachedParts.reduce(_ unionByName _)
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
    // POINTER-DOUBLED chain resolution (round 10 — the step-per-round
    // form paid one round per styled-chain link, and the batch-tile
    // wall is round-count bound): a pending span wrapper's class is
    // its styled CHAIN's endpoint class, and the chain is a functional
    // graph (one child slot per wrapper; a malformed multi-slot
    // wrapper deterministically follows its lowest slot), so the jump
    // table J(id) = (nxt after 2^k hops, cls once a base-resolved
    // endpoint falls inside the window) squares each round:
    // log2(longest chain) rounds instead of longest-chain rounds.
    // Walkers on cyclic chains never acquire cls and a round that
    // resolves nothing new terminates the loop — they stay
    // unclassified, exactly the step-form's unresolvable semantics.
    // localCheckpoint, not cache: frames are reassigned per round, and
    // a cache entry on the seed would outlive the method.
    val resolvedBase = base.filter(col("is_span").isNotNull)
      .select(col("id"), col("is_span")).localCheckpoint()
    val styledEdge = edges.select(col("parent_id"), col("child_id"))
    val pending0 = base.filter(col("is_span").isNull).select(col("id"))
    var jump = pending0
      .join(styledEdge, pending0("id") === styledEdge("parent_id"))
      .groupBy("id").agg(min(col("child_id")).as("nxt"))
      .join(resolvedBase.select(col("id").as("nxt"), col("is_span").as("cls")),
        Seq("nxt"), "left")
      .select(col("id"), col("nxt"), col("cls"))
      .localCheckpoint()
    var resolvedCount = jump.filter(col("cls").isNotNull).count()
    var growing = jump.filter(col("cls").isNull).limit(1).count() > 0
    while (growing) {
      val doubled = jump.as("a")
        .join(jump.select(col("id").as("nxt"), col("nxt").as("nxt2"),
          col("cls").as("cls2")).as("b"), Seq("nxt"), "left")
        .select(col("a.id").as("id"),
          when(col("a.cls").isNotNull, col("nxt"))
            .otherwise(col("nxt2")).as("nxt"),
          coalesce(col("a.cls"), col("cls2")).as("cls"))
        .localCheckpoint()
      val nowResolved = doubled.filter(col("cls").isNotNull).count()
      jump.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
      jump = doubled
      if (nowResolved == resolvedCount) growing = false
      else resolvedCount = nowResolved
    }
    resolvedBase.unionByName(
      jump.filter(col("cls").isNotNull).select(col("id"), col("cls").as("is_span")))
  }
}
