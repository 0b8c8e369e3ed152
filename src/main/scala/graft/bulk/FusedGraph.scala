package graft.bulk

import graft.core.{GraftDb, Parent, PreviewedNode}
import graft.model.{Child, Gid, Layout, Node, Styles}
import graft.view.{Markup, VBlock, View, VSpan}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType}

import scala.collection.immutable.SortedSet
import scala.collection.mutable

/** FUSED single-broadcast regime for the graph/tile family — the
  * job-count killer for sub-cap graphs.
  *
  * Why: the distributed tile/preview/descendants operators are
  * iterative fixpoints (one driver job per BFS/doubling round), so on
  * a SMALL graph their wall-clock is the scheduling floor × rounds —
  * q73's ~30-job chain costs ~14 s at sf0.1 over a 5,000-node graph a
  * single core walks in milliseconds. This is the same regime split
  * as [[graft.ops.Components]]' fused delta-relabel and the media
  * fused micro-batch: below a cap, route the whole graph through a
  * sequential kernel; above it, the distributed fixpoints are the
  * only plans that scale.
  *
  * HOW (and why it is trustworthy): the sequential kernel is not a
  * third implementation — it materializes the graph into the
  * serving-path [[GraftDb]] and runs the SAME `View.tile` /
  * `GraftDb.preview` code the reference semantics were ported to and
  * that BulkTileSpec/BulkPreviewSpec already pin the distributed
  * operators against. FusedGraphSpec closes the triangle (fused ≡
  * distributed via the cap hook) on the ported scenarios plus the
  * Long-keyed derived graph.
  *
  * Scale shape: the sub-cap graph is collected ONCE (cap-guarded, the
  * audited bounded-closure pattern of the centroid/k-means paths) and
  * broadcast; ROOTS stay a distributed frame, so tiles render in
  * parallel across executors with zero shuffles and zero per-round
  * jobs — a small document graph is a broadcast dimension, the root
  * set is the driving table. Above the cap
  * (`spark.graft.fusedGraphCap`, default 1M node+edge rows) callers
  * fall through to the distributed fixpoints unchanged.
  */
object FusedGraph {

  /** Combined node+edge row cap for the fused regime. 0 disables the
    * fused path (the spec hook). The default bounds the driver-side
    * collect + broadcast to ~1M small rows (~100 MB worst case) —
    * conservative for a real driver, far above any interactive graph.
    */
  def fusedCap(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.fusedGraphCap").map(_.toLong)
      .getOrElse(1000000L)

  /** Ids round-trip through the kernel's string transport losslessly
    * only for string/integral columns; a BinaryType id (raw 16-byte
    * Gids) would corrupt under a string cast — those graphs stay on
    * the distributed plans.
    */
  private def idCastable(dt: DataType): Boolean = dt match {
    case org.apache.spark.sql.types.StringType | org.apache.spark.sql.types.LongType |
        org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.ShortType => true
    case _ => false
  }

  /** previewAll's cap is LOWER (`spark.graft.fusedPreviewCap`,
    * default 100k rows): its driving frame is EVERY node, and the
    * serving kernel re-walks chain subtrees per preview call where
    * the distributed plan shares one non-blank closure — measured at
    * the 62× graph (310k nodes): fused tile still wins 3.4×
    * (30.6 vs 102.7 s) but fused preview LOSES 3.4× (93.9 vs 27.5 s,
    * TileScaleLeg). Below 100k the fused win is decisive (0.58 vs
    * 6.5 s at 5k nodes).
    */
  def previewCap(spark: SparkSession): Long = {
    val cap = spark.conf
      .getOption("spark.graft.fusedPreviewCap").map(_.toLong)
      .getOrElse(100000L)
    math.min(cap, fusedCap(spark))
  }

  /** The collected graph in broadcast-friendly primitive arrays; node
    * references are dense int indexes into the id table.
    */
  final case class CompactGraph(
      numericIds: Boolean,
      ids: Array[String],
      kinds: Array[String],
      layouts: Array[String],
      styleKinds: Array[String],
      asides: Array[Boolean],
      texts: Array[String],
      styleSets: Array[Array[String]],
      edgeP: Array[Int],
      edgeC: Array[Int],
      edgeIdx: Array[Int])

  /** Collect a graph to the driver IF it fits under `cap` — the fit
    * check IS the collect: each side is collected through
    * `limit(cap+1)` (so work and driver memory are bounded by the cap
    * even on an over-cap graph), and exceeding the cap returns None
    * with nothing recomputed. One truncated pass per side replaces
    * the round-12 shape (two full count jobs, then a second full
    * derivation pass inside the old collectGraph) — for derived
    * frames the derivation now runs exactly once on the fused path
    * and at most a cap-bounded prefix on the distributed path.
    *
    * Nodes may or may not carry the `aside` column ([[GraphOps
    * .siblingNodes]] adds it; previewAll's inputs don't need it).
    * Edges referencing node ids absent from `nodes` are SKIPPED —
    * the distributed plans drop such rows via their joins, and the
    * regimes must agree on partial/derived corpora (round-13 advice;
    * FusedGraphSpec pins the identity on a dangling-edge graph).
    */
  private def tryCollectGraph(
      nodes: DataFrame, edges: DataFrame, cap: Long): Option[CompactGraph] = {
    if (cap <= 0 || !idCastable(nodes.schema("id").dataType)) return None
    val lim = math.min(cap, Int.MaxValue - 2L).toInt
    val hasAside = nodes.columns.contains("aside")
    val emptyArr = array().cast("array<string>")
    val nrows = nodes.select(
      col("id").cast("string"),
      col("kind"), col("layout"), col("style_kind"),
      (if (hasAside) coalesce(col("aside"), lit(false)) else lit(false)).as("aside"),
      col("text"), coalesce(col("styles"), emptyArr).as("styles"))
      .limit(lim + 1).collect()
    val n = nrows.length
    if (n > lim) return None
    val ids = new Array[String](n)
    val kinds = new Array[String](n)
    val layouts = new Array[String](n)
    val styleKinds = new Array[String](n)
    val asides = new Array[Boolean](n)
    val texts = new Array[String](n)
    val styleSets = new Array[Array[String]](n)
    val idx = new mutable.HashMap[String, Int]()
    var i = 0
    while (i < n) {
      val r = nrows(i)
      ids(i) = r.getString(0)
      require(idx.put(ids(i), i).isEmpty, s"fused graph: duplicate node id ${ids(i)}")
      kinds(i) = r.getString(1)
      layouts(i) = r.getString(2)
      styleKinds(i) = r.getString(3)
      asides(i) = r.getBoolean(4)
      texts(i) = r.getString(5)
      styleSets(i) = r.getSeq[String](6).toArray
      i += 1
    }
    val erows = edges.select(col("parent_id").cast("string"),
      col("child_id").cast("string"), col("child_index").cast("int"))
      .limit(lim - n + 1).collect()
    val m = erows.length
    if (n + m > lim) return None
    val ep = new mutable.ArrayBuilder.ofInt
    val ec = new mutable.ArrayBuilder.ofInt
    val ei = new mutable.ArrayBuilder.ofInt
    var j = 0
    while (j < m) {
      val r = erows(j)
      // dangling edge (join semantics): skip, don't fail — see scaladoc
      (idx.get(r.getString(0)), idx.get(r.getString(1))) match {
        case (Some(p), Some(c)) => ep += p; ec += c; ei += r.getInt(2)
        case _ => ()
      }
      j += 1
    }
    val numeric = nodes.schema("id").dataType match {
      case org.apache.spark.sql.types.StringType => false
      case _ => true
    }
    Some(CompactGraph(numeric, ids, kinds, layouts, styleKinds, asides, texts,
      styleSets, ep.result(), ec.result(), ei.result()))
  }

  /** Materialize the compact graph as a serving-path [[GraftDb]]:
    * children ordered by (child_index, child id) — the distributed
    * operators' order key — with [[Parent]] slots at vector positions
    * (the core invariant). Aside-styled blocks get the core's "ASIDE"
    * marker added to their style set so `GraftDb.adjacent` skips them
    * exactly where the bulk walk's `aside` flag does; style names are
    * otherwise verbatim (skeleton outputs never surface them, and the
    * markup caller's vocabulary already carries ASIDE on aside nodes).
    * Returns the db plus the index→Gid mapping (Gid(1, i): hi=1 never
    * collides with the nil root).
    */
  def buildDb(g: CompactGraph, asideMarker: Boolean = true): (GraftDb, Array[Gid], mutable.HashMap[Gid, Int]) = {
    val n = g.ids.length
    val gids = Array.tabulate(n)(i => Gid(1L, i.toLong))
    val back = new mutable.HashMap[Gid, Int]()
    var i = 0
    while (i < n) { back(gids(i)) = i; i += 1 }
    // children per parent, ordered
    val kids = Array.fill(n)(mutable.ArrayBuffer.empty[(Int, String, Int)])
    var j = 0
    while (j < g.edgeP.length) {
      kids(g.edgeP(j)) += ((g.edgeIdx(j), g.ids(g.edgeC(j)), g.edgeC(j)))
      j += 1
    }
    // Ties on duplicate child_index break in NATIVE id order — the
    // distributed sibling walk's key is (child_index, child_id) in the
    // id column's own type (GraphOps.siblingAdjacency), so a Long-id
    // graph must tie 9 < 10, not "10" < "9" (round-13 advice).
    val childVecs: Array[Vector[Int]] =
      if (g.numericIds)
        Array.tabulate(n) { p =>
          kids(p).sortBy(t => (t._1, t._2.toLong)).map(_._3).toVector
        }
      else
        Array.tabulate(n) { p =>
          kids(p).sortBy(t => (t._1, t._2)).map(_._3).toVector
        }
    val db = new GraftDb
    val parentSets = Array.fill(n)(mutable.HashSet.empty[Parent])
    i = 0
    while (i < n) {
      val cs = childVecs(i)
      cs.zipWithIndex.foreach { case (c, slot) => parentSets(c) += Parent(gids(i), slot) }
      val node: Node = g.kinds(i) match {
        case "TEXT" => Node.Text(Option(g.texts(i)).getOrElse(""))
        case "LIST" =>
          val layout = g.layouts(i) match {
            case "CHAIN" => Layout.Chain
            case "PAGE"  => Layout.Page
            case other   => sys.error(s"fused graph: unknown layout $other")
          }
          Node.List(layout, cs.map(c => Child.Lazy(gids(c)): Child))
        case "STYLED" =>
          require(cs.length <= 1,
            s"fused graph: styled node ${g.ids(i)} has ${cs.length} children")
          if (cs.isEmpty) {
            // Derived corpora contain CHILDLESS styled nodes (the
            // styled target id may fall outside the corpus). The core
            // model can't represent them; the distributed operators
            // treat them as blank nodes that produce NO subsection
            // leaves (subsectionLeaves' styled descent dies) and
            // preview Empty — which is exactly an empty PAGE list
            // (subsections(Page, ∅) = ∅, preview Empty, blank, skipped
            // by the sibling walk). NOT an empty Chain: a chain IS a
            // leaf to subsectionLeaves and would fabricate a
            // subsection the distributed plan never emits.
            // FusedGraphSpec pins the identity on a corpus containing
            // childless styled nodes.
            Node.List(Layout.Page, Vector.empty)
          } else {
            val names = SortedSet.empty[String] ++ g.styleSets(i)
            val st: Styles = g.styleKinds(i) match {
              case "SPAN" => Styles.Span(names)
              case "BLOCK" =>
                Styles.Block(if (asideMarker && g.asides(i)) names + "ASIDE" else names)
              case other => sys.error(s"fused graph: unknown style kind $other")
            }
            Node.Styled(st, Child.Lazy(gids(cs.head)))
          }
        case other => sys.error(s"fused graph: unknown node kind $other")
      }
      db.nodes.append(gids(i), node, i.toLong + 1)
      i += 1
    }
    i = 0
    while (i < n) {
      db.parentsOf.append(gids(i), parentSets(i).toSet, i.toLong + 1)
      i += 1
    }
    (db, gids, back)
  }

  private def castIds(df: DataFrame, idType: DataType, cols: Seq[String],
      arrayCols: Seq[String] = Nil): DataFrame = {
    val projected = df.columns.map { c =>
      if (cols.contains(c)) col(c).cast(idType).as(c)
      // re-sort after the element cast: "10" < "9" as strings but not
      // as longs, and the distributed arrays are sorted in the target
      // element type's order
      else if (arrayCols.contains(c)) array_sort(col(c).cast(ArrayType(idType))).as(c)
      else col(c)
    }
    df.select(projected.toIndexedSeq: _*)
  }

  // private[bulk], not private: object-private compiles to a
  // bytecode-private class, and janino then rejects the generated
  // serializer's accessor calls ("no applicable method"), forcing an
  // interpreted-encoder fallback that spams CompileException stacks
  // into every Verify/test log. Qualifier-private is compile-time
  // only — the class file stays public and codegen succeeds.
  private[bulk] final case class SkelRow(
      root_id: String, sec_idx: Long, sub_idx: Long,
      section_anchor: Option[String], section_shared: Boolean,
      subsection_id: String, before_ids: Seq[String], after_ids: Seq[String])

  /** Fused [[TileOps.tileSkeletons]]: graph broadcast, one serving
    * `View.tile` per root, roots distributed. None above the cap (the
    * caller falls through to the distributed fixpoints).
    */
  def tileSkeletons(nodes: DataFrame, edges: DataFrame, roots: DataFrame): Option[DataFrame] =
      tryCollectGraph(nodes, edges, fusedCap(nodes.sparkSession)).map { cg =>
    val spark = nodes.sparkSession
    import spark.implicits._
    val idType = nodes.schema("id").dataType
    val bc = spark.sparkContext.broadcast(cg)
    val out = roots.select(col("id").cast("string")).as[String]
      .mapPartitions { rootIt =>
        val rootsLocal = rootIt.toArray
        if (rootsLocal.isEmpty) Iterator.empty
        else {
          val g = bc.value
          val (db, gids, back) = buildDb(g)
          val view = new View(db)
          val byId = g.ids.zipWithIndex.toMap
          // a root absent from the corpus yields no rows — the
          // distributed assembly drops it at its joins (round-13
          // advice: regimes agree on failure semantics)
          rootsLocal.iterator.flatMap(r => byId.get(r).map(r -> _)).flatMap { case (rootStr, ri) =>
            // subsection-less sections (childless styled section
            // roots) take no rank: the distributed assembly inner-
            // joins sections with their leaves before dense_rank
            view.tile(gids(ri)).sections.filter(_.subsections.nonEmpty)
              .zipWithIndex.flatMap { case (sec, si) =>
              sec.subsections.zipWithIndex.map { case (sub, bi) =>
                def name(id: Gid): String = g.ids(back(id))
                SkelRow(rootStr, (si + 1).toLong, (bi + 1).toLong,
                  sec.id.map(name), sec.hasMultipleParents, name(sub.id),
                  sub.before.map(b => name(b.link.descendant.id)).distinct.sorted,
                  sub.after.map(b => name(b.link.descendant.id)).distinct.sorted)
              }
            }
          }
        }
      }.toDF()
    castIds(out, idType, Seq("root_id", "section_anchor", "subsection_id"),
      arrayCols = Seq("before_ids", "after_ids"))
  }

  /** Fused [[TileOps.subsectionMarkup]]: per root, serving tile →
    * text-only blocks through the serving serializer, DISTINCT
    * triples (the distributed contract). None above the cap.
    */
  def subsectionMarkup(nodes: DataFrame, edges: DataFrame, roots: DataFrame): Option[DataFrame] =
      tryCollectGraph(nodes, edges, fusedCap(nodes.sparkSession)).map { cg =>
    val spark = nodes.sparkSession
    import spark.implicits._
    val idType = nodes.schema("id").dataType
    val bc = spark.sparkContext.broadcast(cg)
    val out = roots.select(col("id").cast("string")).as[String]
      .mapPartitions { rootIt =>
        val rootsLocal = rootIt.toArray
        if (rootsLocal.isEmpty) Iterator.empty
        else {
          val g = bc.value
          val (db, gids, back) = buildDb(g)
          val view = new View(db)
          val byId = g.ids.zipWithIndex.toMap
          // unknown roots drop, matching the distributed joins
          rootsLocal.iterator.flatMap(r => byId.get(r).map(r -> _)).flatMap { case (rootStr, ri) =>
            view.tile(gids(ri)).sections.flatMap(_.subsections).flatMap { sub =>
              sub.block match {
                case b @ VBlock.Text(_, spans)
                    if spans.forall(_.isInstanceOf[VSpan.Text]) =>
                  Some((rootStr, g.ids(back(sub.id)), Markup.fromBlock(b)))
                case _ => None // link-bearing / cyclic: no serialization
              }
            }
          }
        }
      }.toDF("root_id", "subsection_id", "markup").distinct()
    castIds(out, idType, Seq("root_id", "subsection_id"))
  }

  /** Fused [[GraphOps.previewAll]]: graph broadcast, the node set
    * itself is the driving frame, one serving `GraftDb.preview` per
    * node. Output tuples mirror the distributed columns (null
    * block fields on EMPTY/CYCLIC, comma-joined sorted styles).
    */
  def previewAll(nodes: DataFrame, edges: DataFrame): Option[DataFrame] =
      tryCollectGraph(nodes, edges, previewCap(nodes.sparkSession)).map { cg =>
    val spark = nodes.sparkSession
    import spark.implicits._
    val idType = nodes.schema("id").dataType
    val bc = spark.sparkContext.broadcast(cg)
    val out = nodes.select(col("id").cast("string")).as[String]
      .mapPartitions { idIt =>
        val local = idIt.toArray
        if (local.isEmpty) Iterator.empty
        else {
          val g = bc.value
          // no aside marker: preview ACCUMULATES style names and the
          // sibling walk (the marker's sole consumer) never runs here
          val (db, gids, back) = buildDb(g, asideMarker = false)
          val byId = g.ids.zipWithIndex.toMap
          local.iterator.map { idStr =>
            val i = byId.getOrElse(idStr,
              sys.error(s"fused preview: id $idStr not in nodes"))
            db.preview(gids(i)) match {
              case PreviewedNode.Empty  => (idStr, "EMPTY", None: Option[String], None: Option[String], None: Option[String])
              case PreviewedNode.Cyclic => (idStr, "CYCLIC", None: Option[String], None: Option[String], None: Option[String])
              case PreviewedNode.Block(bid, node) =>
                val (bst, rest) = node match {
                  case Node.Styled(Styles.Block(st), Child.Eager(n)) => (st, n)
                  case n => (SortedSet.empty[String], n)
                }
                val sst = rest match {
                  case Node.Styled(Styles.Span(st), _) => st
                  case _ => SortedSet.empty[String]
                }
                (idStr, "BLOCK", Some(g.ids(back(bid))),
                  Some(bst.mkString(",")), Some(sst.mkString(",")))
            }
          }
        }
      }.toDF("id", "outcome", "block_id", "block_styles", "span_styles")
    castIds(out, idType, Seq("id", "block_id"))
  }

  /** Fused [[GraphOps.descendantsFrom]]: edge adjacency broadcast,
    * per-partition BFS from the local seeds, global distinct. None
    * above the cap — the fit check is the (bounded) collect itself,
    * as in [[tryCollectGraph]].
    */
  def descendantsFrom(edges: DataFrame, seed: DataFrame): Option[DataFrame] = {
    val cap = fusedCap(edges.sparkSession)
    if (cap <= 0 || !idCastable(edges.schema("parent_id").dataType)) return None
    val lim = math.min(cap, Int.MaxValue - 2L).toInt
    val erows = edges.select(col("parent_id").cast("string"),
      col("child_id").cast("string")).limit(lim + 1).collect()
    if (erows.length > lim) return None
    val spark = edges.sparkSession
    import spark.implicits._
    val idType = seed.schema("id").dataType
    val adj = new mutable.HashMap[String, mutable.ArrayBuffer[String]]()
    erows.foreach { r =>
      adj.getOrElseUpdate(r.getString(0), mutable.ArrayBuffer.empty) += r.getString(1)
    }
    val bc = spark.sparkContext.broadcast(adj)
    val out = seed.select(col("id").cast("string")).as[String]
      .mapPartitions { seedIt =>
        val a = bc.value
        val visited = mutable.HashSet.empty[String]
        val stack = mutable.Stack.empty[String]
        seedIt.foreach { s => if (visited.add(s)) stack.push(s) }
        while (stack.nonEmpty) {
          val cur = stack.pop()
          a.get(cur).foreach(_.foreach(c => if (visited.add(c)) stack.push(c)))
        }
        visited.iterator
      }.toDF("id").distinct()
    Some(castIds(out, idType, Seq("id")))
  }
}
