package graft

import graft.bulk.{FusedGraph, GraphOps, TileOps}
import graft.core.GraftDb
import graft.model.{Child, Layout, Node}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regime identity for the fused graph/tile kernel: the distributed
  * fixpoints (cap = 0) and the fused broadcast kernel (cap = huge)
  * must produce the same rows — on serving-built Gid graphs covering
  * branches, promotion, asides, shared sections, diamonds and cycles,
  * AND on the Long-keyed derived corpus graph (the q61/q68/q73/q81
  * shape, exercising the string→long id round-trip and array casts).
  */
class FusedGraphSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-fused-graph-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withCap[T](cap: Long)(f: => T): T = {
    spark.conf.set("spark.graft.fusedGraphCap", cap.toString)
    try f finally spark.conf.unset("spark.graft.fusedGraphCap")
  }

  /** Collect a frame into an order-free multiset of normalized rows
    * (arrays become sorted element vectors, everything stringly).
    */
  private def rowsOf(df: DataFrame): Map[Seq[String], Int] = {
    def norm(v: Any): String = v match {
      case null              => "∅"
      case s: Seq[_]         => s.map(String.valueOf).sorted.mkString("[", ",", "]")
      case other             => String.valueOf(other)
    }
    df.collect().map(_.toSeq.map(norm)).groupBy(identity).view.mapValues(_.length).toMap
  }

  private def assertRegimeIdentity(clue: String)(run: => DataFrame): Unit = {
    val distributed = withCap(0L)(rowsOf(run))
    val fused = withCap(100000000L)(rowsOf(run))
    if (fused != distributed) {
      val onlyF = fused.toSet.diff(distributed.toSet).take(12)
      val onlyD = distributed.toSet.diff(fused.toSet).take(12)
      fail(s"$clue: regimes differ\n  fused-only: $onlyF\n  distributed-only: $onlyD")
    }
  }

  /** A serving graph exercising every tile feature: page roots, chains
    * with promotion-eligible styled spans, aside blocks (skipped by
    * the sibling walk), blank atoms, a shared (diamond) subsection, a
    * linking span parent, and a styled block wrapper.
    */
  private def scenarioDb(): (GraftDb, Vector[graft.model.Gid]) = {
    val db = new GraftDb
    val shared = db.add(Node.text("shared leaf"))
    val pageA = db.add(Node.page(
      Node.styledBlock("HEADING", Node.text("a heading")),
      Node.text(""),
      Node.chain(
        Node.styledSpan("BOLD", Node.text("bold bit")),
        Node.text("plain bit")),
      Node.styledBlock("ASIDE", Node.text("an aside")),
      Node.text("tail")))
    val pageB = db.add(Node.List(Layout.Page, Vector(
      Child.Lazy(shared),
      Child.Eager(Node.text("b only")),
      Child.Lazy(pageA))))
    val pageC = db.add(Node.List(Layout.Page, Vector(
      Child.Lazy(shared),
      Child.Eager(Node.chain(Node.text("c chain"))))))
    val linkedRoot = db.add(Node.page(Node.styledSpan("ITALIC",
      Node.List(Layout.Page, Vector(Child.Lazy(pageC))))))
    (db, Vector(pageA, pageB, pageC, linkedRoot))
  }

  private def gidTables(db: GraftDb): (DataFrame, DataFrame) = {
    val (nodes0, edges) = GraphOps.tablesFrom(db, spark)
    (GraphOps.siblingNodes(nodes0), edges)
  }

  test("tileSkeletons: fused equals distributed on the scenario graph") {
    import spark.implicits._
    val (db, roots) = scenarioDb()
    val (nodes, edges) = gidTables(db)
    val rootsDf = roots.map(_.toString).toDF("id")
    assertRegimeIdentity("tileSkeletons/gid") {
      TileOps.tileSkeletons(nodes, edges, rootsDf)
    }
  }

  test("subsectionMarkup: fused equals distributed on a markup-vocabulary graph") {
    import spark.implicits._
    val db = new GraftDb
    val root = db.add(Node.page(
      Node.styledBlock("HEADING", Node.text("title")),
      Node.chain(
        Node.styledSpan("BOLD", Node.styledSpan("ITALIC", Node.text("nested"))),
        Node.text("-# prefix-escape bait"),
        Node.text("a*b_c`d~e")),
      Node.styledBlock("QUOTE", Node.chain(Node.text("quoted")))))
    val (nodes, edges) = gidTables(db)
    val rootsDf = Seq(root.toString).toDF("id")
    assertRegimeIdentity("subsectionMarkup/gid") {
      TileOps.subsectionMarkup(nodes, edges, rootsDf)
    }
  }

  test("previewAll: fused equals distributed incl. blank, empty, cyclic") {
    val db = new GraftDb
    db.add(Node.page(
      Node.styledSpan("ITALIC", Node.text("foo")),
      Node.text("bar")))
    db.add(Node.text("     "))
    db.add(Node.List(Layout.Chain, Vector.empty))
    val pageId = db.add(Node.List(Layout.Page, Vector.empty))
    db.push(pageId, Child.Eager(Node.List(Layout.Chain, Vector(
      Child.Lazy(pageId), Child.Eager(Node.text("foo"))))))
    val (nodes0, edges) = GraphOps.tablesFrom(db, spark)
    assertRegimeIdentity("previewAll/gid") {
      GraphOps.previewAll(nodes0, edges)
    }
  }

  test("descendantsFrom: fused equals distributed, incl. a cycle") {
    import spark.implicits._
    val db = new GraftDb
    val leaf = db.add(Node.text("leaf"))
    val mid = db.add(Node.page(Node.text("m")))
    db.push(mid, Child.Lazy(leaf))
    val root = db.add(Node.List(Layout.Page, Vector(Child.Lazy(mid))))
    db.push(mid, Child.Eager(Node.List(Layout.Chain, Vector(Child.Lazy(mid)))))
    val (_, edges) = GraphOps.tablesFrom(db, spark)
    val seed = Seq(root.toString).toDF("id")
    assertRegimeIdentity("descendantsFrom/gid") {
      GraphOps.descendantsFrom(edges, seed)
    }
  }

  test("the Long-keyed derived corpus graph: all four ops regime-identical") {
    import spark.implicits._
    // the q6x/q7x/q8x derivation over a synthetic corpus: ids dense in
    // [0, 400) so the base-10 containment forest, styled cross-edges,
    // PAGE roots and aside blocks all occur
    val docs = (0L until 400L)
      .map(i => (i, ("doc " + ("x" * (i % 23).toInt) + " " + i.toString)))
      .toDF("doc_id", "text")
    val (nodes, edges) = graft.queries.GraphQueries.graphTablesFrom(docs)
    val roots = nodes.filter(col("layout") === "PAGE").select("id")
    assert(roots.count() > 10, "derived graph must have PAGE roots")
    assertRegimeIdentity("tileSkeletons/long") {
      TileOps.tileSkeletons(nodes, edges, roots)
    }
    assertRegimeIdentity("subsectionMarkup/long") {
      val mapped = nodes.withColumn("styles", transform(col("styles"), st =>
        when(st === "SPAN0", "BOLD").when(st === "SPAN1", "ITALIC")
          .when(st === "SPAN2", "STRUCK")
          .when(st === "BLOCK0", "HEADING").when(st === "BLOCK1", "LIST")
          .otherwise("ASIDE")))
      TileOps.subsectionMarkup(mapped, edges, roots)
    }
    assertRegimeIdentity("previewAll/long") {
      GraphOps.previewAll(nodes, edges)
    }
    assertRegimeIdentity("descendantsFrom/long") {
      GraphOps.descendantsFrom(edges, Seq(4L).toDF("id"))
    }
  }

  test("childless styled nodes: no fabricated subsection, no consumed section rank") {
    import spark.implicits._
    // The derived-corpus degenerate the 400-doc sweep can miss: a
    // MULTI-parent styled node with NO child (its styled target falls
    // outside the corpus). The distributed assembly inner-joins
    // sections with leaves, so the section vanishes AND takes no
    // dense_rank; the fused serving path must do the same (sf0.01's
    // node 497 — root 49 + styled parent 487 — was exactly this).
    val nodes = Seq(
      (10L, "LIST", "PAGE", null, false, null, Seq.empty[String]),
      (11L, "TEXT", null, null, false, "first leaf", Seq.empty[String]),
      (12L, "STYLED", null, "SPAN", false, null, Seq("SPAN0")), // childless, multi-parent
      (13L, "TEXT", null, null, false, "last leaf", Seq.empty[String]),
      (14L, "STYLED", null, "SPAN", false, null, Seq("SPAN1")) // second parent of 12
    ).toDF("id", "kind", "layout", "style_kind", "aside", "text", "styles")
    val edges = Seq(
      (10L, 11L, 0), (10L, 12L, 1), (10L, 13L, 2), (14L, 12L, 0)
    ).toDF("parent_id", "child_id", "child_index")
    val roots = Seq(10L).toDF("id")
    assertRegimeIdentity("tileSkeletons/childless-styled") {
      TileOps.tileSkeletons(nodes, edges, roots)
    }
    assertRegimeIdentity("previewAll/childless-styled") {
      GraphOps.previewAll(nodes, edges)
    }
    // and the section AFTER the vanished one keeps the distributed rank
    val sk = withCap(100000000L)(TileOps.tileSkeletons(nodes, edges, roots))
      .select("subsection_id", "sec_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sk(11L) == 1L && sk(13L) == 2L, s"ranks: $sk")
  }

  test("dangling edges and unknown roots: fused matches the joins' drop semantics") {
    import spark.implicits._
    // Derived/partial corpora contain edges whose endpoint falls
    // outside the node set and root lists naming absent ids; the
    // distributed plans drop both at their joins, and the fused kernel
    // must do the same instead of sys.error (round-13 advice).
    val nodes = Seq(
      (10L, "LIST", "PAGE", null, false, null, Seq.empty[String]),
      (11L, "TEXT", null, null, false, "leaf a", Seq.empty[String]),
      (12L, "TEXT", null, null, false, "leaf b", Seq.empty[String])
    ).toDF("id", "kind", "layout", "style_kind", "aside", "text", "styles")
    val edges = Seq(
      (10L, 11L, 0), (10L, 12L, 1),
      (10L, 999L, 2),  // dangling child
      (998L, 11L, 0)   // dangling parent
    ).toDF("parent_id", "child_id", "child_index")
    val roots = Seq(10L, 777L).toDF("id") // 777 absent
    assertRegimeIdentity("tileSkeletons/dangling") {
      TileOps.tileSkeletons(nodes, edges, roots)
    }
    assertRegimeIdentity("previewAll/dangling") {
      GraphOps.previewAll(nodes, edges)
    }
    // and the fused run does yield the intact root's rows
    val sk = withCap(100000000L)(TileOps.tileSkeletons(nodes, edges, roots))
    assert(sk.filter(col("root_id") === 10L).count() > 0)
    assert(sk.filter(col("root_id") === 777L).count() == 0)
  }

  test("duplicate child_index ties break in native id order in both regimes") {
    import spark.implicits._
    // Long-id graph where siblings share a child_index: "10" < "9" as
    // strings but not as longs — the fused kernel must tie numerically
    // (the sibling walk's (child_index, child_id) key), and the
    // distributed preview's min_by must not leave the tie unspecified
    // (round-13 advice).
    // 9 is TEXT, 10 is an EMPTY CHAIN: the preview of node 2 descends
    // its FIRST child, so walking 9 first (native) and 10 first
    // (string) produce DIFFERENT outcomes — the identity check is
    // sharp, not vacuous.
    val nodes = Seq(
      (1L, "LIST", "PAGE", null, false, null, Seq.empty[String]),
      (2L, "LIST", "CHAIN", null, false, null, Seq.empty[String]),
      (9L, "TEXT", null, null, false, "leaf 9", Seq.empty[String]),
      (10L, "LIST", "CHAIN", null, false, null, Seq.empty[String]),
      (11L, "TEXT", null, null, false, "leaf 11", Seq.empty[String])
    ).toDF("id", "kind", "layout", "style_kind", "aside", "text", "styles")
    val edges = Seq(
      (1L, 2L, 0),
      // chain children 9, 10, 11 ALL at index 5: native order 9,10,11;
      // string order would walk 10 first
      (2L, 9L, 5), (2L, 10L, 5), (2L, 11L, 5)
    ).toDF("parent_id", "child_id", "child_index")
    assertRegimeIdentity("previewAll/dup-index") {
      GraphOps.previewAll(nodes, edges)
    }
    assertRegimeIdentity("descendantsFrom/dup-index") {
      GraphOps.descendantsFrom(edges, Seq(1L).toDF("id"))
    }
  }

  test("tileSkeletons: interior-node index ties order by first-divergent sibling id") {
    import spark.implicits._
    // Two INTERIOR sibling pages (9, 10) share child_index 5 under a
    // shared (multi-parent) section root 5, and their leaves have
    // IDENTICAL index paths (5, then 0) — so an index-only descent key
    // ties, and the tie must break by the first-divergent SIBLING id
    // (9 < 10 → leaf 20 first), exactly the fused DFS (index, id)
    // child sort. The leaf ids are INVERTED (20 under 9, 15 under 10):
    // a leaf-id tie-break would order leaf 15 first, so the identity
    // check is sharp on the round-13 advice shape (sub_idx regime
    // divergence on duplicate interior indexes).
    val nodes = Seq(
      (1L, "LIST", "PAGE", null, false, null, Seq.empty[String]),
      (2L, "LIST", "PAGE", null, false, null, Seq.empty[String]),
      (5L, "LIST", "PAGE", null, false, null, Seq.empty[String]),
      (9L, "LIST", "PAGE", null, false, null, Seq.empty[String]),
      (10L, "LIST", "PAGE", null, false, null, Seq.empty[String]),
      (20L, "TEXT", null, null, false, "under 9", Seq.empty[String]),
      (15L, "TEXT", null, null, false, "under 10", Seq.empty[String])
    ).toDF("id", "kind", "layout", "style_kind", "aside", "text", "styles")
    val edges = Seq(
      (1L, 5L, 0), (2L, 5L, 0), // 5 is multi-parent → a MULTI section
      (5L, 9L, 5), (5L, 10L, 5), // interior dup-index siblings
      (9L, 20L, 0), (10L, 15L, 0)
    ).toDF("parent_id", "child_id", "child_index")
    val roots = Seq(1L).toDF("id")
    assertRegimeIdentity("tileSkeletons/interior-dup-index") {
      TileOps.tileSkeletons(nodes, edges, roots)
    }
    // The distributed order itself (not just regime identity): under
    // section 5, sub_idx 1 must be leaf 20 (sibling 9 wins the tie).
    val sk = withCap(0L)(TileOps.tileSkeletons(nodes, edges, roots))
      .filter(col("section_anchor") === 5L)
      .select("sub_idx", "subsection_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sk(1L) == 20L, s"expected leaf 20 at sub_idx 1, got $sk")
    assert(sk(2L) == 15L, s"expected leaf 15 at sub_idx 2, got $sk")
  }

  test("duplicate seed rows: one output row per reached id in both regimes") {
    import spark.implicits._
    val edges = Seq((1L, 2L, 0), (2L, 3L, 0)).toDF("parent_id", "child_id", "child_index")
    val seed = Seq(1L, 1L, 2L).toDF("id") // duplicates on purpose
    assertRegimeIdentity("descendantsFrom/dup-seed") {
      GraphOps.descendantsFrom(edges, seed)
    }
    val out = withCap(0L)(GraphOps.descendantsFrom(edges, seed))
    assert(out.count() == out.distinct().count(), "distributed emitted duplicate ids")
  }

  test("fused output schema matches the query contract (long ids stay long)") {
    import spark.implicits._
    val docs = (0L until 120L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val (nodes, edges) = graft.queries.GraphQueries.graphTablesFrom(docs)
    val roots = nodes.filter(col("layout") === "PAGE").select("id")
    val sk = withCap(100000000L)(TileOps.tileSkeletons(nodes, edges, roots))
    val f = sk.schema.fields.map(x => x.name -> x.dataType).toMap
    assert(f("root_id") == org.apache.spark.sql.types.LongType)
    assert(f("subsection_id") == org.apache.spark.sql.types.LongType)
    assert(f("section_anchor") == org.apache.spark.sql.types.LongType)
    val pv = withCap(100000000L)(GraphOps.previewAll(nodes, edges))
    assert(pv.schema("block_id").dataType == org.apache.spark.sql.types.LongType)
  }
}
