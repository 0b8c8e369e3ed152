package graft

import graft.bulk.{GraphOps, TileOps}
import graft.core.GraftDb
import graft.model.{Child, Layout, Node}
import graft.view.View
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Batch tile rendering (TileOps.tileSkeletons) against the serving
  * View.tile as the executable specification: for every root, the
  * section decomposition, ordered subsection leaves, before/after
  * branch id sets (with inline-ancestor promotion and in-view
  * exclusion), and the linking parent branches must match — on the
  * ported tile scenarios (assemblage_view/tests/tile.rs:160-427 via
  * TileBranchSpec) plus styled/diamond graphs.
  */
class BulkTileSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-tile-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private type Row = (Long, Long, Option[String], Boolean, String, Set[String], Set[String])

  private def servingRows(db: GraftDb, root: graft.model.Gid): Set[Row] = {
    val view = new View(db)
    view.tile(root).sections.zipWithIndex.flatMap { case (sec, si) =>
      sec.subsections.zipWithIndex.map { case (sub, bi) =>
        ((si + 1).toLong, (bi + 1).toLong, sec.id.map(_.toString),
          sec.hasMultipleParents, sub.id.toString,
          sub.before.map(_.link.descendant.id.toString).toSet,
          sub.after.map(_.link.descendant.id.toString).toSet)
      }
    }.toSet
  }

  /** Pin the DISTRIBUTED regime: these specs are the serving-vs-bulk
    * parity gate, and the fused path (FusedGraph) IS the serving code,
    * so letting sub-cap spec graphs route through it would test
    * serving against itself. FusedGraphSpec covers regime identity.
    */
  private def distributedOnly[T](f: => T): T = {
    spark.conf.set("spark.graft.fusedGraphCap", "0")
    try f finally spark.conf.unset("spark.graft.fusedGraphCap")
  }

  private def checkParity(db: GraftDb, roots: Seq[graft.model.Gid], clue: String): Unit = distributedOnly {
    import spark.implicits._
    val (nodes0, edges) = GraphOps.tablesFrom(db, spark)
    val nodes = GraphOps.siblingNodes(nodes0)
    val rootsDf = roots.map(_.toString).toDF("id")
    val bulk = TileOps.tileSkeletons(nodes, edges, rootsDf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.getString(3)), r.getBoolean(4), r.getString(5),
        r.getSeq[String](6).toSet, r.getSeq[String](7).toSet): Row))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val bulkParents = TileOps.tileParentBranches(nodes, edges, rootsDf).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (root <- roots) {
      assert(bulk.getOrElse(root.toString, Set.empty[Row]) === servingRows(db, root),
        s"$clue: tile($root) skeleton")
      val mainNode = db.get(root).get
      val servingLinkParents = db.parents(root)
        .filter(p => db.isLink(mainNode, db.get(p.id).get)).map(_.id.toString)
      assert(bulkParents.getOrElse(root.toString, Set.empty) === servingLinkParents,
        s"$clue: tile($root) parent branches")
    }
  }

  test("blank siblings are skipped in batch before-branches (tile.rs)") {
    val db = new GraftDb
    val a = db.add(Node.Text("A")); val b = db.add(Node.Text("B")); val c = db.add(Node.Text("C"))
    val page1 = db.add(Node.List(Layout.Page, Vector(Child.Lazy(a), Child.Lazy(b), Child.Lazy(c))))
    val blank1 = db.add(Node.List(Layout.Chain, Vector.empty))
    val blank2 = db.add(Node.Text("   "))
    val x = db.add(Node.Text("X"))
    val page2 = db.add(Node.List(Layout.Page, Vector(
      Child.Lazy(x), Child.Lazy(blank1), Child.Lazy(blank2), Child.Lazy(a), Child.Lazy(b))))
    checkParity(db, Seq(page1, page2), "blank-skip")
  }

  test("links appear as branches only from inline wrappers") {
    for (layout <- Seq(Layout.Chain, Layout.Page)) {
      val db = new GraftDb
      val a = db.add(Node.Text("A")); val b = db.add(Node.Text("B")); val c = db.add(Node.Text("C"))
      val x = db.add(Node.Text("X"))
      val xAsBlock = db.add(Node.List(Layout.Page, Vector(Child.Lazy(x))))
      val xWrapped = db.add(Node.List(layout, Vector(Child.Lazy(xAsBlock))))
      val page1 = db.add(Node.List(Layout.Page, Vector(
        Child.Lazy(a), Child.Lazy(b), Child.Lazy(c), Child.Lazy(xWrapped))))
      val page3 = db.add(Node.List(Layout.Page, Vector(Child.Lazy(x), Child.Lazy(b), Child.Lazy(c))))
      checkParity(db, Seq(page1, page3), s"link-branch-$layout")
    }
  }

  test("chain siblings are promoted to the whole chain, stopping at blocks") {
    val db = new GraftDb
    val foo = db.add(Node.styledSpan("BOLD", Node.Text("foo")))
    val bar = db.add(Node.Text("bar"))
    val chain = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(foo), Child.Lazy(bar))))
    val sharedText = db.add(Node.Text("shared"))
    val page1 = db.add(Node.List(Layout.Page, Vector(Child.Lazy(sharedText))))
    val page2 = db.add(Node.List(Layout.Page, Vector(Child.Lazy(chain), Child.Lazy(sharedText))))
    val unrelated = db.add(Node.Text("unrelated"))
    val outer = db.add(Node.List(Layout.Page, Vector(Child.Lazy(unrelated), Child.Lazy(page2))))
    checkParity(db, Seq(page1, page2, outer), "chain-promotion")
  }

  test("linking parents become parent branches; multi-parent blocks split sections") {
    val db = new GraftDb
    val page = db.add(Node.page(Node.Text("some text")))
    val parent1 = db.add(Node.List(Layout.Page, Vector(Child.Lazy(page))))
    val parent2 = db.add(Node.List(Layout.Page, Vector(
      Child.Eager(Node.Text("Parent page")),
      Child.Eager(Node.List(Layout.Page, Vector(Child.Lazy(page)))))))
    val outer = db.add(Node.List(Layout.Page, Vector(
      Child.Eager(Node.Text("Parent of parent page")),
      Child.Eager(Node.List(Layout.Chain, Vector(Child.Lazy(parent2)))))))
    checkParity(db, Seq(page, parent1, parent2, outer), "parents-and-shared")
  }

  test("parent link via chain wrapper yields a parent branch") {
    val db = new GraftDb
    val page = db.add(Node.page(Node.Text("some text")))
    val parentOfPage = db.add(Node.List(Layout.Page, Vector(
      Child.Eager(Node.Text("Parent page")),
      Child.Eager(Node.List(Layout.Chain, Vector(Child.Lazy(page)))))))
    checkParity(db, Seq(page, parentOfPage), "parent-link")
  }

  private def checkMarkupParity(db: GraftDb, roots: Seq[graft.model.Gid], clue: String): Unit = distributedOnly {
    import spark.implicits._
    val (nodes, edges) = GraphOps.tablesFrom(db, spark)
    val rootsDf = roots.map(_.toString).toDF("id")
    val bulk = TileOps.subsectionMarkup(nodes, edges, rootsDf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val view = new View(db)
    val serving = roots.flatMap { root =>
      view.tile(root).sections.flatMap(_.subsections).flatMap { sub =>
        sub.block match {
          case b @ graft.view.VBlock.Text(_, spans)
              if spans.forall(_.isInstanceOf[graft.view.VSpan.Text]) =>
            Some((root.toString, sub.id.toString, graft.view.Markup.fromBlock(b)))
          case _ => None // link-bearing / cyclic blocks: no serialization
        }
      }
    }.toSet
    assert(bulk === serving, s"$clue: distributed markup vs serving serializer")
  }

  test("distributed subsection markup equals the serving serializer") {
    // Exercises every serializer path the q81 oracle mirrors: char
    // escaping, the leading block-prefix escape, span toggle
    // open/close transitions (incl. nested BOLD+ITALIC), block-style
    // accumulation through a styled wrapper, an empty chain, and a
    // link-bearing subsection (excluded on both sides).
    val db = new GraftDb
    val plain = db.add(Node.Text("plain leaf"))
    val esc = db.add(Node.Text("-# looks like a prefix"))
    val specials = db.add(Node.Text("a*b_c`d~e|f\\g"))
    val bold = db.add(Node.styledSpan("BOLD", Node.Text("bold bit")))
    val mid = db.add(Node.Text(" mid "))
    val both = db.add(Node.styledSpan("ITALIC", Node.styledSpan("BOLD", Node.Text("both"))))
    val chain = db.add(Node.List(Layout.Chain, Vector(
      Child.Lazy(bold), Child.Lazy(mid), Child.Lazy(both), Child.Lazy(specials))))
    val heading = db.add(Node.styledBlock("HEADING", Node.Text("title")))
    val empty = db.add(Node.List(Layout.Chain, Vector.empty))
    val linkTarget = db.add(Node.page(Node.Text("target")))
    val linking = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(linkTarget))))
    val page = db.add(Node.List(Layout.Page, Vector(
      Child.Lazy(plain), Child.Lazy(esc), Child.Lazy(chain), Child.Lazy(heading),
      Child.Lazy(empty), Child.Lazy(linking))))
    val aside = db.add(Node.styledBlock("ASIDE", Node.page(Node.Text("aside body"))))
    val page2 = db.add(Node.List(Layout.Page, Vector(Child.Lazy(aside))))
    checkMarkupParity(db, Seq(page, page2), "markup-parity")
  }

  test("random multi-parent DAGs (seeded): distributed markup equals the serving serializer") {
    // The fishing harness that caught the round-4 serializer bug, now
    // pointed at the distributed renderer: random mixes of escape-
    // heavy texts, prefix-lookalike texts, chains, pages, nested
    // styled spans/blocks over the FULL markup style vocabulary,
    // repeated slots and shared subtrees. Roots are parentless pages
    // (rooted pages inject branch subsections, which carry no
    // serialization — q78 proves those structurally).
    val texts = Vector(
      "plain words here", "-# prefix lookalike", "> quoted start",
      "a*b_c`d~e|f\\g", "`tick` and ~wave~", "   ", "x",
      ", comma start", "mid *star* text")
    val spanStyles = Vector("BOLD", "ITALIC", "STRUCK", "CODE")
    val blockStyles = Vector("HEADING", "LIST", "QUOTE", "ASIDE")
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 4) {
      val db = new GraftDb
      var pool = Vector.fill(6)(db.add(Node.text(texts(rnd.nextInt(texts.length)))))
      var pages = Vector.empty[graft.model.Gid]
      for (_ <- 1 to 14) {
        val kids = Vector.fill(1 + rnd.nextInt(3))(pool(rnd.nextInt(pool.length)))
          .map(Child.Lazy(_): Child)
        val node = rnd.nextInt(6) match {
          case 0 | 1 => Node.List(Layout.Chain, kids)
          case 2     => Node.List(Layout.Page, kids)
          case 3 | 4 => Node.styledSpan(spanStyles(rnd.nextInt(4)),
            Node.List(Layout.Chain, kids))
          case _     => Node.styledBlock(blockStyles(rnd.nextInt(4)),
            Node.List(Layout.Page, kids))
        }
        val id = db.add(node)
        if (node.isInstanceOf[Node.List] && node.asInstanceOf[Node.List].layout == Layout.Page)
          pages :+= id
        pool :+= id
      }
      val roots = pages.filter(db.parents(_).isEmpty)
      if (roots.nonEmpty) checkMarkupParity(db, roots, s"random-$trial")
    }
  }

  test("promotion climb entering a parent-cycle keeps parity (first revisited node)") {
    // The leaf sits in the root page AND in chainZ (a second, root-
    // unreachable parent). Its after-sibling there resolves to b (repr
    // of the span subtree S), and b's promotion climb ascends
    // b → S → chainZ → cycW whose unique parent is chainZ again — a
    // rho: the cycle lives strictly above the root-reachable region
    // (any root path into a parent-cycle would give a member a second
    // parent and stop the climb early, so this is the ONLY reachable
    // cyclic shape). Engine rule: emit the first revisited node
    // (chainZ); serving and bulk must agree.
    val db = new GraftDb
    val leaf = db.add(Node.Text("leaf"))
    val page = db.add(Node.List(Layout.Page, Vector(Child.Lazy(leaf))))
    val b = db.add(Node.Text("B"))
    val s = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(b))))
    val chainZ = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(leaf), Child.Lazy(s))))
    db.push(chainZ, Child.Eager(Node.List(Layout.Chain, Vector(Child.Lazy(chainZ)))))
    checkParity(db, Seq(page), "cyclic-promotion")
  }

  test("styled wrappers and diamonds keep skeleton parity") {
    val db = new GraftDb
    val shared = db.add(Node.Text("shared leaf"))
    val c1 = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(shared))))
    val c2 = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(shared))))
    val diamond = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(c1), Child.Lazy(c2))))
    val page = db.add(Node.page(
      Node.Text("one"),
      Node.styledSpan("BOLD", Node.Text("two")),
      Node.styledBlock("HEADING", Node.Text("three"))))
    val root = db.add(Node.List(Layout.Page, Vector(Child.Lazy(diamond), Child.Lazy(page))))
    checkParity(db, Seq(root, page), "styled-diamond")
  }
}
