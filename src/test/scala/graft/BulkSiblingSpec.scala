package graft

import graft.bulk.GraphOps
import graft.core.GraftDb
import graft.model.{Child, Layout, Node}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The distributed sibling walk (GraphOps.siblingAdjacency) against the
  * serving-path GraftDb.before/after as the executable specification,
  * on the reference's own sibling scenarios
  * (assemblage_db/tests/siblings.rs:11-202): nested lists, pages as
  * links, blank skipping, aside skipping.
  */
class BulkSiblingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-sibling-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Bulk before/after of every node == serving before/after. */
  private def checkParity(db: GraftDb, clue: String): Unit = {
    val (nodes0, edges) = GraphOps.tablesFrom(db, spark)
    val nodes = GraphOps.siblingNodes(nodes0)
    def bulk(before: Boolean): Map[String, Set[String]] =
      GraphOps.siblingAdjacency(nodes, edges, before)
        .collect().map(r => (r.getString(0), r.getString(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val (bb, ba) = (bulk(before = true), bulk(before = false))
    for (id <- db.nodes.liveKeys) {
      assert(bb.getOrElse(id.toString, Set.empty) === db.before(id).map(_.toString),
        s"$clue: before($id)")
      assert(ba.getOrElse(id.toString, Set.empty) === db.after(id).map(_.toString),
        s"$clue: after($id)")
    }
  }

  test("siblings of text nodes across nested page boundaries (siblings.rs:11-54)") {
    val db = new GraftDb
    val first = db.add(Node.text("first"))
    val foo = db.add(Node.text("foo"))
    val bar = db.add(Node.text("bar"))
    val baz = db.add(Node.text("baz"))
    val last = db.add(Node.text("last"))
    val in1 = db.add(Node.List(Layout.Page, Vector(Child.Lazy(first), Child.Lazy(foo))))
    val in2 = db.add(Node.List(Layout.Page, Vector(Child.Lazy(bar))))
    val in3 = db.add(Node.List(Layout.Page, Vector(Child.Lazy(baz), Child.Lazy(last))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(in1), Child.Lazy(in2), Child.Lazy(in3))))
    // the ported expectations, then full parity
    assert(db.before(first) === Set.empty)
    assert(db.before(bar) === Set(foo))
    assert(db.after(bar) === Set(baz))
    assert(db.after(last) === Set.empty)
    checkParity(db, "text-nodes")
  }

  test("sibling search never crosses link boundaries (siblings.rs:56-121)") {
    val db = new GraftDb
    val first = db.add(Node.text("first"))
    val foo = db.add(Node.text("foo"))
    val bar = db.add(Node.text("bar"))
    val baz = db.add(Node.text("baz"))
    val last = db.add(Node.text("last"))
    val in1 = db.add(Node.List(Layout.Page, Vector(Child.Lazy(first), Child.Lazy(foo))))
    val in2 = db.add(Node.List(Layout.Page, Vector(Child.Lazy(bar))))
    val in3 = db.add(Node.List(Layout.Page, Vector(Child.Lazy(baz), Child.Lazy(last))))
    val fbb = db.add(Node.List(Layout.Page, Vector(Child.Lazy(in1), Child.Lazy(in2), Child.Lazy(in3))))
    // the page is wrapped in chains → rendered as a link span twice
    val ch1 = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(fbb))))
    val ch2 = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(fbb))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(ch1), Child.Lazy(ch2))))
    assert(db.before(first) === Set.empty, "links are never crossed upward")
    assert(db.after(last) === Set.empty)
    checkParity(db, "linked-pages")
  }

  test("link nodes are returned as siblings (siblings.rs:93-117)") {
    val db = new GraftDb
    val foobar = db.add(Node.page(Node.text("foo"), Node.text("bar")))
    val text = db.add(Node.text("text after foobar"))
    val chain = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(foobar))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(chain), Child.Lazy(text))))
    assert(db.before(text) === Set(foobar), "the linked page itself is the sibling")
    checkParity(db, "linked-sibling")
  }

  test("blank siblings are skipped (siblings.rs:119-166)") {
    val db = new GraftDb
    val first = db.add(Node.text("first"))
    val foo = db.add(Node.text("")) // blank
    val bar = db.add(Node.text("bar"))
    val baz = db.add(Node.text("   ")) // blank
    val qux = db.add(Node.text("   ")) // blank
    val last = db.add(Node.text("last"))
    db.add(Node.List(Layout.Page, Vector(
      Child.Eager(Node.List(Layout.Page, Vector(Child.Lazy(first)))),
      Child.Eager(Node.List(Layout.Page, Vector(Child.Lazy(foo)))),
      Child.Eager(Node.List(Layout.Page, Vector(Child.Lazy(bar)))),
      Child.Eager(Node.List(Layout.Page, Vector(Child.Lazy(baz), Child.Lazy(qux), Child.Lazy(last)))))))
    assert(db.after(first) === Set(bar), "blank [foo] page skipped")
    assert(db.before(foo) === Set.empty, "blank start → no siblings")
    assert(db.after(foo) === Set.empty)
    assert(db.before(last) === Set(bar))
    checkParity(db, "blanks")
  }

  test("aside-styled candidates are skipped (siblings.rs:168-202)") {
    val db = new GraftDb
    val first = db.add(Node.text("first"))
    val foo = db.add(Node.text("foo"))
    val bar = db.add(Node.text("bar"))
    val baz = db.add(Node.text("baz"))
    val last = db.add(Node.text("last"))
    val aside = db.add(Node.styledBlock("ASIDE", Node.text("aside")))
    db.add(Node.List(Layout.Page, Vector(
      Child.Eager(Node.List(Layout.Page, Vector(
        Child.Lazy(aside), Child.Lazy(first), Child.Lazy(foo), Child.Lazy(aside), Child.Lazy(aside)))),
      Child.Eager(Node.List(Layout.Page, Vector(Child.Lazy(bar)))),
      Child.Eager(Node.List(Layout.Page, Vector(
        Child.Lazy(aside), Child.Lazy(aside), Child.Lazy(baz), Child.Lazy(last), Child.Lazy(aside)))))))
    assert(db.before(first) === Set.empty, "leading asides skipped, nothing before")
    assert(db.before(bar) === Set(foo))
    assert(db.after(bar) === Set(baz))
    assert(db.after(last) === Set.empty)
    checkParity(db, "asides")
  }

  test("styled spans, blocks and diamonds (shared-leaf DAG)") {
    val db = new GraftDb
    val shared = db.add(Node.text("shared leaf"))
    val c1 = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(shared))))
    val c2 = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(shared))))
    val diamond = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(c1), Child.Lazy(c2))))
    val page = db.add(Node.page(
      Node.text("one"),
      Node.styledSpan("BOLD", Node.text("two")),
      Node.styledBlock("HEADING", Node.text("three"))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(diamond), Child.Lazy(page))))
    checkParity(db, "styled-diamond")
  }

  test("random multi-parent DAGs (seeded): full bulk-vs-serving parity") {
    // beyond the ported scenarios: random mixes of blank/non-blank
    // texts, chains, pages, styled span/block/aside wrappers, with
    // repeated child slots and shared (multi-parent) subtrees — the
    // sibling semantics' combinatorial surface.
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 4) {
      val db = new GraftDb
      var pool = Vector.tabulate(6) { i =>
        db.add(Node.text(if (rnd.nextInt(4) == 0) "   " else s"t$trial-$i"))
      }
      for (_ <- 1 to 12) {
        val kids = Vector.fill(1 + rnd.nextInt(3))(pool(rnd.nextInt(pool.length)))
          .map(Child.Lazy(_): Child)
        val node = rnd.nextInt(6) match {
          case 0       => Node.List(Layout.Chain, kids)
          case 1 | 2   => Node.List(Layout.Page, kids)
          case 3       => Node.styledSpan(if (rnd.nextBoolean()) "BOLD" else "CODE",
            Node.List(Layout.Chain, kids))
          case 4       => Node.styledBlock("HEADING", Node.List(Layout.Page, kids))
          case _       => Node.styledBlock("ASIDE", Node.List(Layout.Page, kids))
        }
        pool :+= db.add(node)
      }
      checkParity(db, s"random-$trial")
    }
  }
}
