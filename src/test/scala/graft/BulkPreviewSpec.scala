package graft

import graft.bulk.GraphOps
import graft.core.{GraftDb, PreviewedNode}
import graft.model.{Child, Layout, Node, Styles}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.immutable.SortedSet

/** The bulk preview (GraphOps.previewAll) against the serving-path
  * GraftDb.preview as the executable specification, on the ported
  * preview scenarios (assemblage_db/tests/preview.rs via DbPreviewSpec)
  * plus styled/diamond/cyclic graphs.
  */
class BulkPreviewSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-preview-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Serving preview as the bulk operator's tuple. */
  private def servingTuple(p: PreviewedNode): (String, String, String, String) = p match {
    case PreviewedNode.Empty  => ("EMPTY", "", "", "")
    case PreviewedNode.Cyclic => ("CYCLIC", "", "", "")
    case PreviewedNode.Block(bid, node) =>
      val (bst, rest) = node match {
        case Node.Styled(Styles.Block(st), Child.Eager(n)) => (st, n)
        case n                                             => (SortedSet.empty[String], n)
      }
      val sst = rest match {
        case Node.Styled(Styles.Span(st), _) => st
        case _                               => SortedSet.empty[String]
      }
      ("BLOCK", bid.toString, bst.mkString(","), sst.mkString(","))
  }

  /** Pin the DISTRIBUTED regime (see BulkTileSpec.distributedOnly —
    * the fused path is the serving code; FusedGraphSpec covers it). */
  private def distributedOnly[T](f: => T): T = {
    spark.conf.set("spark.graft.fusedGraphCap", "0")
    try f finally spark.conf.unset("spark.graft.fusedGraphCap")
  }

  private def checkParity(db: GraftDb, clue: String): Unit = distributedOnly {
    val (nodes, edges) = GraphOps.tablesFrom(db, spark)
    val bulk = GraphOps.previewAll(nodes, edges)
      .collect()
      .map(r => r.getString(0) -> (r.getString(1),
        Option(r.getString(2)).getOrElse(""),
        Option(r.getString(3)).getOrElse(""),
        Option(r.getString(4)).getOrElse("")))
      .toMap
    for (id <- db.nodes.liveKeys) {
      assert(bulk(id.toString) === servingTuple(db.preview(id)), s"$clue: preview($id)")
    }
  }

  test("page preview descends to the first styled child block (preview.rs)") {
    val db = new GraftDb
    db.add(Node.page(
      Node.styledSpan("ITALIC", Node.text("foo")),
      Node.text("bar")))
    checkParity(db, "styled-first-child")
  }

  test("chain preview is the whole chain; empty/blank are Empty") {
    val db = new GraftDb
    db.add(Node.chain(
      Node.styledSpan("BOLD", Node.text("foo")),
      Node.text("bar")))
    db.add(Node.page(
      Node.chain(Node.List(Layout.Page, Vector.empty)),
      Node.List(Layout.Chain, Vector.empty)))
    db.add(Node.text("     "))
    checkParity(db, "chain-empty-blank")
  }

  test("cyclic first-child path and cyclic chain subtree preview as Cyclic") {
    val db = new GraftDb
    val pageId = db.add(Node.List(Layout.Page, Vector.empty))
    val cyclic = Node.List(Layout.Chain, Vector(
      Child.Lazy(pageId), Child.Eager(Node.text("foo"))))
    db.push(pageId, Child.Eager(cyclic))
    checkParity(db, "cyclic")
  }

  test("nested styles accumulate along the descent (block around span)") {
    val db = new GraftDb
    db.add(Node.styledBlock("HEADING",
      Node.styledSpan("BOLD",
        Node.styledSpan("ITALIC",
          Node.page(Node.text("deep"), Node.text("rest"))))))
    checkParity(db, "style-accumulation")
  }

  test("diamond (shared subtree) chains preview as Cyclic, not Block") {
    val db = new GraftDb
    val shared = db.add(Node.text("shared"))
    val c1 = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(shared))))
    val c2 = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(shared))))
    db.add(Node.List(Layout.Chain, Vector(Child.Lazy(c1), Child.Lazy(c2))))
    db.add(Node.page(Node.text("plain")))
    checkParity(db, "diamond")
  }

  test("random multi-parent DAGs (seeded): full bulk-vs-serving parity") {
    // same fishing harness as BulkSiblingSpec: random mixes of blank
    // texts, chains, pages, styled wrappers, repeated slots and shared
    // subtrees — first-child descent + style accumulation + blank/
    // cyclic terminal classification over arbitrary shapes.
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 4) {
      val db = new GraftDb
      var pool = Vector.tabulate(6) { i =>
        db.add(Node.text(if (rnd.nextInt(4) == 0) "   " else s"p$trial-$i"))
      }
      for (_ <- 1 to 12) {
        val kids = Vector.fill(1 + rnd.nextInt(3))(pool(rnd.nextInt(pool.length)))
          .map(Child.Lazy(_): Child)
        val node = rnd.nextInt(6) match {
          case 0     => Node.List(Layout.Chain, kids)
          case 1 | 2 => Node.List(Layout.Page, kids)
          case 3     => Node.styledSpan(if (rnd.nextBoolean()) "BOLD" else "ITALIC",
            Node.List(Layout.Chain, kids))
          case 4     => Node.styledBlock("QUOTE", Node.List(Layout.Page, kids))
          case _     => Node.styledBlock("ASIDE", Node.List(Layout.Page, kids))
        }
        pool :+= db.add(node)
      }
      checkParity(db, s"random-$trial")
    }
  }
}
