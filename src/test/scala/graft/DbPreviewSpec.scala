package graft

import graft.core.{GraftDb, PreviewedNode}
import graft.model.{Child, Layout, Node, Styles}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.immutable.SortedSet

/** Ported from assemblage_db/tests/preview.rs. */
class DbPreviewSpec extends AnyFunSuite {

  test("page preview is the first (styled) child block") {
    val db = new GraftDb
    val pageId = db.add(Node.page(
      Node.styledSpan("ITALIC", Node.Text("foo")),
      Node.Text("bar")))
    db.preview(pageId) match {
      case PreviewedNode.Block(_, Node.Styled(styles, child)) =>
        assert(styles === Styles.Span(SortedSet("ITALIC")))
        child match {
          case Child.Eager(Node.Text(l)) => assert(l === "foo")
          case other                     => fail(s"unexpected child $other")
        }
      case p => fail(s"expected a block preview, got $p")
    }
  }

  test("chain preview is the whole chain") {
    val db = new GraftDb
    val chainId = db.add(Node.chain(
      Node.styledSpan("BOLD", Node.Text("foo")),
      Node.Text("bar")))
    db.preview(chainId) match {
      case PreviewedNode.Block(_, Node.List(Layout.Chain, children)) =>
        assert(children.length === 2)
        val first = db.get(children(0).idOpt.get).get.asInstanceOf[Node.Styled]
        assert(first.styles === Styles.Span(SortedSet("BOLD")))
        assert(db.get(first.child.idOpt.get).get === Node.Text("foo"))
        assert(db.get(children(1).idOpt.get).get === Node.Text("bar"))
      case p => fail(s"expected a chain block preview, got $p")
    }
  }

  test("empty page previews as Empty") {
    val db = new GraftDb
    val pageId = db.add(Node.page(
      Node.chain(Node.List(Layout.Page, Vector.empty)),
      Node.List(Layout.Chain, Vector.empty)))
    assert(db.preview(pageId) === PreviewedNode.Empty)
  }

  test("blank text previews as Empty") {
    val db = new GraftDb
    val textId = db.add(Node.Text("     "))
    assert(db.preview(textId) === PreviewedNode.Empty)
  }

  test("cyclic first-child path previews as Cyclic") {
    val db = new GraftDb
    val pageId = db.add(Node.List(Layout.Page, Vector.empty))
    val cyclic = Node.List(Layout.Chain, Vector(
      Child.Lazy(pageId), Child.Eager(Node.Text("foo"))))
    db.push(pageId, Child.Eager(cyclic))
    assert(db.preview(pageId) === PreviewedNode.Cyclic)
  }
}
