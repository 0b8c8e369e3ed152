package graft

import graft.core.GraftDb
import graft.model.{Child, Layout, Node}
import org.scalatest.funsuite.AnyFunSuite

/** Ported from assemblage_db/tests/overlap_add.rs: materialized
  * symmetric overlaps, score bounds, ancestor/child exclusion.
  */
class DbOverlapSpec extends AnyFunSuite {

  test("overlap between similar text nodes is symmetric with high score") {
    val db = new GraftDb
    val fooId = db.add(Node.Text("This is a sentence about foo."))
    val barId = db.add(Node.Text("This is a sentence about bar."))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(fooId))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(barId))))

    val ob = db.overlaps(barId)
    assert(ob.length === 1)
    assert(ob.head.id === fooId)
    assert(ob.head.score < 1.0f && ob.head.score > 0.8f)

    val of = db.overlaps(fooId)
    assert(of.length === 1)
    assert(of.head.id === barId)
    assert(of.head.score < 1.0f && of.head.score > 0.8f)
  }

  test("identical children of different pages overlap with score 1.0") {
    val db = new GraftDb
    val t = "Here is some text that is used in multiple nodes"
    val t1 = db.add(Node.Text(t))
    val t2 = db.add(Node.Text(t))
    val p1 = db.add(Node.List(Layout.Page, Vector(Child.Lazy(t1))))
    val p2 = db.add(Node.List(Layout.Page, Vector(Child.Lazy(t2))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(p1), Child.Lazy(p2))))

    val o1 = db.overlaps(t1)
    assert(o1.length === 1 && o1.head.id === t2 && o1.head.score === 1.0f)
    val o2 = db.overlaps(t2)
    assert(o2.length === 1 && o2.head.id === t1 && o2.head.score === 1.0f)
  }

  test("no overlap between parent and child") {
    val db = new GraftDb
    val textId = db.add(Node.Text("some text"))
    val pageId = db.add(Node.List(Layout.Page, Vector(Child.Lazy(textId))))
    val linkId = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(pageId))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(linkId))))
    assert(db.overlaps(textId).isEmpty)
    assert(db.overlaps(linkId).isEmpty)
  }

  test("no overlap between ancestor and child span") {
    val db = new GraftDb
    val textId = db.add(Node.Text("some text"))
    val pageId = db.add(Node.List(Layout.Page, Vector(Child.Lazy(textId))))
    val linkId = db.add(Node.chain(
      Node.Text("Here is the link: "),
      Node.List(Layout.Chain, Vector(Child.Lazy(pageId)))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(linkId))))
    assert(db.overlaps(textId).isEmpty)
    assert(db.overlaps(linkId).isEmpty)
  }

  test("no overlap between ancestor and child block") {
    val db = new GraftDb
    val textId = db.add(Node.Text("some text"))
    val pageId = db.add(Node.List(Layout.Page, Vector(
      Child.Eager(Node.List(Layout.Page, Vector(Child.Lazy(textId)))))))
    val linkId = db.add(Node.chain(
      Node.Text("Here is the link: "),
      Node.List(Layout.Chain, Vector(Child.Lazy(pageId)))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(linkId))))
    assert(db.overlaps(textId).isEmpty)
    assert(db.overlaps(linkId).isEmpty)
  }

  test("overlap between two paragraphs sharing a suffix, stable under re-adding") {
    val db = new GraftDb
    val p1 = db.add(Node.chain(
      Node.Text("This is the first paragraph that ends with the words: "),
      Node.Text("foo, bar, baz, qux")))
    val p2 = db.add(Node.chain(
      Node.Text("This is the second paragraph that ends with the words: "),
      Node.Text("foo, bar, baz, qux")))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(p1))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(p2))))

    assert(db.overlaps(p1).map(_.id) === Vector(p2))
    assert(db.overlaps(p2).map(_.id) === Vector(p1))

    db.add(Node.List(Layout.Page, Vector(
      Child.Eager(Node.Text("Some more text here...")), Child.Lazy(p1))))

    assert(db.overlaps(p1).map(_.id) === Vector(p2))
    assert(db.overlaps(p2).map(_.id) === Vector(p1))
  }

  test("symmetric overlap between nodes with different gram counts") {
    val db = new GraftDb
    val longText = "This contains foo and also much more," +
      "but it should still be found by the overlap search" +
      "no matter whether we search from long text to short text" +
      "or vice versa (overlaps are always symmetric)"
    val shortText = "This contains foo"
    val longId = db.add(Node.Text(longText))
    val shortId = db.add(Node.Text(shortText))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(longId))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(shortId))))

    val lo = db.overlaps(longId)
    assert(lo.length === 1)
    assert(lo.head.sourceSize === 1.0f)
    assert(lo.head.score > 0.8f)
    assert(lo.head.matchSize > 0.0f && lo.head.matchSize < 1.0f)
    assert(lo.head.intersectionSize < lo.head.matchSize)

    val so = db.overlaps(shortId)
    assert(so.length === 1)
    assert(so.head.matchSize === 1.0f)
    assert(so.head.score > 0.8f)
    assert(so.head.sourceSize > 0.0f && so.head.sourceSize < 1.0f)
    assert(so.head.intersectionSize < so.head.sourceSize)
  }
}
