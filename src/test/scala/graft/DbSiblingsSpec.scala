package graft

import graft.core.GraftDb
import graft.model.{Child, Layout, Node}
import org.scalatest.funsuite.AnyFunSuite

/** Ported from assemblage_db/tests/siblings.rs: the before/after
  * sibling graph walk across nesting, links, blanks, and asides.
  */
class DbSiblingsSpec extends AnyFunSuite {

  test("siblings of text nodes across nested pages") {
    val db = new GraftDb
    val firstId = db.add(Node.Text("first"))
    val fooId = db.add(Node.Text("foo"))
    val barId = db.add(Node.Text("bar"))
    val bazId = db.add(Node.Text("baz"))
    val lastId = db.add(Node.Text("last"))
    db.add(Node.page(
      Node.List(Layout.Page, Vector(Child.Lazy(firstId), Child.Lazy(fooId))),
      Node.List(Layout.Page, Vector(Child.Lazy(barId))),
      Node.List(Layout.Page, Vector(Child.Lazy(bazId), Child.Lazy(lastId)))))

    assert(db.before(firstId).isEmpty)
    assert(db.before(barId) === Set(fooId))
    assert(db.after(barId) === Set(bazId))
    assert(db.after(lastId).isEmpty)
  }

  test("sibling search never crosses linked-page boundaries") {
    val db = new GraftDb
    val firstId = db.add(Node.Text("first"))
    val fooId = db.add(Node.Text("foo"))
    val barId = db.add(Node.Text("bar"))
    val bazId = db.add(Node.Text("baz"))
    val lastId = db.add(Node.Text("last"))
    val foobarbazId = db.add(Node.page(
      Node.List(Layout.Page, Vector(Child.Lazy(firstId), Child.Lazy(fooId))),
      Node.List(Layout.Page, Vector(Child.Lazy(barId))),
      Node.List(Layout.Page, Vector(Child.Lazy(bazId), Child.Lazy(lastId)))))
    db.add(Node.page(
      Node.List(Layout.Chain, Vector(Child.Lazy(foobarbazId))),
      Node.List(Layout.Chain, Vector(Child.Lazy(foobarbazId)))))

    assert(db.before(firstId).isEmpty)
    assert(db.before(barId) === Set(fooId))
    assert(db.after(barId) === Set(bazId))
    assert(db.after(lastId).isEmpty)
  }

  test("a linked page is itself a sibling") {
    val db = new GraftDb
    val foobarId = db.add(Node.page(Node.Text("foo"), Node.Text("bar")))
    val textId = db.add(Node.Text("text after foobar"))
    db.add(Node.List(Layout.Page, Vector(
      Child.Eager(Node.List(Layout.Chain, Vector(Child.Lazy(foobarId)))),
      Child.Lazy(textId))))

    assert(db.before(textId) === Set(foobarId))
  }

  test("blank siblings are skipped in both directions") {
    val db = new GraftDb
    val firstId = db.add(Node.Text("first"))
    val fooId = db.add(Node.Text(""))
    val barId = db.add(Node.Text("bar"))
    val bazId = db.add(Node.Text("   "))
    val quxId = db.add(Node.Text("   "))
    val lastId = db.add(Node.Text("last"))
    db.add(Node.page(
      Node.List(Layout.Page, Vector(Child.Lazy(firstId))),
      Node.List(Layout.Page, Vector(Child.Lazy(fooId))),
      Node.List(Layout.Page, Vector(Child.Lazy(barId))),
      Node.List(Layout.Page, Vector(Child.Lazy(bazId), Child.Lazy(quxId), Child.Lazy(lastId)))))

    assert(db.before(firstId).isEmpty)
    assert(db.after(firstId) === Set(barId))
    assert(db.before(fooId).isEmpty)
    assert(db.after(fooId).isEmpty)
    assert(db.before(barId) === Set(firstId))
    assert(db.after(barId) === Set(lastId))
    assert(db.before(bazId).isEmpty)
    assert(db.after(bazId).isEmpty)
    assert(db.before(quxId).isEmpty)
    assert(db.after(quxId).isEmpty)
    assert(db.before(lastId) === Set(barId))
    assert(db.after(lastId).isEmpty)
  }

  test("aside-styled siblings are skipped") {
    val db = new GraftDb
    val firstId = db.add(Node.Text("first"))
    val fooId = db.add(Node.Text("foo"))
    val barId = db.add(Node.Text("bar"))
    val bazId = db.add(Node.Text("baz"))
    val lastId = db.add(Node.Text("last"))
    val asideId = db.add(Node.styledBlock("ASIDE", Node.Text("aside")))
    db.add(Node.page(
      Node.List(Layout.Page, Vector(
        Child.Lazy(asideId), Child.Lazy(firstId), Child.Lazy(fooId),
        Child.Lazy(asideId), Child.Lazy(asideId))),
      Node.List(Layout.Page, Vector(Child.Lazy(barId))),
      Node.List(Layout.Page, Vector(
        Child.Lazy(asideId), Child.Lazy(asideId), Child.Lazy(bazId),
        Child.Lazy(lastId), Child.Lazy(asideId)))))

    assert(db.before(firstId).isEmpty)
    assert(db.before(barId) === Set(fooId))
    assert(db.after(barId) === Set(bazId))
    assert(db.after(lastId).isEmpty)
  }
}
