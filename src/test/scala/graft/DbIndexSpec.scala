package graft

import graft.core.GraftDb
import graft.model.{Child, Layout, Node}
import org.scalatest.funsuite.AnyFunSuite

/** Ported from assemblage_db/tests/index_add.rs: the indexing policy
  * (only block children of pages are searchable), chain concatenation,
  * and index persistence.
  */
class DbIndexSpec extends AnyFunSuite {

  test("text is searchable only once reachable as a block of a page") {
    val db = new GraftDb
    val fooId = db.add(Node.Text("foo"))
    val barId = db.add(Node.Text("bar"))
    assert(db.search("foo").isEmpty)

    db.add(Node.List(Layout.Chain, Vector(Child.Lazy(fooId))))
    db.add(Node.List(Layout.Chain, Vector(Child.Lazy(barId))))
    assert(db.search("foo").isEmpty)

    db.add(Node.List(Layout.Page, Vector(Child.Lazy(fooId))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(barId))))
    val matches = db.search("foo")
    assert(matches.length === 1)
    assert(matches.head.id === fooId)
  }

  test("fuzzy search ranks exact over partial matches") {
    val db = new GraftDb
    val fooId = db.add(Node.Text("This is the text foo"))
    val barId = db.add(Node.Text("This is the text bar"))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(fooId))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(barId))))

    val m1 = db.search("foo")
    assert(m1.length === 1 && m1.head.id === fooId)

    val m2 = db.search("text foo").filter(_.score > 0.7f)
    assert(m2.length === 1 && m2.head.id === fooId)

    val m3 = db.search("This is the text foo")
    assert(m3.length === 2)
    assert(m3(0).id === fooId && m3(0).score === 1.0f)
    assert(m3(1).id === barId && m3(1).score < 1.0f)

    val foo2Id = db.add(Node.Text("Another text that is the text foo"))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(foo2Id))))
    assert(db.search("text foo").count(_.score > 0.7f) === 2)
    assert(db.search("This is the text foo").length === 3)
  }

  test("chains index as concatenated contiguous text") {
    val db = new GraftDb
    val prefixId = db.add(Node.Text("This is t"))
    val fooSufId = db.add(Node.Text("he text foo"))
    val barSufId = db.add(Node.Text("he text bar"))
    val fooId = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(prefixId), Child.Lazy(fooSufId))))
    val barId = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(prefixId), Child.Lazy(barSufId))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(fooId))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(barId))))

    val m1 = db.search("text foo").filter(_.score > 0.7f)
    assert(m1.length === 1 && m1.head.id === fooId && m1.head.score === 1.0f)

    val m2 = db.search("is the text").filter(_.score > 0.7f)
    assert(m2.length === 2)
    assert(m2.forall(_.score === 1.0f))
    assert(m2.map(_.id).toSet === Set(fooId, barId))

    val m3 = db.search("This is the text foo").filter(_.score > 0.7f)
    assert(m3.length === 2)
    assert(m3(0).id === fooId && m3(0).score === 1.0f)
    assert(m3(1).id === barId && m3(1).score < 1.0f)
  }

  test("both direct and linked children are indexed") {
    val db = new GraftDb
    val foo1Id = db.add(Node.Text("foo"))
    val foo2Id = db.add(Node.Text("foo"))
    val pageFoo1Id = db.add(Node.List(Layout.Page, Vector(Child.Lazy(foo1Id))))
    val linkFoo1Id = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(pageFoo1Id))))

    val m1 = db.search("foo")
    assert(m1.length === 1 && m1.head.id === foo1Id)

    db.add(Node.List(Layout.Page, Vector(Child.Lazy(linkFoo1Id), Child.Lazy(foo2Id))))
    val m2 = db.search("foo")
    assert(m2.length === 2)
    assert(m2.map(_.id).toSet === Set(foo1Id, foo2Id))
  }

  test("long word built out of chain children matches as one word") {
    val db = new GraftDb
    val chainId = db.add(Node.chain(Node.Text("foo"), Node.Text("bar"), Node.Text("baz")))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(chainId))))
    val m = db.search("foobarbaz")
    assert(m.length === 1 && m.head.id === chainId && m.head.score === 1.0f)
  }

  test("empty chains vanish in concatenation") {
    val db = new GraftDb
    db.add(Node.page(
      Node.List(Layout.Chain, Vector.empty),
      Node.List(Layout.Chain, Vector.empty)))
    assert(db.search("foobarbaz").isEmpty)

    db.add(Node.page(
      Node.page(Node.List(Layout.Chain, Vector.empty)),
      Node.List(Layout.Chain, Vector.empty),
      Node.chain(Node.Text("foo"), Node.List(Layout.Chain, Vector.empty), Node.Text("bar")),
      Node.chain(Node.Text("baz"))))

    assert(db.search("foobar").count(_.score === 1.0f) === 1)
    assert(db.search("baz").count(_.score === 1.0f) === 1)
    assert(db.search("foobarbaz").count(_.score === 1.0f) === 0)
    assert(db.search("foo").count(_.score === 1.0f) === 0)
  }

  test("index survives merge") {
    val db = new GraftDb
    val fooId = db.add(Node.Text("foo"))
    val barId = db.add(Node.Text("bar"))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(fooId))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(barId))))
    db.merge()
    val m = db.search("foo")
    assert(m.length === 1 && m.head.id === fooId)
  }
}
