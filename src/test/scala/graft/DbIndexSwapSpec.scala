package graft

import graft.core.GraftDb
import graft.model.{Child, Layout, Node}
import org.scalatest.funsuite.AnyFunSuite

/** Ported from assemblage_db/tests/index_swap.rs: incremental index
  * maintenance under the whole mutation surface.
  */
class DbIndexSwapSpec extends AnyFunSuite {

  test("index after pushing node to chain") {
    val db = new GraftDb
    val fooId = db.add(Node.Text("foo"))
    val fooChainId = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(fooId))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(fooChainId))))

    val m1 = db.search("foo")
    assert(m1.length === 1 && m1.head.id === fooChainId)

    db.push(fooChainId, Child.Eager(Node.Text("bar")))
    val m2 = db.search("foobar")
    assert(m2.length === 1 && m2.head.id === fooChainId && m2.head.score === 1.0f)
    assert(db.search("foo").count(_.score > 0.7f) === 0)
  }

  test("index survives cyclic structure") {
    val db = new GraftDb
    val fooId = db.add(Node.Text("foo"))
    val chainId = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(fooId))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(chainId))))

    val m1 = db.search("foo")
    assert(m1.length === 1 && m1.head.id === chainId)

    db.push(chainId, Child.Lazy(chainId))
    val m2 = db.search("foo")
    assert(m2.length === 1 && m2.head.id === chainId)
  }

  test("index after inserting nodes") {
    val db = new GraftDb
    val chainId = db.add(Node.chain(Node.Text("foo"), Node.Text("qux")))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(chainId))))
    assert(db.search("fooqux").length === 1)

    db.insert(chainId, 1, Child.Eager(Node.Text("barbaz")))
    assert(db.search("fooqux").isEmpty)
    assert(db.search("foobarbazqux").length === 1)
  }

  test("index after swaps of text fragments") {
    val db = new GraftDb
    val prefixId = db.add(Node.Text("This is a sentence containing f"))
    val suffixId = db.add(Node.Text("ooo"))
    val chainId = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(prefixId), Child.Lazy(suffixId))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(chainId))))

    val m1 = db.search("fooo")
    assert(m1.length === 1 && m1.head.score === 1.0f)

    db.swap(prefixId, Node.Text("just b"))
    db.swap(suffixId, Node.Text("arr"))

    assert(db.search("fooo").isEmpty)
    val m2 = db.search("barr")
    assert(m2.length === 1 && m2.head.score === 1.0f)
  }

  test("index after replacing a link: link texts are never indexed") {
    val db = new GraftDb
    val fooId = db.add(Node.Text("foo"))
    val barId = db.add(Node.Text("bar"))
    val linkToBarId = db.add(Node.List(Layout.Page, Vector(Child.Lazy(barId))))
    db.add(Node.page(
      Node.List(Layout.Chain, Vector(Child.Lazy(fooId), Child.Lazy(linkToBarId)))))
    db.add(Node.List(Layout.Chain, Vector(Child.Lazy(barId)))) // avoid orphan deletion

    assert(db.search("bar").length === 1)
    assert(db.search("qux").isEmpty)
    assert(db.search("foobar").isEmpty)
    assert(db.search("fooqux").isEmpty)

    db.replace(linkToBarId, 0, Child.Eager(Node.Text("qux")))

    assert(db.search("bar").isEmpty)
    assert(db.search("qux").length === 1)
    assert(db.search("foobar").isEmpty)
    assert(db.search("fooqux").isEmpty)
  }

  test("index after removing nodes") {
    val db = new GraftDb
    val chainId = db.add(Node.chain(
      Node.Text("foo"), Node.Text("bar"), Node.Text("baz"), Node.Text("qux")))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(chainId))))

    assert(db.search("foobarbazqux").length === 1)
    assert(db.search("fooqux").isEmpty)

    db.remove(chainId, 2)
    db.remove(chainId, 1)

    assert(db.search("foobarbazqux").isEmpty)
    assert(db.search("fooqux").length === 1)
  }
}
