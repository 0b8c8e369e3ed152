package graft

import graft.core.{GraftDb, Parent}
import graft.model.{Child, Gid, Layout, Node, Styles}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.immutable.SortedSet

/** Ported from assemblage_db/tests/basics.rs. */
class DbBasicsSpec extends AnyFunSuite {

  private def str(db: GraftDb, id: Gid): String =
    db.get(id).get.asInstanceOf[Node.Text].line
  private def childIds(n: Node): Vector[Gid] =
    n.children.collect { case Child.Lazy(id) => id }

  test("add and get text nodes") {
    val db = new GraftDb
    val id1 = db.add(Node.text("foo"))
    assert(str(db, id1) === "foo")
    val id2 = db.add(Node.text("foobar"))
    assert(str(db, id2) === "foobar")
  }

  test("add and get text with newlines auto-splits into a page") {
    val db = new GraftDb
    val id = db.add(Node.text("Text\nwith\n\nnewlines!\n"))
    val node = db.get(id).get.asInstanceOf[Node.List]
    assert(node.layout === Layout.Page)
    val kids = childIds(node)
    assert(kids.length === 5)
    assert(kids.map(str(db, _)) === Vector("Text", "with", "", "newlines!", ""))
  }

  test("add and get chains with styled children") {
    val db = new GraftDb
    val chain = Node.chain(Node.Text("Some text1"), Node.Text(" "), Node.Text("Some text2"))
    val chainId = db.add(chain)
    val styledChain = Node.chain(
      Node.styledSpan("ITALIC", Node.Text("Some text1")),
      Node.Text(" "),
      Node.styledSpan("BOLD", Node.Text("Some text2")))
    val styledChainId = db.add(styledChain)

    val c = db.get(chainId).get.asInstanceOf[Node.List]
    assert(c.layout === Layout.Chain)
    assert(childIds(c).map(str(db, _)) === Vector("Some text1", " ", "Some text2"))

    val sc = db.get(styledChainId).get.asInstanceOf[Node.List]
    assert(sc.layout === Layout.Chain)
    val kids = childIds(sc)
    assert(db.get(kids(0)).get.asInstanceOf[Node.Styled].styles === Styles.Span(SortedSet("ITALIC")))
    assert(str(db, kids(1)) === " ")
    assert(db.get(kids(2)).get.asInstanceOf[Node.Styled].styles === Styles.Span(SortedSet("BOLD")))
  }

  test("add and get parent chains: full reverse-edge bookkeeping") {
    val db = new GraftDb
    val parent1Id = db.add(Node.chain(Node.Text("foo")))
    val text1Id = childIds(db.get(parent1Id).get).head
    assert(db.parents(text1Id) === Set(Parent(parent1Id, 0)))

    val parent2Id = db.add(
      Node.List(Layout.Chain, Vector(Child.Lazy(parent1Id), Child.Lazy(text1Id))))
    assert(db.parents(text1Id) === Set(Parent(parent1Id, 0), Parent(parent2Id, 1)))
    assert(db.parents(parent1Id) === Set(Parent(parent2Id, 0)))
    assert(db.parents(parent2Id) === Set.empty)
  }

  test("parent containing the same child multiple times keeps both edges") {
    val db = new GraftDb
    val sharedId = db.add(Node.Text("foo"))
    val chainId = db.add(Node.List(Layout.Chain, Vector(
      Child.Lazy(sharedId), Child.Eager(Node.Text("bar")), Child.Lazy(sharedId))))
    val kids = childIds(db.get(chainId).get)
    assert(kids.length === 3)
    assert(db.parents(kids(1)) === Set(Parent(chainId, 1)))
    assert(db.parents(sharedId) === Set(Parent(chainId, 0), Parent(chainId, 2)))
  }

  test("nodes persist across merge (compaction keeps latest live versions)") {
    val db = new GraftDb
    val chainId = db.add(Node.chain(Node.Text("foo"), Node.Text("bar")))
    val kids = childIds(db.get(chainId).get)
    db.merge()
    assert(str(db, kids(0)) === "foo")
    assert(str(db, kids(1)) === "bar")
    assert(db.versions(kids(0)).length === 1)
  }

  test("root node exists as an empty page") {
    val db = new GraftDb
    assert(db.get(Gid.root).get === Node.List(Layout.Page, Vector.empty))
  }
}
