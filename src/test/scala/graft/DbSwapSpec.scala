package graft

import graft.core.{GraftDb, RestoredNode}
import graft.model.{Child, Gid, Layout, Node}
import org.scalatest.funsuite.AnyFunSuite

/** Ported from assemblage_db/tests/swap.rs: the swap mutation pipeline —
  * orphan trash, shared-child preservation, diamond dependencies,
  * root handling, restore.
  */
class DbSwapSpec extends AnyFunSuite {

  private def str(db: GraftDb, id: Gid): String =
    db.get(id).get.asInstanceOf[Node.Text].line
  private def kids(db: GraftDb, id: Gid): Vector[Gid] =
    db.get(id).get.children.collect { case Child.Lazy(i) => i }

  private def assertNotFound(db: GraftDb, id: Gid): Unit = {
    assert(db.get(id).isEmpty)
    assertThrows[NoSuchElementException](db.parents(id))
  }

  test("swap root persists across merge") {
    val db = new GraftDb
    assert(db.get(Gid.root).get.children.isEmpty)
    val text1Id = db.add(Node.text("foo"))
    db.swap(Gid.root, Node.page(Node.List(Layout.Chain, Vector(Child.Lazy(text1Id)))))
    db.merge()
    val rootKids = kids(db, Gid.root)
    assert(rootKids.length === 1)
    val chainKids = kids(db, rootKids.head)
    assert(chainKids === Vector(text1Id))
    assert(str(db, text1Id) === "foo")
  }

  test("push to chain") {
    val db = new GraftDb
    val chainId = db.add(Node.chain(Node.Text("foo"), Node.Text("bar")))
    assert(kids(db, chainId).length === 2)
    db.push(chainId, Child.Eager(Node.Text("baz")))
    val quxId = db.add(Node.Text("qux"))
    db.push(chainId, Child.Lazy(quxId))
    assert(kids(db, chainId).length === 4)
    assert(db.parents(quxId).size === 1)
    db.merge()
    db.push(chainId, Child.Eager(Node.Text("foobar")))
    assert(kids(db, chainId).length === 5)
    assert(str(db, kids(db, chainId).last) === "foobar")
  }

  test("push lazy and eager children to root") {
    val db = new GraftDb
    val textId = db.add(Node.text("foo"))
    db.push(Gid.root, Child.Lazy(textId))
    assert(db.parents(textId).size === 1)
    db.push(Gid.root, Child.Eager(Node.Text("bar")))
    val rootKids = kids(db, Gid.root)
    assert(rootKids.length === 2)
    assert(db.parents(rootKids(1)).size === 1)
  }

  test("insert into chain keeps order") {
    val db = new GraftDb
    val chainId = db.add(Node.chain(Node.Text("foo"), Node.Text("qux")))
    db.insert(chainId, 1, Child.Eager(Node.Text("bar")))
    db.insert(chainId, 2, Child.Eager(Node.Text("baz")))
    assert(kids(db, chainId).map(str(db, _)) === Vector("foo", "bar", "baz", "qux"))
  }

  test("remove from chain moves orphan to trash; merge purges it") {
    val db = new GraftDb
    val chainId = db.add(Node.chain(Node.Text("foo"), Node.Text("bar")))
    val fooId = kids(db, chainId).head
    assert(db.parents(fooId).size === 1)
    db.remove(chainId, 0)
    assert(kids(db, chainId).length === 1)
    assert(db.getInTrash(fooId).contains(Node.Text("foo")))
    assert(db.get(fooId).isEmpty)
    db.merge()
    assert(db.getInTrash(fooId).isEmpty)
    assertNotFound(db, fooId)
    assert(kids(db, chainId).map(str(db, _)) === Vector("bar"))
  }

  test("replace in chain trashes the replaced child") {
    val db = new GraftDb
    val chainId = db.add(Node.chain(Node.Text("foo"), Node.Text("bar")))
    val fooId = kids(db, chainId).head
    db.replace(chainId, 0, Child.Eager(Node.Text("baz")))
    assert(kids(db, chainId).length === 2)
    assert(db.getInTrash(fooId).contains(Node.Text("foo")))
    assert(db.get(fooId).isEmpty)
    db.merge()
    assertNotFound(db, fooId)
    assert(kids(db, chainId).map(str(db, _)) === Vector("baz", "bar"))
  }

  test("child with another parent survives replace with one edge less") {
    val db = new GraftDb
    val chainId = db.add(Node.chain(Node.Text("foo"), Node.Text("bar")))
    val text1Id = kids(db, chainId).head
    db.add(Node.List(Layout.Chain, Vector(Child.Lazy(text1Id))))
    assert(db.parents(text1Id).size === 2)
    db.replace(chainId, 0, Child.Eager(Node.Text("baz")))
    assert(str(db, text1Id) === "foo")
    assert(db.parents(text1Id).size === 1)
    db.merge()
    assert(db.parents(text1Id).size === 1)
  }

  test("root survives self-reference swap") {
    val db = new GraftDb
    assert(db.parents(Gid.root).isEmpty)
    db.push(Gid.root, Child.Lazy(Gid.root))
    assert(kids(db, Gid.root) === Vector(Gid.root))
    db.replace(Gid.root, 0, Child.Eager(Node.Text("foo")))
    db.merge()
    val rootKids = kids(db, Gid.root)
    assert(rootKids.length === 1)
    assert(rootKids.head !== Gid.root)
  }

  test("orphaned text occurring multiple times as a child is removed") {
    val db = new GraftDb
    val fId = db.add(Node.Text("f"))
    val oId = db.add(Node.Text("o"))
    val fooId = db.add(Node.List(Layout.Chain,
      Vector(Child.Lazy(fId), Child.Lazy(oId), Child.Lazy(oId))))
    val chainId = db.add(Node.List(Layout.Chain,
      Vector(Child.Lazy(fooId), Child.Eager(Node.Text("bar")))))
    db.replace(chainId, 0, Child.Eager(Node.Text("foo")))
    assert(db.getInTrash(fId).contains(Node.Text("f")))
    assert(db.getInTrash(oId).contains(Node.Text("o")))
    assert(db.get(fId).isEmpty && db.get(oId).isEmpty)
    db.merge()
    assertNotFound(db, fId)
    assertNotFound(db, oId)
    assertNotFound(db, fooId)
  }

  test("whole orphaned subtree is trashed recursively") {
    val db = new GraftDb
    val fooId = db.add(Node.Text("foo"))
    val fooChainId = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(fooId))))
    val barId = db.add(Node.Text("bar"))
    val foobarId = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(fooChainId), Child.Lazy(barId))))
    val foobarbazId = db.add(Node.List(Layout.Chain,
      Vector(Child.Lazy(foobarId), Child.Eager(Node.Text("baz")))))
    db.replace(foobarbazId, 0, Child.Eager(Node.Text("foobar")))

    assert(db.getInTrash(foobarId).get.children.length === 2)
    assert(db.getInTrash(fooChainId).get.children.length === 1)
    assert(db.getInTrash(fooId).contains(Node.Text("foo")))
    assert(db.getInTrash(barId).contains(Node.Text("bar")))
    assertNotFound(db, foobarId)
    assertNotFound(db, fooChainId)
    assertNotFound(db, fooId)
    assertNotFound(db, barId)
    db.merge()
    assert(db.getInTrash(foobarId).isEmpty)
    assert(db.getInTrash(fooChainId).isEmpty)
    assert(db.getInTrash(fooId).isEmpty)
    assert(db.getInTrash(barId).isEmpty)
  }

  test("re-inserting a trashed child restores it") {
    val db = new GraftDb
    val emptyChainId = db.add(Node.List(Layout.Chain, Vector.empty))
    val fooId = db.add(Node.Text("foo"))
    val barId = db.add(Node.Text("bar"))
    val chainId = db.add(Node.List(Layout.Chain,
      Vector(Child.Lazy(emptyChainId), Child.Lazy(fooId), Child.Lazy(barId))))
    assert(db.parents(emptyChainId).size === 1)
    assert(db.parents(fooId).size === 1)
    assert(db.parents(barId).size === 1)

    db.remove(chainId, 1)
    db.remove(chainId, 0)
    assert(kids(db, chainId).length === 1)
    assertThrows[NoSuchElementException](db.parents(emptyChainId))
    assertThrows[NoSuchElementException](db.parents(fooId))
    assert(db.parents(barId).size === 1)

    db.insert(chainId, 0, Child.Lazy(fooId))
    assertThrows[NoSuchElementException](db.parents(emptyChainId))
    assert(db.parents(fooId).size === 1)
    assert(db.parents(barId).size === 1)

    db.merge()
    assertNotFound(db, emptyChainId)
    assert(str(db, fooId) === "foo")
    assert(str(db, barId) === "bar")
  }

  test("orphaned parent of a link is removed but linked page survives") {
    val db = new GraftDb
    val page1Id = db.add(Node.page(Node.Text("foo")))
    val linkTextId = db.add(Node.Text("Link to page 1:"))
    val parentOfPage1Id = db.add(Node.List(Layout.Page, Vector(
      Child.Lazy(linkTextId),
      Child.Eager(Node.List(Layout.Chain, Vector(Child.Lazy(page1Id)))))))
    db.swap(parentOfPage1Id, Node.page(
      Node.Text("Link to page 1:"),
      Node.List(Layout.Chain, Vector(Child.Lazy(page1Id))),
      Node.Text("Link to page 2:"),
      Node.chain(Node.page(Node.Text("bar")))))
    assertThrows[NoSuchElementException](db.parents(linkTextId))
    assert(db.parents(page1Id).size === 1)
  }

  test("restore removed subtree re-adds edges") {
    val db = new GraftDb
    val fooId = db.add(Node.Text("foo"))
    val barId = db.add(Node.Text("bar"))
    val subtreeId = db.add(Node.page(
      Node.List(Layout.Chain, Vector(Child.Lazy(fooId))),
      Node.chain(Node.List(Layout.Chain, Vector(Child.Lazy(barId))))))
    val parentPageId = db.add(Node.List(Layout.Page, Vector(Child.Lazy(subtreeId))))

    assert(db.parents(subtreeId).size === 1)
    db.remove(parentPageId, 0)
    assert(db.getInTrash(subtreeId).get.children.length === 2)
    assert(db.get(subtreeId).isEmpty)
    assertThrows[NoSuchElementException](db.parents(subtreeId))
    assertThrows[NoSuchElementException](db.parents(fooId))
    assertThrows[NoSuchElementException](db.parents(barId))

    db.restore(subtreeId) match {
      case RestoredNode.Restored(_) =>
      case other                    => fail(s"expected restore, got $other")
    }
    assert(db.get(subtreeId).get.children.length === 2)
    assert(db.parents(subtreeId).isEmpty)
    assert(db.parents(fooId).size === 1)
    assert(db.parents(barId).size === 1)
    db.merge()
    assert(db.get(subtreeId).get.children.length === 2)
    assert(db.parents(fooId).size === 1)
  }

  test("removing one branch of diamond dependencies keeps the shared child") {
    val db = new GraftDb
    val fooId = db.add(Node.Text("foo"))
    val path1Id = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(fooId))))
    val path2Id = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(fooId))))
    val diamondId = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(path1Id), Child.Lazy(path2Id))))

    assert(db.parents(fooId).size === 2)
    db.remove(diamondId, 1)
    db.merge()
    assert(db.parents(fooId).size === 1)
    assert(db.parents(path1Id).size === 1)
    assertNotFound(db, path2Id)

    db.remove(diamondId, 0)
    db.merge()
    assertNotFound(db, fooId)
    assertNotFound(db, path1Id)
    assertNotFound(db, path2Id)
  }

  test("removing all branches of diamond dependencies removes everything") {
    val db = new GraftDb
    val fooId = db.add(Node.Text("foo"))
    val path1Id = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(fooId))))
    val path2Id = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(fooId))))
    val diamondId = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(path1Id), Child.Lazy(path2Id))))
    val pageOfDiamondId = db.add(Node.List(Layout.Page, Vector(Child.Lazy(diamondId))))
    db.remove(pageOfDiamondId, 0)
    db.merge()
    assertNotFound(db, fooId)
    assertNotFound(db, path1Id)
    assertNotFound(db, path2Id)
  }

  test("moving a descendant within the swapped subtree keeps it alive") {
    val db = new GraftDb
    val descendantId = db.add(Node.text("descendant in subtree"))
    val child1Id = db.add(Node.List(Layout.Page, Vector(Child.Lazy(descendantId))))
    val child2Id = db.add(Node.page(Node.Text("...")))
    val docId = db.add(Node.List(Layout.Page, Vector(Child.Lazy(child1Id), Child.Lazy(child2Id))))
    db.swap(docId, Node.List(Layout.Page, Vector(
      Child.Eager(Node.text("descendant should be moved in the subtree")),
      Child.Lazy(descendantId))))
    assert(db.get(descendantId).isDefined)
  }
}
