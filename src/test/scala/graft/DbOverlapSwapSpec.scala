package graft

import graft.core.GraftDb
import graft.model.{Child, Gid, Layout, Node}
import org.scalatest.funsuite.AnyFunSuite

/** Ported from assemblage_db/tests/overlap_swap.rs: materialized
  * overlap maintenance under swap/push/remove/replace/restore.
  */
class DbOverlapSwapSpec extends AnyFunSuite {

  private def firstChild(db: GraftDb, id: Gid): Gid =
    db.get(id).get.children.head.idOpt.get

  test("overlap appears and disappears with swaps") {
    val db = new GraftDb
    val fooId = db.add(Node.Text("This is a sentence containing foo"))
    val barId = db.add(Node.Text("This is a sentence containing bar"))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(fooId))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(barId))))

    assert(db.overlaps(fooId).length === 1)
    assert(db.overlaps(barId).length === 1)

    db.swap(fooId, Node.Text("something completely different"))
    assert(db.overlaps(fooId).isEmpty)
    assert(db.overlaps(barId).isEmpty)

    db.swap(fooId, Node.Text("sentence containing foo"))
    assert(db.overlaps(fooId).length === 1)
    assert(db.overlaps(barId).length === 1)
  }

  test("overlap maintenance propagates from nested child swaps") {
    val db = new GraftDb
    val textFooId = db.add(Node.Text("This is a sentence containing foo"))
    val textBarId = db.add(Node.Text("This is a sentence containing bar"))
    val fooId = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(textFooId))))
    val barId = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(textBarId))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(fooId))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(barId))))

    assert(db.overlaps(fooId).length === 1)
    assert(db.overlaps(barId).length === 1)

    db.swap(fooId, Node.Text("something completely different"))
    assert(db.overlaps(fooId).isEmpty)
    assert(db.overlaps(barId).isEmpty)

    db.swap(fooId, Node.Text("sentence containing foo"))
    assert(db.overlaps(fooId).length === 1)
    assert(db.overlaps(barId).length === 1)
  }

  test("overlap appears after push completes the text") {
    val db = new GraftDb
    val fooId = db.add(Node.chain(Node.Text("Thi")))
    val barId = db.add(Node.Text("This is a sentence about bar"))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(fooId))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(barId))))

    assert(db.overlaps(fooId).isEmpty)
    assert(db.overlaps(barId).isEmpty)

    db.push(fooId, Child.Eager(Node.Text("s a sentence about foo")))
    assert(db.overlaps(fooId).length === 1)
    assert(db.overlaps(barId).length === 1)
  }

  test("overlap appears after removing middle chain pieces") {
    val db = new GraftDb
    val fooId = db.add(Node.chain(
      Node.Text("foo"), Node.Text("bar"), Node.Text("baz"), Node.Text("qux")))
    val barId = db.add(Node.Text("just fooqux"))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(fooId))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(barId))))

    assert(db.overlaps(fooId).isEmpty)
    assert(db.overlaps(barId).isEmpty)

    db.remove(fooId, 2)
    db.remove(fooId, 1)
    assert(db.overlaps(fooId).length === 1)
    assert(db.overlaps(barId).length === 1)
  }

  test("overlap after replacing empty texts with shared text") {
    val db = new GraftDb
    val sharedText = "This is a sentence about something"
    val fooId = db.add(Node.Text(""))
    val barId = db.add(Node.Text(""))
    val pageFooId = db.add(Node.List(Layout.Page, Vector(Child.Lazy(fooId))))
    val pageBarId = db.add(Node.List(Layout.Page, Vector(Child.Lazy(barId))))

    assert(db.overlaps(fooId).isEmpty)
    assert(db.overlaps(barId).isEmpty)

    db.replace(pageFooId, 0, Child.Eager(Node.Text(sharedText)))
    db.replace(pageBarId, 0, Child.Eager(Node.Text(sharedText)))

    val newFoo = firstChild(db, pageFooId)
    val newBar = firstChild(db, pageBarId)
    assert(db.overlaps(newFoo).length === 1)
    assert(db.overlaps(newBar).length === 1)
  }

  test("overlap after incrementally replacing text") {
    val db = new GraftDb
    val fooId = db.add(Node.Text(""))
    val barId = db.add(Node.Text(""))
    val pageFooId = db.add(Node.List(Layout.Page, Vector(Child.Lazy(fooId))))
    val pageBarId = db.add(Node.List(Layout.Page, Vector(Child.Lazy(barId))))

    for (t <- Seq("This", "This is", "This is another", "This is another sentence",
      "This is another sentence about", "This is another sentence about foo"))
      db.replace(pageFooId, 0, Child.Eager(Node.Text(t)))
    for (t <- Seq("Just", "Just another", "Just another sentence",
      "Just another sentence about", "Just another sentence about bar"))
      db.replace(pageBarId, 0, Child.Eager(Node.Text(t)))

    assert(db.overlaps(firstChild(db, pageFooId)).length === 1)
    assert(db.overlaps(firstChild(db, pageBarId)).length === 1)
  }

  test("no ancestor/child overlap after replace (smoke)") {
    val db = new GraftDb
    val ancestorPageId = db.add(Node.page(Node.page(Node.Text(""))))
    val text1Id = db.add(Node.Text("some text"))
    val pageId = db.add(Node.List(Layout.Page, Vector(Child.Lazy(text1Id))))
    db.insert(ancestorPageId, 0, Child.Lazy(pageId))
    assert(db.overlaps(text1Id).isEmpty)

    val text2Id = db.add(Node.Text("some text"))
    db.remove(pageId, 0)
    db.insert(pageId, 0, Child.Lazy(text2Id))
  }

  test("overlaps drop on trash and return on restore") {
    val db = new GraftDb
    val text1Id = db.add(Node.Text("this should be found as an overlap"))
    val text2Id = db.add(Node.Text("this should be found as an overlap..."))
    val page1Id = db.add(Node.List(Layout.Page, Vector(Child.Lazy(text1Id))))
    db.push(Gid.root, Child.Lazy(page1Id))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(text2Id))))

    assert(db.overlaps(text1Id).map(_.id) === Vector(text2Id))
    assert(db.overlaps(text2Id).map(_.id) === Vector(text1Id))

    db.remove(Gid.root, 0)
    assert(db.get(text1Id).isEmpty)
    assert(db.overlaps(text2Id).isEmpty)
    assertThrows[NoSuchElementException](db.overlaps(text1Id))

    db.restore(page1Id)
    assert(db.get(text1Id).isDefined)
    assert(db.overlaps(text1Id).map(_.id) === Vector(text2Id))
    assert(db.overlaps(text2Id).map(_.id) === Vector(text1Id))
  }
}
