package graft

import graft.core.{GraftDb, Parent}
import graft.model.{Child, Layout, Node}
import graft.view.{VBlock, VSpan, View}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.immutable.SortedSet

/** Ported from assemblage_view/tests/tile.rs:160-427: blank-skipping
  * branch injection, link branches, chain promotion, parent branches.
  */
class TileBranchSpec extends AnyFunSuite {

  test("blank siblings are skipped when computing before-branches") {
    val db = new GraftDb
    val view = new View(db)
    val aId = db.add(Node.Text("A"))
    val bId = db.add(Node.Text("B"))
    val cId = db.add(Node.Text("C"))
    val page1Id = db.add(Node.List(Layout.Page,
      Vector(Child.Lazy(aId), Child.Lazy(bId), Child.Lazy(cId))))
    val blank1Id = db.add(Node.List(Layout.Chain, Vector.empty))
    val blank2Id = db.add(Node.Text("   "))
    val xId = db.add(Node.Text("X"))
    val page2Id = db.add(Node.List(Layout.Page, Vector(
      Child.Lazy(xId), Child.Lazy(blank1Id), Child.Lazy(blank2Id),
      Child.Lazy(aId), Child.Lazy(bId))))

    val t = view.tile(page1Id)
    assert(t.sections.length === 3)
    for (i <- 0 until 2) {
      val blk = t.sections(i).subsections.head
      assert(blk.after.isEmpty)
      if (i == 0) {
        assert(blk.before.length === 1)
        assert(blk.before.head.link.descendant.id === page2Id)
        assert(db.parents(blk.id) === Set(Parent(page1Id, 0), Parent(page2Id, 3)))
      } else assert(blk.before.isEmpty)
    }
  }

  test("links appear as branches only from inline (chain) wrappers") {
    for (layout <- Seq(Layout.Chain, Layout.Page)) {
      val db = new GraftDb
      val view = new View(db)
      val aId = db.add(Node.Text("A"))
      val bId = db.add(Node.Text("B"))
      val cId = db.add(Node.Text("C"))
      val xId = db.add(Node.Text("X"))
      val xAsBlockId = db.add(Node.List(Layout.Page, Vector(Child.Lazy(xId))))
      val xWrappedId = db.add(Node.List(layout, Vector(Child.Lazy(xAsBlockId))))
      val page1Id = db.add(Node.List(Layout.Page, Vector(
        Child.Lazy(aId), Child.Lazy(bId), Child.Lazy(cId), Child.Lazy(xWrappedId))))
      db.add(Node.List(Layout.Page, Vector(Child.Lazy(xId), Child.Lazy(bId), Child.Lazy(cId))))

      val t = view.tile(page1Id)
      assert(t.sections.length === 4)
      for (i <- 0 until 3) {
        val blk = t.sections(i).subsections.head
        assert(blk.after.isEmpty)
        if (i == 1 && layout == Layout.Chain) {
          assert(blk.before.length === 1, s"layout $layout section $i")
          assert(blk.before.head.link.descendant.id === xId)
        } else assert(blk.before.isEmpty, s"layout $layout section $i")
      }
    }
  }

  test("chain siblings are promoted to the whole chain, stopping at blocks") {
    val db = new GraftDb
    val view = new View(db)
    val fooId = db.add(Node.styledSpan("BOLD", Node.Text("foo")))
    val barId = db.add(Node.Text("bar"))
    val chainId = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(fooId), Child.Lazy(barId))))
    val sharedTextId = db.add(Node.Text("shared"))
    val page1Id = db.add(Node.List(Layout.Page, Vector(Child.Lazy(sharedTextId))))
    val page2Id = db.add(Node.List(Layout.Page, Vector(Child.Lazy(chainId), Child.Lazy(sharedTextId))))
    val unrelatedTextId = db.add(Node.Text("unrelated"))
    val pageContainingPage2Id = db.add(Node.List(Layout.Page,
      Vector(Child.Lazy(unrelatedTextId), Child.Lazy(page2Id))))

    val t = view.tile(page1Id)
    assert(t.sections.length === 1)
    assert(t.sections.head.subsections.length === 1)
    val before = t.sections.head.subsections.head.before
    assert(before.length === 1)
    assert(before.head.link.descendant.id !== pageContainingPage2Id)
    assert(before.head.link.descendant.id === page2Id)
    assert(before.head.link.descendant.block === VBlock.text(Vector(
      VSpan.Text(SortedSet("BOLD"), "foo"), VSpan.text("bar"))))
  }

  test("parent link becomes a tile branch with the parent as ancestor") {
    val db = new GraftDb
    val view = new View(db)
    val pageId = db.add(Node.page(Node.Text("some text")))
    val parentOfPageId = db.add(Node.List(Layout.Page, Vector(
      Child.Eager(Node.Text("Parent page")),
      Child.Eager(Node.List(Layout.Chain, Vector(Child.Lazy(pageId)))))))

    val t = view.tile(pageId)
    assert(t.branches.length === 1)
    assert(t.branches.head.link.ancestor.get.id === parentOfPageId)
  }

  test("parent branches stop at the first link boundary") {
    val db = new GraftDb
    val view = new View(db)
    val pageId = db.add(Node.page(Node.Text("some text")))
    val parentOfPageId = db.add(Node.List(Layout.Page, Vector(
      Child.Eager(Node.Text("Parent page")),
      Child.Eager(Node.List(Layout.Chain, Vector(Child.Lazy(pageId)))))))
    db.add(Node.List(Layout.Page, Vector(
      Child.Eager(Node.Text("Parent of parent page")),
      Child.Eager(Node.List(Layout.Chain, Vector(Child.Lazy(parentOfPageId)))))))

    val t = view.tile(pageId)
    assert(t.branches.length === 1)
    assert(t.branches.head.link.ancestor.get.id === parentOfPageId)
  }

  test("sibling branch of a multi-parent block has no ancestor in its lineage") {
    val db = new GraftDb
    val view = new View(db)
    val pageId = db.add(Node.page(Node.Text("some text")))
    val parent1OfPageId = db.add(Node.List(Layout.Page, Vector(Child.Lazy(pageId))))
    val parent2OfPageId = db.add(Node.List(Layout.Page, Vector(
      Child.Eager(Node.Text("Parent page")),
      Child.Eager(Node.List(Layout.Page, Vector(Child.Lazy(pageId)))))))
    db.add(Node.List(Layout.Page, Vector(
      Child.Eager(Node.Text("Parent of parent page")),
      Child.Eager(Node.List(Layout.Chain, Vector(Child.Lazy(parent2OfPageId)))))))

    val t = view.tile(parent1OfPageId)
    assert(t.sections.length === 1)
    assert(t.sections.head.subsections.length === 1)
    val before = t.sections.head.subsections.head.before
    assert(before.length === 1)
    assert(before.head.link.ancestor === None)
    assert(before.head.link.descendant.id === parent2OfPageId)
  }
}
