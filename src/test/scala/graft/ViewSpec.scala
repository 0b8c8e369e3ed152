package graft

import graft.core.GraftDb
import graft.model.{Child, Layout, Node}
import graft.view.{Section, Subsection, VBlock, VSpan, View}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.immutable.SortedSet

/** Ported from assemblage_view/tests/sections.rs and tile.rs. */
class ViewSpec extends AnyFunSuite {

  private def text(t: String) = VSpan.text(t)
  private def block(spans: VSpan*) = VBlock.text(spans.toVector)
  private def sub(id: graft.model.Gid, b: VBlock) = Subsection(id, b, Vector.empty, Vector.empty)

  test("sections of a single text node") {
    val db = new GraftDb
    val view = new View(db)
    val nodeId = db.add(Node.text("a single line of text"))
    assert(view.sections(nodeId, splitSpans = true) === Vector(
      Section(None, hasMultipleParents = false,
        Vector(sub(nodeId, block(text("a single line of text")))))))
  }

  test("sections of chain and page lists of text") {
    for (layout <- Seq(Layout.Chain, Layout.Page)) {
      val db = new GraftDb
      val view = new View(db)
      val line1Id = db.add(Node.Text("this line"))
      val line2Id = db.add(Node.Text("continues here"))
      val nodeId = db.add(Node.List(layout, Vector(Child.Lazy(line1Id), Child.Lazy(line2Id))))
      assert(view.sections(nodeId, splitSpans = true) === Vector(
        Section(None, hasMultipleParents = false, Vector(sub(line1Id, block(text("this line"))))),
        Section(None, hasMultipleParents = false, Vector(sub(line2Id, block(text("continues here")))))))
    }
  }

  test("sections of a list of chains of text merge spans into one block") {
    for (layout <- Seq(Layout.Chain, Layout.Page)) {
      val db = new GraftDb
      val view = new View(db)
      val chainId = db.add(Node.chain(Node.Text("this line"), Node.Text("continues here")))
      val nodeId = db.add(Node.List(layout, Vector(Child.Lazy(chainId))))
      assert(view.sections(nodeId, splitSpans = true) === Vector(
        Section(None, hasMultipleParents = false,
          Vector(sub(chainId, block(text("this line"), text("continues here")))))))
    }
  }

  test("sections of span-styled pages distribute the style to spans") {
    val db = new GraftDb
    val view = new View(db)
    val line1Id = db.add(Node.Text("this line"))
    val line2Id = db.add(Node.Text("continues here"))
    val pageId = db.add(Node.List(Layout.Page, Vector(Child.Lazy(line1Id), Child.Lazy(line2Id))))
    val nodeId = db.add(Node.Styled(graft.model.Styles.Span(SortedSet("ITALIC")), Child.Lazy(pageId)))

    assert(view.sections(nodeId, splitSpans = true) === Vector(
      Section(None, hasMultipleParents = false,
        Vector(sub(line1Id, block(VSpan.Text(SortedSet("ITALIC"), "this line"))))),
      Section(None, hasMultipleParents = false,
        Vector(sub(line2Id, block(VSpan.Text(SortedSet("ITALIC"), "continues here")))))))
  }

  test("children with multiple parents become their own shared sections") {
    val db = new GraftDb
    val view = new View(db)
    val block1Id = db.add(Node.Text("This is paragraph 1."))
    val block2Id = db.add(Node.Text("This is paragraph 2."))
    val block3Id = db.add(Node.Text("This is paragraph 3."))
    val text1Id = db.add(Node.Text("This paragraph is "))
    val text2Id = db.add(Node.Text("split"))
    val text3Id = db.add(Node.Text(" into multiple text nodes."))
    val block4Id = db.add(Node.List(Layout.Chain,
      Vector(Child.Lazy(text1Id), Child.Lazy(text2Id), Child.Lazy(text3Id))))
    val page1Id = db.add(Node.List(Layout.Page,
      Vector(Child.Lazy(block1Id), Child.Lazy(block2Id), Child.Lazy(block3Id), Child.Lazy(block4Id))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(block2Id), Child.Lazy(block3Id))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(text2Id))))

    assert(view.sections(page1Id, splitSpans = true) === Vector(
      Section(None, hasMultipleParents = false,
        Vector(sub(block1Id, block(text("This is paragraph 1."))))),
      Section(Some(block2Id), hasMultipleParents = true,
        Vector(sub(block2Id, block(text("This is paragraph 2."))))),
      Section(Some(block3Id), hasMultipleParents = true,
        Vector(sub(block3Id, block(text("This is paragraph 3."))))),
      Section(Some(block4Id), hasMultipleParents = true,
        Vector(sub(block4Id, block(
          text("This paragraph is "), text("split"), text(" into multiple text nodes.")))))))
  }

  test("descendants with multiple parents group into a shared section") {
    val db = new GraftDb
    val view = new View(db)
    val block1Id = db.add(Node.Text("This is paragraph 1."))
    val block2Id = db.add(Node.Text("This is paragraph 2."))
    val block3Id = db.add(Node.Text("This is paragraph 3."))
    val subpage1Id = db.add(Node.List(Layout.Page, Vector(Child.Lazy(block2Id), Child.Lazy(block3Id))))
    val page1Id = db.add(Node.List(Layout.Page, Vector(Child.Lazy(block1Id), Child.Lazy(subpage1Id))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(subpage1Id))))

    assert(view.sections(page1Id, splitSpans = true) === Vector(
      Section(None, hasMultipleParents = false,
        Vector(sub(block1Id, block(text("This is paragraph 1."))))),
      Section(Some(subpage1Id), hasMultipleParents = true,
        Vector(
          sub(block2Id, block(text("This is paragraph 2."))),
          sub(block3Id, block(text("This is paragraph 3.")))))))
  }

  // ---- tile.rs ----

  test("tile with shared blocks marks only the shared section") {
    val db = new GraftDb
    val view = new View(db)
    val aId = db.add(Node.Text("A"))
    val bId = db.add(Node.Text("B"))
    val cId = db.add(Node.Text("C"))
    val sharedParentOfB = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(bId))))
    db.add(Node.List(Layout.Chain, Vector(Child.Lazy(sharedParentOfB))))
    db.add(Node.List(Layout.Chain, Vector(Child.Lazy(sharedParentOfB))))
    val page1Id = db.add(Node.List(Layout.Page,
      Vector(Child.Lazy(aId), Child.Lazy(sharedParentOfB), Child.Lazy(cId))))

    assert(db.ancestorPath(bId).length === 1)
    val t = view.tile(page1Id)
    assert(t.sections.length === 3)
    assert(!t.sections(0).hasMultipleParents)
    assert(t.sections(1).hasMultipleParents)
    assert(!t.sections(2).hasMultipleParents)
  }

  test("tile with a link as first block previews the linked page") {
    val db = new GraftDb
    val view = new View(db)
    val aId = db.add(Node.Text("A"))
    val pageOfAId = db.add(Node.List(Layout.Page, Vector(Child.Lazy(aId))))
    val linkOfAId = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(pageOfAId))))
    val page1Id = db.add(Node.List(Layout.Page, Vector(Child.Lazy(linkOfAId))))

    val t = view.tile(page1Id)
    assert(t.sections.length === 1)
    assert(t.sections(0).subsections.length === 1)
    t.sections(0).subsections(0).block match {
      case VBlock.Text(_, spans) =>
        assert(spans.length === 1)
        spans(0) match {
          case VSpan.Link(_, link) =>
            assert(link.descendant === graft.view.PreviewLink(pageOfAId, block(text("A"))))
          case other => fail(s"expected link span, got $other")
        }
      case b => fail(s"unexpected block $b")
    }
  }

  test("tile with forks shows an after-branch at the divergence point") {
    val db = new GraftDb
    val view = new View(db)
    val aId = db.add(Node.Text("A"))
    val bId = db.add(Node.Text("B"))
    val cId = db.add(Node.Text("C"))
    val page1Id = db.add(Node.List(Layout.Page,
      Vector(Child.Lazy(aId), Child.Lazy(bId), Child.Lazy(cId))))
    val xId = db.add(Node.Text("X"))
    val page2Id = db.add(Node.List(Layout.Page,
      Vector(Child.Lazy(aId), Child.Lazy(bId), Child.Lazy(xId))))

    val t = view.tile(page1Id)
    assert(t.sections.length === 3)
    for (i <- 0 until 2) {
      val s = t.sections(i)
      assert(s.subsections.length === 1)
      val blk = s.subsections.head
      assert(blk.before.isEmpty)
      if (i == 1) {
        assert(blk.after.length === 1)
        assert(blk.after.head.link.descendant.id === page2Id)
        assert(db.parents(blk.id) === Set(
          graft.core.Parent(page1Id, 1), graft.core.Parent(page2Id, 1)))
      } else assert(blk.after.isEmpty)
    }
  }

  test("tile with repeated children shows no branches") {
    val db = new GraftDb
    val view = new View(db)
    val aId = db.add(Node.Text("A"))
    val bId = db.add(Node.Text("B"))
    val cId = db.add(Node.Text("C"))
    val page1Id = db.add(Node.List(Layout.Page,
      Vector(Child.Lazy(aId), Child.Lazy(bId), Child.Lazy(aId), Child.Lazy(cId))))
    db.add(Node.List(Layout.Page,
      Vector(Child.Lazy(aId), Child.Lazy(bId), Child.Lazy(aId), Child.Lazy(cId))))

    val t = view.tile(page1Id)
    assert(t.sections.length === 4)
    for (i <- 0 until 3) {
      val blk = t.sections(i).subsections.head
      assert(blk.before.isEmpty)
      assert(blk.after.isEmpty)
    }
  }
}
