package graft

import graft.model.{Child, Layout, Node, Styles}
import graft.view.{Markup, VBlock, VSpan}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.immutable.SortedSet

/** Ported from assemblage_view/tests/markup.rs. */
class MarkupSpec extends AnyFunSuite {

  private def text(t: String) = VSpan.text(t)
  private def styled(t: String, styles: String*) = VSpan.Text(SortedSet(styles: _*), t)
  private def block(spans: VSpan*): VBlock.Text = VBlock.Text(SortedSet.empty[String], spans.toVector)
  private def blockStyled(styles: Set[String], spans: VSpan*): VBlock.Text =
    VBlock.Text(SortedSet.empty[String] ++ styles, spans.toVector)

  private def assertRoundtrip(markup: String, expected: VBlock.Text): Unit = {
    assert(Markup.toBlock(markup) === expected)
    assert(Markup.fromBlock(expected) === markup)
  }

  private def assertCompletedRoundtrip(markup: String, complete: String, expected: VBlock.Text): Unit = {
    assert(Markup.toBlock(markup) === expected)
    assert(Markup.fromBlock(expected) === complete)
  }

  test("markup to node") {
    assert(Markup.toNode("just text") ===
      Node.List(Layout.Page, Vector(Child.Eager(Node.Text("just text")))))
    assert(Markup.toNode("# A Heading") ===
      Node.Styled(Styles.Block(SortedSet("HEADING")), Child.Eager(Node.Text("A Heading"))))
    assert(Markup.toNode("# A *Bold* Heading") ===
      Node.Styled(Styles.Block(SortedSet("HEADING")), Child.Eager(Node.List(Layout.Chain, Vector(
        Child.Eager(Node.Text("A ")),
        Child.Eager(Node.Styled(Styles.Span(SortedSet("BOLD")), Child.Eager(Node.Text("Bold")))),
        Child.Eager(Node.Text(" Heading")))))))
  }

  test("block without markup") {
    val m = "some block without special markup"
    assertRoundtrip(m, block(text(m)))
  }

  test("block markup prefixes") {
    assertRoundtrip("># A Heading & Quote",
      blockStyled(Set("HEADING", "QUOTE"), text("A Heading & Quote")))

    assert(Markup.toBlock("##>#>>#>> A Heading & Quote") ===
      blockStyled(Set("HEADING", "QUOTE"), text("A Heading & Quote")))
    assert(Markup.fromBlock(blockStyled(Set("HEADING", "QUOTE"), text("A Heading & Quote"))) ===
      "># A Heading & Quote")

    assertRoundtrip(",>-# All block styles",
      blockStyled(Set("ASIDE", "LIST", "HEADING", "QUOTE"), text("All block styles")))

    val noStyles = ",>-#no styles because the space after the prefix is missing"
    assertRoundtrip(noStyles, block(text(noStyles)))
  }

  test("span markup") {
    assertRoundtrip("A *very bold* statement!",
      block(text("A "), styled("very bold", "BOLD"), text(" statement!")))

    assertRoundtrip("~_*struck bold italic*_~ _*bold italic*_",
      block(
        styled("struck bold italic", "STRUCK", "BOLD", "ITALIC"),
        text(" "),
        styled("bold italic", "BOLD", "ITALIC")))

    assertRoundtrip("*bold*_italic_~struck~`code`",
      block(
        styled("bold", "BOLD"), styled("italic", "ITALIC"),
        styled("struck", "STRUCK"), styled("code", "CODE")))

    assertRoundtrip("*bold and_italic ~text~_ markup*!",
      block(
        styled("bold and", "BOLD"),
        styled("italic ", "BOLD", "ITALIC"),
        styled("text", "BOLD", "ITALIC", "STRUCK"),
        styled(" markup", "BOLD"),
        text("!")))
  }

  test("incomplete span markup is completed on serialization") {
    assertCompletedRoundtrip(
      "italic starts _here but never ends...",
      "italic starts _here but never ends..._",
      block(text("italic starts "), styled("here but never ends...", "ITALIC")))
  }

  test("escaped span markup") {
    assertCompletedRoundtrip(
      "\\_not \\italic, _italic \\_ until here_",
      "\\_not \\\\italic, _italic \\_ until here_",
      block(text("_not \\italic, "), styled("italic _ until here", "ITALIC")))
  }

  test("escaped block markup") {
    assertRoundtrip("\\#> neither a heading nor a quote",
      block(text("#> neither a heading nor a quote")))

    assertCompletedRoundtrip(
      "\\#>neither a heading nor a quote",
      "\\\\#>neither a heading nor a quote",
      block(text("\\#>neither a heading nor a quote")))
  }

  test("overlapping span markup") {
    assertRoundtrip("bold *and _italic* and ~struck overlap_ here~",
      block(
        text("bold "),
        styled("and ", "BOLD"),
        styled("italic", "BOLD", "ITALIC"),
        styled(" and ", "ITALIC"),
        styled("struck overlap", "ITALIC", "STRUCK"),
        styled(" here", "STRUCK")))
  }

  test("empty inline markup vanishes") {
    assertCompletedRoundtrip(
      "a text that contains empty ** bold markup",
      "a text that contains empty  bold markup",
      block(text("a text that contains empty "), text(" bold markup")))

    assertCompletedRoundtrip(
      "a text that contains empty markup_*",
      "a text that contains empty markup",
      block(text("a text that contains empty markup")))
  }
}
