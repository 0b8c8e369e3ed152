package graft.view

import graft.model.{Child, Layout, Node, Styles}

import scala.collection.immutable.SortedSet
import scala.collection.mutable

/** The minimal single-line markup language (reference:
  * assemblage_view/src/markup.rs): 4 block styles by prefix chars
  * (`# > - ,` + space), 4 span styles by toggle chars (`* _ ~ \``),
  * backslash escapes, overlapping styles allowed.
  */
object Markup {

  /** Style emission order mirrors the reference's enum-derived BTreeSet
    * order (SpanStyle: Bold < Italic < Struck < Code; BlockStyle:
    * Heading < List < Quote < Aside) — required for byte-identical
    * serialization.
    */
  private val spanOrder = Vector("BOLD", "ITALIC", "STRUCK", "CODE")
  private val blockOrder = Vector("HEADING", "LIST", "QUOTE", "ASIDE")
  private val spanChar = Map("BOLD" -> '*', "ITALIC" -> '_', "STRUCK" -> '~', "CODE" -> '`')
  private val blockChar = Map("HEADING" -> '#', "LIST" -> '-', "QUOTE" -> '>', "ASIDE" -> ',')

  /** Parse one line of markup into a view block. */
  def toBlock(markup: String): VBlock.Text = {
    require(!markup.contains('\n'), "markup for a single block must not contain newlines")
    val (index, blockStyles) = parseBlockStylesFromPrefix(markup)
    VBlock.Text(blockStyles, parseSpans(markup.substring(index)))
  }

  /** Parse one line of markup into a node tree (markup.rs:175-207). */
  def toNode(markup: String): Node = {
    val block = toBlock(markup)
    val spanNodes: Vector[Node] = block.spans.map {
      case VSpan.Text(styles, text) =>
        if (styles.isEmpty) Node.text(text)
        else Node.Styled(Styles.Span(styles), Child.Eager(Node.text(text)))
      case VSpan.Link(_, _) =>
        throw new IllegalStateException("link spans never result from parsing markup")
    }
    val spanNode =
      if (spanNodes.length == 1) spanNodes.head
      else Node.List(Layout.Chain, spanNodes.map(Child.Eager(_): Child))
    if (block.styles.isEmpty) Node.List(Layout.Page, Vector(Child.Eager(spanNode)))
    else Node.Styled(Styles.Block(block.styles), Child.Eager(spanNode))
  }

  /** Serialize a view block to markup (inverse of toBlock on parsed
    * input; incomplete markup normalizes — see the reference tests).
    */
  def fromBlock(block: VBlock): String = block match {
    case VBlock.Text(styles, spans) => asMarkup(styles, spans)
    case VBlock.Cyclic => throw new IllegalArgumentException("cyclic blocks cannot be serialized")
  }

  /** markup.rs:253-271 — returns (chars to skip, block styles). */
  private def parseBlockStylesFromPrefix(markup: String): (Int, SortedSet[String]) = {
    val styles = mutable.SortedSet.empty[String]
    val (body, isEscaped) =
      if (markup.startsWith("\\")) (markup.substring(1), true) else (markup, false)
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case ',' => styles += "ASIDE"
        case '>' => styles += "QUOTE"
        case '-' => styles += "LIST"
        case '#' => styles += "HEADING"
        case ' ' if isEscaped       => return (1, SortedSet.empty)
        case ' ' if styles.isEmpty  => return (0, SortedSet.empty)
        case ' '                    => return (i + 1, SortedSet.empty[String] ++ styles)
        case _                      => return (0, SortedSet.empty)
      }
      i += 1
    }
    (0, SortedSet.empty)
  }

  /** markup.rs:273-324 — span state machine with toggling styles. */
  private def parseSpans(markup: String): Vector[VSpan] = {
    val spans = Vector.newBuilder[VSpan]
    val buffer = new StringBuilder
    val active = mutable.SortedSet.empty[String]
    var isEscaped = false
    for (ch <- markup) {
      val style = ch match {
        case '*' => Some("BOLD")
        case '_' => Some("ITALIC")
        case '~' => Some("STRUCK")
        case '`' => Some("CODE")
        case _   => None
      }
      style match {
        case Some(s) if !isEscaped =>
          if (buffer.nonEmpty) spans += VSpan.Text(SortedSet.empty[String] ++ active, buffer.result())
          buffer.clear()
          if (active.contains(s)) active -= s else active += s
        case Some(_) => buffer += ch
        case None =>
          if (isEscaped) buffer += '\\'
          if (ch != '\\') buffer += ch
      }
      isEscaped = if (ch == '\\') !isEscaped else false
    }
    if (buffer.nonEmpty) spans += VSpan.Text(SortedSet.empty[String] ++ active, buffer.result())
    spans.result()
  }

  /** markup.rs:326-394 — serializer with open/close style tracking. */
  private def asMarkup(styles: SortedSet[String], spans: Vector[VSpan]): String = {
    val out = new StringBuilder
    blockOrder.reverseIterator.filter(styles.contains).foreach(s => out += blockChar(s))
    if (out.nonEmpty) out += ' '

    // Escape a leading block-style prefix ONLY when the first span is
    // unstyled: a styled first span opens with its style character, so
    // the text never sits at line start — and an escape emitted before
    // that style character would escape the delimiter itself ("`- "
    // serialized as "\`- `", which reparses as plain text).
    spans.headOption.foreach {
      case VSpan.Text(spanStyles, text) if spanStyles.isEmpty =>
        if (parseBlockStylesFromPrefix(text)._2.nonEmpty) out += '\\'
      case _ =>
    }

    val active = mutable.ArrayBuffer.empty[String]
    for (span <- spans) span match {
      case VSpan.Text(spanStyles, text) =>
        val closedOrOpened = mutable.ArrayBuffer.empty[String]
        for (i <- active.indices.reverse) {
          val s = active(i)
          if (!spanStyles.contains(s)) {
            closedOrOpened += s
            active.remove(i)
          }
        }
        for (s <- spanOrder.reverseIterator.filter(spanStyles.contains)) {
          if (!active.contains(s)) {
            closedOrOpened += s
            active += s
          }
        }
        closedOrOpened.foreach(s => out += spanChar(s))
        out ++= text
          .replace("\\", "\\\\")
          .replace("*", "\\*")
          .replace("_", "\\_")
          .replace("~", "\\~")
          .replace("`", "\\`")
          .replace("|", "\\|")
      case other =>
        throw new IllegalArgumentException(s"cannot serialize span $other")
    }
    active.reverseIterator.foreach(s => out += spanChar(s))
    out.result()
  }
}
