package graft.model

import scala.collection.immutable.SortedSet

/** The document-graph data model, re-expressed from the reference
  * (assemblage_db/src/data.rs:181-508). A stored graph is a DAG (cycles
  * allowed) of three node kinds; children are ordered and may have
  * multiple parents.
  */
sealed trait Layout
object Layout {
  /** Children are inline spans concatenated into one line (data.rs:365-370). */
  case object Chain extends Layout
  /** Children are vertically separated blocks (data.rs:371-373). */
  case object Page extends Layout
}

sealed trait Styles
object Styles {
  /** data.rs:434-447 */
  final case class Block(styles: SortedSet[String]) extends Styles
  /** data.rs:422-432 */
  final case class Span(styles: SortedSet[String]) extends Styles
  val blockStyles: Set[String] = Set("HEADING", "LIST", "QUOTE", "ASIDE")
  val spanStyles: Set[String] = Set("BOLD", "ITALIC", "STRUCK", "CODE")
}

sealed trait Child {
  def idOpt: Option[Gid] = this match {
    case Child.Lazy(id) => Some(id)
    case _              => None
  }
}
object Child {
  /** Reference to a stored node (data.rs:449-458). */
  final case class Lazy(id: Gid) extends Child
  /** Inline node, stored (and converted to Lazy) on add (core.rs:317-350). */
  final case class Eager(node: Node) extends Child
}

sealed trait Node {
  /** (structure without children, ordered children) — data.rs `split`. */
  def children: Vector[Child] = this match {
    case Node.Text(_)            => Vector.empty
    case Node.List(_, cs)        => cs
    case Node.Styled(_, c)       => Vector(c)
  }
  def withChildren(cs: Vector[Child]): Node = this match {
    case t: Node.Text => require(cs.isEmpty, "text has no children"); t
    case Node.List(l, _) => Node.List(l, cs)
    case Node.Styled(s, _) =>
      require(cs.length == 1, "styled node has exactly one child"); Node.Styled(s, cs.head)
  }
}

object Node {
  /** One line of text; newlines are rejected (data.rs:145-162). */
  final case class Text(line: String) extends Node {
    require(!line.contains('\n'), "text line must not contain newlines")
  }
  final case class List(layout: Layout, elems: Vector[Child]) extends Node
  final case class Styled(styles: Styles, child: Child) extends Node

  /** Multi-line strings auto-split into a Page of Text lines
    * (data.rs:214-225); single lines stay a bare Text.
    */
  def text(s: String): Node = {
    val lines = s.split("\n", -1)
    if (lines.length == 1) Text(lines(0))
    else List(Layout.Page, lines.toVector.map(l => Child.Eager(Text(l)): Child))
  }

  def page(children: Node*): Node =
    List(Layout.Page, children.toVector.map(Child.Eager(_): Child))
  def chain(children: Node*): Node =
    List(Layout.Chain, children.toVector.map(Child.Eager(_): Child))
  def styledBlock(style: String, child: Node): Node =
    Styled(Styles.Block(SortedSet(style)), Child.Eager(child))
  def styledSpan(style: String, child: Node): Node =
    Styled(Styles.Span(SortedSet(style)), Child.Eager(child))

  /** A line is blank if it is empty or whitespace-only (data.rs:165-168). */
  def isBlankLine(s: String): Boolean = s.trim.isEmpty
}
