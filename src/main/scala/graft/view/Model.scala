package graft.view

import graft.core.Parent
import graft.model.Gid

import scala.collection.immutable.SortedSet

/** The linearized view model (reference: assemblage_view/src/model.rs):
  * Space → Tile → Section → Subsection → Block → Span, the JSON
  * interface between frontends and the engine.
  */
sealed trait VSpan {
  def styledWith(styles: SortedSet[String]): VSpan = this match {
    case VSpan.Text(s, t) => VSpan.Text(s ++ styles, t)
    case VSpan.Link(s, l) => VSpan.Link(s ++ styles, l)
  }
}
object VSpan {
  final case class Text(styles: SortedSet[String], text: String) extends VSpan
  final case class Link(styles: SortedSet[String], link: Lineage) extends VSpan
  def text(t: String): VSpan = Text(SortedSet.empty, t)
  def link(l: Lineage): VSpan = Link(SortedSet.empty, l)
}

sealed trait VBlock {
  def styledWith(b: SortedSet[String], s: SortedSet[String]): VBlock = this match {
    case VBlock.Text(styles, spans) => VBlock.Text(styles ++ b, spans.map(_.styledWith(s)))
    case VBlock.Cyclic              => this
  }
}
object VBlock {
  final case class Text(styles: SortedSet[String], spans: Vector[VSpan]) extends VBlock
  case object Cyclic extends VBlock
  def text(spans: Vector[VSpan]): VBlock = Text(SortedSet.empty, spans)
}

final case class PreviewLink(id: Gid, block: VBlock)

final case class Lineage(
    descendant: PreviewLink,
    ancestor: Option[PreviewLink],
    descent: Vector[Parent])

/** A sibling link branching off before/after a block; ordered by
  * (timestamp, descendant id) — model.rs:159-183.
  */
final case class Branch(link: Lineage, timestamp: Long)
object Branch {
  implicit val ordering: Ordering[Branch] =
    Ordering.by((b: Branch) => (b.timestamp, b.link.descendant.id))
}

final case class Subsection(
    id: Gid,
    block: VBlock,
    before: Vector[Branch],
    after: Vector[Branch]) {
  def styledWith(b: SortedSet[String], s: SortedSet[String]): Subsection =
    copy(block = block.styledWith(b, s))
}

final case class Section(
    id: Option[Gid],
    hasMultipleParents: Boolean,
    subsections: Vector[Subsection])

final case class Tile(
    id: Gid,
    preview: VBlock,
    broadcasts: Vector[graft.core.BroadcastMeta],
    sections: Vector[Section],
    branches: Vector[Branch])

/** A top-level view of multiple tiles side by side. */
final case class Space(tiles: Vector[Tile])
