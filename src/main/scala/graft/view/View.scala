package graft.view

import graft.core.{GraftDb, PreviewedNode}
import graft.model.{Gid, Layout, Node, Styles}

import scala.collection.immutable.SortedSet
import scala.collection.mutable

/** Linearization of the document graph into the view model (reference:
  * assemblage_view/src/lib.rs:310-651): spans, subsections, sections,
  * and full tiles with sibling-branch injection.
  */
final class View(db: GraftDb) {

  private def node(id: Gid): Node =
    db.get(id).getOrElse(throw new NoSuchElementException(s"id $id not found in view"))
  private def childId(c: graft.model.Child): Gid = c.idOpt.getOrElse(
    throw new IllegalStateException("stored nodes are normalized to lazy children"))

  /** Flat inline span list of a node (lib.rs:310-334). */
  def spans(id: Gid, followLinks: Boolean): Vector[VSpan] = node(id) match {
    case Node.Text(line) => Vector(VSpan.text(line))
    case Node.List(Layout.Chain, children) =>
      children.flatMap(c => spans(childId(c), followLinks))
    case Node.List(Layout.Page, _) =>
      if (followLinks) Vector(VSpan.link(lineage(id))) else shallowLineage(id)
    case Node.Styled(Styles.Block(_), _) =>
      if (followLinks) Vector(VSpan.link(lineage(id))) else shallowLineage(id)
    case Node.Styled(Styles.Span(styles), child) =>
      spans(childId(child), followLinks).map(_.styledWith(styles))
  }

  /** Block list of a node (lib.rs:336-379). */
  def subsections(id: Gid, followLinks: Boolean): Vector[Subsection] = node(id) match {
    case Node.Text(_) =>
      Vector(Subsection(id, VBlock.text(spans(id, followLinks)), Vector.empty, Vector.empty))
    case Node.List(Layout.Chain, children) =>
      val childSpans = children.flatMap(c => spans(childId(c), followLinks))
      Vector(Subsection(id, VBlock.text(childSpans), Vector.empty, Vector.empty))
    case Node.List(Layout.Page, children) =>
      children.flatMap(c => subsections(childId(c), followLinks))
    case Node.Styled(styles, child) =>
      val (b, s) = styles match {
        case Styles.Block(st) => (st, SortedSet.empty[String])
        case Styles.Span(st)  => (SortedSet.empty[String], st)
      }
      subsections(childId(child), followLinks).map(_.styledWith(b, s))
  }

  /** Section grouping: shared children (multiple parents) become their
    * own uneditable section (lib.rs:381-458).
    */
  def sections(id: Gid, splitSpans: Boolean): Vector[Section] = node(id) match {
    case Node.Text(_) =>
      Vector(Section(None, db.hasSharedDescendantsUntilLinks(id), subsections(id, followLinks = true)))
    case Node.List(Layout.Chain, _) if !splitSpans =>
      val shared = db.hasSharedDescendantsUntilLinks(id)
      Vector(Section(if (shared) Some(id) else None, shared, subsections(id, followLinks = true)))
    case Node.List(_, children) =>
      children.flatMap { c =>
        val cid = childId(c)
        if (db.parents(cid).size > 1)
          Vector(Section(Some(cid), hasMultipleParents = true, subsections(cid, followLinks = true)))
        else sections(cid, splitSpans = false)
      }
    case Node.Styled(styles, child) =>
      val cid = childId(child)
      val (b, s) = styles match {
        case Styles.Block(st) => (st, SortedSet.empty[String])
        case Styles.Span(st)  => (SortedSet.empty[String], st)
      }
      val blocks = subsections(cid, followLinks = true).map(_.styledWith(b, s))
      if (db.parents(cid).size > 1)
        Vector(Section(Some(cid), hasMultipleParents = true, blocks))
      else sections(cid, splitSpans).map(sec =>
        sec.copy(subsections = sec.subsections.map(_.styledWith(b, s))))
  }

  /** First non-empty block of a node as a preview link (lib.rs:591-599). */
  def previewLink(id: Gid): PreviewLink = {
    val block = db.preview(id) match {
      case PreviewedNode.Block(bid, _) => subsections(bid, followLinks = false).head.block
      case PreviewedNode.Empty         => VBlock.text(Vector(VSpan.text("")))
      case PreviewedNode.Cyclic        => VBlock.Cyclic
    }
    PreviewLink(id, block)
  }

  /** Lineage up to the oldest unique non-link ancestor (lib.rs:602-616). */
  def lineage(id: Gid): Lineage = {
    val descent = db.ancestorPathUntilLink(id)
    Lineage(
      descendant = previewLink(id),
      ancestor = descent.headOption.map(a => previewLink(a.id)),
      descent = descent)
  }

  private def shallowLineage(id: Gid): Vector[VSpan] =
    Vector(VSpan.link(Lineage(
      PreviewLink(id, VBlock.text(Vector(VSpan.text("...")))), None, Vector.empty)))

  private def latestTs(id: Gid): Long = db.versions(id).lastOption.map(_.ts).getOrElse(0L)

  /** Full page view with per-subsection before/after branch injection
    * and parent-link branches (lib.rs:460-588).
    */
  def tile(id: Gid, broadcasts: Vector[graft.core.BroadcastMeta] = Vector.empty): Tile = {
    val idsInView = db.descendantsUntilLinks(id)
    val secs = sections(id, splitSpans = true).map { section =>
      section.copy(subsections = section.subsections.map { sub =>
        def branchesFor(before: Boolean): Vector[Branch] = {
          val siblings = if (before) db.before(sub.id) else db.after(sub.id)
          // Promote each sibling to its largest still-inline ancestor so
          // that for "C" in the chain ["A","B","C"] the branch shows
          // "ABC", not just "C" (lib.rs:493-529).
          val siblingBlocks = mutable.HashSet.empty[Gid]
          for (start <- siblings) {
            var sid = start
            var snode = node(sid)
            val visited = mutable.HashSet.empty[Gid]
            var done = false
            while (!done) {
              val ps = db.parents(sid)
              if (ps.size != 1 || visited.contains(sid) || db.isBlock(snode)) done = true
              else {
                val pid = ps.head.id
                val pnode = node(pid)
                if (db.isLink(snode, pnode) || (db.isBlock(snode) && db.isBlock(pnode))) done = true
                else {
                  visited += sid
                  sid = pid
                  snode = pnode
                }
              }
            }
            if (!idsInView.contains(sid)) siblingBlocks += sid
          }
          siblingBlocks.toVector
            .map(s => Branch(lineage(s), latestTs(s)))
            .sorted
        }
        sub.copy(before = branchesFor(before = true), after = branchesFor(before = false))
      })
    }

    val mainNode = node(id)
    val parentBranches = db.parents(id).toVector.flatMap { p =>
      val parentNode = node(p.id)
      if (db.isLink(mainNode, parentNode)) {
        val descent = db.ancestorPathUntilLink(p.id)
        Some(Branch(
          Lineage(
            descendant = previewLink(id),
            ancestor = descent.headOption.map(a => previewLink(a.id)),
            descent = descent),
          latestTs(id)))
      } else None
    }.sorted

    Tile(id, previewLink(id).block, broadcasts, secs, parentBranches)
  }
}
