package graft.core

import graft.index.Grams
import graft.model.{Child, Gid, Layout, Node, Overlap, Styles}

import scala.collection.mutable

/** Result of a preview — the first non-blank block of a subtree
  * (reference: assemblage_db/src/lib.rs:330-342, 462-509).
  */
sealed trait PreviewedNode
object PreviewedNode {
  final case class Block(id: Gid, node: Node) extends PreviewedNode
  case object Empty extends PreviewedNode
  case object Cyclic extends PreviewedNode
}

/** Result of restore (reference: assemblage_db/src/lib.rs RestoredNode). */
sealed trait RestoredNode
object RestoredNode {
  final case class Restored(node: Node) extends RestoredNode
  case object NoNeedToRestore extends RestoredNode
}

/** The serving-path document-graph database: the full reference API
  * (assemblage_db) over in-memory versioned slot stores. This is the
  * executable specification for the engine's semantics — the
  * distributed bulk pipelines (graft.bulk) implement the same
  * operations as DataFrame jobs and are tested against it.
  *
  * Slots mirror assemblage_db/src/lib.rs:190-198: nodes, parents,
  * grams (inverted postings), counts, overlaps.
  */
final class GraftDb {
  private val clock = new MonotonicClock
  val nodes = new SlotStore[Gid, Node]
  val parentsOf = new SlotStore[Gid, Set[Parent]]
  val gramsSlot = new SlotStore[Int, Map[Gid, Int]]
  val countsSlot = new SlotStore[Gid, Int]
  val overlapsSlot = new SlotStore[Gid, Vector[Overlap]]

  // Root bootstrap: an empty Page list under the nil id (core.rs:23-42).
  nodes.append(Gid.root, Node.List(Layout.Page, Vector.empty), clock.now())
  parentsOf.append(Gid.root, Set.empty, clock.now())

  private def now(): Long = clock.now()
  private def idNotFound(id: Gid, op: String): Nothing =
    throw new NoSuchElementException(s"id $id not found in $op")

  // ------------------------------------------------------------------
  // Reads (core.rs:100-310)
  // ------------------------------------------------------------------

  def get(id: Gid): Option[Node] = nodes.get(id)
  def getInTrash(id: Gid): Option[Node] = nodes.getUnremoved(id)
  def parents(id: Gid): Set[Parent] =
    parentsOf.get(id).getOrElse(idNotFound(id, "parents"))
  def versions(id: Gid): Vector[Version[Node]] = nodes.versions(id)
  def lastUpdated: Option[Long] = nodes.lastUpdated

  /** Compaction: purge version history and trash in every slot. */
  def merge(): Unit = {
    nodes.merge(); parentsOf.merge(); gramsSlot.merge(); countsSlot.merge()
    overlapsSlot.merge()
  }

  // ------------------------------------------------------------------
  // Rendering classification (lib.rs:347-386)
  // ------------------------------------------------------------------

  /** A node renders inline iff it is a text atom, a Chain list, or a
    * span-styled node whose (transitive) child renders inline.
    */
  def isSpan(node: Node): Boolean = node match {
    case Node.Text(_)                     => true
    case Node.List(layout, _)             => layout == Layout.Chain
    case Node.Styled(Styles.Block(_), _)  => false
    case Node.Styled(Styles.Span(_), c) => c match {
      case Child.Lazy(id)    => isSpan(get(id).getOrElse(idNotFound(id, "isSpan")))
      case Child.Eager(n)    => isSpan(n)
    }
  }

  def isBlock(node: Node): Boolean = !isSpan(node)

  /** A child renders as a link iff it is a block inside a span parent. */
  def isLink(child: Node, parent: Node): Boolean = isBlock(child) && isSpan(parent)

  /** True if the subtree contains only blank text (lib.rs:389-416). */
  def isBlank(id: Gid): Boolean = {
    val visited = mutable.HashSet.empty[Gid]
    val stack = mutable.Stack(id)
    while (stack.nonEmpty) {
      val cur = stack.pop()
      if (!visited.contains(cur)) {
        visited += cur
        get(cur).getOrElse(idNotFound(cur, "isBlank")) match {
          case Node.Text(l) => if (!Node.isBlankLine(l)) return false
          case n            => n.children.foreach(c => stack.push(childId(c)))
        }
      }
    }
    true
  }

  /** True if traversing children revisits any node — diamonds included,
    * matching the reference's conservative check (lib.rs:424-442).
    */
  def isCyclic(id: Gid): Boolean = {
    val visited = mutable.HashSet.empty[Gid]
    val stack = mutable.Stack(id)
    while (stack.nonEmpty) {
      val cur = stack.pop()
      if (visited.contains(cur)) return true
      visited += cur
      get(cur).getOrElse(idNotFound(cur, "isCyclic")).children
        .foreach(c => stack.push(childId(c)))
    }
    false
  }

  private def childId(c: Child): Gid = c match {
    case Child.Lazy(id) => id
    case Child.Eager(_) => throw new IllegalStateException("stored nodes are normalized to lazy children")
  }

  // ------------------------------------------------------------------
  // Preview (lib.rs:462-509)
  // ------------------------------------------------------------------

  /** First non-blank block of the subtree, styles accumulated along the
    * first-child descent.
    */
  def preview(start: Gid): PreviewedNode = {
    var id = start
    var blockStyles = scala.collection.immutable.SortedSet.empty[String]
    var spanStyles = scala.collection.immutable.SortedSet.empty[String]
    val visited = mutable.HashSet.empty[Gid]
    def wrap(n: Node): Node = {
      val withSpan = if (spanStyles.nonEmpty) Node.Styled(Styles.Span(spanStyles), Child.Eager(n)) else n
      if (blockStyles.nonEmpty) Node.Styled(Styles.Block(blockStyles), Child.Eager(withSpan)) else withSpan
    }
    while (!visited.contains(id)) {
      visited += id
      val node = get(id).getOrElse(idNotFound(id, "preview"))
      node match {
        case Node.Text(l) =>
          return if (Node.isBlankLine(l)) PreviewedNode.Empty
          else PreviewedNode.Block(id, wrap(node))
        case Node.List(_, cs) if cs.isEmpty => return PreviewedNode.Empty
        case Node.List(Layout.Chain, _) =>
          return if (isBlank(id)) PreviewedNode.Empty
          else if (isCyclic(id)) PreviewedNode.Cyclic
          else PreviewedNode.Block(id, wrap(node))
        case Node.List(_, cs) => id = childId(cs.head)
        case Node.Styled(s, c) =>
          s match {
            case Styles.Block(st) => blockStyles ++= st
            case Styles.Span(st)  => spanStyles ++= st
          }
          id = childId(c)
      }
    }
    PreviewedNode.Cyclic
  }

  // ------------------------------------------------------------------
  // Ancestor paths (lib.rs:552-639)
  // ------------------------------------------------------------------

  def ancestorPath(id: Gid): Vector[Parent] = ancestorPathUntil(id, stopAtLink = false)
  def ancestorPathUntilLink(id: Gid): Vector[Parent] = ancestorPathUntil(id, stopAtLink = true)

  /** Walk up while exactly one parent exists, cycle-safe, optionally
    * stopping when the parent renders the child as a link; result
    * ordered oldest → youngest.
    */
  private def ancestorPathUntil(start: Gid, stopAtLink: Boolean): Vector[Parent] = {
    var id = start
    val path = mutable.ArrayBuffer.empty[Parent]
    var done = false
    while (!done) {
      val ps = parents(id)
      if (ps.size != 1) done = true
      else {
        val parent = ps.head
        val cyclic = path.contains(parent)
        val link = stopAtLink && isLink(
          get(id).getOrElse(idNotFound(id, "ancestorPath")),
          get(parent.id).getOrElse(idNotFound(parent.id, "ancestorPath")))
        if (cyclic || link) done = true
        else {
          id = parent.id
          path += parent
        }
      }
    }
    path.reverseIterator.toVector
  }

  // ------------------------------------------------------------------
  // Descendants (lib.rs:695-831)
  // ------------------------------------------------------------------

  def descendants(id: Gid): Set[Gid] = descendantsUntil(id, stopAtLink = false)
  def descendantsUntilLinks(id: Gid): Set[Gid] = descendantsUntil(id, stopAtLink = true)

  private def descendantsUntil(start: Gid, stopAtLink: Boolean): Set[Gid] = {
    val startNode = get(start).getOrElse(idNotFound(start, "descendants"))
    val out = mutable.HashSet.empty[Gid]
    val stack = mutable.Stack((startNode, start))
    while (stack.nonEmpty) {
      val (node, id) = stack.pop()
      if (!out.contains(id)) {
        out += id
        node.children.foreach { c =>
          val cid = childId(c)
          val childNode = get(cid).getOrElse(idNotFound(cid, "descendants"))
          if (stopAtLink && isLink(childNode, node)) out += cid
          else stack.push((childNode, cid))
        }
      }
    }
    out.toSet
  }

  /** ∃ descendant (stopping at nothing) with more than one parent. */
  def hasSharedDescendantsUntilLinks(id: Gid): Boolean = {
    val startNode = get(id).getOrElse(idNotFound(id, "hasShared"))
    val seen = mutable.HashSet.empty[Gid]
    val stack = mutable.Stack((startNode, id))
    while (stack.nonEmpty) {
      val (node, cur) = stack.pop()
      if (!seen.contains(cur)) {
        seen += cur
        for (c <- node.children) {
          val cid = childId(c)
          val childNode = get(cid).getOrElse(idNotFound(cid, "hasShared"))
          if (parents(cid).size > 1) return true
          stack.push((childNode, cid))
        }
      }
    }
    false
  }

  // ------------------------------------------------------------------
  // Sibling search (core.rs:152-299)
  // ------------------------------------------------------------------

  def before(id: Gid): Set[Gid] = adjacent(id, before = true)
  def after(id: Gid): Set[Gid] = adjacent(id, before = false)

  /** Nearest non-blank, non-aside rendered neighbor on one side, across
    * nested list boundaries, recursing into parents when a list has no
    * sibling on that side, stopping at link boundaries, cycle-safe.
    */
  private def adjacent(id: Gid, before: Boolean): Set[Gid] = {
    if (isBlank(id)) return Set.empty
    val node = get(id).getOrElse(idNotFound(id, "adjacent"))
    val siblings = mutable.HashSet.empty[Gid]

    def relevantChildren(pid: Gid, index: Int, children: Vector[Child]): mutable.Stack[(Gid, Int, Gid)] = {
      val indexed = children.zipWithIndex.map { case (c, i) => (pid, i, childId(c)) }
      val slice =
        if (before) indexed.take(index)
        else if (indexed.length > index + 1) indexed.drop(index + 1).reverse
        else Vector.empty
      mutable.Stack.from(slice.reverse) // stack pops from the head; preserve pop order = nearest first
    }

    for (parent <- parents(id)) {
      val parentNode = get(parent.id).getOrElse(idNotFound(parent.id, "adjacent"))
      val candidates = relevantChildren(parent.id, parent.index, parentNode.children)
      val visited = mutable.HashSet.empty[Gid]
      var sibling: Option[Gid] = None
      while (sibling.isEmpty && candidates.nonEmpty) {
        val (pid, index, cid) = candidates.pop()
        val pNode = get(pid).getOrElse(idNotFound(pid, "adjacent"))
        val child = get(cid).getOrElse(idNotFound(cid, "adjacent"))
        val link = isLink(child, pNode)
        val aside = child match {
          case Node.Styled(Styles.Block(st), _) => st.contains("ASIDE")
          case _                                => false
        }
        val atom = child match { case Node.Text(_) => true; case _ => false }
        if (!aside && !isBlank(cid) && (link || atom)) sibling = Some(cid)
        else if (!visited.contains(cid)) {
          visited += cid
          val cs = if (before) child.children else child.children.reverse
          if (!aside) cs.foreach(c => candidates.push((cid, index, childId(c))))
        }
      }
      sibling match {
        case Some(s) => siblings += s
        case None =>
          if (!isLink(node, parentNode)) siblings ++= adjacent(parent.id, before)
      }
    }
    siblings.toSet
  }

  // ------------------------------------------------------------------
  // Unindexed mutation (core.rs:313-594)
  // ------------------------------------------------------------------

  private def addUnindexed(node: Node): Gid = {
    val id = Gid.random()
    val lazyChildren = node.children.zipWithIndex.map { case (child, index) =>
      val parent = Parent(id, index)
      val cid = child match {
        case Child.Eager(n) =>
          val cid = addUnindexed(n)
          parentsOf.append(cid, Set(parent), now())
          cid
        case Child.Lazy(cid) =>
          restoreUnindexed(cid)
          val ps = parentsOf.get(cid).getOrElse(Set.empty)
          if (!ps.contains(parent)) parentsOf.append(cid, ps + parent, now())
          cid
      }
      Child.Lazy(cid): Child
    }
    nodes.append(id, node.withChildren(lazyChildren), now())
    parentsOf.append(id, Set.empty, now())
    id
  }

  private def swapUnindexed(id: Gid, replacement: Node): Unit = {
    val existing = nodes.getUnremoved(id).getOrElse(idNotFound(id, "swap"))

    // Parent edges of the existing node that the swap may orphan.
    val obsoleteParents = mutable.HashMap.empty[Gid, mutable.HashSet[Parent]]
    existing.children.zipWithIndex.foreach { case (c, i) =>
      obsoleteParents.getOrElseUpdate(childId(c), mutable.HashSet.empty) += Parent(id, i)
    }

    val lazyChildIds = mutable.HashSet.empty[Gid]
    val lazyChildren = replacement.children.zipWithIndex.map { case (child, index) =>
      val parent = Parent(id, index)
      val cid = child match {
        case Child.Eager(n) =>
          val cid = addUnindexed(n)
          parentsOf.append(cid, Set(parent), now())
          cid
        case Child.Lazy(cid) =>
          restoreUnindexed(cid)
          var ps = parentsOf.get(cid).getOrElse(Set.empty)
          obsoleteParents.get(cid).foreach(obs => ps = ps -- obs)
          parentsOf.append(cid, ps + parent, now())
          cid
      }
      lazyChildIds += cid
      Child.Lazy(cid): Child
    }

    // Children of the old node that are gone from the replacement.
    val removed: Set[Gid] = existing.children.map(childId).toSet -- lazyChildren.map(childId)

    // Obsolete-subtree fixpoint with diamond re-checking: a node is
    // obsolete if every parent is the swapped node or already obsolete.
    val obsolete = mutable.HashSet.empty[Gid]
    val remainingChildren = mutable.HashSet.empty[Gid]
    val candidates = mutable.Stack.from(removed)
    while (candidates.nonEmpty) {
      val cid = candidates.pop()
      val ps = parentsOf.getUnremoved(cid).getOrElse(idNotFound(cid, "swap-obsolete"))
      val isObsolete = ps.forall(p => p.id == id || obsolete.contains(p.id))
      if (isObsolete && !lazyChildIds.contains(cid)) {
        if (!obsolete.contains(cid)) {
          val n = nodes.getUnremoved(cid).getOrElse(idNotFound(cid, "swap-obsolete-node"))
          n.children.foreach(c => candidates.push(childId(c)))
          obsolete += cid
          remainingChildren -= cid
        }
      } else remainingChildren += cid
    }

    // Tombstone obsolete subtrees (still readable from the trash).
    obsolete.foreach { oid =>
      parentsOf.remove(oid, now())
      nodes.remove(oid, now())
    }

    // Children of obsolete nodes that survive via other parents lose
    // only their obsolete parent edges.
    remainingChildren.foreach { cid =>
      val kept = parentsOf.getUnremoved(cid).getOrElse(idNotFound(cid, "swap-remaining"))
        .filter(p =>
          obsoleteParents.get(cid).forall(obs => !obs.contains(p)) && !obsolete.contains(p.id))
      parentsOf.append(cid, kept, now())
    }

    // Prune edges from removed-but-live subtrees up to obsolete parents.
    val visited = mutable.HashSet.empty[Gid]
    val walk = mutable.Stack.from(removed -- obsolete)
    while (walk.nonEmpty) {
      val cid = walk.pop()
      visited += cid
      val ps = parentsOf.getUnremoved(cid).getOrElse(idNotFound(cid, "swap-prune"))
      val kept = ps.filter(p => !obsolete.contains(p.id) && p.id != id)
      if (kept.size != ps.size && obsolete.contains(cid))
        parentsOf.append(cid, kept, now())
      val n = nodes.getUnremoved(cid).getOrElse(idNotFound(cid, "swap-prune-node"))
      n.children.map(childId).foreach(c => if (!visited.contains(c)) walk.push(c))
    }

    nodes.append(id, replacement.withChildren(lazyChildren), now())
  }

  private def restoreUnindexed(id: Gid): RestoredNode = {
    val isRemoved = nodes.versions(id).lastOption
      .getOrElse(idNotFound(id, "restore")).isRemoved
    if (!isRemoved) return RestoredNode.NoNeedToRestore
    val node = nodes.getUnremoved(id).getOrElse(idNotFound(id, "restore"))
    nodes.append(id, node, now())
    parentsOf.append(id, Set.empty, now())
    node.children.zipWithIndex.foreach { case (c, index) =>
      val cid = childId(c)
      val base = restoreUnindexed(cid) match {
        case RestoredNode.Restored(_) => Set.empty[Parent]
        case RestoredNode.NoNeedToRestore =>
          parentsOf.getUnremoved(cid).getOrElse(idNotFound(cid, "restore-parents"))
      }
      parentsOf.append(cid, base + Parent(id, index), now())
    }
    RestoredNode.Restored(node)
  }

  // ------------------------------------------------------------------
  // Gram index build (index.rs:662-760) + incremental maintenance
  // ------------------------------------------------------------------

  /** Bottom-up gram index of the subtree at `id`, worklist-driven.
    * Accumulates into `state` (memoized across calls).
    */
  private def buildIndex(state: IndexState, start: Gid): Unit = {
    val visitedParents = mutable.HashSet.empty[Gid]
    val stack = mutable.Stack(start)
    while (stack.nonEmpty) {
      val id = stack.pop()
      if (!state.all.contains(id)) {
        val node = get(id).getOrElse(idNotFound(id, "index"))
        val children = node.children.map(childId)
        val resolved = children.flatMap { cid =>
          if (state.all.contains(cid)) Some(state.all(cid))
          else if (visitedParents.contains(cid)) Some(Grams.cyclicGrams)
          else None
        }
        if (resolved.length < children.length) {
          visitedParents += id
          stack.push(id)
          children.filterNot(c => state.all.contains(c) || visitedParents.contains(c))
            .distinct.foreach(stack.push)
        } else node match {
          case Node.Text(l) => state.all(id) = Grams.indexText(l)
          case Node.List(Layout.Chain, _) => state.all(id) = Grams.chainCombine(resolved)
          case Node.List(Layout.Page, _) | Node.Styled(Styles.Block(_), _) =>
            children.zip(resolved).foreach { case (cid, g) => state.blocks(cid) = g }
            state.all(id) = Grams.blockBoundaryGrams
          case Node.Styled(Styles.Span(_), _) => state.all(id) = resolved.head
        }
      }
    }
  }

  private def indexFrom(id: Gid): IndexState = {
    val s = new IndexState
    buildIndex(s, id)
    s
  }

  private def storeGrams(diff: GramDiff): Unit =
    diff.byGram.foreach { case (gram, occ) =>
      val merged = gramsSlot.get(gram).getOrElse(Map.empty) ++ occ
      gramsSlot.append(gram, merged, now())
    }

  private def storeCount(blocks: collection.Map[Gid, Array[Int]]): Unit =
    blocks.foreach { case (id, grams) => countsSlot.append(id, grams.length, now()) }

  /** The find kernel (index.rs:194-240). */
  private def find(grams: Array[Int], symmetric: Boolean): Vector[Overlap] = {
    val trimmed = if (symmetric) grams else Grams.trimForSearch(grams)
    if (!trimmed.exists(_ != 0)) return Vector.empty
    val sourceCount = trimmed.length
    val sourceOcc = Grams.occurrences(trimmed)
    val intersections = mutable.HashMap.empty[Gid, Int]
    for ((gram, sOcc) <- sourceOcc; matches <- gramsSlot.get(gram); (mid, mOcc) <- matches) {
      val inter = math.min(sOcc, mOcc)
      if (inter > 0) intersections(mid) = intersections.getOrElse(mid, 0) + inter
    }
    intersections.iterator.map { case (mid, inter) =>
      val matchCount =
        if (symmetric) countsSlot.get(mid)
          .getOrElse(throw new IllegalStateException(s"no count for $mid"))
        else sourceCount
      Overlap.create(mid, sourceCount.toLong, matchCount.toLong, inter.toLong)
    }.toVector
  }

  /** Ad-hoc term search (index.rs:173-184): asymmetric find over the
    * trimmed term grams, score ≥ 0.3, Overlap ordering.
    */
  def search(term: String): Vector[Overlap] =
    find(Grams.indexText(term), symmetric = false)
      .filter(_.score >= 0.3f)
      .sorted

  /** Materialized overlap list of a node (slot 4 point read). */
  def overlaps(id: Gid): Vector[Overlap] =
    overlapsSlot.get(id).getOrElse(idNotFound(id, "overlaps"))

  /** Maintain materialized symmetric overlaps for the dirty ids,
    * including reverse rows on every affected counterpart
    * (index.rs:302-347).
    */
  private def storeOverlaps(all: collection.Map[Gid, Array[Int]], ids: Set[Gid]): Unit =
    ids.foreach { id =>
      val grams = all.getOrElse(id, Array.empty[Int])
      val beforeList = overlapsSlot.get(id).getOrElse(Vector.empty)
      val afterList = find(grams, symmetric = true)
        .filter(o => o.id != id && o.score > 0.5f)
      val beforeSet = beforeList.toSet
      val afterSet = afterList.toSet
      (beforeSet -- afterSet).foreach { o =>
        val rev = o.reverse(id)
        val kept = overlapsSlot.get(o.id).getOrElse(Vector.empty).filterNot(_ == rev)
        overlapsSlot.append(o.id, kept, now())
      }
      (afterSet -- beforeSet).foreach { o =>
        val rev = o.reverse(id)
        val withRev = (overlapsSlot.get(o.id).getOrElse(Vector.empty) :+ rev).sorted
        overlapsSlot.append(o.id, withRev, now())
      }
      overlapsSlot.append(id, afterList.sorted, now())
    }

  /** Propagate index changes upward to the first block ancestor
    * (index.rs:242-284).
    */
  private def updateParentIndex(id: Gid, before: IndexState, after: IndexState): Unit = {
    val stack = mutable.Stack.from(
      parentsOf.getUnremoved(id).getOrElse(idNotFound(id, "updateParentIndex")))
    while (stack.nonEmpty) {
      val pid = stack.pop().id
      if (!(before.all.contains(pid) && after.all.contains(pid))) {
        buildIndex(before, pid)
        buildIndex(after, pid)
        val diff = GramDiff(before.blocks, after.blocks)
        val node = get(pid).getOrElse(idNotFound(pid, "updateParentIndex"))
        if (isBlock(node)) {
          storeCount(after.blocks)
          storeGrams(diff)
        } else {
          stack.pushAll(parentsOf.getUnremoved(pid).getOrElse(idNotFound(pid, "updateParentIndex")))
        }
        storeOverlaps(after.all, diff.ids)
      }
    }
  }

  // ------------------------------------------------------------------
  // Indexed mutations (index.rs:358-447)
  // ------------------------------------------------------------------

  /** Add a node tree, index it, and maintain overlaps. */
  def add(node: Node): Gid = {
    val id = addUnindexed(node)
    val after = indexFrom(id)
    val diff = GramDiff(Map.empty[Gid, Array[Int]], after.blocks)
    storeCount(after.blocks)
    storeGrams(diff)
    storeOverlaps(after.all, diff.ids)
    id
  }

  /** Replace a node in place, trash obsolete subtrees, reindex
    * incrementally, refresh overlaps, GC vanished counts/overlaps.
    */
  def swap(id: Gid, replacement: Node): Unit = {
    val before = indexFrom(id)
    swapUnindexed(id, replacement)
    val after = indexFrom(id)
    val diff = GramDiff(before.blocks, after.blocks)
    storeCount(after.blocks)
    storeGrams(diff)
    storeOverlaps(after.all, diff.ids)
    if (!GramDiff(before.all, after.all).isEmpty)
      updateParentIndex(id, before, after)
    (before.all.keySet -- after.all.keySet).foreach { removed =>
      countsSlot.remove(removed, now())
      overlapsSlot.remove(removed, now())
    }
  }

  /** Restore a trashed subtree and reindex it. */
  def restore(id: Gid): RestoredNode = {
    val restored = restoreUnindexed(id)
    restored match {
      case RestoredNode.Restored(_) =>
        val before = new IndexState
        val after = indexFrom(id)
        val diff = GramDiff(before.blocks, after.blocks)
        storeCount(after.blocks)
        storeGrams(diff)
        storeOverlaps(after.all, diff.ids)
        updateParentIndex(id, before, after)
      case RestoredNode.NoNeedToRestore =>
    }
    restored
  }

  // ------------------------------------------------------------------
  // Edit helpers (lib.rs:839-899) — all specializations of swap.
  // ------------------------------------------------------------------

  def update(id: Gid)(f: Vector[Child] => Vector[Child]): Unit =
    get(id).getOrElse(idNotFound(id, "update")) match {
      case Node.List(layout, children) => swap(id, Node.List(layout, f(children)))
      case n => throw new IllegalArgumentException(s"update expects a List node, got $n")
    }

  def remove(id: Gid, index: Int): Unit = update(id)(cs => cs.patch(index, Nil, 1))
  def replace(id: Gid, index: Int, child: Child): Unit = update(id)(_.updated(index, child))
  def insert(id: Gid, index: Int, child: Child): Unit = update(id)(cs => cs.patch(index, Seq(child), 0))
  def push(id: Gid, child: Child): Unit = update(id)(_ :+ child)

  // ------------------------------------------------------------------
  // Export / import with XOR namespacing (index.rs:456-655)
  // ------------------------------------------------------------------

  def exportBlob(id: Gid): (ExportBlob, Set[Gid]) = exportSince(id, 0L)

  /** Snapshot the subtree at `id` into a portable blob, keeping only
    * nodes modified after `since`; parents are filtered to the exported
    * id set; a synthetic root (nil id → Page[id]) is injected when the
    * subtree does not contain the root (index.rs:456-531).
    */
  def exportSince(id: Gid, since: Long): (ExportBlob, Set[Gid]) = {
    val collected = mutable.LinkedHashMap.empty[Gid, (Node, Set[Parent], Long)]
    val stack = mutable.Stack(id)
    while (stack.nonEmpty) {
      val cur = stack.pop()
      if (!collected.contains(cur)) {
        val node = get(cur).getOrElse(idNotFound(cur, "export"))
        val ps = parents(cur)
        val lastTs = nodes.versions(cur).last.ts
        node.children.foreach(c => stack.push(childId(c)))
        collected(cur) = (node, ps, lastTs)
      }
    }
    val ids = collected.keySet.toSet
    var nodeRows = Vector.newBuilder[(Gid, Node)]
    val parentRows = mutable.HashMap.empty[Gid, Set[Parent]]
    for ((nid, (node, ps, lastTs)) <- collected.toVector.sortBy(_._1)) {
      if (lastTs > since) {
        nodeRows += (nid -> node)
        parentRows(nid) = ps.filter(p => ids.contains(p.id))
      }
    }
    if (!ids.contains(Gid.root)) {
      parentRows(id) = Set(Parent(Gid.root, 0))
      nodeRows += (Gid.root -> Node.List(Layout.Page, Vector(Child.Lazy(id))))
      parentRows(Gid.root) = Set.empty
    }
    (ExportBlob(nodeRows.result(), parentRows.toMap), ids)
  }

  /** Append an exported blob, XOR-ing every id (nodes, children,
    * parents) with `namespace` to prevent collisions, then reindex the
    * imported subtrees incrementally (index.rs:551-629).
    */
  def importBlob(blob: ExportBlob, namespace: Gid): Unit = {
    val before = new IndexState
    val idsExported = blob.nodes.map(_._1)
    val idsImported = idsExported.map(_.xor(namespace))
    idsImported.foreach { iid =>
      if (nodes.versions(iid).nonEmpty) buildIndex(before, iid)
    }
    for ((eid, node) <- blob.nodes) {
      val mapped = node.withChildren(node.children.map {
        case Child.Lazy(c)  => Child.Lazy(c.xor(namespace)): Child
        case e              => e
      })
      val iid = eid.xor(namespace)
      nodes.append(iid, mapped, now())
      val ps = blob.parents.getOrElse(eid, Set.empty)
        .map(p => Parent(p.id.xor(namespace), p.index))
      parentsOf.append(iid, ps, now())
    }
    val after = new IndexState
    idsImported.foreach(buildIndex(after, _))
    val diff = GramDiff(before.blocks, after.blocks)
    storeCount(after.blocks)
    storeGrams(diff)
    storeOverlaps(after.all, diff.ids)
    if (!GramDiff(before.all, after.all).isEmpty)
      idsImported.foreach(iid => updateParentIndex(iid, before, after))
  }

  private[core] def nowTs(): Long = now()

  // ------------------------------------------------------------------
  // Raw slot restore (snapshot load path, graft.bulk.Persistence):
  // direct writes that bypass indexing — the caller supplies already-
  // consistent slot contents.
  // ------------------------------------------------------------------

  def restoreRaw(id: Gid, node: Node, ps: Set[Parent]): Unit = {
    nodes.append(id, node, now())
    parentsOf.append(id, ps, now())
  }
  def restoreGrams(gram: Int, postings: Map[Gid, Int]): Unit =
    gramsSlot.append(gram, postings, now())
  def restoreCount(id: Gid, cnt: Int): Unit = countsSlot.append(id, cnt, now())
  def restoreOverlaps(id: Gid, os: Vector[Overlap]): Unit =
    overlapsSlot.append(id, os, now())
}

/** Portable export container: node rows (ordered by id) plus parent
  * sets — the engine's analog of the reference's MemoryStorage byte
  * blob. The bulk path persists the same shape as parquet.
  */
final case class ExportBlob(nodes: Vector[(Gid, Node)], parents: Map[Gid, Set[Parent]]) {
  def isEmpty: Boolean = nodes.isEmpty && parents.isEmpty
  def ids: Vector[Gid] = nodes.map(_._1)
}
