package graft.core

import graft.index.Grams
import graft.model.Gid

import scala.collection.mutable

/** Bottom-up gram index of a subtree with an explicit worklist instead
  * of recursion, mirroring assemblage_db/src/index.rs:662-760:
  *
  *   - Text nodes tokenize to byte 4-grams;
  *   - Chain lists combine children by OR-overlaying the 3 boundary
  *     grams (index.rs:721-744) so concatenated text indexes like
  *     contiguous text;
  *   - Page lists / Styled(Block) nodes split their children into
  *     separately indexed *blocks* (index.rs:745-750) and themselves
  *     index as the [0,0,0] boundary;
  *   - Styled(Span) passes its child's grams through;
  *   - children that close a cycle contribute [0,0,0] (index.rs:683).
  *
  * `all` memoizes every visited node's gram sequence; `blocks` holds
  * only block-level entries — the reference's indexing policy: only
  * blocks reachable as children of Page lists / Styled(Block) get
  * posted (index.rs:745-750).
  */
final class IndexState {
  val all: mutable.HashMap[Gid, Array[Int]] = mutable.HashMap.empty
  val blocks: mutable.HashMap[Gid, Array[Int]] = mutable.HashMap.empty
}

/** Gram-multiset delta between two index states
  * (assemblage_db/src/index.rs:768-813): per (gram, id) the new
  * occurrence count, with 0 marking a vanished posting.
  */
final class GramDiff(val byGram: Map[Int, Map[Gid, Int]]) {
  def ids: Set[Gid] = byGram.valuesIterator.flatMap(_.keysIterator).toSet
  def isEmpty: Boolean = byGram.isEmpty
}

object GramDiff {
  def apply(
      before: collection.Map[Gid, Array[Int]],
      after: collection.Map[Gid, Array[Int]]): GramDiff = {
    val diff = mutable.HashMap.empty[Int, mutable.HashMap[Gid, Int]]
    def entry(g: Int) = diff.getOrElseUpdate(g, mutable.HashMap.empty)
    val allIds = before.keySet ++ after.keySet
    for (id <- allIds) {
      (before.get(id), after.get(id)) match {
        case (Some(gramsBefore), Some(gramsAfter)) =>
          val occAfter = mutable.HashMap.empty[Int, Int]
          for (g <- gramsAfter) occAfter(g) = occAfter.getOrElse(g, 0) + 1
          for (g <- gramsBefore; if !occAfter.contains(g)) entry(g)(id) = 0
          for ((g, occ) <- occAfter) entry(g)(id) = occ
        case (None, Some(grams)) =>
          for (g <- grams) {
            val e = entry(g)
            e(id) = e.getOrElse(id, 0) + 1
          }
        case (Some(grams), None) =>
          for (g <- grams) entry(g)(id) = 0
        case (None, None) =>
      }
    }
    new GramDiff(diff.view.mapValues(_.toMap).toMap)
  }
}
