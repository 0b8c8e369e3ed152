package graft.bulk

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed `restore` (SURVEY §2.2; reference
  * `assemblage_db/src/core.rs:552-594` restore_unindexed): un-tombstone
  * a node and its trashed subtree, rebuilding parent edges as the walk
  * descends.
  *
  * The serving recursion ([[graft.core.GraftDb.restore]]) descends
  * child-by-child, restoring REMOVED children and stopping at live
  * ones (their subtrees are untouched; they only gain the parent edge
  * from their restored parent). The distributed form states the same
  * least fixpoint:
  *
  *   - restored = the reachability closure of the seed over the
  *     unremoved child lists, CONTINUING only through tombstoned
  *     nodes — a frontier BFS (per-round shuffle = frontier-sized;
  *     cycle-safe via the visited anti-join, like the serving
  *     recursion's not-removed-anymore re-entry stop).
  *   - parent rebuild (core.rs:577-592): every restored node's parent
  *     set is RESET to exactly the incoming edges from restored
  *     parents (the restore root, having none, ends empty — the
  *     caller re-attaches it); a live child of a restored parent keeps
  *     its unremoved parent set and gains the incoming edges.
  *
  * Index maintenance after the restore (core.rs:598-612: gram diff,
  * counts, overlaps, parent index over the restored subtree) is the
  * q69 reindex pipeline applied to the restored rows, as with imports.
  */
object Restore {

  /** `restored`: ids un-tombstoned (re-append their unremoved content
    * as the new live version). `affected`: ids whose parent set is
    * REPLACED by the `parents` rows (an affected id with no rows has
    * the empty set). Ids outside `affected` are untouched.
    */
  final case class RestoreResult(restored: DataFrame, affected: DataFrame, parents: DataFrame)

  /** @param removed  `(id, is_removed)` — latest-version tombstone flag
    *                 per id (VersionedTable.latest).
    * @param edges    `(parent_id, child_id, child_index)` — child lists
    *                 of the UNREMOVED node contents (trash-readable,
    *                 VersionedTable.unremoved), since a tombstoned
    *                 node's children come from its pre-removal state.
    * @param parents  `(id, parent_id, child_index)` — unremoved parent
    *                 sets.
    * @param seed     `(id)` — restore roots. A live seed restores
    *                 nothing (core.rs:561-563 NoNeedToRestore).
    */
  def restoreClosure(
      removed: DataFrame,
      edges: DataFrame,
      parents: DataFrame,
      seed: DataFrame): RestoreResult = {
    val removedIds = removed.filter(col("is_removed")).select(col("id")).localCheckpoint()
    val e = edges.select(col("parent_id"), col("child_id"), col("child_index")).cache()
    // frontier pieces checkpointed, visited set stays a lazy union
    // (the repo-wide fixpoint rule — see GraphOps.descendantsFrom)
    var visitedParts = Vector(
      seed.select(col("id")).join(removedIds, Seq("id"), "left_semi").localCheckpoint())
    var frontier = visitedParts.head
    while (!frontier.isEmpty) {
      val next = e.join(frontier, e("parent_id") === frontier("id"))
        .select(col("child_id").as("id"))
        .distinct()
        .join(removedIds, Seq("id"), "left_semi")
        .join(visitedParts.reduce(_ unionByName _), Seq("id"), "left_anti")
        .localCheckpoint()
      visitedParts :+= next
      frontier = next
    }
    val restored = visitedParts.reduce(_ unionByName _)
    val incoming = e
      .join(restored.withColumnRenamed("id", "parent_id"), Seq("parent_id"), "left_semi")
      .select(col("child_id").as("id"), col("parent_id"), col("child_index"))
    val affectedChildren = incoming.select(col("id")).distinct()
    // live children keep their unremoved parent sets; restored nodes
    // reset to exactly the incoming restored edges (set semantics — an
    // incoming edge already present in a kept set dedupes)
    val keptBase = parents
      .join(affectedChildren, Seq("id"), "left_semi")
      .join(restored, Seq("id"), "left_anti")
    val newParents = keptBase
      .select(col("id"), col("parent_id"), col("child_index"))
      .unionByName(incoming).distinct()
    val affected = restored.unionByName(affectedChildren).distinct()
    e.unpersist()
    RestoreResult(restored, affected, newParents)
  }
}
