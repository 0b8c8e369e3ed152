package graft

import graft.bulk.Restore
import graft.core.GraftDb
import graft.model.{Child, Gid, Layout, Node}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The distributed restore ([[graft.bulk.Restore]]) against the
  * serving GraftDb.restore as the executable specification — reference
  * semantics assemblage_db/src/core.rs:552-594 (restore_unindexed) on
  * graphs with trashed subtrees.
  */
class BulkRestoreSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-bulk-restore-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Snapshot the versioned node/parents slots into the bulk input
    * frames (tombstone flags, trash-readable child lists, unremoved
    * parent sets).
    */
  private def bulkInputs(db: GraftDb) = {
    import spark.implicits._
    val keys = db.nodes.allKeys.toVector
    val removed = keys
      .map(id => (id.toString, db.nodes.versions(id).last.isRemoved))
      .toDF("id", "is_removed")
    val edges = keys.flatMap { id =>
      db.nodes.getUnremoved(id).toVector.flatMap(_.children.zipWithIndex.collect {
        case (Child.Lazy(c), i) => (id.toString, c.toString, i)
      })
    }.toDF("parent_id", "child_id", "child_index")
    val parents = keys.flatMap { id =>
      db.parentsOf.getUnremoved(id).getOrElse(Set.empty)
        .map(p => (id.toString, p.id.toString, p.index))
    }.toDF("id", "parent_id", "child_index")
    (removed, edges, parents)
  }

  /** Run the bulk restore on the pre-restore snapshot and the serving
    * restore on the db, then assert: the restored id sets match, the
    * restored contents are the pre-restore trash reads, the affected
    * parent sets equal the serving post-state, and nothing outside the
    * affected set moved.
    */
  private def assertRestoreParity(db: GraftDb, seedId: Gid, clue: String): Unit = {
    import spark.implicits._
    val (removed, edges, parents) = bulkInputs(db)
    val allIds = db.nodes.allKeys.toVector
    val preRemoved = allIds.filter(id => db.nodes.versions(id).last.isRemoved).toSet
    val preTrashContent = preRemoved.map(id => id -> db.getInTrash(id)).toMap
    val preParents = allIds.map(id =>
      id.toString -> db.parentsOf.getUnremoved(id).getOrElse(Set.empty)
        .map(p => (p.id.toString, p.index))).toMap

    val res = Restore.restoreClosure(removed, edges, parents, Seq(seedId.toString).toDF("id"))
    db.restore(seedId)

    val servingRestored = preRemoved.filter(id => !db.nodes.versions(id).last.isRemoved)
    val bulkRestored = res.restored.collect().map(_.getString(0)).toSet
    assert(bulkRestored === servingRestored.map(_.toString), s"$clue: restored set")
    for (id <- servingRestored)
      assert(db.get(id) === preTrashContent(id), s"$clue: restored content of $id")

    val affected = res.affected.collect().map(_.getString(0)).toSet
    val bulkParents = res.parents.collect()
      .map(r => (r.getString(0), (r.getString(1), r.getInt(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (idStr <- affected) {
      val servingSet = db.parents(Gid.parse(idStr)).map(p => (p.id.toString, p.index))
      assert(bulkParents.getOrElse(idStr, Set.empty) === servingSet,
        s"$clue: parents of affected $idStr")
    }
    for (id <- allIds if !affected.contains(id.toString)) {
      val post = db.parentsOf.getUnremoved(id).getOrElse(Set.empty)
        .map(p => (p.id.toString, p.index))
      assert(post === preParents(id.toString), s"$clue: untouched parents of $id moved")
    }
  }

  test("restoring a trashed subtree un-tombstones it and rebuilds parent edges") {
    val db = new GraftDb
    val leaf = db.add(Node.Text("leaf"))
    val mid = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(leaf))))
    val page = db.add(Node.page(Node.Text("keep"), Node.Text("drop-me")))
    db.push(page, Child.Lazy(mid))
    db.remove(page, 2) // trashes mid + leaf (no outside parents)
    assert(db.get(mid).isEmpty && db.getInTrash(mid).isDefined)
    assertRestoreParity(db, mid, "subtree")
  }

  test("restore stops at live children, which only gain the parent edge (core.rs:577-592)") {
    val db = new GraftDb
    val shared = db.add(Node.Text("shared"))
    val keeper = db.add(Node.List(Layout.Page, Vector(Child.Lazy(shared))))
    val trashed = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(shared))))
    val root = db.add(Node.List(Layout.Page, Vector(Child.Lazy(keeper), Child.Lazy(trashed))))
    db.remove(root, 1) // `shared` survives via keeper; only `trashed` is tombstoned
    assert(db.get(trashed).isEmpty && db.get(shared).isDefined)
    assertRestoreParity(db, trashed, "live-child")
  }

  test("restoring a live node is a no-op (NoNeedToRestore)") {
    import spark.implicits._
    val db = new GraftDb
    val live = db.add(Node.Text("live"))
    val (removed, edges, parents) = bulkInputs(db)
    val res = Restore.restoreClosure(removed, edges, parents, Seq(live.toString).toDF("id"))
    assert(res.restored.isEmpty && res.affected.isEmpty && res.parents.isEmpty)
  }

  test("random DAGs with random trashing: full restore parity (seeded)") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 4) {
      val db = new GraftDb
      var pool = Vector.tabulate(5)(i => db.add(Node.Text(s"t$trial-$i")))
      val containers = Vector.newBuilder[Gid]
      for (_ <- 1 to 10) {
        val kids = Vector.fill(1 + rnd.nextInt(3))(pool(rnd.nextInt(pool.length)))
          .map(Child.Lazy(_): Child)
        val node = rnd.nextInt(4) match {
          case 0 => Node.List(Layout.Chain, kids)
          case 1 => Node.styledSpan("BOLD", Node.List(Layout.Chain, kids))
          case _ => Node.List(Layout.Page, kids)
        }
        val id = db.add(node)
        containers += id
        pool :+= id
      }
      // randomly drop child slots to populate the trash
      for (cid <- rnd.shuffle(containers.result()).take(4)) {
        db.get(cid) match {
          case Some(Node.List(_, cs)) if cs.nonEmpty => db.remove(cid, rnd.nextInt(cs.size))
          case _ => ()
        }
      }
      val trashed = db.nodes.allKeys.filter(id => db.nodes.versions(id).last.isRemoved).toVector
      trashed.sorted.headOption.foreach { seed =>
        assertRestoreParity(db, seed, s"random-$trial")
      }
    }
  }
}
