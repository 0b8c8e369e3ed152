package graft

import graft.bulk.{GraphOps, ImportExport}
import graft.core.GraftDb
import graft.model.{Child, Gid, Layout, Node}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed export / XOR-namespace import
  * ([[graft.bulk.ImportExport]]) against the serving path
  * (GraftDb.exportBlob / exportSince / importBlob) as the executable
  * specification — reference semantics
  * assemblage_db/src/index.rs:456-655, tests/import_export.rs:16-93.
  */
class BulkImportSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-bulk-import-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The import_export.rs:16-61 shape: two exported children (one
    * nested chain with a shared descendant), nodes outside the subtree
    * that must not travel, a parent outside the subtree that must be
    * filtered from the exported parent sets.
    */
  private def builtDb(): (GraftDb, Gid) = {
    val db = new GraftDb
    db.add(Node.Text("not exported"))
    val child1 = db.add(Node.Text("should be exported"))
    val descendant = db.add(Node.Text("exported"))
    val child2 = db.add(Node.List(Layout.Chain, Vector(
      Child.Eager(Node.Text("should ")),
      Child.Eager(Node.Text("also ")),
      Child.Eager(Node.Text("be ")),
      Child.Eager(Node.List(Layout.Chain, Vector(Child.Lazy(descendant)))))))
    val exported = db.add(Node.List(Layout.Page, Vector(
      Child.Lazy(child1), Child.Lazy(child2))))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(child2)))) // outside parent
    db.add(Node.Text("also not exported"))
    (db, exported)
  }

  /** Flatten the serving db into the bulk frames plus a last_ts column
    * (exportSince's modified-row filter input).
    */
  private def framesWithTs(db: GraftDb) = {
    import spark.implicits._
    val (nodes, edges) = GraphOps.tablesFrom(db, spark)
    val ts = db.nodes.liveKeys.map(id => id.toString -> db.nodes.versions(id).last.ts)
      .toVector.toDF("id", "last_ts")
    (nodes.join(ts, Seq("id")), edges)
  }

  /** Run the serving import into a fresh db and the bulk import over
    * the same export, and assert node rows, child lists and parent
    * sets match id-for-id.
    */
  private def assertImportParity(db: GraftDb, seedId: Gid, ns: Gid, since: Long = Long.MinValue): Unit = {
    import spark.implicits._
    val (blob, _) = if (since == Long.MinValue) db.exportBlob(seedId) else db.exportSince(seedId, since)
    val target = new GraftDb
    // An incremental blob lands on top of a prior full import
    // (import_export.rs:145-210) — its node references resolve against
    // the base; the parity below then checks the target's LATEST state
    // for the incrementally imported ids (versioned store: the
    // incremental append wins).
    if (since != Long.MinValue) target.importBlob(db.exportBlob(seedId)._1, ns)
    target.importBlob(blob, ns)
    val importedIds = blob.nodes.map(_._1.xor(ns)).toSet

    val (nodes, edges) = framesWithTs(db)
    val exported = ImportExport.exportSubgraph(
      nodes, edges, Seq(seedId.toString).toDF("id"), lit(Gid.root.toString), since)
    val imp = ImportExport.importNamespaced(exported, ImportExport.xorGidString(ns))

    val bulkIds = imp.nodes.select("id").collect().map(_.getString(0)).toSet
    assert(bulkIds === importedIds.map(_.toString), "imported node id sets differ")

    val bulkChildren = imp.children.collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val servingChildren = importedIds.flatMap { iid =>
      target.get(iid).toSet[Node].flatMap(_.children.zipWithIndex.collect {
        case (Child.Lazy(c), i) => (iid.toString, c.toString, i)
      })
    }
    assert(bulkChildren === servingChildren, "imported child lists differ")

    val bulkParents = imp.parents.collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val servingParents = importedIds.flatMap { iid =>
      target.parents(iid).map(p => (iid.toString, p.id.toString, p.index))
    }
    assert(bulkParents === servingParents, "imported parent sets differ")
  }

  test("bulk import equals serving importBlob on the reference export graph") {
    val (db, exported) = builtDb()
    assertImportParity(db, exported, Gid(0x1234567890abcdefL, 0x0fedcba098765432L))
  }

  test("synthetic root hangs the import off the target root (import_export.rs:84-89)") {
    import spark.implicits._
    val (db, exported) = builtDb()
    val ns = Gid(7L, 13L)
    val (nodes, edges) = framesWithTs(db)
    val bulk = ImportExport.exportSubgraph(
      nodes, edges, Seq(exported.toString).toDF("id"), lit(Gid.root.toString))
    val imp = ImportExport.importNamespaced(bulk, ImportExport.xorGidString(ns))
    // the exported root's sole parent is the remapped synthetic root,
    // at child index 0
    val rootParents = imp.parents.filter(col("id") === exported.xor(ns).toString)
      .collect().map(r => (r.getString(1), r.getInt(2))).toSet
    assert(rootParents === Set((ns.toString, 0)))
    // and the synthetic root itself has no parents
    assert(imp.parents.filter(col("id") === ns.toString).isEmpty)
  }

  test("cyclic seed: the synthetic-root override replaces closure-internal parents") {
    // page → chain → page: exporting `page` puts its own parent (the
    // chain) inside the closure; the serving path overrides the seed's
    // parent set with {(root, 0)} (index.rs:512-528) and the bulk path
    // must do the same, while the chain's CHILD list keeps the cycle.
    val db = new GraftDb
    val page = db.add(Node.page(Node.Text("cyclic")))
    db.push(page, Child.Eager(Node.List(Layout.Chain, Vector(Child.Lazy(page)))))
    assertImportParity(db, page, Gid(0x42L, 0x4242L))
  }

  test("export_since carries only modified rows but full-closure parents") {
    import spark.implicits._
    val (db, exported) = builtDb()
    val since = db.lastUpdated.get
    // modify one exported node after the cutoff: its row (and child
    // list) travels, unmodified subtree members do not
    val child1 = db.get(exported).get.children.collect {
      case Child.Lazy(c) => c
    }.head
    db.swap(child1, Node.Text("modified after cutoff"))
    val (blob, _) = db.exportSince(exported, since)
    assert(blob.nodes.nonEmpty && blob.nodes.size < db.descendants(exported).size,
      "incremental export should be a strict subset")
    assertImportParity(db, exported, Gid(0x77L, 0x99L), since)
  }
}
