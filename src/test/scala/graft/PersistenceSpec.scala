package graft

import graft.bulk.Persistence
import graft.core.GraftDb
import graft.model.{Child, Gid, Layout, Node}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Save/load round-trip through the parquet slot tables: the engine's
  * durability path (the reference's "persist across merge + reopen"
  * tests, re-expressed over parquet).
  */
class PersistenceSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-persistence-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("full slot round-trip preserves reads, search, overlaps, and tiles") {
    val db = new GraftDb
    val fooId = db.add(Node.Text("This is a sentence about foo."))
    val barId = db.add(Node.Text("This is a sentence about bar."))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(fooId))))
    val pageBarId = db.add(Node.List(Layout.Page, Vector(Child.Lazy(barId))))
    db.push(Gid.root, Child.Lazy(pageBarId))
    db.swap(barId, Node.Text("This is a sentence about qux."))
    db.merge()

    val dir = java.nio.file.Files.createTempDirectory("graft-persist").toString
    Persistence.save(db, spark, dir)
    val loaded = Persistence.load(spark, dir)

    // node + parent reads
    for (id <- db.nodes.liveKeys) {
      assert(loaded.get(id) === db.get(id), s"node mismatch for $id")
      assert(loaded.parents(id) === db.parents(id), s"parents mismatch for $id")
    }
    // search results identical
    for (term <- Seq("sentence about", "foo", "qux"))
      assert(loaded.search(term) === db.search(term), s"search mismatch for '$term'")
    // materialized overlaps identical
    assert(loaded.overlaps(fooId) === db.overlaps(fooId))
    assert(loaded.overlaps(barId) === db.overlaps(barId))
    // tiles render identically
    val tileBefore = new graft.view.View(db).tile(pageBarId)
    val tileAfter = new graft.view.View(loaded).tile(pageBarId)
    assert(tileAfter.preview === tileBefore.preview)
    assert(tileAfter.sections === tileBefore.sections)
    // the persisted postings feed the bulk search pipeline
    val bulkHits = graft.bulk.GramIndex.search(
      Persistence.postingsFrom(spark, dir), "sentence about")
      .collect().map(_.getString(0)).toSet
    assert(bulkHits.nonEmpty)
  }

  test("mutations continue after load") {
    val db = new GraftDb
    val textId = db.add(Node.Text("before save"))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(textId))))
    val dir = java.nio.file.Files.createTempDirectory("graft-persist2").toString
    Persistence.save(db, spark, dir)

    val loaded = Persistence.load(spark, dir)
    val newId = loaded.add(Node.Text("added after load"))
    loaded.add(Node.List(Layout.Page, Vector(Child.Lazy(newId))))
    assert(loaded.search("added after load").exists(_.id == newId))
    loaded.swap(textId, Node.Text("replaced after load"))
    assert(loaded.search("replaced after load").exists(_.id == textId))
  }

  test("purge deletes the storage backing; a reopened store is fresh; missing dir is a no-op") {
    val db = new GraftDb
    db.add(Node.Text("doomed content"))
    val dir = java.nio.file.Files.createTempDirectory("graft-purge").toString
    Persistence.save(db, spark, dir)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))
    Persistence.purge(dir)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))
    Persistence.purge(dir) // idempotent on missing storage
    val fresh = new GraftDb
    val id = fresh.add(Node.Text("new life"))
    Persistence.save(fresh, spark, dir)
    assert(Persistence.load(spark, dir).get(id) === fresh.get(id))
  }

  test("load refuses snapshots beyond the driver-side node cap") {
    val db = new GraftDb
    val t = db.add(Node.Text("guarded"))
    db.add(Node.List(Layout.Page, Vector(Child.Lazy(t))))
    val dir = java.nio.file.Files.createTempDirectory("graft-persist3").toString
    Persistence.save(db, spark, dir)
    val e = intercept[IllegalArgumentException](
      Persistence.load(spark, dir, maxNodes = 1L))
    assert(e.getMessage.contains("maxNodes"))
    // the default cap loads it fine
    assert(Persistence.load(spark, dir).get(t).contains(Node.Text("guarded")))
  }
}
