package graft

import graft.bulk.{GraphOps, VersionedTable}
import graft.core.GraftDb
import graft.model.{Child, Layout, Node}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The bulk (DataFrame) forms of the graph traversals and the
  * versioned-table substrate, tested against the serving-path GraftDb
  * as the executable specification.
  */
class BulkGraphSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-bulk-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def builtDb(): (GraftDb, graft.model.Gid) = {
    val db = new GraftDb
    val shared = db.add(Node.Text("shared leaf"))
    val c1 = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(shared))))
    val c2 = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(shared))))
    val diamond = db.add(Node.List(Layout.Chain, Vector(Child.Lazy(c1), Child.Lazy(c2))))
    val page = db.add(Node.page(
      Node.Text("one"),
      Node.styledSpan("BOLD", Node.Text("two")),
      Node.styledBlock("HEADING", Node.Text("three"))))
    val root = db.add(Node.List(Layout.Page, Vector(Child.Lazy(diamond), Child.Lazy(page))))
    // a cycle: page → chain → page
    db.push(page, Child.Eager(Node.List(Layout.Chain, Vector(Child.Lazy(page)))))
    (db, root)
  }

  test("bulk descendants equals serving-path descendants on every root") {
    val (db, root) = builtDb()
    val (_, edges) = GraphOps.tablesFrom(db, spark)
    // pin the DISTRIBUTED frontier BFS (the fused broadcast walk is
    // covered by FusedGraphSpec's regime-identity cases)
    spark.conf.set("spark.graft.fusedGraphCap", "0")
    try {
      for (start <- Seq(root) ++ db.nodes.liveKeys.take(5)) {
        val bulk = GraphOps.descendants(edges, start.toString)
          .collect().map(_.getString(0)).toSet
        val serving = db.descendants(start).map(_.toString)
        assert(bulk === serving, s"descendants mismatch for $start")
      }
    } finally spark.conf.unset("spark.graft.fusedGraphCap")
  }

  test("bulk isCyclic and hasSharedDescendants equal the serving path on every root") {
    val (db, root) = builtDb()
    val (_, edges) = GraphOps.tablesFrom(db, spark)
    for (start <- Seq(root) ++ db.nodes.liveKeys.toSeq) {
      assert(GraphOps.isCyclic(edges, start.toString) === db.isCyclic(start),
        s"isCyclic mismatch for $start")
      assert(
        GraphOps.hasSharedDescendantsUntilLinks(edges, start.toString) ===
          db.hasSharedDescendantsUntilLinks(start),
        s"hasShared mismatch for $start")
    }
  }

  test("bulk link-aware descendants equals serving-path descendantsUntilLinks") {
    val (db, root) = builtDb()
    val (nodes, edges) = GraphOps.tablesFrom(db, spark)
    for (start <- Seq(root) ++ db.nodes.liveKeys.take(4)) {
      val bulk = GraphOps.descendantsUntilLinks(nodes, edges, start.toString)
        .collect().map(_.getString(0)).toSet
      val serving = db.descendantsUntilLinks(start).map(_.toString)
      assert(bulk === serving, s"descendantsUntilLinks mismatch for $start")
    }
  }

  test("bulk span classification equals serving-path isSpan") {
    val (db, _) = builtDb()
    val (nodes, edges) = GraphOps.tablesFrom(db, spark)
    val bulk = GraphOps.spanClass(nodes, edges)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    for (id <- db.nodes.liveKeys) {
      assert(bulk(id.toString) === db.isSpan(db.get(id).get), s"isSpan mismatch for $id")
    }
  }

  test("versioned table transforms mirror slot-store semantics") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      // key a: two live versions
      ("a", 1L, false, "a-v1"),
      ("a", 5L, false, "a-v2"),
      // key b: tombstoned
      ("b", 2L, false, "b-v1"),
      ("b", 6L, true, "b-v1"),
      // key c: tombstoned then restored
      ("c", 3L, false, "c-v1"),
      ("c", 4L, true, "c-v1"),
      ("c", 7L, false, "c-v2"))
      .toDF("key", "version_ts", "is_removed", "payload")

    val latest = VersionedTable.latest(rows, "key")
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(latest === Map("a" -> "a-v2", "c" -> "c-v2"))

    val unremoved = VersionedTable.unremoved(rows, "key")
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(unremoved === Map("a" -> "a-v2", "b" -> "b-v1", "c" -> "c-v2"))

    val asOf5 = VersionedTable.asOf(rows, 5L, "key")
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    // c is in the trash as of ts=5 (tombstone at ts=4)
    assert(asOf5 === Map("a" -> "a-v2", "b" -> "b-v1"))

    assert(VersionedTable.liveKeys(rows, "key").collect().map(_.getString(0)).sorted
      === Array("a", "c"))

    val compacted = VersionedTable.compact(rows, "key")
    assert(compacted.count() === 2)
    // compaction output is a valid versioned table with same reads
    val latestAfter = VersionedTable.latest(compacted, "key")
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(latestAfter === latest)
  }
}
