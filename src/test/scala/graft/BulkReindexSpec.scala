package graft

import graft.bulk.{GramIndex, GraphOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bulk incremental reindex: gram-diff delta maintenance
  * (Diff::new index.rs:768-813 + store_grams index.rs:286-300) and the
  * write-path parent propagation (update_parent_index,
  * index.rs:242-284).
  */
class BulkReindexSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-reindex-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def postingsSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("delta-maintained postings equal a rebuild from scratch (update+delete+insert)") {
    import spark.implicits._
    val before = Seq(
      (1L, "hello world"), (2L, "foo bar baz"), (3L, "delete me"), (4L, "stays the same"))
      .toDF("doc_id", "text")
    val after = Seq(
      (1L, "hello brave world"), (2L, "foo bar baz"), (4L, "stays the same"),
      (5L, "brand new document"))
      .toDF("doc_id", "text")
    val beforeP = GramIndex.postings(before, "doc_id", "text")
    val dirtyOld = Seq(1L, 3L).toDF("id") // updated + deleted
    val dirtyNewDocs = after.filter(col("doc_id").isin(1L, 5L)) // updated + inserted
    val diff = GramIndex.gramDiff(
      beforeP.join(dirtyOld, Seq("id")),
      GramIndex.postings(dirtyNewDocs, "doc_id", "text"))
    val maintained = GramIndex.applyGramDiff(beforeP, diff)
    val rebuilt = GramIndex.postings(after, "doc_id", "text")
    assert(postingsSet(maintained) === postingsSet(rebuilt))
    assert(maintained.filter(col("occurrences") <= 0).isEmpty, "no zero tombstones")
  }

  test("no-op diff leaves postings unchanged") {
    import spark.implicits._
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val p = GramIndex.postings(docs, "doc_id", "text")
    val dirty = Seq(1L).toDF("id")
    val diff = GramIndex.gramDiff(
      p.join(dirty, Seq("id")),
      GramIndex.postings(docs.filter(col("doc_id") === 1L), "doc_id", "text"))
    assert(postingsSet(GramIndex.applyGramDiff(p, diff)) === postingsSet(p))
  }

  test("parent propagation ascends through spans and stops at blocks") {
    import spark.implicits._
    // t1 ← chain C1 (span) ← page P1 (block) ← page P2: ascent from t1
    // reaches C1 and P1 but never P2. t3 ← styled-span S1 ← page P3:
    // reaches S1 and P3. t2 is parentless.
    val nodes = Seq(
      ("t1", "TEXT", null, null), ("t2", "TEXT", null, null), ("t3", "TEXT", null, null),
      ("C1", "LIST", "CHAIN", null), ("P1", "LIST", "PAGE", null),
      ("P2", "LIST", "PAGE", null), ("P3", "LIST", "PAGE", null),
      ("S1", "STYLED", null, "SPAN"))
      .toDF("id", "kind", "layout", "style_kind")
    val edges = Seq(
      ("C1", "t1", 0), ("P1", "C1", 0), ("P2", "P1", 0),
      ("S1", "t3", 0), ("P3", "S1", 0))
      .toDF("parent_id", "child_id", "child_index")
    val dirty = Seq("t1", "t2", "t3").toDF("id")
    val reached = GraphOps.dirtyPropagation(nodes, edges, dirty)
      .collect().map(_.getString(0)).toSet
    assert(reached === Set("t1", "t2", "t3", "C1", "P1", "S1", "P3"))
  }
}
