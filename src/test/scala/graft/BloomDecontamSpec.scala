package graft

import graft.ops.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curation.decontaminateBloom — the Bloom-membership form of exact
  * decontamination: exact columns must equal decontaminate's, the
  * per-doc completeness gate must hold (a Bloom filter has no false
  * negatives), and the FP gate must be computed, not constant.
  */
class BloomDecontamSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-bloomdecontam-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()

  private def frames = {
    val s = spark
    import s.implicits._
    val evalSet = Seq(
      (100L, "which ocean borders the republic of chile"),
      (101L, "name the longest river in western europe")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "which ocean borders the republic of chile answer pacific"), // contaminated
      (2L, "a completely unrelated training document body"),
      (3L, "another clean document with original phrasing"),
      (4L, "name the longest river in western europe loire trivia")     // contaminated
    ).toDF("doc_id", "text")
    (corpus, evalSet)
  }

  test("exact columns match decontaminate; bloom covers every exact flag; gates pass") {
    val (corpus, evalSet) = frames
    // fpp 1e-12: at a 10-item toy vocabulary the default 1e-6 sizing
    // is a ~300-bit filter, small enough that a DETERMINISTIC false
    // positive exists for this corpus (verified by a driver-built
    // twin) — real-corpus sizing makes the rate real, the toy needs
    // the tighter sizing for an FP-free assertion
    val r = Curation.decontaminateBloom(corpus, evalSet, "doc_id", "text", k = 3,
      fpp = 1e-12)
      .collect().map(x => x.getLong(0) -> x).toMap
    val ex = Curation.decontaminate(corpus, evalSet, "doc_id", "text", k = 3)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.keySet === ex.keySet)
    for ((id, row) <- r) {
      assert(row.getLong(1) === ex(id).getLong(1), s"doc $id shingle count")
      assert(row.getBoolean(2) === ex(id).getBoolean(2), s"doc $id flag")
      assert(row.getLong(3) === 1L, s"doc $id bloom completeness")
      assert(row.getLong(4) === 1L, s"doc $id fp gate")
    }
    assert(r(1L).getBoolean(2) && r(4L).getBoolean(2) &&
      !r(2L).getBoolean(2) && !r(3L).getBoolean(2))
  }

  test("production probe-only form: flags are a no-false-negative superset of exact") {
    val (corpus, evalSet) = frames
    val prod = Curation.decontaminateBloomProbeOnly(
      corpus, evalSet, "doc_id", "text", k = 3, fpp = 1e-12)
      .collect().map(x => x.getLong(0) -> x).toMap
    val ex = Curation.decontaminate(corpus, evalSet, "doc_id", "text", k = 3)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(prod.keySet === ex.keySet)
    for ((id, row) <- ex if row.getBoolean(2))
      assert(prod(id).getBoolean(2),
        s"doc $id exact-contaminated but not bloom-flagged (false negative!)")
    // at fpp 1e-12 on this toy corpus the probe is FP-free too
    assert(prod.view.mapValues(_.getBoolean(2)).toMap ===
      ex.view.mapValues(_.getBoolean(2)).toMap)
  }

  test("the FP gate is computed, not constant: an impossible bound flips fp_ok") {
    val (corpus, evalSet) = frames
    val flipped = Curation.decontaminateBloom(
      corpus, evalSet, "doc_id", "text", k = 3, maxFpPermille = -1L)
    assert(flipped.agg(sum("fp_ok")).head().getLong(0) === 0L)
  }
}
