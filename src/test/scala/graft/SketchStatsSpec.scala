package graft

import graft.ops.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curation.corpusStatsSketched — the mergeable-sketch twin of
  * corpusStats: exact legs must equal corpusStats exactly, the
  * vocabulary leg must equal a hand count, and the sketch gate must
  * actually gate (an impossible bound flips sketch_ok to 0 — the
  * column is computed, not a constant).
  */
class SketchStatsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-sketchstats-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "aa bb cc dd", "en"),
      (2L, "aa bb", "en"),
      (3L, "aa bb cc dd ee ff gg hh", "en"),
      (4L, "xx yy", "de"),
      (5L, "xx yy zz  zz", "de") // double space: empty split tokens drop
    ).toDF("doc_id", "text", "lang")
  }

  test("exact legs match corpusStats; vocabulary is the distinct token count; gate passes") {
    val r = Curation.corpusStatsSketched(corpus, "lang", "doc_id", "text")
      .collect().map(x => x.getString(0) -> x).toMap
    val en = r("en"); val de = r("de")
    assert((en.getLong(1), en.getLong(2), en.getLong(3), en.getLong(4)) === ((3L, 14L, 4L, 8L)))
    assert(en.getLong(5) === 8L) // aa bb cc dd ee ff gg hh
    assert(de.getLong(5) === 3L) // xx yy zz
    assert(en.getLong(6) === 1L && de.getLong(6) === 1L)
    val ex = Curation.corpusStats(corpus, "lang", "doc_id", "text")
      .collect().map(x => x.getString(0) -> x.toSeq.drop(1)).toMap
    assert(r.view.mapValues(_.toSeq.slice(1, 5)).toMap === ex)
  }

  test("production sketch-only form: exact counts exact, sketches within q125's bounds") {
    val r = Curation.corpusStatsSketchOnly(corpus, "lang", "doc_id", "text")
      .collect().map(x => x.getString(0) -> x).toMap
    val ex = Curation.corpusStats(corpus, "lang", "doc_id", "text")
      .collect().map(x => x.getString(0) -> x).toMap
    for ((lang, row) <- r) {
      assert(row.getLong(1) === ex(lang).getLong(1), s"$lang n_docs")
      assert(row.getLong(2) === ex(lang).getLong(2), s"$lang sum_tokens")
      // sketches within q125's documented bounds (max(2, 5%) tokens)
      assert(math.abs(row.getLong(3) - ex(lang).getLong(3)) <= 2, s"$lang p50")
      assert(math.abs(row.getLong(4) - ex(lang).getLong(4)) <= 2, s"$lang p95")
    }
    assert(math.abs(r("en").getLong(5) - 8L) <= 1 &&
      math.abs(r("de").getLong(5) - 3L) <= 1)
  }

  test("the gate is computed, not constant: an impossible vocab bound flips sketch_ok") {
    val flipped = Curation.corpusStatsSketched(
      corpus, "lang", "doc_id", "text", vocabBoundPermille = -1L)
    assert(flipped.agg(sum("sketch_ok")).head().getLong(0) === 0L)
  }
}
