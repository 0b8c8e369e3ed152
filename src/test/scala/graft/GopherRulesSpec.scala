package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the Gopher rule battery: empty/degenerate docs,
  * each rule's boundary, and the composite keep.
  */
class GopherRulesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-gopher-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(rows: Seq[(Long, String)]): Map[Long, Map[String, Any]] = {
    val s = spark; import s.implicits._
    val df = TextAnalysis.gopherRules(rows.toDF("doc_id", "text"), "doc_id", "text")
    val cols = df.columns
    df.collect().map { r =>
      r.getLong(0) -> cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap
    }.toMap
  }

  test("a clean 50-word english doc passes every rule") {
    val text = ("the cat and the dog have that with " * 7).trim // 56 words
    val m = run(Seq((1L, text)))(1L)
    assert(m("n_words") === 56L)
    Seq("rule_word_count", "rule_word_len", "rule_symbols", "rule_stopwords", "rule_alpha")
      .foreach(r => assert(m(r) === true, r))
    assert(m("keep") === true)
  }

  test("each rule fails independently at its boundary") {
    val base = "the cat and the dog have that with " // 8 words/rep, all alpha
    val cases = Seq(
      // 49 words: word-count floor is 50
      (1L, (base * 6).trim + " extra"), // 48 + 1 = 49 words
      // symbol ratio: 63 words incl. 7 '#' → 7000 div 63 = 111 ≥ 100
      (2L, (base * 7).trim + " # # # # # # #"),
      // stopword rule: 56 words, zero stop-list hits
      (3L, ("lorem ipsum dolor sit amet consectetur adipiscing elit " * 7).trim),
      // alpha rule: 56 alpha + 15 numeric = 71 words → 56000 div 71 = 788 < 800
      (4L, (base * 7).trim + (" 123" * 15))
    )
    val out = run(cases)
    assert(out(1L)("rule_word_count") === false)
    assert(out(1L)("keep") === false)
    assert(out(2L)("rule_symbols") === false, out(2L))
    assert(out(3L)("rule_stopwords") === false, out(3L))
    assert(out(4L)("rule_alpha") === false, out(4L))
  }

  test("empty and whitespace-only docs fail closed without dividing by zero") {
    val out = run(Seq((1L, ""), (2L, "   ")))
    Seq(1L, 2L).foreach { id =>
      assert(out(id)("n_words") === 0L)
      assert(out(id)("keep") === false)
      assert(out(id)("mean_word_len_x100") === 0L)
    }
  }
}
