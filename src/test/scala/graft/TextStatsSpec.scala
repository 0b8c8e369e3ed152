package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** One-pass text-analysis kernels (TextStats, LangHits) vs the regex /
  * explode+join forms they replaced: identical counts, identical argmax
  * and tie-breaks, on hand-picked edge cases plus deterministic random
  * strings over a whitespace-and-symbol-heavy alphabet.
  */
class TextStatsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-textstats-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs: DataFrame = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = "ab1 .!\t\n\u000b\f\r de23 -_#éZ9"
    val random = (1L to 60L).map { i =>
      i -> Array.fill(rnd.nextInt(200))(alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val edges = Seq(
      (101L, ""), // empty: all counts zero
      (102L, "   \t\r\n  "), // whitespace only
      (103L, "abc123def"), // letter/digit runs, no ws
      (104L, "!!!???..."), // punct only: one bpe token per char
      (105L, "the la und es de den"), // multi-language stopwords + ties
      (106L, "le la les et est"), // pure French stopwords
      (107L, "der die das the the"), // de vs en tie-break (hits 3 vs 2)
      (108L, "la la"), // fr/es tie at 2 hits each → 'es' (lang asc)
      (109L, "x\u000by" + "z\f" * 3), // exotic Java \s members
      (110L, "a" + " b" * 500) // long doc
    )
    (random ++ edges).toDF("doc_id", "text")
  }

  /** The regex forms the kernels replaced — kept here as the spec. */
  private def regexQuality(d: DataFrame): DataFrame = {
    val toks = regexp_extract_all(col("text"), lit("\\S+"), lit(0))
    d.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_uniq_tokens"),
      size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("n_punct"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .cast("long").as("bpe_tokens"))
  }

  test("TextStats kernel counts equal the regex forms") {
    val expected = regexQuality(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val q = TextAnalysis.qualityScore(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val t = TextAnalysis.tokenCounts(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(q.keySet === expected.keySet)
    q.foreach { case (id, (nTok, nUniq, nPunct)) =>
      val (eTok, eUniq, ePunct, _) = expected(id)
      assert((nTok, nUniq, nPunct) === (eTok, eUniq, ePunct), s"doc $id")
    }
    t.foreach { case (id, (ws, bpe)) =>
      val (eTok, _, _, eBpe) = expected(id)
      assert((ws, bpe) === (eTok, eBpe), s"doc $id")
    }
  }

  test("LangHits kernel equals the explode+join+window form") {
    val s = spark
    import s.implicits._
    val sw = TextAnalysis.stopwords.toDF("lang", "word")
    val ids = docs.select(col("doc_id"))
    val hits = docs
      .select(col("doc_id"), explode(regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))).as("token"))
      .join(broadcast(sw), col("token") === col("word"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("hits"))
    val best = hits
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("hits").desc, col("lang"))))
      .filter(col("rn") === 1)
    val expected = ids.join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lang"), lit("und")).as("predicted_lang"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val native = TextAnalysis.langId(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(native === expected)
    // pin the documented argmax + tie-breaks
    assert(native(105L) === ("es", 3L)) // la+es+de all count for es
    assert(native(107L) === ("de", 3L)) // de=3 beats en=2
    assert(native(108L) === ("es", 2L)) // fr/es tie → lang asc
    assert(native(102L) === ("und", 0L))
  }
  test("repetition metrics: dup-bigram mass, top-token share, degenerate docs") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),       // bigrams: "a b"x3, "b a"x2 -> all 5 dup
      (2L, "w x y z"),           // 3 bigrams, all unique
      (3L, "solo"),              // 1 token: no bigrams, top share 1000
      (4L, ""),                  // no tokens at all
      (5L, "t t t t")            // one token type: everything repeats
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) === ((5L, 5L, 1000L, 500L)))  // 3 of 6 tokens are "a"
    assert(out(2L) === ((3L, 0L, 0L, 250L)))
    assert(out(3L) === ((0L, 0L, 0L, 1000L)))
    assert(out(4L) === ((0L, 0L, 0L, 0L)))
    assert(out(5L) === ((3L, 3L, 1000L, 1000L)))
  }

}
