package graft

import graft.ops.BpeTrain
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Word-histogram BPE training (round 13): the exactness contract is
  * histogram-trained ≡ stream-trained WITH EVERY WORD OCCURRENCE AS
  * ITS OWN DOCUMENT (pair statistics never cross word boundaries in
  * either framing, and the weighted counts make the multiplicities
  * identical) — plus the batched ≡ sequential identity carried over
  * from BpeSpec, now under weighted counts.
  */
class BpeHistogramSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-bpe-hist-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  // repeated words with shared prefixes so merges compete across words
  // and weights matter: "banana" ×3, "bandana" ×2, "ana" ×4, "band" ×1
  private def corpus() = {
    val s = spark
    import s.implicits._
    Seq(
      "banana bandana ana ana",
      "banana ana band",
      "banana bandana ana"
    ).toDF("text")
  }

  test("histogram-trained equals stream-trained over word-occurrence documents") {
    val s = spark
    import s.implicits._
    val docs = corpus()
    val wordDocs = docs
      .select(explode(split(col("text"), "\\s+")).as("text"))
      .filter(length(col("text")) > 0)
    val hist = rowsOf(BpeTrain.learnMergesHistogram(docs, "text", rounds = 8))
    val stream = rowsOf(BpeTrain.learnMerges(wordDocs, "text", rounds = 8))
    assert(hist.nonEmpty)
    assert(hist === stream)
  }

  test("weighted batching equals weighted sequential") {
    val docs = corpus()
    val batched = rowsOf(BpeTrain.learnMergesHistogram(docs, "text",
      rounds = 8, maxBatchPerPass = 8))
    val sequential = rowsOf(BpeTrain.learnMergesHistogram(docs, "text",
      rounds = 8, maxBatchPerPass = 1))
    assert(batched === sequential)
  }

  test("weights are load-bearing: duplicating a document changes the learned order") {
    val s = spark
    import s.implicits._
    val base = Seq("xy xz", "xy zz").toDF("text")
    // tripling "zq zq zq" makes (z, q) outweigh (x, y)
    val heavy = Seq("xy xz", "xy zz", "zq zq zq", "zq zq zq", "zq zq zq").toDF("text")
    val a = rowsOf(BpeTrain.learnMergesHistogram(base, "text", rounds = 1))
    val b = rowsOf(BpeTrain.learnMergesHistogram(heavy, "text", rounds = 1))
    assert(a.head._2 + a.head._3 === "xy")
    assert(b.head._2 + b.head._3 === "zq")
  }
}
