package graft

import graft.streaming.Streams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streams.CurationGate — the stateful streaming curation pipeline:
  * decision immutability, digest carry (a decision once made marks all
  * later copies as duplicates, whatever the original's fate), and
  * exact shard-append arithmetic across folds. The end-to-end replay
  * is oracle-gated by q114; this pins the API semantics.
  */
class CurationGateSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-curation-gate-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // Gopher-passing text (>=50 words, stopwords, alpha mass).
  private def body(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    (1 to 60).map(i => if (i % 7 == 0) "the" else if (i % 11 == 0) "with"
      else "tok" + rnd.nextInt(1000)).mkString(" ")
  }

  private def docsOf(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("decisions are immutable, digests carry forward, shards append across folds") {
    val tA = body(1); val tB = body(2); val tC = body(3); val tShort = "too short"
    val eval = docsOf(900L -> "held out eval words entirely distinct from corpus")
    val gate = Streams.newCurationGate(
      docsOf(1L -> tA), eval, "doc_id", "text",
      tokensPerShard = 100L, compactEvery = 2)

    // fold 1: 10 dups standing tA; 11 fails quality; 12 is kept
    gate.ingest(docsOf(10L -> tA, 11L -> tShort, 12L -> tB))
    val d1 = gate.decisions.collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(4), r.getLong(5))).toMap
    assert(d1(10L)._1 === "duplicate")
    assert(d1(11L)._1 === "quality")
    assert(d1(12L)._1 === "ok")

    // fold 2: 20 duplicates the QUALITY-REJECTED 11's text — a
    // decision once made marks later copies as duplicates; 21 dups 12
    // (kept in fold 1); 22 is new. Triggers the compactEvery=2
    // digest-segment compaction.
    gate.ingest(docsOf(20L -> tShort, 21L -> tB, 22L -> tC))
    val d2 = gate.decisions.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(d2(20L) === "duplicate", "digest of a rejected doc must still carry")
    assert(d2(21L) === "duplicate")
    assert(d2(22L) === "ok")

    // fold 1's rows are byte-identical after two more folds
    gate.ingest(docsOf(30L -> body(4)))
    val d3 = gate.decisions.filter(col("batch") === 1).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(4), r.getLong(5))).toMap
    assert(d3 === d1, "emitted decisions must be immutable")

    // shard append: every kept-train doc's offset equals the running
    // token total at its emission, with tokensPerShard=100 forcing
    // shard boundaries mid-stream (60-token docs).
    val trains = gate.decisions.filter(col("split") === "train")
      .orderBy("batch", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5)))
    // (batch, doc_id) order equals pack order only while each fold
    // admits at most one train doc — assert the precondition so a
    // corpus change fails loudly here, not in the offset arithmetic
    // (within a fold the pack order is (md5(text), doc_id)).
    val perBatch = gate.decisions.filter(col("split") === "train")
      .groupBy("batch").count().collect().map(_.getLong(1))
    assert(perBatch.forall(_ <= 1), "test corpus must keep <=1 train doc per fold")
    val standingTokens = gate.trainTokensNow - trains.length * 60L
    trains.zipWithIndex.foreach { case ((id, shard, off), i) =>
      val cum = standingTokens + i * 60L
      assert(shard === cum / 100L && off === cum % 100L,
        s"doc $id: ($shard,$off) != cum $cum")
    }
  }
}
