package graft

import graft.streaming.Streams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Online ingest dedup gate (Streams.dedupGateStream): near-dups are
  * rejected against the standing corpus AND within a batch, clean docs
  * fold into the corpus, and later batches are checked against
  * everything earlier batches admitted.
  */
class DedupGateSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-dedupgate-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.streaming.checkpointLocation",
      java.nio.file.Files.createTempDirectory("graft-gate-ckpt").toString)
    .getOrCreate()

  final case class Doc(doc_id: Long, text: String)

  test("batches reject vs corpus and within-batch; admitted docs gate later batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")

    val input = MemoryStream[Doc]
    val (gate, query) = Streams.dedupGateStream(
      input.toDF(), corpus, "doc_id", "text")
    try {
      // batch 1: 10 dups corpus doc 1 (reject vs corpus); 11/12 are
      // near-dups of each other (higher id 12 rejected within batch);
      // 13 is novel
      input.addData(
        Doc(10L, "the quick brown fox jumps over the lazy dog"),
        Doc(11L, "brand new content first variant here today"),
        Doc(12L, "brand new content first variant here today"),
        Doc(13L, "completely different and unrelated text"))
      query.processAllAvailable()
      val r1 = gate.rejected.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(r1.keySet === Set(10L, 12L))
      assert(r1(10L) === "near-dup of corpus")
      assert(r1(12L) === "near-dup within batch")

      // batch 2: 20 dups doc 11 — admitted only in batch 1, so the
      // rejection proves the corpus actually grew
      input.addData(
        Doc(20L, "brand new content first variant here today"),
        Doc(21L, "yet another novel document entirely fresh"))
      query.processAllAvailable()
      val r2 = gate.rejected.collect().map(_.getLong(0)).toSet
      assert(r2 === Set(10L, 12L, 20L))

      val ids = gate.corpusNow.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 2L, 11L, 13L, 21L))
    } finally query.stop()
  }

  final case class SDoc(doc_id: String, text: String)

  test("the rejection log keeps a non-long id type (lazy first-batch init)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val corpus = Seq(("keep-a", "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val input = MemoryStream[SDoc]
    val (gate, query) = Streams.dedupGateStream(input.toDF(), corpus, "doc_id", "text")
    try {
      input.addData(SDoc("dup-b", "the quick brown fox jumps over the lazy dog"))
      query.processAllAvailable()
      val rej = gate.rejected.collect().map(r => (r.getString(0), r.getString(1)))
      assert(rej.toSeq === Seq(("dup-b", "near-dup of corpus")))
    } finally query.stop()
  }

  test("loop-carried state is bounded: plan width, cached blocks, and rejects survive compaction") {
    val s = spark
    import s.implicits._
    // fresh baseline for cached-RDD accounting
    s.sharedState.cacheManager.clearCache()
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val gate = Streams.newDedupGate(corpus, "doc_id", "text", compactEvery = 3)
    val nBatches = 10
    (1 to nBatches).foreach { b =>
      // one duplicate of the seed (always rejected) + one novel doc per batch
      gate.ingest(Seq(
        (100L + b, "the quick brown fox jumps over the lazy dog"),
        (200L + b, s"novel content number $b entirely different words ${('a' + b).toChar}"))
        .toDF("doc_id", "text"))
    }
    // every batch's duplicate rejected, novels admitted — correctness
    // across multiple compaction boundaries (10 folds, compactEvery=3)
    val rejects = gate.rejected.collect().map(_.getLong(0)).toSet
    assert(rejects === (1 to nBatches).map(100L + _).toSet)
    assert(gate.corpusNow.count() === 1L + nBatches)
    // plan width bounded by the compaction window, NOT the batch count:
    // after 10 folds at compactEvery=3 the union has at most
    // compactEvery+1 segments
    def leaves(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collectLeaves().size
    assert(leaves(gate.corpusNow) <= 4, s"corpus plan grew: ${leaves(gate.corpusNow)} leaves")
    assert(leaves(gate.indexNow) <= 4, s"index plan grew: ${leaves(gate.indexNow)} leaves")
    // block-manager residue bounded: live checkpoints are the carried
    // segments + rejection log, not one copy per processed batch
    val cached = s.sparkContext.getRDDStorageInfo.length
    assert(cached <= 12, s"cached RDDs grew with batch count: $cached")
  }
}
