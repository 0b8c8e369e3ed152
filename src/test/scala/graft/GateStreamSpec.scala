package graft

import graft.bulk.ManifestStore
import graft.streaming.Streams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streams.gateStream — the one production wiring for ALL five ingest
  * gates ([[graft.streaming.Streams.IngestGate]]): foreachBatch folds
  * plus periodic durable manifest commits. The restart contract under
  * test: kill the driver AFTER a commit, resume the gate from the
  * store's latest committed version, re-feed the batches after that
  * commit — decisions fold-for-fold identical to an uninterrupted
  * gate over the same batch sequence.
  */
final case class GateStreamDoc(doc_id: Long, text: String)
final case class GateStreamHash(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

class GateStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-gatestream-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.streaming.checkpointLocation",
      java.nio.file.Files.createTempDirectory("graft-gate-ckpt").toString)
    .getOrCreate()

  override def afterAll(): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    super.afterAll()
  }

  private def tmpStore(): ManifestStore =
    new ManifestStore(spark,
      java.nio.file.Files.createTempDirectory("graft-gate-store").toString)


  private def decisionRows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("winnow gate through gateStream: periodic commits, crash after commit, resume + re-feed = uninterrupted") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    // width=8/stride=4: any repeat of >= 11 bytes is guaranteed flagged
    val t1 = "alpha bravo charlie delta echo foxtrot golf"
    val t2 = "hotel india juliett kilo lima mike november"
    val t3 = "oscar papa quebec romeo sierra tango uniform"
    val t4 = "victor whiskey xray yankee zulu one two three"
    val corpus = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
    val b1 = Seq(GateStreamDoc(10L, t1), GateStreamDoc(11L, t3))            // 10 repeats corpus
    val b2 = Seq(GateStreamDoc(20L, t3), GateStreamDoc(21L, t4))            // 20 repeats b1's 11
    val b3 = Seq(GateStreamDoc(30L, t4), GateStreamDoc(31L, "unique final doc with no repeats at all"))

    val store = tmpStore()
    val live = Streams.newWinnowGate(corpus, "doc_id", "text", width = 8, stride = 4)
    val input = MemoryStream[GateStreamDoc]
    input.addData(b1: _*)
    val query = Streams.gateStream(live, input.toDF(), Some(store), persistEvery = 2)
    try {
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable() // fold 2 -> durable commit
      input.addData(b3: _*)
      query.processAllAvailable() // fold 3 folded live but NOT committed
    } finally query.stop()

    // the uninterrupted twin (plain batch folds, no streaming)
    val twin = Streams.newWinnowGate(corpus, "doc_id", "text", width = 8, stride = 4)
    Seq(b1, b2, b3).foreach(b => twin.ingest(b.toDF()))
    assert(decisionRows(live.decisions) === decisionRows(twin.decisions))
    // the repeat structure is non-vacuous: 10/20/30 flagged, 31 clean
    val flagged = live.decisions.filter(col("n_repeated") > 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(Set(10L, 20L, 30L).subsetOf(flagged) && !flagged.contains(31L))
    live.release()

    // crash: the store's latest version is the fold-2 commit
    val resumed = Streams.resumeWinnowGate(store, "doc_id", "text", width = 8, stride = 4)
    assert(resumed.decisions.count() === 4) // b1 + b2 only
    resumed.ingest(b3.toDF()) // re-feed from the commit's offsets
    assert(decisionRows(resumed.decisions) === decisionRows(twin.decisions))
    resumed.release()
    twin.release()
  }

  test("band-hash gate through the same gateStream wiring (cross-modal IngestGate)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    def hashed(rows: Seq[(Long, String)]) = graft.ops.Media.ppmAHash(
      graft.ops.Media.asPpm(rows.toDF("doc_id", "text"), "doc_id", "text")).toDF()
    def rowsOf(rows: Seq[(Long, String)]): Seq[GateStreamHash] = hashed(rows).collect()
      .map(r => GateStreamHash(r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toSeq

    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "pack my box with five dozen liquor jugs for the long winter"
    val b1 = Seq(10L -> t1, 11L -> "some totally different third content body")
    val b2 = Seq(20L -> b1(1)._2)

    val store = tmpStore()
    val live = Streams.newBandHashGate(hashed(Seq(1L -> t1, 2L -> t2)))
    val input = MemoryStream[GateStreamHash]
    input.addData(rowsOf(b1): _*)
    val query = Streams.gateStream(live, input.toDF(), Some(store), persistEvery = 1)
    try {
      query.processAllAvailable() // fold 1 + commit
    } finally query.stop()
    // doc 10 is a pixel-exact twin of corpus doc 1 (hamming 0)
    val d1 = live.decisions.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(d1(10L) === 0L && d1(11L) === -1L)
    live.release()

    val resumed = Streams.resumeBandHashGate(store)
    resumed.ingest(hashed(b2)) // 20 twins 11 — proves the carried hash table
    val d2 = resumed.decisions.filter(col("batch") === 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(d2 === Map(20L -> 1L))
    resumed.release()
  }
}
