package graft

import graft.bulk.ManifestStore
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Durable, restartable gate state (round-9 verdict task 1): each
  * ingest gate persists its standing state through ManifestStore as
  * ONE CAS-committed manifest version and resumes from it. The
  * contract proven here: a gate KILLED mid-replay (after any fold k —
  * including right after an LSM compaction) and resumed from its last
  * committed manifest finishes the replay with decisions, clusters,
  * corpus, and shard offsets IDENTICAL to an uninterrupted gate's —
  * the reference store's reopen-via-log-replay durability
  * (assemblage_kv/src/lib.rs:602-652; merge persistence
  * assemblage_kv/tests/transactions.rs:8-110), re-expressed as
  * parquet slots + manifest CAS.
  */
class GatePersistenceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-gate-persistence-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()

  /** The ~15 gates this suite replays each hold live carried
    * checkpoints when they go out of scope; suites share the forked
    * test JVM's SparkContext, so release everything on exit or later
    * suites' block-growth bounds see this suite's residue.
    */
  override def afterAll(): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    super.afterAll()
  }

  private def tmpStore(): ManifestStore =
    new ManifestStore(spark,
      java.nio.file.Files.createTempDirectory("graft-gate-store").toString)

  // --- text docs: deterministic Gopher-passing prose; same seed ==
  // identical text (exact + near dup structure comes from seed reuse)
  private def goodText(seed: Long): String = {
    val r = new scala.util.Random(seed)
    val ws = (1 to 60).map(_ => "word" + ('a' + r.nextInt(26)).toChar.toString + r.nextInt(100))
    "the and " + ws.mkString(" ") + " of that"
  }

  private def docs(rows: (Long, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, seed) => (id, goodText(seed)) }.toDF("doc_id", "text")
  }

  private val seedCorpus = Seq(1L -> 1L, 2L -> 2L)
  // batches: (id, textSeed) — dups share a seed
  private val textBatches = Seq(
    Seq(10L -> 1L, 11L -> 11L, 12L -> 11L, 13L -> 13L), // 10 dups corpus, 12 dups 11 in-batch
    Seq(20L -> 11L, 21L -> 21L),                        // 20 dups admitted 11
    Seq(30L -> 21L, 31L -> 31L, 32L -> 2L),             // cross-batch + corpus dup
    Seq(40L -> 40L, 41L -> 31L))                        // 41 dups batch-3's 31

  private def rejectedMap(g: Streams.DedupGate): Map[Long, String] =
    g.rejected.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  private def clusterMap(g: Streams.DedupGate): Map[Long, Long] =
    g.clustersNow.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  private def corpusIds(g: Streams.DedupGate): Set[Long] =
    g.corpusNow.select("doc_id").collect().map(_.getLong(0)).toSet

  test("dedup gate: kill+resume at every fold boundary ≡ uninterrupted replay") {
    val base = docs(seedCorpus: _*)
    val uninterrupted = Streams.newDedupGate(base, "doc_id", "text", compactEvery = 2)
    textBatches.foreach(b => uninterrupted.ingest(docs(b: _*)))
    val wantRej = rejectedMap(uninterrupted)
    val wantClu = clusterMap(uninterrupted)
    val wantIds = corpusIds(uninterrupted)
    // non-vacuity: the replay exercises both rejection reasons and a
    // multi-member cluster
    assert(wantRej.values.toSet ===
      Set("near-dup of corpus", "near-dup within batch"))
    assert(wantClu.groupBy(_._2).values.exists(_.size >= 3))

    // kill after fold k (k=2 is right after the compactEvery=2
    // compaction — the hardest restore point), resume, finish
    (1 to 3).foreach { k =>
      val store = tmpStore()
      val g1 = Streams.newDedupGate(base, "doc_id", "text", compactEvery = 2)
      textBatches.take(k).foreach(b => g1.ingest(docs(b: _*)))
      val v = g1.persist(store)
      assert(v >= 1L)
      val g2 = Streams.resumeDedupGate(store, "doc_id", "text", compactEvery = 2)
      textBatches.drop(k).foreach(b => g2.ingest(docs(b: _*)))
      assert(rejectedMap(g2) === wantRej, s"rejections diverged at kill point $k")
      assert(clusterMap(g2) === wantClu, s"clusters diverged at kill point $k")
      assert(corpusIds(g2) === wantIds, s"corpus diverged at kill point $k")
    }
  }

  test("dedup gate: restart after EVERY fold (chained persist→resume) ≡ uninterrupted") {
    val base = docs(seedCorpus: _*)
    val uninterrupted = Streams.newDedupGate(base, "doc_id", "text", compactEvery = 2)
    textBatches.foreach(b => uninterrupted.ingest(docs(b: _*)))
    val store = tmpStore()
    var g = Streams.newDedupGate(base, "doc_id", "text", compactEvery = 2)
    textBatches.foreach { b =>
      g.ingest(docs(b: _*))
      g.persist(store)
      g = Streams.resumeDedupGate(store, "doc_id", "text", compactEvery = 2)
    }
    assert(rejectedMap(g) === rejectedMap(uninterrupted))
    assert(clusterMap(g) === clusterMap(uninterrupted))
    assert(corpusIds(g) === corpusIds(uninterrupted))
  }

  test("resume takes the LATEST committed manifest; empty store fails loudly") {
    val store = tmpStore()
    val g = Streams.newDedupGate(docs(seedCorpus: _*), "doc_id", "text")
    g.ingest(docs(textBatches.head: _*))
    g.persist(store) // v1
    g.ingest(docs(textBatches(1): _*))
    g.persist(store) // v2
    assert(store.currentVersion() === 2L)
    val resumed = Streams.resumeDedupGate(store, "doc_id", "text")
    assert(corpusIds(resumed) === corpusIds(g))
    assert(rejectedMap(resumed) === rejectedMap(g))
    intercept[IllegalStateException] {
      Streams.resumeDedupGate(tmpStore(), "doc_id", "text")
    }
  }

  // --- embedding gate ---
  private val dim = 64
  private def vec(family: Long, jitter: Int): Seq[Float] = {
    val r = new scala.util.Random(family)
    val base = Array.fill(dim)(r.nextGaussian().toFloat)
    if (jitter != 0) base(jitter % dim) += 0.01f
    base.toSeq
  }
  private def vecs(rows: (Long, (Long, Int))*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, (fam, j)) => (id, vec(fam, j)) }.toDF("vec_id", "embedding")
  }
  private val vecBatches = Seq(
    Seq(10L -> (1L, 1), 11L -> (3L, 0), 12L -> (3L, 1), 13L -> (4L, 0)),
    Seq(20L -> (3L, 2), 21L -> (5L, 0)),
    Seq(30L -> (5L, 1), 31L -> (6L, 0)),
    Seq(40L -> (6L, 1), 41L -> (7L, 0)))

  private def eRejected(g: Streams.EmbeddingDedupGate): Map[Long, String] =
    g.rejected.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  private def eClusters(g: Streams.EmbeddingDedupGate): Map[Long, Long] =
    g.clustersNow.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  private def eIds(g: Streams.EmbeddingDedupGate): Set[Long] =
    g.indexNow.select("id").collect().map(_.getLong(0)).toSet

  test("embedding gate: kill+resume at every fold boundary ≡ uninterrupted (incl. auto-B resigns)") {
    val base = vecs(1L -> (1L, 0), 2L -> (2L, 0))
    // targetBucket=2 forces auto-B resigns DURING the replay, so the
    // persisted plane count (meta slot) is load-bearing: a resume that
    // lost it would probe with incompatible signatures.
    def fresh() = Streams.newEmbeddingDedupGate(
      base, "vec_id", "embedding", dim = dim, threshold = 0.95,
      targetBucket = 2L, compactEvery = 2)
    val uninterrupted = fresh()
    vecBatches.foreach(b => uninterrupted.ingest(vecs(b: _*)))
    val wantRej = eRejected(uninterrupted)
    val wantClu = eClusters(uninterrupted)
    val wantIds = eIds(uninterrupted)
    val wantPlanes = uninterrupted.numPlanes
    assert(wantRej.nonEmpty)
    (1 to 3).foreach { k =>
      val store = tmpStore()
      val g1 = fresh()
      vecBatches.take(k).foreach(b => g1.ingest(vecs(b: _*)))
      g1.persist(store)
      val g2 = Streams.resumeEmbeddingDedupGate(store, "vec_id", "embedding",
        dim = dim, threshold = 0.95, targetBucket = 2L, compactEvery = 2)
      assert(g2.numPlanes === g1.numPlanes, s"plane count lost at kill point $k")
      assert(g2.corpusCount === g1.corpusCount)
      vecBatches.drop(k).foreach(b => g2.ingest(vecs(b: _*)))
      assert(eRejected(g2) === wantRej, s"rejections diverged at kill point $k")
      assert(eClusters(g2) === wantClu, s"clusters diverged at kill point $k")
      assert(eIds(g2) === wantIds, s"index diverged at kill point $k")
      assert(g2.numPlanes === wantPlanes, s"final plane count diverged at kill point $k")
    }
  }

  // --- curation gate ---
  private def cDecisions(g: Streams.CurationGate): Set[(Long, Long, String, String, Long, Long)] =
    g.decisions.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getString(3), r.getLong(4), r.getLong(5))).toSet

  test("curation gate: kill+resume at every fold boundary ≡ uninterrupted (decisions + shard offsets)") {
    val s = spark
    import s.implicits._
    val standing = docs(100L -> 100L, 101L -> 101L, 102L -> 102L)
    val evalSet = docs(900L -> 900L)
    // batch structure: dups within batch, vs standing, vs carried
    // digests of earlier batches; a quality reject (short text); enough
    // kept-train docs that the token counter crosses shard boundaries
    val batches = Seq(
      Seq((10L, goodText(100)), (11L, goodText(11)), (12L, goodText(11)), (13L, goodText(13))),
      Seq((20L, goodText(11)), (21L, goodText(21)), (22L, "too short")),
      Seq((30L, goodText(30)), (31L, goodText(21)), (32L, goodText(32))))
    def frame(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    def fresh() = Streams.newCurationGate(standing, evalSet, "doc_id", "text",
      tokensPerShard = 50L, compactEvery = 2)
    val uninterrupted = fresh()
    batches.foreach(b => uninterrupted.ingest(frame(b)))
    val wantDec = cDecisions(uninterrupted)
    val wantTok = uninterrupted.trainTokensNow
    // non-vacuity: duplicates, a quality reject, and ≥2 packed train docs
    assert(wantDec.exists(_._3 == "duplicate"))
    assert(wantDec.exists(_._3 == "quality"))
    assert(wantDec.count(_._5 >= 0L) >= 2)
    (1 to 2).foreach { k =>
      val store = tmpStore()
      val g1 = fresh()
      batches.take(k).foreach(b => g1.ingest(frame(b)))
      g1.persist(store)
      val g2 = Streams.resumeCurationGate(store, evalSet, "doc_id", "text",
        tokensPerShard = 50L, compactEvery = 2)
      assert(g2.trainTokensNow === g1.trainTokensNow)
      batches.drop(k).foreach(b => g2.ingest(frame(b)))
      assert(cDecisions(g2) === wantDec, s"decisions diverged at kill point $k")
      assert(g2.trainTokensNow === wantTok, s"token counter diverged at kill point $k")
      assert(g2.digestsNow.count() === uninterrupted.digestsNow.count())
    }
  }

  test("curation gate: resume under a different tokenizer fails loudly (unit mixing)") {
    val s = spark
    import s.implicits._
    val standing = docs(100L -> 100L)
    val evalSet = docs(900L -> 900L)
    val g = Streams.newCurationGate(standing, evalSet, "doc_id", "text",
      tokensPerShard = 50L, tokenizer = "bpe")
    g.ingest(Seq((10L, goodText(10))).toDF("doc_id", "text"))
    val store = tmpStore()
    g.persist(store)
    // matching tokenizer resumes fine
    Streams.resumeCurationGate(store, evalSet, "doc_id", "text",
      tokensPerShard = 50L, tokenizer = "bpe")
    // mismatched tokenizer must not silently mix units in the counter
    intercept[IllegalArgumentException] {
      Streams.resumeCurationGate(store, evalSet, "doc_id", "text",
        tokensPerShard = 50L)
    }
    // a pre-round-9 manifest has NO tokenizer column: its counter
    // could only be whitespace-denominated, so resume must treat it
    // as "ws" — rejecting bpe rather than skipping the check
    val legacyMeta = store.read("meta").get.select("train_tokens", "batch_idx")
    store.begin().stage("meta", legacyMeta).commit()
      .fold(c => fail(c.toString), identity)
    intercept[IllegalArgumentException] {
      Streams.resumeCurationGate(store, evalSet, "doc_id", "text",
        tokensPerShard = 50L, tokenizer = "bpe")
    }
    Streams.resumeCurationGate(store, evalSet, "doc_id", "text",
      tokensPerShard = 50L) // tokenizer = "ws" default resumes fine
  }

  test("winnow gate: per-batch annotations equal the q116 delta operator; kill+resume identical") {
    val s = spark
    import s.implicits._
    // planted repeats: a 59-char guarantee-length string shared across
    // batches at different offsets + within-batch twins
    val repeat = (1 to 59).map(i => ('a' + (i * 7) % 26).toChar).mkString
    def filler(seed: Int) = new scala.util.Random(seed).alphanumeric.take(80).mkString
    val seed = Seq(
      (100L, "X" * 13 + repeat + "Y" * 40), (101L, filler(1)))
    val batches = Seq(
      Seq((10L, "Z" * 31 + repeat + "W" * 21), (11L, filler(2))),
      Seq((20L, filler(3)), (21L, "Q" * 5 + repeat + "R" * 60)),
      Seq((30L, filler(2) + " tail"), (31L, filler(4))))
    def frame(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val (w, st) = (40, 20)

    // uninterrupted replay
    val uninterrupted = Streams.newWinnowGate(frame(seed), "doc_id", "text", w, st, compactEvery = 2)
    batches.foreach(b => uninterrupted.ingest(frame(b)))
    def decRows(g: Streams.WinnowGate) = g.decisions.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val wantDec = decRows(uninterrupted)
    assert(wantDec.exists(d => d._1 == 10L && d._4 > 0L),
      "cross-batch planted repeat not flagged")

    // per-batch parity with the q116 delta operator over seen-so-far
    (1 to 3).foreach { i =>
      val standing = frame(seed ++ batches.take(i - 1).flatten)
      val op = graft.ops.Dedup.exactSubstrDeltaRepeatsStrided(
          standing, frame(batches(i - 1)), "doc_id", "text", w, st)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val gateBatch = wantDec.filter(_._2 == i.toLong)
        .map(d => (d._1, d._3, d._4, d._5))
      assert(gateBatch === op, s"gate batch $i diverged from the delta operator")
    }

    // kill+resume at every boundary
    (1 to 2).foreach { k =>
      val store = tmpStore()
      val g1 = Streams.newWinnowGate(frame(seed), "doc_id", "text", w, st, compactEvery = 2)
      batches.take(k).foreach(b => g1.ingest(frame(b)))
      g1.persist(store)
      val g2 = Streams.resumeWinnowGate(store, "doc_id", "text", w, st, compactEvery = 2)
      batches.drop(k).foreach(b => g2.ingest(frame(b)))
      assert(decRows(g2) === wantDec, s"decisions diverged at kill point $k")
      // config mismatch fails loudly
      intercept[IllegalArgumentException] {
        Streams.resumeWinnowGate(store, "doc_id", "text", w, stride = 10)
      }
    }
  }

  test("near-dup curation gate: kill+resume restores the rep corpus + band index") {
    val s = spark
    import s.implicits._
    val standing = docs(100L -> 100L, 101L -> 101L)
    val evalSet = docs(900L -> 900L)
    def nearTwin(seed: Long): String = goodText(seed) + " twin marker tail"
    // 11 near-dups standing 100 (vs REP corpus); 13 near-dups 12
    // within batch; batch 2's 21 near-dups batch 1's ADMITTED 12 —
    // only caught if the rep corpus + band index survive the restart
    val batches = Seq(
      Seq((10L, goodText(10)), (11L, nearTwin(100L)), (12L, goodText(12)), (13L, nearTwin(12L))),
      Seq((20L, goodText(20)), (21L, nearTwin(12L) + " x")),
      Seq((30L, nearTwin(20L)), (31L, goodText(31))))
    def frame(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val nd = Some(Streams.NearDupParams())
    def fresh() = Streams.newCurationGate(standing, evalSet, "doc_id", "text",
      tokensPerShard = 50L, compactEvery = 2, nearDup = nd)
    val uninterrupted = fresh()
    batches.foreach(b => uninterrupted.ingest(frame(b)))
    val wantDec = cDecisions(uninterrupted)
    assert(wantDec.count(_._3 == "near-dup") >= 3,
      s"near-dup path vacuous: $wantDec")
    (1 to 2).foreach { k =>
      val store = tmpStore()
      val g1 = fresh()
      batches.take(k).foreach(b => g1.ingest(frame(b)))
      g1.persist(store)
      val g2 = Streams.resumeCurationGate(store, evalSet, "doc_id", "text",
        tokensPerShard = 50L, compactEvery = 2, nearDup = nd)
      assert(g2.repCorpusNow.count() === g1.repCorpusNow.count())
      batches.drop(k).foreach(b => g2.ingest(frame(b)))
      assert(cDecisions(g2) === wantDec, s"decisions diverged at kill point $k")
      assert(g2.repCorpusNow.select("doc_id").collect().map(_.getLong(0)).toSet ===
        uninterrupted.repCorpusNow.select("doc_id").collect().map(_.getLong(0)).toSet)
    }
  }
}
