package graft

import graft.streaming.Streams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** BandHashGate (q124): the maintained perceptual-hash index as
  * durable gate state — live fold parity against a brute-force
  * reference, decision immutability, the maintained-band stop
  * decision, delta-authoritative re-ingest, and persist/resume
  * restart identity through a forced compaction.
  */
class BandHashGateSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bandhash-gate-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def hashFrame(rows: Seq[(Long, Int, Int, Int, Int)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "b0", "b1", "b2", "b3")
  }

  private def hamming(a: (Int, Int, Int, Int), b: (Int, Int, Int, Int)): Int =
    Integer.bitCount(a._1 ^ b._1) + Integer.bitCount(a._2 ^ b._2) +
      Integer.bitCount(a._3 ^ b._3) + Integer.bitCount(a._4 ^ b._4)

  private def collectDecisions(gate: Streams.BandHashGate) =
    gate.decisions.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  /** Brute-force annotations: for each streamed doc, partners at
    * hamming <= 3 among docs with batch <= its own (excluding itself).
    */
  private def reference(
      byBatch: Map[Long, Seq[(Long, (Int, Int, Int, Int))]]): Set[(Long, Long, Long, Long)] = {
    val all = byBatch.toSeq.flatMap { case (b, ds) => ds.map(d => (b, d._1, d._2)) }
    (for {
      (b, id, h) <- all if b > 0
      partners = all.filter { case (pb, pid, ph) =>
        pb <= b && pid != id && hamming(ph, h) <= 3
      }
    } yield (id, b,
      partners.size.toLong,
      if (partners.isEmpty) -1L else partners.map(p => hamming(p._3, h).toLong).min)).toSet
  }

  test("fold annotations equal brute force over seen-so-far + own batch; decisions immutable") {
    val rnd = new Random(5)
    def rh() = (rnd.nextInt(65536), rnd.nextInt(65536), rnd.nextInt(65536), rnd.nextInt(65536))
    // base population + planted twins across and within batches
    val h1 = rh(); val h2 = rh()
    val h1near = (h1._1 ^ 3, h1._2, h1._3, h1._4) // hamming 2
    val byBatch: Map[Long, Seq[(Long, (Int, Int, Int, Int))]] = Map(
      0L -> ((1 to 10).map(i => i.toLong -> rh()) :+ (20L -> h1)),
      1L -> Seq(30L -> h1near, 31L -> rh(), 32L -> h2), // cross pair vs batch 0
      2L -> Seq(40L -> h2, 41L -> h2, 42L -> rh()),     // within-batch + cross pair
      3L -> Seq(50L -> rh()))
    val gate = Streams.newBandHashGate(
      hashFrame(byBatch(0L).map(d => (d._1, d._2._1, d._2._2, d._2._3, d._2._4))))
    (1L to 3L).foreach { b =>
      gate.ingest(hashFrame(byBatch(b).map(d => (d._1, d._2._1, d._2._2, d._2._3, d._2._4))))
    }
    val got = collectDecisions(gate)
    val want = reference(byBatch)
    assert(got === want)
    // non-vacuous: a nonzero-hamming cross partner and a within-batch pair
    assert(got.exists { case (id, _, n, mh) => id == 30L && n >= 1 && mh == 2L })
    assert(got.exists { case (id, b, n, mh) => id == 41L && b == 2L && n >= 2 && mh == 0L })
    // immutability: doc 32 (batch 1) folded before its h2 partners
    // arrived in batch 2 — its decision must NOT count them
    assert(got.exists { case (id, _, n, _) => id == 32L && n == 0L })
    gate.release()
  }

  test("persist/resume through a forced compaction is decision-identical") {
    val rnd = new Random(9)
    def rh() = (rnd.nextInt(65536), rnd.nextInt(65536), rnd.nextInt(65536), rnd.nextInt(65536))
    val batches = (0 to 3).map(b =>
      b.toLong -> (0 until 8).map(i => (b * 100 + i).toLong -> rh())).toMap
    // twin crossing the restart point: batch 3 doc copies a batch-1 hash
    val byBatch = batches.updated(3L, batches(3L) :+ (399L -> batches(1L).head._2))
    def frame(b: Long) =
      hashFrame(byBatch(b).map(d => (d._1, d._2._1, d._2._2, d._2._3, d._2._4)))
    // uninterrupted run (compactEvery=2 forces a compaction at fold 2)
    val g0 = Streams.newBandHashGate(frame(0L), compactEvery = 2)
    (1L to 3L).foreach(b => g0.ingest(frame(b)))
    val want = collectDecisions(g0)
    g0.release()
    // killed-and-resumed run: persist right after the fold-2 compaction
    val dir = java.nio.file.Files.createTempDirectory("graft-bandgate-store")
    val store = new graft.bulk.ManifestStore(spark, dir.toString)
    val g1 = Streams.newBandHashGate(frame(0L), compactEvery = 2)
    (1L to 2L).foreach(b => g1.ingest(frame(b)))
    g1.persist(store)
    g1.release()
    val g2 = Streams.resumeBandHashGate(store, compactEvery = 2)
    g2.ingest(frame(3L))
    val got = collectDecisions(g2)
    assert(got === want)
    assert(got.exists { case (id, _, n, mh) => id == 399L && n >= 1 && mh == 0L },
      "the cross-restart twin must be found by the RESUMED gate")
    g2.release()
    // config mismatch on resume fails loudly
    intercept[IllegalArgumentException](Streams.resumeBandHashGate(store, maxHamming = 2))
  }

  test("maintained stop-band decision: hot keys generate no candidates, cold keys survive") {
    // 20 standing docs share one exact hash (all four band keys at
    // df 20 > cap 10); a batch doc matching them must see NO partners
    // through the hot bands, while a second batch doc pairing a cold
    // standing hash is found
    val hotH = (7, 8, 9, 10); val coldH = (1111, 2222, 3333, 4444)
    val standing = (0 until 20).map(i => (i.toLong, hotH._1, hotH._2, hotH._3, hotH._4)) :+
      ((50L, coldH._1, coldH._2, coldH._3, coldH._4))
    val gate = Streams.newBandHashGate(hashFrame(standing), maxBandFreq = 10L)
    gate.ingest(hashFrame(Seq(
      (100L, hotH._1, hotH._2, hotH._3, hotH._4),
      (101L, coldH._1, coldH._2, coldH._3, coldH._4))))
    val got = collectDecisions(gate)
    assert(got === Set((100L, 1L, 0L, -1L), (101L, 1L, 1L, 0L)))
    gate.release()
  }

  test("re-ingested ids are delta-authoritative: no self-pair with the standing twin") {
    val h = (1, 2, 3, 4)
    val gate = Streams.newBandHashGate(hashFrame(Seq((1L, h._1, h._2, h._3, h._4))))
    gate.ingest(hashFrame(Seq((1L, h._1, h._2, h._3, h._4))))
    val got = collectDecisions(gate)
    assert(got === Set((1L, 1L, 0L, -1L)))
    gate.release()
  }

  test("re-ingest supersedes: compaction and persist keep only the newest hash per doc_id") {
    val hA = (1, 2, 3, 4); val hB = (60000, 50000, 40000, 30000)
    def frame(rows: (Long, (Int, Int, Int, Int))*) =
      hashFrame(rows.map { case (id, h) => (id, h._1, h._2, h._3, h._4) })
    // doc 1 arrives with hash A, is re-ingested with hash B, and a
    // fold later the gate compacts (compactEvery=2): the superseded A
    // copy and its band counts must be gone from the standing state
    val g = Streams.newBandHashGate(frame(1L -> hA), compactEvery = 2)
    g.ingest(frame(1L -> hB))             // fold 1: re-ingest, new hash
    g.ingest(frame(5L -> (9, 9, 9, 9)))  // fold 2: triggers compaction
    g.ingest(frame(10L -> hA, 11L -> hB)) // fold 3: probe both hashes
    val got = collectDecisions(g)
    assert(got.contains((10L, 3L, 0L, -1L)),
      "superseded hash A must not partner after compaction")
    assert(got.contains((11L, 3L, 1L, 0L)),
      "current hash B must partner doc 1 exactly once")
    g.release()
    // persist (WITHOUT an intervening compaction) must write the
    // deduped table: resume and probe again
    val dir = java.nio.file.Files.createTempDirectory("graft-bandgate-dedupe")
    val store = new graft.bulk.ManifestStore(spark, dir.toString)
    val g1 = Streams.newBandHashGate(frame(1L -> hA), compactEvery = 99)
    g1.ingest(frame(1L -> hB))
    g1.persist(store)
    g1.release()
    val g2 = Streams.resumeBandHashGate(store, compactEvery = 99)
    g2.ingest(frame(10L -> hA, 11L -> hB))
    val got2 = collectDecisions(g2)
    assert(got2.exists { case (id, _, n, _) => id == 10L && n == 0L })
    assert(got2.exists { case (id, _, n, mh) => id == 11L && n == 1L && mh == 0L })
    g2.release()
  }

  test("modality-closed: VIDEO frames stream through the gate via packed (doc,frame) keys") {
    // the gate is hash-agnostic by construction — per-frame Y4M
    // aHashes with doc_id*2^20+frame keys make it a streaming video
    // frame index with zero new gate code (the q129/q130 band layout)
    val rnd = new Random(41)
    val base = Array.fill(300)(rnd.nextInt(256).toByte)
    val other = Array.fill(313)(rnd.nextInt(256).toByte)
    def packedHashes(rows: Seq[(Long, Array[Byte])]) = {
      import spark.implicits._
      graft.ops.Media.y4mFrameAHash(
        spark.createDataset(rows.map { case (id, b) =>
          graft.ops.MediaRow(id, "video/x-yuv4mpeg", graft.ops.Media.encodeY4m(b)) }))
        .select((col("doc_id") * graft.ops.Media.FrameKeyCap + col("frame")).as("doc_id"),
          col("b0"), col("b1"), col("b2"), col("b3"))
    }
    val gate = Streams.newBandHashGate(packedHashes(Seq(1L -> base)))
    gate.ingest(packedHashes(Seq(2L -> other)))   // batch 1: unrelated video
    gate.ingest(packedHashes(Seq(3L -> base.clone()))) // batch 2: exact twin of 1
    val dec = gate.decisions.collect()
      .map(r => (r.getLong(0) / graft.ops.Media.FrameKeyCap, r.getLong(0) % graft.ops.Media.FrameKeyCap, r.getLong(1), r.getLong(2), r.getLong(3)))
    // every frame of video 3 finds its batch-0 counterpart at hamming 0
    val nf = 2 + 300 % 5
    val v3 = dec.filter(_._1 == 3L)
    assert(v3.length === nf && v3.forall(d => d._4 >= 1L && d._5 === 0L))
    // video 2 (different dims, random content) annotates clean
    assert(dec.filter(_._1 == 2L).forall(_._4 === 0L))
    gate.release()
  }

  test("modality-closed: lossy JPEG twins and cross-container WAV→FLAC deltas ride the gate") {
    import spark.implicits._
    val rnd = new Random(43)
    val base = Array.fill(400)(rnd.nextInt(256).toByte)
    val other = Array.fill(421)(rnd.nextInt(256).toByte)
    // JPEG: the gate hashes DECODED pixels, so exact source twins
    // collide at hamming 0 even though the container is lossy AND the
    // entropy framing differs (restart intervals derive from length)
    def jpegHashes(rows: Seq[(Long, Array[Byte])]) =
      graft.ops.Media.jpegAHash(
        spark.createDataset(rows.map { case (id, b) =>
          graft.ops.MediaRow(id, "image/jpeg", graft.ops.Media.encodeJpegGray(b)) }))
        .toDF()
    val g = Streams.newBandHashGate(jpegHashes(Seq(1L -> base)))
    g.ingest(jpegHashes(Seq(2L -> other, 3L -> base.clone())))
    val dec = g.decisions.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(dec.exists { case (id, n, mh) => id == 3L && n >= 1L && mh == 0L },
      "lossy twin must hit its standing partner at hamming 0")
    assert(dec.exists { case (id, n, _) => id == 2L && n == 0L })
    g.release()
    // WAV-built standing state probed by FLAC deltas: losslessness
    // makes the envelope hash container-independent, so one gate
    // serves mixed-container audio corpora
    def wavHashes(rows: Seq[(Long, Array[Byte])]) =
      graft.ops.Media.wavEnvelopeHash(
        spark.createDataset(rows.map { case (id, b) =>
          graft.ops.MediaRow(id, "audio/wav", graft.ops.Media.encodeWav(b)) }))
        .toDF()
    def flacHashes(rows: Seq[(Long, Array[Byte])]) =
      graft.ops.Media.flacEnvelopeHash(
        spark.createDataset(rows.map { case (id, b) =>
          graft.ops.MediaRow(id, "audio/flac", graft.ops.Media.encodeFlac(b)) }))
        .toDF()
    val g2 = Streams.newBandHashGate(wavHashes(Seq(10L -> base)))
    g2.ingest(flacHashes(Seq(20L -> base.clone(), 21L -> other)))
    val dec2 = g2.decisions.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(dec2.exists { case (id, n, mh) => id == 20L && n >= 1L && mh == 0L },
      "a FLAC delta must match its WAV-ingested twin exactly")
    assert(dec2.exists { case (id, n, _) => id == 21L && n == 0L })
    g2.release()
  }
}
