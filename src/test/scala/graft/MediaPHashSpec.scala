package graft

import graft.ops.{Media, MediaRow}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, max}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Perceptual (8×8 average-hash) media near-dup (q120): the aHash
  * kernel against a hand-computed reference, invariance under the
  * perturbations it must survive (small pixel nudges), sensitivity to
  * the ones it must not (different content), the pigeonhole join's
  * exactness vs a brute-force hamming scan, and the stop-band prune.
  */
class MediaPHashSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-media-phash-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reference aHash computed the slow, obvious way — independent of
    * the kernel's single-pass cell accumulation. Pure JVM: tests below
    * use it as the brute-force twin once the kernel is proven equal.
    */
  private def referenceHash(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    val (w, h, _, pix) = Media.decodePpmBytes(Media.encodePpm(bytes))
    val gray = Array.tabulate(w * h)(p =>
      (pix(3 * p) & 0xff) + (pix(3 * p + 1) & 0xff) + (pix(3 * p + 2) & 0xff))
    val cellOf = (p: Int) => ((p / w) * 8 / h) * 8 + (p % w) * 8 / w
    val cells = gray.indices.groupBy(cellOf)
    val totalSum = gray.map(_.toLong).sum
    val totalCnt = gray.length.toLong
    val bands = new Array[Int](4)
    for ((cell, ps) <- cells) {
      val s = ps.map(gray(_).toLong).sum
      if (s * totalCnt > totalSum * ps.length)
        bands(cell / 16) |= 1 << (cell % 16)
    }
    (bands(0), bands(1), bands(2), bands(3))
  }

  private def hamming(a: (Int, Int, Int, Int), b: (Int, Int, Int, Int)): Int =
    Integer.bitCount(a._1 ^ b._1) + Integer.bitCount(a._2 ^ b._2) +
      Integer.bitCount(a._3 ^ b._3) + Integer.bitCount(a._4 ^ b._4)

  private def mediaOf(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    spark.createDataset(rows.map { case (id, b) =>
      MediaRow(id, "image/x-portable-pixmap", Media.encodePpm(b))
    })
  }

  test("kernel matches the independent reference over random inputs") {
    val rnd = new Random(11)
    // 52 % 23 = 6 → h = 6: the empty-grid-row geometry (grid rows 3 and
    // 7 get no pixels; empty cells must read as bit 0, not diverge)
    val inputs = Seq(1, 40, 52, 299, 300, 920, 2048).map(len =>
      len.toLong -> Array.fill(len)(rnd.nextInt(256).toByte))
    val got = Media.ppmAHash(mediaOf(inputs)).collect()
      .map(r => r.doc_id -> ((r.b0, r.b1, r.b2, r.b3))).toMap
    inputs.foreach { case (id, src) =>
      assert(got(id) === referenceHash(src), s"len=$id")
    }
  }

  test("a one-byte delta-1 perturbation flips few bits; different content flips many") {
    val rnd = new Random(7)
    val base = Array.fill(600)(('a' + rnd.nextInt(26)).toByte)
    val nudged = base.clone(); nudged(0) = (nudged(0) + 1).toByte
    val near = hamming(referenceHash(base), referenceHash(nudged))
    assert(near <= 3, s"delta-1 first-byte nudge flipped $near bits")
    val other = Array.fill(600)(('a' + rnd.nextInt(26)).toByte)
    val far = hamming(referenceHash(base), referenceHash(other))
    assert(far > 3, s"independent content only $far bits apart")
  }

  test("pigeonhole join equals brute-force hamming <= 3 and the near path is non-vacuous") {
    val rnd = new Random(23)
    val texts = (0 until 40).map { i =>
      i.toLong -> Array.fill(300 + rnd.nextInt(200))(('a' + rnd.nextInt(26)).toByte)
    }
    // planted near twin: the smallest first-byte nudge of doc 0 that
    // flips 1–3 bits (a tiny delta often flips none — the hash is
    // SUPPOSED to absorb it; the non-vacuity claim needs a nudge that
    // lands in the near-but-not-exact window)
    val h0 = referenceHash(texts.head._2)
    val nudged = (1 to 120).iterator.map { d =>
      val n = texts.head._2.clone(); n(0) = (n(0) + d).toByte; n
    }.find { n =>
      val d = hamming(h0, referenceHash(n)); d > 0 && d <= 3
    }.getOrElse(fail("no first-byte nudge lands in 0 < hamming <= 3"))
    val all = texts ++ Seq(100L -> nudged, 101L -> texts(1)._2)
    val got = Media.phashNearDupPairs(mediaOf(all)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashes = all.map { case (id, b) => id -> referenceHash(b) }
    val want = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib && hamming(ha, hb) <= 3
    } yield (ia, ib, hamming(ha, hb).toLong)).toSet
    assert(got === want)
    assert(want.exists { case (a, b, d) => a == 0L && b == 100L && d > 0 },
      "planted near twin must flag with nonzero hamming")
    assert(want.exists { case (a, b, d) => b == 101L && d == 0 },
      "planted exact twin must flag at hamming 0")
  }

  test("delta pairs equal the full operator restricted to pairs touching the delta") {
    val rnd = new Random(41)
    val base = (0 until 40).map(i =>
      i.toLong -> Array.fill(300 + rnd.nextInt(200))(('a' + rnd.nextInt(26)).toByte)).toMap
    // plant: 35 (delta, %5==0) = exact copy of standing 1 (cross pair);
    // 30 = exact copy of 25 (both delta — the within-delta pair)
    val rows = base + (35L -> base(1L)) + (30L -> base(25L))
    val standingRows = rows.filter(_._1 % 5 != 0).toSeq
    val deltaRows = rows.filter(_._1 % 5 == 0).toSeq
    val inc = Media.phashNearDupDeltaPairs(mediaOf(standingRows), mediaOf(deltaRows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Media.phashNearDupPairs(mediaOf(rows.toSeq)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      .filter(t => t._1 % 5 == 0 || t._2 % 5 == 0)
    assert(inc === full)
    assert(inc.exists { case (a, b, _) => (a % 5 == 0) != (b % 5 == 0) },
      "cross delta-standing pair vacuous")
    assert(inc.exists { case (a, b, _) => a % 5 == 0 && b % 5 == 0 },
      "within-delta pair vacuous")
    // a re-ingested id is delta-authoritative: never pairs with its
    // own (identical, hamming-0) standing twin
    val re = Media.phashNearDupDeltaPairs(
      mediaOf(standingRows), mediaOf(standingRows.take(5)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    re.foreach { case (a, b) => assert(a != b) }
    // the maintained-state form (standing enters as the aHash table a
    // BandHashGate carries; only the delta decodes) is pair-identical
    // to the decode-both form
    val standingHashes = Media.ppmAHash(mediaOf(standingRows)).toDF()
    val idx = Media.phashNearDupDeltaPairsIndexed(standingHashes, mediaOf(deltaRows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(idx === inc, "indexed standing form diverged from decode-both")
  }

  test("delta fold is pair-identical with adaptive execution OFF (non-AQE fallback ckpt)") {
    // The delta band engine leans on AQE's runtime stage reuse to
    // materialize the shared keptD subtree once; a non-AQE session
    // takes the explicit-checkpoint fallback instead. Pin that both
    // regimes produce identical pairs (round-15 verdict: the AQE
    // assumption must be spec-pinned, not implicit).
    val rnd = new Random(43)
    val base = (0 until 30).map(i =>
      i.toLong -> Array.fill(300 + rnd.nextInt(200))(('a' + rnd.nextInt(26)).toByte)).toMap
    val rows = base + (25L -> base(1L)) + (20L -> base(15L))
    val standingRows = rows.filter(_._1 % 5 != 0).toSeq
    val deltaRows = rows.filter(_._1 % 5 == 0).toSeq
    val withAqe = Media.phashNearDupDeltaPairs(mediaOf(standingRows), mediaOf(deltaRows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(withAqe.nonEmpty, "fixture must produce pairs")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val noAqe = Media.phashNearDupDeltaPairs(mediaOf(standingRows), mediaOf(deltaRows))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(noAqe === withAqe, "non-AQE fallback diverged from the AQE fold")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("stop-band prune drops hot bands; pairs sharing only cold bands survive") {
    // 20 identical PATTERNED docs (all four of their band keys exceed
    // cap 10) + 2 identical docs of different patterned content (cold,
    // df=2 band keys): with cap 10 only the cold pair survives; with
    // the default cap the result equals brute force over all 22.
    val a = Array.tabulate(400)(i => (i % 251).toByte)
    val b = Array.tabulate(500)(i => ((i * 7 + 13) % 253).toByte)
    val ha = referenceHash(a); val hb = referenceHash(b)
    assert(hamming(ha, hb) > 3, "fixture contents must be far apart")
    assert(Seq(ha._1, ha._2, ha._3, ha._4)
      .zip(Seq(hb._1, hb._2, hb._3, hb._4)).exists(p => p._1 != p._2))
    val rows = (0 until 20).map(i => i.toLong -> a) ++
      Seq(100L -> b, 101L -> b)
    val pruned = Media.phashNearDupPairs(mediaOf(rows), maxBandFreq = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned === Set((100L, 101L)))
    val full = Media.phashNearDupPairs(mediaOf(rows)).count()
    assert(full === 20L * 19 / 2 + 1)
  }

  test("degenerate-band corpus: post-prune candidate volume is cap-bounded (letterbox mass)") {
    // the skew case a real media corpus hits: a large near-identical
    // mass (solid frames, letterbox bars) collapses onto FOUR band
    // keys whose df² candidates carry no signal. 300 identical docs at
    // cap 16: the prune must (a) emit zero pairs inside the mass,
    // (b) keep every post-prune (band, key) at df <= cap — the bound
    // that caps the join's candidate volume at bands · cap per row —
    // and (c) still find the scattered cold twins.
    val mass = Array.tabulate(420)(i => (i % 7).toByte) // near-constant
    val cold1 = Array.tabulate(500)(i => ((i * 11 + 3) % 251).toByte)
    val cold2 = Array.tabulate(460)(i => ((i * 17 + 5) % 249).toByte)
    val rows = (0 until 300).map(i => i.toLong -> mass) ++
      Seq(1000L -> cold1, 1001L -> cold1, 2000L -> cold2, 2001L -> cold2)
    val cap = 16L
    val got = Media.phashNearDupPairs(mediaOf(rows), maxBandFreq = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1000L, 1001L), (2000L, 2001L)),
      "mass pairs must be pruned; cold twins must survive")
    // the candidate bound itself: df of every SURVIVING band key <= cap
    val hashes = Media.ppmAHash(mediaOf(rows)).toDF()
    val dfs = Media.phashBandRows(hashes)
      .groupBy("band", "key").count()
    val maxSurviving = dfs.filter(col("count") <= cap)
      .agg(max("count")).head().getLong(0)
    val massDf = dfs.agg(max("count")).head().getLong(0)
    assert(massDf >= 300L, "the mass must actually be a hot band")
    assert(maxSurviving <= cap)
  }
}
