package graft

import graft.ops.{Media, MediaRow}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Perceptual audio near-dup (q122/q123): the 64-block |PCM| envelope
  * hash against an independent reference, perturbation sensitivity,
  * the shared pigeonhole engine's exactness over the audio hash, and
  * delta parity.
  */
class AudioPHashSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-audio-phash-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reference envelope hash the slow, obvious way — little-endian
    * signed 16-bit decode + grouped block sums, independent of the
    * kernel's single-pass accumulation. Pure JVM.
    */
  private def referenceHash(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    val (_, _, _, pcm) = Media.decodeWavBytes(Media.encodeWav(bytes))
    val m = pcm.length / 2
    val vals = Array.tabulate(m) { j =>
      val v = ((pcm(2 * j) & 0xff) | ((pcm(2 * j + 1) & 0xff) << 8))
      math.abs(if (v >= 32768) v - 65536 else v)
    }
    val blocks = vals.indices.groupBy(j => j * 64 / m)
    val totalSum = vals.map(_.toLong).sum
    val totalCnt = vals.length.toLong
    val bands = new Array[Int](4)
    for ((block, js) <- blocks) {
      val s = js.map(vals(_).toLong).sum
      if (s * totalCnt > totalSum * js.length)
        bands(block / 16) |= 1 << (block % 16)
    }
    (bands(0), bands(1), bands(2), bands(3))
  }

  private def hamming(a: (Int, Int, Int, Int), b: (Int, Int, Int, Int)): Int =
    Integer.bitCount(a._1 ^ b._1) + Integer.bitCount(a._2 ^ b._2) +
      Integer.bitCount(a._3 ^ b._3) + Integer.bitCount(a._4 ^ b._4)

  private def mediaOf(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    spark.createDataset(rows.map { case (id, b) =>
      MediaRow(id, "audio/wav", Media.encodeWav(b))
    })
  }

  test("kernel matches the independent reference over random inputs") {
    val rnd = new Random(17)
    // odd lengths → 2 channels, even → 1 (encodeWav: channels = 1 + l%2);
    // both interleavings must agree with the reference
    val inputs = Seq(1, 40, 299, 300, 511, 920, 2048).map(len =>
      len.toLong -> Array.fill(len)(rnd.nextInt(256).toByte))
    val got = Media.wavEnvelopeHash(mediaOf(inputs)).collect()
      .map(r => r.doc_id -> ((r.b0, r.b1, r.b2, r.b3))).toMap
    inputs.foreach { case (id, src) =>
      assert(got(id) === referenceHash(src), s"len=$id")
    }
  }

  test("small perturbations flip few bits; different content flips many") {
    val rnd = new Random(29)
    val base = Array.fill(600)(('a' + rnd.nextInt(26)).toByte)
    val nudged = base.clone(); nudged(0) = (nudged(0) + 1).toByte
    val near = hamming(referenceHash(base), referenceHash(nudged))
    assert(near <= 3, s"delta-1 first-byte nudge flipped $near bits")
    val other = Array.fill(600)(('a' + rnd.nextInt(26)).toByte)
    val far = hamming(referenceHash(base), referenceHash(other))
    assert(far > 3, s"independent content only $far bits apart")
  }

  test("pigeonhole join equals brute-force hamming <= 3 over the audio hash") {
    val rnd = new Random(31)
    val texts = (0 until 40).map { i =>
      i.toLong -> Array.fill(300 + rnd.nextInt(200))(('a' + rnd.nextInt(26)).toByte)
    }
    val h0 = referenceHash(texts.head._2)
    val nudged = (1 to 120).iterator.map { d =>
      val n = texts.head._2.clone(); n(0) = (n(0) + d).toByte; n
    }.find { n =>
      val d = hamming(h0, referenceHash(n)); d > 0 && d <= 3
    }.getOrElse(fail("no first-byte nudge lands in 0 < hamming <= 3"))
    val all = texts ++ Seq(100L -> nudged, 101L -> texts(1)._2)
    val got = Media.audioNearDupPairs(mediaOf(all)).collect()
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
    val rnd = new Random(37)
    val base = (0 until 40).map(i =>
      i.toLong -> Array.fill(300 + rnd.nextInt(200))(('a' + rnd.nextInt(26)).toByte)).toMap
    val rows = base + (35L -> base(1L)) + (30L -> base(25L))
    val standingRows = rows.filter(_._1 % 5 != 0).toSeq
    val deltaRows = rows.filter(_._1 % 5 == 0).toSeq
    val inc = Media.audioNearDupDeltaPairs(mediaOf(standingRows), mediaOf(deltaRows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Media.audioNearDupPairs(mediaOf(rows.toSeq)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      .filter(t => t._1 % 5 == 0 || t._2 % 5 == 0)
    assert(inc === full)
    assert(inc.exists { case (a, b, _) => (a % 5 == 0) != (b % 5 == 0) },
      "cross delta-standing pair vacuous")
    assert(inc.exists { case (a, b, _) => a % 5 == 0 && b % 5 == 0 },
      "within-delta pair vacuous")
    // the maintained-state form (standing enters as the already-hashed
    // table a BandHashGate carries; only the delta decodes) is
    // pair-identical to the decode-both form
    val standingHashes = Media.wavEnvelopeHash(mediaOf(standingRows)).toDF()
    val idx = Media.audioNearDupDeltaPairsIndexed(standingHashes, mediaOf(deltaRows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(idx === inc, "indexed standing form diverged from decode-both")
  }
}
