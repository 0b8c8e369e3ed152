package graft

import graft.ops.{Media, MediaRow}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Video axis (q128/q129): the YUV4MPEG2 container — encode∘decode
  * identity, loud parser failures, per-frame aHash against an
  * independent reference, and the cross-video frame near-dup contract
  * (packed pigeonhole == brute force; same-doc pairs excluded).
  */
class VideoY4mSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-video-y4m-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reference per-frame aHash the slow, obvious way: decode, then for
    * each frame group pixels by grid cell and threshold against the
    * frame mean — independent of the kernel's single-pass loop. */
  private def referenceFrameHashes(bytes: Array[Byte]): Seq[(Int, Int, Int, Int)] = {
    val (w, h, frames) = Media.decodeY4mBytes(Media.encodeY4m(bytes))
    frames.toSeq.map { pix =>
      val cells = pix.indices.groupBy(p => (p / w) * 8 / h * 8 + (p % w) * 8 / w)
      val totalSum = pix.map(b => (b & 0xff).toLong).sum
      val totalCnt = pix.length.toLong
      val bands = new Array[Int](4)
      for ((cell, ps) <- cells) {
        val s = ps.map(p => (pix(p) & 0xff).toLong).sum
        if (s * totalCnt > totalSum * ps.length)
          bands(cell / 16) |= 1 << (cell % 16)
      }
      (bands(0), bands(1), bands(2), bands(3))
    }
  }

  private def mediaOf(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    spark.createDataset(rows.map { case (id, b) =>
      MediaRow(id, "video/x-yuv4mpeg", Media.encodeY4m(b))
    })
  }

  test("decode ∘ encode recovers dimensions, frame count, and plane bytes") {
    val rnd = new Random(23)
    for (len <- Seq(1, 7, 63, 300, 1201)) {
      val src = Array.fill(len)(rnd.nextInt(256).toByte)
      val (w, h, frames) = Media.decodeY4mBytes(Media.encodeY4m(src))
      assert(w === 8 + len % 24 && h === 6 + len % 17)
      assert(frames.length === 2 + len % 5)
      for ((fr, fi) <- frames.zipWithIndex; p <- 0 until w * h)
        assert(fr(p) === src((fi * w * h + p) % len),
          s"len=$len frame=$fi byte=$p")
    }
  }

  test("the parser fails loudly: magic, colourspace, truncation; tolerates FRAME params") {
    val good = Media.encodeY4m("hello video world".getBytes("UTF-8"))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException](
      Media.decodeY4mBytes(badMagic)).getMessage.contains("magic"))
    val cs = new String(good, "ISO-8859-1").replace("Cmono", "C411")
    assert(intercept[IllegalArgumentException](
      Media.decodeY4mBytes(cs.getBytes("ISO-8859-1"))).getMessage.contains("colourspace"))
    // 4:2:0 requires even dims: rebadging this ODD-dims mono stream fails
    val oddAs420 = new String(good, "ISO-8859-1").replace("Cmono", "C420jpeg")
    assert(intercept[IllegalArgumentException](
      Media.decodeY4mBytes(oddAs420.getBytes("ISO-8859-1")))
      .getMessage.contains("even dimensions"))
    assert(intercept[IllegalArgumentException](
      Media.decodeY4mBytes(java.util.Arrays.copyOf(good, good.length - 3)))
      .getMessage.contains("truncated"))
    // per spec, FRAME may carry parameters — the frame walk tolerates them
    val withParam = new String(good, "ISO-8859-1").replaceFirst("FRAME\n", "FRAME Xq\n")
    val (_, _, frames) = Media.decodeY4mBytes(withParam.getBytes("ISO-8859-1"))
    assert(frames.length === 2 + ("hello video world".length % 5))
    // adversarial header whose Int w*h wraps to 0 (65536 * 65536):
    // the Long-size check must reject it, not "decode" empty frames
    val overflow = "YUV4MPEG2 W65536 H65536 Cmono\nFRAME\n".getBytes("US-ASCII")
    assert(intercept[IllegalArgumentException](
      Media.decodeY4mBytes(overflow)).getMessage.contains("exceeds"))
  }

  test("4:2:0 payloads: luma extracted, chroma planes sized and skipped") {
    // l=40 -> w=24, h=12 (both even) -> the encoder emits C420jpeg
    val src = Array.tabulate(40)(i => (i * 7 + 3).toByte)
    val blob = Media.encodeY4m(src)
    assert(new String(blob, 0, 60, "ISO-8859-1").contains("C420jpeg"))
    val (w, h, frames) = Media.decodeY4mBytes(blob)
    assert(w === 24 && h === 12 && frames.length === 2)
    // the luma planes are the SAME cycled stream mono would carry
    val l = src.length
    for (f <- frames.indices; p <- 0 until w * h)
      assert(frames(f)(p) === src((f * w * h + p) % l), s"f=$f p=$p")
    // chroma truncation fails loudly (cut mid-way into the last Cr plane)
    assert(intercept[IllegalArgumentException](
      Media.decodeY4mBytes(java.util.Arrays.copyOf(blob, blob.length - 10)))
      .getMessage.contains("truncated"))
  }

  test("per-frame aHash matches the independent reference; frames hash independently") {
    val rnd = new Random(29)
    for (len <- Seq(40, 301, 997)) {
      val src = Array.fill(len)(rnd.nextInt(256).toByte)
      val got = Media.y4mFrameAHash(mediaOf(Seq(1L -> src)))
        .orderBy("frame").collect()
        .map(r => (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toSeq
      assert(got === referenceFrameHashes(src), s"len=$len")
    }
  }

  test("cross-video frame pairs: pigeonhole == brute force, same-doc pairs excluded") {
    val rnd = new Random(31)
    val base = Array.fill(600)(rnd.nextInt(256).toByte)
    val copy = base.clone() // every frame hamming 0 vs base
    val perturbed = base.clone(); perturbed(0) = (perturbed(0) ^ 0x7f).toByte
    val other = Array.fill(611)(rnd.nextInt(256).toByte) // different dims
    val media = mediaOf(Seq(1L -> base, 2L -> copy, 3L -> perturbed, 4L -> other))
    val got = Media.videoNearDupFramePairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // brute force over the reference hashes
    val hs = for {
      (id, src) <- Seq(1L -> base, 2L -> copy, 3L -> perturbed, 4L -> other)
      (hb, f) <- referenceFrameHashes(src).zipWithIndex
    } yield (id, f.toLong, hb)
    def ham(a: (Int, Int, Int, Int), b: (Int, Int, Int, Int)): Int =
      Integer.bitCount(a._1 ^ b._1) + Integer.bitCount(a._2 ^ b._2) +
        Integer.bitCount(a._3 ^ b._3) + Integer.bitCount(a._4 ^ b._4)
    val brute = (for {
      (ia, fa, ha) <- hs; (ib, fb, hb) <- hs
      if ia * 8 + fa < ib * 8 + fb && ia != ib && ham(ha, hb) <= 3
    } yield (ia, fa, ib, fb, ham(ha, hb).toLong)).toSet
    assert(got === brute)
    // the copy really pairs with base on every frame (hamming 0) —
    // at least the diagonal; random intra-video collisions may add more
    val nf = 2 + 600 % 5
    assert(got.count(p => p._1 == 1L && p._3 == 2L && p._5 == 0L) >= nf)
    assert(got.forall(p => p._1 != p._3))
  }

  test("frame-aware sampling digests the parser's frames, every Nth") {
    val rnd = new Random(43)
    val src = Array.fill(451)(rnd.nextInt(256).toByte)
    val (w, h, frames) = Media.decodeY4mBytes(Media.encodeY4m(src))
    val got = Media.y4mSampleFrames(mediaOf(Seq(5L -> src)), every = 2)
      .collect().map(r => (r.frame_idx, r.frame_md5)).toMap
    assert(got.keySet === frames.indices.filter(_ % 2 == 0).map(_.toLong).toSet)
    // digests identify the actual plane bytes (independent recompute)
    val md = java.security.MessageDigest.getInstance("MD5")
    for ((fi, d) <- got) {
      val hex = frames(fi.toInt).map(b => f"${b & 0xff}%02X").mkString
      val exp = md.digest(hex.getBytes("US-ASCII")).map(b => f"${b & 0xff}%02x").mkString
      assert(d === exp, s"frame $fi")
    }
    assert(w === 8 + 451 % 24 && h === 6 + 451 % 17)
  }

  test("delta ∘ standing ≡ full operator restricted to pairs touching the delta") {
    val rnd = new Random(37)
    val standing = (1L to 6L).map(i => i -> Array.fill(200 + 13 * i.toInt)(rnd.nextInt(256).toByte))
    val delta = Seq(
      10L -> standing(2)._2.clone(), // cross twin of standing doc 3
      11L -> Array.fill(517)(rnd.nextInt(256).toByte),
      12L -> Array.fill(517)(rnd.nextInt(256).toByte)) // dims match 11: within-delta shot
    val deltaIds = delta.map(_._1).toSet
    val deltaPairs = Media.videoNearDupDeltaFramePairs(
        mediaOf(standing), mediaOf(delta)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val fullRestricted = Media.videoNearDupFramePairs(mediaOf(standing ++ delta))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .filter(p => deltaIds(p._1) || deltaIds(p._3)).toSet
    assert(deltaPairs === fullRestricted)
    // the cross twin is really found: every frame of 10 pairs doc 3
    val nf3 = 2 + standing(2)._2.length % 5
    assert(deltaPairs.count(p => p._1 == 3L && p._3 == 10L && p._5 == 0L) >= nf3)
    // the maintained-state form (standing enters as the frame-aHash
    // table; only the delta's container bytes decode) is pair-identical
    val idx = Media.videoNearDupDeltaFramePairsIndexed(
        Media.y4mFrameAHash(mediaOf(standing)), mediaOf(delta)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(idx === deltaPairs, "indexed standing form diverged from decode-both")
  }

  private def monoClip(nf: Int, seed: Int): Array[Byte] = {
    val header = "YUV4MPEG2 W4 H4 F25:1 Ip A1:1 Cmono\n".getBytes("US-ASCII")
    header ++ (0 until nf).flatMap(f =>
      "FRAME\n".getBytes("US-ASCII").toSeq ++
        Array.fill(16)(((f * 31 + seed) % 251).toByte).toSeq).toArray
  }

  test("a 100-frame clip decodes, packs, and dedups end-to-end (round-15 widened key)") {
    // the historical (doc*8+frame) key capped real clips at 8 frames;
    // the 2^20 packing must take a long clip through the full
    // near-dup chain with frame indices round-tripping exactly
    val nf = 100
    import spark.implicits._
    val media = spark.createDataset(Seq(
      MediaRow(5L, "video/x-yuv4mpeg", monoClip(nf, 0)),
      MediaRow(9L, "video/x-yuv4mpeg", monoClip(nf, 0)))) // exact twin
    val pairs = Media.videoNearDupFramePairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // every frame f of clip 5 pairs with frame f of clip 9 at hamming 0
    val twins = pairs.filter(p => p._1 == 5L && p._3 == 9L && p._2 == p._4 && p._5 == 0L)
    assert(twins.map(_._2).toSet === (0L until nf.toLong).toSet)
    // frame indices above the old 8-frame cap survive the pack/unpack
    assert(pairs.exists(_._2 >= 64L))
    // mixedMediaHash takes the same clip (frame keys at the wide cap)
    val mixed = Media.mixedMediaHash(
        spark.createDataset(Seq(MediaRow(5L, "video/x-yuv4mpeg", monoClip(nf, 0)))))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(mixed.map(_._2).toSet ===
      (0L until nf.toLong).map(5L * graft.ops.Media.FrameKeyCap + _).toSet)
  }

  test("a clip at >= 2^20 parsed frames would fail the frame-key packing loudly") {
    // the guard moved with the cap: frame >= FrameKeyCap (or a doc id
    // that would overflow the pack) must be rejected, not silently
    // attributed to a neighboring doc_id. A 2^20-frame fixture is too
    // big to build here; pin the guard on the OVERFLOWING DOC ID arm,
    // which trips with a 2-frame clip.
    import spark.implicits._
    val media = spark.createDataset(Seq(
      MediaRow(Long.MaxValue / graft.ops.Media.FrameKeyCap + 1,
        "video/x-yuv4mpeg", monoClip(2, 0))))
    val e = intercept[Exception] {
      Media.videoNearDupFramePairs(media).collect()
    }
    def rootMsg(t: Throwable): String =
      (Option(t.getMessage).getOrElse("")) +
        Option(t.getCause).map(rootMsg).getOrElse("")
    assert(rootMsg(e).contains("outside the injective"), s"got: ${rootMsg(e).take(300)}")
  }
}
