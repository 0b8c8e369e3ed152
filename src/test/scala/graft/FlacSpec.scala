package graft

import graft.ops.Media
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** FLAC (q141/q142): the compressed-AUDIO container completing the
  * codec trio (PNG lossless image, JPEG lossy image, FLAC lossless
  * audio). Losslessness is the load-bearing property: decode ∘ encode
  * must recover the WAV path's exact PCM, which is what lets the
  * q110/q122 oracles gate the FLAC queries verbatim. The decoder is
  * exercised beyond the encoder's emissions: a hand-built frame with
  * a nonzero partition order, the 5-bit Rice parameter method, and an
  * escape-coded partition must reconstruct against a direct
  * recurrence, and malformed streams must fail loudly.
  */
class FlacSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-flac-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The WAV-path PCM formulas (the encodeWav contract), widened by
    * the round-11 byte-width rule: every 7th length class is 24-bit,
    * with the payload still the cycled source bytes. */
  private def expectedPcm(src0: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    val src = if (src0.isEmpty) Array(' '.toByte) else src0
    val l = src.length
    val channels = 1 + l % 2
    val rate = 8000 + (l % 8) * 1000
    val n = 64 + l % 512
    val st = if (l % 7 == 3) 3 else 2
    val pcm = Array.tabulate(n * channels * st)(i => src(i % l))
    (channels, rate, n, pcm)
  }

  test("decode ∘ encode recovers the exact WAV-path PCM (lossless)") {
    val rnd = new Random(37)
    // 500 (mono) and 80/360 (stereo mid-side) land in the 24-bit
    // length class (l % 7 == 3)
    for (len <- Seq(1, 2, 9, 64, 80, 257, 360, 500, 1000, 3333)) {
      val src = Array.fill(len)(rnd.nextInt(256).toByte)
      val (ch, sr, n, pcm) = Media.decodeFlacBytes(Media.encodeFlac(src))
      val (ech, esr, en, epcm) = expectedPcm(src)
      assert((ch, sr, n) === ((ech, esr, en)), s"len=$len header")
      assert(java.util.Arrays.equals(pcm, epcm), s"len=$len pcm")
    }
  }

  test("subframe coverage: FIXED 0-2, VERBATIM, CONSTANT all roundtrip") {
    // l=1000 -> 552 samples -> 4 frames (160,160,160,72), mono:
    // subframe types cycle f%4 = FIXED0, FIXED1, FIXED2, VERBATIM
    val rnd = new Random(41)
    val varied = Array.fill(1000)(rnd.nextInt(256).toByte)
    val (_, _, _, pcm) = Media.decodeFlacBytes(Media.encodeFlac(varied))
    assert(java.util.Arrays.equals(pcm, expectedPcm(varied)._4))
    // one repeated byte -> every sample equal -> CONSTANT subframes
    val flat = Array.fill(300)('a'.toByte)
    val (_, _, _, fpcm) = Media.decodeFlacBytes(Media.encodeFlac(flat))
    assert(java.util.Arrays.equals(fpcm, expectedPcm(flat)._4))
    assert(fpcm.distinct.length <= 2, "flat source must decode flat")
  }

  /** Spec-local MSB-first bit writer for hand-building streams. */
  private final class BW {
    val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var n = 0
    def put(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1L).toInt; n += 1
        if (n == 8) { buf.write(acc); acc = 0; n = 0 }
        i -= 1
      }
    }
    def unary(q: Int): Unit = { (0 until q).foreach(_ => put(0, 1)); put(1, 1) }
    def align(): Unit = while (n != 0) put(0, 1)
    def bytes: Array[Byte] = { align(); buf.toByteArray }
  }

  test("hand-built 24-bit frame: warmup and residuals beyond 16-bit range") {
    // mono, 16 samples at 24 bits: FIXED order 1, warmup x0 = 100000
    // (doesn't fit in 16 bits), residuals stepping by thousands — a
    // stream no 16-bit path could decode by accident. PCM is 3-byte LE.
    val bs = 16
    val res = Array.tabulate(bs - 1)(i => (if (i % 2 == 0) 1 else -1) * (50000 + i * 1000))
    val x = new Array[Int](bs)
    x(0) = 100000
    for (t <- 1 until bs) x(t) = res(t - 1) + x(t - 1)
    assert(x.exists(v => v > 32767 || v < -32768), "fixture must exceed 16-bit range")
    val pcm = new Array[Byte](bs * 3)
    for (t <- 0 until bs; k <- 0 until 3) pcm(3 * t + k) = ((x(t) >> (8 * k)) & 0xff).toByte
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(pcm)
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new BW
    si.put(bs.toLong, 16); si.put(bs.toLong, 16)
    si.put(0L, 24); si.put(0L, 24)
    si.put(8000L, 20); si.put(0L, 3); si.put(23L, 5); si.put(bs.toLong, 36) // bps-1 = 23
    val siB = si.bytes
    out.write(0x80); out.write(0); out.write(0); out.write(siB.length + 16)
    out.write(siB); out.write(md5)
    // frame header: bs code 6 (8-bit follows), rate 0, mono, SIZE CODE
    // 6 = 24-bit (byte 3 = chan<<4 | size<<1 = 0x0c), frame number 0
    val hdr = Array[Int](0xff, 0xf8, 0x60, 0x0c, 0x00, bs - 1).map(_.toByte)
    val body = new BW
    body.put(0x09L << 1, 8) // FIXED order 1, no wasted bits
    body.put(x(0).toLong & 0xffffffL, 24) // 24-bit warmup
    body.put(0L, 2) // residual method 0: 4-bit params
    body.put(0L, 4) // partition order 0
    body.put(15L, 4) // escape
    body.put(18L, 5) // 18 raw bits per residual (|res| < 2^17)
    res.foreach(r => body.put(r.toLong & 0x3ffffL, 18))
    val bodyB = body.bytes
    val frame = hdr ++ Array(Media.flacCrc8(hdr, 0, hdr.length).toByte) ++ bodyB
    out.write(frame)
    val c16 = Media.flacCrc16(frame, 0, frame.length)
    out.write(c16 >> 8); out.write(c16 & 0xff)
    val (ch, sr, n, got) = Media.decodeFlacBytes(out.toByteArray)
    assert((ch, sr, n) === ((1, 8000, bs)))
    assert(java.util.Arrays.equals(got, pcm),
      s"got ${got.take(9).mkString(",")} want ${pcm.take(9).mkString(",")}")
  }

  test("hand-built frame: partition order 1, 5-bit Rice method, escape partition") {
    // mono, 32 samples, FIXED order 1. Warmup x0=100. Residuals:
    // partition 0 (15 residuals, after the warmup): escape, 9 raw bits
    // each, values -200..+220 stepping; partition 1 (16 residuals):
    // rice k=3, small values.
    val bs = 32
    val res0 = Array.tabulate(15)(i => -200 + i * 30) // |.| < 256 -> 9 bits signed
    val res1 = Array.tabulate(16)(i => (if (i % 2 == 0) i else -i) * 2)
    val x = new Array[Int](bs)
    x(0) = 100
    val allRes = res0 ++ res1
    for (t <- 1 until bs) x(t) = allRes(t - 1) + x(t - 1)
    // PCM bytes (LE) + md5 for STREAMINFO
    val pcm = new Array[Byte](bs * 2)
    for (t <- 0 until bs) {
      pcm(2 * t) = (x(t) & 0xff).toByte; pcm(2 * t + 1) = ((x(t) >> 8) & 0xff).toByte
    }
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(pcm)
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new BW
    si.put(bs.toLong, 16); si.put(bs.toLong, 16)
    si.put(0L, 24); si.put(0L, 24)
    si.put(8000L, 20); si.put(0L, 3); si.put(15L, 5); si.put(bs.toLong, 36)
    val siB = si.bytes
    out.write(0x80); out.write(0); out.write(0); out.write(siB.length + 16)
    out.write(siB); out.write(md5)
    // frame header: sync/fixed, bs code 6 (8-bit), rate code 0, mono,
    // 16 bps, frame number 0
    val hdr = Array[Int](0xff, 0xf8, 0x60, 0x08, 0x00, bs - 1).map(_.toByte)
    val body = new BW
    body.put(0x09L << 1, 8) // FIXED order 1, no wasted bits
    body.put(x(0).toLong & 0xffffL, 16) // warmup
    body.put(1L, 2) // residual method 1: 5-bit params
    body.put(1L, 4) // partition order 1
    body.put(31L, 5) // partition 0: escape
    body.put(9L, 5) // 9 raw bits per residual
    res0.foreach(r => body.put(r.toLong & 0x1ffL, 9))
    body.put(3L, 5) // partition 1: rice k=3
    res1.foreach { r =>
      val u = ((r << 1) ^ (r >> 31)).toLong & 0xffffffffL
      body.unary((u >>> 3).toInt); body.put(u, 3)
    }
    val bodyB = body.bytes
    val frame = hdr ++ Array(Media.flacCrc8(hdr, 0, hdr.length).toByte) ++ bodyB
    out.write(frame)
    val c16 = Media.flacCrc16(frame, 0, frame.length)
    out.write(c16 >> 8); out.write(c16 & 0xff)
    val (ch, sr, n, got) = Media.decodeFlacBytes(out.toByteArray)
    assert((ch, sr, n) === ((1, 8000, bs)))
    assert(java.util.Arrays.equals(got, pcm),
      s"got ${got.take(8).mkString(",")} want ${pcm.take(8).mkString(",")}")
  }

  test("hand-built LPC subframe: quantized coefficients, shift, Rice residuals") {
    // mono, 32 samples, LPC order 2, precision 12, shift 9,
    // coefficients [400, 112] (gain 512/512 = 1.0 — stable), rice k=2
    val bs = 32
    val coefs = Array(400, 112); val shift = 9
    val res = Array.tabulate(bs - 2)(i => (if (i % 3 == 0) -1 else 1) * (i % 5))
    val x = new Array[Int](bs)
    x(0) = 50; x(1) = 60
    for (t <- 2 until bs) {
      val pred = ((coefs(0).toLong * x(t - 1) + coefs(1).toLong * x(t - 2)) >> shift).toInt
      x(t) = res(t - 2) + pred
    }
    val pcm = new Array[Byte](bs * 2)
    for (t <- 0 until bs) {
      pcm(2 * t) = (x(t) & 0xff).toByte; pcm(2 * t + 1) = ((x(t) >> 8) & 0xff).toByte
    }
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(pcm)
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new BW
    si.put(bs.toLong, 16); si.put(bs.toLong, 16)
    si.put(0L, 24); si.put(0L, 24)
    si.put(8000L, 20); si.put(0L, 3); si.put(15L, 5); si.put(bs.toLong, 36)
    val siB = si.bytes
    out.write(0x80); out.write(0); out.write(0); out.write(siB.length + 16)
    out.write(siB); out.write(md5)
    val hdr = Array[Int](0xff, 0xf8, 0x60, 0x08, 0x00, bs - 1).map(_.toByte)
    val body = new BW
    body.put((0x20L | 1L) << 1, 8) // LPC order 2 (0b100001), no wasted bits
    body.put(x(0).toLong & 0xffffL, 16); body.put(x(1).toLong & 0xffffL, 16)
    body.put(11L, 4) // precision - 1
    body.put(shift.toLong & 0x1fL, 5)
    coefs.foreach(c => body.put(c.toLong & 0xfffL, 12))
    body.put(0L, 2) // method 0: 4-bit rice params
    body.put(0L, 4) // partition order 0
    body.put(2L, 4) // rice k=2
    res.foreach { r =>
      val u = ((r << 1) ^ (r >> 31)).toLong & 0xffffffffL
      body.unary((u >>> 2).toInt); body.put(u, 2)
    }
    val bodyB = body.bytes
    val frame = hdr ++ Array(Media.flacCrc8(hdr, 0, hdr.length).toByte) ++ bodyB
    out.write(frame)
    val c16 = Media.flacCrc16(frame, 0, frame.length)
    out.write(c16 >> 8); out.write(c16 & 0xff)
    val (ch, sr, n, got) = Media.decodeFlacBytes(out.toByteArray)
    assert((ch, sr, n) === ((1, 8000, bs)))
    assert(java.util.Arrays.equals(got, pcm),
      s"got ${got.take(6).mkString(",")} want ${pcm.take(6).mkString(",")}")
  }

  /** Hand-build a single-frame stereo container with VERBATIM
    * subframes under a given channel assignment (8/9/10) — the side
    * channel codes at 17 bits. */
  private def buildStereo(code: Int, left: Array[Int], right: Array[Int]): Array[Byte] = {
    val bs = left.length
    val pcm = new Array[Byte](bs * 4)
    for (t <- 0 until bs) {
      pcm(4 * t) = (left(t) & 0xff).toByte; pcm(4 * t + 1) = ((left(t) >> 8) & 0xff).toByte
      pcm(4 * t + 2) = (right(t) & 0xff).toByte; pcm(4 * t + 3) = ((right(t) >> 8) & 0xff).toByte
    }
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(pcm)
    val (ch0, ch1) = code match {
      case 8 => (left, Array.tabulate(bs)(t => left(t) - right(t)))
      case 9 => (Array.tabulate(bs)(t => left(t) - right(t)), right)
      case _ => (Array.tabulate(bs)(t => (left(t) + right(t)) >> 1),
        Array.tabulate(bs)(t => left(t) - right(t)))
    }
    val sideIdx = if (code == 9) 0 else 1
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new BW
    si.put(bs.toLong, 16); si.put(bs.toLong, 16)
    si.put(0L, 24); si.put(0L, 24)
    si.put(8000L, 20); si.put(1L, 3); si.put(15L, 5); si.put(bs.toLong, 36)
    val siB = si.bytes
    out.write(0x80); out.write(0); out.write(0); out.write(siB.length + 16)
    out.write(siB); out.write(md5)
    val hdr = Array[Int](0xff, 0xf8, 0x60, (code << 4) | 0x08, 0x00, bs - 1)
      .map(_.toByte)
    val body = new BW
    for ((chan, idx) <- Seq((ch0, 0), (ch1, 1))) {
      val bits = if (idx == sideIdx) 17 else 16
      body.put(1L << 1, 8) // VERBATIM, no wasted bits
      chan.foreach(v => body.put(v.toLong & ((1L << bits) - 1), bits))
    }
    val bodyB = body.bytes
    val frame = hdr ++ Array(Media.flacCrc8(hdr, 0, hdr.length).toByte) ++ bodyB
    out.write(frame)
    val c16 = Media.flacCrc16(frame, 0, frame.length)
    out.write(c16 >> 8); out.write(c16 & 0xff)
    out.toByteArray
  }

  test("stereo decorrelation: left-side, right-side, mid-side reconstruct L/R") {
    val rnd = new Random(61)
    val bs = 24
    val left = Array.fill(bs)(rnd.nextInt(65536) - 32768)
    val right = Array.fill(bs)(rnd.nextInt(65536) - 32768)
    for (code <- Seq(8, 9, 10)) {
      val (ch, sr, n, got) = Media.decodeFlacBytes(buildStereo(code, left, right))
      assert((ch, sr, n) === ((2, 8000, bs)), s"code=$code header")
      for (t <- 0 until bs) {
        val gl = ((got(4 * t) & 0xff) | (got(4 * t + 1) << 8)).toShort.toInt
        val gr = ((got(4 * t + 2) & 0xff) | (got(4 * t + 3) << 8)).toShort.toInt
        assert(gl === left(t) && gr === right(t), s"code=$code t=$t")
      }
    }
  }

  test("wasted bits: subframe codes at bps−k, decoder shifts back up") {
    val bs = 16
    val k = 3 // samples are multiples of 8
    val x = Array.tabulate(bs)(t => ((t * 37) % 1000 - 500) * 8)
    val pcm = new Array[Byte](bs * 2)
    for (t <- 0 until bs) {
      pcm(2 * t) = (x(t) & 0xff).toByte; pcm(2 * t + 1) = ((x(t) >> 8) & 0xff).toByte
    }
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(pcm)
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new BW
    si.put(bs.toLong, 16); si.put(bs.toLong, 16)
    si.put(0L, 24); si.put(0L, 24)
    si.put(8000L, 20); si.put(0L, 3); si.put(15L, 5); si.put(bs.toLong, 36)
    val siB = si.bytes
    out.write(0x80); out.write(0); out.write(0); out.write(siB.length + 16)
    out.write(siB); out.write(md5)
    val hdr = Array[Int](0xff, 0xf8, 0x60, 0x08, 0x00, bs - 1).map(_.toByte)
    val body = new BW
    body.put(1L, 1 + 6) // pad 0 + VERBATIM (000001), then wasted flag:
    body.put(1L, 1) // wasted-bits flag set
    body.unary(k - 1) // unary-coded count-1
    x.foreach(v => body.put((v >> k).toLong & ((1L << (16 - k)) - 1), 16 - k))
    val bodyB = body.bytes
    val frame = hdr ++ Array(Media.flacCrc8(hdr, 0, hdr.length).toByte) ++ bodyB
    out.write(frame)
    val c16 = Media.flacCrc16(frame, 0, frame.length)
    out.write(c16 >> 8); out.write(c16 & 0xff)
    val (ch, sr, n, got) = Media.decodeFlacBytes(out.toByteArray)
    assert((ch, sr, n) === ((1, 8000, bs)))
    assert(java.util.Arrays.equals(got, pcm))
  }

  test("the parser fails loudly: magic, reserved type, CRC-8, CRC-16, MD5, trailing, truncation") {
    val good = Media.encodeFlac("flac container test payload".getBytes("UTF-8"))
    val badMagic = good.clone(); badMagic(2) = 'X'.toByte
    assert(intercept[IllegalArgumentException](
      Media.decodeFlacBytes(badMagic)).getMessage.contains("magic"))
    // locate the first frame: metadata is 4 + 4 + 34 bytes
    val frame0 = 4 + 4 + 34
    assert((good(frame0) & 0xff) == 0xff, "frame sync position")
    // header is 6 bytes then CRC-8, then the first subframe byte
    val sfOff = frame0 + 7
    val rsv = good.clone(); rsv(sfOff) = (0x02 << 1).toByte // reserved type 2
    assert(intercept[IllegalArgumentException](
      Media.decodeFlacBytes(rsv)).getMessage.contains("reserved subframe"))
    val badC8 = good.clone(); badC8(frame0 + 6) = (badC8(frame0 + 6) ^ 0x5a).toByte
    assert(intercept[IllegalArgumentException](
      Media.decodeFlacBytes(badC8)).getMessage.contains("CRC-8"))
    // corrupt the LAST frame's CRC-16 (the stream tail)
    val badC16 = good.clone()
    badC16(badC16.length - 1) = (badC16(badC16.length - 1) ^ 0x5a).toByte
    assert(intercept[IllegalArgumentException](
      Media.decodeFlacBytes(badC16)).getMessage.contains("CRC-16"))
    // corrupt the STREAMINFO md5 (offset 4+4+18)
    val badMd5 = good.clone(); badMd5(4 + 4 + 18) = (badMd5(4 + 4 + 18) ^ 0x5a).toByte
    assert(intercept[IllegalArgumentException](
      Media.decodeFlacBytes(badMd5)).getMessage.contains("MD5"))
    val trail = java.util.Arrays.copyOf(good, good.length + 8)
    assert(intercept[IllegalArgumentException](
      Media.decodeFlacBytes(trail)).getMessage.toLowerCase.contains("sync"))
    assert(intercept[IllegalArgumentException](
      Media.decodeFlacBytes(java.util.Arrays.copyOf(good, good.length - 3)))
      .getMessage.toLowerCase.matches(".*(trunc|crc).*"))
  }

  test("container orthogonality: FLAC near-dup pairs equal the WAV path's") {
    val s = spark
    import s.implicits._
    val rnd = new Random(43)
    val docs = (1L to 40L).map(i =>
      (i, rnd.alphanumeric.take(80 + rnd.nextInt(700)).mkString)).toDF("doc_id", "text")
    val aug = docs.unionByName(docs.filter($"doc_id" % 13 === 0)
      .select(($"doc_id" + 100L).as("doc_id"), $"text"))
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val flacPairs = pairSet(Media.flacNearDupPairs(Media.asFlac(aug, "doc_id", "text")))
    val wavPairs = pairSet(Media.audioNearDupPairs(Media.asWav(aug, "doc_id", "text")))
    assert(flacPairs === wavPairs, "lossless => identical envelope pairs")
    assert(flacPairs.exists(p => p._2 - p._1 == 100L && p._3 == 0L),
      "exact twins at hamming 0")
  }
}
