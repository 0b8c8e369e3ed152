package graft

import graft.ops.{Media, MediaRow}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Baseline JPEG (q139/q140): the first LOSSY compressed container —
  * real Huffman entropy coding, dequantization, IDCT. The decoder is
  * exercised beyond the deterministic encoder's DC-only streams: a
  * hand-built stream with nonzero AC coefficients must match an
  * independent IDCT, and malformed streams must fail loudly.
  */
class JpegSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-jpeg-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The closed-form expected raster of the DC-only encoder: every
    * pixel of block b is clamp(2*trunc(S_b/128) + 128).
    */
  private def expectedRaster(src0: Array[Byte]): (Int, Int, Array[Byte]) = {
    val src = if (src0.isEmpty) Array(' '.toByte) else src0
    val l = src.length
    val w = 8 * (1 + l % 5); val h = 8 * (1 + l % 4)
    val out = new Array[Byte](w * h)
    for (by <- 0 until h / 8; bx <- 0 until w / 8) {
      var s = 0
      for (r <- 0 until 8; c <- 0 until 8)
        s += (src(((by * 8 + r) * w + bx * 8 + c) % l) & 0xff) - 128
      val v = math.max(0, math.min(255, 2 * (s / 128) + 128))
      for (r <- 0 until 8; c <- 0 until 8)
        out((by * 8 + r) * w + bx * 8 + c) = v.toByte
    }
    (w, h, out)
  }

  test("decode ∘ encode equals the closed-form per-block raster") {
    val rnd = new Random(29)
    for (len <- Seq(1, 9, 64, 257, 1000, 3333)) {
      val src = Array.fill(len)(rnd.nextInt(256).toByte)
      val (w, h, pix) = Media.decodeJpegBytes(Media.encodeJpegGray(src))
      val (ew, eh, epix) = expectedRaster(src)
      assert(w === ew && h === eh, s"len=$len dims")
      assert(java.util.Arrays.equals(pix, epix), s"len=$len raster")
    }
  }

  test("DC differential coding crosses blocks (non-trivial categories)") {
    // strongly varying content => large DC diffs => multi-bit
    // categories and both diff signs exercised. L=999 gives 40x32
    // (20 blocks); the 64-byte runs put different mixes in each block
    val src = Array.tabulate(999)(i => (if ((i / 64) % 2 == 0) 20 else 235).toByte)
    val (w, h, pix) = Media.decodeJpegBytes(Media.encodeJpegGray(src))
    val (_, _, epix) = expectedRaster(src)
    assert(java.util.Arrays.equals(pix, epix))
    assert(pix.distinct.length > 1, "blocks must differ")
    assert(w % 8 === 0 && h % 8 === 0)
  }

  test("nonzero AC coefficients decode through Huffman/zigzag/dequant/IDCT") {
    // splice an AC coefficient into a single-block stream by hand:
    // DC cat 0, then AC rs=0x01 (run 0, cat 1) with bit 1 => AC_zz1 =
    // +1, dequant x16, then EOB. Compare against a direct IDCT.
    // L=20 -> w=8, h=8: exactly one block
    val base = Media.encodeJpegGray(Array.fill(20)(0.toByte))
    // locate SOS payload end: entropy data starts after SOS segment
    // (FFDA len=8 payload 6 bytes) and ends before FFD9
    val sos = {
      var i = 2
      var at = -1
      while (at < 0 && i < base.length - 1) {
        if ((base(i) & 0xff) == 0xff && (base(i + 1) & 0xff) == 0xda) at = i
        else i += 1
      }
      at
    }
    assert(sos > 0)
    val entStart = sos + 2 + 8 // marker + len(2)+payload(6)
    val head = java.util.Arrays.copyOfRange(base, 0, entStart)
    // hand-built entropy bits for one block:
    //   DC: category 0 -> standard lum DC code "00" (2 bits)
    //   AC: symbol 0x01 -> standard lum AC code "00" (2 bits), 1 bit "1"
    //   AC: EOB (0x00) -> code "1010" (4 bits)
    // bits: 00 00 1 1010 -> 000011010 + pad 1111111 -> 0x0D 0x7F... build:
    val bits = "00" + "00" + "1" + "1010"
    val padded = bits + "1" * (8 - bits.length % 8)
    val ent = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(head); out.write(ent); out.write(0xff); out.write(0xd9)
    val (w, h, pix) = Media.decodeJpegBytes(out.toByteArray)
    assert(w === 8 && h === 8)
    // reference: coef(zigzag 1 -> raster (0,1)) = 16, IDCT directly
    val expect = Array.tabulate(64) { i =>
      val r = i / 8; val c = i % 8
      val sum = 0.7071067811865476 * 1.0 * 16 *
        math.cos((2 * r + 1) * 0 * math.Pi / 16) *
        math.cos((2 * c + 1) * 1 * math.Pi / 16)
      math.max(0, math.min(255, math.round(sum / 4.0 + 128.0).toInt)).toByte
    }
    assert(java.util.Arrays.equals(pix, expect),
      s"got ${pix.take(8).mkString(",")} want ${expect.take(8).mkString(",")}")
  }

  test("dense AC stream: multiple coefficients, ZRL runs, signed extend, nonzero DC") {
    // hand-assemble a single-block entropy stream from the standard
    // tables: DC diff +2 (cat 2), AC zz1 = +3 (run 0, cat 2), a ZRL
    // (16 zeros), AC zz20 = -1 (run 2 after the ZRL, cat 1), EOB —
    // exercising run-length skips, the ZRL symbol, and both extend
    // signs through Huffman codes of several lengths.
    val base = Media.encodeJpegGray(Array.fill(20)(0.toByte), restartEvery = 0)
    var i = 2
    while (!((base(i) & 0xff) == 0xff && (base(i + 1) & 0xff) == 0xda)) i += 1
    val entStart = i + 2 + 8
    val head = java.util.Arrays.copyOfRange(base, 0, entStart)
    val dcEnc = Media.huffCodes(Media.JpegDcBits, Media.JpegDcVals)
    val acEnc = Media.huffCodes(Media.JpegAcBits, Media.JpegAcVals)
    def codeBits(ce: (Int, Int)): String =
      Integer.toBinaryString(ce._1 | (1 << ce._2)).substring(1)
    val bits = new StringBuilder
    bits ++= codeBits(dcEnc(2)) ++= "10" // DC cat 2, diff +2
    bits ++= codeBits(acEnc(0x02)) ++= "11" // run 0, cat 2, +3 at zz1
    bits ++= codeBits(acEnc(0xf0)) // ZRL: 16 zeros (zz2..zz17)
    bits ++= codeBits(acEnc(0x21)) ++= "0" // run 2, cat 1, -1 at zz20
    bits ++= codeBits(acEnc(0x00)) // EOB
    val padded = bits.toString + "1" * ((8 - bits.length % 8) % 8)
    val ent = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
      .flatMap(b => if (b == 0xff.toByte) Seq(b, 0x00.toByte) else Seq(b)) // stuffing
    val out = new java.io.ByteArrayOutputStream()
    out.write(head); out.write(ent); out.write(0xff); out.write(0xd9)
    val (w, h, pix) = Media.decodeJpegBytes(out.toByteArray)
    assert(w === 8 && h === 8)
    // reference: dequantized coefficients through a direct IDCT
    val coef = new Array[Int](64)
    coef(0) = 2 * 16
    coef(Media.JpegZigzag(1)) = 3 * 16
    coef(Media.JpegZigzag(20)) = -1 * 16
    val expect = Array.tabulate(64) { idx =>
      val r = idx / 8; val c = idx % 8
      var sum = 0.0
      for (u <- 0 until 8; v <- 0 until 8) {
        val cu = if (u == 0) 0.7071067811865476 else 1.0
        val cv = if (v == 0) 0.7071067811865476 else 1.0
        sum += cu * cv * coef(u * 8 + v) *
          math.cos((2 * r + 1) * u * math.Pi / 16) *
          math.cos((2 * c + 1) * v * math.Pi / 16)
      }
      math.max(0, math.min(255, math.round(sum / 4.0 + 128.0).toInt)).toByte
    }
    assert(java.util.Arrays.equals(pix, expect),
      s"got ${pix.take(8).mkString(",")} want ${expect.take(8).mkString(",")}")
  }

  test("the parser fails loudly: SOI, progressive, truncation, trailing data, restarts") {
    val good = Media.encodeJpegGray("hello jpeg".getBytes("UTF-8"))
    val badSoi = good.clone(); badSoi(1) = 0x00
    assert(intercept[IllegalArgumentException](
      Media.decodeJpegBytes(badSoi)).getMessage.contains("SOI"))
    // SOF0 -> SOF2: the frame is now declared progressive, so the
    // baseline-framed scan (Ss=0, Se=63) is a malformed DC scan
    val prog = good.clone()
    var i = 2
    while (!((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0)) i += 1
    prog(i + 1) = 0xc2.toByte
    assert(intercept[IllegalArgumentException](
      Media.decodeJpegBytes(prog)).getMessage.contains("DC scan"))
    // truncated entropy data
    assert(intercept[IllegalArgumentException](
      Media.decodeJpegBytes(java.util.Arrays.copyOf(good, good.length - 4)))
      .getMessage.toLowerCase.contains("trunc"))
    // trailing bytes after EOI
    val trail = java.util.Arrays.copyOf(good, good.length + 2)
    assert(intercept[IllegalArgumentException](
      Media.decodeJpegBytes(trail)).getMessage.contains("trailing"))
  }

  test("lossy but perceptual: exact twins hash identical, the container is real entropy coding") {
    val s = spark
    import s.implicits._
    val rnd = new Random(31)
    val docs = (1L to 30L).map(i =>
      (i, rnd.alphanumeric.take(100 + rnd.nextInt(500)).mkString)).toDF("doc_id", "text")
    val aug = docs.unionByName(docs.filter($"doc_id" === 3L)
      .select(($"doc_id" + 100L).as("doc_id"), $"text"))
    val pairs = Media.jpegNearDupPairs(Media.asJpeg(aug, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.exists(p => p._1 == 3L && p._2 == 103L && p._3 == 0L),
      "exact twin must decode + hash identically")
  }

  // ───────────────────── progressive (SOF2) ─────────────────────

  test("progressive framing decodes to the baseline raster for every (Al, restart) mix") {
    // lengths 20..59 sweep Al = L%2, restartEvery = L%5 and all dim
    // combos: the four-scan ladder (DC first + DC refine + AC first
    // + AC refine) and the two-scan form must both land exactly on
    // the baseline twin's raster — framing is not allowed to show
    val rnd = new Random(91)
    for (len <- (20 to 59) ++ Seq(1, 997, 4096)) {
      val src = Array.fill(len)(rnd.nextInt(256).toByte)
      val (bw, bh, bpix) = Media.decodeJpegBytes(Media.encodeJpegGray(src))
      val (pw, ph, ppix) =
        Media.decodeJpegBytes(Media.encodeJpegGrayProgressive(src))
      assert(pw === bw && ph === bh, s"dims diverged at len=$len")
      assert(java.util.Arrays.equals(ppix, bpix),
        s"raster diverged at len=$len (al=${len % 2}, ri=${len % 5})")
      assert(java.util.Arrays.equals(ppix, expectedRaster(src)._3),
        s"closed form diverged at len=$len")
    }
  }

  test("hand-built color progressive: interleaved DC, AC refinement over nonzero history") {
    // 16x16 4:2:0 — luma 2x2 blocks in one MCU, chroma one block
    // each. Scans: interleaved DC first (Al=1), interleaved DC
    // refinement, luma AC first (band 1..5, Al=1), luma AC
    // REFINEMENT (Ah=1, Al=0: a correction bit over nonzero history
    // plus a newly-significant coefficient — the decoder path no
    // deterministic encoder emits), chroma bands never scanned (stay
    // zero). Verified against a direct IDCT of the accumulated
    // coefficients.
    val q = 16
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(out.write)
    }
    marker(0xd8)
    seg(0xdb, Array(0x00) ++ Array.fill(64)(q))
    seg(0xc2, Array(8, 0, 16, 0, 16, 3,
      1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0)) // 4:2:0
    seg(0xc4, Array(0x00) ++ Media.JpegDcBits.drop(1) ++ Media.JpegDcVals)
    seg(0xc4, Array(0x10) ++ Media.JpegAcBits.drop(1) ++ Media.JpegAcVals)
    val dcEnc = Media.huffCodes(Media.JpegDcBits, Media.JpegDcVals)
    val acEnc = Media.huffCodes(Media.JpegAcBits, Media.JpegAcVals)
    def codeBits(ce: (Int, Int)): String =
      Integer.toBinaryString(ce._1 | (1 << ce._2)).substring(1)
    def writeEnt(bits: String): Unit = {
      val padded = bits + "1" * ((8 - bits.length % 8) % 8)
      padded.grouped(8).map(s => Integer.parseInt(s, 2)).foreach { v =>
        out.write(v); if (v == 0xff) out.write(0x00)
      }
    }
    def codeBitsOf(v: Int, len: Int): String =
      Integer.toBinaryString(v | (1 << len)).substring(1)
    def dcBits(diff: Int): String = {
      val mag = math.abs(diff)
      val cat = 32 - Integer.numberOfLeadingZeros(mag)
      val ext = if (cat == 0) ""
        else codeBitsOf(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
      codeBits(dcEnc(cat)) + ext
    }
    // quantized DC targets: Y blocks 4,-3,2,0; Cb 5; Cr -2
    // scan 1 — interleaved DC first at Al=1: diffs of v>>1 per
    // component predictor: Y: 2,-2,1,0 -> diffs 2,-4,3,-1; Cb 2; Cr -1
    seg(0xda, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 1))
    writeEnt(dcBits(2) + dcBits(-4) + dcBits(3) + dcBits(-1) +
      dcBits(2) + dcBits(-1))
    // scan 2 — interleaved DC refinement (Ah=1, Al=0): raw LSBs in
    // MCU order Y1..Y4, Cb, Cr: 0,1,0,0,1,0
    seg(0xda, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10))
    writeEnt("010010")
    // scan 3 — luma AC first, band 1..5, Al=1: block 0 gets zz1 = +1
    // (<<1 = 2 raw), then EOB; blocks 1..3 EOB each
    seg(0xda, Array(1, 1, 0x00, 1, 5, 1))
    writeEnt(codeBits(acEnc(0x01)) + "1" + codeBits(acEnc(0x00)) +
      codeBits(acEnc(0x00)) * 3)
    // scan 4 — luma AC REFINEMENT, band 1..5, Ah=1, Al=0: block 0:
    // newly-significant zz2 = +1 after run 0 (symbol 0x01, sign bit
    // 1), correction bit 1 for the nonzero zz1 passed on the way
    // (2 -> 3), then EOB (eobrun=1, no history left in band);
    // blocks 1..3: EOB each (all-zero history)
    seg(0xda, Array(1, 1, 0x00, 1, 5, 0x10))
    writeEnt(codeBits(acEnc(0x01)) + "1" + "1" + codeBits(acEnc(0x00)) +
      codeBits(acEnc(0x00)) * 3)
    marker(0xd9)
    val (w, h, planes) = Media.decodeJpegPlanes(out.toByteArray)
    assert(w === 16 && h === 16 && planes.length === 3)
    // reference IDCT over the accumulated raw coefficients × quant
    def idctBlock(coef: Array[Int]): Array[Byte] = Array.tabulate(64) { idx =>
      val r = idx / 8; val c = idx % 8
      var sum = 0.0
      for (u <- 0 until 8; v <- 0 until 8) {
        val cu = if (u == 0) 0.7071067811865476 else 1.0
        val cv = if (v == 0) 0.7071067811865476 else 1.0
        sum += cu * cv * coef(u * 8 + v) *
          math.cos((2 * r + 1) * u * math.Pi / 16) *
          math.cos((2 * c + 1) * v * math.Pi / 16)
      }
      math.max(0, math.min(255, math.round(sum / 4.0 + 128.0).toInt)).toByte
    }
    def dcOnly(dc: Int): Array[Byte] =
      idctBlock(Array.tabulate(64)(i => if (i == 0) dc * q else 0))
    val y0coef = new Array[Int](64)
    y0coef(0) = 4 * q
    y0coef(Media.JpegZigzag(1)) = 3 * q // 2 from first scan + correction
    y0coef(Media.JpegZigzag(2)) = 1 * q // newly significant in refinement
    val yBlocks = Array(idctBlock(y0coef), dcOnly(-3), dcOnly(2), dcOnly(0))
    val (yw, yh, ypix) = planes(0)
    assert(yw === 16 && yh === 16)
    for (byy <- 0 until 2; bxx <- 0 until 2; r <- 0 until 8; c <- 0 until 8)
      assert(ypix((byy * 8 + r) * 16 + bxx * 8 + c) ===
        yBlocks(byy * 2 + bxx)(r * 8 + c),
        s"luma block ($bxx,$byy) pixel ($r,$c)")
    val (cbw, cbh, cbpix) = planes(1)
    assert(cbw === 8 && cbh === 8)
    assert(java.util.Arrays.equals(cbpix, dcOnly(5)), "Cb plane")
    assert(java.util.Arrays.equals(planes(2)._3, dcOnly(-2)), "Cr plane")
  }

  test("progressive fails loudly: scan-order violations and malformed headers") {
    val good = Media.encodeJpegGrayProgressive("progressive order".getBytes("UTF-8"))
    // sanity: the good stream decodes
    Media.decodeJpegBytes(good)
    // an AC scan arriving before the DC scan: build SOI..SOF2/DHT/DRI
    // then jump straight to an AC SOS
    def upToFirstSos(b: Array[Byte]): Array[Byte] = {
      var i = 2
      while (!((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xda)) i += 1
      java.util.Arrays.copyOfRange(b, 0, i)
    }
    val head = upToFirstSos(good)
    val acFirst = new java.io.ByteArrayOutputStream()
    acFirst.write(head)
    acFirst.write(Array[Byte](0xff.toByte, 0xda.toByte, 0, 8, 1, 1, 0, 1, 63, 0))
    assert(intercept[IllegalArgumentException](
      Media.decodeJpegBytes(acFirst.toByteArray))
      .getMessage.contains("before the component's DC scan"))
    // a DC refinement with no preceding DC first scan
    val refFirst = new java.io.ByteArrayOutputStream()
    refFirst.write(head)
    refFirst.write(Array[Byte](0xff.toByte, 0xda.toByte, 0, 8, 1, 1, 0, 0, 0, 0x10))
    assert(intercept[IllegalArgumentException](
      Media.decodeJpegBytes(refFirst.toByteArray))
      .getMessage.contains("successive-approximation"))
    // EOI with no scans at all
    val bare = new java.io.ByteArrayOutputStream()
    bare.write(head)
    bare.write(Array[Byte](0xff.toByte, 0xd9.toByte))
    assert(intercept[IllegalArgumentException](
      Media.decodeJpegBytes(bare.toByteArray))
      .getMessage.contains("DC scan"))
  }

  test("DC-only transcode: re-decoded raster equals the closed form per block") {
    val rnd = new Random(59)
    for (len <- Seq(20, 33, 497, 1200)) {
      val src = Array.fill(len)(rnd.nextInt(256).toByte)
      val blob = if (len % 2 == 0) Media.encodeJpegGray(src)
        else Media.encodeJpegGrayProgressive(src)
      val (w, h, pix) = Media.decodeJpegBytes(blob)
      val recoded = Media.encodeJpegGrayDcFromRaster(pix, w, h, 32)
      val (w2, h2, pix2) = Media.decodeJpegBytes(recoded)
      assert(w2 === w && h2 === h)
      // the input raster is block-constant, so the DC-only re-encode
      // is exact and every output pixel is clamp(128 + 4*trunc((v-128)/4))
      for (i <- 0 until w * h) {
        val v = pix(i) & 0xff
        val want = math.max(0, math.min(255, 128 + 4 * ((v - 128) / 4)))
        assert((pix2(i) & 0xff) === want, s"len=$len pixel $i: v=$v")
      }
    }
  }

  test("mixed baseline/progressive corpus: one operator, both framings, same digests") {
    val s = spark
    import s.implicits._
    val rnd = new Random(73)
    val docs = (1L to 20L).map(i =>
      (i, rnd.alphanumeric.take(50 + rnd.nextInt(400)).mkString)).toDF("doc_id", "text")
    val mixed = Media.decodeJpeg(Media.asJpegMixed(docs, "doc_id", "text"))
      .toDF().select("doc_id", "pixel_md5")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = Media.decodeJpeg(Media.asJpeg(docs, "doc_id", "text"))
      .toDF().select("doc_id", "pixel_md5")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(mixed === base,
      "framing leaked into decoded rasters across the mixed corpus")
  }
}
