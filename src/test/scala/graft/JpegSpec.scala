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
    // SOF0 -> SOF2 (progressive)
    val prog = good.clone()
    var i = 2
    while (!((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0)) i += 1
    prog(i + 1) = 0xc2.toByte
    assert(intercept[IllegalArgumentException](
      Media.decodeJpegBytes(prog)).getMessage.contains("baseline"))
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
}
