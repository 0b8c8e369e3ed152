package graft

import graft.ops.Media
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** YCbCr baseline JPEG (q143): the interleaved-MCU scan — 4:2:0
  * subsampling (2×2 luma + Cb + Cr per MCU), multiple quant/Huffman
  * tables (standard chrominance tables on the chroma channels),
  * per-component DC predictors, subsampled plane geometry. Each
  * decoded plane must match its DC-only closed form; 4:4:4 exercises
  * the same machinery at sampling 1×1.
  */
class JpegColorSpec extends AnyFunSuite {

  /** Closed-form expected plane: every pixel of block (by,bx) is
    * clamp(128 + scale·trunc(S/(8q))), S the level-shifted block sum
    * over src cycled with phase `off`.
    */
  private def expectedPlane(
      src: Array[Byte], pw: Int, ph: Int, off: Int, q: Int, scale: Int): Array[Byte] = {
    val l = src.length
    val out = new Array[Byte](pw * ph)
    for (by <- 0 until ph / 8; bx <- 0 until pw / 8) {
      var s = 0
      for (r <- 0 until 8; c <- 0 until 8)
        s += (src((((by * 8 + r) * pw + bx * 8 + c) + off) % l) & 0xff) - 128
      val v = math.max(0, math.min(255, 128 + scale * (s / (8 * q))))
      for (r <- 0 until 8; c <- 0 until 8)
        out((by * 8 + r) * pw + bx * 8 + c) = v.toByte
    }
    out
  }

  private def check(src: Array[Byte], subsample: Boolean): Unit = {
    val l = src.length
    val mcu = if (subsample) 16 else 8
    val ew = mcu * (1 + l % 3); val eh = mcu * (1 + l % 2)
    val ecw = if (subsample) ew / 2 else ew
    val ech = if (subsample) eh / 2 else eh
    val (w, h, planes) = Media.decodeJpegPlanes(Media.encodeJpegColor(src, subsample))
    assert((w, h) === ((ew, eh)), s"l=$l dims")
    assert(planes.length === 3)
    val (yw, yh, y) = planes(0)
    assert((yw, yh) === ((ew, eh)))
    assert(java.util.Arrays.equals(y, expectedPlane(src, ew, eh, 0, 16, 2)),
      s"l=$l luma")
    val (cbw, cbh, cb) = planes(1)
    val (crw, crh, cr) = planes(2)
    assert((cbw, cbh) === ((ecw, ech)), s"l=$l chroma dims")
    assert((crw, crh) === ((ecw, ech)))
    assert(java.util.Arrays.equals(cb, expectedPlane(src, ecw, ech, 17, 24, 3)),
      s"l=$l cb")
    assert(java.util.Arrays.equals(cr, expectedPlane(src, ecw, ech, 41, 24, 3)),
      s"l=$l cr")
  }

  test("4:2:0 decode ∘ encode equals the per-plane closed forms") {
    val rnd = new Random(47)
    for (len <- Seq(1, 9, 42, 64, 257, 1000, 3333))
      check(Array.fill(len)(rnd.nextInt(256).toByte), subsample = true)
  }

  test("4:4:4 decode ∘ encode equals the per-plane closed forms") {
    val rnd = new Random(53)
    for (len <- Seq(5, 100, 999))
      check(Array.fill(len)(rnd.nextInt(256).toByte), subsample = false)
  }

  test("4:2:2 and 4:4:0 interleaves decode to their per-plane closed forms") {
    val rnd = new Random(67)
    for ((sh, sv) <- Seq((2, 1), (1, 2)); len <- Seq(33, 500, 1234)) {
      val src = Array.fill(len)(rnd.nextInt(256).toByte)
      val l = src.length
      val ew = 8 * sh * (1 + l % 3); val eh = 8 * sv * (1 + l % 2)
      val ecw = ew / sh; val ech = eh / sv
      val (w, h, planes) =
        Media.decodeJpegPlanes(Media.encodeJpegColorSampled(src, sh, sv))
      assert((w, h) === ((ew, eh)), s"$sh:$sv l=$l dims")
      assert(java.util.Arrays.equals(planes(0)._3, expectedPlane(src, ew, eh, 0, 16, 2)),
        s"$sh:$sv l=$l luma")
      assert((planes(1)._1, planes(1)._2) === ((ecw, ech)), s"$sh:$sv l=$l chroma dims")
      assert(java.util.Arrays.equals(planes(1)._3, expectedPlane(src, ecw, ech, 17, 24, 3)),
        s"$sh:$sv l=$l cb")
      assert(java.util.Arrays.equals(planes(2)._3, expectedPlane(src, ecw, ech, 41, 24, 3)),
        s"$sh:$sv l=$l cr")
    }
  }

  test("per-component DC predictors are independent (varying content)") {
    // strongly varying luma with flat chroma phases would cross-corrupt
    // if the predictors were shared — the closed-form check above
    // catches it, but pin a case with large alternating DC swings
    val src = Array.tabulate(1000)(i => (if ((i / 64) % 2 == 0) 10 else 245).toByte)
    check(src, subsample = true)
  }

  test("restart intervals: framing is invariant, the RSTn cycle is verified") {
    val rnd = new Random(59)
    val src = Array.fill(997)(rnd.nextInt(256).toByte) // 48x32 luma = 6 MCUs
    // same decoded planes with and without restart markers
    val plain = Media.decodeJpegPlanes(Media.encodeJpegColor(src, subsample = true,
      restartEvery = 0))
    val restarted = Media.decodeJpegPlanes(Media.encodeJpegColor(src, subsample = true,
      restartEvery = 1)) // a marker between every MCU: max predictor resets
    assert(plain._1 === restarted._1 && plain._2 === restarted._2)
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(plain._3(c)._3, restarted._3(c)._3),
        s"plane $c must be framing-invariant")
    // corrupt one RSTn's cycle index -> loud failure
    val enc = Media.encodeJpegColor(src, subsample = true, restartEvery = 1)
    var i = 2
    var rstAt = -1
    while (rstAt < 0 && i < enc.length - 1) {
      // the first restart marker inside the scan (skip the DRI segment,
      // whose payload can't contain 0xFFD0..D7 by construction here)
      if ((enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xd0) rstAt = i
      else i += 1
    }
    assert(rstAt > 0, "expected an RST0 in the stream")
    val bad = enc.clone(); bad(rstAt + 1) = 0xd3.toByte
    assert(intercept[IllegalArgumentException](
      Media.decodeJpegPlanes(bad)).getMessage.contains("RST"))
    // gray path: same invariance
    val g0 = Media.decodeJpegBytes(Media.encodeJpegGray(src, restartEvery = 0))
    val g2 = Media.decodeJpegBytes(Media.encodeJpegGray(src, restartEvery = 2))
    assert(java.util.Arrays.equals(g0._3, g2._3))
  }

  test("full encoder: DCT/quant/run-length AC transcode round-trips through the decoder") {
    // block-constant rasters survive EXACTLY at high quality: their
    // DCT is DC-only, and qt(0)=2 at q95 divides the DC evenly
    val rnd = new Random(71)
    val src = Array.fill(777)(rnd.nextInt(256).toByte)
    val (w, h, pix) = Media.decodeJpegBytes(Media.encodeJpegGray(src))
    val exact = Media.encodeJpegRealGray(pix, w, h, 95)
    val (w1, h1, pix1) = Media.decodeJpegBytes(exact)
    assert(w1 === w && h1 === h)
    assert(java.util.Arrays.equals(pix1, pix),
      "block-constant raster must round-trip exactly at q95")
    // arbitrary rasters: lossy but bounded — PSNR at q35 over a
    // genuinely varying raster stays above 20 dB, and the stream
    // passes the validating decoder (structure, stuffing, Huffman)
    val noisy = Array.tabulate(40 * 24)(i =>
      ((math.sin(i * 0.7) * 90 + (i % 13) * 7 + 128).toInt & 0xff).toByte)
    val enc = Media.encodeJpegRealGray(noisy, 40, 24, 35)
    val (w2, h2, dec) = Media.decodeJpegBytes(enc)
    assert(w2 === 40 && h2 === 24)
    var se = 0L
    for (i <- noisy.indices) {
      val d = (noisy(i) & 0xff) - (dec(i) & 0xff); se += d.toLong * d
    }
    val psnr = 10.0 * math.log10(255.0 * 255.0 * noisy.length / se.toDouble)
    // the raster is near-Nyquist on purpose (sin(0.7i)) — brutal for
    // any DCT codec; ~19.8 dB at q35 is the correct-codec range here
    assert(psnr > 18.0, f"q35 PSNR $psnr%.1f dB too low")
    // higher quality → higher fidelity and (on this raster) more bytes
    val enc90 = Media.encodeJpegRealGray(noisy, 40, 24, 90)
    val (_, _, dec90) = Media.decodeJpegBytes(enc90)
    var se90 = 0L
    for (i <- noisy.indices) {
      val d = (noisy(i) & 0xff) - (dec90(i) & 0xff); se90 += d.toLong * d
    }
    assert(se90 < se, "q90 must beat q35 in MSE")
    // non-multiple-of-8 dims: border replication, dims preserved
    val odd = Array.tabulate(13 * 9)(i => (i * 19 + 5).toByte)
    val (w3, h3, dec3) = Media.decodeJpegBytes(Media.encodeJpegRealGray(odd, 13, 9, 85))
    assert(w3 === 13 && h3 === 9 && dec3.length === 13 * 9)
  }

  test("full COLOR encoder: 4:2:0 transcode exact at q95 on DC-only input, bounded at q35") {
    val rnd = new Random(73)
    val src = Array.fill(888)(rnd.nextInt(256).toByte)
    val (w, h, planes) = Media.decodeJpegPlanes(Media.encodeJpegColor(src))
    // block-constant planes + q95 (both qt DCs divide evenly) => exact
    val exact = Media.encodeJpegRealColor(
      planes(0)._3, planes(1)._3, planes(2)._3, w, h, 95)
    val (w1, h1, planes1) = Media.decodeJpegPlanes(exact)
    assert(w1 === w && h1 === h)
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(planes1(c)._3, planes(c)._3), s"plane $c")
    // lossy q35: all planes reconstruct within a sane PSNR
    val noisyY = Array.tabulate(32 * 16)(i =>
      ((math.sin(i * 0.6) * 80 + (i % 11) * 9 + 128).toInt & 0xff).toByte)
    val noisyCb = Array.tabulate(16 * 8)(i => ((i * 23 + 7) & 0xff).toByte)
    val noisyCr = Array.tabulate(16 * 8)(i => ((i * 31 + 3) & 0xff).toByte)
    val enc = Media.encodeJpegRealColor(noisyY, noisyCb, noisyCr, 32, 16, 35)
    val (w2, h2, dec) = Media.decodeJpegPlanes(enc)
    assert(w2 === 32 && h2 === 16 && dec(1)._1 === 16 && dec(1)._2 === 8)
    var se = 0L; var n = 0L
    for ((orig, c) <- Seq(noisyY, noisyCb, noisyCr).zipWithIndex) {
      val got = dec(c)._3
      for (i <- orig.indices) {
        val d = (orig(i) & 0xff) - (got(i) & 0xff); se += d.toLong * d
      }
      n += orig.length
    }
    val psnr = 10.0 * math.log10(255.0 * 255.0 * n / se.toDouble)
    assert(psnr > 18.0, f"color q35 PSNR $psnr%.1f dB too low")
  }

  test("the parser fails loudly on bad color structure") {
    val good = Media.encodeJpegColor("jpeg color fail cases".getBytes("UTF-8"))
    // SOF0 sampling factor 3 for luma
    var i = 2
    while (!((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0)) i += 1
    val sofPay = i + 4 // marker(2) + len(2)
    val badSamp = good.clone()
    badSamp(sofPay + 5 + 1 + 1) = 0x33.toByte // Y sampling h=3,v=3
    assert(intercept[IllegalArgumentException](
      Media.decodeJpegPlanes(badSamp)).getMessage.contains("sampling"))
    // scan referencing an unknown component id
    var j = 2
    while (!((good(j) & 0xff) == 0xff && (good(j + 1) & 0xff) == 0xda)) j += 1
    val badScan = good.clone()
    badScan(j + 5) = 0x07.toByte // first scan component id 1 -> 7
    assert(intercept[IllegalArgumentException](
      Media.decodeJpegPlanes(badScan)).getMessage.contains("unknown component"))
    // gray entry refuses color streams
    assert(intercept[IllegalArgumentException](
      Media.decodeJpegBytes(good)).getMessage.contains("grayscale"))
  }

  test("DC-only color transcode: re-decoded planes equal the closed form") {
    val rnd = new scala.util.Random(67)
    for (len <- Seq(25, 300, 997)) {
      val src = Array.fill(len)(rnd.nextInt(256).toByte)
      val (w, h, planes) = Media.decodeJpegPlanes(Media.encodeJpegColor(src))
      val recoded = Media.encodeJpegColorDcFromPlanes(planes, w, h, 32, 48)
      val (w2, h2, planes2) = Media.decodeJpegPlanes(recoded)
      assert(w2 === w && h2 === h)
      // block-constant inputs make the DC-only re-encode exact:
      // luma v2 = clamp(128 + 4*trunc((v-128)/4)); chroma scale 6
      for (pli <- 0 until 3) {
        val scale = if (pli == 0) 4 else 6
        val (_, _, in) = planes(pli)
        val (_, _, outP) = planes2(pli)
        assert(in.length === outP.length)
        for (i <- in.indices) {
          val v = in(i) & 0xff
          val want = math.max(0, math.min(255, 128 + scale * ((v - 128) / scale)))
          assert((outP(i) & 0xff) === want, s"len=$len plane $pli pixel $i: v=$v")
        }
      }
    }
  }
}
