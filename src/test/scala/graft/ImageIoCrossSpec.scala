package graft

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import graft.ops.{Interop, Media}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Decoder independence: cross-validation against `javax.imageio`, the
  * JDK's own (libjpeg-derived) codec stack. Every other image assert
  * in this repo decodes streams THIS repo encoded; a matched
  * encoder/decoder defect pair would cancel there. These specs break
  * the circularity in both directions:
  *   - foreign streams in: ImageIO-encoded PNGs (all the color types
  *     its writers emit) and JPEGs decode through this engine's
  *     validating parsers, pixel-exact for lossless/exact classes and
  *     PSNR-bounded against ImageIO's own decode for lossy ones;
  *   - this repo's streams out: encodePng (both interlace classes) and
  *     the DC-only JPEG encoders decode identically under ImageIO.
  */
class ImageIoCrossSpec extends AnyFunSuite {

  private def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length, s"psnr: ${a.length} vs ${b.length} bytes")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      se += d.toDouble * d
      i += 1
    }
    if (se == 0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 * a.length / se)
  }

  private def srcBytes(rnd: Random): Array[Byte] =
    Array.fill(20 + rnd.nextInt(500))(rnd.nextInt(256).toByte)

  // ── PNG: foreign streams in ──

  test("imageio-encoded RGB PNG decodes pixel-exact") {
    val rnd = new Random(4201)
    (0 until 60).foreach { _ =>
      val (w, h, raster) = Interop.rgbRaster(srcBytes(rnd))
      val blob = Interop.imageIoPngBytes(w, h, raster)
      val (dw, dh, pix) = Media.decodePngBytes(blob)
      assert(dw == w && dh == h)
      assert(java.util.Arrays.equals(pix, raster))
    }
  }

  test("imageio-encoded GRAY PNG decodes to the replicated-RGB normalization") {
    val rnd = new Random(4202)
    (0 until 30).foreach { _ =>
      val w = 5 + rnd.nextInt(40); val h = 4 + rnd.nextInt(25)
      val gray = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setSamples(0, 0, w, h, 0, gray.map(_ & 0xff))
      val out = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, "png", out))
      val blob = out.toByteArray
      // reference: ImageIO's own raster read of the SAME stream (the
      // write path may not be sample-preserving through color
      // management — decoder agreement is the contract, not write
      // fidelity)
      val (rw, rh, ref) = Interop.imageIoDecodeGray(blob)
      val (dw, dh, pix) = Media.decodePngBytes(blob)
      assert(dw == rw && dh == rh && dw == w && dh == h)
      var i = 0
      while (i < w * h) {
        assert(pix(3 * i) == ref(i) && pix(3 * i + 1) == ref(i) &&
          pix(3 * i + 2) == ref(i), s"pixel $i")
        i += 1
      }
    }
  }

  test("imageio-encoded RGBA PNG decodes with alpha dropped") {
    val rnd = new Random(4203)
    (0 until 30).foreach { _ =>
      val w = 5 + rnd.nextInt(40); val h = 4 + rnd.nextInt(25)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
      val argb = Array.fill(w * h)(rnd.nextInt())
      img.setRGB(0, 0, w, h, argb, 0, w)
      val out = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, "png", out))
      val blob = out.toByteArray
      val (dw, dh, pix) = Media.decodePngBytes(blob)
      assert(dw == w && dh == h)
      var i = 0
      while (i < w * h) {
        assert((pix(3 * i) & 0xff) == ((argb(i) >> 16) & 0xff), s"r $i")
        assert((pix(3 * i + 1) & 0xff) == ((argb(i) >> 8) & 0xff), s"g $i")
        assert((pix(3 * i + 2) & 0xff) == (argb(i) & 0xff), s"b $i")
        i += 1
      }
    }
  }

  test("imageio-encoded PALETTE PNG decodes through PLTE lookup") {
    val rnd = new Random(4204)
    (0 until 20).foreach { _ =>
      val w = 5 + rnd.nextInt(40); val h = 4 + rnd.nextInt(25)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED)
      // draw through setRGB: values snap to the default 216-color cube
      (0 until w * h).foreach(i => img.setRGB(i % w, i / w, rnd.nextInt()))
      val out = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, "png", out))
      val blob = out.toByteArray
      // IndexColorModel is sRGB: getRGB returns exact palette entries
      val ref = img.getRGB(0, 0, w, h, null, 0, w)
      val (dw, dh, pix) = Media.decodePngBytes(blob)
      assert(dw == w && dh == h)
      var i = 0
      while (i < w * h) {
        assert((pix(3 * i) & 0xff) == ((ref(i) >> 16) & 0xff), s"r $i")
        assert((pix(3 * i + 1) & 0xff) == ((ref(i) >> 8) & 0xff), s"g $i")
        assert((pix(3 * i + 2) & 0xff) == (ref(i) & 0xff), s"b $i")
        i += 1
      }
    }
  }

  // ── PNG: this repo's streams out ──

  test("encodePng streams (both interlace classes) decode identically under imageio") {
    val rnd = new Random(4205)
    var interlaced = 0
    (0 until 60).foreach { _ =>
      val src = srcBytes(rnd)
      if (src.length % 6 == 1) interlaced += 1
      val blob = Media.encodePng(src)
      val (w, h, ours) = Media.decodePngBytes(blob)
      val (iw, ih, theirs) = Interop.imageIoDecodeRgb(blob)
      assert(iw == w && ih == h)
      assert(java.util.Arrays.equals(ours, theirs))
    }
    // the length distribution must actually exercise Adam7
    assert(interlaced >= 3, s"only $interlaced interlaced samples")
  }

  // ── JPEG: foreign streams in ──

  test("imageio JPEG at quality 1.0 over block-constant rasters decodes EXACT") {
    val rnd = new Random(4206)
    (0 until 60).foreach { _ =>
      val (w, h, raster) = Interop.grayBlockRaster(srcBytes(rnd))
      val blob = Interop.imageIoJpegGrayBytes(w, h, raster, 1.0f)
      val (dw, dh, pix) = Media.decodeJpegBytes(blob)
      assert(dw == w && dh == h)
      assert(java.util.Arrays.equals(pix, raster),
        s"${w}x$h block-constant raster not exact through quality-1.0 round")
    }
  }

  test("imageio GRAY JPEG (general content, several qualities) agrees with imageio's own decode") {
    val rnd = new Random(4207)
    Seq(0.5f, 0.75f, 0.9f).foreach { q =>
      (0 until 15).foreach { _ =>
        val w = 8 + rnd.nextInt(56); val h = 8 + rnd.nextInt(40)
        // smooth-ish content: random walk keeps energy low-frequency so
        // quality differences don't swamp the decoder comparison
        val gray = new Array[Byte](w * h)
        var v = 128
        var i = 0
        while (i < w * h) {
          v = math.max(0, math.min(255, v + rnd.nextInt(31) - 15))
          gray(i) = v.toByte
          i += 1
        }
        val blob = Interop.imageIoJpegGrayBytes(w, h, gray, q)
        val (dw, dh, ours) = Media.decodeJpegBytes(blob)
        val (iw, ih, theirs) = Interop.imageIoDecodeGray(blob)
        assert(dw == w && dh == h && iw == w && ih == h)
        // same coefficients, two IDCT implementations: near-identical
        val p = psnr(ours, theirs)
        assert(p > 40.0, s"q=$q ${w}x$h: decoder disagreement PSNR $p dB")
      }
    }
  }

  test("imageio COLOR JPEG (4:2:0) luma agrees with Y recomputed from imageio's RGB decode") {
    val rnd = new Random(4208)
    (0 until 15).foreach { _ =>
      val w = 16 + rnd.nextInt(48); val h = 16 + rnd.nextInt(32)
      val rgb = new Array[Byte](w * h * 3)
      var v = 128
      var i = 0
      while (i < rgb.length) {
        v = math.max(0, math.min(255, v + rnd.nextInt(21) - 10))
        rgb(i) = v.toByte
        i += 1
      }
      val blob = Interop.imageIoJpegRgbBytes(w, h, rgb, 0.9f)
      val (dw, dh, planes) = Media.decodeJpegPlanes(blob)
      assert(dw == w && dh == h)
      assert(planes.length == 3, "color stream must decode 3 planes")
      val (yw, yh, yPlane) = planes(0)
      assert(yw == w && yh == h, "luma plane is full-resolution at max sampling")
      val (iw, ih, theirRgb) = Interop.imageIoDecodeRgb(blob)
      assert(iw == w && ih == h)
      // BT.601 luma from their post-upsample RGB: a lossy path (color
      // convert + chroma upsample round-trip), so the bound is looser
      val theirY = new Array[Byte](w * h)
      i = 0
      while (i < w * h) {
        val r = theirRgb(3 * i) & 0xff
        val g = theirRgb(3 * i + 1) & 0xff
        val b = theirRgb(3 * i + 2) & 0xff
        theirY(i) = math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt
          .min(255).max(0).toByte
        i += 1
      }
      val p = psnr(yPlane, theirY)
      assert(p > 30.0, s"${w}x$h: luma disagreement PSNR $p dB")
    }
  }

  // ── JPEG: this repo's streams out ──

  test("this repo's DC-only JPEGs (baseline + progressive) decode EXACT under imageio") {
    val rnd = new Random(4209)
    (0 until 40).foreach { t =>
      val src = srcBytes(rnd)
      val blob =
        if (t % 2 == 0) Media.encodeJpegGray(src)
        else Media.encodeJpegGrayProgressive(src)
      val (w, h, ours) = Media.decodeJpegBytes(blob)
      val (iw, ih, theirs) = Interop.imageIoDecodeGray(blob)
      assert(iw == w && ih == h)
      // DC-only blocks: the dequantized DC is a multiple of 16, so the
      // constant IDCT output is integral — any conforming decoder is
      // bit-exact, no PSNR slack needed
      assert(java.util.Arrays.equals(ours, theirs),
        s"trial $t: imageio disagrees on a DC-only ${w}x$h stream")
    }
  }

  test("this repo's FULL-DCT gray encoder agrees with imageio's decode") {
    val rnd = new Random(4210)
    (0 until 20).foreach { _ =>
      val src = srcBytes(rnd)
      val (w, h, pix) = Media.decodeJpegBytes(Media.encodeJpegGray(src))
      val blob = Media.encodeJpegRealGray(pix, w, h, 90)
      val (dw, dh, ours) = Media.decodeJpegBytes(blob)
      val (iw, ih, theirs) = Interop.imageIoDecodeGray(blob)
      assert(dw == w && dh == h && iw == w && ih == h)
      val p = psnr(ours, theirs)
      assert(p > 40.0, s"${w}x$h: decoder disagreement PSNR $p dB on our full-DCT stream")
    }
  }

  // ── fuzz: the fail-loudly property over FOREIGN streams ──

  private def fuzz(name: String, trials: Int)(
      mk: Array[Byte] => Array[Byte])(dec: Array[Byte] => Any): Unit = {
    val rnd = new Random(name.hashCode)
    var rejected = 0L
    var t = 0
    while (t < trials) {
      val blob = mk(srcBytes(rnd))
      val mutated =
        if (rnd.nextBoolean()) {
          val m = blob.clone()
          var i = 0
          val flips = 1 + rnd.nextInt(5)
          while (i < flips) { m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte; i += 1 }
          m
        } else if (rnd.nextBoolean()) java.util.Arrays.copyOf(blob, 1 + rnd.nextInt(blob.length))
        else java.util.Arrays.copyOf(blob, blob.length + 1 + rnd.nextInt(9))
      try dec(mutated)
      catch {
        case _: IllegalArgumentException => rejected += 1
        case e: Throwable =>
          fail(s"$name trial $t: non-contract ${e.getClass.getName}: ${e.getMessage}")
      }
      t += 1
    }
    assert(rejected > trials / 4, s"$name: only $rejected/$trials rejected")
  }

  test("imageio-produced PNG survives byte flips and truncation") {
    fuzz("iiopng", 250) { src =>
      val (w, h, raster) = Interop.rgbRaster(src)
      Interop.imageIoPngBytes(w, h, raster)
    }(Media.decodePngBytes)
  }

  test("imageio-produced JPEG survives byte flips and truncation") {
    fuzz("iiojpeg", 250) { src =>
      val (w, h, pix) = Interop.grayBlockRaster(src)
      Interop.imageIoJpegGrayBytes(w, h, pix, 0.9f)
    }(Media.decodeJpegBytes)
  }
}
