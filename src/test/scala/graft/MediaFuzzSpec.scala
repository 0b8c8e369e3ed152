package graft

import graft.ops.Media
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Decoder fuzzing: the fail-loudly contract as a PROPERTY. Every
  * decoder consumes arbitrary public bytes at 100 TB scale; a corrupt
  * stream must either decode (mutations can be benign — payload bytes,
  * ancillary fields) or throw IllegalArgumentException with a
  * diagnosable message — never an ArrayIndexOutOfBounds, NegativeArraySize,
  * NumberFormat, DataFormat, or any other leak of internal state, and
  * never an unbounded loop. Byte flips and truncations over every
  * container.
  */
class MediaFuzzSpec extends AnyFunSuite {

  private def fuzz(name: String, trials: Int)(
      mk: Array[Byte] => Array[Byte])(dec: Array[Byte] => Any): Unit = {
    val rnd = new Random(name.hashCode)
    var ok = 0L; var rejected = 0L
    var t = 0
    while (t < trials) {
      val src = Array.fill(20 + rnd.nextInt(500))(rnd.nextInt(256).toByte)
      val blob = mk(src)
      val mutated =
        if (rnd.nextBoolean()) { // byte flips
          val m = blob.clone()
          val flips = 1 + rnd.nextInt(5)
          var i = 0
          while (i < flips) {
            m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte; i += 1
          }
          m
        } else // truncation (and occasionally trailing garbage)
          if (rnd.nextBoolean()) java.util.Arrays.copyOf(blob, 1 + rnd.nextInt(blob.length))
          else java.util.Arrays.copyOf(blob, blob.length + 1 + rnd.nextInt(9))
      try { dec(mutated); ok += 1 }
      catch {
        case _: IllegalArgumentException => rejected += 1
        case e: Throwable =>
          fail(s"$name trial $t: non-contract ${e.getClass.getName}: ${e.getMessage}")
      }
      t += 1
    }
    // mutations must actually bite: a fuzzer that never rejects is
    // testing nothing
    assert(rejected > trials / 4, s"$name: only $rejected/$trials rejected")
  }

  test("ppm survives byte flips and truncation")(
    fuzz("ppm", 400)(Media.encodePpm)(Media.decodePpmBytes))

  test("png survives byte flips and truncation")(
    fuzz("png", 400)(Media.encodePng)(Media.decodePngBytes))

  test("jpeg gray survives byte flips and truncation")(
    fuzz("jpeg", 400)(b => Media.encodeJpegGray(b))(Media.decodeJpegBytes))

  test("jpeg color survives byte flips and truncation")(
    fuzz("jpegc", 300)(b => Media.encodeJpegColor(b))(Media.decodeJpegPlanes))

  test("full-encoder jpeg survives byte flips and truncation") {
    fuzz("jpegr", 200) { src =>
      val (w, h, pix) = Media.decodeJpegBytes(Media.encodeJpegGray(src))
      Media.encodeJpegRealGray(pix, w, h, 35)
    }(Media.decodeJpegBytes)
  }

  test("progressive jpeg survives byte flips and truncation")(
    fuzz("jpegprog", 400)(b => Media.encodeJpegGrayProgressive(b))(Media.decodeJpegBytes))

  test("wav survives byte flips and truncation")(
    fuzz("wav", 400)(Media.encodeWav)(Media.decodeWavBytes))

  test("flac survives byte flips and truncation")(
    fuzz("flac", 400)(Media.encodeFlac)(Media.decodeFlacBytes))

  test("y4m survives byte flips and truncation")(
    fuzz("y4m", 400)(Media.encodeY4m)(Media.decodeY4mBytes))

  test("avi survives byte flips and truncation")(
    fuzz("avi", 300)(Media.encodeAvi)(Media.decodeAviBytes))

  test("gzip survives byte flips and truncation")(
    fuzz("gzip", 400)(graft.ops.GzipStream.encodeGzipMembers)(
      graft.ops.GzipStream.decodeGzipMembers))

  test("warc (identity envelope) survives byte flips and truncation")(
    fuzz("warc", 400)(b => graft.ops.WarcStream.encodeWarc(7L, b))(
      graft.ops.WarcStream.responseText))

  test("warc gzip envelope survives byte flips and truncation")(
    fuzz("warc-gz", 300)(b => graft.ops.WarcStream.encodeWarc(7L, b, gzipBody = true))(
      graft.ops.WarcStream.responseText))

  test("warc chunked envelope survives byte flips and truncation")(
    fuzz("warc-ch", 300)(b => graft.ops.WarcStream.encodeWarc(7L, b, chunked = true))(
      graft.ops.WarcStream.responseText))

  test("warc multi-record shards survive byte flips and truncation")(
    fuzz("warc-shard", 300)(b => graft.ops.WarcStream.encodeWarcShard(3L,
        Seq((10L, b.take(b.length / 2)), (11L, b.drop(b.length / 2)))))(
      bytes => graft.ops.WarcStream.decodeWarcRecords(bytes)
        .filter(_.warcType == "response")
        .map(r => graft.ops.WarcStream.httpBody(r.block).length).sum))

  test("warc revisit streams survive byte flips and truncation") {
    // revisit record walk + WARC-Refers-To/record-id parsing: the
    // per-capture collect of warcRevisitDocs, run driver-side on the
    // mutated bytes so non-IAE leaks (NumberFormat from the uuid hex,
    // index errors from the refers-to parse) would surface directly
    fuzz("warc-revisit", 300) { b =>
      val out = new java.io.ByteArrayOutputStream()
      out.write(graft.ops.WarcStream.encodeWarcShard(5L, Seq((20L, b))))
      out.toByteArray
    } { bytes =>
      graft.ops.WarcStream.decodeWarcRecords(bytes).map { r =>
        if (r.warcType == "response")
          graft.ops.WarcStream.captureId(r.recordId) +
            graft.ops.WarcStream.httpBody(r.block).length
        else if (r.refersTo.nonEmpty) graft.ops.WarcStream.captureId(r.refersTo)
        else 0L
      }.sum
    }
  }

  // Deterministic (non-seed-dependent) probes at the exact offsets the
  // random fuzzer can miss: FLAC's variable-length frame-header fields
  // (blocksize/rate extension bytes, UTF-8 continuations) and Y4M's
  // ~4 header digit bytes. Each must reject with IllegalArgumentException.
  test("flac rejects streams truncated inside the frame header") {
    val blob = Media.encodeFlac(Array.tabulate(400)(i => (i * 7).toByte))
    // first frame starts right after the fLaC magic + 4+34 STREAMINFO
    val frameStart = 4 + 4 + 34
    for (cut <- frameStart + 1 to math.min(frameStart + 10, blob.length - 1)) {
      val t = java.util.Arrays.copyOf(blob, cut)
      val e = intercept[IllegalArgumentException](Media.decodeFlacBytes(t))
      assert(e.getMessage.contains("flac"), s"cut=$cut: ${e.getMessage}")
    }
  }

  test("y4m rejects corrupted header digit fields") {
    val blob = Media.encodeY4m(Array.tabulate(300)(i => (i * 3).toByte))
    val header = new String(blob.takeWhile(_ != '\n'), "US-ASCII")
    val wPos = header.indexOf(" W") + 2
    for (junk <- Seq('x', '-', ' ')) {
      val m = blob.clone(); m(wPos) = junk.toByte
      // ' ' empties the W field; letters corrupt it — both must be
      // IllegalArgumentException, never NumberFormatException
      intercept[IllegalArgumentException](Media.decodeY4mBytes(m))
    }
  }

  // LENGTH-FIELD LIES (round 15): the random fuzzer flips bytes, but a
  // hostile stream lies in its SIZE fields specifically — the classic
  // allocation attack (a 2 GB declared chunk over a 500-byte stream
  // must reject with IAE, never NegativeArraySize/OOM/AIOOBE). Each
  // probe rewrites a known length field to an overrunning value and
  // requires the loud-failure contract.
  private def lie(blob: Array[Byte])(writes: (Int, Int)*): Array[Byte] = {
    val m = blob.clone()
    writes.foreach { case (off, v) => m(off) = (v & 0xff).toByte }
    m
  }
  private def mustReject(name: String, dec: Array[Byte] => Any)(m: Array[Byte]): Unit = {
    val e = intercept[IllegalArgumentException](dec(m))
    assert(e.getMessage != null && e.getMessage.nonEmpty, s"$name: empty reject message")
  }

  test("png rejects chunk-length lies") {
    val blob = Media.encodePng(Array.tabulate(300)(i => (i * 5).toByte))
    val rej = mustReject("png", Media.decodePngBytes) _
    // IHDR length (bytes 8-11, BE): huge, and sign-bit set
    rej(lie(blob)(8 -> 0x7f, 9 -> 0xff, 10 -> 0xff, 11 -> 0xff))
    rej(lie(blob)(8 -> 0xff, 9 -> 0xff, 10 -> 0xff, 11 -> 0xff))
    // find the first IDAT and lie about its length the same two ways
    val idat = (0 until blob.length - 4).find(i =>
      blob(i) == 'I' && blob(i + 1) == 'D' && blob(i + 2) == 'A' && blob(i + 3) == 'T').get
    val ln = idat - 4
    rej(lie(blob)(ln -> 0x7f, ln + 1 -> 0xff, ln + 2 -> 0xff, ln + 3 -> 0xff))
    rej(lie(blob)(ln -> 0xff, ln + 1 -> 0xff, ln + 2 -> 0xff, ln + 3 -> 0xff))
  }

  test("jpeg rejects segment-length lies") {
    val blob = Media.encodeJpegGray(Array.tabulate(300)(i => (i * 11).toByte))
    val rej = mustReject("jpeg", Media.decodeJpegBytes) _
    // first segment after SOI: marker at 2-3, BE length at 4-5
    rej(lie(blob)(4 -> 0xff, 5 -> 0xff)) // overruns the stream
    rej(lie(blob)(4 -> 0x00, 5 -> 0x00)) // below the 2-byte minimum
    rej(lie(blob)(4 -> 0x00, 5 -> 0x01))
  }

  test("flac rejects metadata-block-length lies") {
    val blob = Media.encodeFlac(Array.tabulate(400)(i => (i * 7).toByte))
    val rej = mustReject("flac", Media.decodeFlacBytes) _
    // STREAMINFO block header after 'fLaC': flags/type at 4, 24-bit BE
    // length at 5-7 — lie it past the end of the stream
    rej(lie(blob)(5 -> 0xff, 6 -> 0xff, 7 -> 0xff))
    // and lie it SHORT (STREAMINFO must be exactly 34 bytes)
    rej(lie(blob)(5 -> 0x00, 6 -> 0x00, 7 -> 0x01))
  }

  test("wav rejects chunk-size lies") {
    val blob = Media.encodeWav(Array.tabulate(300)(i => (i * 13).toByte))
    val rej = mustReject("wav", Media.decodeWavBytes) _
    // data chunk size (LE u32 after the 'data' tag): overrun + sign bit
    val d = (0 until blob.length - 4).find(i =>
      blob(i) == 'd' && blob(i + 1) == 'a' && blob(i + 2) == 't' && blob(i + 3) == 'a').get
    rej(lie(blob)(d + 4 -> 0xff, d + 5 -> 0xff, d + 6 -> 0xff, d + 7 -> 0x7f))
    rej(lie(blob)(d + 4 -> 0xff, d + 5 -> 0xff, d + 6 -> 0xff, d + 7 -> 0xff))
  }

  test("avi rejects chunk-size lies") {
    val blob = Media.encodeAvi(Array.tabulate(300)(i => (i * 17).toByte))
    val rej = mustReject("avi", Media.decodeAviBytes) _
    // the movi-list data chunks: find '00dc' (first video frame chunk)
    // and lie its LE size past the stream end
    val c = (0 until blob.length - 4).find(i =>
      blob(i) == '0' && blob(i + 1) == '0' && blob(i + 2) == 'd' && blob(i + 3) == 'c').get
    rej(lie(blob)(c + 4 -> 0xff, c + 5 -> 0xff, c + 6 -> 0xff, c + 7 -> 0x7f))
    rej(lie(blob)(c + 4 -> 0xff, c + 5 -> 0xff, c + 6 -> 0xff, c + 7 -> 0xff))
  }

  test("warc rejects Content-Length lies (oversize ASCII rewrite)") {
    val blob = graft.ops.WarcStream.encodeWarc(7L, Array.tabulate(120)(i => (i * 3).toByte))
    val s = new String(blob, "ISO-8859-1")
    // rewrite the RESPONSE record's Content-Length digits to a 19-digit
    // value (the round-13 overflow-wrap class) — must reject loudly
    val at = s.indexOf("Content-Length: ", s.indexOf("WARC-Type: response"))
    assert(at > 0)
    val eol = s.indexOf("\r\n", at)
    val lied = s.substring(0, at) + "Content-Length: 9223372036854775806" + s.substring(eol)
    mustReject("warc", b => graft.ops.WarcStream.decodeWarcRecords(b))(
      lied.getBytes("ISO-8859-1"))
  }

  test("sniffing survives arbitrary leading bytes") {
    val rnd = new Random(97)
    for (_ <- 0 until 300) {
      val junk = Array.fill(12 + rnd.nextInt(50))(rnd.nextInt(256).toByte)
      try Media.sniffContainer(junk)
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"sniff: ${e.getClass.getName}")
      }
    }
  }
}
