package graft

import graft.ops.Media
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Real PPM (P6) container path: the encoder writes genuine netpbm
  * bytes, the parser reads any spec-conformant header (not just the
  * encoder's formatting), malformed input fails loudly, and the
  * frame-digest near-dup join finds byte-level overlaps (q107/q108).
  */
class MediaPpmSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-media-ppm-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("encode/decode round-trip recovers dimensions and exact pixel bytes") {
    val rnd = new Random(3)
    for (len <- Seq(1, 47, 256, 999, 2048)) {
      val src = Array.fill(len)(rnd.nextInt(256).toByte)
      val blob = Media.encodePpm(src)
      val (w, h, maxval, pix) = Media.decodePpmBytes(blob)
      assert(w === 8 + len % 40)
      assert(h === 6 + len % 23)
      assert(maxval === 255)
      assert(pix.length === w * h * 3)
      pix.zipWithIndex.foreach { case (b, i) =>
        assert(b === src(i % len), s"pixel $i diverged at len=$len")
      }
    }
  }

  test("box resize: floor-mean cells, true edge counts, odd dimensions") {
    val s = spark
    import s.implicits._
    // 3x3 checker raster with known values -> 2x downsample to 2x2:
    // cell(0,0) covers 4 px, edges cover 2, the corner covers 1
    val w = 3; val h = 3
    val vals = Array(
      10, 20, 30, // row 0 (per-pixel gray: R=G=B=v)
      40, 50, 60,
      70, 80, 90)
    val pix = new Array[Byte](w * h * 3)
    for (p <- 0 until w * h; ch <- 0 until 3) pix(3 * p + ch) = vals(p).toByte
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val blob = header ++ pix
    val rows = spark.createDataset(Seq(graft.ops.MediaRow(1L, "image/x-portable-pixmap", blob)))
    val r = Media.resizePpmBox(rows, 2).collect().head
    assert(r.rs_width === 2L && r.rs_height === 2L && r.n_rs_bytes === 12L)
    // expected cells: (10+20+40+50)/4=30, (30+60)/2=45, (70+80)/2=75, 90/1=90
    val expect = Array(30, 45, 75, 90).flatMap(v => Array.fill(3)(v.toByte))
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = expect.map(b => f"${b & 0xff}%02X").mkString
    val em = md.digest(hex.getBytes("US-ASCII")).map(b => f"$b%02x").mkString
    assert(r.rs_md5 === em, "resized digest must equal the hand-computed cells")
    // factor 1 is the identity raster
    val id1 = Media.resizePpmBox(rows, 1).collect().head
    assert(id1.rs_width === 3L && id1.n_rs_bytes === 27L)
  }

  test("parser accepts spec-conformant headers it did not write") {
    // netpbm allows any whitespace runs between header fields
    val pix = Array.tabulate(2 * 3 * 3)(i => (i * 7).toByte)
    val header = "P6\r\n\t 2   3\n\n255 ".getBytes("US-ASCII")
    val (w, h, _, out) = Media.decodePpmBytes(header ++ pix)
    assert((w, h) === (2, 3))
    assert(out.toSeq === pix.toSeq)
  }

  test("malformed containers are rejected, not fabricated") {
    val good = Media.encodePpm("some pixels here".getBytes("UTF-8"))
    intercept[IllegalArgumentException](Media.decodePpmBytes("P5\n1 1\n255\nxyz".getBytes))
    intercept[IllegalArgumentException](Media.decodePpmBytes(good.dropRight(1))) // short payload
    intercept[IllegalArgumentException](Media.decodePpmBytes(good :+ 0.toByte)) // long payload
    intercept[IllegalArgumentException](Media.decodePpmBytes("P6\n2 2\n254\n".getBytes ++ Array.fill(12)(0.toByte)))
    // missing header/payload separator: the byte after maxval is pixel
    // data — must throw, not silently eat the first pixel byte
    intercept[IllegalArgumentException](
      Media.decodePpmBytes("P6\n1 1\n255".getBytes ++ Array[Byte](1, 2, 3, 4)))
    // absurd dimensions that would wrap Int in w*h*3
    intercept[IllegalArgumentException](
      Media.decodePpmBytes("P6\n49152111 43691222 255\n".getBytes ++ Array.fill(4)(0.toByte)))
  }

  test("WAV encode/decode round-trip recovers every header field and the PCM bytes") {
    val rnd = new Random(17)
    for (len <- Seq(1, 100, 511, 512, 2048)) {
      val src = Array.fill(len)(rnd.nextInt(256).toByte)
      val blob = Media.encodeWav(src)
      val (ch, sr, n, pcm) = Media.decodeWavBytes(blob)
      assert(ch === 1 + len % 2)
      assert(sr === 8000 + (len % 8) * 1000)
      assert(n === 64 + len % 512)
      assert(pcm.length === n * ch * 2)
      pcm.zipWithIndex.foreach { case (b, i) =>
        assert(b === src(i % len), s"pcm byte $i diverged at len=$len")
      }
    }
  }

  test("WAV little-endian fields parse from hand-built bytes (not just our encoder)") {
    // 2 channels, 48000 Hz, 4 samples: field bytes written by hand so
    // an endianness bug in EITHER direction cannot self-cancel.
    val data = Array.tabulate(16)(i => i.toByte) // 4 samples * 2 ch * 2 bytes
    val b = new Array[Byte](44 + 16)
    "RIFF".getBytes.copyToArray(b, 0)
    b(4) = 52; b(5) = 0; b(6) = 0; b(7) = 0 // 36 + 16 = 52 LE
    "WAVE".getBytes.copyToArray(b, 8)
    "fmt ".getBytes.copyToArray(b, 12)
    b(16) = 16
    b(20) = 1
    b(22) = 2 // channels LE
    // 48000 = 0xBB80
    b(24) = 0x80.toByte; b(25) = 0xbb.toByte; b(26) = 0; b(27) = 0
    // byte rate 48000*2*2 = 192000 = 0x2EE00
    b(28) = 0x00; b(29) = 0xee.toByte; b(30) = 0x02; b(31) = 0
    b(32) = 4 // block align
    b(34) = 16 // bits
    "data".getBytes.copyToArray(b, 36)
    b(40) = 16
    data.copyToArray(b, 44)
    val (ch, sr, n, pcm) = Media.decodeWavBytes(b)
    assert((ch, sr, n) === (2, 48000, 4))
    assert(pcm.toSeq === data.toSeq)
  }

  test("malformed WAVs are rejected: bad magic, non-PCM, inconsistent sizes") {
    val good = Media.encodeWav("sixteen pcm bytes or so".getBytes("UTF-8"))
    intercept[IllegalArgumentException](Media.decodeWavBytes(good.take(40)))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](Media.decodeWavBytes(badMagic))
    val nonPcm = good.clone(); nonPcm(20) = 3
    intercept[IllegalArgumentException](Media.decodeWavBytes(nonPcm))
    intercept[IllegalArgumentException](Media.decodeWavBytes(good.dropRight(2)))
    val badRate = good.clone(); badRate(28) = (badRate(28) + 1).toByte
    intercept[IllegalArgumentException](Media.decodeWavBytes(badRate))
  }

  test("frame near-dup: last-char swap shares frame 0; disjoint blobs pair with nothing") {
    val s = spark
    import s.implicits._
    val base = Random.alphanumeric.take(400).mkString // ASCII, len 400
    val twin = base.dropRight(1) + "!"
    val docs = Seq((1L, base), (2L, twin), (3L, "completely different content " * 20))
      .toDF("doc_id", "text")
    val pairs = Media.mediaNearDupPairs(Media.asPpm(docs, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs.exists { case (a, b, inter) => a == 1L && b == 2L && inter >= 1 },
      s"twin pair not detected: $pairs")
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L })
  }

  test("frame delta ≡ full restricted; indexed standing form identical") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new Random(53)
    val base = (0 until 30).map(i =>
      i.toLong -> Random.alphanumeric.take(300 + rnd.nextInt(300)).mkString).toMap
    // plant: 25 (delta, %5==0) = copy of standing 7 (cross pair);
    // 20 = copy of 15 (both delta — within-delta pair)
    val rows = base + (25L -> base(7L)) + (20L -> base(15L))
    def docsOf(m: Seq[(Long, String)]) = m.toDF("doc_id", "text")
    val standingRows = rows.filter(_._1 % 5 != 0).toSeq
    val deltaRows = rows.filter(_._1 % 5 == 0).toSeq
    val inc = Media.mediaNearDupDeltaPairs(
        Media.asPpm(docsOf(standingRows), "doc_id", "text"),
        Media.asPpm(docsOf(deltaRows), "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val full = Media.mediaNearDupPairs(Media.asPpm(docsOf(rows.toSeq), "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      .filter(t => t._1 % 5 == 0 || t._2 % 5 == 0)
    assert(inc === full)
    assert(inc.exists { case (a, b, _, _) => (a % 5 == 0) != (b % 5 == 0) },
      "cross delta-standing pair vacuous")
    assert(inc.exists { case (a, b, _, _) => a % 5 == 0 && b % 5 == 0 },
      "within-delta pair vacuous")
    // the maintained-state form (standing enters as the materialized
    // frame-digest table a gate carries; only the delta decodes) is
    // pair-identical to the decode-both form
    val standingIdx = graft.ops.Ckpt.fresh(
      Media.ppmFrameDigests(Media.asPpm(docsOf(standingRows), "doc_id", "text"))
        .toDF().select(col("doc_id"), col("frame_md5").as("fh")).distinct())
    val idx = Media.mediaNearDupDeltaPairsIndexed(
        standingIdx, Media.asPpm(docsOf(deltaRows), "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(idx === inc, "indexed standing form diverged from decode-both")
    // regime parity: the single-job fused fold (default under the
    // cap) must equal the distributed plan (forced via fusedCap = 0)
    val dist = Media.mediaNearDupDeltaPairsIndexed(
        standingIdx, Media.asPpm(docsOf(deltaRows), "doc_id", "text"),
        fusedCap = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(dist === idx, "fused and distributed regimes diverged")
    // and under a hot-frame cap low enough to bite, both regimes
    // prune identically
    val fusedCapped = Media.mediaNearDupDeltaPairsIndexed(
        standingIdx, Media.asPpm(docsOf(deltaRows), "doc_id", "text"),
        maxFrameFreq = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val distCapped = Media.mediaNearDupDeltaPairsIndexed(
        standingIdx, Media.asPpm(docsOf(deltaRows), "doc_id", "text"),
        maxFrameFreq = 2L, fusedCap = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(fusedCapped === distCapped, "regimes diverged under the stop-frame prune")
  }
}
