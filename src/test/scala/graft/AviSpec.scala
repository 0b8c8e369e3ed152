package graft

import graft.ops.Media
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** MJPEG-in-AVI (q150/q151): the first COMPRESSED video container — a
  * real RIFF chunk walk whose '00dc' frames are complete JPEGs with
  * per-frame baseline/progressive framing. The decoder must cross-check
  * every header field against the stream and fail loudly on any
  * inconsistency — header lies are how hostile containers smuggle
  * out-of-bounds reads.
  */
class AviSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-avi-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("decode recovers dims, frame count, and per-frame JPEG closed-form rasters") {
    val rnd = new Random(19)
    for (len <- Seq(1, 20, 47, 300, 997)) {
      val src = Array.fill(len)(rnd.nextInt(256).toByte)
      val (w, h, frames) = Media.decodeAviBytes(Media.encodeAvi(src))
      val l = math.max(1, len)
      assert(w === 8 * (1 + l % 5) && h === 8 * (1 + l % 4))
      assert(frames.length === 2 + l % 5)
      // each frame must equal the JPEG decode of the rotated source —
      // independent of whether that frame used baseline or progressive
      frames.zipWithIndex.foreach { case (luma, f) =>
        val rot = Array.tabulate(l)(k =>
          (if (len == 0) ' '.toByte else src((k + 13 * f) % l)))
        val (_, _, want) = Media.decodeJpegBytes(Media.encodeJpegGray(rot))
        assert(java.util.Arrays.equals(luma, want), s"frame $f diverged at len=$len")
      }
    }
  }

  test("frames alternate baseline and progressive framing inside one container") {
    val blob = Media.encodeAvi(Array.tabulate(300)(i => (i * 5).toByte))
    // count SOF0 vs SOF2 markers across the embedded JPEG streams
    var sof0 = 0; var sof2 = 0
    for (i <- 0 until blob.length - 1) {
      if ((blob(i) & 0xff) == 0xff && (blob(i + 1) & 0xff) == 0xc0) sof0 += 1
      if ((blob(i) & 0xff) == 0xff && (blob(i + 1) & 0xff) == 0xc2) sof2 += 1
    }
    assert(sof0 >= 1 && sof2 >= 1,
      s"expected both framings in one AVI, got SOF0=$sof0 SOF2=$sof2")
  }

  test("header cross-checks fail loudly: sizes, frame counts, dims, stream types") {
    val good = Media.encodeAvi("cross checked headers".getBytes("UTF-8"))
    Media.decodeAviBytes(good) // sanity
    def find(id: String): Int = {
      val pat = id.getBytes("US-ASCII")
      var i = 12
      while (!(0 until 4).forall(j => good(i + j) == pat(j))) i += 1
      i
    }
    // RIFF size lies
    val badSize = good.clone(); badSize(4) = (badSize(4) + 1).toByte
    assert(intercept[IllegalArgumentException](
      Media.decodeAviBytes(badSize)).getMessage.contains("RIFF size"))
    // avih dwTotalFrames lies (strh still agrees? no — strh mirrors
    // avih, so bump BOTH and let the movi count catch it)
    val badNf = good.clone()
    val avih = find("avih")
    val strh = find("strh")
    badNf(avih + 8 + 16) = (badNf(avih + 8 + 16) + 1).toByte
    badNf(strh + 8 + 32) = (badNf(strh + 8 + 32) + 1).toByte
    assert(intercept[IllegalArgumentException](
      Media.decodeAviBytes(badNf)).getMessage.contains("decoded frames"))
    // strh length differing from avih
    val badStrh = good.clone()
    badStrh(strh + 8 + 32) = (badStrh(strh + 8 + 32) + 1).toByte
    assert(intercept[IllegalArgumentException](
      Media.decodeAviBytes(badStrh)).getMessage.contains("dwTotalFrames"))
    // avih dims lying about the frames
    val badW = good.clone()
    badW(avih + 8 + 32) = (badW(avih + 8 + 32) + 8).toByte
    val e = intercept[IllegalArgumentException](Media.decodeAviBytes(badW))
    assert(e.getMessage.contains("header declares") || e.getMessage.contains("strf"))
    // handler not MJPG
    val badH = good.clone(); badH(strh + 12) = 'X'.toByte
    assert(intercept[IllegalArgumentException](
      Media.decodeAviBytes(badH)).getMessage.contains("MJPG"))
    // truncation anywhere inside movi
    assert(intercept[IllegalArgumentException](
      Media.decodeAviBytes(java.util.Arrays.copyOf(good, good.length - 6)))
      .getMessage.nonEmpty)
  }

  test("dual-stream AVI: the auds track decodes, validates, and routes to the audio space") {
    val rnd = new Random(112)
    // l % 4 == 1 → dual-stream; l % 4 != 1 → video-only
    val dualSrc = Array.fill(41)(rnd.nextInt(256).toByte)
    val monoSrc = Array.fill(40)(rnd.nextInt(256).toByte)
    val (dw, dh, dFrames, dAudio) = Media.decodeAviBytesFull(Media.encodeAvi(dualSrc))
    assert(dw == 8 * (1 + 41 % 5) && dh == 8 * (1 + 41 % 4))
    assert(dFrames.length == 2 + 41 % 5)
    val Some((ch, rate, pcm)) = dAudio
    assert(ch == 1 && rate == 8000)
    val wantSamples = 64 + 41 % 512
    assert(pcm.length == 2 * wantSamples)
    // the interleaved '01wb' slices concatenate back to the cycled source
    (0 until pcm.length).foreach(i => assert(pcm(i) == dualSrc(i % 41), s"pcm byte $i"))
    val (_, _, _, mAudio) = Media.decodeAviBytesFull(Media.encodeAvi(monoSrc))
    assert(mAudio.isEmpty, "video-only class must carry no audio")
    // frame decode is audio-invariant: same text through both paths
    // gives the same lumas when the dims formulas agree
    // hostile variants
    val good = Media.encodeAvi(dualSrc)
    def find(id: String, from: Int = 12): Int = {
      val pat = id.getBytes("US-ASCII")
      var i = from
      while (!(0 until 4).forall(j => good(i + j) == pat(j))) i += 1
      i
    }
    // audio strf claims a non-PCM format tag
    val badFmt = good.clone()
    val strhA = find("auds") - 8 // 'auds' sits at strh data start = chunk + 8
    val strfA = find("strf", strhA + 8) // the audio strf follows the auds strh
    badFmt(strfA + 8) = 2 // wFormatTag = ADPCM
    assert(intercept[IllegalArgumentException](
      Media.decodeAviBytesFull(badFmt)).getMessage.contains("PCM"))
    // audio byte count lies: bump auds strh dwLength
    val badLen = good.clone()
    badLen(strhA + 8 + 32) = (badLen(strhA + 8 + 32) + 1).toByte
    assert(intercept[IllegalArgumentException](
      Media.decodeAviBytesFull(badLen)).getMessage.contains("samples"))
    // avih declares 2 streams but the auds strl is present → drop the
    // avih count to 1 instead: header/stream-count mismatch
    val badCnt = good.clone()
    val avih = find("avih")
    badCnt(avih + 8 + 24) = 1
    assert(intercept[IllegalArgumentException](
      Media.decodeAviBytesFull(badCnt)).getMessage.contains("stream"))
    // the mixed hash routes the track into the audio modality at doc_id
    val s = spark
    import s.implicits._
    val rows = Seq(graft.ops.MediaRow(7L, "video/x-msvideo", good)).toDS()
    val got = Media.mixedMediaHash(rows).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val nf = 2 + 41 % 5
    assert(got == (0 until nf).map(f => ("video", 7L * graft.ops.Media.FrameKeyCap + f)).toSet + (("audio", 7L)))
  }

  test("cross-video frame near-dup finds exact twins at hamming 0 through the RIFF walk") {
    val s = spark
    import s.implicits._
    val rnd = new Random(83)
    val docs = (1L to 15L).map(i =>
      (i, rnd.alphanumeric.take(100 + rnd.nextInt(300)).mkString)).toDF("doc_id", "text")
    val aug = docs.unionByName(docs.filter($"doc_id" === 4L)
      .select(($"doc_id" + 100L).as("doc_id"), $"text"))
    val pairs = Media.aviNearDupFramePairs(Media.asAvi(aug, "doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val twinFrames = pairs.filter(p => p._1 == 4L && p._3 == 104L && p._2 == p._4)
    val nf = pairs.headOption.map(_ => twinFrames.length).getOrElse(0)
    assert(twinFrames.nonEmpty && twinFrames.forall(_._5 == 0L),
      s"exact twin frames must pair at hamming 0, got ${twinFrames.take(3).mkString(",")}")
    val _ = nf
  }
}
