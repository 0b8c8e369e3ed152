package graft

import graft.ops.{AudioWinnow, Media, MediaRow}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Winnowed envelope fingerprints (round 13): shift tolerance (the
  * property the fixed-block q122 hash lacks — pinned by contrast),
  * the winnowing edge cases, and delta ≡ full restriction.
  */
class AudioWinnowSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-audio-winnow-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def wavOf(id: Long, text: String): MediaRow = {
    val s = spark
    import s.implicits._
    Media.asWav(Seq((id, text)).toDF("doc_id", "text"), "doc_id", "text")
      .head()
  }

  test("a whole-frame time shift preserves every interior fingerprint") {
    val base = wavOf(1L, "some sufficiently long audio payload text " * 12)
    val shifted = MediaRow(2L, base.media_type,
      AudioWinnow.shiftWav(base.content, 96))
    val (_, _, _, pcm0) = Media.decodeWavBytes(base.content)
    val (_, _, _, pcm1) = Media.decodeWavBytes(shifted.content)
    assert(pcm1.length === pcm0.length + 192)
    val f0 = AudioWinnow.fingerprints(AudioWinnow.frameSums(pcm0)).toSet
    val f1 = AudioWinnow.fingerprints(AudioWinnow.frameSums(pcm1)).toSet
    // every base fingerprint interior to the stream survives the shift;
    // only boundary windows can differ
    assert((f0 intersect f1).size >= f0.size - 2,
      s"shared ${(f0 intersect f1).size} of ${f0.size}")
    assert(f0.size >= 3, "corpus too short to be meaningful")
  }

  test("the fixed-block q122 envelope hash MISSES the same shifted twin") {
    val base = wavOf(1L, "some sufficiently long audio payload text " * 12)
    val shifted = AudioWinnow.shiftWav(base.content, 96)
    val (_, _, _, pcm0) = Media.decodeWavBytes(base.content)
    val (_, _, _, pcm1) = Media.decodeWavBytes(shifted)
    val h0 = Media.envelopeHashOfPcm(1L, pcm0)
    val h1 = Media.envelopeHashOfPcm(2L, pcm1)
    val hamming = Integer.bitCount(h0.b0 ^ h1.b0) + Integer.bitCount(h0.b1 ^ h1.b1) +
      Integer.bitCount(h0.b2 ^ h1.b2) + Integer.bitCount(h0.b3 ^ h1.b3)
    assert(hamming > 3, s"q122 hash unexpectedly survived the shift (hamming $hamming)")
  }

  test("winnowPairs flags the shifted twin; unrelated audio stays unpaired") {
    val s = spark
    import s.implicits._
    // PCM length is (64 + l%512)·channels samples — keep l%512 large
    // so the stream carries enough frames for ≥2 shared fingerprints
    val a = wavOf(10L, ("alpha payload " * 36).substring(0, 500))
    val b = wavOf(20L, ("a completely different beta payload " * 15).substring(0, 480))
    val aShift = MediaRow(11L, a.media_type, AudioWinnow.shiftWav(a.content, 96))
    val pairs = AudioWinnow.winnowPairs(
        s.createDataset(Seq(a, b, aShift)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 11L)), s"shifted twin missed: $pairs")
    assert(!pairs.exists(p => p._1 == 20L || p._2 == 20L),
      s"unrelated doc paired: $pairs")
  }

  test("short streams: < Width frames yield no fingerprint, tiny ones the global argmin") {
    assert(AudioWinnow.fingerprints(Array(5L, 6L)).isEmpty)
    assert(AudioWinnow.fingerprints(Array(5L, 6L, 7L)).length === 1)
    assert(AudioWinnow.fingerprints(Array(5L, 6L, 7L, 8L)).length === 1)
  }

  /** Deterministic NON-PERIODIC text: periodic payloads (a short
    * phrase repeated) make the cycled sample stream periodic, which
    * collapses the content-defined segment sums to a couple of
    * distinct values — too few winnowed fingerprints to clear
    * minShared. Real documents are not periodic; these are shaped
    * like them. */
  private def noisyText(n: Int, seed: Int): String =
    (0 until n).map(i => ('a' + ((i * 31 + seed * 17 + (i * i) % 97) % 26)).toChar).mkString

  test("a 7-sample shift: sample-level kernel flags it, frame kernel and q122 both miss") {
    val s = spark
    import s.implicits._
    val base = wavOf(30L, noisyText(500, 3))
    // NONZERO 7-value prefix: not silence — only the content-defined
    // boundaries make this work, not zero-sum invisibility
    val shifted0 = AudioWinnow.shiftWavAny(base.content, 7)
    val prefixed = shifted0.clone()
    // overwrite the 7 prepended 16-bit values (offsets 44..57) with
    // nonzero little-endian samples
    for (k <- 0 until 7) {
      prefixed(44 + 2 * k) = ((k * 37 + 11) & 0xff).toByte
      prefixed(44 + 2 * k + 1) = 0x01.toByte
    }
    val tw = MediaRow(31L, base.media_type, prefixed)
    val other = wavOf(40L, noisyText(480, 8))
    val pairs = AudioWinnow.winnowSamplePairs(
        s.createDataset(Seq(base, tw, other)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((30L, 31L)), s"7-sample twin missed: $pairs")
    assert(!pairs.exists(p => p._1 == 40L || p._2 == 40L),
      s"unrelated doc paired: $pairs")
    // the FRAME-grid winnow misses the same twin (7 ≢ 0 mod 32 —
    // every frame sum changes): the sub-frame kernel exists for this
    val framePairs = AudioWinnow.winnowPairs(
        s.createDataset(Seq(base, tw)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!framePairs.contains((30L, 31L)),
      s"frame kernel unexpectedly survived a sub-frame shift: $framePairs")
    // ... and so does the fixed-block q122 hash
    val (_, _, _, pcm0) = Media.decodeWavBytes(base.content)
    val (_, _, _, pcm1) = Media.decodeWavBytes(prefixed)
    val h0 = Media.envelopeHashOfPcm(30L, pcm0)
    val h1 = Media.envelopeHashOfPcm(31L, pcm1)
    val hamming = Integer.bitCount(h0.b0 ^ h1.b0) + Integer.bitCount(h0.b1 ^ h1.b1) +
      Integer.bitCount(h0.b2 ^ h1.b2) + Integer.bitCount(h0.b3 ^ h1.b3)
    assert(hamming > 3, s"q122 hash unexpectedly survived (hamming $hamming)")
  }

  test("segment boundaries are content-defined: zero prefix fingerprints identically") {
    val base = wavOf(50L, ("delta body text " * 30).substring(0, 460))
    val (_, _, _, pcm0) = Media.decodeWavBytes(base.content)
    val (_, _, _, pcm1) = Media.decodeWavBytes(AudioWinnow.shiftWavAny(base.content, 7))
    // zeros are never landmarks and add no |amplitude|: the segment
    // sequences are EQUAL, hence so are the fingerprints
    assert(AudioWinnow.segmentSums(pcm1).toSeq === AudioWinnow.segmentSums(pcm0).toSeq)
    assert(AudioWinnow.fingerprints(AudioWinnow.segmentSums(pcm1)).toSeq ===
      AudioWinnow.fingerprints(AudioWinnow.segmentSums(pcm0)).toSeq)
  }

  test("sample-level delta form equals the full pair set restricted to delta members") {
    val s = spark
    import s.implicits._
    val rows = (1L to 6L).map(i => wavOf(i, noisyText(300 + i.toInt * 37, i.toInt)))
    val twins = rows.take(2).map(r =>
      MediaRow(r.doc_id + 100L, r.media_type, AudioWinnow.shiftWavAny(r.content, 7)))
    val full = AudioWinnow.winnowSamplePairs(s.createDataset(rows ++ twins))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      .filter(p => p._1 > 100L || p._2 > 100L)
    val viaDelta = AudioWinnow.winnowSampleDeltaPairs(
        s.createDataset(rows), s.createDataset(twins))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaDelta === full)
  }

  test("delta form equals the full pair set restricted to delta members") {
    val s = spark
    import s.implicits._
    val rows = (1L to 6L).map(i => wavOf(i, s"doc $i body " * (20 + i.toInt * 7)))
    val twins = rows.take(2).map(r =>
      MediaRow(r.doc_id + 100L, r.media_type, AudioWinnow.shiftWav(r.content, 96)))
    val standing = s.createDataset(rows)
    val delta = s.createDataset(twins)
    val full = AudioWinnow.winnowPairs(s.createDataset(rows ++ twins))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      .filter(p => p._1 > 100L || p._2 > 100L)
    val viaDelta = AudioWinnow.winnowDeltaPairs(standing, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaDelta === full)
  }
}
