package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** SHIFT-TOLERANT audio fingerprint (round 13): content-defined
  * segmentation of the |PCM| envelope — the q106 winnowing kernel
  * re-targeted from text windows to audio frames, closing the gap the
  * fixed-64-block envelope hash (q122) documents: that hash buckets
  * sample j by its ABSOLUTE position (j·64 div m), so a copy of the
  * same audio time-shifted by a few frames lands every sample in a
  * different block and the hashes diverge. Here the unit is the
  * frame-|amplitude| sequence and the selected fingerprints are
  * winnowed (leftmost-argmin of every window of consecutive rolling
  * hashes) — selection is content-determined, so a copy shifted by
  * whole frames shares every interior fingerprint and collides no
  * matter where in the stream it sits (the reference's own pitch is
  * overlap between arbitrary byte sequences, lib.rs:47-53).
  *
  * All-integer end to end (frame sums are exact Longs, the rolling
  * hash is a small-coefficient polynomial that stays under 2^42), so
  * the DuckDB twin replays fingerprints, winnowing and pair counts
  * bit-for-bit from the q122 hex-space PCM formulas.
  *
  * Scale shape: one map-side kernel pass per row, a multiplicity cap
  * on hot fingerprints (the band-engine df discipline), and the pair
  * join is fingerprint-bucketed — never all-pairs. The delta form
  * probes a standing fingerprint index without rescanning standing
  * audio (the q121/q123 contract).
  */
object AudioWinnow {

  /** samples per envelope frame — shifts that are multiples of this
    * align interior frames exactly */
  val Frame = 32
  /** frames per rolling hash */
  val Width = 3
  /** consecutive hashes per winnowing window */
  val Stride = 3
  /** sample-level landmark predicate |v| % SegMod == SegRes — the
    * content-defined segment boundary of the SUB-FRAME kernel (mean
    * segment ≈ SegMod samples) */
  val SegMod = 13
  val SegRes = 5

  /** Frame |amplitude| sums of a little-endian signed PCM stream
    * (partial tail frame dropped). */
  private[graft] def frameSums(pcm: Array[Byte], bytesPerSample: Int = 2): Array[Long] = {
    val m = pcm.length / bytesPerSample
    val t = m / Frame
    val out = new Array[Long](t)
    val shift = 32 - 8 * bytesPerSample
    var j = 0
    while (j < t * Frame) {
      var u = 0; var bi = 0
      while (bi < bytesPerSample) {
        u |= (pcm(bytesPerSample * j + bi) & 0xff) << (8 * bi); bi += 1
      }
      val v = (u << shift) >> shift
      out(j / Frame) += math.abs(v)
      j += 1
    }
    out
  }

  /** The winnowed fingerprint set (DISTINCT selected hash values) of a
    * frame-sum sequence. Fewer than [[Width]] frames → no fingerprint
    * (the SimHash null convention); fewer than [[Stride]] hashes → the
    * single global leftmost-argmin.
    */
  private[graft] def fingerprints(fs: Array[Long]): Array[Long] = {
    val h = fs.length - Width + 1
    if (h < 1) return Array.empty
    val hs = new Array[Long](h)
    var i = 0
    while (i < h) {
      // coefficients keep every term < 2^42: frame sums are at most
      // Frame * 32768 = 2^20, so the DuckDB BIGINT twin cannot overflow
      hs(i) = fs(i) * 1000003L + fs(i + 1) * 9176L + fs(i + 2) * 31L
      i += 1
    }
    val sel = new java.util.TreeSet[Long]()
    if (h < Stride) {
      var best = 0
      var k = 1
      while (k < h) { if (hs(k) < hs(best)) best = k; k += 1 }
      sel.add(hs(best))
    } else {
      var u = 0
      while (u + Stride <= h) {
        var best = u
        var k = u + 1
        while (k < u + Stride) { if (hs(k) < hs(best)) best = k; k += 1 }
        sel.add(hs(best))
        u += 1
      }
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var i2 = 0
    while (it.hasNext) { out(i2) = it.next(); i2 += 1 }
    out
  }

  /** SAMPLE-LEVEL content-defined segment sums — the SUB-FRAME rung
    * above [[frameSums]]: q170's frame grid is position-free only for
    * shifts ≡ 0 mod [[Frame]] (its scaladoc says so honestly); here
    * the segment BOUNDARIES themselves are content-defined — a new
    * segment starts after every landmark sample (|v| % [[SegMod]] ==
    * [[SegRes]], the LBFS/Rabin content-defined-chunking discipline,
    * Muthitacharoen et al. 2001) — so a copy shifted by ANY whole
    * number of samples preserves every interior boundary and every
    * interior segment sum. Prepended silence is doubly invisible:
    * zeros are never landmarks and add nothing to the first segment's
    * |amplitude| sum, so a zero-padded copy fingerprints IDENTICALLY;
    * a nonzero prefix perturbs at most the first segment (and thus
    * the few hashes that touch it), leaving all interior fingerprints
    * shared. All-integer: segment sums are exact Longs < 2^26 on any
    * encode this engine produces, so the width-3 polynomial stays
    * under 2^46 and the DuckDB twin replays it bit-for-bit.
    */
  private[graft] def segmentSums(pcm: Array[Byte], bytesPerSample: Int = 2): Array[Long] = {
    val m = pcm.length / bytesPerSample
    val shift = 32 - 8 * bytesPerSample
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var acc = 0L
    var open = false
    var j = 0
    while (j < m) {
      var u = 0; var bi = 0
      while (bi < bytesPerSample) {
        u |= (pcm(bytesPerSample * j + bi) & 0xff) << (8 * bi); bi += 1
      }
      val a = math.abs((u << shift) >> shift).toLong
      acc += a
      open = true
      if (a % SegMod == SegRes) { out += acc; acc = 0L; open = false }
      j += 1
    }
    if (open) out += acc // trailing segment after the last landmark
    out.toArray
  }

  /** Re-encode a WAV with `shiftSamples` zero PER-CHANNEL samples
    * prepended (shiftSamples × channels 16-bit values, channels read
    * from the header so stereo stays sample-frame aligned) — NO
    * envelope-frame-alignment requirement: the sub-frame twin builder
    * (shift 7 ≢ 0 mod [[Frame]] is exactly the case the sample-level
    * kernel exists for). */
  private[graft] def shiftWavAny(wav: Array[Byte], shiftSamples: Int): Array[Byte] = {
    val channels = (wav(22) & 0xff) | ((wav(23) & 0xff) << 8)
    shiftWavValues(wav, shiftSamples * channels)
  }

  /** The raw primitive: prepend `shiftVals` zero 16-bit VALUES to the
    * interleaved stream and patch the RIFF/data sizes. */
  private def shiftWavValues(wav: Array[Byte], shiftVals: Int): Array[Byte] = {
    val extra = 2 * shiftVals
    val out = new Array[Byte](wav.length + extra)
    System.arraycopy(wav, 0, out, 0, 44)
    System.arraycopy(wav, 44, out, 44 + extra, wav.length - 44)
    def patch(off: Int): Unit = {
      val v = ((wav(off) & 0xff) | ((wav(off + 1) & 0xff) << 8) |
        ((wav(off + 2) & 0xff) << 16) | ((wav(off + 3) & 0xff) << 24)) + extra
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    patch(4)  // RIFF chunk size
    patch(40) // data chunk size
    out
  }

  /** Re-encode a WAV (this engine's fixed 44-byte header layout) with
    * `shiftVals` zero 16-bit values prepended to the interleaved PCM —
    * the time-shifted-twin builder. `shiftVals` must be a multiple of
    * the channel count (96 covers both 1- and 2-channel encodes) and
    * of [[Frame]] (so interior envelope frames align exactly).
    */
  private[graft] def shiftWav(wav: Array[Byte], shiftVals: Int): Array[Byte] = {
    require(shiftVals % Frame == 0, "shift must be whole frames")
    shiftWavValues(wav, shiftVals)
  }

  /** (doc_id, fh) — one row per DISTINCT winnowed fingerprint of each
    * WAV row's PCM. */
  private[graft] def fingerprintRows(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { row =>
      val (_, _, _, pcm) = Media.decodeWavBytes(row.content)
      fingerprints(frameSums(pcm)).iterator.map(h => (row.doc_id, h))
    }).toDF("doc_id", "fh")
  }

  /** (doc_id, fh) over the SAMPLE-LEVEL content-defined segments —
    * the sub-frame kernel's fingerprint rows. */
  private[graft] def sampleFingerprintRows(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { row =>
      val (_, _, _, pcm) = Media.decodeWavBytes(row.content)
      fingerprints(segmentSums(pcm)).iterator.map(h => (row.doc_id, h))
    }).toDF("doc_id", "fh")
  }

  /** [[winnowPairs]] over the sample-level segment kernel: pairs that
    * survive ANY whole-sample time shift (7 samples included), not
    * just whole-frame shifts. Same df-capped fingerprint-bucket join.
    */
  def winnowSamplePairs(
      media: Dataset[MediaRow],
      minShared: Int = 2,
      maxFpFreq: Long = 1000L): DataFrame = {
    // NOT checkpointed although pairsOf references it 3×: the WAV
    // decode+fingerprint pass is cheaper than a materialization job at
    // every scale measured (A/B round 15: q170 1.63 → 2.23 s WITH the
    // ckpt) — same trade as the exact-substr delta stream.
    val fp = sampleFingerprintRows(media)
    pairsOf(fp, fp, minShared, maxFpFreq, deltaOnly = false)
  }

  /** The delta form of [[winnowSamplePairs]] — the batch probes the
    * standing sample-level fingerprint index (the q123 discipline). */
  def winnowSampleDeltaPairs(
      standing: Dataset[MediaRow],
      delta: Dataset[MediaRow],
      minShared: Int = 2,
      maxFpFreq: Long = 1000L): DataFrame = {
    val sfp = sampleFingerprintRows(standing)
    val dfp = sampleFingerprintRows(delta)
    pairsOf(sfp.unionByName(dfp), dfp, minShared, maxFpFreq, deltaOnly = true)
  }

  /** Pairs of WAV rows sharing at least `minShared` winnowed
    * fingerprints: (id_a, id_b, n_shared), id_a < id_b. Fingerprints
    * seen on more than `maxFpFreq` docs are dropped before pairing
    * (the band-engine hot-key cap — bounds the bucket join at any
    * corpus size).
    */
  def winnowPairs(
      media: Dataset[MediaRow],
      minShared: Int = 2,
      maxFpFreq: Long = 1000L): DataFrame = {
    val fp = fingerprintRows(media)
    pairsOf(fp, fp, minShared, maxFpFreq, deltaOnly = false)
  }

  /** The delta form: the batch's fingerprints probe the standing
    * corpus's fingerprint index (plus within-batch pairs) — standing
    * audio is never rescanned. Output contract = [[winnowPairs]] over
    * the union, restricted to pairs with a delta member (the q123
    * discipline).
    */
  def winnowDeltaPairs(
      standing: Dataset[MediaRow],
      delta: Dataset[MediaRow],
      minShared: Int = 2,
      maxFpFreq: Long = 1000L): DataFrame = {
    val sfp = fingerprintRows(standing)
    val dfp = fingerprintRows(delta)
    pairsOf(sfp.unionByName(dfp), dfp, minShared, maxFpFreq, deltaOnly = true)
  }

  private def pairsOf(
      all: DataFrame,
      probe: DataFrame,
      minShared: Int,
      maxFpFreq: Long,
      deltaOnly: Boolean): DataFrame = {
    val hot = all.groupBy("fh").agg(count(lit(1)).as("c"))
      .filter(col("c") > maxFpFreq)
      .select("fh")
    // Broadcast the over-cap key set explicitly (the band-engine
    // agg → broadcast-anti discipline, same as Dedup's stop-shingle
    // and Media's stop-band prunes). Scale bound, stated rather than
    // assumed (round-16 advice follow-up): |hot| ≤ totalFpRows /
    // maxFpFreq — corpus-proportional in the worst case, but at the
    // default cap (1000) that is ≤ 0.1% of the fingerprint stream at
    // 8 B/key; a corpus whose hot set outgrows the driver would first
    // have to push ~10^12 fingerprint rows through this fold, at which
    // point maxFpFreq is raised (the cap is the operator's knob), the
    // same story as every df-capped prune in this engine.
    val kept = all.join(broadcast(hot), Seq("fh"), "left_anti")
    val keptProbe =
      if (deltaOnly) probe.join(broadcast(hot), Seq("fh"), "left_anti") else kept
    // The delta probe sees (standing × delta) with the delta member on
    // either side of the id order plus within-delta pairs: ONE join
    // with x ≠ y, normalized to (min, max) and deduped (round 16 —
    // previously two mirror joins unioned, which ran the standing
    // decode+winnow kernel under BOTH legs; the fused form halves the
    // kernel passes on the join and is set-identical: every
    // cross-side pair lands in exactly the (min, max) orientation the
    // two-leg union produced, and the doubled within-delta hits fall
    // to the same distinct that always dedup'd them).
    val sym =
      if (deltaOnly)
        kept.select(col("doc_id").as("xa"), col("fh"))
          .join(keptProbe.select(col("doc_id").as("xb"), col("fh")), Seq("fh"))
          .where(col("xa") =!= col("xb"))
          .select(least(col("xa"), col("xb")).as("id_a"),
            greatest(col("xa"), col("xb")).as("id_b"), col("fh"))
          .distinct()
      else kept.select(col("doc_id").as("id_a"), col("fh"))
        .join(keptProbe.select(col("doc_id").as("id_b"), col("fh")), Seq("fh"))
        .where(col("id_a") < col("id_b"))
    sym
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
