package graft

import graft.ops.{Media, MediaRow}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Unified multimodal ingest gate (q154): sniff-dispatched hashing
  * over every decodable container, routed into per-modality band-hash
  * gates. The oracle gates the full seven-container replay; these
  * specs pin the parts the oracle can't see — modality isolation,
  * per-route hash-space identities, and the lockstep batch counters.
  */
class MixedGateSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-mixed-gate-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mediaOf(rows: Seq[(Long, String, Array[Byte])]): org.apache.spark.sql.Dataset[MediaRow] = {
    val s = spark
    import s.implicits._
    rows.map { case (id, mt, b) => MediaRow(id, mt, b) }.toDS()
  }

  test("mixedMediaHash routes every container to its hash space") {
    val txt = "route me through every container please " * 8
    val bytes = txt.getBytes("UTF-8")
    val rows = Seq(
      (1L, "application/octet-stream", Media.encodePpm(bytes)),
      (2L, "application/octet-stream", Media.encodePng(bytes)),
      (3L, "application/octet-stream", Media.encodeJpegGray(bytes)),
      (4L, "application/octet-stream", Media.encodeJpegGrayProgressive(bytes)),
      (5L, "application/octet-stream", Media.encodeWav(bytes)),
      (6L, "application/octet-stream", Media.encodeFlac(bytes)),
      (7L, "application/octet-stream", Media.encodeY4m(bytes)),
      (8L, "application/octet-stream", Media.encodeAvi(bytes)),
      (9L, "application/octet-stream", graft.ops.GzipStream.encodeGzipMembers(bytes)),
      (10L, "application/octet-stream", graft.ops.GzipStream.encodeGzipMembers(bytes)))
    val got = Media.mixedMediaHash(mediaOf(rows))
      .select("modality", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byMod = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byMod("image") === Set(1L, 2L), "ppm+png share the image space")
    assert(byMod("jpeg") === Set(3L, 4L), "both jpeg framings share the jpeg space")
    assert(byMod("audio") === Set(5L, 6L), "wav+flac share the audio space")
    assert(byMod("text") === Set(9L, 10L), "gzip routes to the text space")
    // video keys are packed doc*2^20+frame
    val cap = graft.ops.Media.FrameKeyCap
    assert(byMod("video").forall(k => k / cap == 7L || k / cap == 8L))
    assert(byMod("video").exists(_ / cap == 7L) && byMod("video").exists(_ / cap == 8L))
    // lossless twins hash IDENTICAL across containers
    def bandsOf(m: String) = Media.mixedMediaHash(mediaOf(rows))
      .filter(col("modality") === m)
      .collect().map(r => (r.getLong(1), (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))))
      .toMap
    val img = bandsOf("image")
    assert(img(1L) === img(2L), "ppm/png twins must hash identical")
    val aud = bandsOf("audio")
    assert(aud(5L) === aud(6L), "wav/flac twins must hash identical")
    // gzip exact twins fingerprint identical through decompression,
    // and the bands ARE the SimHash60 4×15-bit split
    val tx = bandsOf("text")
    assert(tx(9L) === tx(10L), "gzip twins must hash identical")
    val fp = graft.functions.SimHash60.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(txt)).longValue()
    assert(tx(9L) === (((fp & 32767L).toInt, ((fp >> 15) & 32767L).toInt,
      ((fp >> 30) & 32767L).toInt, ((fp >> 45) & 32767L).toInt)),
      "text bands must be the q33 simhash band split")
  }

  test("token-less gzip text emits no hash row (the q33 null convention)") {
    val rows = Seq(
      (20L, "x", graft.ops.GzipStream.encodeGzipMembers("   \n\t  ".getBytes("UTF-8"))),
      (21L, "x", graft.ops.GzipStream.encodeGzipMembers("one token".getBytes("UTF-8"))))
    val got = Media.mixedMediaHash(mediaOf(rows)).select("doc_id").collect().map(_.getLong(0))
    assert(got.toSet === Set(21L))
  }

  test("modalities never cross-pair and batch counters stay lockstep") {
    val s = spark
    val rnd = new Random(61)
    def txt() = Random.alphanumeric.take(300 + rnd.nextInt(200)).mkString
    val base = (1 to 12).map(i => i.toLong -> txt()).toMap
    def blobs(ids: Seq[Long]) = mediaOf(ids.map { id =>
      val b = base(id).getBytes("UTF-8")
      id % 3 match {
        case 0 => (id, "x", Media.encodePpm(b))
        case 1 => (id, "x", Media.encodeWav(b))
        case _ => (id, "x", Media.encodeY4m(b))
      }
    })
    val gate = graft.streaming.Streams.newMixedMediaGate(s, compactEvery = 2)
    // batch 1: one doc of each modality; batch 2: audio-ONLY (image
    // and video fold EMPTY batches — counters must still advance);
    // batch 3: image + video only
    gate.ingest(blobs(Seq(3L, 1L, 2L)))
    gate.ingest(blobs(Seq(4L, 7L, 10L)))
    gate.ingest(blobs(Seq(6L, 9L, 12L, 5L, 8L, 11L)))
    val dec = gate.decisions.collect()
      .map(r => (r.getString(4), r.getLong(0), r.getLong(1)))
    def batchesOf(m: String) = dec.filter(_._1 == m).map(_._3).toSet
    // image saw batches 1 and 3 but NOT 2 — yet batch 3 still carries
    // index 3, proving the empty batch-2 fold advanced the counter
    assert(batchesOf("image") === Set(1L, 3L))
    assert(batchesOf("audio") === Set(1L, 2L))
    assert(batchesOf("video") === Set(1L, 3L))
    gate.release()
  }

  test("an HTML-wrapped capture flags against its plain-text form; raw-byte hashing would not") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .filter(length(col("text")) >= 300)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).take(20)
    assert(docs.length === 20)
    // plain capture at id, html capture of the SAME text at id + 10⁶
    val rows = mediaOf(docs.flatMap { case (id, text) => Seq(
      (id, "text/plain; charset=utf-8", text.getBytes("UTF-8")),
      (id + 1000000L, "text/html; charset=utf-8",
        graft.ops.Html.encodePage(text).getBytes("UTF-8")))
    }.toSeq)
    val wrapped = graft.ops.WarcStream.asWarcOver(rows)
    val pairs = Media.mixedNearDupPairs(wrapped, "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val twins = docs.count { case (id, _) => pairs((id, id + 1000000L)) }
    // extraction routing: the fingerprint is the extracted TEXT's, and
    // head/nav suppression makes its \S+ tokens EQUAL the plain form's
    // — every twin pairs at Hamming 0, deterministically
    assert(twins === 20, s"only $twins/20 html twins flagged")
    // counterfactual: fingerprint the raw html BYTES (what the pre-15
    // text/* route did) — markup tokens dominate and no twin pairs
    val rawRows = mediaOf(docs.map { case (id, text) =>
      (id + 1000000L, "text/plain; charset=utf-8",
        graft.ops.Html.encodePage(text).getBytes("UTF-8"))
    }.toSeq ++ docs.map { case (id, text) =>
      (id, "text/plain; charset=utf-8", text.getBytes("UTF-8"))
    })
    val rawPairs = Media.mixedNearDupPairs(
        graft.ops.WarcStream.asWarcOver(rawRows), "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rawTwins = docs.count { case (id, _) => rawPairs((id, id + 1000000L)) }
    // raw-byte hashing is LOSSY here, not exact: markup tokens distort
    // the fingerprint and most twins drift past the Hamming radius
    // (a long single-line doc can still sneak within it — the contrast
    // with the routing's deterministic 20/20 is the contract)
    assert(rawTwins < twins, s"raw-byte hashing paired $rawTwins/20 — no contrast")
  }

  test("an identical payload in two different modalities never pairs") {
    val s = spark
    val txt = ("never cross the streams " * 20).trim
    val b = txt.getBytes("UTF-8")
    // same text as an image and as audio: even if their 64-bit hashes
    // collided, the modality routing must keep them apart
    val gate = graft.streaming.Streams.newMixedMediaGate(s)
    gate.ingest(mediaOf(Seq(
      (3L, "x", Media.encodePpm(b)),
      (4L, "x", Media.encodeWav(b)))))
    val dec = gate.decisions.collect()
      .map(r => (r.getString(4), r.getLong(0), r.getLong(2)))
    assert(dec.length === 2)
    assert(dec.forall(_._3 == 0L), s"cross-modality pair leaked: ${dec.mkString(",")}")
    gate.release()
  }
}
