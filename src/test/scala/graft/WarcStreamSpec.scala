package graft

import graft.ops.{GzipStream, MediaRow, WarcStream}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** WARC record walk (round 13): encode/decode identity, strict
  * rejection of malformed records (the quarantine contract), the
  * HTTP-envelope parse, the composed WARC→gzip unwrap, and the mixed
  * ingest hash routing (sniff → text modality).
  */
class WarcStreamSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-warc-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def enc(id: Long, text: String) =
    WarcStream.encodeWarc(id, text.getBytes("UTF-8"))

  test("decode ∘ encode is the identity; record counts match the parity rule") {
    for ((text, id) <- Seq("hello warc", "", "even", "αβγ δ", "x" * 1000).zipWithIndex) {
      val b = enc(id.toLong, text)
      val (n, body) = WarcStream.responseText(b)
      assert(new String(body, "UTF-8") === text)
      val expect = if (text.getBytes("UTF-8").length % 2 == 0) 3 else 2
      assert(n === expect, s"'$text'")
    }
  }

  test("malformed records reject loudly through IllegalArgumentException only") {
    val good = enc(7L, "payload under test")
    def iae(b: Array[Byte]): Unit =
      intercept[IllegalArgumentException](WarcStream.responseText(b))
    // half truncation: Content-Length overruns or separator missing
    iae(java.util.Arrays.copyOf(good, good.length / 2))
    // smashed magic: not a WARC/ version line
    val smashed = good.clone(); smashed(0) = 'X'.toByte; iae(smashed)
    // trailing garbage after the last record
    iae(good ++ Array[Byte]('j', 'u', 'n', 'k'))
    // corrupt a Content-Length digit into a letter
    val idx = new String(good, "ISO-8859-1").indexOf("Content-Length: ")
    val bad = good.clone(); bad(idx + 16) = 'q'.toByte; iae(bad)
    // break the record separator after the first block
    val sepIdx = new String(good, "ISO-8859-1").indexOf("\r\n\r\nsoftware")
    assert(sepIdx > 0)
    val noSep = good.clone()
    // find the separator AFTER the warcinfo block (software: graft\r\n + \r\n\r\n)
    val infoEnd = new String(noSep, "ISO-8859-1").indexOf("graft\r\n\r\n\r\n")
    assert(infoEnd > 0)
    noSep(infoEnd + 7) = 'x'.toByte
    iae(noSep)
  }

  test("the composed WARC→gzip unwrap recovers the text through both walks") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "first doc"), (2L, ""), (3L, "third αβ doc"))
      .toDF("doc_id", "text")
    val wrapped = WarcStream.asWarcOver(GzipStream.asGzip(docs, "doc_id", "text"))
    val back = WarcStream.warcGzipText(wrapped)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(back === Map(1L -> "first doc", 2L -> "", 3L -> "third αβ doc"))
  }

  test("mixed ingest hash sniffs WARC and routes it to the text modality") {
    val s = spark
    import s.implicits._
    val docs = Seq((10L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val viaWarc = graft.ops.Media.mixedMediaHash(
      WarcStream.asWarc(docs, "doc_id", "text")).collect()
    val viaGzip = graft.ops.Media.mixedMediaHash(
      GzipStream.asGzip(docs, "doc_id", "text")).collect()
    assert(viaWarc.length === 1 && viaWarc.head.getString(0) === "text")
    // container-transparent: the WARC capture fingerprints identically
    // to the gzip shard of the same text
    assert(viaWarc.map(_.toSeq).toSet === viaGzip.map(_.toSeq).toSet)
  }

  test("multi-record shards: decode explodes one row per capture with WARC-Record-ID identity") {
    val s = spark
    import s.implicits._
    // ids straddle two shards at perShard=4; odd/even payloads
    // exercise the parity-metadata rule inside one stream
    val docs = Seq((0L, "even"), (1L, "odd x"), (2L, ""), (3L, "tail"),
      (5L, "next shard αβ")).toDF("doc_id", "text")
    val shards = WarcStream.asWarcShards(docs, "doc_id", "text", 4).collect()
    assert(shards.map(_.doc_id).sorted.toSeq === Seq(0L, 1L))
    val caps = WarcStream.decodeWarcCaptures(
        s.createDataset(shards.toSeq))
      .collect().map(c => c.doc_id -> c).toMap
    assert(caps.keySet === Set(0L, 1L, 2L, 3L, 5L))
    assert(WarcStream.warcShardText(s.createDataset(shards.toSeq))
      .filter(col("doc_id") === 5L).head().getString(1) === "next shard αβ")
    // shard 0: warcinfo + 4 responses + metadata for "even"(4), ""(0),
    // "tail"(4) = 1 + 4 + 3 = 8 records, on EVERY capture row of it
    assert(Seq(0L, 1L, 2L, 3L).forall(caps(_).n_shard_records == 8L))
    assert(caps(5L).n_shard_records === 2L) // "next shard αβ" is 15 utf8 bytes (odd): warcinfo + response only
    assert(caps(2L).n_body_bytes === 0L)
  }

  test("captureId: urn:uuid node segment parses; anything else rejects loudly") {
    assert(WarcStream.captureId("<urn:uuid:00000000-0000-4000-8001-0000000000ff>") === 255L)
    intercept[IllegalArgumentException](WarcStream.captureId("<urn:x:1>"))
    intercept[IllegalArgumentException](WarcStream.captureId("plain"))
    intercept[IllegalArgumentException](
      WarcStream.captureId("<urn:uuid:00000000-0000-4000-8001-00000000zzzz>"))
  }

  test("gzip and chunked HTTP envelopes are transparent to the recovered payload") {
    for (text <- Seq("short", "", "x" * 1500, "αβγ mixed δ " * 40)) {
      val p = text.getBytes("UTF-8")
      for ((gz, ch) <- Seq((true, false), (false, true), (true, true))) {
        val b = WarcStream.encodeWarc(21L, p, gzipBody = gz, chunked = ch)
        val (_, body) = WarcStream.responseText(b)
        assert(new String(body, "UTF-8") === text, s"gzip=$gz chunked=$ch")
      }
    }
  }

  test("chunked framing malformations reject loudly") {
    val p = ("y" * 600).getBytes("UTF-8") // 3 chunks
    val good = WarcStream.encodeWarc(9L, p, chunked = true)
    def iae(b: Array[Byte]): Unit =
      intercept[IllegalArgumentException](WarcStream.responseText(b))
    val s = new String(good, "ISO-8859-1")
    // corrupt the first chunk-size line's hex digit into 'q'
    val i = s.indexOf("\r\n\r\n100\r\n") // headers end + 256-byte chunk size
    assert(i > 0)
    val badSize = good.clone(); badSize(i + 4) = 'q'.toByte; iae(badSize)
    // break a chunk's trailing CRLF
    val badSep = good.clone(); badSep(i + 9 + 256) = 'x'.toByte; iae(badSep)
    // trailing garbage after the 0-chunk (inside the same block:
    // extend Content-... no Content-Length in chunked; append bytes and
    // fix the WARC record Content-Length instead — simpler: corrupt
    // the 0-chunk digit to a nonzero size that overruns)
    val zi = s.lastIndexOf("0\r\n\r\n")
    assert(zi > 0)
    val badZero = good.clone(); badZero(zi) = '5'.toByte; iae(badZero)
  }

  test("WARC captures of media route into their own modality's hash space") {
    val s = spark
    import s.implicits._
    val docs = Seq((12L, "pixels for the image capture test"),
      (13L, "and some audio samples worth of text here"))
      .toDF("doc_id", "text")
    val png = graft.ops.Media.asPng(docs.filter(col("doc_id") === 12L), "doc_id", "text")
    val wav = graft.ops.Media.asWav(docs.filter(col("doc_id") === 13L), "doc_id", "text")
    val standalone = graft.ops.Media.mixedMediaHash(png.unionByName(wav))
      .collect().map(_.toSeq).toSet
    val viaWarc = graft.ops.Media.mixedMediaHash(
        WarcStream.asWarcOver(png.unionByName(wav)))
      .collect().map(_.toSeq).toSet
    // the crawl wrapper is transparent: identical modality rows at the
    // same capture ids
    assert(viaWarc === standalone)
    assert(standalone.exists(_.head == "image") && standalone.exists(_.head == "audio"))
    // a WARC capture whose payload is itself WARC rejects (depth guard)
    val nested = WarcStream.asWarcOver(
      WarcStream.asWarc(docs, "doc_id", "text").map(r =>
        MediaRow(r.doc_id, "application/warc-nested", r.content)))
    intercept[org.apache.spark.SparkException](
      graft.ops.Media.mixedMediaHash(nested).collect())
  }

  test("mixed-media shards: one stream's captures route into their own modalities") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "pixels for the shard image"), (1L, "samples for the shard audio"),
      (2L, "and plain text inside the same crawl file")).toDF("doc_id", "text")
    val png = graft.ops.Media.asPng(docs.filter(col("doc_id") === 0L), "doc_id", "text")
    val wav = graft.ops.Media.asWav(docs.filter(col("doc_id") === 1L), "doc_id", "text")
    val txt = WarcStream.asWarc(docs.filter(col("doc_id") === 2L), "doc_id", "text")
      .map(r => MediaRow(r.doc_id, "text/plain",
        // unwrap: reuse the single-capture payload as a raw-text row
        WarcStream.responseText(r.content)._2))
    // standalone rows vs ONE mixed three-capture shard stream
    val standalone = graft.ops.Media.mixedMediaHash(
        png.unionByName(wav)).collect().map(_.toSeq).toSet
    val shard = WarcStream.asWarcShardsOver(png.unionByName(wav).unionByName(txt), 100)
    assert(shard.count() === 1L, "three captures must share one shard stream")
    val viaShard = graft.ops.Media.mixedMediaHash(shard).collect().map(_.toSeq).toSet
    val img = viaShard.filter(_.head == "image"); val aud = viaShard.filter(_.head == "audio")
    assert(img.nonEmpty && aud.nonEmpty && viaShard.exists(_.head == "text"),
      s"expected image+audio+text rows, got $viaShard")
    assert((img ++ aud) === standalone,
      "shard captures must hash identically to standalone containers")
  }

  test("revisit records: cross-shard resolution, dangling refers-to surfaces as null") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "original page body", None: Option[Long]),
      (1L, "another page", None: Option[Long]),
      // re-crawl of 0 lands in shard 25 (cross-shard resolution)
      (101L, "", Some(0L)),
      // dangling: refers to a capture that was never crawled
      (102L, "", Some(777L))
    ).toDF("doc_id", "text", "revisit_of")
    val shards = WarcStream.asWarcShardsWithRevisits(docs, "doc_id", "text", "revisit_of", 4)
    assert(shards.count() === 2L) // ids 0,1 → shard 0; 101,102 → shard 25
    val out = WarcStream.warcRevisitDocs(shards)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), Option(r.getString(3)))).toMap
    assert(out(0L)._1 === 0L && out(0L)._2 === 0L && out(0L)._3.isDefined)
    assert(out(101L)._1 === 0L && out(101L)._2 === 1L)
    assert(out(101L)._3 === out(0L)._3, "revisit must resolve to the original's digest")
    assert(out(102L) === ((777L, 1L, None)), "dangling refers-to must surface as null")
  }

  test("quarantineDecode: clean WARC rows count body bytes, corrupt rows quarantine") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      MediaRow(1L, "application/warc", enc(1L, "clean one")),
      MediaRow(2L, "application/warc",
        java.util.Arrays.copyOf(enc(2L, "truncated victim"), 40)))
    val out = graft.ops.Media.quarantineDecode(s.createDataset(rows))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === (("ok", 9L)))
    assert(out(2L)._1 === "quarantined")
  }
}
