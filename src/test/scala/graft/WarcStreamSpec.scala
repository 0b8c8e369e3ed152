package graft

import graft.ops.{GzipStream, MediaRow, WarcStream}
import org.apache.spark.sql.SparkSession
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
