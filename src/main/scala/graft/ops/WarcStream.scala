package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record-stream ingest — the crawl-corpus framing
  * above the q158 gzip member walk: a real crawl shard is WARC
  * records (version line + named headers + Content-Length-bounded
  * block) whose response records wrap an HTTP envelope around the
  * payload. The decoder here is a full record walk — version line,
  * header parse up to the empty line, mandatory WARC-Type /
  * WARC-Record-ID / Content-Length, exactly Content-Length block
  * bytes, the two-CRLF record separator — plus an HTTP/1.1 envelope
  * parse inside response records (status line, headers,
  * Content-Length-bounded body). Loud failure on malformed records:
  * corrupt crawl bytes must never silently fabricate text (the q161
  * quarantine contract).
  *
  * The encoder writes one warcinfo record, then a response record
  * carrying the document's UTF-8 payload behind an HTTP 200 envelope,
  * and (for even-length payloads) a metadata record — so production
  * data exercises the multi-record walk and the skip-unknown-type
  * path, not just the happy response case. All fields deterministic
  * (fixed date, ids derived from doc_id) — decode ∘ encode is the
  * identity on the text and every derived count is closed-form for
  * the oracle.
  *
  * Routing: [[warcText]] bridges response payloads into every
  * existing text pipeline (dedup/curation/BPE) unchanged, and
  * [[Media.mixedMediaHash]] sniffs the "WARC/" magic and routes the
  * text through the q33 SimHash bands — the mixed gate (q154) ingests
  * WARC sources end-to-end.
  */
object WarcStream {

  private val Crlf = "\r\n"
  private val WarcDate = "2026-01-01T00:00:00Z" // deterministic

  private def recordOf(
      warcType: String,
      recordId: String,
      contentType: String,
      block: Array[Byte],
      extra: Seq[(String, String)] = Nil): Array[Byte] = {
    val sb = new StringBuilder
    sb ++= "WARC/1.0" ++= Crlf
    sb ++= s"WARC-Type: $warcType" ++= Crlf
    sb ++= s"WARC-Record-ID: <urn:uuid:$recordId>" ++= Crlf
    sb ++= s"WARC-Date: $WarcDate" ++= Crlf
    extra.foreach { case (k, v) => sb ++= s"$k: $v" ++= Crlf }
    sb ++= s"Content-Type: $contentType" ++= Crlf
    sb ++= s"Content-Length: ${block.length}" ++= Crlf
    sb ++= Crlf
    val head = sb.result().getBytes("US-ASCII")
    val out = new Array[Byte](head.length + block.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(block, 0, out, head.length, block.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** One document as a WARC record set: warcinfo + HTTP-enveloped
    * response (+ metadata when the payload length is even).
    */
  private[graft] def encodeWarc(
      docId: Long,
      payload: Array[Byte],
      httpContentType: String = "text/plain; charset=utf-8"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 512)
    val info = s"software: graft$Crlf".getBytes("US-ASCII")
    out.write(recordOf("warcinfo", f"00000000-0000-4000-8000-${docId}%012x",
      "application/warc-fields", info))
    val http = (s"HTTP/1.1 200 OK${Crlf}Content-Type: $httpContentType" +
      s"${Crlf}Content-Length: ${payload.length}$Crlf$Crlf")
      .getBytes("US-ASCII")
    val block = new Array[Byte](http.length + payload.length)
    System.arraycopy(http, 0, block, 0, http.length)
    System.arraycopy(payload, 0, block, http.length, payload.length)
    out.write(recordOf("response", f"00000000-0000-4000-8001-${docId}%012x",
      "application/http;msgtype=response", block,
      Seq("WARC-Target-URI" -> s"https://example.org/doc/$docId")))
    if (payload.length % 2 == 0)
      out.write(recordOf("metadata", f"00000000-0000-4000-8002-${docId}%012x",
        "application/warc-fields",
        s"parity: even$Crlf".getBytes("US-ASCII")))
    out.toByteArray
  }

  private[graft] final case class WarcRecord(
      warcType: String,
      contentType: String,
      block: Array[Byte])

  /** Walk and validate every record of a WARC stream. Throws
    * IllegalArgumentException on malformation — bad version line,
    * missing mandatory headers, non-numeric or overrunning
    * Content-Length, missing record separator, trailing garbage.
    */
  private[graft] def decodeWarcRecords(b: Array[Byte]): Vector[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    var p = 0
    var n = 0
    def line(): String = {
      val start = p
      while (p + 1 < b.length && !(b(p) == '\r' && b(p + 1) == '\n')) p += 1
      require(p + 1 < b.length, "warc: truncated header line")
      val s = new String(b, start, p - start, "US-ASCII")
      p += 2
      s
    }
    while (p < b.length) {
      val version = line()
      require(version == "WARC/1.0" || version == "WARC/1.1",
        s"warc: bad version line '${version.take(32)}'")
      var warcType: String = null
      var recordId: String = null
      var contentType = ""
      var contentLength = -1L
      var h = line()
      while (h.nonEmpty) {
        val i = h.indexOf(':')
        require(i > 0, s"warc: malformed header '${h.take(48)}'")
        val k = h.substring(0, i).trim.toLowerCase
        val v = h.substring(i + 1).trim
        k match {
          case "warc-type" => warcType = v
          case "warc-record-id" => recordId = v
          case "content-type" => contentType = v
          case "content-length" =>
            require(v.nonEmpty && v.forall(_.isDigit),
              s"warc: non-numeric Content-Length '$v'")
            contentLength = v.toLong
          case _ => ()
        }
        h = line()
      }
      require(warcType != null, "warc: record missing WARC-Type")
      require(recordId != null, "warc: record missing WARC-Record-ID")
      require(contentLength >= 0, "warc: record missing Content-Length")
      // Overflow-safe form: a ~19-digit Content-Length would wrap
      // `p + contentLength + 4` past the bound and the later toInt
      // truncation could index out of range — an uncaught AIOOBE
      // instead of the loud IAE quarantine channel (round-13 advice).
      require(contentLength <= b.length.toLong - p - 4,
        s"warc: Content-Length $contentLength overruns the stream")
      val block = java.util.Arrays.copyOfRange(b, p, p + contentLength.toInt)
      p += contentLength.toInt
      require(b(p) == '\r' && b(p + 1) == '\n' &&
          b(p + 2) == '\r' && b(p + 3) == '\n',
        "warc: missing record separator after block")
      p += 4
      out += WarcRecord(warcType, contentType, block)
      n += 1
    }
    require(n > 0, "warc: empty stream")
    out.result()
  }

  /** Parse the HTTP/1.1 envelope of a response block; returns the
    * body (Content-Length-bounded). Loud failure on a bad status
    * line, malformed headers, or a body length mismatch.
    */
  private[graft] def httpBody(block: Array[Byte]): Array[Byte] = {
    var p = 0
    def line(): String = {
      val start = p
      while (p + 1 < block.length && !(block(p) == '\r' && block(p + 1) == '\n')) p += 1
      require(p + 1 < block.length, "warc: truncated HTTP envelope")
      val s = new String(block, start, p - start, "US-ASCII")
      p += 2
      s
    }
    val status = line()
    require(status.startsWith("HTTP/1.") && status.contains(" 200 "),
      s"warc: unexpected HTTP status line '${status.take(48)}'")
    var contentLength = -1L
    var h = line()
    while (h.nonEmpty) {
      val i = h.indexOf(':')
      require(i > 0, s"warc: malformed HTTP header '${h.take(48)}'")
      if (h.substring(0, i).trim.equalsIgnoreCase("content-length")) {
        val v = h.substring(i + 1).trim
        require(v.nonEmpty && v.forall(_.isDigit),
          s"warc: non-numeric HTTP Content-Length '$v'")
        contentLength = v.toLong
      }
      h = line()
    }
    require(contentLength >= 0, "warc: HTTP envelope missing Content-Length")
    require(block.length - p == contentLength,
      s"warc: HTTP body is ${block.length - p} bytes, envelope says $contentLength")
    java.util.Arrays.copyOfRange(block, p, block.length)
  }

  /** The response-record text of a WARC stream (this engine's encode
    * shape: exactly one response record per stream). */
  private[graft] def responseText(b: Array[Byte]): (Int, Array[Byte]) = {
    val records = decodeWarcRecords(b)
    val responses = records.filter(_.warcType == "response")
    require(responses.length == 1,
      s"warc: expected exactly one response record, got ${responses.length}")
    require(responses.head.contentType.startsWith("application/http"),
      s"warc: response record is not an HTTP capture " +
        s"('${responses.head.contentType.take(48)}')")
    (records.length, httpBody(responses.head.block))
  }

  /** Wrap a text corpus as WARC record streams — the crawl-side twin
    * of [[GzipStream.asGzip]]. */
  def asWarc(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.Tables.fanOut(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("t"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaRow(id, "application/warc", encodeWarc(id, bytes))
      })
  }

  final case class WarcFeatures(
      doc_id: Long,
      n_records: Long,
      n_body_bytes: Long,
      text_md5: String)

  /** Decode-and-validate each row's record walk; digest the HTTP
    * response body (decode ∘ encode is the identity, so the oracle
    * replays every column from the source text in closed form). */
  def decodeWarc(media: Dataset[MediaRow]): Dataset[WarcFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { row =>
        val (records, body) = responseText(row.content)
        val hx = Media.hexUpper(body, 0, body.length).getBytes("US-ASCII")
        WarcFeatures(row.doc_id, records.toLong, body.length.toLong,
          md.digest(hx).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Wrap EXISTING container rows (e.g. gzip member streams) as WARC
    * response captures — the real crawl composition (WARC records
    * whose HTTP bodies are compressed payloads). */
  def asWarcOver(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(r => MediaRow(r.doc_id, "application/warc",
      encodeWarc(r.doc_id, r.content, r.media_type)))
  }

  /** Decode WARC → gzip member stream → text: the two-layer crawl
    * unwrap, both walks fully validated. */
  def warcGzipText(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { row =>
      val (_, body) = responseText(row.content)
      val (_, bytes) = GzipStream.decodeGzipMembers(body)
      (row.doc_id, new String(bytes, "UTF-8"))
    }).toDF("doc_id", "text")
  }

  /** Decode each row back to a (doc_id, text) frame — the bridge that
    * routes crawl shards into every existing text pipeline unchanged. */
  def warcText(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { row =>
      val (_, body) = responseText(row.content)
      (row.doc_id, new String(body, "UTF-8"))
    }).toDF("doc_id", "text")
  }
}
