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

  /** The HTTP/1.1 response envelope around `payload`. `gzipBody`
    * compresses the payload (Content-Encoding: gzip — the q158 member
    * stream, so the decode side is the already-validated member
    * walk); `chunked` frames the (possibly compressed) body as
    * Transfer-Encoding: chunked 256-byte chunks. Both deterministic.
    */
  private def httpEnvelope(
      payload: Array[Byte],
      contentType: String,
      gzipBody: Boolean,
      chunked: Boolean): Array[Byte] = {
    val body0 = if (gzipBody) GzipStream.encodeGzipMembers(payload) else payload
    val body =
      if (!chunked) body0
      else {
        // chunk-size line in lowercase hex, data, CRLF; 0-chunk + CRLF
        // terminator (no trailers). 256-byte chunks exercise the
        // multi-chunk walk on every non-trivial payload.
        val o = new java.io.ByteArrayOutputStream(body0.length + 16 * (body0.length / 256 + 2))
        var off = 0
        while (off < body0.length) {
          val n = math.min(256, body0.length - off)
          o.write(s"${n.toHexString}$Crlf".getBytes("US-ASCII"))
          o.write(body0, off, n)
          o.write(Crlf.getBytes("US-ASCII"))
          off += n
        }
        o.write(s"0$Crlf$Crlf".getBytes("US-ASCII"))
        o.toByteArray
      }
    val sb = new StringBuilder
    sb ++= "HTTP/1.1 200 OK" ++= Crlf
    sb ++= s"Content-Type: $contentType" ++= Crlf
    if (gzipBody) sb ++= "Content-Encoding: gzip" ++= Crlf
    if (chunked) sb ++= "Transfer-Encoding: chunked" ++= Crlf
    else sb ++= s"Content-Length: ${body.length}" ++= Crlf
    sb ++= Crlf
    val http = sb.result().getBytes("US-ASCII")
    val block = new Array[Byte](http.length + body.length)
    System.arraycopy(http, 0, block, 0, http.length)
    System.arraycopy(body, 0, block, http.length, body.length)
    block
  }

  /** The per-document record pair: HTTP-enveloped response
    * (+ metadata when the ORIGINAL payload length is even — the
    * parity rule is envelope-independent, so composed oracles stay
    * closed-form under gzip/chunked encodings).
    */
  private def writeDocRecords(
      out: java.io.ByteArrayOutputStream,
      docId: Long,
      payload: Array[Byte],
      httpContentType: String,
      gzipBody: Boolean,
      chunked: Boolean,
      targetUri: String = null): Unit = {
    val uri = if (targetUri == null) s"https://example.org/doc/$docId" else targetUri
    out.write(recordOf("response", f"00000000-0000-4000-8001-${docId}%012x",
      "application/http;msgtype=response",
      httpEnvelope(payload, httpContentType, gzipBody, chunked),
      Seq("WARC-Target-URI" -> uri)))
    if (payload.length % 2 == 0)
      out.write(recordOf("metadata", f"00000000-0000-4000-8002-${docId}%012x",
        "application/warc-fields",
        s"parity: even$Crlf".getBytes("US-ASCII")))
  }

  /** One document as a WARC record set: warcinfo + HTTP-enveloped
    * response (+ metadata when the payload length is even).
    */
  private[graft] def encodeWarc(
      docId: Long,
      payload: Array[Byte],
      httpContentType: String = "text/plain; charset=utf-8",
      gzipBody: Boolean = false,
      chunked: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 512)
    val info = s"software: graft$Crlf".getBytes("US-ASCII")
    out.write(recordOf("warcinfo", f"00000000-0000-4000-8000-${docId}%012x",
      "application/warc-fields", info))
    writeDocRecords(out, docId, payload, httpContentType, gzipBody, chunked)
    out.toByteArray
  }

  /** A SHARD of documents as ONE WARC stream — the real crawl shape
    * (one file, thousands of captures): a single warcinfo record,
    * then each document's response (+ parity metadata) records in the
    * given order. Capture identity rides WARC-Record-ID (see
    * [[captureId]]).
    */
  private[graft] def encodeWarcShard(
      shardId: Long,
      docs: Seq[(Long, Array[Byte])],
      httpContentType: String = "text/plain; charset=utf-8"): Array[Byte] =
    encodeWarcShardTyped(shardId, docs.map { case (id, p) => (id, p, httpContentType) })

  /** [[encodeWarcShard]] with a PER-CAPTURE content type — mixed-media
    * crawl shards (text, PNG, WAV… responses in one stream). */
  private[graft] def encodeWarcShardTyped(
      shardId: Long,
      docs: Seq[(Long, Array[Byte], String)]): Array[Byte] = {
    require(docs.nonEmpty, "warc shard: no documents")
    val out = new java.io.ByteArrayOutputStream(docs.map(_._2.length).sum + 512 * (docs.length + 1))
    val info = s"software: graft$Crlf".getBytes("US-ASCII")
    out.write(recordOf("warcinfo", f"00000000-0000-4000-8003-${shardId}%012x",
      "application/warc-fields", info))
    docs.foreach { case (docId, payload, ct) =>
      writeDocRecords(out, docId, payload, ct, gzipBody = false, chunked = false)
    }
    out.toByteArray
  }

  /** Group EXISTING container rows (PNG/WAV/gzip/… MediaRows) into
    * multi-record WARC shards, each capture stamped with its row's
    * media type — the mixed-media crawl file: one stream whose
    * responses span modalities, which [[Media.mixedMediaHash]]
    * re-sniffs per capture and routes into the right hash spaces.
    */
  def asWarcShardsOver(media: Dataset[MediaRow], perShard: Int = 100): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(perShard > 0, "warc shards: perShard must be positive")
    media
      .groupByKey(r => r.doc_id / perShard)
      .mapGroups { (shardId, rows) =>
        val ds = rows.toSeq.sortBy(_.doc_id).map(r => (r.doc_id, r.content, r.media_type))
        MediaRow(shardId, "application/warc", encodeWarcShardTyped(shardId, ds))
      }
  }

  private[graft] final case class WarcRecord(
      warcType: String,
      recordId: String,
      contentType: String,
      refersTo: String, // WARC-Refers-To (revisit records); "" when absent
      targetUri: String, // WARC-Target-URI; "" when absent (warcinfo etc.)
      block: Array[Byte])

  /** Capture identity from WARC-Record-ID: the trailing 12 hex digits
    * of the mandatory `<urn:uuid:…>` form (RFC 9562 node segment).
    * This library's encoder derives that segment from the document
    * id, so decode recovers the id exactly; any spec-conformant
    * crawl's random uuids still parse — capture identity is then the
    * uuid tail. Loud failure on anything else: a capture without a
    * parseable identity must never silently take a neighbor's.
    */
  private[graft] def captureId(recordId: String): Long = {
    require(recordId.startsWith("<urn:uuid:") && recordId.endsWith(">"),
      s"warc: WARC-Record-ID is not <urn:uuid:…>: '${recordId.take(56)}'")
    val uuid = recordId.substring(10, recordId.length - 1)
    val seg = uuid.lastIndexOf('-')
    require(seg >= 0 && uuid.length - seg - 1 == 12,
      s"warc: uuid has no 12-hex node segment: '${uuid.take(48)}'")
    // RFC 9562 §4 requires parsers to accept uppercase hex, so lower
    // the node segment before validating — external crawls emit both.
    val hexStr = uuid.substring(seg + 1).toLowerCase(java.util.Locale.ROOT)
    require(hexStr.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
      s"warc: non-hex uuid node segment '$hexStr'")
    java.lang.Long.parseLong(hexStr, 16)
  }

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
      var refersTo = ""
      var targetUri = ""
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
          case "warc-refers-to" => refersTo = v
          case "warc-target-uri" => targetUri = v
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
      out += WarcRecord(warcType, recordId, contentType, refersTo, targetUri, block)
      n += 1
    }
    require(n > 0, "warc: empty stream")
    out.result()
  }

  private[graft] final case class HttpPayload(
      contentType: String,
      body: Array[Byte])

  /** Parse the HTTP/1.1 envelope of a response block; returns the
    * declared Content-Type and the PAYLOAD bytes — after undoing
    * `Transfer-Encoding: chunked` framing (strict chunk-size walk, no
    * extensions, no trailers) and `Content-Encoding: gzip` (the q158
    * validated member walk). Loud failure on a bad status line,
    * malformed headers, chunk framing errors, a body length mismatch,
    * or an encoding this parser does not implement — a crawl capture
    * must never silently yield coded bytes as payload.
    */
  private[graft] def httpPayload(block: Array[Byte]): HttpPayload = {
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
    var contentType = ""
    var transferEncoding = ""
    var contentEncoding = ""
    var h = line()
    while (h.nonEmpty) {
      val i = h.indexOf(':')
      require(i > 0, s"warc: malformed HTTP header '${h.take(48)}'")
      val k = h.substring(0, i).trim.toLowerCase
      val v = h.substring(i + 1).trim
      k match {
        case "content-length" =>
          require(v.nonEmpty && v.forall(_.isDigit),
            s"warc: non-numeric HTTP Content-Length '$v'")
          contentLength = v.toLong
        case "content-type" => contentType = v
        case "transfer-encoding" => transferEncoding = v.toLowerCase
        case "content-encoding" => contentEncoding = v.toLowerCase
        case _ => ()
      }
      h = line()
    }
    val framed: Array[Byte] = transferEncoding match {
      case "" =>
        require(contentLength >= 0, "warc: HTTP envelope missing Content-Length")
        require(block.length - p == contentLength,
          s"warc: HTTP body is ${block.length - p} bytes, envelope says $contentLength")
        java.util.Arrays.copyOfRange(block, p, block.length)
      case "chunked" =>
        // RFC 9112 §7.1 walk: hex size line / data / CRLF, terminated
        // by the 0-chunk and one empty line. Content-Length MUST be
        // absent with chunked framing; chunk extensions and trailer
        // fields reject loudly (this encoder never writes them, and
        // accepting unvalidated forms would widen the parser beyond
        // what decode ∘ encode pins).
        require(contentLength < 0,
          "warc: both Content-Length and chunked Transfer-Encoding")
        val o = new java.io.ByteArrayOutputStream(block.length - p)
        var done = false
        while (!done) {
          val szLine = line()
          require(szLine.nonEmpty && szLine.length <= 7 &&
              szLine.forall(c => (c >= '0' && c <= '9') ||
                (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')),
            s"warc: bad chunk-size line '${szLine.take(24)}'")
          val sz = Integer.parseInt(szLine, 16)
          if (sz == 0) {
            require(line().isEmpty, "warc: chunked trailers unsupported")
            require(p == block.length,
              s"warc: ${block.length - p} bytes after the 0-chunk")
            done = true
          } else {
            require(sz <= block.length - p - 2,
              s"warc: chunk of $sz bytes overruns the block")
            o.write(block, p, sz)
            p += sz
            require(block(p) == '\r' && block(p + 1) == '\n',
              "warc: chunk data not CRLF-terminated")
            p += 2
          }
        }
        o.toByteArray
      case other =>
        throw new IllegalArgumentException(
          s"warc: unsupported Transfer-Encoding '$other'")
    }
    val body = contentEncoding match {
      case "" | "identity" => framed
      case "gzip" | "x-gzip" => GzipStream.decodeGzipMembers(framed)._2
      case other =>
        throw new IllegalArgumentException(
          s"warc: unsupported Content-Encoding '$other'")
    }
    HttpPayload(contentType, body)
  }

  /** Back-compat body accessor — see [[httpPayload]]. */
  private[graft] def httpBody(block: Array[Byte]): Array[Byte] =
    httpPayload(block).body

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

  /** Wrap a text corpus as MULTI-RECORD WARC shard streams — the real
    * crawl shape (one file, many captures): documents group into
    * shards of up to `perShard` consecutive ids (shard = doc_id div
    * perShard), each shard one warcinfo + per-document response (+
    * parity metadata) records in ascending doc_id order.
    *
    * Scale: the per-shard collect_list is bounded by `perShard`
    * payloads (a few MB at crawl-typical sizes) and the groupBy
    * shuffles each document exactly once on its shard key — shard
    * assembly is embarrassingly parallel at any corpus size.
    */
  def asWarcShards(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      perShard: Int = 100): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(perShard > 0, "warc shards: perShard must be positive")
    graft.Tables.fanOut(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("t"))
      .groupBy(expr(s"doc_id div ${perShard}L").as("shard_id"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("t")))).as("ds"))
      .as[(Long, Seq[(Long, Array[Byte])])]
      .mapPartitions(_.map { case (shardId, ds) =>
        MediaRow(shardId, "application/warc", encodeWarcShard(shardId, ds))
      })
  }

  /** [[asWarcShards]] with a PER-DOCUMENT `WARC-Target-URI` column —
    * the URL-operator input shape (q187/q188): real crawls stamp every
    * capture with the fetched URI, and the URL family (normalization,
    * registered domains, quotas, URL-level dedup) keys on it.
    */
  def asWarcShardsUri(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      uriCol: String,
      perShard: Int = 100): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(perShard > 0, "warc shards: perShard must be positive")
    graft.Tables.fanOut(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("t"),
        col(uriCol).cast("string").as("u"))
      .as[(Long, Array[Byte], String)]
      .groupByKey(_._1 / perShard)
      .mapGroups { (shardId, rows) =>
        val ds = rows.toSeq.sortBy(_._1)
        val out = new java.io.ByteArrayOutputStream(
          ds.map(_._2.length).sum + 512 * (ds.length + 1))
        out.write(recordOf("warcinfo", f"00000000-0000-4000-8003-${shardId}%012x",
          "application/warc-fields", s"software: graft$Crlf".getBytes("US-ASCII")))
        ds.foreach { case (docId, payload, uri) =>
          writeDocRecords(out, docId, payload, "text/plain; charset=utf-8",
            gzipBody = false, chunked = false, targetUri = uri)
        }
        MediaRow(shardId, "application/warc", out.toByteArray)
      }
  }

  final case class WarcCapture(
      shard_id: Long,
      doc_id: Long,
      n_shard_records: Long,
      n_body_bytes: Long,
      text_md5: String,
      target_uri: String) // "" when the capture carried no WARC-Target-URI

  /** Explode each WARC stream into ONE ROW PER RESPONSE RECORD — the
    * multi-record shard decode. Capture identity comes from
    * WARC-Record-ID (see [[captureId]]); `n_shard_records` is the
    * whole stream's validated record count on every capture row, so
    * the oracle proves the walk saw the full shard, not just the
    * captures it returned.
    */
  def decodeWarcCaptures(media: Dataset[MediaRow]): Dataset[WarcCapture] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { row =>
        val records = decodeWarcRecords(row.content)
        val responses = records.filter(_.warcType == "response")
        require(responses.nonEmpty, s"warc shard ${row.doc_id}: no response records")
        responses.map { r =>
          require(r.contentType.startsWith("application/http"),
            s"warc: response record is not an HTTP capture ('${r.contentType.take(48)}')")
          val body = httpPayload(r.block).body
          val hx = Media.hexUpper(body, 0, body.length).getBytes("US-ASCII")
          WarcCapture(row.doc_id, captureId(r.recordId), records.length.toLong,
            body.length.toLong, md.digest(hx).map("%02x".format(_)).mkString,
            r.targetUri)
        }
      }
    }
  }

  /** Explode WARC shard rows to per-capture (doc_id, text) — the
    * multi-record twin of [[warcText]]: one crawl shard file feeds
    * every text pipeline one row per capture. */
  def warcShardText(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { row =>
      val records = decodeWarcRecords(row.content)
      records.iterator.filter(_.warcType == "response").map { r =>
        require(r.contentType.startsWith("application/http"),
          s"warc: response record is not an HTTP capture ('${r.contentType.take(48)}')")
        (captureId(r.recordId), new String(httpPayload(r.block).body, "UTF-8"))
      }
    }).toDF("doc_id", "text")
  }

  /** Multi-record shards where rows carrying a non-null
    * `revisitOfCol` encode as ISO 28500 REVISIT records (the crawl
    * world's native dedup: a re-crawled unchanged page stores no
    * payload, only `WARC-Refers-To` the original capture — the
    * identical-payload-digest profile). Revisit blocks are tiny
    * warc-fields; response captures are unchanged.
    */
  def asWarcShardsWithRevisits(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      revisitOfCol: String,
      perShard: Int = 100,
      uriCol: String = null): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(perShard > 0, "warc shards: perShard must be positive")
    // uriCol = null keeps the historical fixed per-id URI (and the q178
    // byte streams unchanged); with a column, every record — response
    // AND revisit — stamps its row's URI (a re-crawl reports the URL it
    // re-fetched, which is how URL-level dedup meets revisit records).
    val uriExpr = if (uriCol == null)
      concat(lit("https://example.org/doc/"), col(idCol).cast("long")).cast("string")
    else col(uriCol).cast("string")
    graft.Tables.fanOut(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("t"),
        col(revisitOfCol).cast("long").as("rv"),
        uriExpr.as("u"))
      .as[(Long, Array[Byte], Option[Long], String)]
      .groupByKey(_._1 / perShard)
      .mapGroups { (shardId, rows) =>
        val ds = rows.toSeq.sortBy(_._1)
        val out = new java.io.ByteArrayOutputStream(
          ds.map(_._2.length).sum + 512 * (ds.length + 1))
        out.write(recordOf("warcinfo", f"00000000-0000-4000-8003-${shardId}%012x",
          "application/warc-fields", s"software: graft$Crlf".getBytes("US-ASCII")))
        ds.foreach {
          case (docId, _, Some(src), uri) =>
            out.write(recordOf("revisit", f"00000000-0000-4000-8001-${docId}%012x",
              "application/warc-fields",
              s"profile: identical-payload-digest$Crlf".getBytes("US-ASCII"),
              Seq("WARC-Refers-To" -> f"<urn:uuid:00000000-0000-4000-8001-${src}%012x>",
                "WARC-Target-URI" -> uri)))
          case (docId, payload, None, uri) =>
            writeDocRecords(out, docId, payload, "text/plain; charset=utf-8",
              gzipBody = false, chunked = false, targetUri = uri)
        }
        MediaRow(shardId, "application/warc", out.toByteArray)
      }
  }

  /** Decode revisit-bearing shards and RESOLVE each revisit to its
    * referred capture: one row per capture,
    * (doc_id, canonical_id, is_revisit 0/1, resolved_md5) — a revisit
    * carries its ORIGINAL's payload digest, a response its own.
    * Resolution is a plain equi-join of the revisit rows against the
    * response rows on the referred capture id, so originals and
    * revisits may live in DIFFERENT shards (the real crawl shape —
    * re-crawls land in later files); a dangling WARC-Refers-To
    * surfaces as a null resolved_md5 row, never silently drops.
    */
  def warcRevisitDocs(media: Dataset[MediaRow]): DataFrame =
    warcRevisitRows(media)
      .select("doc_id", "canonical_id", "is_revisit", "resolved_md5")

  /** [[warcRevisitDocs]] + the capture's `WARC-Target-URI` — the input
    * the URL-level dedup keys on (q189): per-capture
    * (doc_id, canonical_id, is_revisit, resolved_md5, target_uri).
    */
  def warcRevisitDocsUri(media: Dataset[MediaRow]): DataFrame =
    warcRevisitRows(media)
      .select("doc_id", "canonical_id", "is_revisit", "resolved_md5", "target_uri")

  private def warcRevisitRows(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    val rows = media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { row =>
        decodeWarcRecords(row.content).iterator.collect {
          case r if r.warcType == "response" =>
            require(r.contentType.startsWith("application/http"),
              s"warc: response record is not an HTTP capture ('${r.contentType.take(48)}')")
            val body = httpPayload(r.block).body
            val hx = Media.hexUpper(body, 0, body.length).getBytes("US-ASCII")
            val cid = captureId(r.recordId)
            (cid, cid, 0L, md.digest(hx).map("%02x".format(_)).mkString, r.targetUri)
          case r if r.warcType == "revisit" =>
            require(r.refersTo.nonEmpty,
              s"warc: revisit record ${r.recordId.take(56)} has no WARC-Refers-To")
            (captureId(r.recordId), captureId(r.refersTo), 1L, null: String, r.targetUri)
        }
      }
    }.toDF("doc_id", "canonical_id", "is_revisit", "own_md5", "target_uri")
    val caps = rows.filter(col("is_revisit") === 0L)
      .select(col("doc_id").as("canonical_id"), col("own_md5").as("resolved_md5"))
    rows.select("doc_id", "canonical_id", "is_revisit", "target_uri")
      .join(caps, Seq("canonical_id"), "left")
      .select("doc_id", "canonical_id", "is_revisit", "resolved_md5", "target_uri")
  }

  /** Wrap a text corpus as WARC captures with REALISTIC HTTP body
    * encodings cycled by doc_id: % 4 == 0 identity, == 1 gzip
    * Content-Encoding, == 2 chunked Transfer-Encoding, == 3 both
    * (gzip inside chunked framing — coding order per RFC 9110). The
    * envelope is transparent to the recovered payload, so composed
    * rows reuse the identity-envelope oracles verbatim.
    */
  def asWarcEnveloped(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.Tables.fanOut(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("t"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaRow(id, "application/warc",
          encodeWarc(id, bytes,
            gzipBody = id % 4 == 1 || id % 4 == 3,
            chunked = id % 4 == 2 || id % 4 == 3))
      })
  }
}
