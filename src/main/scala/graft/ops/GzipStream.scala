package graft.ops

import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Gzip MEMBER-STREAM text ingest (RFC 1952): the text-side container
  * of the multimodal family. Real crawl/text corpora arrive as
  * `.jsonl.gz` / WARC-style gzip streams that are CONCATENATIONS of
  * members (one per record or shard), so the decoder here is a full
  * member walk — per-member header parse (all optional fields: FEXTRA
  * / FNAME / FCOMMENT / FHCRC with its CRC16 check), raw-DEFLATE
  * inflate, and per-member CRC32 + ISIZE trailer validation — that
  * fails loudly on truncation, trailing garbage, reserved flag bits,
  * or any checksum mismatch (the engine's decode contract: corrupt
  * public bytes must never silently fabricate text).
  *
  * The encoder splits each document's UTF-8 bytes across
  * `1 + l % 3` members and cycles the optional header fields per
  * member, so production data (not just specs) exercises every header
  * path. Decompression runs map-side per partition; the compressed
  * column never leaves the executor, and the decompressed text flows
  * straight into the existing dedup/curation pipelines (identity
  * oracles: gzip∘encode then decode is the identity on the text).
  */
object GzipStream {

  private val FhcrcBit = 2
  private val FextraBit = 4
  private val FnameBit = 8
  private val FcommentBit = 16

  /** Encode `src` as a multi-member gzip stream: `1 + l % 3` members,
    * byte ranges split evenly, optional header fields cycled per
    * member ((l + i) % 2 → FNAME, % 3 → FHCRC, % 5 → FEXTRA) so the
    * corpus exercises every decoder path.
    */
  private[graft] def encodeGzipMembers(src: Array[Byte]): Array[Byte] = {
    // No empty→' ' remap (unlike the media encoders): gzip members
    // carry empty payloads natively, so decode ∘ encode stays the
    // identity on EVERY text — which is what lets composed rows
    // (q159) reuse the uncompressed pipeline's oracle verbatim.
    val l = src.length
    val members = 1 + l % 3
    val out = new java.io.ByteArrayOutputStream(l / 2 + 64 * members)
    var i = 0
    while (i < members) {
      val from = i * l / members
      val until = (i + 1) * l / members
      writeMember(out, src, from, until - from, l + i)
      i += 1
    }
    out.toByteArray
  }

  private def writeMember(
      out: java.io.ByteArrayOutputStream,
      src: Array[Byte], off: Int, len: Int, variant: Int): Unit = {
    val hdr = new java.io.ByteArrayOutputStream(32)
    var flg = 0
    if (variant % 2 == 0) flg |= FnameBit
    if (variant % 3 == 0) flg |= FhcrcBit
    if (variant % 5 == 0) flg |= FextraBit
    hdr.write(0x1f); hdr.write(0x8b); hdr.write(8) // ID1 ID2 CM=deflate
    hdr.write(flg)
    // MTIME = 0 (deterministic), XFL = 0, OS = 255 (unknown)
    hdr.write(0); hdr.write(0); hdr.write(0); hdr.write(0)
    hdr.write(0); hdr.write(255)
    if ((flg & FextraBit) != 0) {
      val extra = s"gx${variant % 97}".getBytes("US-ASCII")
      hdr.write(extra.length & 0xff); hdr.write((extra.length >> 8) & 0xff)
      hdr.write(extra, 0, extra.length)
    }
    if ((flg & FnameBit) != 0) {
      val name = s"m$variant.txt".getBytes("ISO-8859-1")
      hdr.write(name, 0, name.length); hdr.write(0)
    }
    if ((flg & FhcrcBit) != 0) {
      val crc = new CRC32
      crc.update(hdr.toByteArray)
      val c = crc.getValue.toInt
      hdr.write(c & 0xff); hdr.write((c >> 8) & 0xff)
    }
    hdr.writeTo(out)
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(src, off, len)
    deflater.finish()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(tmp)
      out.write(tmp, 0, n)
    }
    deflater.end()
    val crc = new CRC32
    crc.update(src, off, len)
    val c = crc.getValue.toInt
    out.write(c & 0xff); out.write((c >> 8) & 0xff)
    out.write((c >> 16) & 0xff); out.write((c >> 24) & 0xff)
    out.write(len & 0xff); out.write((len >> 8) & 0xff)
    out.write((len >> 16) & 0xff); out.write((len >> 24) & 0xff)
  }

  /** Walk and validate every member of a gzip stream; returns
    * (member count, concatenated decompressed bytes). Throws
    * IllegalArgumentException on any malformation.
    */
  private[graft] def decodeGzipMembers(b: Array[Byte]): (Int, Array[Byte]) = {
    val out = new java.io.ByteArrayOutputStream(b.length * 3)
    var p = 0
    var members = 0
    while (p < b.length) {
      p = decodeMember(b, p, out)
      members += 1
    }
    require(members > 0, "gzip: empty stream")
    (members, out.toByteArray)
  }

  /** Parse one member starting at `p`; append its decompressed bytes;
    * return the offset just past its trailer. */
  private def decodeMember(
      b: Array[Byte], p0: Int, out: java.io.ByteArrayOutputStream): Int = {
    var p = p0
    def u8(): Int = {
      require(p < b.length, "gzip: truncated header")
      val v = b(p) & 0xff; p += 1; v
    }
    def le16(): Int = { val lo = u8(); lo | (u8() << 8) }
    def le32(): Long = { val lo = le16().toLong; lo | (le16().toLong << 16) }
    require(u8() == 0x1f && u8() == 0x8b, "gzip: bad magic")
    require(u8() == 8, "gzip: unsupported compression method (deflate only)")
    val flg = u8()
    require((flg & 0xe0) == 0, f"gzip: reserved FLG bits set (0x$flg%02x)")
    le32() // MTIME — informational
    u8(); u8() // XFL, OS
    if ((flg & FextraBit) != 0) {
      val xlen = le16()
      require(p + xlen <= b.length, "gzip: truncated FEXTRA field")
      p += xlen
    }
    if ((flg & FnameBit) != 0) { while (u8() != 0) () }
    if ((flg & FcommentBit) != 0) { while (u8() != 0) () }
    if ((flg & FhcrcBit) != 0) {
      val crc = new CRC32
      crc.update(b, p0, p - p0)
      val want = le16()
      require((crc.getValue & 0xffffL) == want,
        "gzip: FHCRC header checksum mismatch")
    }
    val inflater = new Inflater(true) // raw deflate: gzip wraps its own framing
    val crc = new CRC32
    var produced = 0L
    try {
      inflater.setInput(b, p, b.length - p)
      val tmp = new Array[Byte](8192)
      while (!inflater.finished()) {
        val n =
          try inflater.inflate(tmp)
          catch {
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(
                s"gzip: corrupt DEFLATE stream (${e.getMessage})")
          }
        require(n > 0 || inflater.finished(),
          "gzip: truncated DEFLATE stream")
        crc.update(tmp, 0, n)
        out.write(tmp, 0, n)
        produced += n
      }
      p += inflater.getBytesRead.toInt
    } finally inflater.end()
    require(p + 8 <= b.length, "gzip: truncated member trailer")
    val wantCrc = le32()
    require(crc.getValue == wantCrc,
      f"gzip: member CRC32 mismatch (got 0x${crc.getValue}%08x, trailer 0x$wantCrc%08x)")
    val wantIsize = le32()
    require((produced & 0xffffffffL) == wantIsize,
      s"gzip: member ISIZE ${wantIsize} != decompressed length ${produced & 0xffffffffL}")
    p
  }

  /** Wrap a text corpus as multi-member gzip rows — the text-side
    * twin of [[Media.asPpm]]/[[Media.asWav]]. */
  def asGzip(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.Tables.fanOut(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("t"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaRow(id, "application/gzip", encodeGzipMembers(bytes))
      })
  }

  final case class GzipFeatures(
      doc_id: Long,
      n_members: Long,
      n_bytes: Long,
      text_md5: String)

  /** Decode-and-validate each row's member stream; digest the
    * decompressed payload (decode ∘ encode is the identity, so the
    * oracle replays the digest from the source text directly). */
  def decodeGzip(media: Dataset[MediaRow]): Dataset[GzipFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { row =>
        val (members, bytes) = decodeGzipMembers(row.content)
        // digest the uppercase-hex form — DuckDB md5(hex(blob)) parity
        val hx = Media.hexUpper(bytes, 0, bytes.length).getBytes("US-ASCII")
        GzipFeatures(row.doc_id, members.toLong, bytes.length.toLong,
          md.digest(hx).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Decompress each row back to a (doc_id, text) frame — the bridge
    * that routes compressed corpora into every existing text pipeline
    * (dedup, curation, substring, BPE) unchanged. */
  def decompressText(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { row =>
      val (_, bytes) = decodeGzipMembers(row.content)
      (row.doc_id, new String(bytes, "UTF-8"))
    }).toDF("doc_id", "text")
  }
}
