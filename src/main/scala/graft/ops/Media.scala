package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Opaque binary media row: content plus typed metadata. In a real
  * pipeline `content` holds image/audio/video bytes read from object
  * storage; here the driver materializes it from the documents table so
  * the Spark-side plumbing (schema, partitioning, per-partition batch
  * processing) is real and testable.
  */
final case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])

final case class MediaFeatures(
    doc_id: Long,
    n_bytes: Long,
    n_frames: Long,
    frame_digest: String,
    width: Long,
    height: Long)

final case class FrameSample(doc_id: Long, frame_idx: Long, frame_md5: String)

/** Multimodal-column plumbing: binary content → decode → per-frame
  * feature extraction, as a typed `Dataset` pipeline over
  * `mapPartitions` (the Scala analog of arrow-batched python UDFs: one
  * JVM-side pass per partition, no per-row driver involvement).
  *
  * The decode step is a STUB — image/audio codecs are not available in
  * this environment — replaced by a deterministic fake (md5-derived
  * dimensions, fixed 256-byte "frames") so results are verifiable
  * end-to-end. The partitioning, schema, and batch shape are the real
  * design: at 100 TB this runs embarrassingly parallel with zero
  * shuffles, bounded memory per partition (streaming over rows), and
  * the binary column never leaves the executor.
  */
object Media {

  val FrameBytes = 256

  /** Wrap a text corpus as binary media rows (driver-side fake source;
    * a production source would be `spark.read.format("binaryFile")`).
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // decode/featurize runs per partition; fan under-parallel scans out
    // so a single small row group doesn't serialize the whole pipeline
    graft.Tables.fanOut(docs).select(
      col(idCol).cast("long").as("doc_id"),
      lit("image/fake").as("media_type"),
      encode(col(textCol), "UTF-8").as("content"))
      .as[MediaRow]
  }

  private def md5Hex(md: MessageDigest, b: Array[Byte]): String =
    md.digest(b).map("%02x".format(_)).mkString

  /** STUB decode: a real implementation would hand `content` to a codec
    * (??? in this container); the fake derives deterministic dimensions
    * from the content digest and hashes fixed-size frames — preserving
    * the exact compute/IO shape of a real decode+featurize pass.
    */
  def decodeStub(row: MediaRow): MediaFeatures =
    decodeWith(MessageDigest.getInstance("MD5"), row)

  /** Digest-reusing form: `md.digest()` resets after each call, so one
    * instance serves a whole partition (getInstance per frame was the
    * only measurable allocation in this pipeline).
    */
  private def decodeWith(md: MessageDigest, row: MediaRow): MediaFeatures = {
    val digest = md5Hex(md, row.content)
    val h60 = java.lang.Long.parseLong(digest.substring(0, 15), 16)
    val nFrames = (row.content.length + FrameBytes - 1) / FrameBytes
    val frameHashes = (0 until nFrames).map { f =>
      val from = f * FrameBytes
      val until = math.min(from + FrameBytes, row.content.length)
      md5Hex(md, java.util.Arrays.copyOfRange(row.content, from, until))
    }
    MediaFeatures(
      doc_id = row.doc_id,
      n_bytes = row.content.length.toLong,
      n_frames = nFrames.toLong,
      frame_digest = md5Hex(md, frameHashes.mkString.getBytes("UTF-8")),
      width = 64 + h60 % 1024,
      height = 64 + (h60 / 1024) % 1024)
  }

  /** Per-partition feature extraction: no shuffle, no driver round-trip,
    * memory bounded by one row at a time (iterator-to-iterator).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map(decodeWith(md, _))
    }
  }

  /** Frame sampling: every `every`-th fixed-size frame of each media
    * row, digested (a real pipeline would emit the frame bytes or a
    * thumbnail — same shape, bigger payload). Iterator-to-iterator
    * flatMap: zero shuffles, output size = input frames / `every`,
    * the content column never leaves the executor.
    */
  def sampleFrames(media: Dataset[MediaRow], every: Int): Dataset[FrameSample] = {
    require(every >= 1, s"every must be >= 1, got $every")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.flatMap { row =>
        val n = (row.content.length + FrameBytes - 1) / FrameBytes
        (0 until n by every).iterator.map { f =>
          val from = f * FrameBytes
          val until = math.min(from + FrameBytes, row.content.length)
          FrameSample(row.doc_id, f.toLong,
            md5Hex(md, java.util.Arrays.copyOfRange(row.content, from, until)))
        }
      }
    }
  }

  /** Resize metadata: scale (width, height) to fit `maxDim` preserving
    * aspect ratio, integer-exact (the stub twin of a thumbnailing
    * pass; a real implementation would also transform the bytes).
    * Pure column expressions — codegen'd, no UDF.
    */
  def resizeStub(features: Dataset[MediaFeatures], maxDim: Long): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    def scaled(c: String) =
      when(longest <= maxDim, col(c))
        .otherwise(expr(s"($c * $maxDim) div greatest(width, height)"))
    features.toDF().select(
      col("doc_id"), col("width"), col("height"),
      scaled("width").as("rs_width"),
      scaled("height").as("rs_height"))
  }
}
