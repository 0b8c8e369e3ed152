package graft.ops

import java.awt.image.BufferedImage
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Cross-encoder interop: blobs produced by the JDK's own codecs
  * (`javax.imageio` — a fully independent PNG/JPEG implementation that
  * ships with every JVM, no network or native install needed — and
  * `javax.sound.sampled` for RIFF/WAVE) feeding this engine's
  * validating decoders.
  *
  * Why this exists: every earlier image row (q132/q139/q149/…) decodes
  * streams produced by THIS repo's encoders, so a matched
  * encoder/decoder bug pair could cancel out. ImageIO breaks that
  * circularity — its PNG writer picks its own per-scanline filters and
  * DEFLATE framing, its JPEG writer runs libjpeg-derived tables and a
  * float/int DCT this repo never sees — while the DECODED raster stays
  * closed-form:
  *  - PNG is lossless, so decode ∘ imageioEncode over the q132 raster
  *    formula is the identity and the q132 oracle applies verbatim;
  *  - JPEG at compression quality 1.0 scales the base quant tables to
  *    all-ones, and a BLOCK-CONSTANT raster's forward DCT is exactly
  *    its DC term — so the lossy round is exact on block-constant
  *    rasters and the oracle rebuilds the raster straight from the
  *    cycled source bytes (the q139/q152 closed-form discipline).
  *
  * All encoding runs map-side per partition; the binary never leaves
  * the executor. ImageIO is headless-safe (no display needed) and the
  * writers are thread-confined per call (a fresh writer per partition
  * would also work, but `ImageIO.write`/writer-per-call is simplest
  * and allocation is trivial next to the DEFLATE/DCT work).
  */
object Interop {

  /** The q132/PNG raster formula ([[Media.encodePng]]'s geometry): RGB
    * raster of the cycled source bytes at w = 8 + l%40, h = 6 + l%23.
    */
  private[graft] def rgbRaster(src0: Array[Byte]): (Int, Int, Array[Byte]) = {
    val src = if (src0.isEmpty) Array(' '.toByte) else src0
    val l = src.length
    val w = 8 + l % 40
    val h = 6 + l % 23
    (w, h, Array.tabulate(h * w * 3)(i => src(i % l)))
  }

  /** BLOCK-CONSTANT gray raster at the q139 dims formula
    * (w = 8·(1+l%5), h = 8·(1+l%4)): every 8×8 block holds the single
    * byte src((by·bw + bx) % l) — the raster class on which a JPEG
    * round at quant 1 is exact (a constant block's forward DCT has
    * only DC, and DC/1 quantizes losslessly).
    */
  private[graft] def grayBlockRaster(src0: Array[Byte]): (Int, Int, Array[Byte]) = {
    val src = if (src0.isEmpty) Array(' '.toByte) else src0
    val l = src.length
    val w = 8 * (1 + l % 5)
    val h = 8 * (1 + l % 4)
    val bw = w / 8
    val pix = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { pix(y * w + x) = src(((y / 8) * bw + x / 8) % l); x += 1 }
      y += 1
    }
    (w, h, pix)
  }

  /** Encode an interleaved-RGB raster as PNG through the JDK's writer. */
  private[graft] def imageIoPngBytes(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val px = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      px(i) = ((rgb(3 * i) & 0xff) << 16) | ((rgb(3 * i + 1) & 0xff) << 8) |
        (rgb(3 * i + 2) & 0xff)
      i += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val out = new java.io.ByteArrayOutputStream(w * h + 256)
    require(ImageIO.write(img, "png", out), "imageio: no PNG writer available")
    out.toByteArray
  }

  /** Encode a gray raster as baseline JPEG through the JDK's writer at
    * an explicit compression quality (1.0f ⇒ all-ones quant tables ⇒
    * exact on block-constant rasters).
    */
  private[graft] def imageIoJpegGrayBytes(
      w: Int, h: Int, gray: Array[Byte], quality: Float): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val samples = new Array[Int](w * h)
    var i = 0
    while (i < w * h) { samples(i) = gray(i) & 0xff; i += 1 }
    img.getRaster.setSamples(0, 0, w, h, 0, samples)
    writeJpeg(img, quality)
  }

  /** Encode an interleaved-RGB raster as baseline color JPEG through
    * the JDK's writer (YCbCr, the writer's own sampling choice). */
  private[graft] def imageIoJpegRgbBytes(
      w: Int, h: Int, rgb: Array[Byte], quality: Float): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val px = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      px(i) = ((rgb(3 * i) & 0xff) << 16) | ((rgb(3 * i + 1) & 0xff) << 8) |
        (rgb(3 * i + 2) & 0xff)
      i += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    writeJpeg(img, quality)
  }

  private def writeJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val it = ImageIO.getImageWritersByFormatName("jpeg")
    require(it.hasNext, "imageio: no JPEG writer available")
    val writer = it.next()
    try {
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(quality)
      val out = new java.io.ByteArrayOutputStream(4096)
      val ios = ImageIO.createImageOutputStream(out)
      try {
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), param)
      } finally ios.close()
      out.toByteArray
    } finally writer.dispose()
  }

  /** Decode any ImageIO-readable blob to an interleaved-RGB raster —
    * the independent reference decode the cross-validation specs
    * compare against. Throws IllegalArgumentException on undecodable
    * bytes (the engine's fail-loudly contract).
    */
  private[graft] def imageIoDecodeRgb(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(b))
    require(img != null, "imageio: undecodable image stream")
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      rgb(3 * i) = ((px(i) >> 16) & 0xff).toByte
      rgb(3 * i + 1) = ((px(i) >> 8) & 0xff).toByte
      rgb(3 * i + 2) = (px(i) & 0xff).toByte
      i += 1
    }
    (w, h, rgb)
  }

  /** Decode a GRAY ImageIO-readable blob to one-byte-per-pixel
    * samples, read from the raster directly (getRGB would round-trip
    * the linear-gray color space through sRGB and shift levels).
    */
  private[graft] def imageIoDecodeGray(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(b))
    require(img != null, "imageio: undecodable image stream")
    require(img.getRaster.getNumBands == 1,
      s"imageio: expected gray stream, got ${img.getRaster.getNumBands} bands")
    val w = img.getWidth; val h = img.getHeight
    val samples = img.getRaster.getSamples(0, 0, w, h, 0, null.asInstanceOf[Array[Int]])
    val gray = new Array[Byte](w * h)
    var i = 0
    while (i < w * h) { gray(i) = samples(i).toByte; i += 1 }
    (w, h, gray)
  }

  /** Wrap a text corpus as ImageIO-encoded PNG rows over the q132
    * raster formula — the foreign-encoder twin of [[Media.asPng]]. */
  def asImageIoPng(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.Tables.fanOut(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("t"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w, h, raster) = rgbRaster(bytes)
        MediaRow(id, "image/png", imageIoPngBytes(w, h, raster))
      })
  }

  /** Wrap a text corpus as ImageIO-encoded baseline JPEG rows over
    * BLOCK-CONSTANT gray rasters at quality 1.0 — lossy container,
    * exact round, closed-form oracle (see the object doc).
    */
  def asImageIoJpeg(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.Tables.fanOut(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("t"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w, h, pix) = grayBlockRaster(bytes)
        MediaRow(id, "image/jpeg", imageIoJpegGrayBytes(w, h, pix, 1.0f))
      })
  }

  /** WAVE bytes written by the JDK's own audio stack over
    * [[Media.encodeWav]]'s envelope formulas (channels = 1 + l%2,
    * rate = 8000 + (l%8)·1000, samples = 64 + l%512, payload = the
    * source bytes cycled): the PCM content is identical to the
    * self-encoded corpus — so q110's oracle applies verbatim — but
    * every CONTAINER byte (RIFF framing, little-endian header fields,
    * chunk sizes) comes from `javax.sound.sampled`'s writer, which
    * this repo never implemented.
    */
  /** The JDK resolves a writer through the sound service registry on
    * EVERY `AudioSystem.write` call; under 32 concurrent encode tasks
    * that lookup contends (the q162 62× cluster leg ran ~28× its 1×
    * wall where the comparable decode rows ran ~7×). Resolve the
    * WAVE writer once per JVM through the public SPI instead.
    */
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(sys.error("audiosystem: no WAVE writer on this JVM"))
  }

  private[graft] def audioSystemWavBytes(src0: Array[Byte]): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
    val src = if (src0.isEmpty) Array(' '.toByte) else src0
    val l = src.length
    val channels = 1 + l % 2
    val sampleRate = 8000 + (l % 8) * 1000
    val nSamples = 64 + l % 512 // per channel
    val dataBytes = nSamples * channels * 2
    val pcm = new Array[Byte](dataBytes)
    var i = 0
    while (i < dataBytes) { pcm(i) = src(i % l); i += 1 }
    // Little-endian signed 16-bit PCM: byte-identical payload pass-
    // through (the writer re-packs only if the format needs conversion).
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels,
      /*signed*/ true, /*bigEndian*/ false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream(44 + dataBytes)
    wavWriter.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Decode a WAVE blob through the JDK's reader to (channels, rate,
    * samples-per-channel, PCM bytes) — the independent reference
    * decode AudioSystemCrossSpec compares [[Media.decodeWavBytes]]
    * against in both directions. Throws on undecodable/non-16-bit-PCM
    * streams (the engine's fail-loudly contract).
    */
  private[graft] def audioSystemDecodeWav(b: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(b))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(s"audiosystem: undecodable stream: $e")
      }
    val f = ais.getFormat
    require(f.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
      f.getSampleSizeInBits == 16 && !f.isBigEndian,
      s"audiosystem: expected 16-bit LE signed PCM, got $f")
    val pcm = ais.readAllBytes()
    require(pcm.length % (f.getChannels * 2) == 0,
      "audiosystem: payload not frame-aligned")
    (f.getChannels, f.getSampleRate.toInt, pcm.length / (f.getChannels * 2), pcm)
  }

  /** Wrap a text corpus as AudioSystem-encoded WAVE rows — the
    * foreign-encoder twin of [[Media.asWav]] (the audio member of the
    * q156/q157 decoder-independence family).
    */
  def asAudioSystemWav(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.Tables.fanOut(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("t"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaRow(id, "audio/wav", audioSystemWavBytes(bytes))
      })
  }
}
