package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: media as opaque
  * `binary` payloads + typed metadata, with decode / feature-extraction /
  * resize / frame-sampling as per-partition batch transforms.
  *
  * The IMAGE path is real end-to-end: fixture payloads are genuine PNGs
  * (encoded executor-side with the JDK's javax.imageio, deterministic
  * gradient fill) and `ImageIoDecoder` decodes them back — true header
  * dimensions, true pixel reads. Audio/video codecs are not in this
  * container (no ffmpeg/soundfile), so those kinds go through the clearly
  * marked `StubDecoder`; its trait is the swap point, same as the image
  * path demonstrates.
  */
object Multimodal {

  /** One media object: payload is opaque bytes; metadata is typed columns
    * (a struct in a wider catalog).
    */
  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
                            meta_width: Int, meta_height: Int)

  /** Extracted features. `width`/`height` are DECODED dimensions (read
    * from the PNG header for images — proving the payload round-trip —
    * and metadata passthrough for the stubbed kinds); `pixel_sum` is the
    * sum of decoded red-channel values (image only), the pixel-level
    * digest the oracle recomputes in closed form; `payload_md5` digests
    * the raw payload for the stubbed kinds (images carry the pixel digest
    * instead — an external SQL engine cannot re-encode a PNG to hash it).
    */
  final case class MediaFeatures(doc_id: Long, kind: String, width: Int,
                                 height: Int, thumb_w: Int, thumb_h: Int,
                                 n_frames_sampled: Int,
                                 payload_md5: Option[String],
                                 pixel_sum: Option[Long])

  /** What a decoder returns; pixelSum is -1 for kinds without pixel data. */
  final case class Decoded(width: Int, height: Int, nFrames: Int,
                           pixelSum: Long = -1L)

  trait MediaDecoder extends Serializable {
    def decode(kind: String, payload: Array[Byte], metaW: Int, metaH: Int): Decoded
  }

  /** STUB: stands in for the audio/video codecs (ffmpeg/soundfile are not
    * installed here). Deterministic: dimensions from metadata, frame count
    * from payload size — so tests and oracles are exact. A real decoder
    * implements the same trait; nothing else changes (ImageIoDecoder is
    * exactly that swap for images).
    */
  object StubDecoder extends MediaDecoder {
    override def decode(kind: String, payload: Array[Byte], metaW: Int, metaH: Int): Decoded = {
      val frames = kind match {
        case "video" => math.min(8L, 1L + payload.length / 1024L).toInt
        case _       => 0
      }
      Decoded(metaW, metaH, frames)
    }
  }

  /** REAL image codec on the JDK's javax.imageio: decodes the PNG payload
    * (header dimensions + full pixel read, summing the red channel as the
    * content digest), ignoring the metadata dims on purpose — a payload
    * that doesn't round-trip fails the oracle instead of being papered
    * over by metadata. AUDIO rows decode for real too (javax.sound WAV —
    * see [[WavCodec]]): width/height carry the decoded sampleRate and
    * channel count (the decoded physical properties, in the schema shared
    * across kinds), nFrames the audio frame count, pixelSum the
    * abs-sample content digest. Video (no codec in the container)
    * delegates to StubDecoder. One decoder per partition via
    * extractFeatures' mapPartitions; the ImageIO disk cache is off.
    */
  object ImageIoDecoder extends MediaDecoder {
    javax.imageio.ImageIO.setUseCache(false)
    override def decode(kind: String, payload: Array[Byte], metaW: Int, metaH: Int): Decoded =
      kind match {
        case "image" =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          require(img != null, "payload is not a decodable image")
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              sum += (img.getRGB(x, y) >> 16) & 0xff
              x += 1
            }
            y += 1
          }
          Decoded(img.getWidth, img.getHeight, 0, sum)
        case "audio" => WavCodec.decode(payload)
        case _ => StubDecoder.decode(kind, payload, metaW, metaH)
      }
  }

  /** REAL audio codec on the JDK's javax.sound.sampled: 16-bit PCM mono
    * WAV, encoded AND decoded through AudioSystem (no hand-rolled RIFF
    * parsing — the true codec round-trip, like the PNG path). The sample
    * stream is the deterministic integer pattern
    * `((doc_id*31 + i*17) mod 65536) - 32768`, so the decoded
    * abs-sample digest has a closed form the SQL oracle recomputes —
    * a broken encoder or decoder breaks the equality.
    */
  private[graft] object WavCodec {
    def sampleRate(docId: Long): Int = 8000 + ((docId / 3) % 3).toInt * 4000
    def nSamples(docId: Long): Int = 400 + (docId % 256).toInt

    def encode(docId: Long): Array[Byte] = {
      val n = nSamples(docId)
      val raw = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = (((docId * 31 + i.toLong * 17) % 65536) - 32768).toInt
        raw(2 * i) = (s & 0xff).toByte
        raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate(docId).toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    def decode(payload: Array[Byte]): Decoded = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      val frames = ais.getFrameLength.toInt
      val raw = ais.readAllBytes()
      var sum = 0L
      var i = 0
      while (i < frames) {
        val s = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toLong
        sum += math.abs(s)
        i += 1
      }
      Decoded(fmt.getSampleRate.toInt, fmt.getChannels, frames, sum)
    }
  }

  /** Deterministic PNG payload: a grayscale gradient where pixel (x, y)
    * carries value (doc_id + x + y) mod 256 in every channel. PNG is
    * lossless, so the decoded pixel sum has the closed form the SQL
    * oracle recomputes — any encode or decode defect breaks the equality.
    */
  private[graft] def pngPayload(docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((docId + x + y) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Build a media table from the documents fixture: kind round-robins
    * image/audio/video, metadata dims derive deterministically from
    * doc_id; audio/video payloads are the UTF-8 text bytes (stand-in
    * blobs for the stubbed codecs).
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      (lit(32) + pmod(col("doc_id"), lit(97))).cast("int").as("meta_width"),
      (lit(32) + pmod(col("doc_id") * 7, lit(97))).cast("int").as("meta_height"))

  /** mediaTable with REAL payloads for image AND audio rows: images
    * become genuine PNGs, audio rows genuine 16-bit PCM WAVs (both
    * encoded right here on the executors — a per-partition map, no
    * shuffle, no driver bytes). Video rows keep their stand-in blobs.
    */
  def mediaTableReal(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    mediaTable(docs).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        r.kind match {
          case "image" =>
            r.copy(payload = pngPayload(r.doc_id, r.meta_width, r.meta_height))
          case "audio" => r.copy(payload = WavCodec.encode(r.doc_id))
          case _ => r
        }
      }
    }
  }

  /** Aspect-preserving thumbnail bound: longest side <= maxSide, integer
    * arithmetic only (portable to the SQL oracle).
    */
  private[graft] def thumbDims(w: Int, h: Int, maxSide: Int = 64): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= maxSide) (w, h)
    else (math.max(1, w * maxSide / m), math.max(1, h * maxSide / m))
  }

  /** One sampled frame: byte offset into the payload where a real pipeline
    * seeks the codec (re-decoding from the nearest keyframe).
    */
  final case class FrameSample(doc_id: Long, frame_idx: Int, frame_offset: Long)

  /** Evenly-spaced frame sampling for video rows — the clip-selection step
    * of a video training pipeline: the decoder reports the frame count;
    * emit one descriptor per sampled frame with its byte offset. flatMap
    * shape: each row expands to at most the decoder's bounded frame count,
    * no shuffle, no driver involvement; the descriptors join back on
    * doc_id or feed a second decode pass that materializes pixels.
    */
  def sampleFrames(media: Dataset[MediaRow],
                   decoder: MediaDecoder = StubDecoder): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val dec = decoder.decode(r.kind, r.payload, r.meta_width, r.meta_height)
      if (dec.nFrames <= 0) Iterator.empty
      else {
        val step = r.payload.length.toLong / dec.nFrames
        (0 until dec.nFrames).iterator.map(i => FrameSample(r.doc_id, i, i * step))
      }
    }
  }

  /** Decode + feature-extract, one decoder per partition, streamed. This is
    * the batch shape that matters at scale: no driver involvement, no
    * per-row decoder setup, output is a typed Dataset that joins back on
    * doc_id.
    */
  def extractFeatures(media: Dataset[MediaRow],
                      decoder: MediaDecoder = ImageIoDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val dec = decoder.decode(r.kind, r.payload, r.meta_width, r.meta_height)
        val (tw, th) = thumbDims(dec.width, dec.height)
        // kinds the decoder actually OPENS carry the decoded content
        // digest (pixel/sample sum); only stub-decoded kinds fall back
        // to the raw-payload md5
        val real = dec.pixelSum >= 0
        val digest =
          if (real) None
          else {
            md.reset()
            Some(md.digest(r.payload).map("%02x".format(_)).mkString)
          }
        val psum = if (real) Some(dec.pixelSum) else None
        MediaFeatures(r.doc_id, r.kind, dec.width, dec.height, tw, th,
          dec.nFrames, digest, psum)
      }
    }
  }
}
