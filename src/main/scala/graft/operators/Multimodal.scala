package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: media as opaque
  * `binary` payloads + typed metadata, with decode / feature-extraction /
  * resize / frame-sampling as per-partition batch transforms.
  *
  * The image/audio codec libraries are not in this container, so
  * `StubDecoder` replaces the codec call with a DETERMINISTIC FAKE (clearly
  * marked below). Everything around it — the schema contract, the typed
  * Dataset plumbing, the `mapPartitions` batch shape (one decoder instance
  * per partition, streamed iterator, no per-row setup), the partition-level
  * parallelism — is real and is what carries over unchanged when a real
  * decoder is dropped in.
  */
object Multimodal {

  /** One media object: payload is opaque bytes; metadata is typed columns
    * (a struct in a wider catalog).
    */
  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
                            meta_width: Int, meta_height: Int)

  /** Extracted features. */
  final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                                 payload_md5: String, thumb_w: Int, thumb_h: Int,
                                 n_frames_sampled: Int)

  /** What a decoder returns; a real one would add pixel buffers / PCM. */
  final case class Decoded(width: Int, height: Int, nFrames: Int)

  trait MediaDecoder extends Serializable {
    def decode(kind: String, payload: Array[Byte], metaW: Int, metaH: Int): Decoded
  }

  /** STUB: stands in for the real codec (javax.imageio / ffmpeg / soundfile
    * are not installed here). Deterministic: dimensions from metadata,
    * frame count from payload size — so tests and oracles are exact. A real
    * decoder implements the same trait; nothing else changes.
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

  /** Build a media table from the documents fixture: payload = UTF-8 bytes
    * of the text (a stand-in blob), kind round-robins image/audio/video,
    * metadata dims derived deterministically from doc_id.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      (lit(32) + pmod(col("doc_id"), lit(97))).cast("int").as("meta_width"),
      (lit(32) + pmod(col("doc_id") * 7, lit(97))).cast("int").as("meta_height"))

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
                      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val dec = decoder.decode(r.kind, r.payload, r.meta_width, r.meta_height)
        md.reset()
        val hex = md.digest(r.payload).map("%02x".format(_)).mkString
        val (tw, th) = thumbDims(dec.width, dec.height)
        MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong, hex, tw, th, dec.nFrames)
      }
    }
  }
}
