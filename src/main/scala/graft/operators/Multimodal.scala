package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: media as opaque
  * `binary` payloads + typed metadata, with decode / feature-extraction /
  * resize / frame-sampling as per-partition batch transforms.
  *
  * ALL THREE kinds decode for real on pure-JDK codecs: images are genuine
  * PNGs (javax.imageio), audio genuine 16-bit PCM WAVs
  * (javax.sound.sampled), and video genuine multi-frame ANIMATED GIFs
  * (javax.imageio's GIF writer supports frame sequences — the one true
  * video container a bare JDK can both encode and decode). Payloads are
  * encoded executor-side with deterministic fills, decoded back through
  * the same JDK codecs, and the decoded pixel/sample digests have closed
  * forms the SQL oracle recomputes — a broken encoder OR decoder breaks
  * the hash. The `MediaDecoder` trait stays the swap point for richer
  * codecs (ffmpeg et al.) outside this container.
  */
object Multimodal {

  /** One media object: payload is opaque bytes; metadata is typed columns
    * (a struct in a wider catalog).
    */
  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
                            meta_width: Int, meta_height: Int)

  /** Extracted features. `width`/`height` are DECODED physical properties
    * (PNG/GIF header dims for image and video, sample-rate x channels for
    * audio — proving the payload round-trip, never metadata passthrough);
    * `n_frames_sampled` is the decoded frame count (GIF frames, WAV
    * sample frames; 0 for stills); `pixel_sum` is the decoded content
    * digest — red-channel sum over every pixel of every frame for
    * image/video, abs-sample sum for audio — which the SQL oracle
    * recomputes in closed form from the deterministic fills.
    */
  final case class MediaFeatures(doc_id: Long, kind: String, width: Int,
                                 height: Int, thumb_w: Int, thumb_h: Int,
                                 n_frames_sampled: Int,
                                 pixel_sum: Long)

  /** What a decoder returns; pixelSum is -1 for kinds without pixel data. */
  final case class Decoded(width: Int, height: Int, nFrames: Int,
                           pixelSum: Long = -1L)

  trait MediaDecoder extends Serializable {
    def decode(kind: String, payload: Array[Byte], metaW: Int, metaH: Int): Decoded
  }

  /** REAL codecs on the JDK, one per kind: PNG (image — header dimensions
    * + full pixel read, red-channel sum as the content digest), WAV
    * (audio — see [[WavCodec]]: width/height carry decoded sampleRate and
    * channel count, nFrames the frame count, pixelSum the abs-sample
    * digest), and multi-frame GIF (video — see [[GifCodec]]: frame-0
    * dims, decoded frame count, red-channel sum over EVERY frame).
    * Metadata dims are ignored on purpose — a payload that doesn't
    * round-trip fails the oracle instead of being papered over by
    * metadata. One decoder per partition via extractFeatures'
    * mapPartitions; the ImageIO disk cache is off.
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
        case "video" => GifCodec.decode(payload)
        case other => throw new IllegalArgumentException(
          s"no codec for kind '$other' — implement MediaDecoder for it")
      }
  }

  /** REAL video codec on the JDK's javax.imageio GIF sequence support:
    * encodes `nFrames(docId)` grayscale frames (fill: pixel (x, y) of
    * frame f carries (doc_id + 3 f + x + y) mod 256) into ONE animated
    * GIF via `prepareWriteSequence`/`writeToSequence`, and decodes the
    * frames back with `getNumImages(true)` + per-frame reads. An 8-bit
    * grayscale fill round-trips GIF's 256-entry palette losslessly
    * (probe-verified), so the decoded all-frames pixel sum has a closed
    * form the SQL oracle recomputes — frame COUNT, frame DIMS, and frame
    * CONTENT are all checked, not just container magic.
    */
  private[graft] object GifCodec {
    def nFrames(docId: Long): Int = 2 + (docId % 7).toInt
    def frameW(docId: Long): Int = 16 + (docId % 16).toInt
    def frameH(docId: Long): Int = 16 + ((docId * 5) % 16).toInt

    private def frame(docId: Long, f: Int): java.awt.image.BufferedImage = {
      val (w, h) = (frameW(docId), frameH(docId))
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, ((docId + 3L * f + x + y) % 256).toInt)
          x += 1
        }
        y += 1
      }
      img
    }

    def encode(docId: Long): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      try {
        wr.setOutput(ios)
        wr.prepareWriteSequence(null)
        (0 until nFrames(docId)).foreach(f =>
          wr.writeToSequence(
            new javax.imageio.IIOImage(frame(docId, f), null, null), null))
        wr.endWriteSequence()
      } finally { wr.dispose(); ios.close() }
      bos.toByteArray
    }

    private def reader(payload: Array[Byte]): javax.imageio.ImageReader = {
      val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      rd.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload)))
      rd
    }

    private def redSum(img: java.awt.image.BufferedImage): Long = {
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
      sum
    }

    def decode(payload: Array[Byte]): Decoded = {
      val rd = reader(payload)
      try {
        val n = rd.getNumImages(true)
        require(n > 0, "payload is not a decodable GIF")
        val first = rd.read(0)
        var sum = redSum(first)
        var f = 1
        while (f < n) { sum += redSum(rd.read(f)); f += 1 }
        Decoded(first.getWidth, first.getHeight, n, sum)
      } finally rd.dispose()
    }

    /** Frame count + pixel digests of the SELECTED frames through one
      * reader open — the clip-selection decode: a real pipeline seeks the
      * codec once and materializes only the sampled frames' pixels.
      * `pick` maps the decoded frame count to the sampled indices.
      */
    def sampleSums(payload: Array[Byte], pick: Int => Seq[Int]): Seq[(Int, Long)] = {
      val rd = reader(payload)
      try {
        val n = rd.getNumImages(true)
        require(n > 0, "payload is not a decodable GIF")
        pick(n).map(idx => idx -> redSum(rd.read(idx)))
      } finally rd.dispose()
    }

    /** Per-frame 8x8 point-sampled aHash (the [[Multimodal.imageHashes]]
      * sampler applied to every decoded frame through one reader open) —
      * the frame-level fingerprint video near-dup detection joins on.
      */
    def frameHashes(payload: Array[Byte]): Seq[(Int, Long)] = {
      val rd = reader(payload)
      try {
        val n = rd.getNumImages(true)
        require(n > 0, "payload is not a decodable GIF")
        (0 until n).map(idx => idx -> ahashOf(rd.read(idx)))
      } finally rd.dispose()
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
    * doc_id; payloads are the UTF-8 text bytes (stand-in blobs —
    * [[mediaTableReal]] swaps in the genuine encoded media).
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      (lit(32) + pmod(col("doc_id"), lit(97))).cast("int").as("meta_width"),
      (lit(32) + pmod(col("doc_id") * 7, lit(97))).cast("int").as("meta_height"))

  /** mediaTable with REAL payloads for every kind: images become genuine
    * PNGs, audio rows genuine 16-bit PCM WAVs, video rows genuine
    * multi-frame animated GIFs — all encoded right here on the executors
    * (a per-partition map, no shuffle, no driver bytes).
    */
  def mediaTableReal(docs: DataFrame, onlyKind: String = null): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    // push the kind filter BELOW the encode: a single-modality consumer
    // (fingerprints, frame sampling) must never pay the other kinds'
    // codec cost — the metadata predicate prunes before any payload
    // work, the same shape as filtering on kind before decode at 100 TB
    val base = mediaTable(docs)
    val wanted = if (onlyKind == null) base
      else base.filter(col("kind") === onlyKind)
    wanted.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        r.kind match {
          case "image" =>
            r.copy(payload = pngPayload(r.doc_id, r.meta_width, r.meta_height))
          case "audio" => r.copy(payload = WavCodec.encode(r.doc_id))
          case "video" => r.copy(payload = GifCodec.encode(r.doc_id))
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

  /** One sampled frame: `frame_px_sum` is the decoded pixel digest of
    * that frame alone — proof the sampler materialized the FRAME'S
    * pixels, not just planned an offset.
    */
  final case class FrameSample(doc_id: Long, frame_idx: Int, frame_px_sum: Long)

  /** Evenly-spaced frame sampling for video rows — the clip-selection step
    * of a video training pipeline: decode the GIF's frame count, pick
    * min(k, n) evenly spaced frames (idx = i*n/k, the standard stride
    * that always includes frame 0 and never repeats while n >= k), and
    * materialize each sampled frame's pixels through one reader open.
    * flatMap shape: each row expands to at most k rows, no shuffle, no
    * driver involvement; the digests join back on doc_id or feed the
    * training batch directly.
    */
  def sampleFrames(media: Dataset[MediaRow], k: Int = 4): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.kind != "video") Iterator.empty
      else GifCodec.sampleSums(r.payload, n => {
        val kk = math.min(k, n)
        (0 until kk).map(i => i * n / kk)
      }).iterator.map { case (idx, sum) => FrameSample(r.doc_id, idx, sum) }
    }
  }

  /** One image's perceptual fingerprint: a 64-bit point-sampled average
    * hash over the DECODED pixels.
    */
  final case class ImageHash(doc_id: Long, width: Int, height: Int,
                             ahash: Long)

  /** Perceptual image fingerprinting (aHash, point-sampled variant) —
    * the image-side analogue of the text corpus's simhash_sketch: decode
    * each PNG, sample an 8x8 grid at (i*w/8, j*h/8) (integer division —
    * portable to the SQL oracle bit-for-bit), and set bit j*8+i when the
    * sample's gray value exceeds the integer mean of the 64 samples.
    * Identical pixels hash identically; small global shifts flip few
    * bits, so near-duplicate images pair under a banded hamming join —
    * the same 16-bit-chunk banding kernel Dedup.simhashPairs uses on
    * text, applied to these fingerprints downstream (MultimodalSpec
    * exercises the pairing on crafted duplicates; the fixture's gradient
    * fills make genuine near-dup images vanishingly rare, so the wired
    * query ships the fingerprint table itself). Decode runs one codec
    * per partition via mapPartitions — no shuffle, no driver bytes; at
    * 100 TB the hash is 8 bytes per image against payloads of megabytes,
    * exactly the reduction that makes image dedup tractable.
    */
  /** The 8x8 point-sampled aHash of one decoded image — the ONE sampler
    * behind [[imageHashes]], [[GifCodec.frameHashes]], and the streaming
    * media-dedup path, so image and video fingerprints stay comparable by
    * construction. Samples the RED channel ((rgb >> 16) & 0xFF) — the
    * same channel every decode digest in this file reads — which equals
    * the gray value on grayscale content; a luminance blend would differ
    * only on color payloads and must change HERE for every consumer at
    * once, never in a private copy.
    */
  private[graft] def ahashOf(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val samples = new Array[Long](64)
    var k = 0
    while (k < 64) {
      samples(k) = (img.getRGB((k % 8) * w / 8, (k / 8) * h / 8) >> 16) & 0xFF
      k += 1
    }
    val mean = samples.sum / 64
    var bits = 0L
    k = 0
    while (k < 64) {
      if (samples(k) > mean) bits |= (1L << k)
      k += 1
    }
    bits
  }

  def imageHashes(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.kind != "image") Iterator.empty
        else {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          Iterator.single(
            ImageHash(r.doc_id, img.getWidth, img.getHeight, ahashOf(img)))
        }
      }
    }
  }

  /** One audio clip's energy fingerprint: a 64-bit hash over the decoded
    * waveform's 64-window energy envelope.
    */
  final case class AudioHash(doc_id: Long, n_samples: Int, ehash: Long)

  /** Acoustic energy fingerprinting — the audio cell of the dedup x
    * modality matrix (images: [[imageHashes]]; text: Dedup.simhash):
    * decode the WAV's PCM samples, partition them into 64 energy windows
    * (sample i lands in window i*64/n — integer division, portable to the
    * SQL oracle), sum |sample| per window, and set bit w when window w's
    * energy exceeds the integer mean of the 64 window energies. The
    * envelope shape — not the raw amplitude — carries the bits, so
    * re-encoded or gain-scaled copies of a clip stay hamming-close while
    * unrelated clips diverge; pairs come from the same banded
    * [[Dedup.hammingPairs]] kernel text and image fingerprints use.
    * mapPartitions decode, 8 bytes of fingerprint per clip, no shuffle.
    */
  def audioHashes(media: Dataset[MediaRow]): Dataset[AudioHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.kind != "audio") Iterator.empty
        else {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val n = ais.getFrameLength.toInt
          val raw = ais.readAllBytes()
          val win = new Array[Long](64)
          var i = 0
          while (i < n) {
            val s = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
            win((i.toLong * 64 / n).toInt) += math.abs(s.toLong)
            i += 1
          }
          val mean = win.sum / 64
          var bits = 0L
          var w = 0
          while (w < 64) {
            if (win(w) > mean) bits |= (1L << w)
            w += 1
          }
          Iterator.single(AudioHash(r.doc_id, n, bits))
        }
      }
    }
  }

  /** One video frame's perceptual fingerprint. */
  final case class VideoFrameHash(doc_id: Long, frame_idx: Int, fhash: Long)

  /** Per-FRAME perceptual fingerprinting for video — the last cell of the
    * dedup x modality matrix (text: simhash; image: [[imageHashes]];
    * audio: [[audioHashes]]): decode every GIF frame through one reader
    * open and hash it with the same 8x8 point-sampled aHash the image
    * path uses. Frame granularity is what video dedup actually keys on —
    * two clips sharing ANY frame fingerprint are near-dup candidates
    * (re-cuts, trims, and re-encodes share frames; whole-clip hashes
    * miss all of them), so the downstream join is frame-hash equality
    * scored by shared-frame count, and [[Dedup.hammingPairs]] handles
    * the tolerant variant. flatMap expansion (≤ nFrames rows per clip),
    * one codec per partition, 8 bytes per frame against megabyte clips.
    */
  def videoFrameHashes(media: Dataset[MediaRow]): Dataset[VideoFrameHash] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.kind != "video") Iterator.empty
      else GifCodec.frameHashes(r.payload).iterator.map {
        case (idx, bits) => VideoFrameHash(r.doc_id, idx, bits)
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
      rows.map { r =>
        val dec = decoder.decode(r.kind, r.payload, r.meta_width, r.meta_height)
        val (tw, th) = thumbDims(dec.width, dec.height)
        MediaFeatures(r.doc_id, r.kind, dec.width, dec.height, tw, th,
          dec.nFrames, dec.pixelSum)
      }
    }
  }
}
