package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("thumbDims preserves aspect and bounds the long side") {
    assert(Multimodal.thumbDims(40, 30) == (40, 30))      // under bound: untouched
    assert(Multimodal.thumbDims(128, 64) == (64, 32))     // halved
    assert(Multimodal.thumbDims(640, 2) == (64, 1))       // floor >= 1
  }

  test("PNG payload round-trips through the real codec: dims + pixel sum") {
    val (id, w, h) = (5L, 100, 50)
    val png = Multimodal.pngPayload(id, w, h)
    // PNG magic — the payload is a genuine image file, not a fake blob
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val dec = Multimodal.ImageIoDecoder.decode("image", png, -1, -1)
    assert(dec.width == w && dec.height == h,
      "decoded dims must come from the PNG header, not metadata")
    val want = (for { x <- 0 until w; y <- 0 until h } yield (id + x + y) % 256).sum
    assert(dec.pixelSum == want, s"pixel sum ${dec.pixelSum} != closed form $want")
  }

  test("undecodable image payload fails loudly instead of passing metadata through") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decode("image", "not a png".getBytes, 10, 10)
    }
    assert(e.getMessage.contains("not a decodable image"))
  }

  test("feature extraction: real decode for images and audio, md5 + frames for video") {
    val rows = Seq(
      MediaRow(0L, "image", Multimodal.pngPayload(0L, 128, 64), 128, 64),
      MediaRow(2L, "video", Array.fill[Byte](3000)(7), 10, 10),
      MediaRow(1L, "audio", Multimodal.WavCodec.encode(1L), 8, 8))
    val got = Multimodal.extractFeatures(rows.toDS())
      .collect().map(f => f.doc_id -> f).toMap

    val img = got(0L)
    assert((img.width, img.height) == (128, 64))
    assert((img.thumb_w, img.thumb_h) == (64, 32))
    assert(img.n_frames_sampled == 0)
    assert(img.payload_md5.isEmpty, "images carry the pixel digest, not an md5")
    val want = (for { x <- 0 until 128; y <- 0 until 64 } yield (0L + x + y) % 256).sum
    assert(img.pixel_sum.contains(want))

    val vid = got(2L)
    assert(vid.n_frames_sampled == 3) // 1 + 3000/1024 = 3
    assert(vid.pixel_sum.isEmpty)

    val aud = got(1L)
    // decoded physical properties, not metadata: sampleRate(1)=8000, mono
    assert((aud.width, aud.height) == (8000, 1))
    assert(aud.n_frames_sampled == Multimodal.WavCodec.nSamples(1L))
    assert(aud.payload_md5.isEmpty, "audio carries the sample digest, not an md5")
    val wantAud = (0 until Multimodal.WavCodec.nSamples(1L))
      .map(i => math.abs(((1L * 31 + i.toLong * 17) % 65536) - 32768)).sum
    assert(aud.pixel_sum.contains(wantAud),
      s"sample digest ${aud.pixel_sum} != closed form $wantAud")
  }

  test("WAV payload round-trips through the real javax.sound codec") {
    val wav = Multimodal.WavCodec.encode(7L)
    // RIFF/WAVE magic — a genuine audio file, not a fake blob
    assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F')
    assert(wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E')
    val dec = Multimodal.WavCodec.decode(wav)
    assert(dec.width == Multimodal.WavCodec.sampleRate(7L))
    assert(dec.height == 1)
    assert(dec.nFrames == Multimodal.WavCodec.nSamples(7L))
  }

  test("media table derives deterministic kinds and metadata from doc_id") {
    val docs = Seq((0L, "t0"), (1L, "t1"), (2L, "t2")).toDF("doc_id", "text")
    val rows = Multimodal.mediaTable(docs).as[MediaRow].collect()
      .map(r => r.doc_id -> r).toMap
    assert(rows(0L).kind == "image")
    assert(rows(1L).kind == "audio")
    assert(rows(2L).kind == "video")
    assert(rows(1L).meta_width == 33)  // 32 + 1 % 97
    assert(rows(2L).meta_height == 46) // 32 + 14 % 97

    // the real table swaps image payloads for PNGs sized by the metadata
    val real = Multimodal.mediaTableReal(docs).collect()
      .map(r => r.doc_id -> r).toMap
    val dec = Multimodal.ImageIoDecoder.decode("image", real(0L).payload, -1, -1)
    assert((dec.width, dec.height) == (real(0L).meta_width, real(0L).meta_height))
    // audio rows get genuine WAVs; video keeps its stand-in blob
    val audDec = Multimodal.WavCodec.decode(real(1L).payload)
    assert(audDec.nFrames == Multimodal.WavCodec.nSamples(1L))
    assert(java.util.Arrays.equals(real(2L).payload, "t2".getBytes("UTF-8")),
      "stub-kind payloads must pass through unchanged")
  }
}
