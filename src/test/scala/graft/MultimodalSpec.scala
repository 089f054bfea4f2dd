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

  test("feature extraction: real decode for all three kinds") {
    val rows = Seq(
      MediaRow(0L, "image", Multimodal.pngPayload(0L, 128, 64), 128, 64),
      MediaRow(2L, "video", Multimodal.GifCodec.encode(2L), 10, 10),
      MediaRow(1L, "audio", Multimodal.WavCodec.encode(1L), 8, 8))
    val got = Multimodal.extractFeatures(rows.toDS())
      .collect().map(f => f.doc_id -> f).toMap

    val img = got(0L)
    assert((img.width, img.height) == (128, 64))
    assert((img.thumb_w, img.thumb_h) == (64, 32))
    assert(img.n_frames_sampled == 0)
    val want = (for { x <- 0 until 128; y <- 0 until 64 } yield (0L + x + y) % 256).sum
    assert(img.pixel_sum == want)

    val vid = got(2L)
    // decoded GIF properties, not metadata: frameW(2)=18, frameH(2)=26
    assert((vid.width, vid.height) == (18, 26),
      "video dims must come from the decoded GIF frames, not metadata")
    assert(vid.n_frames_sampled == Multimodal.GifCodec.nFrames(2L)) // 2 + 2%7 = 4
    val wantVid = (for {
      f <- 0 until Multimodal.GifCodec.nFrames(2L)
      x <- 0 until 18; y <- 0 until 26
    } yield (2L + 3L * f + x + y) % 256).sum
    assert(vid.pixel_sum == wantVid,
      s"all-frames pixel digest ${vid.pixel_sum} != closed form $wantVid")

    val aud = got(1L)
    // decoded physical properties, not metadata: sampleRate(1)=8000, mono
    assert((aud.width, aud.height) == (8000, 1))
    assert(aud.n_frames_sampled == Multimodal.WavCodec.nSamples(1L))
    val wantAud = (0 until Multimodal.WavCodec.nSamples(1L))
      .map(i => math.abs(((1L * 31 + i.toLong * 17) % 65536) - 32768)).sum
    assert(aud.pixel_sum == wantAud,
      s"sample digest ${aud.pixel_sum} != closed form $wantAud")
  }

  test("GIF grayscale round-trip is lossless across the parameter space") {
    // the closed-form media oracles REST on this: every (docId-derived
    // frame count, width, height) must survive GIF's 256-entry palette
    // bit-exactly. Random docIds sweep the 2..8 frame and 16..31 dim
    // ranges; seeded, failures reproduce.
    val rnd = new scala.util.Random(424242L)
    (1 to 6).foreach { _ =>
      val id = rnd.nextLong().abs % 100000L
      val dec = Multimodal.GifCodec.decode(Multimodal.GifCodec.encode(id))
      val (n, w, h) = (Multimodal.GifCodec.nFrames(id),
        Multimodal.GifCodec.frameW(id), Multimodal.GifCodec.frameH(id))
      assert((dec.nFrames, dec.width, dec.height) == (n, w, h), s"docId $id")
      val want = (for { f <- 0 until n; x <- 0 until w; y <- 0 until h }
        yield (id + 3L * f + x + y) % 256).sum
      assert(dec.pixelSum == want,
        s"docId $id: decoded sum ${dec.pixelSum} != closed form $want — " +
          "the GIF palette round-trip is NOT lossless for these params")
    }
  }

  test("GIF payload round-trips through the real multi-frame codec") {
    val gif = Multimodal.GifCodec.encode(9L)
    // GIF magic — a genuine animated image file, not a fake blob
    assert(gif(0) == 'G' && gif(1) == 'I' && gif(2) == 'F')
    val dec = Multimodal.GifCodec.decode(gif)
    assert(dec.width == Multimodal.GifCodec.frameW(9L))
    assert(dec.height == Multimodal.GifCodec.frameH(9L))
    assert(dec.nFrames == Multimodal.GifCodec.nFrames(9L))
    val e = intercept[Exception] {
      Multimodal.GifCodec.decode("not a gif".getBytes)
    }
    assert(e != null)
  }

  test("sampleFrames picks i*n/k evenly spaced frames and digests THEIR pixels") {
    // doc_id 8: nFrames = 2 + 8%7 = 3, k = min(4,3) = 3 -> idx 0,1,2
    // doc_id 5: nFrames = 2 + 5%7 = 7, k = 4 -> idx 0,1,3,5
    val rows = Seq(
      MediaRow(8L, "video", Multimodal.GifCodec.encode(8L), 1, 1),
      MediaRow(5L, "video", Multimodal.GifCodec.encode(5L), 1, 1),
      MediaRow(0L, "image", Multimodal.pngPayload(0L, 8, 8), 8, 8))
    val got = Multimodal.sampleFrames(rows.toDS()).collect()
      .groupBy(_.doc_id).map { case (id, fs) =>
        id -> fs.map(f => f.frame_idx -> f.frame_px_sum).toMap
      }
    assert(!got.contains(0L), "non-video rows must not emit frames")
    assert(got(8L).keySet == Set(0, 1, 2))
    assert(got(5L).keySet == Set(0, 1, 3, 5))
    val (w, h) = (Multimodal.GifCodec.frameW(5L), Multimodal.GifCodec.frameH(5L))
    val want3 = (for { x <- 0 until w; y <- 0 until h }
      yield (5L + 3L * 3 + x + y) % 256).sum
    assert(got(5L)(3) == want3,
      "sampled digest must be the SAMPLED frame's pixels, not frame 0's")
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
    // audio rows get genuine WAVs, video rows genuine animated GIFs
    val audDec = Multimodal.WavCodec.decode(real(1L).payload)
    assert(audDec.nFrames == Multimodal.WavCodec.nSamples(1L))
    val vidDec = Multimodal.GifCodec.decode(real(2L).payload)
    assert(vidDec.nFrames == Multimodal.GifCodec.nFrames(2L))
  }

  test("image near-dup: identical pixels hash identically, banded pairing finds them") {
    // three images: 7 and 1007 carry IDENTICAL pixel content (same fill
    // constant mod 256: 1007 - 7 + 40x40 dims... use same fill id), 13 far
    def png(fillId: Long, w: Int, h: Int) = Multimodal.pngPayload(fillId, w, h)
    val rows = Seq(
      MediaRow(7L, "image", png(7L, 40, 40), 40, 40),
      MediaRow(1007L, "image", png(7L, 40, 40), 40, 40), // exact duplicate payload
      MediaRow(13L, "image", png(200L, 40, 40), 40, 40), // different fill
      MediaRow(2L, "audio", Multimodal.WavCodec.encode(2L), 0, 0)) // ignored
    val hashes = Multimodal.imageHashes(rows.toDS()).toDF()
    val byId = hashes.as[(Long, Int, Int, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(byId.keySet == Set(7L, 1007L, 13L), "audio row must be skipped")
    assert(byId(7L) == byId(1007L), "identical pixels must hash identically")
    val pairs = graft.operators.Dedup
      .hammingPairs(hashes, "ahash", maxHamming = 3, bands = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((7L, 1007L, 0)),
      s"banded pairing missed the duplicate: $pairs")
    assert(!pairs.exists(p => p._1 == 13L || p._2 == 13L),
      s"unrelated image paired: $pairs")
  }

  test("audio fingerprint: envelope-shaped, gain-invariant, pairs duplicates") {
    def wav(samples: Array[Int], rate: Int = 8000): Array[Byte] = {
      val raw = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        raw(2 * i) = (s & 0xff).toByte
        raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // a clip with a distinctive envelope (loud middle), its exact copy,
    // a HALF-GAIN copy (same envelope shape), and an unrelated clip
    val base = Array.tabulate(640)(i => if (i >= 256 && i < 384) 20000 else 100)
    val half = base.map(_ / 2)
    val other = Array.tabulate(640)(i => if (i < 128) 18000 else 50)
    val rows = Seq(
      MediaRow(1L, "audio", wav(base), 0, 0),
      MediaRow(101L, "audio", wav(base), 0, 0),  // exact duplicate
      MediaRow(201L, "audio", wav(half), 0, 0),  // gain-scaled duplicate
      MediaRow(301L, "audio", wav(other), 0, 0), // different envelope
      MediaRow(0L, "image", Multimodal.pngPayload(0L, 32, 32), 32, 32))
    val hashes = Multimodal.audioHashes(rows.toDS()).toDF()
    val byId = hashes.as[(Long, Int, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(byId.keySet == Set(1L, 101L, 201L, 301L), "image row must be skipped")
    assert(byId(1L) == byId(101L), "identical clips must hash identically")
    // uniform gain scales every window energy AND the mean equally, so
    // the envelope bits — the hash — are invariant
    assert(byId(1L) == byId(201L), "half-gain copy must keep the envelope hash")
    assert(byId(1L) != byId(301L), "different envelopes must differ")
    val pairs = graft.operators.Dedup
      .hammingPairs(hashes, "ehash", maxHamming = 3, bands = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((1L, 101L, 0)) && pairs.contains((1L, 201L, 0)),
      s"banded pairing missed a duplicate: $pairs")
  }

  test("video frame hashes: per-frame granularity, shared-frame pairing") {
    val rows = Seq(
      MediaRow(2L, "video", Multimodal.GifCodec.encode(2L), 0, 0),
      MediaRow(102L, "video", Multimodal.GifCodec.encode(2L), 0, 0), // re-upload
      MediaRow(5L, "video", Multimodal.GifCodec.encode(5L), 0, 0),   // unrelated
      MediaRow(1L, "audio", Multimodal.WavCodec.encode(1L), 0, 0))   // ignored
    val fh = Multimodal.videoFrameHashes(rows.toDS()).toDF()
      .as[(Long, Int, Long)].collect()
    val byDoc = fh.groupBy(_._1).map { case (d, fs) =>
      d -> fs.sortBy(_._2).map(_._3).toSeq }
    assert(byDoc.keySet == Set(2L, 102L, 5L), "audio row must be skipped")
    // one row per frame, frame count from the codec
    assert(byDoc(2L).size == Multimodal.GifCodec.nFrames(2L))
    // the re-uploaded clip shares EVERY frame fingerprint
    assert(byDoc(2L) == byDoc(102L), "identical clips must match frame-wise")
    // shared-frame candidate join: clips pairing on >= 1 equal frame hash
    val cand = fh.toSeq.flatMap { case (d, _, h) => Seq(h -> d) }
      .groupBy(_._1).values.map(_.map(_._2).distinct.sorted)
      .filter(_.size > 1).toSet
    assert(cand.exists(g => g.contains(2L) && g.contains(102L)),
      "shared-frame join missed the re-upload")
    assert(!cand.exists(g => g.contains(5L)),
      s"unrelated clip paired: $cand")
  }
}
