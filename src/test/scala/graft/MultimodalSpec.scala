package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaFeatures, MediaRow}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("thumbDims preserves aspect and bounds the long side") {
    assert(Multimodal.thumbDims(40, 30) == (40, 30))      // under bound: untouched
    assert(Multimodal.thumbDims(128, 64) == (64, 32))     // halved
    assert(Multimodal.thumbDims(640, 2) == (64, 1))       // floor >= 1
  }

  test("feature extraction: md5, byte counts, frame sampling per kind") {
    val rows = Seq(
      MediaRow(1L, "image", "abc".getBytes("UTF-8"), 100, 50),
      MediaRow(2L, "video", Array.fill[Byte](3000)(7), 10, 10),
      MediaRow(3L, "audio", Array.emptyByteArray, 8, 8))
    val got = Multimodal.extractFeatures(rows.toDS())
      .collect().map(f => f.doc_id -> f).toMap

    val img = got(1L)
    assert(img.n_bytes == 3)
    assert(img.payload_md5 == "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
    assert((img.thumb_w, img.thumb_h) == (64, 32))
    assert(img.n_frames_sampled == 0)

    val vid = got(2L)
    assert(vid.n_frames_sampled == 3) // 1 + 3000/1024 = 3
    assert(vid.n_bytes == 3000L)

    val aud = got(3L)
    assert(aud.n_bytes == 0L)
    assert(aud.payload_md5 == "d41d8cd98f00b204e9800998ecf8427e") // md5("")
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
  }
}
