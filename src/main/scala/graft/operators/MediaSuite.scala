package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Tables

/** Multimodal pipeline queries: documents -> media table (binary payload +
  * typed metadata) -> per-partition decode/feature-extract.
  *
  * The image AND audio paths are REAL: payloads are genuine PNGs
  * (javax.imageio) and genuine 16-bit PCM WAVs (javax.sound.sampled),
  * generated on the executors and decoded back through the same JDK
  * codecs — the oracle checks decoded dimensions / sample-rate / frame
  * counts against the parameters that sized the encode, and the decoded
  * pixel and abs-sample digests against the closed forms of the
  * deterministic fills, so a broken encoder OR decoder fails the hash.
  * Video stays on the clearly-marked stub (no video codec in this
  * container); its rows are oracle-checked through md5 + integer
  * arithmetic as before.
  */
object MediaSuite {

  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaTableReal(Tables.documents(spark, dir))
    Multimodal.extractFeatures(media).toDF()
  }

  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Multimodal.mediaTable(Tables.documents(spark, dir))
      .as[Multimodal.MediaRow]
    Multimodal.sampleFrames(media).toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_features" -> (mediaFeatures _),
    "frame_sample"   -> (frameSample _))

  val oracles: Map[String, String] = Map(
    // px recomputes the decoded pixel sum in closed form: the image fill
    // is (doc_id + x + y) mod 256 at every pixel of the (w, h) gradient,
    // so sum over the pixel grid reproduces what ImageIoDecoder reads
    // back from the actual PNG bytes
    "media_features" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
        |         text,
        |         (32 + doc_id % 97)::INT AS w,
        |         (32 + (doc_id * 7) % 97)::INT AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id,
        |         CAST(sum((m.doc_id + x.i + y.j) % 256) AS BIGINT) AS pixel_sum
        |  FROM m,
        |       LATERAL (SELECT unnest(range(m.w)) AS i) x,
        |       LATERAL (SELECT unnest(range(m.h)) AS j) y
        |  WHERE m.kind = 'image'
        |  GROUP BY doc_id),
        |au AS (
        |  SELECT doc_id,
        |         (8000 + ((doc_id // 3) % 3) * 4000)::INT AS sr,
        |         (400 + doc_id % 256)::INT AS n
        |  FROM m WHERE kind = 'audio'),
        |asum AS (
        |  SELECT au.doc_id,
        |         CAST(sum(abs(((au.doc_id * 31 + s.i * 17) % 65536) - 32768))
        |           AS BIGINT) AS audio_sum
        |  FROM au, LATERAL (SELECT unnest(range(au.n)) AS i) s
        |  GROUP BY au.doc_id),
        |f AS (
        |  SELECT m.doc_id, m.kind, m.text,
        |         CASE WHEN m.kind = 'audio' THEN au.sr ELSE m.w END AS width,
        |         CASE WHEN m.kind = 'audio' THEN 1 ELSE m.h END AS height,
        |         CASE WHEN m.kind = 'video'
        |              THEN least(8, 1 + strlen(m.text) // 1024)
        |              WHEN m.kind = 'audio' THEN au.n
        |              ELSE 0 END AS n_frames_sampled
        |  FROM m LEFT JOIN au USING (doc_id))
        |SELECT f.doc_id, f.kind, f.width::INT AS width, f.height::INT AS height,
        |       (CASE WHEN greatest(width, height) <= 64 THEN width
        |             ELSE greatest(1, (width * 64) // greatest(width, height))
        |        END)::INT AS thumb_w,
        |       (CASE WHEN greatest(width, height) <= 64 THEN height
        |             ELSE greatest(1, (height * 64) // greatest(width, height))
        |        END)::INT AS thumb_h,
        |       f.n_frames_sampled::INT AS n_frames_sampled,
        |       CASE WHEN f.kind = 'video' THEN md5(f.text) END AS payload_md5,
        |       CASE WHEN f.kind = 'image' THEN px.pixel_sum
        |            WHEN f.kind = 'audio' THEN asum.audio_sum END AS pixel_sum
        |FROM f LEFT JOIN px USING (doc_id) LEFT JOIN asum USING (doc_id)""".stripMargin,
    // same deterministic media derivation; evenly-spaced byte offsets via
    // integer division, one row per sampled frame of each video payload
    "frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
        |         strlen(text)::BIGINT AS n_bytes
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, n_bytes,
        |         least(8, 1 + n_bytes // 1024)::INT AS n_frames
        |  FROM m WHERE kind = 'video')
        |SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |       CAST(i * (n_bytes // n_frames) AS BIGINT) AS frame_offset
        |FROM (SELECT doc_id, n_bytes, n_frames, unnest(range(n_frames)) AS i
        |      FROM v)""".stripMargin)
}
