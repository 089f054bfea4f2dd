package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Tables

/** Multimodal pipeline queries: documents -> media table (binary payload +
  * typed metadata) -> per-partition decode/feature-extract.
  *
  * The image path is REAL: payloads are genuine PNGs generated on the
  * executors and decoded back with javax.imageio — the oracle checks the
  * decoded dimensions against the metadata that sized the encode, and the
  * decoded pixel sum against the closed form of the deterministic gradient
  * fill, so a broken encoder OR decoder fails the hash. Audio/video stay
  * on the deterministic stub (no codecs in this container); their rows are
  * oracle-checked through md5 + integer arithmetic as before.
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
        |  GROUP BY doc_id)
        |SELECT m.doc_id, m.kind, m.w AS width, m.h AS height,
        |       (CASE WHEN greatest(w, h) <= 64 THEN w
        |             ELSE greatest(1, (w * 64) // greatest(w, h)) END)::INT AS thumb_w,
        |       (CASE WHEN greatest(w, h) <= 64 THEN h
        |             ELSE greatest(1, (h * 64) // greatest(w, h)) END)::INT AS thumb_h,
        |       (CASE WHEN kind = 'video'
        |             THEN least(8, 1 + strlen(text) // 1024)
        |             ELSE 0 END)::INT AS n_frames_sampled,
        |       CASE WHEN m.kind = 'image' THEN NULL ELSE md5(text) END
        |         AS payload_md5,
        |       px.pixel_sum
        |FROM m LEFT JOIN px USING (doc_id)""".stripMargin,
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
