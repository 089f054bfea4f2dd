package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Tables

/** Multimodal pipeline query: documents -> media table (binary payload +
  * typed metadata) -> per-partition decode/feature-extract. The stub
  * decoder is deterministic, so the whole path is oracle-checkable in SQL
  * (md5 + integer arithmetic).
  */
object MediaSuite {

  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Multimodal.mediaTable(Tables.documents(spark, dir))
      .as[Multimodal.MediaRow]
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
    "media_features" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
        |         text,
        |         (32 + doc_id % 97)::INT AS w,
        |         (32 + (doc_id * 7) % 97)::INT AS h
        |  FROM documents)
        |SELECT doc_id, kind,
        |       strlen(text)::BIGINT AS n_bytes,
        |       md5(text) AS payload_md5,
        |       (CASE WHEN greatest(w, h) <= 64 THEN w
        |             ELSE greatest(1, (w * 64) // greatest(w, h)) END)::INT AS thumb_w,
        |       (CASE WHEN greatest(w, h) <= 64 THEN h
        |             ELSE greatest(1, (h * 64) // greatest(w, h)) END)::INT AS thumb_h,
        |       (CASE WHEN kind = 'video'
        |             THEN least(8, 1 + strlen(text) // 1024)
        |             ELSE 0 END)::INT AS n_frames_sampled
        |FROM m""".stripMargin,
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
