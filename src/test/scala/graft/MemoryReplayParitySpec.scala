package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.operators.EventSuite
import graft.streaming.StreamReplay

/** Round-11 consolidation home for the four retired MemoryStream replay
  * rows (stream_session_counts / stream_session_append / stream_dedup /
  * stream_click_attrib): their production-source stream_topic_* twins are
  * the driver-checked surface now, and these batch-parity anchors keep
  * the MemoryStream harness paths exercised. The chain stays closed
  * transitively — each batch twin used here is itself driver-checked
  * against DuckDB (session_counts, stream_topic_dedup's oracle, and
  * stream_topic_attrib's oracle share the same shapes).
  */
class MemoryReplayParitySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def assertSameRows(name: String, got: DataFrame,
                             want: DataFrame): Unit = {
    val g = got.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val w = want.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(g == w,
      s"$name: streamed result diverges from batch twin " +
        s"(${g.size} vs ${w.size} rows; first diff: " +
        s"${g.zip(w).find { case (a, b) => a != b }})")
  }

  test("complete-mode session counts replay equals the batch gap-islands answer") {
    assertSameRows("stream_session_counts",
      StreamReplay.streamedSessionCounts(spark, dir),
      EventSuite.sessionCounts(spark, dir))
  }

  test("append-mode session replay (watermark-evicted) equals the batch answer") {
    assertSameRows("stream_session_append",
      StreamReplay.streamedSessionAppend(spark, dir),
      EventSuite.sessionCounts(spark, dir))
  }

  test("streaming dedup survivors are exactly the original fixture") {
    assertSameRows("stream_dedup",
      StreamReplay.streamedDedup(spark, dir),
      Tables.events(spark, dir)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_events")))
  }

  test("stream-stream click attribution equals the batch interval join") {
    val e = Tables.events(spark, dir)
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val batch = v.join(c,
        col("user_id") === col("cu") && col("cts") >= col("vts") &&
          col("cts") <= col("vts") + expr("INTERVAL 1 DAY"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_pairs"))
    assertSameRows("stream_click_attrib",
      StreamReplay.streamedClickAttribution(spark, dir), batch)
  }
}
