package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.PageEvent
import graft.operators.PageViews
import graft.streaming.PageEventPipeline

/** Streaming-vs-batch parity (SURVEY.md §5.2c): the streaming pipeline
  * replayed over the same rows must converge to the batch answer — the honest
  * encoding of "correctness = final per-window counts" (§2.3.3), since the
  * reference's emission cadence is non-deterministic.
  */
class StreamingParitySpec extends SparkSpec {
  import spark.implicits._

  private def ev(name: String, user: String, epochMs: Long, duration: Long) =
    PageEvent(name, user, new Timestamp(epochMs), duration)

  private val rows = (0 until 200).map { i =>
    ev(if (i % 3 == 0) "P1" else "P2", s"U${i % 2 + 1}",
      1000L * i + 17, // spread over ~40 windows
      if (i % 10 == 0) 100 else 50 + i * 7)
  }

  test("streaming update-mode counts converge to the batch answer") {
    val pipeline = new PageEventPipeline(spark, tmpDir("topics"))
    val input = MemoryStream[PageEvent](spark)

    val query = pipeline.countsStream(input.toDF())
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", tmpDir("ckpt"))
      .format("memory")
      .queryName("parity_out")
      .start()

    // replay in three chunks, each triggering refinements of open windows
    rows.grouped(70).foreach { chunk =>
      input.addData(chunk)
      query.processAllAvailable()
    }
    query.stop()

    // final value per (name, window) = last refinement = max (counts grow)
    val streamed = spark.table("parity_out")
      .groupBy($"name", $"window_start").agg(max($"cnt").as("cnt"))
      .as[(String, Long, Long)].collect().toSet

    val batch = PageViews.pageCounts(rows.toDS().toDF(), "name", "date", "duration")
      .as[(String, Long, Long)].collect().toSet

    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("full-outer topic replay equals the batch FULL JOIN (sf0.001)") {
    // in-JVM parity companion to the stream_topic_attrib_outer oracle row:
    // the streamed matched / view-only / click-only per-user counts must
    // equal the batch full join computed with the DataFrame API (the
    // replay's own construction separately requires null rows on both
    // sides and more of them AFTER the mid-stream restart — recovered
    // eviction state)
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.StreamReplay
      .streamedTopicAttribOuter(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet

    val e = graft.model.Tables.events(spark, dir)
    val v = e.filter($"event_type" === "view")
      .select($"user_id".as("v_user"), $"ts".as("v_ts"))
    val c = e.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"))
    val batch = v.join(c,
        $"v_user" === $"c_user" && $"c_ts" >= $"v_ts" &&
          $"c_ts" <= $"v_ts" + expr("INTERVAL 1 DAY"),
        "full_outer")
      .groupBy(coalesce($"v_user", $"c_user").as("user_id"))
      .agg(count(when($"v_ts".isNotNull && $"c_ts".isNotNull, lit(1)))
          .as("n_matched"),
        count(when($"c_ts".isNull, lit(1))).as("n_view_only"),
        count(when($"v_ts".isNull, lit(1))).as("n_click_only"))
      .as[(Long, Long, Long, Long)].collect().toSet

    assert(streamed == batch)
    assert(batch.exists(_._3 > 0), "fixture must contain unmatched views")
    assert(batch.exists(_._4 > 0), "fixture must contain unmatched clicks")
  }

  test("backfill-union replay equals the plain batch hourly counts (sf0.001)") {
    // in-JVM parity companion to the stream_backfill_union oracle row: the
    // batch-over-history + stream-over-tail merge must equal one batch
    // query over the whole fixture (the replay's own construction
    // separately requires the fence-straddling window to receive rows
    // from BOTH execution modes)
    val dir = "/root/testdata/sf0.001"
    val merged = graft.streaming.StreamReplay
      .streamedBackfillUnion(spark, dir)
      .as[(String, Long, Long)].collect().toSet

    val batch = graft.operators.PageViews.pageCounts(
        graft.model.Tables.events(spark, dir)
          .select($"event_type".as("name"), $"ts".as("date"),
            $"value".as("duration")),
        "name", "date", "duration", windowLen = "1 hour")
      .select($"name", $"window_start", $"cnt")
      .as[(String, Long, Long)].collect().toSet

    assert(merged == batch)
    assert(batch.nonEmpty)
  }
}
