package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.operators.PageViews

/** Streaming-vs-batch parity over the REAL driver fixture (SURVEY.md §5.2c):
  * the sf0.001 events table replayed in order through the streaming count
  * pipeline must converge to the batch `page_counts` answer — the strongest
  * encoding of "correctness = final per-window counts" (§2.3.3).
  */
final case class FixtureEvent(name: String, date: Timestamp, duration: Double)

class FixtureParitySpec extends SparkSpec {
  import spark.implicits._

  test("streaming replay of the events fixture converges to batch page_counts") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir).select(
      col("event_type").as("name"), col("ts").as("date"),
      col("value").as("duration"))

    val batch = PageViews.pageCounts(ev, "name", "date", "duration")
      .as[(String, Long, Long)].collect().toSet
    assert(batch.nonEmpty)

    // replay in event-time order (reference semantics guarantee parity for
    // in-order data; the 10 s watermark would drop disordered stragglers)
    val rows = ev.orderBy(col("date")).as[FixtureEvent].collect()
    val input = MemoryStream[FixtureEvent](spark)
    val counts = PageViews.unwrapWindow(
      PageViews.windowedCounts(
        PageViews.rekey(PageViews.filterValid(input.toDF(), "duration"), "name", "date")
          .withWatermark("date", "10 seconds"),
        "date", "name"),
      "name")
    val q = counts.writeStream.outputMode("update")
      .format("memory").queryName("fixture_parity")
      .option("checkpointLocation", tmpDir("fp"))
      .start()
    rows.grouped(2000).foreach { chunk =>
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table("fixture_parity")
      .groupBy($"name", $"window_start").agg(max($"cnt").as("cnt"))
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"streaming diverged: ${streamed.diff(batch).take(5)} vs ${batch.diff(streamed).take(5)}")
  }

  test("streaming session windows over the fixture converge to batch session_counts") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.operators.EventSuite.sessionCounts(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)

    // event-time-ordered replay; the watermark only bounds lateness, and
    // in-order data is never late, so every session merges exactly as in
    // batch and final (update-mode, last-refinement-wins) state = batch
    val rows = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"))
      .orderBy(col("ts"))
      .as[(Long, Timestamp)].collect()
    val input = MemoryStream[(Long, Timestamp)](spark)
    val counts = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 seconds")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("session_start"),
        col("n_events"))
    // session windows stream in APPEND mode only (a merged session can't
    // be retracted): sessions emit once the watermark passes their close
    val q = counts.writeStream.outputMode("append")
      .format("memory").queryName("sess_parity")
      .option("checkpointLocation", tmpDir("sp"))
      .start()
    rows.grouped(400).foreach { chunk =>
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    // sentinel far past the last session advances the watermark so every
    // real session closes and appends (same pattern as StreamOpsSpec)
    val flushTs = new Timestamp(rows.last._2.getTime + 7L * 86400 * 1000)
    input.addData((-1L, flushTs))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sess_parity")
      .filter($"user_id" >= 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"session parity diverged: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }

  test("dedupStream over the events fixture converges to batch dropDuplicates") {
    val dir = "/root/testdata/sf0.001"
    // distinct base set: any duplicates the STREAM must remove are the ones
    // we inject below, all within the watermark window of their originals —
    // the contract dropDuplicatesWithinWatermark actually makes (exactly-
    // once within the window; replays beyond it are the batch dedup's job)
    val base = graft.model.Tables.events(spark, dir)
      .select(col("event_type").as("name"),
        col("user_id").cast("string").as("user"), col("ts").as("date"))
      .dropDuplicates("name", "user", "date")
      .orderBy(col("date"))
      .as[(String, String, Timestamp)].collect()
    assert(base.nonEmpty)
    // producer-retry shape: every 7th event arrives twice, back to back
    val replay = base.zipWithIndex.flatMap { case (r, i) =>
      if (i % 7 == 0) Seq(r, r) else Seq(r)
    }
    val batchAnswer = base.toSet

    val input = MemoryStream[(String, String, Timestamp)](spark)
    val q = graft.streaming.StreamOps.dedupStream(
        input.toDF().toDF("name", "user", "date"), watermark = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("fixture_dedup")
      .option("checkpointLocation", tmpDir("fd"))
      .start()
    replay.grouped(400).foreach { chunk =>
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table("fixture_dedup")
      .as[(String, String, Timestamp)].collect()
    assert(streamed.length == streamed.toSet.size, "duplicates survived dedupStream")
    assert(streamed.toSet == batchAnswer,
      s"stream-final != batch dropDuplicates: " +
        s"${streamed.toSet.diff(batchAnswer).take(3)} vs ${batchAnswer.diff(streamed.toSet).take(3)}")
  }
}
