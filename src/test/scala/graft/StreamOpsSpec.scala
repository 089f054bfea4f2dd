package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.PageEvent
import graft.streaming.StreamOps

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(name: String, user: String, sec: Long, dur: Long = 500) =
    PageEvent(name, user, new Timestamp(sec * 1000), dur)

  test("stream-stream join pairs events of the same user within the window") {
    val pages = MemoryStream[PageEvent](spark)
    val clicks = MemoryStream[PageEvent](spark)
    val joined = StreamOps.joinWithin(pages.toDF(), clicks.toDF(), windowSec = 10)
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .option("checkpointLocation", tmpDir("ssj"))
      .outputMode("append").start()

    pages.addData(ev("P1", "U1", 100), ev("P2", "U2", 200))
    clicks.addData(
      ev("C1", "U1", 105),  // within 10s of U1's page view -> joins
      ev("C2", "U1", 120),  // 20s later -> outside window
      ev("C3", "U2", 199))  // before the page view -> no join
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ss_join")
      .select($"l_name", $"r_name").as[(String, String)].collect().toSet
    assert(got == Set(("P1", "C1")))
  }

  test("flatMapGroupsWithState keeps running per-user state across batches") {
    val input = MemoryStream[PageEvent](spark)
    // NoTimeout in the test: with ProcessingTimeTimeout the engine keeps
    // scheduling timeout-check batches, so processAllAvailable never settles
    val q = StreamOps.sessionStats(input.toDS(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout).toDF()
      .writeStream.format("memory").queryName("fmgws")
      .option("checkpointLocation", tmpDir("fmgws"))
      .outputMode("append").start()

    input.addData(ev("P1", "U1", 100, 10), ev("P2", "U1", 101, 20))
    q.processAllAvailable()
    input.addData(ev("P3", "U1", 102, 5), ev("P1", "U2", 103, 7))
    q.processAllAvailable()
    q.stop()

    val updates = spark.table("fmgws")
      .select($"user", $"nEvents", $"totalDuration", $"closed")
      .as[(String, Long, Long, Boolean)].collect()
    // U1: first batch 2 events / 30ms, second batch accumulates to 3 / 35ms
    assert(updates.contains(("U1", 2L, 30L, false)))
    assert(updates.contains(("U1", 3L, 35L, false)))
    assert(updates.contains(("U2", 1L, 7L, false)))
  }
}
