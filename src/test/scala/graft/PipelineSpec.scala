package graft

import org.apache.spark.sql.functions._

import graft.model.PageEventCodec
import graft.streaming.PageEventPipeline

/** End-to-end topology smoke over emulated file topics: publish -> T1;
  * supplier-shaped rows -> T2 -> job -> T4 + analytics snapshot; restart
  * recovery of the snapshot from the T4 changelog.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("publish appends one wire-format event to T1, echoed back") {
    val p = new PageEventPipeline(spark, tmpDir("topics"))
    val ev = p.publish("PX")
    assert(ev.name == "PX")
    assert(Set("U1", "U2").contains(ev.user))
    assert(ev.duration >= 10 && ev.duration <= 1009)
    val rows = PageEventCodec.fromWire(p.t1.batch(spark)).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("name") == "PX")
  }

  test("T2 -> job -> T4 + analytics, and snapshot restore from changelog") {
    val p = new PageEventPipeline(spark, tmpDir("topics"))
    val ckpt = tmpDir("ckpt")

    // seed T2 with wire-format events across two 5 s windows
    val events = Seq(
      ("P1", "U1", 10001L, 101L), ("P1", "U2", 12000L, 300L),
      ("P2", "U1", 14000L, 5000L), ("P1", "U1", 15500L, 999L),
      ("P2", "U2", 16000L, 50L) // filtered out (<=100)
    ).map { case (n, u, d, dur) => (n, u, d, dur) }
      .toDF("name", "user", "date", "duration")
    p.t2.append(events)

    val job = p.startJob(ckpt)
    job.processAllAvailable()
    job.stop()

    // T4 carries the refinements; final value per (name, window) = max
    val t4Final = p.t4.batch(spark)
      .groupBy($"name", $"window_start").agg(max($"cnt").as("cnt"))
      .as[(String, Long, Long)].collect().toSet
    assert(t4Final == Set(("P1", 10L, 2L), ("P2", 10L, 1L), ("P1", 15L, 1L)))

    // analytics snapshot at now=15: both windows in range, last wins for P1
    assert(p.analytics.snapshot(15L) == Map("P1" -> 1L, "P2" -> 1L))
    // at now=14: only window 10
    assert(p.analytics.snapshot(14L) == Map("P1" -> 2L, "P2" -> 1L))

    // restart path: a fresh pipeline instance rebuilds the store from T4
    p.analytics.clear()
    assert(p.analytics.snapshot(15L).isEmpty)
    p.restoreAnalytics()
    assert(p.analytics.snapshot(15L) == Map("P1" -> 1L, "P2" -> 1L))
  }

  test("job restarts from checkpoint without recounting processed data") {
    val p = new PageEventPipeline(spark, tmpDir("topics"))
    val ckpt = tmpDir("ckpt")
    def wire(rows: (String, String, Long, Long)*) =
      p.t2.append(rows.toSeq.toDF("name", "user", "date", "duration"))

    wire(("P1", "U1", 10001L, 101L), ("P1", "U2", 12000L, 300L))
    val job1 = p.startJob(ckpt)
    job1.processAllAvailable()
    job1.stop()

    // new data lands while the job is down; restart from the SAME checkpoint
    wire(("P1", "U1", 13000L, 400L), ("P2", "U1", 16000L, 200L))
    val job2 = p.startJob(ckpt)
    job2.processAllAvailable()
    job2.stop()

    // final per-window counts must equal the batch answer over everything —
    // restart must neither drop the new rows nor double-count the old ones
    val t4Final = p.t4.batch(spark)
      .groupBy($"name", $"window_start").agg(max($"cnt").as("cnt"))
      .as[(String, Long, Long)].collect().toSet
    assert(t4Final == Set(("P1", 10L, 3L), ("P2", 15L, 1L)))
  }

  test("SSE /analytics serves live JSON frames; /publish ingests over HTTP") {
    val p = new PageEventPipeline(spark, tmpDir("topics"))
    val ckpt = tmpDir("ckpt")
    p.t2.append(Seq(
      ("P1", "U1", 10001L, 101L), ("P1", "U2", 12000L, 300L),
      ("P2", "U1", 14000L, 5000L)
    ).toDF("name", "user", "date", "duration"))
    val job = p.startJob(ckpt)
    job.processAllAvailable()
    job.stop()

    // serve the snapshot as-of event time 14 s at a fast test cadence
    val server = new graft.streaming.AnalyticsServer(
      p.analytics, (n, _) => p.publish(n), nowSec = () => 14L,
      intervalMs = 100L)
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.boundPort}"

      // >= 2 SSE frames of {page -> count} JSON (reference Flux.interval SSE)
      val conn = new java.net.URI(s"$base/analytics").toURL.openConnection()
      assert(conn.getContentType.startsWith("text/event-stream"))
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(conn.getInputStream, "UTF-8"))
      val frames = Iterator.continually(in.readLine())
        .takeWhile(_ != null).filter(_.startsWith("data: ")).take(2).toList
      in.close()
      assert(frames.length == 2, s"expected 2 SSE frames, got $frames")
      frames.foreach { f =>
        assert(f == """data: {"P1":2,"P2":1}""", s"bad frame: $f")
      }

      // /publish mirrors the reference's one-row REST ingest
      val pub = scala.io.Source.fromURL(s"$base/publish?name=PZ&topic=T1")
      val body = try pub.mkString finally pub.close()
      assert(body.contains(""""name":"PZ""""), s"bad publish echo: $body")
      val t1Rows = PageEventCodec.fromWire(p.t1.batch(spark))
        .filter($"name" === "PZ").count()
      assert(t1Rows == 1L, "published event must land on T1")

      // the chart page is served and subscribes to the SSE endpoint
      val page = scala.io.Source.fromURL(s"$base/")
      val html = try page.mkString finally page.close()
      assert(html.contains("EventSource(\"/analytics\")"))
    } finally server.stop()
  }

  test("sinkBatch is idempotent when foreachBatch replays a micro-batch") {
    val p = new PageEventPipeline(spark, tmpDir("topics"))
    val df = Seq(("P1", "U1", 1000L, 200L)).toDF("name", "user", "date", "duration")
    p.t2.sinkBatch(df, 7L)
    val n1 = p.t2.batch(spark).count()
    p.t2.sinkBatch(df, 7L) // recovery re-delivers the same batchId
    assert(p.t2.batch(spark).count() == n1,
      "replayed batch must not append duplicate rows")
    p.t2.sinkBatch(df, 8L) // a NEW batch still lands
    assert(p.t2.batch(spark).count() == n1 * 2)
  }

  test("supplier generates schema-valid events at the configured rate") {
    val p = new PageEventPipeline(spark, tmpDir("topics"))
    val ckpt = tmpDir("ckpt")
    val sup = p.startSupplier(ckpt, rowsPerSecond = 50)
    try {
      Thread.sleep(2500)
      sup.processAllAvailable()
    } finally sup.stop()
    val got = PageEventCodec.fromWire(p.t2.batch(spark))
    val n = got.count()
    assert(n > 0, "supplier produced no events")
    val bad = got.filter(!col("name").isin("P1", "P2") ||
      !col("user").isin("U1", "U2") ||
      col("duration") < 10 || col("duration") > 10009).count()
    assert(bad == 0)
  }
}
