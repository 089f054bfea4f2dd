package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.{PageEvent, PageEventCodec}
import graft.operators.PageViews
import graft.sources.{FileTopic, Generator, Topic, Topics}

/** The full reference topology over emulated topics (SURVEY.md §3):
  *
  *   /publish -> T1 -> console consumer                  (entry point A)
  *   supplier -> T2 -> filter/window/count job -> T4     (entry point B)
  *   T4 changelog -> Analytics snapshot -> /analytics    (entry point C)
  *
  * Each stage is an independent StreamingQuery, like each Kafka Streams
  * binder function is an independent runtime; `trigger` defaults mirror the
  * reference's cadences (200 ms supplier poll, 1 s commit interval —
  * application.properties:22,29).
  */
final class PageEventPipeline(spark: SparkSession, root: String,
                              watermark: String = "10 seconds") {
  import graft.model.PageEvent.wireSchema

  val t1: Topic = new FileTopic(Topics.T1, wireSchema, root)
  val t2: Topic = new FileTopic(Topics.T2, wireSchema, root)
  // T4 wire: (name String, window_start Long, cnt Long) — the reference emits
  // (String, Long) after the window-unwrap map (PageEventHandler.java:57);
  // we retain window_start so the Analytics snapshot can be rebuilt from the
  // topic after a restart (SURVEY.md §7.4.2).
  val t4: Topic = new FileTopic(Topics.T4,
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("window_start", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cnt", org.apache.spark.sql.types.LongType))),
    root)

  val analytics = new Analytics(keyCol = "name")

  /** Entry point A ingest: one event to a named topic. */
  def publish(name: String, topic: Topic = t1): PageEvent =
    Generator.publish(spark, topic, name)

  /** Entry point A consumer: console printer with the reference's
    * `************` framing (PageEventHandler.java:27-33).
    */
  def startConsole(checkpoint: String): StreamingQuery =
    PageEventCodec.fromWire(t1.stream(spark))
      .writeStream
      .option("checkpointLocation", s"$checkpoint/console")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          println("************************")
          println(r.mkString(", "))
          println("************************")
        }
      }
      .start()

  /** Entry point B source: the timed supplier feeding T2. */
  def startSupplier(checkpoint: String, rowsPerSecond: Int = 5): StreamingQuery =
    Generator.supplier(spark, rowsPerSecond)
      .writeStream
      .option("checkpointLocation", s"$checkpoint/supplier")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        t2.sinkBatch(PageEventCodec.toWire(batch), id)
      }
      .start()

  /** The streaming count over a PageEvent stream — exactly
    * PageViews.pageCounts with an event-time watermark in front of the
    * aggregation. The reference's legacy ~24 h grace is replaced by an
    * explicit finite watermark (default 10 s) so state is evicted
    * (SURVEY.md §2.3 / §7.4.3 — final counts identical for in-order data).
    */
  def countsStream(events: DataFrame): DataFrame =
    PageViews.unwrapWindow(
      PageViews.windowedCounts(
        PageViews.rekey(PageViews.filterValid(events, "duration"), "name", "date")
          .withWatermark("date", watermark),
        "date", "name"),
      "name")

  /** Entry point B job: T2 -> filter -> 5 s window count -> T4 + analytics.
    * Update output mode = the KTable changelog (SURVEY.md §2.1 #10); each
    * micro-batch's refinements go to the T4 topic and the snapshot store.
    */
  def startJob(checkpoint: String): StreamingQuery =
    countsStream(PageEventCodec.fromWire(t2.stream(spark)))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$checkpoint/job")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val out = batch.persist()
        try {
          t4.sinkBatch(out.select(col("name"), col("window_start"), col("cnt")), id)
          analytics.update(out, id)
        } finally out.unpersist()
      }
      .start()

  /** Entry point C serving: the reference's HTTP surface (SSE /analytics,
    * /publish, live chart page) over this pipeline's analytics store.
    * port 0 = ephemeral (see AnalyticsServer.boundPort).
    */
  def startServer(port: Int = 0): AnalyticsServer = {
    val topics = Map(Topics.T1 -> t1, Topics.T2 -> t2)
    new AnalyticsServer(analytics,
      (name, topic) => publish(name, topics.getOrElse(topic, t1)),
      port = port).start()
  }

  /** Rebuild the analytics snapshot from the T4 changelog (restart path):
    * last write per (name, window) wins, exactly like replaying the
    * reference's changelog topic into a fresh store.
    */
  def restoreAnalytics(): Unit = {
    analytics.clear()
    // counts only ever grow, so max == latest refinement (and is
    // deterministic, unlike last() over an unordered group)
    val latest = t4.batch(spark)
      .groupBy(col("name"), col("window_start"))
      .agg(max(col("cnt")).as("cnt"))
    analytics.update(latest, -1L)
  }
}
