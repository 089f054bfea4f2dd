package graft

import org.apache.spark.sql.functions._

/** Unit anchor for the state-data-source audit pair (state_inspect /
  * state_changelog): on a crafted stream with a mid-stream restart and a
  * key updated across the restart boundary, the offline store read, the
  * change-feed reconstruction (last committed update per key), and the
  * expected counts must all agree — and the change feed must show the
  * updated key committing in BOTH incarnations.
  */
class StateSourceSpec extends SparkSpec {
  import spark.implicits._

  test("statestore read == change-feed rebuild == expected, across a restart") {
    val ckpt = tmpDir("state_src")
    val root = tmpDir("state_src_in")
    val wireSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("date",
        org.apache.spark.sql.types.LongType)))
    val in = new graft.sources.FileTopic("state_src_in", wireSchema, root)
    def drain(): Unit = {
      val q = in.stream(spark)
        .withColumn("ts", timestamp_millis(col("date")))
        .groupBy(window(col("ts"), "5 seconds"), col("name"))
        .agg(count(lit(1)).as("cnt"))
        .writeStream.outputMode("update").format("noop")
        .option("checkpointLocation", ckpt).start()
      try { q.processAllAvailable() } finally q.stop()
    }
    // incarnation 1: a twice, b once
    in.append(Seq(("a", 1000L), ("a", 2000L), ("b", 9000L)).toDF("name", "date"))
    drain()
    // incarnation 2 (RESTART): a's window updated again + a new key
    in.append(Seq(("a", 2500L), ("c", 1000L)).toDF("name", "date"))
    drain()

    val expect = Map(("a", 0L) -> 3L, ("b", 5L) -> 1L, ("c", 0L) -> 1L)
    def toMap(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] =
      df.select(col("key.name"), col("key.window.start").cast("long"),
          col("value.count"))
        .as[(String, Long, Long)].collect()
        .map { case (n, w, c) => (n, w) -> c }.toMap

    val store = toMap(spark.read.format("statestore")
      .option("path", ckpt).load())
    assert(store == expect, s"offline store read: $store")

    val feed = spark.read.format("statestore").option("path", ckpt)
      .option("readChangeFeed", "true").option("changeStartBatchId", "0")
      .load().cache()
    try {
      // a's window must have committed in two different batches — the
      // post-restart update landed on RECOVERED state (2 -> 3)
      val aCommits = feed
        .filter(col("key.name") === "a" && col("change_type") === "update")
        .select(col("batch_id"), col("value.count"))
        .as[(Long, Long)].collect().sortBy(_._1)
      assert(aCommits.map(_._2).toSeq == Seq(2L, 3L),
        s"a's changelog must show 2 then 3 across the restart: ${aCommits.toSeq}")
      // last-update-wins rebuild equals the store
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key")).orderBy(col("batch_id").desc)
      val rebuilt = toMap(feed.filter(col("change_type") === "update")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1))
      assert(rebuilt == expect, s"change-feed rebuild: $rebuilt")
    } finally feed.unpersist()
  }
}
