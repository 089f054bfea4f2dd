package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.TextFunctions._
import graft.model.Tables

/** Stage breakdown for adaptive_quality (measured-claim utility). */
object ProbeAdaptive {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val mode = args.drop(1).headOption.getOrElse("none")
    if (mode == "warmup" || mode == "orders") {
      import org.apache.spark.sql.expressions.Window
      val o = spark.read.parquet(s"$dir/orders.parquet")
      time("warmup: orders block")(
        o.groupBy("o_orderpriority").count()
          .join(o.select("o_orderpriority", "o_orderkey"), "o_orderpriority")
          .withColumn("rn", row_number().over(
            Window.partitionBy("o_orderpriority").orderBy("o_orderkey")))
          .filter(col("rn") <= 3)
          .write.format("noop").mode("overwrite").save())
    }
    if (mode == "warmup" || mode == "cc") {
      val pairs = spark.range(4).select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      time("warmup: cc block") {
        graft.operators.Dedup.connectedComponents(pairs, iters = 2, roundPartitions = 2)
          .write.format("noop").mode("overwrite").save()
        graft.operators.Dedup.releaseComponentCache(spark)
      }
    }
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null && e.taskInfo.duration > 2000)
            println(f"[task] stage=${e.stageId} dur=${e.taskInfo.duration}ms " +
              f"run=${m.executorRunTime}ms cpu=${m.executorCpuTime / 1000000}ms " +
              f"gc=${m.jvmGCTime}ms deser=${m.executorDeserializeTime}ms " +
              f"sched(launch-submit)=n/a")
        }
      })
    time("warm: docs count")(docs.count())
    val scored = docs.select(col("source"),
      qualityScore(col("text")).as("quality"),
      tokenCount(col("text")).cast("long").as("n_tokens"))
    time("scored count")(scored.count())
    for (i <- 1 to 8)
      time(s"scored noop #$i")(scored.write.format("noop").mode("overwrite").save())
    val win = scored.withColumn("cd", cume_dist().over(
      Window.partitionBy(col("source")).orderBy(col("quality"))))
    time("window noop")(win.write.format("noop").mode("overwrite").save())
    val agg = win.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cd") >= 0.25, 1L).otherwise(0L)).as("n_kept"))
    time("window+agg noop")(agg.write.format("noop").mode("overwrite").save())
    time("full adaptiveQuality")(
      graft.operators.TextSuite.adaptiveQuality(spark, dir)
        .write.format("noop").mode("overwrite").save())
    time("full again")(
      graft.operators.TextSuite.adaptiveQuality(spark, dir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
