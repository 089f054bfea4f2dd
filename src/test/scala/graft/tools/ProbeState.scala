package graft.tools

import org.apache.spark.sql.functions._

/** One-off schema probe for the state data source (round 13):
  * run a tiny no-watermark windowed count to a checkpoint, then read it
  * back via format("statestore") and print the schema + rows.
  * sbt "Test/runMain graft.tools.ProbeState"
  */
object ProbeState {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("probe_state")
    val root = java.nio.file.Files.createTempDirectory("probe_state_in")
    val wireSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("date",
        org.apache.spark.sql.types.LongType)))
    val in = new graft.sources.FileTopic("probe_in", wireSchema, root.toString)
    in.append(Seq(("a", 1000L), ("a", 2000L), ("b", 9000L)).toDF("name", "date"))
    val counts = in.stream(spark)
      .withColumn("ts", timestamp_millis(col("date")))
      .groupBy(window(col("ts"), "5 seconds"), col("name"))
      .agg(count(lit(1)).as("cnt"))
    val q = counts.writeStream.outputMode("update")
      .format("noop")
      .option("checkpointLocation", ckpt.toString)
      .start()
    q.processAllAvailable(); q.stop()
    val st = spark.read.format("statestore").option("path", ckpt.toString).load()
    st.printSchema()
    st.show(20, truncate = false)
    // second batch so the change feed has more than one batch id
    in.append(Seq(("a", 2500L), ("c", 1000L)).toDF("name", "date"))
    val q2 = in.stream(spark)
      .withColumn("ts", timestamp_millis(col("date")))
      .groupBy(window(col("ts"), "5 seconds"), col("name"))
      .agg(count(lit(1)).as("cnt"))
      .writeStream.outputMode("update").format("noop")
      .option("checkpointLocation", ckpt.toString).start()
    q2.processAllAvailable(); q2.stop()
    val cf = spark.read.format("statestore").option("path", ckpt.toString)
      .option("readChangeFeed", "true").option("changeStartBatchId", "0")
      .load()
    cf.printSchema()
    cf.show(30, truncate = false)
    spark.stop()
  }
}
