package graft

import org.apache.spark.sql.functions._

import graft.model.Tables

/** Partitioned file sink + partition-pruned scan: the layout lever that
  * turns a 100 TB full scan into a single-partition read when queries
  * filter on the partition key.
  */
class PartitionedSinkSpec extends SparkSpec {
  import spark.implicits._

  test("partitionBy write, then a key-filtered read prunes to one partition") {
    val out = tmpDir("events_parted")
    Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)

    // layout: one directory per event_type
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("event_type=")).sorted
    assert(dirs.length >= 4, s"expected hive-style partition dirs, got ${dirs.toSeq}")

    val df = spark.read.parquet(out).filter($"event_type" === "click")
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition filter not applied in:\n$plan")

    // pruned read equals the filtered full read
    val full = Tables.events(spark, "/root/testdata/sf0.001")
      .filter($"event_type" === "click").count()
    assert(df.count() == full)
    assert(full > 0)
  }
}
