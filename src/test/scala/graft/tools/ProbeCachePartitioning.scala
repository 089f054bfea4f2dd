package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured-claim utility: does a consumer join reuse the hash
  * partitioning of a cached, `repartition(key)`-ed relation, or does it
  * re-exchange the cache output every time? Checked under both settings
  * of `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning` (AQE
  * applied to the cache-fill plan can invalidate its advertised
  * partitioning). Drives the decision for the iterative kernels
  * (connectedComponents, pagerankFixedPoint), whose per-round cost is one
  * edge-sized shuffle IF the cache's partitioning is honored, two if not.
  * Usage: Test/runMain graft.tools.ProbeCachePartitioning
  */
object ProbeCachePartitioning {
  def main(args: Array[String]): Unit = {
    Seq("true", "false").foreach { canChange =>
      val parent = SparkSession.builder()
        .master("local[4]")
        .appName(s"cache-part-$canChange")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        // force the shuffled-join path — the iterative kernels' rank/label
        // side is never broadcastable at scale
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
      parent.sparkContext.setLogLevel("ERROR")
      // the kernels' round-scoped child session, conf overridden the same
      // way roundScopedSession does — parent stays the ACTIVE session, as
      // it is when Verify/Bench drive the wired queries
      val spark = parent.newSession()
      parent.conf.getAll.foreach { case (k, v) =>
        try spark.conf.set(k, v)
        catch { case _: org.apache.spark.sql.AnalysisException => () }
      }
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", canChange)
      import spark.implicits._
      val edges = (1 to 1000).map(i => (i.toLong % 37, (i % 41).toLong))
        .toDF("src", "dst").distinct()
        .withColumn("d", lit(7L))
        .repartition(col("src"))
        .persist()
      edges.count()
      // two iterative rounds, exactly the kernel's shape: the SAME cached
      // relation appears at two tree positions with remapped attribute ids
      var r = edges.select(col("src").as("n")).distinct()
        .select(col("n"), lit(100L).as("r"))
      for (_ <- 1 to 2) {
        r = edges.join(r, edges("src") === r("n"))
          .groupBy(edges("dst").as("m"))
          .agg(sum(expr("r div d")).as("inflow"))
          .select(col("m").as("n"), col("inflow").as("r"))
      }
      val plan = r.queryExecution.executedPlan.toString
      val overCache = plan.linesIterator.zipWithIndex.toSeq
      println(s"canChange=$canChange")
      println(plan.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("InMemory")
          || l.contains("SortMergeJoin") || l.contains("AdaptiveSparkPlan"))
        .mkString("\n"))
      parent.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
