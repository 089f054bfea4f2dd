package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.model.Tables

/** Measured-claim utility: multi-distinct aggregate (Expand plan) vs two
  * single-distinct aggregates joined on the group key, interleaved A/B.
  */
object ProbeSketchAgg {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    def expandForm(): DataFrame = graft.operators.RelationalSuite.sketchAccuracy(spark, dir)
    def splitForm(): DataFrame = {
      val li = Tables.lineitem(spark, dir)
      def one(c: String, rsd: Double, ex: String, est: String) =
        li.groupBy(col("l_returnflag")).agg(
          countDistinct(col(c)).as(ex),
          approx_count_distinct(col(c), rsd).as(est))
      one("l_partkey", 0.05, "exact_parts", "est_parts")
        .join(one("l_suppkey", 0.01, "exact_supp", "est_supp"), "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"), col("exact_supp"),
          (abs(col("est_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("hll_parts_ok"),
          (abs(col("est_supp") - col("exact_supp")) <=
            col("exact_supp") * 0.02).as("hll_supp_ok"))
    }
    def time(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    time("warm_expand")(expandForm()); time("warm_split")(splitForm())
    (1 to 3).foreach { i =>
      time(s"expand_$i")(expandForm()); time(s"split_$i")(splitForm())
    }
    println("[probe] plans equal rows: " +
      (expandForm().collect().toSet == splitForm().collect().toSet))
    spark.stop()
  }
}
