package graft.tools
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.model.Tables
object ProbeSketch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    for (dir <- args) {
      Tables.lineitem(spark, dir).groupBy(col("l_returnflag")).agg(
        countDistinct(col("l_partkey")).as("exact_p"),
        approx_count_distinct(col("l_partkey")).as("est_p"),
        countDistinct(col("l_suppkey")).as("exact_s"),
        approx_count_distinct(col("l_suppkey"), rsd = 0.01).as("est_s"))
        .collect().foreach { r =>
          val ep = r.getLong(1).toDouble; val sp = r.getLong(2).toDouble
          println(f"[sk] $dir ${r.getString(0)} parts err ${math.abs(sp/ep-1)}%.4f " +
            f"supp err ${math.abs(r.getLong(4).toDouble/r.getLong(3)-1)}%.4f")
        }
    }
    spark.stop()
  }
}
