package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.model.Tables

/** Stage breakdown for table_profile (measured-claim utility). */
object ProbeProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    val li = Tables.lineitem(spark, dir)
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-38s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    time("warm count")(li.count())
    time("count distinct x1 (orderkey)")(
      li.agg(countDistinct(col("l_orderkey"))).write.format("noop").mode("overwrite").save())
    time("count distinct x5 one agg")(
      li.agg(countDistinct(col("l_orderkey")), countDistinct(col("l_partkey")),
        countDistinct(col("l_quantity")), countDistinct(col("l_returnflag")),
        countDistinct(col("l_shipdate"))).write.format("noop").mode("overwrite").save())
    time("full tableProfile")(
      graft.operators.RelationalSuite.tableProfile(spark, dir)
        .write.format("noop").mode("overwrite").save())
    time("full again")(
      graft.operators.RelationalSuite.tableProfile(spark, dir)
        .write.format("noop").mode("overwrite").save())
    graft.operators.RelationalSuite.tableProfile(spark, dir).explain("formatted")
    spark.stop()
  }
}
