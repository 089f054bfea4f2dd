package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSession

/** Plan-audit utility: print the formatted physical plan of one or more
  * wired queries without executing them — the ".explain and iterate"
  * loop as a one-liner. Usage:
  *   Test/runMain graft.tools.ProbeExplain <query>[,<query>...] [sfDir]
  */
object ProbeExplain {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("pagerank").split(',').toSeq
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      println(s"==== $name ====")
      fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
