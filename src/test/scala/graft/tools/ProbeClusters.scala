package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, operators}

/** Measured-claim utility: interleaved A/B of connectedComponents round
  * configurations on the wired dedup_clusters pair set, controlling for
  * machine-load drift by alternating variants in one JVM. Usage:
  *   runMain graft.tools.ProbeClusters /root/testdata/sf0.1
  */
object ProbeClusters {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-28s $dt%6.2f s")
      dt
    }
    def run(rp: Int): Unit = {
      operators.Dedup.connectedComponents(
        operators.Dedup.ngramJaccardPairs(
          graft.model.Tables.documents(spark, dir), n = 3, threshold = 0.2),
        iters = 4, roundPartitions = rp)
        .write.format("noop").mode("overwrite").save()
      operators.Dedup.releaseComponentCache(spark)
    }
    // warmup
    run(0); run(8)
    val rounds = 4
    val results = (1 to rounds).flatMap { i =>
      Seq("rp0" -> time(s"rp0_$i")(run(0)), "rp8" -> time(s"rp8_$i")(run(8)))
    }
    results.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (k, vs) =>
      val ts = vs.map(_._2)
      println(f"[probe] SUMMARY $k%-6s min ${ts.min}%5.2f  med ${ts.sorted.apply(ts.size / 2)}%5.2f  max ${ts.max}%5.2f")
    }
    spark.stop()
  }
}
