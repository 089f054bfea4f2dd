package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.plans.LevenshteinSingleEval

/** Interleaved in-JVM A/B for the LevenshteinSingleEval rewrite
  * (measured-claim utility): same session, alternating rule-on/rule-off
  * runs of the project-then-filter fuzzy-match shape over synthetic
  * SIMILAR-LENGTH pairs — the population the length guard cannot prune,
  * where the banded 3-arg kernel is the only defense against the full
  * O(len^2) DP. Rule off = Catalyst's native double-evaluation plan
  * (kernel in the join/filter AND in the projection); rule on = one
  * banded kernel. Run via:
  *   sbt "Test/runMain graft.tools.ProbeLevenshtein [nPairs] [len]"
  */
object ProbeLevenshtein {
  def main(args: Array[String]): Unit = {
    val nPairs = args.headOption.map(_.toInt).getOrElse(200000)
    val len = args.drop(1).headOption.map(_.toInt).getOrElse(400)
    val spark = GraftSession.local(8)
    import spark.implicits._
    val rng = new scala.util.Random(11)
    def randStr(): String = {
      val sb = new StringBuilder(len)
      (0 until len).foreach(_ => sb.append(('a' + rng.nextInt(26)).toChar))
      sb.toString
    }
    // same-length random pairs: guard passes everything, kernel decides
    val tmp = java.nio.file.Files.createTempDirectory("graft_lev_probe").toString
    Seq.fill(nPairs)((randStr(), randStr())).toDF("a", "b")
      .repartition(8).write.mode("overwrite").parquet(tmp)
    def run(): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(tmp)
        .select(col("a"), col("b"),
          levenshtein(col("a"), col("b")).cast("long").as("d"))
        .filter(col("d") <= 20)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val saved = spark.experimental.extraOptimizations
    def withRule(on: Boolean)(f: => Double): Double = {
      spark.experimental.extraOptimizations =
        if (on) saved else saved.filterNot(_ == LevenshteinSingleEval)
      try f finally spark.experimental.extraOptimizations = saved
    }
    withRule(true)(run()) // warmup
    withRule(false)(run())
    val (on, off) = (1 to 3).map { i =>
      val a = withRule(true)(run())
      val b = withRule(false)(run())
      println(f"[probe] round $i: rule-on $a%6.2f s, rule-off $b%6.2f s")
      (a, b)
    }.unzip
    println(f"[probe] median rule-on ${on.sorted.apply(1)}%6.2f s, " +
      f"rule-off ${off.sorted.apply(1)}%6.2f s " +
      f"(${off.sorted.apply(1) / on.sorted.apply(1)}%4.1fx)")
    spark.stop()
  }
}
