package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/JIT/codegen startup otherwise lands entirely on
    // whichever query sorts first (~5 s of pure session warmup). Covers the
    // scan/agg, join, and window execution paths so every timed query sees
    // a warmed engine.
    try {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      o.groupBy("o_orderpriority").count()
        .join(o.select("o_orderpriority", "o_orderkey"), "o_orderpriority")
        .withColumn("rn", row_number().over(
          Window.partitionBy("o_orderpriority").orderBy("o_orderkey")))
        .filter(col("rn") <= 3)
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // optional comma-separated query filter for local iteration, e.g.
    // SPARK_GRAFT_ONLY=dedup_clusters,ngram_jaccard — driver runs unfiltered
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) => names(k) }
      case None => SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink forces full materialization of every output column
      // (a bare .count() would let Catalyst prune the whole projection).
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-22s $dt%8.2f s")
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
