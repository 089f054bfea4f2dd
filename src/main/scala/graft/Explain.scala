package graft

/** Plan inspection tool: prints `explain("formatted")` for each query (or
  * the ones named in args) — the iterate-on-the-plan loop.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSet else SparkEntry.queries.keySet
    val spark = GraftSession.local(8)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.contains(n) }
      .foreach { case (name, fn) =>
        println(s"\n======== $name ========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
