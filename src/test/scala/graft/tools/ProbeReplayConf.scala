package graft.tools

import graft.streaming.StreamReplay

/** In-JVM A/B of one replay row under parent-session conf overrides (the
  * replay child sessions copy the parent conf at creation, so a conf set
  * here reaches them — run each variant in its own JVM: the child-session
  * cache would otherwise pin the first variant's conf).
  *
  * Usage: Test/runMain graft.tools.ProbeReplayConf <queryName> [k=v ...]
  */
object ProbeReplayConf {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("stream_asof_ttl")
    val confs = args.drop(1).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val fn = graft.SparkEntry.queries(name)
    def jitMs(): Long = Option(java.lang.management.ManagementFactory
      .getCompilationMXBean).map(_.getTotalCompilationTime).getOrElse(0L)
    def cls(): Long = java.lang.management.ManagementFactory
      .getClassLoadingMXBean.getTotalLoadedClassCount
    (1 to 3).foreach { i =>
      StreamReplay.EngineTimer.reset()
      val (j0, c0) = (jitMs(), cls())
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[probe $name pass $i] wall $wall%.2f s eng " +
        f"${StreamReplay.EngineTimer.engineSec}%.2f s " +
        f"jit ${(jitMs() - j0) / 1e3}%.1f s cls ${cls() - c0}")
    }
    spark.stop()
  }
}
