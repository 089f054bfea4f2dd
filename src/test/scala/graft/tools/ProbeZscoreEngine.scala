package graft.tools

import graft.streaming.StreamReplay

/** Interleaved in-JVM engine-lane measurement for stream_zscore: warm
  * pass engine seconds (the round-18 target is engine <= 3 s).
  */
object ProbeZscoreEngine {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { i =>
      StreamReplay.EngineTimer.reset()
      val t0 = System.nanoTime()
      StreamReplay.streamedZscore(spark, "/root/testdata/sf0.001").count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[zscore pass $i] wall $wall%.2f s engine ${StreamReplay.EngineTimer.engineSec}%.2f s")
    }
    spark.stop()
  }
}
