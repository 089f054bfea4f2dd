package graft.streaming

import graft.GraftSession

/** Live run of the whole reference topology (SURVEY.md §3's three entry
  * points) over emulated topics — the offline analogue of the reference's
  * browser demo: supplier -> T2 -> windowed-count job -> T4, with a 1 Hz
  * analytics snapshot printed instead of the SSE/smoothie.js chart
  * (reference PageEventController.java:42-58, static/index.html).
  *
  * Usage: runMain graft.streaming.PipelineDemo [seconds=10]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(10)
    val spark = GraftSession.local()
    val root = java.nio.file.Files.createTempDirectory("graft_topics").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    println(s"[demo] topics at $root")

    val p = new PageEventPipeline(spark, root)

    // entry point A: one manual publish to T1, tailed by the console consumer
    val console = p.startConsole(ckpt)
    val ev = p.publish("P1")
    println(s"[demo] published $ev to T1")

    // entry point B: supplier -> T2 -> job -> T4
    val supplier = p.startSupplier(ckpt, rowsPerSecond = 20)
    val job = p.startJob(ckpt)

    // entry point C: the real HTTP surface (SSE /analytics + chart page),
    // plus the same 1 Hz snapshot echoed to the console
    val server = p.startServer()
    println(s"[demo] serving http://127.0.0.1:${server.boundPort}/ " +
      s"(SSE at /analytics, ingest at /publish)")
    val deadline = System.currentTimeMillis() + seconds * 1000L
    while (System.currentTimeMillis() < deadline) {
      Thread.sleep(1000)
      val now = System.currentTimeMillis() / 1000
      println(s"[analytics] now=$now ${p.analytics.snapshot(now)}")
    }

    server.stop(); supplier.stop(); job.stop(); console.stop()
    val t4 = p.t4.batch(spark)
    println(s"[demo] T4 changelog rows: ${t4.count()}")
    t4.show(5, truncate = false)
    spark.stop()
  }
}
