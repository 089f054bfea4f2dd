package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Randomized parity: the hand-built [[StreamOps.GapSessions]] processor
  * (event-time timers) must agree with Spark's built-in `session_window`
  * on ARBITRARY event sets, not just the three fixture scales the oracle
  * rows cover. Each sample draws a few hundred (user, ts) stamps with
  * gaps straddling the session boundary on both sides — including EXACT
  * boundary hits (ts == last + gap), where the two implementations most
  * plausibly diverge. The built-in MERGES at the boundary (a session's
  * extent is [start, last + gap] for merging: next.start == prev.end
  * joins them — pinned empirically; the first version of the processor
  * broke at the boundary and THIS SPEC caught it) — replays them through
  * a MemoryStream in two chunks (so sessions straddle a batch boundary),
  * flushes with the two-sentinel pattern, and compares the closed-session
  * sets row-for-row against the batch gap-islands answer.
  *
  * Seeded RNG: failures reproduce. Three samples keep the suite fast; the
  * per-sample event count and user fan-out still cover multi-session
  * users, single-event sessions, duplicate timestamps, and cross-batch
  * session extension.
  */
class GapSessionPropertySpec extends SparkSpec {
  import spark.implicits._

  private val gapSec = 60L // 1-minute gap keeps the generated spans small

  private def batchSessions(stamps: Seq[StreamOps.Stamp]) = {
    val df = stamps.toDF("user", "ts")
    df.groupBy(session_window(col("ts"), s"$gapSec seconds"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"),
        unix_micros(col("session_window.start")).as("start_us"), col("n"))
      .as[(Long, Long, Long)].collect().toSet
  }

  private def streamedSessions(stamps: Seq[StreamOps.Stamp]) = {
    val input = MemoryStream[StreamOps.Stamp](spark)
    val q = StreamOps.gapSessions(
        input.toDS().withWatermark("ts", "0 seconds"), gapUs = gapSec * 1000000)
      .toDF().writeStream.format("memory")
      .queryName("gap_prop")
      .option("checkpointLocation", tmpDir("gapprop"))
      .outputMode("append").start()
    try {
      val sorted = stamps.sortBy(_.ts.getTime)
      val (a, b) = sorted.splitAt(sorted.length / 2)
      input.addData(a)
      q.processAllAvailable()
      input.addData(b)
      q.processAllAvailable()
      // two-sentinel flush on reserved user -1: sentinel-1 advances the
      // watermark, sentinel-2's data batch fires the armed timers
      val far = sorted.last.ts.getTime + 86400000L
      input.addData(Seq(StreamOps.Stamp(-1L, new Timestamp(far))))
      q.processAllAvailable()
      input.addData(Seq(StreamOps.Stamp(-1L, new Timestamp(far + 86400000L))))
      q.processAllAvailable()
    } finally q.stop()
    spark.table("gap_prop").filter(col("user") =!= -1L)
      .select(col("user"), col("startUs"), col("nEvents"))
      .as[(Long, Long, Long)].collect().toSet
  }

  test("GapSessions equals session_window on random event sets (seeded)") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 3).foreach { sample =>
      val base = 1700000000000L // fixed epoch-ms origin
      val stamps = (1 to 300).map { _ =>
        val user = 1L + rnd.nextInt(8)
        // mix sub-gap jitter, exact-boundary hits, and super-gap jumps
        val stepMs = rnd.nextInt(4) match {
          case 0 => rnd.nextInt(30000).toLong          // inside the gap
          case 1 => gapSec * 1000                      // exact boundary
          case 2 => gapSec * 1000 + rnd.nextInt(90000) // past the gap
          case _ => rnd.nextInt(1000).toLong           // duplicate-ish
        }
        (user, stepMs)
      }.groupBy(_._1).toSeq.flatMap { case (user, steps) =>
        var t = base + rnd.nextInt(10000)
        steps.map { case (_, step) =>
          t += step
          StreamOps.Stamp(user, new Timestamp(t))
        }
      }
      val want = batchSessions(stamps)
      val got = streamedSessions(stamps)
      assert(got == want,
        s"sample $sample: processor diverges from session_window — " +
          s"only-in-processor ${got -- want}, only-in-builtin ${want -- got}")
    }
  }
}
