package graft

import org.apache.spark.sql.functions._

import graft.operators.EventSuite

/** Randomized reference parity for the trailing-window z-score kernel:
  * the window-frame bookkeeping (24 PRECEDING .. 1 PRECEDING, current row
  * excluded from its own baseline, warm-up rows with a partial baseline
  * filtered, zero-variance baselines unscored) is checked against a plain
  * sliding-window Scala fold on random series — including constant runs
  * (variance exactly 0 -> z NULL, never a division) and series shorter
  * than the baseline (no output at all). The z arithmetic is replayed
  * with the SAME operand order (double casts, one division each, sqrt)
  * so equality is exact, not approximate — the property the DuckDB
  * oracle's hash compare also relies on.
  */
class ZscorePropertySpec extends SparkSpec {
  import spark.implicits._

  private def reference(series: Seq[Long]): Seq[(Int, Option[Double])] =
    series.indices.collect {
      case i if i >= 24 =>
        val base = series.slice(i - 24, i)
        val n = base.size.toLong
        val s = base.sum
        val ss = base.map(c => c * c).sum
        val variance = (n * ss - s * s).toDouble / (n * n).toDouble
        val z = if (variance > 0)
          Some((series(i).toDouble - s.toDouble / n.toDouble) /
            math.sqrt(variance))
        else None
        (i, z)
    }

  private def kernel(series: Seq[Long]): Map[Long, Option[Double]] = {
    val df = series.zipWithIndex
      .map { case (c, i) => ("t", i.toLong * 3600, c) }
      .toDF("event_type", "hour_s", "cnt")
    EventSuite.rollingZscoreOf(df)
      .select(col("hour_s"), col("z"))
      .as[(Long, Option[Double])].collect().toMap
  }

  test("random series: kernel z equals the sliding-fold reference bit-for-bit") {
    (1 to 3).foreach { sample =>
      val rnd = new scala.util.Random(55000L + sample)
      val series = Seq.fill(40 + rnd.nextInt(20))(rnd.nextInt(50).toLong)
      val got = kernel(series)
      val want = reference(series)
      assert(got.size == want.size,
        s"sample $sample: ${got.size} scored rows, want ${want.size} " +
          "(warm-up rows must be filtered, nothing else)")
      want.foreach { case (i, z) =>
        assert(got(i.toLong * 3600) == z,
          s"sample $sample idx $i: got ${got(i.toLong * 3600)}, want $z")
      }
    }
  }

  test("constant baseline scores NULL; short series scores nothing") {
    // 24 identical values then a spike: variance 0 -> z NULL even though
    // the spike is 'infinitely' anomalous — unscorable, not infinite
    val flat = Seq.fill(24)(7L) :+ 100L
    val gotFlat = kernel(flat)
    assert(gotFlat.keySet == Set(24L * 3600) && gotFlat(24L * 3600).isEmpty,
      s"constant baseline must yield one NULL-z row: $gotFlat")
    // 24 rows = zero FULL baselines (row 23 has only 23 predecessors)
    assert(kernel(Seq.fill(24)(5L)).isEmpty,
      "a series no longer than the baseline must score no rows")
  }
}
