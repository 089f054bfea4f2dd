package graft

import java.sql.Timestamp

import org.scalacheck.Gen

import graft.model.{PageEvent, PageEventCodec}
import graft.operators.PageViews

/** Property tests (SURVEY.md §5.2): window alignment — ∀ ts:
  * bucket(ts) <= ts < bucket(ts)+5s and bucket is epoch-aligned — plus
  * millisecond-exact JSON wire round-trips. Uses raw ScalaCheck generators
  * (the scalatest bridge isn't in the offline cache), batching samples into
  * a single Spark job.
  */
class WindowPropertySpec extends SparkSpec {
  import spark.implicits._

  private val tsGen = Gen.chooseNum(0L, 4102444800000L) // 1970..2100 epoch ms

  private def samples(n: Int, seed: Long): Seq[Long] = {
    val params = org.scalacheck.Gen.Parameters.default
    (0 until n).flatMap(i =>
      tsGen(params, org.scalacheck.rng.Seed(seed + i)))
  }

  test("tumbling window start is the epoch-aligned floor of ts") {
    val ms = samples(300, 42L)
    assert(ms.size == 300)
    val df = ms.map(m => PageEvent("P", "U", new Timestamp(m), 500L))
      .toDS().toDF()
    val rows = PageViews.pageCounts(df, "name", "date", "duration")
      .select($"window_start").as[Long].collect()
    assert(rows.forall(_ % 5 == 0), "window starts must be epoch-aligned to 5s")
    val buckets = ms.map(m => (m / 1000 / 5) * 5).toSet
    assert(rows.toSet == buckets,
      "buckets must be exactly {floor(ts/5s)*5s} over the inputs")
  }

  test("wire codec round-trips timestamps millisecond-exact") {
    val ms = samples(200, 7L)
    val df = ms.zipWithIndex
      .map { case (m, i) => PageEvent(s"P$i", "U", new Timestamp(m), 1L) }
      .toDS().toDF()
    val back = PageEventCodec.fromWire(PageEventCodec.toWire(df))
      .select($"name", $"date").as[(String, Timestamp)].collect()
      .map { case (n, t) => n.drop(1).toInt -> t.getTime }.toMap
    ms.zipWithIndex.foreach { case (m, i) =>
      assert(back(i) == m, s"timestamp $m did not round-trip")
    }
  }
}
