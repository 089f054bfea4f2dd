package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.model.PageEvent
import graft.operators.PageViews

/** Unit tests over the hand-written micro-fixture (FIXTURES.md §A.4) —
  * covers every semantic edge of SURVEY.md §2.3: strict >100 boundary,
  * epoch-aligned 5 s buckets, multi-key, late/out-of-order rows,
  * last-window-wins snapshot.
  */
class PageViewsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(name: String, user: String, epochMs: Long, duration: Long) =
    PageEvent(name, user, new Timestamp(epochMs), duration)

  // FIXTURES.md §A.4 micro-fixture, late row arrives last
  private lazy val micro = Seq(
    ev("P1", "U1", 10000L, 100),  // dropped: strict >
    ev("P1", "U1", 10001L, 101),  // [10,15) P1
    ev("P1", "U2", 14999L, 5000), // [10,15) P1
    ev("P2", "U1", 15000L, 200),  // [15,20) P2
    ev("P1", "U1", 12000L, 300)   // late -> still [10,15) P1
  ).toDS().toDF()

  test("filter is strictly greater-than 100") {
    val kept = PageViews.filterValid(micro, "duration").collect()
    assert(kept.length == 4)
    assert(!kept.exists(_.getAs[Long]("duration") == 100))
  }

  test("rekey keeps only key and event-time columns") {
    val out = PageViews.rekey(micro, "name", "date")
    assert(out.columns.toSeq == Seq("name", "date"))
  }

  test("windowed counts: epoch-aligned 5s buckets, late row included") {
    val counts = PageViews.pageCounts(micro, "name", "date", "duration")
      .as[(String, Long, Long)].collect().toSet
    assert(counts == Set(("P1", 10L, 3L), ("P2", 15L, 1L)))
  }

  test("window boundary: ts=15000 goes to [15,20), not [10,15)") {
    val counts = PageViews.pageCounts(micro, "name", "date", "duration")
      .filter($"window_start" === 15L).as[(String, Long, Long)].collect()
    assert(counts.toSet == Set(("P2", 15L, 1L)))
  }

  test("snapshot: last-window-wins within lookback") {
    // two windows for P1: [10,15) cnt 3 and [15,20) cnt 2 -> at now=15 both
    // window starts are in [10,15]; later window must win (SURVEY §2.3.5)
    val withMore = micro.union(Seq(
      ev("P1", "U1", 16000L, 500),
      ev("P1", "U2", 17000L, 600)).toDS().toDF())
    val counts = PageViews.pageCounts(withMore, "name", "date", "duration")
    val snap = PageViews.snapshot(counts, "name", lit(15L))
      .as[(String, Long)].collect().toMap
    assert(snap == Map("P1" -> 2L, "P2" -> 1L))
  }

  test("snapshot lookback excludes old windows") {
    val counts = PageViews.pageCounts(micro, "name", "date", "duration")
    val snap = PageViews.snapshot(counts, "name", lit(25L))
      .as[(String, Long)].collect().toMap
    assert(snap.isEmpty) // window starts 10 and 15 are both < 25-5
  }
}
