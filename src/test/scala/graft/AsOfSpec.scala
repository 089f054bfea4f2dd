package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.WelfordAggregator

/** Unit tests for as-of join tie semantics and the Welford aggregator. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join: <= matching, latest-order tie break, null when no prior") {
    val root = tmpDir("asof")
    def ts(s: Long) = new Timestamp(s * 1000)
    // build miniature events/orders parquet shaped like the fixtures
    Seq(
      (1L, ts(100), 7L, "view", 1.0, "{}"),   // after both orders
      (2L, ts(50), 7L, "view", 1.0, "{}"),    // exactly at order ts -> matches it
      (3L, ts(10), 7L, "view", 1.0, "{}"),    // before all orders -> null
      (4L, ts(100), 9L, "view", 1.0, "{}")    // user with no orders -> null
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$root/events.parquet")
    Seq(
      (10L, 7L, "O", 5.0, ts(50), "1-URGENT"),
      (11L, 7L, "O", 6.0, ts(50), "1-URGENT"), // same date: higher key wins
      (12L, 7L, "O", 7.0, ts(60), "1-URGENT")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.parquet(s"$root/orders.parquet")

    val got = graft.operators.AsOf.eventsAsOfOrders(spark, root)
      .select($"event_id", $"asof_orderkey").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(1L).contains(12L)) // latest order before t=100
    assert(got(2L).contains(11L)) // <= match at equal ts; orderkey tie -> max
    assert(got(3L).isEmpty)
    assert(got(4L).isEmpty)
  }

  test("welford aggregator matches closed-form mean/variance") {
    val xs = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)
    val welford = udaf(new WelfordAggregator)
    val got = xs.toDF("x").repartition(3) // exercise the parallel merge
      .agg(welford($"x").as("m"))
      .select($"m.n", $"m.mean", $"m.variance")
      .as[(Long, Double, Double)].collect().head
    assert(got._1 == 8L)
    assert(math.abs(got._2 - 5.0) < 1e-12)
    assert(math.abs(got._3 - 32.0 / 7) < 1e-12) // sample variance
  }
}
