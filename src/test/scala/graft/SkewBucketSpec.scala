package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Skew-salting correctness + bucketed co-located join plan shape. */
class SkewBucketSpec extends SparkSpec {
  import spark.implicits._

  test("salted join matches the plain join on skewed data") {
    // 90% of rows share one hot key
    val big = (0 until 20000)
      .map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, i.toLong))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "b"), (3L, "c"), (0L, "z")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).groupBy($"name")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(String, Long, Long)].collect().toSet
    val salted = Skew.saltedJoin(big, small, Seq("k"), salt = 8).groupBy($"name")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(String, Long, Long)].collect().toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("two-phase salted aggregation matches single-phase") {
    val df = (0 until 10000).map(i => (i % 3, i.toLong)).toDF("key", "v")
    val direct = df.groupBy($"key").agg(sum($"v").as("s"))
      .as[(Int, Long)].collect().toSet
    val salted = Skew.saltedTwoPhaseAgg(df, "key", salt = 8, seed = 1L)(
      partial = Seq(sum($"v").as("ps")),
      finalAgg = Seq(sum($"ps").as("s")))
      .as[(Int, Long)].collect().toSet
    assert(salted == direct)
  }

  test("bucketed tables join without an exchange") {
    val li = graft.model.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_orderkey", $"l_quantity")
    val o = graft.model.Tables.orders(spark, "/root/testdata/sf0.001")
      .select($"o_orderkey", $"o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    // merge hint forces a non-broadcast join so bucketing (not a broadcast)
    // is what avoids the shuffle
    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("o_bucketed"), $"l_orderkey" === $"o_orderkey")
    joined.write.format("noop").mode("overwrite").save()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")
  }
}
