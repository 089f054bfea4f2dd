package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** As-of join — an operator Spark lacks natively (SURVEY.md §2.2 joins are
  * absent in the reference; this is the time-series staple the extended
  * scope adds): for each left row, attach the single right row with the
  * greatest right-time <= left-time per key.
  *
  * Implemented by composition (preference order (a)): tag + union + one
  * partitioned sort + last(ignoreNulls) running value. ONE shuffle of
  * (|L|+|R|) rows, no range-join explosion, no per-key driver work —
  * the classic distributed as-of shape that survives 100 TB (state per
  * partition is a single carried row).
  *
  * Tie semantics (deterministic): right rows at exactly left-time match;
  * among equal right times the greatest tiebreak column wins.
  */
object AsOf {

  /** events asof-join orders on user_id = o_custkey, order date <= event ts.
    * Returns every event with its most recent prior order (or nulls).
    */
  def eventsAsOfOrders(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      col("user_id").as("key"), col("ts"),
      col("event_id"), lit(1).as("is_event"),
      lit(null).cast("long").as("o_orderkey"),
      lit(null).cast("double").as("o_totalprice"))
    val o = Tables.orders(spark, dir).select(
      col("o_custkey").as("key"), col("o_orderdate").as("ts"),
      lit(null).cast("long").as("event_id"), lit(0).as("is_event"),
      col("o_orderkey"), col("o_totalprice"))
    // orders sort before events at equal ts (is_event 0 < 1) => "<=" match;
    // equal-date orders resolve to the max orderkey (last in asc order)
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts"), col("is_event"), col("o_orderkey").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    e.unionAll(o)
      .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("asof_totalprice", last(col("o_totalprice"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("key").as("user_id"),
        col("ts").cast("long").as("ts_s"),
        col("asof_orderkey"), col("asof_totalprice"))
  }
}
