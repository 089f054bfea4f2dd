package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Core row model of the reference engine.
  *
  * `PageEvent` mirrors the reference's 4-field immutable record
  * (reference: src/main/java/org/example/kafkastreamsspringcloudstreamtp1/events/PageEvent.java:5
  * — `(name: String, user: String, date: java.util.Date, duration: long)`).
  * The Jackson wire form serializes `date` as epoch milliseconds; we keep that
  * contract in the JSON codecs below so round-trips are millisecond-exact.
  */
final case class PageEvent(name: String, user: String, date: Timestamp, duration: Long)

object PageEvent {
  /** Explicit nominal schema — the reference has a fixed compile-time schema
    * (no inference, no registry), so we never use `inferSchema`.
    */
  val schema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("user", StringType),
    StructField("date", TimestampType),
    StructField("duration", LongType)))

  /** Wire schema: Jackson writes java.util.Date as epoch millis
    * (reference FIXTURES A.1). Used by the JSON codec before converting
    * millis -> TimestampType.
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("user", StringType),
    StructField("date", LongType),
    StructField("duration", LongType)))
}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md). All
  * schemas are fixed (FIXTURES.md §B); we read parquet directly — Spark's
  * vectorized reader + column pruning + predicate pushdown make the scan the
  * cheapest part of every query at scale.
  */
object Tables {
  import org.apache.spark.sql.functions.{col, expr}

  /** Read a fixture table and normalize timestamps: the fixtures store
    * TIMESTAMP_NTZ (isAdjustedToUTC=false) and `events.ts` is
    * nanosecond-precision (read as Long via
    * spark.sql.legacy.parquet.nanosAsLong, set in GraftSession.tune).
    * The session timezone is pinned UTC, so NTZ -> instant cast is
    * value-preserving; ns -> us uses integer division (`div`) — a double
    * division would lose precision above 2^53 ns.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      f.dataType match {
        case TimestampNTZType => df.withColumn(f.name, col(f.name).cast(TimestampType))
        case LongType if f.name == "ts" && name == "events" =>
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _ => df
      }
    }
  }

  def events(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "events")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
