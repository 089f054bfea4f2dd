package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JSON wire codec for PageEvent. The reference's serde is Jackson with
  * java.util.Date as an epoch-millis number
  * (reference PageEvent.java:5; FIXTURES.md §A.1:
  * `{"name":"P1","user":"U1","date":1754990000000,"duration":4242}`).
  * `timestamp_millis`/`unix_millis` keep the round trip millisecond-exact
  * (SURVEY.md §7.4.5) — a string-formatted timestamp would truncate or shift
  * under non-UTC sessions.
  */
object PageEventCodec {

  /** Wire (date: epoch millis Long) -> engine (date: TimestampType). */
  def fromWire(df: DataFrame): DataFrame =
    df.withColumn("date", timestamp_millis(col("date")))

  /** Engine -> wire. */
  def toWire(df: DataFrame): DataFrame =
    df.withColumn("date", unix_millis(col("date")))
}
