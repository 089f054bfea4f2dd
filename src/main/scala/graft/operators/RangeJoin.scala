package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join WITHOUT an equi key — the interval/band
  * join Spark lacks natively (reference scope: absent; engine adds it per
  * SURVEY.md §2.2's join category).
  *
  * The naive theta-join (`p.ts >= i.start AND p.ts < i.end`) has no
  * equi-key, so Catalyst plans BroadcastNestedLoopJoin — every point
  * against every interval. Binning restores a hash equi-join: each interval
  * explodes to the fixed-width bins it covers, each point computes its one
  * bin, the join keys on bin, and the exact containment predicate filters
  * the bin-mates.
  *
  * Scale shape: shuffle volume = points + intervals x (len/binWidth + 1);
  * per-bucket fan-in is bounded by intervals-per-bin, so pick binWidth near
  * the median interval length (cost is ~2 bins per interval, few intervals
  * per point bucket). No pair dedup pass: a point has exactly ONE bin, so
  * it meets each covering interval exactly once.
  */
object RangeJoin {

  /** Join `points` to every row of `intervals` whose half-open range
    * [startCol, endCol) contains pointCol. All three columns are numeric
    * (e.g. epoch seconds); output columns are the union of both inputs
    * (caller disambiguates name clashes beforehand).
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive (got $binWidth)")
    val binned = intervals
      // malformed (empty/inverted) intervals contain no points — and MUST
      // be dropped before the explode: sequence(a, b) with a > b generates
      // a DESCENDING range, so one corrupted end < start row would explode
      // into (start-end)/binWidth bins instead of zero
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin",
        explode(sequence(
          floor(col(startCol) / binWidth).cast("long"),
          // end is exclusive: the bin of the last contained value
          floor((col(endCol) - 1) / binWidth).cast("long"))))
    points.withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
      .join(binned, "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }
}
