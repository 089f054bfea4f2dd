package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference topology's operators, re-expressed as composable
  * DataFrame -> DataFrame functions. The same functions run in batch and in
  * Structured Streaming (Spark's unbounded-table model) — that is the point:
  * the reference's streaming query has a batch-equivalent final answer
  * (SURVEY.md §2.3.3) and we use one code path for both.
  *
  * Reference topology (reference: src/main/java/.../hanndlers/PageEventHandler.java:49-60):
  *   filter(duration > 100) -> map to (name, _) -> groupByKey
  *   -> windowedBy(5s tumbling) -> count -> toStream -> map(key unwrap)
  *
  * Column names are parameters so the same operators serve both the PageEvent
  * shape (name/date/duration) and the `events` fixture shape
  * (event_type/ts/value).
  */
object PageViews {

  /** Strict `duration > 100` predicate (reference PageEventHandler.java:51 —
    * `>` not `>=`, SURVEY.md §2.3.4). A plain Catalyst Filter: pushed into the
    * parquet scan in batch, evaluated pre-shuffle in streaming.
    */
  def filterValid(df: DataFrame, durationCol: String, threshold: Long = 100L): DataFrame =
    df.filter(col(durationCol) > threshold)

  /** Project + re-key (reference PageEventHandler.java:52: `(k,v) ->
    * KeyValue(v.name, 0L)`). Spark has no key channel, so re-keying is a
    * projection that keeps the new key plus the event-time column (Kafka
    * Streams carries the timestamp in record metadata; Spark needs it as a
    * column — SURVEY.md §2.1 #6). Dropping user/duration here is what
    * ColumnPruning would do anyway; being explicit keeps the shuffle row
    * narrow: 2 columns instead of 6 cross the exchange.
    */
  def rekey(df: DataFrame, keyCol: String, tsCol: String): DataFrame =
    df.select(col(keyCol), col(tsCol))

  /** Tumbling event-time window + count (reference PageEventHandler.java:53-55).
    * `window()` lowers to the same epoch-aligned floor bucketing as Kafka
    * Streams' `TimeWindows.of(5s)` (start = ts - ts mod 5s) via Catalyst's
    * TimeWindowing rule, so counts match bucket-for-bucket (SURVEY.md §2.3.1).
    * Physical plan: partial HashAggregate -> Exchange hashpartitioning(key,
    * window) -> final HashAggregate — the map-side partial aggregation is the
    * scale lever: with ~5 event types the exchange carries O(partitions x
    * keys x windows) rows, not O(input).
    */
  def windowedCounts(df: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String = "5 seconds"): DataFrame =
    df.groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("cnt"))

  /** Window-key unwrap (reference PageEventHandler.java:57): strip the window
    * bounds, keep (key, count). Exposes window start as epoch seconds for
    * deterministic cross-engine comparison.
    */
  def unwrapWindow(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol),
      col("window.start").cast("long").as("window_start"),
      col("cnt"))

  /** The whole reference query in one composition — scan to windowed counts.
    * (SURVEY.md §7.3's minimum slice.)
    */
  def pageCounts(df: DataFrame, keyCol: String, tsCol: String, durationCol: String,
                 windowLen: String = "5 seconds"): DataFrame =
    unwrapWindow(
      windowedCounts(
        rekey(filterValid(df, durationCol), keyCol, tsCol),
        tsCol, keyCol, windowLen),
      keyCol)

  /** The `/analytics` interactive query (reference PageEventController.java:42-58):
    * all (key, window) counts whose window start lies in [now-5s, now], folded
    * last-window-wins — if both the in-progress window and its predecessor
    * qualify, the later one's count is reported (SURVEY.md §2.3.5).
    *
    * `nowEpoch` is a Column so callers can pass a literal (tests) or a scalar
    * derived from the data (deterministic oracle: max(ts)). The last-wins fold
    * is a max_by per key — a single hash aggregation, no sort, no row
    * explosion; at scale this reduces (keys x <=2 windows) rows, trivially
    * distributed.
    */
  def snapshot(counts: DataFrame, keyCol: String, nowEpoch: Column,
               lookbackSec: Long = 5L): DataFrame =
    counts
      .filter(col("window_start").between(nowEpoch - lookbackSec, nowEpoch))
      .groupBy(col(keyCol))
      .agg(max_by(col("cnt"), col("window_start")).as("cnt"))
}
