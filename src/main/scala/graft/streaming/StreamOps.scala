package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.model.PageEvent

/** Streaming operators beyond the reference's topology (SURVEY.md §2.2
  * marks stream-stream joins and the processor API absent in the
  * reference; these are the Spark-native equivalents the complete engine
  * carries).
  */
object StreamOps {

  /** Watermark-bounded stream-stream inner join: pair each page event with
    * click-stream-style events of the same user within `windowSec` seconds
    * AFTER the page event. Both sides carry watermarks so join state is
    * evicted — without the time bound + watermarks, stream-stream join
    * state grows forever (the 100 TB failure mode).
    */
  def joinWithin(left: DataFrame, right: DataFrame, windowSec: Int,
                 watermark: String = "30 seconds"): DataFrame = {
    val l = left.select(col("name").as("l_name"), col("user").as("l_user"),
      col("date").as("l_date")).withWatermark("l_date", watermark)
    val r = right.select(col("name").as("r_name"), col("user").as("r_user"),
      col("date").as("r_date")).withWatermark("r_date", watermark)
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_date") >= col("l_date") &&
        col("r_date") <= col("l_date") + expr(s"INTERVAL $windowSec SECONDS"))
  }

  /** Streaming dedup — the online twin of Dedup.exact: drop events whose
    * dedup key was already seen, with the dedup STATE BOUNDED BY THE
    * WATERMARK (`dropDuplicatesWithinWatermark`): two copies inside the
    * watermark window dedup exactly; state for keys older than the
    * watermark is evicted, so a 100 TB/day stream holds only a window's
    * worth of keys instead of growing forever — the classic unbounded
    * `dropDuplicates` failure mode. Exactly-once within the window,
    * at-least-once across windows: the right contract for ingest dedup
    * where late replays beyond the window are re-verified downstream by
    * the batch dedup anyway.
    *
    * `keyCols` defaults to the content identity (name, user, date) — the
    * wire-level duplicate shape produced by producer retries.
    */
  def dedupStream(events: DataFrame, watermark: String = "30 seconds",
                  keyCols: Seq[String] = Seq("name", "user", "date")): DataFrame =
    events.withWatermark("date", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  final case class KeyedValue(key: String, value: Long)

  /** Per-key change suppression on the Spark 4 `transformWithState`
    * processor API — the Kafka Streams `suppress` / KTable-dedup analogue:
    * a changelog stream that re-emits unchanged values (upstream retries,
    * periodic refreshes, repeated update-mode refinements that settled on
    * the same value) is filtered down to rows whose value actually CHANGED
    * for their key. State is one value per key in the RocksDB state store
    * (transformWithState requires it; GraftSession.tune configures it),
    * optionally TTL-evicted so idle keys don't accumulate forever — the
    * bounded-state posture every 100 TB/day changelog consumer needs.
    * Batches are processed in arrival order; within a batch the LAST value
    * per key wins (update-stream semantics), matching what a downstream
    * serving sink (e.g. the SSE endpoint) would display.
    */
  final class EmitOnChange(ttl: TTLConfig)
    extends StatefulProcessor[String, KeyedValue, KeyedValue] {
    @transient private var last: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Long]("last", Encoders.scalaLong, ttl)
    override def handleInputRows(key: String, rows: Iterator[KeyedValue],
                                 timers: TimerValues): Iterator[KeyedValue] = {
      var out: Option[KeyedValue] = None
      rows.foreach(r => out = Some(r))
      out match {
        case Some(r) if !last.exists() || last.get() != r.value =>
          last.update(r.value)
          Iterator.single(r)
        case _ => Iterator.empty
      }
    }
  }

  /** Suppress unchanged per-key values: see [[EmitOnChange]]. `ttlMs > 0`
    * bounds state for idle keys (a key silent past the TTL re-emits its
    * next value even if unchanged — the standard suppression trade-off).
    */
  def emitOnChange(rows: Dataset[KeyedValue], ttlMs: Long = 0L): Dataset[KeyedValue] = {
    implicit val enc = Encoders.product[KeyedValue]
    val ttl = if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs))
      else TTLConfig.NONE
    rows.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new EmitOnChange(ttl), TimeMode.None(), OutputMode.Update())
  }

  final case class SessionUpdate(user: String, nEvents: Long, totalDuration: Long,
                                 closed: Boolean)
  // public: the state encoder's generated code instantiates it reflectively
  final case class SessionState(nEvents: Long, totalDuration: Long)

  /** Custom stateful processing (the processor-API analogue):
    * per-user running session stats via flatMapGroupsWithState — state is
    * per-key, partitioned, and evicted on timeout, exactly the lifecycle a
    * custom Kafka Streams Processor with a punctuator would manage by hand.
    *
    * Timeout modes:
    *   - ProcessingTimeTimeout: session closes `timeoutMs` after the last
    *     arrival (wall clock).
    *   - EventTimeTimeout: session closes when the WATERMARK passes
    *     last-event-time + `timeoutMs` — the production event-time design;
    *     the caller must put `.withWatermark` on `events` first.
    *   - NoTimeout: caller accepts unbounded state (tests).
    */
  def sessionStats(events: Dataset[PageEvent],
                   timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout,
                   timeoutMs: Long = 30000L): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val procTime = timeout == GroupStateTimeout.ProcessingTimeTimeout
    val eventTime = timeout == GroupStateTimeout.EventTimeTimeout
    events.groupByKey(_.user)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, timeout) {
        (user: String, rows: Iterator[PageEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionUpdate(user, s.nEvents, s.totalDuration, closed = true))
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0L))
            val batch = rows.toSeq
            val next = SessionState(prev.nEvents + batch.size,
              prev.totalDuration + batch.map(_.duration).sum)
            state.update(next)
            if (procTime) state.setTimeoutDuration(timeoutMs)
            if (eventTime) {
              val maxEvent = batch.map(_.date.getTime).max
              state.setTimeoutTimestamp(maxEvent + timeoutMs)
            }
            Iterator.single(SessionUpdate(user, next.nEvents, next.totalDuration, closed = false))
          }
      }
  }
}
