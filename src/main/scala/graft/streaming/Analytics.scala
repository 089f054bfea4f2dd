package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

/** Queryable-state substitute for the reference's interactive query
  * (reference PageEventController.java:42-58: InteractiveQueryService opens
  * the `count-store` window store and fetchAll(now-5s, now), folding
  * last-window-wins).
  *
  * Spark has no interactive-query API over streaming state (SURVEY.md §7.4.2),
  * so the serving layer maintains its own snapshot: `update(batch)` is called
  * from foreachBatch with the micro-batch's (key, window_start, cnt) updates
  * — update-mode output IS the changelog the reference's store consumes. The
  * collect here is the serving-layer boundary, not a plan operator: its
  * cardinality is (keys x live windows), identical to what the reference's
  * RocksDB fetchAll materializes per poll, independent of input volume.
  */
final class Analytics(keyCol: String = "event_type") {
  // (key, windowStart seconds) -> count; concurrent because the streaming
  // query thread writes while serving threads read.
  private val store = TrieMap.empty[(String, Long), Long]

  /** foreachBatch hook: upsert this micro-batch's refinements. */
  def update(batch: DataFrame, batchId: Long): Unit =
    batch.select(keyCol, "window_start", "cnt").collect().foreach { r =>
      store.put((r.getString(0), r.getLong(1)), r.getLong(2))
    }

  /** The /analytics fetch: counts of windows starting in [now - lookback,
    * now], last-window-wins per key (SURVEY.md §2.3.5).
    */
  def snapshot(nowSec: Long, lookbackSec: Long = 5L): Map[String, Long] =
    store.iterator
      .filter { case ((_, ws), _) => ws >= nowSec - lookbackSec && ws <= nowSec }
      .toSeq
      .groupBy(_._1._1)
      .map { case (k, entries) => k -> entries.maxBy(_._1._2)._2 }

  def size: Int = store.size
  def clear(): Unit = store.clear()
}
