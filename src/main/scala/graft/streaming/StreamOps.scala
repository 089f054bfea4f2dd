package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

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
    // TTL state legally exists only under ProcessingTime (the engine
    // stamps each write with the clock the TTL counts against) — with
    // TimeMode.None the query crashes at start. Latent until the TTL
    // path got its first test (round 11); TimeMode.None stays the default
    // because it skips the per-write clock stamping entirely.
    val mode = if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    rows.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new EmitOnChange(ttl), mode, OutputMode.Update())
  }

  final case class RankedValue(key: String, rank: Int, value: Long)

  /** The shared top-k kernel both processors delegate to: merge arriving
    * values into the retained k-capped list, persist, emit the ranking —
    * one definition, so the seeded and unseeded processors cannot drift
    * (they are checked against the same oracle; a divergence would
    * surface as a confusing cross-query mismatch).
    */
  private def mergeTopK(top: ListState[Long], key: String,
                        rows: Iterator[KeyedValue],
                        k: Int): Iterator[RankedValue] = {
    val merged = (top.get().toSeq ++ rows.map(_.value).toSeq)
      .sorted(Ordering[Long].reverse).take(k).toArray
    top.put(merged)
    merged.iterator.zipWithIndex.map { case (v, i) =>
      RankedValue(key, i + 1, v)
    }
  }

  /** Bounded streaming top-k per key on the transformWithState ListState
    * primitive — the state shape [[EmitOnChange]] (ValueState) and
    * [[GapSessions]] (ValueState + timers) don't touch: the per-key state
    * is a LIST, capped at k entries however many rows stream through, so
    * a 100 TB/day stream holds |keys| × k longs of state, never the data.
    * Each batch merges the arriving values into the retained top-k
    * (multiset semantics — duplicates count) and re-emits the current
    * ranking; every rank's value is monotone non-decreasing over time
    * (inserting a value only raises order statistics), so the converged
    * answer per (key, rank) is the max across emissions — the same
    * fixpoint rule the windowed-count replays use.
    */
  final class TopKPerKey(k: Int)
    extends StatefulProcessor[String, KeyedValue, RankedValue] {
    @transient private var top: ListState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      top = getHandle.getListState[Long]("top", Encoders.scalaLong,
        TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[KeyedValue],
                                 timers: TimerValues): Iterator[RankedValue] =
      mergeTopK(top, key, rows, k)
  }

  /** Streaming per-key top-k: see [[TopKPerKey]]. */
  def topKPerKey(rows: Dataset[KeyedValue], k: Int): Dataset[RankedValue] = {
    implicit val enc = Encoders.product[RankedValue]
    rows.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new TopKPerKey(k), TimeMode.None(),
        OutputMode.Update())
  }

  final case class TypedEvent(user: Long, ts: Timestamp, eventId: Long,
                              typ: String)
  final case class TransitionCount(user: Long, pair: String, n: Long)
  // public: the state encoder's generated code instantiates it reflectively
  final case class LastEvent(tsUs: Long, eventId: Long, typ: String)

  /** Per-user event-transition counting on the transformWithState MAP-state
    * primitive — the last state shape the other processors don't touch:
    * per key, a MapState[(from|to) pair -> count] plus a ValueState of the
    * last event seen, so each arriving event increments exactly one map
    * entry (keyed point update — what MapState exists for; a ValueState of
    * the whole matrix would rewrite |types|² entries per row). State per
    * user is bounded by |types|² + 1 however long the stream runs. Emits
    * the updated count per touched pair each batch (update semantics —
    * counts are monotone, so max per (user, pair) converges); rows are
    * sorted (ts, eventId) within the batch, matching the batch window's
    * ORDER BY, and the last-event ValueState carries the transition ACROSS
    * batches — and across a restart, where losing it would silently drop
    * one transition per user at the checkpoint boundary.
    */
  final class TransitionCounts
    extends StatefulProcessor[Long, TypedEvent, TransitionCount] {
    @transient private var last: ValueState[LastEvent] = _
    @transient private var counts: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      last = getHandle.getValueState[LastEvent]("last",
        Encoders.product[LastEvent], TTLConfig.NONE)
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[TypedEvent],
                                 timers: TimerValues): Iterator[TransitionCount] = {
      val sorted = rows.toArray.sortBy(r => (micros(r.ts), r.eventId))
      var prev = if (last.exists()) Some(last.get()) else None
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      sorted.foreach { r =>
        prev.foreach { p =>
          val pair = p.typ + "|" + r.typ
          val cur = if (counts.containsKey(pair)) counts.getValue(pair) else 0L
          counts.updateValue(pair, cur + 1)
          touched += pair
        }
        prev = Some(LastEvent(micros(r.ts), r.eventId, r.typ))
      }
      prev.foreach(last.update)
      touched.iterator.map(p => TransitionCount(key, p, counts.getValue(p)))
    }
  }

  /** Per-user transition counts via MapState: see [[TransitionCounts]]. */
  def transitionCounts(rows: Dataset[TypedEvent]): Dataset[TransitionCount] = {
    implicit val enc = Encoders.product[TransitionCount]
    rows.groupByKey(_.user)(Encoders.scalaLong)
      .transformWithState(new TransitionCounts, TimeMode.None(),
        OutputMode.Update())
  }

  /** One day-bucket of one (from|to) pair's transition count — the
    * composite map key of the WINDOWED transition matrix.
    */
  final case class PairBucket(pair: String, day: Long)

  private val TransDayUs = 86400000000L

  /** [[TransitionCounts]] with WATERMARK-BOUND RETENTION, GC'd by
    * EVENT-TIME TIMERS (round 18 — the retention discipline applied to
    * counter state, plus the one TWS surface no other processor used):
    * transition counts are NOT idempotent under redelivery, so the
    * full-redelivery touch pattern the index TTLs use to compact every
    * key at the final horizon would double-count — instead each key
    * keeps a standing GC timer re-registered at (current watermark + 1)
    * so [[handleExpiredTimer]] runs on EVERY subsequent watermark
    * advance, evicting expired buckets with NO input rows at all. That
    * is the production posture: a user who went quiet still has their
    * window drain on schedule.
    *
    * The retention rule is TIME-BUCKETED subtraction, not per-entry
    * recency: counters cannot "un-count" an expired transition, so the
    * map key is (pair, day-of-destination-event) and the windowed count
    * per pair is the sum of its in-window buckets; eviction drops whole
    * buckets below horizon = watermark − `lookbackUs`, and the arrival
    * gate refuses a transition whose DESTINATION event time fell below
    * the horizon (a transition "happens" at its destination). The
    * last-event ValueState is O(1) per user and is deliberately kept
    * across the horizon — a transition whose source predates the window
    * but whose destination is inside it IS an in-window transition.
    *
    * State per user is |types|² × the window's day count, however long
    * the stream runs; per-arrival work is one keyed bucket update;
    * eviction is O(resident buckets) per firing. Emissions carry each
    * touched pair's current WINDOWED total (non-monotone under eviction
    * — the converged answer is the store, read after the final timer
    * firing compacts every key at the final horizon).
    */
  final class TransitionCountsTtl(lookbackUs: Long)
    extends StatefulProcessor[Long, TypedEvent, TransitionCount] {
    @transient private var last: ValueState[LastEvent] = _
    @transient private var counts: MapState[PairBucket, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      last = getHandle.getValueState[LastEvent]("last",
        Encoders.product[LastEvent], TTLConfig.NONE)
      counts = getHandle.getMapState[PairBucket, Long]("buckets",
        Encoders.product[PairBucket], Encoders.scalaLong, TTLConfig.NONE)
    }
    private def evict(horizonUs: Long): Unit = {
      val dead = scala.collection.mutable.ArrayBuffer.empty[PairBucket]
      counts.iterator().foreach { case (b, _) =>
        if (b.day * TransDayUs < horizonUs) dead += b
      }
      dead.foreach(counts.removeKey)
    }
    /** Keep exactly one standing timer, armed to fire at the next
      * watermark advance — the GC heartbeat.
      */
    private def rearm(timers: TimerValues): Unit = {
      val next = timers.getCurrentWatermarkInMs() + 1
      val existing = getHandle.listTimers().toSeq
      if (!existing.contains(next)) {
        existing.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(next)
      }
    }
    override def handleInputRows(key: Long, rows: Iterator[TypedEvent],
                                 timers: TimerValues): Iterator[TransitionCount] = {
      val horizonUs = timers.getCurrentWatermarkInMs() * 1000L - lookbackUs
      evict(horizonUs)
      val sorted = rows.toArray.sortBy(r => (micros(r.ts), r.eventId))
      var prev = if (last.exists()) Some(last.get()) else None
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      sorted.foreach { r =>
        val tsUs = micros(r.ts)
        prev.foreach { p =>
          // the gate: a transition lands in its DESTINATION's bucket,
          // and a below-horizon destination is out of retention
          if (tsUs >= horizonUs) {
            val b = PairBucket(p.typ + "|" + r.typ, tsUs / TransDayUs)
            val cur = if (counts.containsKey(b)) counts.getValue(b) else 0L
            counts.updateValue(b, cur + 1)
            touched += b.pair
          }
        }
        prev = Some(LastEvent(tsUs, r.eventId, r.typ))
      }
      prev.foreach(last.update)
      rearm(timers)
      // each touched pair's current WINDOWED total (Σ resident buckets)
      val totals = scala.collection.mutable.Map.empty[String, Long]
      counts.iterator().foreach { case (b, n) =>
        if (touched(b.pair)) totals(b.pair) = totals.getOrElse(b.pair, 0L) + n
      }
      touched.iterator.map(p => TransitionCount(key, p, totals(p)))
    }
    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[TransitionCount] = {
      evict(timers.getCurrentWatermarkInMs() * 1000L - lookbackUs)
      rearm(timers)
      Iterator.empty
    }
  }

  /** Windowed per-user transition counts with timer-driven GC: see
    * [[TransitionCountsTtl]]. The caller must `.withWatermark` an
    * event-time column on `rows` first.
    */
  def transitionCountsTtl(rows: Dataset[TypedEvent],
                          lookbackUs: Long): Dataset[TransitionCount] = {
    implicit val enc = Encoders.product[TransitionCount]
    rows.groupByKey(_.user)(Encoders.scalaLong)
      .transformWithState(new TransitionCountsTtl(lookbackUs),
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** One document's term-frequency contribution to one shingle hash's
    * posting list — computed ROW-LOCALLY from the wire document (a doc's
    * tf vector is a fact about that doc alone), so the postings build
    * needs no pre-index aggregation.
    */
  final case class DocTerm(h: Long, docId: Long, tf: Long)
  /** One committed posting: doc `docId` carries shingle `h` `tf` times. */
  final case class PostingRow(h: Long, docId: Long, tf: Long)

  /** Online inverted postings index (round-15 verdict ask #8 — the
    * lexical twin of [[CellAnnIndex]]): per shingle hash, a
    * MapState[doc_id → tf] IS the posting list — df is the map's size,
    * tf its entries — updated as documents stream in. FIRST DELIVERY
    * WINS: a redelivered document's terms find their doc_id already
    * present and change nothing (a doc's tf is immutable once written —
    * re-adding it would double df and corrupt every score downstream),
    * which is exactly the redelivery-absorption contract the replay
    * proves across its restart. Emits each posting ONCE, at insert
    * (update semantics; the out-topic converged set IS the postings
    * table).
    *
    * Scale shape: state is the postings list itself — Σ|doc terms| rows
    * corpus-wide, partitioned by hash in the RocksDB store (the hottest
    * stopword shingle is one key's map, bounded by the df cap the
    * scoring applies anyway); work per arrival is |doc terms| keyed
    * point-lookups. The index is offline-auditable through the same
    * `format("statestore")` MapState surface state_inspect_map reads.
    */
  final class PostingsIndex
    extends StatefulProcessor[Long, DocTerm, PostingRow] {
    @transient private var tfs: MapState[Long, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      tfs = getHandle.getMapState[Long, Long]("postings",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[DocTerm],
                                 timers: TimerValues): Iterator[PostingRow] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[PostingRow]
      rows.foreach { r =>
        if (!tfs.containsKey(r.docId)) {
          tfs.updateValue(r.docId, r.tf)
          out += PostingRow(key, r.docId, r.tf)
        }
      }
      out.iterator
    }
  }

  /** Streaming postings build via MapState: see [[PostingsIndex]]. */
  def postingsIndex(rows: Dataset[DocTerm]): Dataset[PostingRow] = {
    implicit val enc = Encoders.product[PostingRow]
    rows.groupByKey(_.h)(Encoders.scalaLong)
      .transformWithState(new PostingsIndex, TimeMode.None(),
        OutputMode.Update())
  }

  /** [[DocTerm]] plus the document's event time — the wire row of the
    * RETENTION-WINDOWED postings build. */
  final case class DocTermTs(h: Long, docId: Long, tf: Long, tsUs: Long)
  /** One windowed posting: the tf plus the document's event time the
    * eviction compares against. */
  final case class PostingTs(tf: Long, ts: Long)

  /** [[PostingsIndex]] with WATERMARK-BOUND RETENTION — the
    * freshness-bounded search index (a news-style deployment indexes
    * the last N days, not the crawl's history): each posting carries
    * its document's event time, and at BATCH START every touched
    * posting list drops entries older than horizon = watermark −
    * `lookbackUs`. Unlike the as-of index there is no representative
    * to keep — an evicted document is simply out of the corpus window,
    * and df/N/ranking all shift to the windowed corpus, which is
    * exactly the contract the windowed batch oracle recomputes. The
    * same arrival gate as [[AsOfIndexTtl]] refuses below-horizon
    * documents, so a redelivered copy of an evicted doc can never
    * re-inflate the store (first-delivery containsKey cannot see
    * evicted ids). State per shingle is the WINDOW's postings, however
    * long the stream runs; eviction cost is O(resident) per touched
    * key — the same scan the full-redelivery touch pattern already
    * pays. Requires TimeMode.EventTime; before any watermark exists the
    * horizon sits below every plausible ts and both mechanisms are
    * no-ops (the unpruned index's behavior).
    */
  final class PostingsIndexTtl(lookbackUs: Long)
    extends StatefulProcessor[Long, DocTermTs, PostingRow] {
    @transient private var tfs: MapState[Long, PostingTs] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      tfs = getHandle.getMapState[Long, PostingTs]("postings",
        Encoders.scalaLong, Encoders.product[PostingTs], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[DocTermTs],
                                 timers: TimerValues): Iterator[PostingRow] = {
      val horizonUs = timers.getCurrentWatermarkInMs() * 1000L - lookbackUs
      val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
      tfs.iterator().foreach { case (docId, p) =>
        if (p.ts < horizonUs) dead += docId
      }
      dead.foreach(tfs.removeKey)
      val out = scala.collection.mutable.ArrayBuffer.empty[PostingRow]
      rows.foreach { r =>
        if (r.tsUs >= horizonUs && !tfs.containsKey(r.docId)) {
          tfs.updateValue(r.docId, PostingTs(r.tf, r.tsUs))
          out += PostingRow(key, r.docId, r.tf)
        }
      }
      out.iterator
    }
  }

  /** Streaming windowed postings build: see [[PostingsIndexTtl]]. The
    * caller must `.withWatermark` an event-time column on `rows` first.
    */
  def postingsIndexTtl(rows: Dataset[DocTermTs],
                       lookbackUs: Long): Dataset[PostingRow] = {
    implicit val enc = Encoders.product[PostingRow]
    rows.groupByKey(_.h)(Encoders.scalaLong)
      .transformWithState(new PostingsIndexTtl(lookbackUs),
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** One quality-surviving document heading into the online corpus
    * build: its content fingerprint (the exact-dedup key), identity,
    * and row-locally computed benchmark-shingle hit count.
    */
  final case class CorpusDoc(fp: String, docId: Long, source: String,
                             nHits: Long)

  /** Online canonical-per-fingerprint dedup — the keep-min stage of the
    * composed corpus build ([[graft.operators.TextSuite]]'s
    * train_corpus) run as a stream: per content fingerprint, a
    * ValueState holds the smallest doc_id seen, and a document is
    * emitted ONLY when it becomes its fingerprint's canonical (strictly
    * smaller than the held min). Within a micro-batch the key's rows
    * reduce to their batch-min FIRST, so intra-batch arrival order can
    * never emit a non-canonical doc; across batches the doc_id-ordered
    * waves make the first emission final, and a redelivered wave finds
    * every fingerprint's min already at-or-below its ids — absorbed
    * silently. The emission stream is therefore EXACTLY one doc per
    * fingerprint — a recovered-state failure after the mid-stream
    * restart would emit a second doc for some fingerprint, which the
    * replay's finish refuses loudly (and the oracle hash would catch
    * regardless).
    *
    * Scale shape: state is one long per distinct fingerprint —
    * the dedup key space, not the corpus; per-arrival work is one keyed
    * point-lookup. Emissions are suppressed at the index, so downstream
    * stages see the deduped stream, never the raw one.
    */
  final class CanonicalFirst
    extends StatefulProcessor[String, CorpusDoc, CorpusDoc] {
    @transient private var min: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      min = getHandle.getValueState[Long]("canonicalMin",
        Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[CorpusDoc],
                                 timers: TimerValues): Iterator[CorpusDoc] = {
      val batchMin = rows.minBy(_.docId)
      val cur = if (min.exists()) min.get() else Long.MaxValue
      if (batchMin.docId < cur) {
        min.update(batchMin.docId)
        Iterator.single(batchMin)
      } else Iterator.empty
    }
  }

  /** Streaming canonical dedup via the fingerprint ValueState: see
    * [[CanonicalFirst]].
    */
  def canonicalFirst(rows: Dataset[CorpusDoc]): Dataset[CorpusDoc] = {
    implicit val enc = Encoders.product[CorpusDoc]
    rows.groupByKey(_.fp)(Encoders.STRING)
      .transformWithState(new CanonicalFirst, TimeMode.None(),
        OutputMode.Update())
  }

  /** [[CorpusDoc]] with its event time riding along — the wire shape of
    * the retention-windowed corpus build. `ok` marks a CANDIDATE row
    * (quality-passing): rows with ok = false still flow to the
    * processor as CLOCK/compaction arrivals but never contend for
    * canonical. The flag exists because the quality gate must NOT be a
    * filter upstream of the watermark: Catalyst pushes a deterministic
    * filter below the EventTimeWatermark node, so the watermark would
    * track only quality-PASSING event times — measured on sf0.001,
    * where the corpus' last doc fails quality and the stalled watermark
    * left the horizon one day short of the retention contract.
    */
  final case class CorpusDocTs(fp: String, docId: Long, source: String,
                               nHits: Long, tsUs: Long, ok: Boolean)
  /** The windowed canonical resident for one fingerprint. */
  final case class CanonicalTs(docId: Long, tsUs: Long)

  /** [[CanonicalFirst]] with WATERMARK-BOUND RETENTION — the windowed
    * corpus dedup a year-long deployment actually runs (round-17
    * verdict ask #3: the unbounded variant holds one ValueState per
    * distinct fingerprint FOREVER — correct for global dedup, unbounded
    * on an unbounded key space). Retention redefines "canonical" to the
    * lookback window: per fingerprint the resident is the smallest
    * in-window doc, and a doc is emitted exactly when it becomes its
    * fingerprint's windowed canonical.
    *
    * The same two mechanics as [[PostingsIndexTtl]] keep the bound
    * real: at BATCH START every touched key whose resident's event time
    * fell below horizon = watermark − `lookbackUs` clears its state
    * (the old canonical is out of the corpus window — a LATER doc with
    * the same content is genuinely new corpus material and re-emits);
    * and the ARRIVAL GATE refuses below-horizon rows, so a redelivered
    * copy of an evicted doc can never re-enter or re-emit. Within a
    * batch the key's gate-passing rows reduce to their min FIRST
    * (intra-batch arrival order can never emit a non-canonical), and
    * across batches the doc_id-ordered waves + first-emission-wins make
    * redeliveries of the RESIDENT absorb silently (redelivered id is
    * never < the held min).
    *
    * State per fingerprint is ONE (docId, ts) pair, held only while
    * the canonical is inside the window — state is bounded by the
    * window's distinct-fingerprint count, not the stream's. Requires
    * TimeMode.EventTime; before any watermark exists the horizon sits
    * below every plausible ts and both mechanisms are no-ops (the
    * unpruned [[CanonicalFirst]] behavior).
    */
  final class CanonicalFirstTtl(lookbackUs: Long)
    extends StatefulProcessor[String, CorpusDocTs, CorpusDocTs] {
    @transient private var canon: ValueState[CanonicalTs] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      canon = getHandle.getValueState[CanonicalTs]("canonical",
        Encoders.product[CanonicalTs], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[CorpusDocTs],
                                 timers: TimerValues): Iterator[CorpusDocTs] = {
      val horizonUs = timers.getCurrentWatermarkInMs() * 1000L - lookbackUs
      // eviction first, so this batch's rows contend against the
      // WINDOWED resident, not an expired one
      if (canon.exists() && canon.get().tsUs < horizonUs) canon.clear()
      // candidates only (clock rows already did their job by advancing
      // the watermark and triggering this key's compaction), inside the
      // window (the arrival gate)
      val passing = rows.filter(r => r.ok && r.tsUs >= horizonUs)
      if (!passing.hasNext) Iterator.empty
      else {
        val batchMin = passing.minBy(_.docId)
        val cur = if (canon.exists()) canon.get().docId else Long.MaxValue
        if (batchMin.docId < cur) {
          canon.update(CanonicalTs(batchMin.docId, batchMin.tsUs))
          Iterator.single(batchMin)
        } else Iterator.empty
      }
    }
  }

  /** Streaming windowed canonical dedup: see [[CanonicalFirstTtl]]. The
    * caller must `.withWatermark` an event-time column on `rows` first.
    */
  def canonicalFirstTtl(rows: Dataset[CorpusDocTs],
                        lookbackUs: Long): Dataset[CorpusDocTs] = {
    implicit val enc = Encoders.product[CorpusDocTs]
    rows.groupByKey(_.fp)(Encoders.STRING)
      .transformWithState(new CanonicalFirstTtl(lookbackUs),
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** One wire row for [[asOfIndex]]: a dimension REVISION (isProbe =
    * false: id = revision id, ts = its validity instant, price = its
    * payload) or a fact PROBE (isProbe = true: id = fact id, ts = the
    * fact's event time, price unused).
    */
  final case class AsOfRow(key: Long, isProbe: Boolean, id: Long, ts: Long,
                           price: Double)
  /** One dimension revision resident in the index. */
  final case class AsOfRev(ts: Long, price: Double)
  /** One enriched fact: the as-of matched revision (None when no
    * revision exists at or before the fact's ts — LEFT semantics).
    */
  final case class AsOfHit(key: Long, eventId: Long, ts: Long,
                           orderKey: Option[Long], price: Option[Double])

  /** Online AS-OF JOIN index — the temporal-enrichment serving shape
    * (each fact attached to the most recent dimension revision at or
    * before its event time; [[graft.operators.AsOf]] computes it in
    * batch): per join key, a MapState[revision id → (ts, payload)] IS
    * the dimension's revision history, built as revisions stream in.
    * FIRST DELIVERY WINS (a revision is immutable once written — the
    * PostingsIndex contract), so a redelivered revision wave is absorbed
    * by recovered map entries. A PROBE row answers from the key's
    * resident revisions: max (ts, id) among revisions with ts ≤ probe
    * ts — the batch kernel's exact tie order (greatest ts, then greatest
    * id) — or None under LEFT semantics. Probes publish in a later
    * incarnation than revisions, so batch-internal row order can never
    * race an enrichment against the revision it needs.
    *
    * Scale shape: state is the dimension itself — Σ\|revisions\| rows
    * partitioned by join key in RocksDB, bounded by the DIMENSION, not
    * the fact stream; per-revision work is one keyed point-lookup and
    * per-probe work scans ONE key's revision list. The production
    * deployment runs [[AsOfIndexTtl]] — the watermark-bound retention
    * variant that SCD-compacts each key to the lookback window (round-17;
    * stream_asof_ttl proves answers unchanged inside the horizon) — so
    * the list stays a bounded recent history; this unpruned variant is
    * the retention-free reference the TTL twin must match. The index is
    * offline-auditable through the same `format("statestore")` MapState
    * surface the postings audit reads.
    */
  /** The probe answer: max (ts, id) among resident revisions with
    * ts ≤ the probe's ts — ONE definition shared by [[AsOfIndex]] and
    * [[AsOfIndexTtl]], so the pruned variant cannot drift from the
    * oracle-pinned tie order (greatest ts, then greatest id).
    */
  private def asOfProbe(revs: MapState[Long, AsOfRev],
                        r: AsOfRow): AsOfHit = {
    var bestId = Long.MinValue
    var bestTs = Long.MinValue
    var bestPrice = 0.0
    var found = false
    revs.iterator().foreach { case (id, rev) =>
      if (rev.ts <= r.ts &&
        (!found || rev.ts > bestTs || (rev.ts == bestTs && id > bestId))) {
        found = true; bestId = id; bestTs = rev.ts; bestPrice = rev.price
      }
    }
    AsOfHit(key = r.key, eventId = r.id, ts = r.ts,
      orderKey = if (found) Some(bestId) else None,
      price = if (found) Some(bestPrice) else None)
  }

  final class AsOfIndex extends StatefulProcessor[Long, AsOfRow, AsOfHit] {
    @transient private var revs: MapState[Long, AsOfRev] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      revs = getHandle.getMapState[Long, AsOfRev]("revisions",
        Encoders.scalaLong, Encoders.product[AsOfRev], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[AsOfRow],
                                 timers: TimerValues): Iterator[AsOfHit] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[AsOfHit]
      rows.foreach { r =>
        if (!r.isProbe) {
          if (!revs.containsKey(r.id)) revs.updateValue(r.id, AsOfRev(r.ts, r.price))
        } else out += asOfProbe(revs, r)
      }
      out.iterator
    }
  }

  /** [[AsOfIndex]] with WATERMARK-BOUND RETENTION — the production
    * eviction variant the base index's scaladoc promises ("prunes
    * revisions older than the watermark minus the maximum lookback"),
    * closing the TTL-NONE posture the round-16 verdict flagged
    * (unbounded revision history per key on an unbounded stream).
    *
    * The retention rule is SCD compaction, not naive deletion: with
    * horizon H = watermark − `lookbackUs`, each key retains every
    * revision with ts ≥ H PLUS the single newest revision below H (max
    * ts, then max id — the probe tie order). Any probe with ts ≥ H
    * therefore answers IDENTICALLY to the unpruned index — ASSUMING no
    * revision's FIRST delivery arrives more than the lookback behind
    * the watermark (the standard streaming late-data caveat, ADVICE
    * r17: the arrival gate below cannot distinguish such a late first
    * delivery from a redelivery of an evicted id, and refusing it is
    * what keeps the bound real). Under that assumption the match is
    * either a retained recent revision or exactly the kept
    * representative; naive prune-all-below-H would instead null out
    * every probe whose key has been quiet since before the horizon.
    * Probes older than the horizon are outside the retention contract
    * (they would race the eviction in any design).
    *
    * Two mechanics keep the bound real on an unbounded stream:
    * compaction runs at BATCH START for every touched key (so probe
    * answers in the same batch come from the already-pruned map — the
    * replay proves answers unchanged by redelivering all probes after
    * the watermark advances), and a revision ARRIVING below the horizon
    * is dropped on arrival — without that, a redelivered copy of an
    * evicted revision would re-inflate the store forever (the
    * containsKey first-delivery guard cannot see evicted ids).
    *
    * Scale shape: state per key is the lookback window's revisions + 1,
    * however long the stream runs; the compaction scan is O(resident)
    * per touched key — the same cost the probe scan already pays.
    * Requires TimeMode.EventTime (a watermarked input); before any
    * watermark exists, `getCurrentWatermarkInMs` is 0 and the horizon
    * sits below every plausible ts — compaction and the arrival gate
    * are no-ops, exactly the unpruned index's behavior.
    */
  final class AsOfIndexTtl(lookbackUs: Long)
    extends StatefulProcessor[Long, AsOfRow, AsOfHit] {
    @transient private var revs: MapState[Long, AsOfRev] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      revs = getHandle.getMapState[Long, AsOfRev]("revisions",
        Encoders.scalaLong, Encoders.product[AsOfRev], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[AsOfRow],
                                 timers: TimerValues): Iterator[AsOfHit] = {
      val horizonUs = timers.getCurrentWatermarkInMs() * 1000L - lookbackUs
      // SCD compaction first, so this batch's probes answer from the
      // pruned map: drop every revision below the horizon EXCEPT the
      // newest one (max ts, then max id)
      var repId = Long.MinValue
      var repTs = Long.MinValue
      val below = scala.collection.mutable.ArrayBuffer.empty[Long]
      revs.iterator().foreach { case (id, rev) =>
        if (rev.ts < horizonUs) {
          below += id
          if (rev.ts > repTs || (rev.ts == repTs && id > repId)) {
            repTs = rev.ts; repId = id
          }
        }
      }
      below.foreach(id => if (id != repId) revs.removeKey(id))
      val out = scala.collection.mutable.ArrayBuffer.empty[AsOfHit]
      rows.foreach { r =>
        if (!r.isProbe) {
          // arrival gate: a revision below the horizon is out of
          // retention — inserting it (e.g. a redelivery of an evicted
          // id) would re-inflate the store the compaction just bounded
          if (r.ts >= horizonUs && !revs.containsKey(r.id))
            revs.updateValue(r.id, AsOfRev(r.ts, r.price))
        } else out += asOfProbe(revs, r)
      }
      out.iterator
    }
  }

  /** Streaming as-of enrichment via the revision MapState: see
    * [[AsOfIndex]].
    */
  def asOfIndex(rows: Dataset[AsOfRow]): Dataset[AsOfHit] = {
    implicit val enc = Encoders.product[AsOfHit]
    rows.groupByKey(_.key)(Encoders.scalaLong)
      .transformWithState(new AsOfIndex, TimeMode.None(),
        OutputMode.Update())
  }

  /** Streaming as-of enrichment with watermark-bound retention: see
    * [[AsOfIndexTtl]]. The caller must `.withWatermark` an event-time
    * column on `rows` first — TimeMode.EventTime requires it, and the
    * watermark is what drives the horizon.
    */
  def asOfIndexTtl(rows: Dataset[AsOfRow],
                   lookbackUs: Long): Dataset[AsOfHit] = {
    implicit val enc = Encoders.product[AsOfHit]
    rows.groupByKey(_.key)(Encoders.scalaLong)
      .transformWithState(new AsOfIndexTtl(lookbackUs),
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** Input row for [[gapSessions]]: one keyed event-time stamp. */
  final case class Stamp(user: Long, ts: Timestamp)
  /** One closed gap-session: [startUs, lastUs] in epoch MICROS (exact —
    * sub-millisecond gaps must compare identically to the session_window /
    * gap-islands oracle, and Timestamp.getTime would truncate to ms).
    * `end` is the session CLOSE instant (lastEvent + gap) as a
    * TimestampType column, fit to serve as the EVENT-TIME column of a
    * downstream stateful operator (the chained-stateful-operators surface,
    * [[gapSessionsChained]]). The close instant — not the start — is the
    * only emission-time-safe choice: a session emits in the FIRST batch
    * whose watermark passes its close (by timer, or inline where the
    * timer would otherwise still be pending), so `end` is always >= the
    * previous batch's watermark — exactly the one-batch-lag late-event
    * bound chained operators filter against — while `start` can be
    * arbitrarily far behind it.
    */
  final case class GapClosed(user: Long, startUs: Long, nEvents: Long,
                             end: Timestamp)

  private def tsFromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000)
    t.setNanos(((us % 1000000L) * 1000).toInt)
    t
  }
  // public: the state encoder's generated code instantiates it reflectively
  final case class GapState(startUs: Long, lastUs: Long, n: Long, timerMs: Long)

  private def micros(ts: Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000

  /** Gap-based sessionization on the transformWithState processor API with
    * EVENT-TIME TIMERS — the one lifecycle piece [[EmitOnChange]] (pure
    * ValueState) and [[sessionStats]] (GroupState timeouts) don't cover:
    * `registerTimer`/`deleteTimer`/`handleExpiredTimer` against the
    * event-time watermark, checkpointed and RECOVERED with the rest of the
    * state. Semantically identical to `session_window(ts, gap)` in append
    * mode — that's the point: the built-in and the hand-built processor
    * must agree, so the same gap-islands oracle checks both.
    *
    * Lifecycle per key: rows extend the open session and (re-)arm one
    * timer at lastEvent + gap; a row STRICTLY past lastEvent + gap closes
    * the session INLINE (emitting it) and disarms the stale timer — a row
    * AT the exact boundary EXTENDS, matching the built-in session_window,
    * whose sessions merge when the next start equals the previous end
    * (empirically pinned by GapSessionPropertySpec's boundary generator); a session
    * with no successor row is closed BY THE TIMER when the watermark
    * passes lastEvent + gap — exactly-once either way, because the inline
    * path deletes the timer it supersedes and the timer path only fires
    * for the armed timestamp it matches. State is one GapState per key
    * (plus one registered timer), evicted on close — the bounded-state
    * posture; within-batch rows for a key are sorted in memory, bounded by
    * one key's rows in one micro-batch.
    *
    * Gap arithmetic runs in MICROS (matching session_window exactly);
    * timers are millisecond-granular, so each is armed at the CEILING ms
    * of the true close instant — never early, and a sub-ms-late timer is
    * harmless because an event inside the gap would have arrived before
    * the watermark passed it.
    */
  final class GapSessions(gapUs: Long)
    extends StatefulProcessor[Long, Stamp, GapClosed] {
    @transient private var sess: ValueState[GapState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[GapState]("sess",
        Encoders.product[GapState], TTLConfig.NONE)

    private def arm(s: GapState): GapState = {
      // STRICTLY past the boundary (not just the ceiling): an on-time row
      // at exactly lastEvent + gap extends the session, so the timer must
      // not fire while such a row can still arrive (ts == watermark
      // passes the late filter)
      val closeMs = (s.lastUs + gapUs) / 1000 + 1
      if (s.timerMs != closeMs) {
        if (s.timerMs > 0) getHandle.deleteTimer(s.timerMs)
        getHandle.registerTimer(closeMs)
      }
      s.copy(timerMs = closeMs)
    }

    override def handleInputRows(key: Long, rows: Iterator[Stamp],
                                 timers: TimerValues): Iterator[GapClosed] = {
      val sorted = rows.map(r => micros(r.ts)).toArray.sorted
      var closed = List.empty[GapClosed]
      var cur = if (sess.exists()) Some(sess.get()) else None
      sorted.foreach { us =>
        cur match {
          case Some(s) if us > s.lastUs + gapUs =>
            closed ::= GapClosed(key, s.startUs, s.n, tsFromMicros(s.lastUs + gapUs))
            if (s.timerMs > 0) getHandle.deleteTimer(s.timerMs)
            cur = Some(GapState(us, us, 1, 0))
          case Some(s) =>
            cur = Some(s.copy(lastUs = math.max(s.lastUs, us), n = s.n + 1))
          case None =>
            cur = Some(GapState(us, us, 1, 0))
        }
      }
      cur.foreach(s => sess.update(arm(s)))
      closed.reverseIterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[GapClosed] = {
      if (sess.exists()) {
        val s = sess.get()
        // fire only for the armed timer; a stale expiry racing an inline
        // close-and-reopen in the same batch must not close the NEW session
        if (info.getExpiryTimeInMs() == s.timerMs) {
          sess.clear()
          return Iterator.single(GapClosed(key, s.startUs, s.n, tsFromMicros(s.lastUs + gapUs)))
        }
      }
      Iterator.empty
    }
  }

  /** Sessionize by inactivity gap via event-time timers: see
    * [[GapSessions]]. Caller must `.withWatermark` the input first
    * (TimeMode.EventTime requires it).
    */
  def gapSessions(rows: Dataset[Stamp], gapUs: Long): Dataset[GapClosed] = {
    implicit val enc = Encoders.product[GapClosed]
    rows.groupByKey(_.user)(Encoders.scalaLong)
      .transformWithState(new GapSessions(gapUs), TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** [[gapSessions]] via the CHAINED-stateful-operators overload: the
    * processor's `end` output column is declared the new EVENT-TIME
    * column (`transformWithState(proc, eventTimeColumnName, mode)`), so a
    * SECOND stateful operator — a windowed aggregate, another processor —
    * can legally follow in the same append-mode query, with the watermark
    * re-derived from the emitted column. This is the Spark 4 surface that
    * lifts the one-stateful-operator-per-query restriction; without it,
    * session-then-aggregate needs two queries bridged by a topic (the
    * stream_suppress topology).
    */
  def gapSessionsChained(rows: Dataset[Stamp], gapUs: Long): Dataset[GapClosed] = {
    implicit val enc = Encoders.product[GapClosed]
    rows.groupByKey(_.user)(Encoders.scalaLong)
      .transformWithState(new GapSessions(gapUs), "end", OutputMode.Append())
  }

  final case class TopKSeed(key: String, values: Seq[Long])

  /** [[TopKPerKey]] with INITIAL STATE — the state-bootstrap surface
    * (`StatefulProcessorWithInitialState`): a batch job over history
    * computes each key's top-k once, the streaming job starts FROM that
    * state and consumes only the live tail. This is the state-level
    * analogue of the backfill-union replay's additive merge: there the
    * RESULTS merge downstream; here the STATE itself is seeded, which is
    * the only option when the operator's output isn't mergeable (a top-k
    * list is not additive across halves unless the state carries over).
    * `handleInitialState` runs once per seeded key before any input row;
    * input batches then merge into the seeded list exactly as the
    * unseeded processor does.
    */
  final class TopKBootstrap(k: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
      String, KeyedValue, RankedValue, TopKSeed] {
    @transient private var top: ListState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      top = getHandle.getListState[Long]("top", Encoders.scalaLong,
        TTLConfig.NONE)
    override def handleInitialState(key: String, initial: TopKSeed,
                                    timers: TimerValues): Unit =
      top.put(initial.values.sorted(Ordering[Long].reverse).take(k).toArray)
    override def handleInputRows(key: String, rows: Iterator[KeyedValue],
                                 timers: TimerValues): Iterator[RankedValue] =
      mergeTopK(top, key, rows, k)
  }

  /** Streaming top-k seeded from a batch snapshot: see [[TopKBootstrap]]. */
  def topKBootstrapped(rows: Dataset[KeyedValue],
                       seed: Dataset[TopKSeed], k: Int): Dataset[RankedValue] = {
    implicit val out = Encoders.product[RankedValue]
    implicit val st = Encoders.product[TopKSeed]
    rows.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new TopKBootstrap(k), TimeMode.None(),
        OutputMode.Update(), seed.groupByKey(_.key)(Encoders.STRING))
  }

  final case class HourCount(etype: String, hourS: Long, cnt: Long)
  final case class HourScore(event_type: String, hour_s: Long, cnt: Long,
                             z: Option[Double], is_anomaly: Option[Boolean])
  // public: the state encoder's generated code instantiates it reflectively
  final case class HourBucket(hourS: Long, cnt: Long)

  /** Streaming trailing-window z-score — the stateful twin of the batch
    * `rolling_zscore` window query: per key, a ListState buffer holds the
    * last `baseline` FINALIZED hours (append-mode windowed counts arrive
    * exactly once per hour, in nondecreasing hour order across batches —
    * the watermark only moves forward — and are sorted within a batch);
    * each arriving hour is scored against the buffered 24 BEFORE being
    * appended, exactly the ROWS 24 PRECEDING .. 1 PRECEDING frame. Rows
    * with a partial baseline emit nothing (the batch filters n_base = 24)
    * and a zero-variance baseline scores NULL, never a division. State is
    * |keys| x 24 pairs of longs however long the stream runs. The z
    * arithmetic replays the batch expression tree operand-for-operand
    * (integer sums, one IEEE division each, sqrt), so the streamed
    * doubles hash-match the batch and the DuckDB oracle bit-for-bit.
    */
  final class RollingZscore(baseline: Int)
    extends StatefulProcessor[String, HourCount, HourScore] {
    @transient private var buf: ListState[HourBucket] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[HourBucket]("buf",
        Encoders.product[HourBucket], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[HourCount],
                                 timers: TimerValues): Iterator[HourScore] = {
      var window = buf.get().toSeq
      val out = rows.toSeq.sortBy(_.hourS).flatMap { hc =>
        val scored = if (window.size >= baseline) {
          val base = window.takeRight(baseline)
          val n = base.size.toLong
          val s = base.map(_.cnt).sum
          val ss = base.map(b => b.cnt * b.cnt).sum
          val variance = (n * ss - s * s).toDouble / (n * n).toDouble
          val z =
            if (variance > 0)
              Some((hc.cnt.toDouble - s.toDouble / n.toDouble) /
                math.sqrt(variance))
            else None
          Some(HourScore(key, hc.hourS, hc.cnt, z,
            z.map(v => math.abs(v) > 3.0)))
        } else None
        window = (window :+ HourBucket(hc.hourS, hc.cnt)).takeRight(baseline)
        scored
      }
      buf.put(window.toArray)
      out.iterator
    }
  }

  /** Streaming rolling z-score: see [[RollingZscore]]. */
  def rollingZscoreStream(rows: Dataset[HourCount],
                          baseline: Int = 24): Dataset[HourScore] = {
    implicit val enc = Encoders.product[HourScore]
    rows.groupByKey(_.etype)(Encoders.STRING)
      .transformWithState(new RollingZscore(baseline), TimeMode.None(),
        OutputMode.Update())
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

  /** One document's membership in one LSH bucket: the wire row of the
    * streaming near-dup index after band explosion. `band` rides along so
    * a bucket-VALUE collision across two different bands can never merge
    * two unrelated buckets (the group key is (band, bucket), matching the
    * batch candidate join's `a.band = b.band AND a.bucket = b.bucket`).
    */
  final case class BandDoc(band: Int, bucket: Long, docId: Long,
                           sig: Seq[Long])
  // public: the state encoder's generated code instantiates it reflectively
  final case class IndexedDoc(docId: Long, sig: Seq[Long])
  /** One detected near-duplicate: `docId` (the LARGER id of the pair — the
    * "later" document under the deterministic doc_id arrival order) is a
    * near-dup of `dupOf`, with `agree` of the 64 signature positions equal.
    */
  final case class NearDupHit(docId: Long, dupOf: Long, agree: Int)

  /** Streaming MinHash-LSH near-dup detection — the online twin of
    * Dedup.minhashPairs: documents arrive over the wire as (doc_id,
    * 64-perm signature), fan out to their 16 band buckets, and each
    * (band, bucket) group keeps a ListState INDEX of every signature it
    * has seen. Each arriving document is scored against the bucket's
    * whole index (signature agreement — pure integer position
    * comparisons), and every pair with >= `minAgree` of 64 positions
    * equal emits a hit carrying the pair's LARGER doc_id. Because every
    * arrival is compared against ALL resident entries, the emitted pair
    * set is ARRIVAL-ORDER INDEPENDENT — (a,b) is scored exactly when the
    * later-arriving one shows up, whichever that is — so the converged
    * distinct hit set equals the batch candidate join exactly, and no
    * ordering assumption on the source is needed.
    *
    * Redelivery-safe: a doc_id already resident in the bucket index is
    * skipped wholesale (no re-compare, no re-append), so producer retries
    * and post-restart redelivery emit nothing new — the recovered
    * ListState, not offset tracking, is what absorbs the duplicates.
    *
    * Scale shape: state is the per-bucket occupancy — the online dedup
    * index itself, |docs| x tables rows corpus-wide, the same footprint
    * the batch LSH self-join shuffles per run. Work per arrival is
    * occupancy-bounded (the autoBits argument: band width sized to hold
    * occupancy constant), keyed state lives in the RocksDB store at
    * production scale, and nothing ever scans the corpus.
    */
  final class NearDupIndex(minAgree: Int)
    extends StatefulProcessor[(Int, Long), BandDoc, NearDupHit] {
    @transient private var index: ListState[IndexedDoc] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      index = getHandle.getListState[IndexedDoc]("index",
        Encoders.product[IndexedDoc], TTLConfig.NONE)
    override def handleInputRows(key: (Int, Long), rows: Iterator[BandDoc],
                                 timers: TimerValues): Iterator[NearDupHit] = {
      val resident = index.get().toArray
      val seen = scala.collection.mutable.Set(resident.map(_.docId): _*)
      val added = scala.collection.mutable.ArrayBuffer.empty[IndexedDoc]
      val hits = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
      // sorted for deterministic within-batch processing; correctness does
      // not depend on it (compare-vs-all makes the pair set order-free)
      rows.toArray.sortBy(_.docId).foreach { r =>
        // fail loudly on a malformed/truncated wire signature — a silent
        // shorter-length comparison would deflate `agree` and turn wire
        // drift into unreproducible recall loss (same guard posture as
        // lshBuckets' bands require)
        require(r.sig.length == 64,
          s"malformed wire signature for doc ${r.docId}: " +
            s"${r.sig.length} longs (expected 64)")
        if (!seen(r.docId)) {
          (resident.iterator ++ added.iterator).foreach { o =>
            var agree = 0
            var i = 0
            while (i < 64) {
              if (r.sig(i) == o.sig(i)) agree += 1
              i += 1
            }
            if (agree >= minAgree)
              hits += NearDupHit(math.max(r.docId, o.docId),
                math.min(r.docId, o.docId), agree)
          }
          added += IndexedDoc(r.docId, r.sig)
          seen += r.docId
        }
      }
      if (added.nonEmpty) index.appendList(added.toArray)
      hits.iterator
    }
  }

  /** Streaming near-dup hits per bucket-fanned document stream: see
    * [[NearDupIndex]].
    */
  def nearDupHits(rows: Dataset[BandDoc], minAgree: Int): Dataset[NearDupHit] = {
    implicit val enc = Encoders.product[NearDupHit]
    rows.groupByKey(r => (r.band, r.bucket))(
        Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .transformWithState(new NearDupIndex(minAgree), TimeMode.None(),
        OutputMode.Update())
  }

  /** [[BandDoc]] WITH its document's event time — the wire shape of the
    * windowed signature index.
    */
  final case class BandDocTs(band: Int, bucket: Long, docId: Long,
                             sig: Seq[Long], tsUs: Long)
  // public: the state encoder's generated code instantiates it reflectively
  final case class IndexedDocTs(docId: Long, sig: Seq[Long], tsUs: Long)

  /** [[NearDupIndex]] with WATERMARK-BOUND RETENTION (round-18 verdict
    * ask #1 — the first of the two last unbounded online stores): the
    * production near-dup contract becomes "a document is a duplicate if
    * it near-matches one seen within the trailing window" — a crawl
    * dedups against its recent past, not its entire history. The same
    * three mechanisms as [[CellAnnIndexTtl]], each load-bearing:
    *   - per-PROBE window: an arrival pairs only with residents whose
    *     event time is ≥ its own minus `lookbackUs` — a pure function of
    *     the two documents' event times, so the emitted pair set is
    *     batching- and restart-independent and exactly recomputable by
    *     the windowed batch oracle;
    *   - EVICTION at batch start: residents older than watermark −
    *     lookback leave the bucket list — safe because every future
    *     in-order arrival's probe window starts at or after that
    *     horizon;
    *   - ARRIVAL GATE: a below-horizon row neither inserts, nor scores,
    *     nor emits, so a redelivered copy of an evicted document cannot
    *     re-inflate the store (its bucket is still TOUCHED, which is
    *     what lets a full redelivery compact every bucket).
    * State per bucket is the WINDOW's signatures however long the
    * stream runs; the eviction scan is O(resident), the same cost the
    * probe scan already pays. Signature agreement is the same integer
    * position compare as the unpruned index. Requires TimeMode.EventTime.
    */
  final class NearDupIndexTtl(minAgree: Int, lookbackUs: Long)
    extends StatefulProcessor[(Int, Long), BandDocTs, NearDupHit] {
    @transient private var index: ListState[IndexedDocTs] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      index = getHandle.getListState[IndexedDocTs]("index",
        Encoders.product[IndexedDocTs], TTLConfig.NONE)
    override def handleInputRows(key: (Int, Long), rows: Iterator[BandDocTs],
                                 timers: TimerValues): Iterator[NearDupHit] = {
      val horizonUs = timers.getCurrentWatermarkInMs() * 1000L - lookbackUs
      val all = index.get().toArray
      val resident = all.filter(_.tsUs >= horizonUs)
      // a fully-evicted bucket must clear(), not put(): the state store
      // rejects empty list writes (the CellAnnIndexTtl posture)
      if (resident.length != all.length) {
        if (resident.isEmpty) index.clear() else index.put(resident)
      }
      val seen = scala.collection.mutable.Set(resident.map(_.docId): _*)
      val added = scala.collection.mutable.ArrayBuffer.empty[IndexedDocTs]
      val hits = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
      rows.toArray.sortBy(_.docId).foreach { r =>
        require(r.sig.length == 64,
          s"malformed wire signature for doc ${r.docId}: " +
            s"${r.sig.length} longs (expected 64)")
        if (r.tsUs >= horizonUs && !seen(r.docId)) {
          (resident.iterator ++ added.iterator)
            // the per-probe window: both directions, because compare-vs-
            // all means the later ARRIVAL scores the pair whichever id
            // is larger — the window must be a function of the two event
            // times alone (max - min), not of arrival order
            .filter(o => math.max(o.tsUs, r.tsUs)
              - math.min(o.tsUs, r.tsUs) <= lookbackUs)
            .foreach { o =>
              var agree = 0
              var i = 0
              while (i < 64) {
                if (r.sig(i) == o.sig(i)) agree += 1
                i += 1
              }
              if (agree >= minAgree)
                hits += NearDupHit(math.max(r.docId, o.docId),
                  math.min(r.docId, o.docId), agree)
            }
          added += IndexedDocTs(r.docId, r.sig, r.tsUs)
          seen += r.docId
        }
      }
      if (added.nonEmpty) index.appendList(added.toArray)
      hits.iterator
    }
  }

  /** Trailing-window streaming near-dup hits: see [[NearDupIndexTtl]].
    * The caller must `.withWatermark` an event-time column on `rows`
    * first.
    */
  def nearDupHitsTtl(rows: Dataset[BandDocTs], minAgree: Int,
                     lookbackUs: Long): Dataset[NearDupHit] = {
    implicit val enc = Encoders.product[NearDupHit]
    rows.groupByKey(r => (r.band, r.bucket))(
        Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .transformWithState(new NearDupIndexTtl(minAgree, lookbackUs),
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** One keyed id observation; [[DistinctPerKey]] counts distinct ids. */
  final case class KeyedId(key: Long, id: Long)
  final case class KeyCount(key: Long, n: Long)

  /** EXACT distinct-id count per key with the id set AS state — the
    * dedup-group shape: keys are content fingerprints, ids are the
    * members that collide on them, so state per key is the dup-group
    * size (tiny), not the stream. Re-delivered ids are absorbed by the
    * set — the property that makes the count restart- and retry-exact,
    * where a naive streaming count() would double on every redelivery.
    * Counts are monotone, so max per key over the update changelog is
    * the converged answer. (For UNBOUNDED id sets per key the exact set
    * is the wrong state shape — that's approx_count_distinct's sketch,
    * covered batch-side by sketch_accuracy.)
    */
  final class DistinctPerKey
    extends StatefulProcessor[Long, KeyedId, KeyCount] {
    @transient private var seen: ListState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[Long]("seen", Encoders.scalaLong,
        TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[KeyedId],
                                 timers: TimerValues): Iterator[KeyCount] = {
      val resident = scala.collection.mutable.Set(seen.get().toSeq: _*)
      val fresh = rows.map(_.id).filterNot(resident).toArray.distinct
      if (fresh.nonEmpty) seen.appendList(fresh)
      Iterator.single(KeyCount(key, resident.size + fresh.length))
    }
  }

  /** Exact keyed distinct-count (set state): see [[DistinctPerKey]]. */
  def distinctPerKey(rows: Dataset[KeyedId]): Dataset[KeyCount] = {
    implicit val enc = Encoders.product[KeyCount]
    rows.groupByKey(_.key)(Encoders.scalaLong)
      .transformWithState(new DistinctPerKey, TimeMode.None(),
        OutputMode.Update())
  }

  /** One keyed id observation WITH its event time — the wire shape of
    * the sliding-window active-set count.
    */
  final case class ActiveId(key: String, id: Long, tsUs: Long)
  final case class ActiveCount(key: String, n: Long)

  /** Sliding-window DISTINCT-ACTIVES per key — "distinct users per
    * event type over the trailing window", the production freshness
    * twin of [[DistinctPerKey]] (round 18, extending the r17 retention
    * discipline to the remaining set-shaped state): a MapState[id →
    * latest event time] is the ACTIVE SET, and an id is active iff it
    * was seen inside the lookback window.
    *
    * Retention differs from the first-delivery indexes in ONE deliberate
    * way: an arriving id REFRESHES its recency (max of stored and
    * arriving ts) rather than being absorbed first-delivery-wins —
    * recency IS the semantics, and the refresh is idempotent under
    * redelivery (max is). Eviction at batch start drops ids whose
    * latest sighting fell below horizon = watermark − `lookbackUs`; the
    * arrival gate refuses below-horizon rows, so a redelivered copy of
    * an evicted sighting can never re-activate an id the window already
    * forgot. Per batch the key emits its updated resident count — which
    * SHRINKS when evictions outpace arrivals, so unlike the monotone
    * counts the converged answer is the STATE, not a max over the
    * update changelog (the replay's finish reads the store; a live
    * dashboard consumes the update stream).
    *
    * State per key is the WINDOW's distinct ids, however long the
    * stream runs; per-arrival work is one keyed point-lookup, eviction
    * is O(resident) per touched key. Requires TimeMode.EventTime;
    * before any watermark exists the horizon sits below every plausible
    * ts and both mechanisms are no-ops.
    */
  final class DistinctActiveTtl(lookbackUs: Long)
    extends StatefulProcessor[String, ActiveId, ActiveCount] {
    @transient private var active: MapState[Long, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      active = getHandle.getMapState[Long, Long]("active",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[ActiveId],
                                 timers: TimerValues): Iterator[ActiveCount] = {
      val horizonUs = timers.getCurrentWatermarkInMs() * 1000L - lookbackUs
      val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
      var resident = 0L
      active.iterator().foreach { case (id, ts) =>
        if (ts < horizonUs) dead += id else resident += 1
      }
      dead.foreach(active.removeKey)
      rows.foreach { r =>
        if (r.tsUs >= horizonUs) {
          if (active.containsKey(r.id)) {
            if (r.tsUs > active.getValue(r.id))
              active.updateValue(r.id, r.tsUs)
          } else {
            active.updateValue(r.id, r.tsUs)
            resident += 1
          }
        }
      }
      Iterator.single(ActiveCount(key, resident))
    }
  }

  /** Sliding-window distinct actives: see [[DistinctActiveTtl]]. The
    * caller must `.withWatermark` an event-time column on `rows` first.
    */
  def distinctActiveTtl(rows: Dataset[ActiveId],
                        lookbackUs: Long): Dataset[ActiveCount] = {
    implicit val enc = Encoders.product[ActiveCount]
    rows.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new DistinctActiveTtl(lookbackUs),
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** One cell-routed vector arrival: each wire vector fans out to its
    * `nProbe` best IVF cells; `insert` is true only at its ASSIGNED
    * (best) cell, where it joins the inverted list.
    */
  final case class CellQuery(cell: Int, vecId: Long, emb: Seq[Float],
                             insert: Boolean)
  // public: the state encoder's generated code instantiates it reflectively
  final case class CellVec(vecId: Long, emb: Seq[Float])
  /** One probed-cell ANN candidate for an arriving query vector. */
  final case class AnnHit(queryId: Long, neighborId: Long, cos: Double)

  /** Streaming IVF ANN — the online twin of Similarity.ivfTopK: each IVF
    * cell keeps its inverted list as ListState, every arriving vector is
    * scored against the resident vectors of its `nProbe` probed cells,
    * and candidates stream out as (query, neighbor, cos) for a
    * downstream exact top-k. The query semantics are ARRIVAL-ORDER
    * ANN — "neighbors among vectors that arrived before me", the online
    * retrieval contract (a vector can only match the index as of its
    * arrival) — pinned deterministically to vec_id order: only residents
    * with a SMALLER vec_id are candidates, and within a micro-batch rows
    * are processed in ascending vec_id, so the emitted candidate set is
    * a pure function of the id order however the stream is batched.
    *
    * Redelivery-safe two ways: a resident vec_id is never re-inserted,
    * and a redelivered query re-emits exactly its original candidate
    * rows (all smaller ids were already resident at first delivery — the
    * id-ordered producer guarantees it — so the recomputation is
    * identical and the downstream distinct absorbs it).
    *
    * Cosine is the engine's exact kernel arithmetic (sequential double
    * accumulation over float32 components, dot / (norm·norm) — the same
    * op order as DotProduct/norm2Native), so the streamed doubles
    * hash-match the batch oracle bit-for-bit.
    *
    * Scale shape: state is the inverted index itself — |vectors| rows
    * corpus-wide, partitioned by cell in the RocksDB store; work per
    * arrival is probed-cell occupancy, the same candidate count the
    * batch IVF join scans, and nothing ever rescans the corpus. That
    * makes total work Θ(N × occupancy): at a growing corpus, nCells
    * must scale with N to hold occupancy (and so per-arrival latency)
    * constant — the same occupancy-bounding rule embed_neardup_lsh
    * applies to its autoBits widths. The fixture run uses the batch
    * twin's 8 cells so the two sides share oracle literals.
    */
  /** The exact cosine kernel of the streaming ANN indexes — sequential
    * double accumulation over float32 components, the same op order as
    * DotProduct/norm2Native — ONE definition shared by [[CellAnnIndex]]
    * and [[CellAnnIndexTtl]] so the windowed twin cannot drift by a bit.
    */
  private def annCos(a: Seq[Float], b: Seq[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    i = 0
    while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
    i = 0
    while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
    s / (math.sqrt(na) * math.sqrt(nb))
  }

  final class CellAnnIndex
    extends StatefulProcessor[Int, CellQuery, AnnHit] {
    @transient private var index: ListState[CellVec] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      index = getHandle.getListState[CellVec]("index",
        Encoders.product[CellVec], TTLConfig.NONE)

    private def cos(a: Seq[Float], b: Seq[Float]): Double = annCos(a, b)

    override def handleInputRows(key: Int, rows: Iterator[CellQuery],
                                 timers: TimerValues): Iterator[AnnHit] = {
      val resident = index.get().toArray
      val seen = scala.collection.mutable.Set(resident.map(_.vecId): _*)
      val added = scala.collection.mutable.ArrayBuffer.empty[CellVec]
      val hits = scala.collection.mutable.ArrayBuffer.empty[AnnHit]
      // ascending vec_id: a same-batch earlier arrival must be visible to
      // later queries, exactly as if it had arrived in its own batch
      rows.toArray.sortBy(_.vecId).foreach { r =>
        (resident.iterator ++ added.iterator)
          .filter(_.vecId < r.vecId)
          .foreach(o => hits += AnnHit(r.vecId, o.vecId, cos(r.emb, o.emb)))
        if (r.insert && !seen(r.vecId)) {
          added += CellVec(r.vecId, r.emb)
          seen += r.vecId
        }
      }
      if (added.nonEmpty) index.appendList(added.toArray)
      hits.iterator
    }
  }

  /** Streaming probed-cell ANN candidates: see [[CellAnnIndex]]. */
  def annHits(rows: Dataset[CellQuery]): Dataset[AnnHit] = {
    implicit val enc = Encoders.product[AnnHit]
    rows.groupByKey(_.cell)(Encoders.scalaInt)
      .transformWithState(new CellAnnIndex, TimeMode.None(),
        OutputMode.Update())
  }

  /** [[CellQuery]] plus the vector's event time — the wire row of the
    * SLIDING-WINDOW streaming ANN. */
  final case class CellQueryTs(cell: Int, vecId: Long, emb: Seq[Float],
                               insert: Boolean, tsUs: Long)
  // public: the state encoder's generated code instantiates it reflectively
  final case class CellVecTs(vecId: Long, emb: Seq[Float], ts: Long)

  /** [[CellAnnIndex]] with WATERMARK-BOUND RETENTION — sliding-window
    * arrival-order ANN (the recency-bounded recommendation/feed shape:
    * "neighbors among vectors that arrived before me AND within the
    * retention window of my own event time"). Three mechanisms, each
    * load-bearing:
    *   - per-PROBE window: candidates are residents with
    *     ts ≥ arrival.ts − `lookbackUs` — a pure function of the two
    *     rows' event times, so the emitted pair set is batching- and
    *     restart-independent (an eviction-only design would make
    *     emissions depend on where batch boundaries fell);
    *   - EVICTION at batch start: residents older than watermark −
    *     lookback leave the list — safe because any future in-order
    *     arrival's window starts at or after that horizon, and
    *     redeliveries below it are gated;
    *   - ARRIVAL GATE: a row below the horizon neither inserts, nor
    *     scores, nor emits (it is out of retention — and a redelivered
    *     copy of an evicted vector must not re-inflate the store).
    * State per cell is the window's residents however long the stream
    * runs; the eviction scan is O(resident), the same cost the probe
    * scan already pays. Cosine is the SAME [[annCos]] kernel as the
    * unpruned index — bit-identical scores. Requires TimeMode.EventTime.
    */
  final class CellAnnIndexTtl(lookbackUs: Long)
    extends StatefulProcessor[Int, CellQueryTs, AnnHit] {
    @transient private var index: ListState[CellVecTs] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      index = getHandle.getListState[CellVecTs]("index",
        Encoders.product[CellVecTs], TTLConfig.NONE)
    override def handleInputRows(key: Int, rows: Iterator[CellQueryTs],
                                 timers: TimerValues): Iterator[AnnHit] = {
      val horizonUs = timers.getCurrentWatermarkInMs() * 1000L - lookbackUs
      val all = index.get().toArray
      val resident = all.filter(_.ts >= horizonUs)
      // a fully-evicted cell must clear(), not put(): the state store
      // rejects empty list writes (caught by RetentionSpec — the replay
      // fixtures never evict a whole cell, every cell spans the id range)
      if (resident.length != all.length) {
        if (resident.isEmpty) index.clear() else index.put(resident)
      }
      val seen = scala.collection.mutable.Set(resident.map(_.vecId): _*)
      val added = scala.collection.mutable.ArrayBuffer.empty[CellVecTs]
      val hits = scala.collection.mutable.ArrayBuffer.empty[AnnHit]
      rows.toArray.sortBy(_.vecId).foreach { r =>
        if (r.tsUs >= horizonUs) {
          (resident.iterator ++ added.iterator)
            .filter(o => o.vecId < r.vecId && o.ts >= r.tsUs - lookbackUs)
            .foreach(o => hits += AnnHit(r.vecId, o.vecId, annCos(r.emb, o.emb)))
          if (r.insert && !seen(r.vecId)) {
            added += CellVecTs(r.vecId, r.emb, r.tsUs)
            seen += r.vecId
          }
        }
      }
      if (added.nonEmpty) index.appendList(added.toArray)
      hits.iterator
    }
  }

  /** Streaming sliding-window ANN candidates: see [[CellAnnIndexTtl]].
    * The caller must `.withWatermark` an event-time column on `rows`
    * first.
    */
  def annHitsTtl(rows: Dataset[CellQueryTs],
                 lookbackUs: Long): Dataset[AnnHit] = {
    implicit val enc = Encoders.product[AnnHit]
    rows.groupByKey(_.cell)(Encoders.scalaInt)
      .transformWithState(new CellAnnIndexTtl(lookbackUs),
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** One change-data row over the wire: op ∈ I/U/D, per-key monotone
    * `seq`, price carried as a STRING so exact DECIMAL(18,3) survives
    * the JSON transport byte-for-byte (null for delete tombstones).
    */
  final case class CdcOp(k: Long, status: String, seq: Int, op: String,
                         p: String)

  /** Changelog compaction as a stream — the KTable half of the
    * table-stream duality the reference is built on: per key, a
    * ValueState holds the highest `seq` applied so far, and an arriving
    * op is emitted downstream ONLY when it advances that sequence. The
    * out topic therefore carries the COMPACTED changelog: every stale
    * delivery, duplicate, and post-restart redelivery is absorbed by the
    * recovered state and emits nothing — so a redelivered wave after a
    * checkpoint restart is provably a no-op at the sink, not merely
    * deduplicated there. Within a micro-batch rows apply in ascending
    * seq (a real feed can batch an insert with its revision).
    *
    * Scale shape: state is ONE int per live key — the smallest possible
    * materialization footprint — and per-arrival work is O(1); nothing
    * rescans the log, so a 100 TB feed streams through at wire rate with
    * |keys|-bounded state in the RocksDB store.
    */
  final class ChangelogCompact
    extends StatefulProcessor[Long, CdcOp, CdcOp] {
    @transient private var applied: ValueState[Int] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      applied = getHandle.getValueState[Int]("applied", Encoders.scalaInt,
        TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[CdcOp],
                                 timers: TimerValues): Iterator[CdcOp] = {
      // CONTRACT: sequences are per-key monotone and START AT 1 — the
      // no-state sentinel below is 0, so a seq <= 0 op would be silently
      // dropped as stale instead of applied (ADVICE r13). Enforced, not
      // just documented: a feed violating it fails loudly here.
      var cur = if (applied.exists()) applied.get() else 0
      val out = scala.collection.mutable.ArrayBuffer.empty[CdcOp]
      rows.toArray.sortBy(_.seq).foreach { r =>
        require(r.seq > 0,
          s"ChangelogCompact requires seq >= 1 (key=$key got ${r.seq})")
        if (r.seq > cur) { out += r; cur = r.seq }
      }
      if (out.nonEmpty) applied.update(cur)
      out.iterator
    }
  }

  /** Streaming changelog compaction: see [[ChangelogCompact]]. */
  def compactChangelog(rows: Dataset[CdcOp]): Dataset[CdcOp] = {
    implicit val enc = Encoders.product[CdcOp]
    rows.groupByKey(_.k)(Encoders.scalaLong)
      .transformWithState(new ChangelogCompact, TimeMode.None(),
        OutputMode.Update())
  }
}
