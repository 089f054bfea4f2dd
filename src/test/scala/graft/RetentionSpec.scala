package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Mechanism-level pins for the watermark-bound retention processors
  * (round 17). The replay queries (stream_asof_ttl / stream_lexical_ttl
  * / stream_ann_ttl) prove the END-TO-END contracts against DuckDB
  * oracles; this spec drives each processor through tiny synthetic
  * batches where every mechanism is individually observable — SCD
  * compaction keeps exactly the newest below-horizon entry under the
  * probe tie order, the arrival gate refuses a redelivered evicted row,
  * and the ANN per-probe window excludes a STILL-RESIDENT vector — so a
  * refactor that breaks one mechanism fails here by name instead of as
  * an opaque replay hash mismatch.
  *
  * Batching discipline: the watermark for batch N is the max event time
  * of batches < N, so each test advances it with a "clock" row on an
  * unrelated key one batch before the behavior under test.
  */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private val lookbackUs = 500000000L // 500 s

  test("AsOfIndexTtl: SCD representative survives compaction; gate refuses evicted redelivery") {
    val input = MemoryStream[StreamOps.AsOfRow](spark)
    val rows = input.toDS().toDF()
      .withColumn("ets", timestamp_micros(col("ts")))
      .withWatermark("ets", "0 seconds")
      .select(col("key"), col("isProbe"), col("id"), col("ts"), col("price"))
      .as[StreamOps.AsOfRow]
    val ckpt = tmpDir("asofttl_ckpt")
    val q = StreamOps.asOfIndexTtl(rows, lookbackUs).toDF()
      .writeStream.format("memory").queryName("asofttl")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    def rev(key: Long, id: Long, tsS: Long, p: Double) =
      StreamOps.AsOfRow(key, isProbe = false, id, tsS * 1000000L, p)
    def probe(key: Long, id: Long, tsS: Long) =
      StreamOps.AsOfRow(key, isProbe = true, id, tsS * 1000000L, 0.0)
    try {
      // all of key 1's history sits below the coming horizon (500 s);
      // two revisions tie at ts 300 — the rep must be the HIGHER id
      input.addData(rev(1, 11, 100, 11.0), rev(1, 12, 200, 12.0),
        rev(1, 31, 300, 31.0), rev(1, 32, 300, 32.0))
      q.processAllAvailable()
      input.addData(rev(99, 991, 1000, 99.0)) // clock: watermark -> 1000 s
      q.processAllAvailable()
      // horizon is now 500 s: key 1 compacts to the single newest
      // below-horizon revision (ts 300, id 32); the probe must still
      // answer it — an evict-all design would answer null
      input.addData(probe(1, 71, 950))
      q.processAllAvailable()
      // the gate: a redelivered copy of the EVICTED revision 11 must
      // not re-enter; the next probe still answers the representative
      input.addData(rev(1, 11, 100, 11.0), probe(1, 72, 960))
      q.processAllAvailable()
    } finally q.stop()
    val answers = spark.table("asofttl")
      .select($"eventId", $"orderKey", $"price")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    // both probes answer the representative, and the ts-300 tie MUST
    // have broken to the higher id (the probe tie order)
    assert(answers == Set((71L, Some(32L), Some(32.0)),
      (72L, Some(32L), Some(32.0))), s"probe answers: $answers")
    // the store holds EXACTLY the representative for key 1 (and the
    // clock revision for key 99, which sits inside the horizon)
    val state = spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", "revisions").load()
      .select(col("key.value").as("k"), col("user_map_key.value").as("id"))
      .as[(Long, Long)].collect().toSet
    assert(state == Set((1L, 32L), (99L, 991L)), s"retained state: $state")
  }

  test("PostingsIndexTtl: touched lists compact to the window; evicted doc cannot re-enter") {
    val input = MemoryStream[StreamOps.DocTermTs](spark)
    val rows = input.toDS().toDF()
      .withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", "0 seconds")
      .select(col("h"), col("docId"), col("tf"), col("tsUs"))
      .as[StreamOps.DocTermTs]
    val ckpt = tmpDir("lexttl_ckpt")
    val q = StreamOps.postingsIndexTtl(rows, lookbackUs).toDF()
      .writeStream.format("memory").queryName("lexttl")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    def dt(h: Long, doc: Long, tf: Long, tsS: Long) =
      StreamOps.DocTermTs(h, doc, tf, tsS * 1000000L)
    try {
      input.addData(dt(7, 1, 3, 100), dt(7, 2, 5, 200))
      q.processAllAvailable()
      input.addData(dt(9, 9, 1, 1000)) // clock: watermark -> 1000 s
      q.processAllAvailable()
      // horizon 500 s: docs 1 and 2 leave h=7's list when it is touched;
      // the redelivered doc 1 is refused at the gate; doc 8 enters
      input.addData(dt(7, 8, 2, 990), dt(7, 1, 3, 100))
      q.processAllAvailable()
    } finally q.stop()
    // emissions: each posting once, at insert (the evicted redelivery
    // emitted nothing)
    val emitted = spark.table("lexttl")
      .select($"h", $"docId").as[(Long, Long)].collect().toSet
    assert(emitted == Set((7L, 1L), (7L, 2L), (7L, 8L), (9L, 9L)),
      s"emitted postings: $emitted")
    val state = spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", "postings").load()
      .select(col("key.value").as("h"),
        col("user_map_key.value").as("doc"),
        col("user_map_value.tf").as("tf"))
      .as[(Long, Long, Long)].collect().toSet
    assert(state == Set((7L, 8L, 2L), (9L, 9L, 1L)),
      s"retained postings: $state")
  }

  test("CellAnnIndexTtl: per-probe window excludes a resident; horizon evicts and gates") {
    val e = Seq(1.0f, 0.0f)
    val input = MemoryStream[StreamOps.CellQueryTs](spark)
    val rows = input.toDS().toDF()
      .withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", "0 seconds")
      .select(col("cell"), col("vecId"), col("emb"), col("insert"),
        col("tsUs"))
      .as[StreamOps.CellQueryTs]
    val ckpt = tmpDir("annttl_ckpt")
    val q = StreamOps.annHitsTtl(rows, lookbackUs).toDF()
      .writeStream.format("memory").queryName("annttl")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    def v(vec: Long, tsS: Long) =
      StreamOps.CellQueryTs(0, vec, e, insert = true, tsS * 1000000L)
    try {
      // vec 60's own window reaches back to 100 s, so vec 10 (150 s)
      // is a candidate in-batch
      input.addData(v(10, 150), v(60, 600))
      q.processAllAvailable()
      // vec 70 (700 s): vec 10 is STILL RESIDENT (horizon is only
      // 100 s) but outside 70's window (>= 200 s) — per-probe filter,
      // not eviction, must exclude it
      input.addData(v(70, 700))
      q.processAllAvailable()
      input.addData(StreamOps.CellQueryTs(5, 999, e, insert = true,
        2000L * 1000000L)) // clock on another cell: watermark -> 2000 s
      q.processAllAvailable()
      // horizon 1500 s: touching cell 0 evicts everything resident, and
      // vec 71 (710 s) itself sits below the horizon — gated, so it
      // neither scores nor inserts nor emits
      input.addData(v(71, 710))
      q.processAllAvailable()
    } finally q.stop()
    val hits = spark.table("annttl")
      .select($"queryId", $"neighborId").as[(Long, Long)].collect().toSet
    assert(hits == Set((60L, 10L), (70L, 60L)), s"hits: $hits")
    val state = spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", "index").load()
      .select(col("key.value").as("cell"),
        col("list_element.vecId").as("vec"))
      .as[(Int, Long)].collect().toSet
    assert(state == Set((5, 999L)), s"retained index: $state")
  }

  test("NearDupIndexTtl: per-probe window excludes a resident; horizon evicts and gates; bucket clears") {
    val sig = (1L to 64L).toSeq // identical sigs -> agree = 64
    val input = MemoryStream[StreamOps.BandDocTs](spark)
    val rows = input.toDS().toDF()
      .withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", "0 seconds")
      .select(col("band"), col("bucket"), col("docId"), col("sig"),
        col("tsUs"))
      .as[StreamOps.BandDocTs]
    val ckpt = tmpDir("ndttl_ckpt")
    val q = StreamOps.nearDupHitsTtl(rows, minAgree = 16, lookbackUs).toDF()
      .writeStream.format("memory").queryName("ndttl")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    def d(doc: Long, tsS: Long, bucket: Long = 7L) =
      StreamOps.BandDocTs(0, bucket, doc, sig, tsS * 1000000L)
    try {
      // doc 60's window reaches back to 100 s, so doc 10 (150 s) pairs
      // in-batch
      input.addData(d(10, 150), d(60, 600))
      q.processAllAvailable()
      // doc 70 (700 s): doc 10 is STILL RESIDENT (horizon is only
      // 100 s) but outside 70's window (gap 550 s > 500) — the
      // per-probe filter, not eviction, must exclude it; doc 60 pairs
      input.addData(d(70, 700))
      q.processAllAvailable()
      // redelivery of a resident: skipped wholesale, nothing re-emits
      input.addData(d(60, 600))
      q.processAllAvailable()
      input.addData(d(999, 2000, bucket = 8L)) // clock: watermark -> 2000 s
      q.processAllAvailable()
      // horizon 1500 s: touching bucket 7 evicts everything resident
      // (clear() path — the bucket empties), and doc 71 (710 s) itself
      // sits below the horizon — gated: no score, no insert, no emit
      input.addData(d(71, 710))
      q.processAllAvailable()
    } finally q.stop()
    val hits = spark.table("ndttl")
      .select($"docId", $"dupOf", $"agree").as[(Long, Long, Int)]
      .collect().toSet
    assert(hits == Set((60L, 10L, 64), (70L, 60L, 64)), s"hits: $hits")
    val state = spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", "index").load()
      .select(col("key._1").as("band"), col("key._2").as("bucket"),
        col("list_element.docId").as("doc"))
      .as[(Int, Long, Long)].collect().toSet
    assert(state == Set((0, 8L, 999L)), s"retained index: $state")
  }

  test("CanonicalFirstTtl: eviction re-opens canonical; gate + clock rows behave") {
    val input = MemoryStream[StreamOps.CorpusDocTs](spark)
    val rows = input.toDS().toDF()
      .withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", "0 seconds")
      .select(col("fp"), col("docId"), col("source"), col("nHits"),
        col("tsUs"), col("ok"))
      .as[StreamOps.CorpusDocTs]
    val ckpt = tmpDir("canonttl_ckpt")
    val q = StreamOps.canonicalFirstTtl(rows, lookbackUs).toDF()
      .writeStream.format("memory").queryName("canonttl")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    def doc(fp: String, id: Long, tsS: Long, ok: Boolean = true) =
      StreamOps.CorpusDocTs(fp, id, "s", 0L, tsS * 1000000L, ok)
    try {
      // A's canonical (id 1, t=100) will expire; B's (id 2, t=400) will
      // survive the coming horizon; A also gets a low-quality row that
      // must act as CLOCK ONLY (never canonical, never state)
      input.addData(doc("A", 1, 100), doc("B", 2, 400),
        doc("A", 9, 120, ok = false))
      q.processAllAvailable()
      input.addData(doc("Z", 99, 1000)) // clock: watermark -> 1000 s
      q.processAllAvailable()
      // horizon 500 s: touching A evicts id 1 (t=100 < 500), so the
      // in-window doc 5 (t=700) becomes A's WINDOWED canonical and
      // re-emits; a redelivered copy of the EVICTED doc 1 in the same
      // batch is refused at the gate (it must not out-min doc 5)
      input.addData(doc("A", 5, 700), doc("A", 1, 100))
      q.processAllAvailable()
      // B's canonical (t=400 < 500) evicts when touched — by a
      // LOW-QUALITY clock row alone: compaction is arrival-driven, not
      // candidate-driven
      input.addData(doc("B", 7, 600, ok = false))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("canonttl")
      .select($"fp", $"docId").as[(String, Long)].collect().toSet
    assert(emitted == Set(("A", 1L), ("B", 2L), ("Z", 99L), ("A", 5L)),
      s"emissions: $emitted")
    val state = spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", "canonical").load()
      .select(col("key.value").as("fp"), col("value.docId").as("id"))
      .as[(String, Long)].collect().toSet
    // A holds its windowed canonical; B was compacted empty by the
    // clock row; the low-quality rows never created state
    assert(state == Set(("A", 5L), ("Z", 99L)), s"retained: $state")
  }

  test("DistinctActiveTtl: recency refresh keeps an id alive; eviction shrinks the count") {
    val input = MemoryStream[StreamOps.ActiveId](spark)
    val rows = input.toDS().toDF()
      .withColumn("ets", timestamp_micros(col("tsUs")))
      .withWatermark("ets", "0 seconds")
      .select(col("key"), col("id"), col("tsUs"))
      .as[StreamOps.ActiveId]
    val ckpt = tmpDir("activettl_ckpt")
    val q = StreamOps.distinctActiveTtl(rows, lookbackUs).toDF()
      .writeStream.format("memory").queryName("activettl")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    def ev(key: String, id: Long, tsS: Long) =
      StreamOps.ActiveId(key, id, tsS * 1000000L)
    try {
      // ids 1 and 2 sighted early; id 1 REFRESHES at t=450 (recency
      // semantics — the refresh must survive the coming horizon)
      input.addData(ev("t", 1, 100), ev("t", 2, 120), ev("t", 1, 450))
      q.processAllAvailable()
      input.addData(ev("z", 9, 1000)) // clock: watermark -> 1000 s
      q.processAllAvailable()
      // horizon 500 s: touching t evicts id 2 (last seen 120) but id 1
      // survives on its refreshed sighting (450)... which ALSO falls
      // below 500 — so both evict; id 3 arrives in-window. A
      // redelivered copy of id 2's evicted sighting is gated.
      input.addData(ev("t", 3, 800), ev("t", 2, 120))
      q.processAllAvailable()
      // id 1 re-enters with a fresh in-window sighting — a NEW
      // activation, not a gate violation (the sighting is in-window)
      input.addData(ev("t", 1, 900))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("activettl")
      .select($"key", $"n").as[(String, Long)].collect()
    // per-batch counts for key t: 2 (ids 1,2) -> 1 (evictions shrank
    // it: only id 3 resident) -> 2 (id 1 re-activated)
    assert(emitted.filter(_._1 == "t").map(_._2).toSeq == Seq(2L, 1L, 2L),
      s"count trajectory: ${emitted.toSeq}")
    val state = spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", "active").load()
      .select(col("key.value").as("k"), col("user_map_key.value").as("id"))
      .as[(String, Long)].collect().toSet
    assert(state == Set(("t", 3L), ("t", 1L), ("z", 9L)),
      s"retained active set: $state")
  }

  test("TransitionCountsTtl: standing timers evict with NO arrival; dst gate; boundary transition kept") {
    val dayUs = 86400000000L
    val input = MemoryStream[StreamOps.TypedEvent](spark)
    val rows = input.toDS().toDF()
      .withColumn("ets", col("ts"))
      .withWatermark("ets", "0 seconds")
      .select(col("user"), col("ts"), col("eventId"), col("typ"))
      .as[StreamOps.TypedEvent]
    val ckpt = tmpDir("transttl_ckpt")
    // lookback 3 days
    val q = StreamOps.transitionCountsTtl(rows, 3L * dayUs).toDF()
      .writeStream.format("memory").queryName("transttl")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    var eid = 0L
    def ev(user: Long, typ: String, day: Long) = {
      eid += 1
      StreamOps.TypedEvent(user,
        new java.sql.Timestamp(day * 86400000L), eid, typ)
    }
    try {
      // user 1 transitions a|b (bucket day 2) and b|c (bucket day 3);
      // user 2 sees only "x" (no transition yet)
      input.addData(ev(1, "a", 1), ev(1, "b", 2), ev(1, "c", 3),
        ev(2, "x", 1))
      q.processAllAvailable()
      // clock on user 99: watermark -> day 10, horizon -> day 7. User 1
      // and 2 receive NO rows — their standing timers alone must evict
      // the expired buckets
      input.addData(ev(99, "z", 10))
      q.processAllAvailable()
      // boundary transition: user 1's last event ("c", day 3 — kept
      // across the horizon, O(1) state) forms c|d with an IN-WINDOW
      // destination (day 9); user 2's late event lands a transition
      // whose destination (day 5) is below the horizon — gated
      input.addData(ev(1, "d", 9), ev(2, "y", 5))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("transttl")
      .select($"user", $"pair", $"n").as[(Long, String, Long)]
      .collect().toSet
    // user 1's final emission is the WINDOWED total: just c|d = 1 (the
    // evicted a|b / b|c buckets are gone); earlier emissions carried the
    // pre-eviction totals
    assert(emitted == Set((1L, "a|b", 1L), (1L, "b|c", 1L),
      (1L, "c|d", 1L)), s"emissions: $emitted")
    val state = spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", "buckets").load()
      .select(col("key.value").as("user"),
        col("user_map_key.pair").as("pair"),
        col("user_map_key.day").as("day"),
        col("user_map_value.value").as("n"))
      .as[(Long, String, Long, Long)].collect().toSet
    // ONLY user 1's in-window bucket survives: the timer firing evicted
    // day-2/day-3 without any user-1 arrival, and user 2's gated
    // transition never created a bucket
    assert(state == Set((1L, "c|d", 9L, 1L)), s"retained buckets: $state")
  }
}
