package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.PageEvent
import graft.streaming.StreamOps

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(name: String, user: String, sec: Long, dur: Long = 500) =
    PageEvent(name, user, new Timestamp(sec * 1000), dur)

  test("streaming state runs on the RocksDB state store provider") {
    // every stateful test in this suite (joins, sessions, dedup, FMGWS) and
    // PipelineSpec's checkpoint-restart then exercises RocksDB end-to-end
    assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDBStateStoreProvider"),
      "GraftSession.tune must pin the spill-capable state store")
  }

  test("RocksDB sustains a 10k-key stateful aggregation across a restart") {
    val ckpt = tmpDir("rocks10k")
    // file topic source (recovers offsets across restarts — MemoryStream
    // does not) + update-mode foreachBatch upsert, the pipeline's real
    // serving shape
    val topic = new graft.sources.FileTopic("T10K",
      graft.model.PageEvent.wireSchema, tmpDir("topics10k"))
    val store = scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]
    def runBatch(events: Seq[(String, String, Long, Long)]): Unit = {
      topic.append(events.toDF("name", "user", "date", "duration"))
      val agg = graft.model.PageEventCodec.fromWire(topic.stream(spark))
        .withWatermark("date", "10 minutes")
        .groupBy($"user")
        .agg(count(lit(1)).as("n"), sum($"duration").as("dur"))
      val q = agg.writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r =>
            store.put(r.getString(0), (r.getLong(1), r.getLong(2))))
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    // 10k distinct users, then a restart from the same checkpoint adds a
    // second event for every user — state must survive the restart intact
    runBatch((0 until 10000).map(i => ("P1", s"u$i", 100000L + i % 50, 10L)))
    runBatch((0 until 10000).map(i => ("P2", s"u$i", 200000L + i % 50, 5L)))
    assert(store.size == 10000)
    // every user's final state reflects BOTH runs (no state loss on restart)
    assert(store.values.forall(_ == (2L, 15L)),
      s"state lost across restart: ${store.values.take(5)}")
  }

  test("stream-stream join pairs events of the same user within the window") {
    val pages = MemoryStream[PageEvent](spark)
    val clicks = MemoryStream[PageEvent](spark)
    val joined = StreamOps.joinWithin(pages.toDF(), clicks.toDF(), windowSec = 10)
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .option("checkpointLocation", tmpDir("ssj"))
      .outputMode("append").start()

    pages.addData(ev("P1", "U1", 100), ev("P2", "U2", 200))
    clicks.addData(
      ev("C1", "U1", 105),  // within 10s of U1's page view -> joins
      ev("C2", "U1", 120),  // 20s later -> outside window
      ev("C3", "U2", 199))  // before the page view -> no join
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ss_join")
      .select($"l_name", $"r_name").as[(String, String)].collect().toSet
    assert(got == Set(("P1", "C1")))
  }

  test("session windows merge across micro-batches in streaming mode") {
    val input = MemoryStream[PageEvent](spark)
    val agg = input.toDF()
      .withWatermark("date", "10 minutes")
      .groupBy(session_window($"date", "30 seconds"), $"user")
      .agg(count(lit(1)).as("n"))
      .select($"user", $"session_window.start".cast("long").as("start"), $"n")
    // session windows only support append mode: sessions emit once, when
    // the watermark passes their end
    val q = agg.writeStream.format("memory").queryName("sess_stream")
      .option("checkpointLocation", tmpDir("sess"))
      .outputMode("append").start()

    input.addData(ev("P1", "U1", 100), ev("P1", "U1", 110))
    q.processAllAvailable()
    // second batch extends the same session (within 30 s of 110) and opens
    // a new one after the gap
    input.addData(ev("P1", "U1", 130), ev("P1", "U1", 300))
    q.processAllAvailable()
    // sentinel far in the future advances the watermark past both sessions
    input.addData(ev("PX", "U9", 10000))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_stream").filter($"user" === "U1")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("U1", 100L, 3L), ("U1", 300L, 1L)),
      s"unexpected sessions: $got")
  }

  test("emitOnChange (transformWithState) suppresses unchanged per-key values") {
    val input = MemoryStream[StreamOps.KeyedValue](spark)
    val q = StreamOps.emitOnChange(input.toDS())
      .toDF().writeStream.format("memory").queryName("eoc")
      .option("checkpointLocation", tmpDir("eoc"))
      .outputMode("update").start()

    import StreamOps.KeyedValue
    input.addData(KeyedValue("P1", 1), KeyedValue("P2", 5))
    q.processAllAvailable()
    // unchanged values re-sent -> suppressed; P2 changes -> passes
    input.addData(KeyedValue("P1", 1), KeyedValue("P2", 6))
    q.processAllAvailable()
    // within one batch the LAST value per key wins: (7 then 6) = change to 6?
    // no — P2 was already 6, so the settled value is suppressed
    input.addData(KeyedValue("P2", 7), KeyedValue("P2", 6))
    q.processAllAvailable()
    input.addData(KeyedValue("P1", 2))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("eoc").as[(String, Long)].collect().toList
    assert(got.count(_._1 == "P1") == 2 && got.contains(("P1", 1L)) && got.contains(("P1", 2L)),
      s"P1 should emit exactly its two distinct values: $got")
    assert(got.filter(_._1 == "P2") == List(("P2", 5L), ("P2", 6L)),
      s"P2 should emit 5 then 6 and suppress the settled repeat: $got")
  }

  test("topKPerKey (ListState) keeps a k-capped multiset ranking across batches") {
    val input = MemoryStream[StreamOps.KeyedValue](spark)
    val q = StreamOps.topKPerKey(input.toDS(), k = 3)
      .toDF().writeStream.format("memory").queryName("topk_stream")
      .option("checkpointLocation", tmpDir("topk"))
      .outputMode("update").start()

    import StreamOps.KeyedValue
    input.addData(KeyedValue("A", 10), KeyedValue("A", 30), KeyedValue("B", 5))
    q.processAllAvailable()
    // 30 duplicates (multiset: both kept), 50 enters, 10 falls out of A's top-3
    input.addData(KeyedValue("A", 30), KeyedValue("A", 50), KeyedValue("A", 1))
    q.processAllAvailable()
    q.stop()

    // converged ranking per key = max per (key, rank): rank values are
    // monotone non-decreasing, the replay's fixpoint rule
    val got = spark.table("topk_stream")
      .groupBy($"key", $"rank").agg(max($"value").as("v"))
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(("A", 1, 50L), ("A", 2, 30L), ("A", 3, 30L), ("B", 1, 5L)),
      s"unexpected converged ranking: $got")
  }

  test("topKBootstrapped seeds ListState from a batch snapshot before any row") {
    import StreamOps.{KeyedValue, TopKSeed}
    val input = MemoryStream[KeyedValue](spark)
    // history says A's top-3 is [100, 90, 80]; the stream only ever
    // delivers 95 — the converged ranking must interleave seed and tail
    val seed = Seq(TopKSeed("A", Seq(100L, 90L, 80L))).toDS()
    val q = StreamOps.topKBootstrapped(input.toDS(), seed, k = 3)
      .toDF().writeStream.format("memory").queryName("boot_topk")
      .option("checkpointLocation", tmpDir("boot"))
      .outputMode("update").start()

    input.addData(KeyedValue("A", 95), KeyedValue("B", 7))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("boot_topk")
      .groupBy($"key", $"rank").agg(max($"value").as("v"))
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(("A", 1, 100L), ("A", 2, 95L), ("A", 3, 90L), ("B", 1, 7L)),
      s"seeded ranking wrong (seed lost or misordered): $got")
  }

  test("transitionCounts (MapState) counts consecutive pairs across batches") {
    val input = MemoryStream[StreamOps.TypedEvent](spark)
    val q = StreamOps.transitionCounts(input.toDS())
      .toDF().writeStream.format("memory").queryName("trans_stream")
      .option("checkpointLocation", tmpDir("trans"))
      .outputMode("update").start()

    def te(u: Long, sec: Long, id: Long, t: String) =
      StreamOps.TypedEvent(u, new Timestamp(sec * 1000), id, t)
    // batch 1 out of ts order within the batch: must sort (ts, eventId)
    input.addData(te(1, 110, 2, "click"), te(1, 100, 1, "view"))
    q.processAllAvailable()
    // batch 2: the view->purchase transition straddles the batch boundary
    // (last-event ValueState carries it); then purchase->view
    input.addData(te(1, 120, 3, "purchase"), te(1, 130, 4, "view"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("trans_stream")
      .groupBy($"user", $"pair").agg(max($"n").as("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "view|click", 1L), (1L, "click|purchase", 1L),
      (1L, "purchase|view", 1L)),
      s"unexpected converged transitions: $got")
  }

  test("gapSessions (event-time timers) closes inline and by expired timer") {
    val input = MemoryStream[StreamOps.Stamp](spark)
    // 30 s gap; 0 s watermark delay so sentinel batches advance it exactly
    val q = StreamOps.gapSessions(
        input.toDS().withWatermark("ts", "0 seconds"), gapUs = 30000000L)
      .toDF().writeStream.format("memory").queryName("gap_sess")
      .option("checkpointLocation", tmpDir("gapsess"))
      .outputMode("append").start()
    def st(u: Long, sec: Long) = StreamOps.Stamp(u, new Timestamp(sec * 1000))

    input.addData(st(1, 100), st(1, 110))
    q.processAllAvailable()
    // INLINE close: 200 >= 110 + 30 ends session [100,110] and opens a new
    // one whose armed timer (110+30) must have been deleted, not fired
    input.addData(st(1, 200))
    q.processAllAvailable()
    // TIMER close: no successor for the 200-session — a sentinel key
    // advances the watermark, the next batch fires the armed timer
    input.addData(st(9, 1000))
    q.processAllAvailable()
    input.addData(st(9, 1100))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("gap_sess").filter($"user" === 1L)
      .select($"startUs", $"nEvents").as[(Long, Long)].collect().toSet
    assert(got == Set((100000000L, 2L), (200000000L, 1L)),
      s"expected inline-closed [100,110]x2 and timer-closed [200]x1: $got")
    // exactly-once: no session may emit twice
    val all = spark.table("gap_sess").select($"user", $"startUs").collect()
    assert(all.length == all.distinct.length, s"duplicate session emission: ${all.toSeq}")
  }

  test("emitOnChange TTL evicts idle keys so their next value re-emits") {
    // the documented suppression trade-off (StreamOps scaladoc): a key
    // silent past the TTL loses its state, so its next value passes even
    // if unchanged — bounded state bought with one duplicate emission.
    // TimeMode.ProcessingTime (which TTL requires) keeps the micro-batch
    // engine triggering continuously, so processAllAvailable never
    // settles (same hazard the FMGWS test documents) — poll the sink
    // with a deadline instead
    val input = MemoryStream[StreamOps.KeyedValue](spark)
    val q = StreamOps.emitOnChange(input.toDS(), ttlMs = 2000L)
      .toDF().writeStream.format("memory").queryName("eoc_ttl")
      .option("checkpointLocation", tmpDir("eocttl"))
      .outputMode("update").start()
    def waitRows(n: Long): Unit = {
      val deadline = System.nanoTime() + 60L * 1000000000
      while (spark.table("eoc_ttl").count() < n) {
        assert(System.nanoTime() < deadline,
          s"timed out waiting for $n rows — post-TTL value was suppressed " +
            s"(state not evicted?) or engine stalled: " +
            s"${spark.table("eoc_ttl").collect().toSeq}")
        Thread.sleep(200)
      }
    }
    try {
      import StreamOps.KeyedValue
      input.addData(KeyedValue("P1", 5))
      waitRows(1)
      Thread.sleep(6000) // idle well past the 2 s TTL -> state evicted
      input.addData(KeyedValue("P1", 5)) // unchanged, but state is gone
      waitRows(2) // re-emission IS the assertion; suppression would time out
    } finally q.stop()
    assert(spark.table("eoc_ttl").collect().toSeq.length == 2)
  }

  test("streaming dedup drops duplicate events across micro-batches") {
    val input = MemoryStream[PageEvent](spark)
    // dedup key (name, user, date): watermark bounds the dedup state so it
    // is evicted once duplicates can no longer arrive
    val q = StreamOps.dedupStream(input.toDF(), watermark = "1 minute")
      .writeStream.format("memory").queryName("dedup_stream")
      .option("checkpointLocation", tmpDir("ddw"))
      .outputMode("append").start()

    input.addData(ev("P1", "U1", 100), ev("P1", "U1", 100), ev("P2", "U1", 101))
    q.processAllAvailable()
    input.addData(ev("P1", "U1", 100), ev("P3", "U2", 102)) // cross-batch dup
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dedup_stream")
      .select($"name", $"user", $"date".cast("long")).as[(String, String, Long)]
      .collect().toSeq
    assert(got.size == got.toSet.size, "duplicates survived the dedup")
    assert(got.toSet == Set(("P1", "U1", 100L), ("P2", "U1", 101L), ("P3", "U2", 102L)))
  }

  test("event-time timeout closes sessions when the watermark passes") {
    val input = MemoryStream[PageEvent](spark)
    val q = StreamOps.sessionStats(
        input.toDS().withWatermark("date", "0 seconds"),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
        timeoutMs = 30000L).toDF()
      .writeStream.format("memory").queryName("ett")
      .option("checkpointLocation", tmpDir("ett"))
      .outputMode("append").start()

    input.addData(ev("P1", "U1", 100, 10), ev("P2", "U1", 110, 20))
    q.processAllAvailable()
    // watermark moves past 110s + 30s -> U1's session must close
    input.addData(ev("PX", "U9", 500, 1))
    q.processAllAvailable()
    // one more batch so the timeout actually fires post-watermark-advance
    input.addData(ev("PY", "U9", 510, 1))
    q.processAllAvailable()
    q.stop()

    val closed = spark.table("ett").filter($"closed" && $"user" === "U1")
      .select($"nEvents", $"totalDuration").as[(Long, Long)].collect()
    assert(closed.toSeq == Seq((2L, 30L)),
      s"expected U1 session closed with 2 events/30ms, got ${closed.toSeq}")
  }

  test("flatMapGroupsWithState keeps running per-user state across batches") {
    val input = MemoryStream[PageEvent](spark)
    // NoTimeout in the test: with ProcessingTimeTimeout the engine keeps
    // scheduling timeout-check batches, so processAllAvailable never settles
    val q = StreamOps.sessionStats(input.toDS(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout).toDF()
      .writeStream.format("memory").queryName("fmgws")
      .option("checkpointLocation", tmpDir("fmgws"))
      .outputMode("append").start()

    input.addData(ev("P1", "U1", 100, 10), ev("P2", "U1", 101, 20))
    q.processAllAvailable()
    input.addData(ev("P3", "U1", 102, 5), ev("P1", "U2", 103, 7))
    q.processAllAvailable()
    q.stop()

    val updates = spark.table("fmgws")
      .select($"user", $"nEvents", $"totalDuration", $"closed")
      .as[(String, Long, Long, Boolean)].collect()
    // U1: first batch 2 events / 30ms, second batch accumulates to 3 / 35ms
    assert(updates.contains(("U1", 2L, 30L, false)))
    assert(updates.contains(("U1", 3L, 35L, false)))
    assert(updates.contains(("U2", 1L, 7L, false)))
  }

  test("nearDupIndex: order-free pairing, band isolation, redelivery absorbed") {
    import StreamOps.BandDoc
    val base = (0 until 64).map(i => i * 1000L + 7)
    val near = base.take(20) ++ (20 until 64).map(i => -i - 1L) // agree = 20
    val far = (0 until 64).map(i => i * 31L + 900000)           // agree = 0
    val input = MemoryStream[BandDoc](spark)
    val q = StreamOps.nearDupHits(input.toDS(), minAgree = 16)
      .toDF().writeStream.format("memory").queryName("neardup_stream")
      .option("checkpointLocation", tmpDir("neardup"))
      .outputMode("update").start()

    // the LARGER id arrives FIRST: pairing must trigger when the smaller
    // one shows up later (compare-vs-all = arrival-order independence)
    input.addData(BandDoc(0, 100L, 9, near), BandDoc(0, 100L, 5, far))
    q.processAllAvailable()
    // same bucket VALUE in a different band must not pair with band 0's
    // residents; doc 3 in band 0 pairs with the resident doc 9
    input.addData(BandDoc(1, 100L, 8, base), BandDoc(0, 100L, 3, base))
    q.processAllAvailable()
    // redelivery of doc 3 (resident): skipped wholesale, no new hits
    input.addData(BandDoc(0, 100L, 3, base))
    q.processAllAvailable()
    q.stop()

    val hits = spark.table("neardup_stream")
      .select($"docId", $"dupOf", $"agree")
      .as[(Long, Long, Int)].collect().toSeq
    assert(hits.sorted == Seq((9L, 3L, 20)),
      s"expected exactly the (9 dup-of 3, agree 20) hit: $hits")
  }

  test("distinctPerKey: exact set counts, redelivery and in-batch dups absorbed") {
    import StreamOps.KeyedId
    val input = MemoryStream[KeyedId](spark)
    val q = StreamOps.distinctPerKey(input.toDS())
      .toDF().writeStream.format("memory").queryName("distinct_stream")
      .option("checkpointLocation", tmpDir("distinct"))
      .outputMode("update").start()
    // in-batch duplicate id (10,1) twice counts once
    input.addData(KeyedId(10, 1), KeyedId(10, 1), KeyedId(10, 2), KeyedId(20, 5))
    q.processAllAvailable()
    // cross-batch redelivery of (10,1) changes nothing; a fresh id counts
    input.addData(KeyedId(10, 1), KeyedId(10, 3), KeyedId(20, 5))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("distinct_stream")
      .groupBy($"key").agg(max($"n").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 3L, 20L -> 1L), s"unexpected counts: $got")
  }

  test("annHits (CellAnnIndex): id-order candidates, insert-at-assigned only, redelivery-exact") {
    import StreamOps.{AnnHit, CellQuery}
    val input = MemoryStream[CellQuery](spark)
    val q = StreamOps.annHits(input.toDS())
      .toDF().writeStream.format("memory").queryName("ann_stream")
      .option("checkpointLocation", tmpDir("ann"))
      .outputMode("update").start()

    val e1 = Seq(1f, 0f)
    val e2 = Seq(1f, 1f)
    val e3 = Seq(0f, 1f)
    // vec 1 inserts at cell 0; vec 2 probes cells 0 and 1, inserting only
    // at its assigned cell 0; vec 3 (same batch as 2, LARGER id) must see
    // the same-batch insert of 2 in cell 0
    input.addData(CellQuery(0, 1L, e1, insert = true))
    q.processAllAvailable()
    input.addData(
      CellQuery(0, 2L, e2, insert = true),
      CellQuery(1, 2L, e2, insert = false),
      CellQuery(0, 3L, e3, insert = false),
      CellQuery(1, 3L, e3, insert = true))
    q.processAllAvailable()
    // redelivery of vec 2's rows: no re-insert, identical re-emission
    input.addData(
      CellQuery(0, 2L, e2, insert = true),
      CellQuery(1, 2L, e2, insert = false))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ann_stream").as[AnnHit].collect().toSeq
    val dedup = got.toSet
    // 2 sees 1 (cell 0); 3 sees 1 and 2 (cell 0), nothing in cell 1 (2
    // never joined it — probe rows don't insert)
    assert(dedup.map(h => (h.queryId, h.neighborId)) ==
      Set((2L, 1L), (3L, 1L), (3L, 2L)), s"unexpected candidate set: $dedup")
    // redelivery re-emitted 2's candidate row identically (same cos bits)
    assert(got.count(h => h.queryId == 2L && h.neighborId == 1L) == 2,
      s"redelivered query must re-emit its original row: $got")
    val c21 = dedup.find(h => h.queryId == 2L && h.neighborId == 1L).get.cos
    assert(math.abs(c21 - 1.0 / math.sqrt(2.0)) < 1e-15, s"cos drifted: $c21")
  }

  test("compactChangelog (ChangelogCompact): state-advancing ops only, stale/dup absorbed, in-batch seq order") {
    import StreamOps.CdcOp
    val input = MemoryStream[CdcOp](spark)
    val q = StreamOps.compactChangelog(input.toDS())
      .toDF().writeStream.format("memory").queryName("cdc_stream")
      .option("checkpointLocation", tmpDir("cdc"))
      .outputMode("update").start()

    // key 1: insert + revision batched TOGETHER, revision listed first —
    // must apply in ascending seq and emit both
    input.addData(
      CdcOp(1L, "O", 2, "U", "11.000"),
      CdcOp(1L, "O", 1, "I", "10.000"),
      CdcOp(2L, "F", 1, "I", "20.000"))
    q.processAllAvailable()
    // redelivery of key 1's whole history + a STALE redelivery for key 2
    // (seq 1 again, different payload — sequences start at 1 by contract,
    // enforced with require): zero emissions — the recovered seq state
    // absorbs all of it
    input.addData(
      CdcOp(1L, "O", 1, "I", "10.000"),
      CdcOp(1L, "O", 2, "U", "11.000"),
      CdcOp(2L, "F", 1, "I", "19.000"))
    q.processAllAvailable()
    // the tombstone still advances over the absorbed redelivery
    input.addData(CdcOp(1L, "O", 3, "D", null))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("cdc_stream").as[CdcOp].collect().toSeq
    assert(got.map(r => (r.k, r.seq, r.op)).sorted ==
      Seq((1L, 1, "I"), (1L, 2, "U"), (1L, 3, "D"), (2L, 1, "I")),
      s"compacted changelog must be exactly the advancing ops: $got")
  }
}
