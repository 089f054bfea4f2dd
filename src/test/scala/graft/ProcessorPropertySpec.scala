package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Randomized parity for the remaining transformWithState processors —
  * the [[GapSessionPropertySpec]] treatment applied to the ListState
  * top-k (plain and seeded) and the MapState transition counter: each
  * must agree with its batch twin on ARBITRARY inputs, not just the
  * fixture scales the oracle rows cover. Seeded RNG: failures reproduce.
  *
  * The generators aim at the spots most likely to diverge: duplicate
  * values at the k-boundary (multiset semantics), keys with fewer than k
  * rows, a seed whose values interleave the stream's (bootstrap), and
  * duplicate timestamps (the transition processor's within-batch sort
  * must break ties by eventId exactly as the batch window's ORDER BY).
  */
class ProcessorPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Per-(test, sample) RNG so each test's inputs are order-independent:
    * a shared instance would make `testOnly -z` runs see different data
    * than a full-suite run, breaking the "failures reproduce" guarantee
    * (ADVICE r11). `testId` namespaces the streams so adding samples to
    * one test never shifts another's.
    */
  private def rng(testId: Int, sample: Int): scala.util.Random =
    new scala.util.Random(20260814L + testId * 1000L + sample)

  private def convergedTopK(stream: Seq[StreamOps.KeyedValue],
                            seed: Option[Seq[StreamOps.TopKSeed]],
                            k: Int, name: String): Set[(String, Int, Long)] = {
    val input = MemoryStream[StreamOps.KeyedValue](spark)
    val ds = seed match {
      case Some(sd) => StreamOps.topKBootstrapped(input.toDS(), sd.toDS(), k)
      case None     => StreamOps.topKPerKey(input.toDS(), k)
    }
    val q = ds.toDF().writeStream.format("memory").queryName(name)
      .option("checkpointLocation", tmpDir(name))
      .outputMode("update").start()
    try {
      stream.grouped(math.max(1, stream.length / 3)).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).groupBy($"key", $"rank").agg(max($"value").as("v"))
      .as[(String, Int, Long)].collect().toSet
  }

  private def batchTopK(rows: Seq[(String, Long)], k: Int): Set[(String, Int, Long)] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"key").orderBy($"value".desc)
    rows.toDF("key", "value")
      .withColumn("rank", row_number().over(w)).filter($"rank" <= k)
      .select($"key", $"rank", $"value")
      .as[(String, Int, Long)].collect().toSet
  }

  test("topKPerKey equals the batch row_number top-k on random streams") {
    (1 to 3).foreach { sample =>
      val rnd = rng(testId = 1, sample)
      // small value range forces duplicates at the k-boundary
      val rows = (1 to 200).map(_ =>
        (s"K${rnd.nextInt(6)}", rnd.nextInt(20).toLong))
      val got = convergedTopK(rows.map(r => StreamOps.KeyedValue(r._1, r._2)),
        None, k = 3, name = s"tkprop$sample")
      val want = batchTopK(rows, k = 3)
      assert(got == want, s"sample $sample: $got vs $want")
    }
  }

  test("topKBootstrapped(seed ++ tail) equals batch top-k over seed ++ tail") {
    (1 to 3).foreach { sample =>
      val rnd = rng(testId = 2, sample)
      val all = (1 to 160).map(_ =>
        (s"K${rnd.nextInt(5)}", rnd.nextInt(25).toLong))
      val (hist, tail) = all.splitAt(all.length / 2)
      // the seed is history's OWN top-k — what a real bootstrap batch
      // job would hand over; keys absent from history get no seed row
      val seed = hist.groupBy(_._1).map { case (key, vs) =>
        StreamOps.TopKSeed(key, vs.map(_._2).sorted.reverse.take(3))
      }.toSeq
      val got = convergedTopK(tail.map(r => StreamOps.KeyedValue(r._1, r._2)),
        Some(seed), k = 3, name = s"btprop$sample")
      // keys with NO tail rows never emit (nothing arrives to trigger
      // them) — compare only keys the stream touched, mirroring the
      // replay's reliance on every key appearing in the tail
      val tailKeys = tail.map(_._1).toSet
      val want = batchTopK(all, k = 3).filter(r => tailKeys(r._1))
      assert(got == want, s"sample $sample: $got vs $want")
    }
  }

  test("transitionCounts equals the batch lead() window under timestamp ties") {
    (1 to 3).foreach { sample =>
      val rnd = rng(testId = 3, sample)
      // coarse second resolution + few users = frequent exact-ts ties;
      // eventId is the tiebreak on both sides
      val rows = (1 to 240).map { i =>
        StreamOps.TypedEvent(1L + rnd.nextInt(4),
          new Timestamp((1700000000L + rnd.nextInt(40)) * 1000L), i.toLong,
          Seq("view", "click", "purchase")(rnd.nextInt(3)))
      }
      val input = MemoryStream[StreamOps.TypedEvent](spark)
      val name = s"trprop$sample"
      val q = StreamOps.transitionCounts(input.toDS())
        .toDF().writeStream.format("memory").queryName(name)
        .option("checkpointLocation", tmpDir(name))
        .outputMode("update").start()
      try {
        // event-time-ordered chunks like the replay publishes (the
        // processor orders within a batch; ACROSS batches order is the
        // wire's responsibility)
        rows.sortBy(r => (r.ts.getTime, r.eventId))
          .grouped(80).foreach { chunk =>
            input.addData(chunk)
            q.processAllAvailable()
          }
      } finally q.stop()
      val got = spark.table(name)
        .groupBy($"user", $"pair").agg(max($"n").as("n"))
        .as[(Long, String, Long)].collect().toSet
      val want = {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"user").orderBy($"ts", $"eventId")
        rows.toDF()
          .withColumn("to_typ", lead($"typ", 1).over(w))
          .filter($"to_typ".isNotNull)
          .groupBy($"user", concat($"typ", lit("|"), $"to_typ").as("pair"))
          .agg(count(lit(1)).as("n"))
          .as[(Long, String, Long)].collect().toSet
      }
      assert(got == want,
        s"sample $sample: only-in-processor ${got -- want}, " +
          s"only-in-batch ${want -- got}")
    }
  }

  test("CellAnnIndex: candidate set is batching-invariant and redelivery-stable") {
    // the scaladoc claim under test: with ids arriving in nondecreasing
    // order ACROSS batches (the producer contract), the emitted candidate
    // set — down to the cosine BITS — is a pure function of the id order,
    // however the stream is chopped into micro-batches, and redelivering
    // any prefix changes nothing
    (1 to 3).foreach { sample =>
      val rnd = rng(testId = 5, sample)
      val nCells = 3
      val vecs = (0L until 36L).map(id =>
        id -> Array.fill(4)((rnd.nextInt(9) - 4).toFloat))
      def assigned(id: Long) = (id % nCells).toInt
      def probed(id: Long) = Seq(assigned(id), ((id + 1) % nCells).toInt)
      def queriesOf(id: Long, emb: Array[Float]) = probed(id).map(c =>
        StreamOps.CellQuery(c, id, emb.toSeq, insert = c == assigned(id)))
      val name = s"annprop$sample"
      val input = MemoryStream[StreamOps.CellQuery](spark)
      val q = StreamOps.annHits(input.toDS())
        .toDF().writeStream.format("memory").queryName(name)
        .option("checkpointLocation", tmpDir(name))
        .outputMode("update").start()
      try {
        var i = 0
        var chunks = List.empty[Seq[StreamOps.CellQuery]]
        while (i < vecs.length) {
          val n = 1 + rnd.nextInt(7) // random batch boundaries
          val chunk = vecs.slice(i, i + n)
            .flatMap { case (id, e) => queriesOf(id, e) }
          chunks ::= chunk
          // shuffle WITHIN the batch: the processor must re-sort by id
          input.addData(rnd.shuffle(chunk))
          q.processAllAvailable()
          i += n
        }
        // redeliver a random earlier batch wholesale
        input.addData(chunks(rnd.nextInt(chunks.length)))
        q.processAllAvailable()
      } finally q.stop()
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var na = 0.0; var nb = 0.0
        a.indices.foreach { j => s += a(j).toDouble * b(j)
          na += a(j).toDouble * a(j); nb += b(j).toDouble * b(j) }
        s / (math.sqrt(na) * math.sqrt(nb))
      }
      val want = (for {
        (qid, qe) <- vecs
        c <- probed(qid)
        (oid, oe) <- vecs
        if oid < qid && assigned(oid) == c
      } yield (qid, oid, cos(qe, oe)))
        .filterNot(_._3.isNaN) // an all-zero draw has no defined cosine
        .map { case (q, o, c) =>
          (q, o, java.lang.Double.doubleToLongBits(c)) }.toSet
      val got = spark.table(name).as[StreamOps.AnnHit].collect()
        .filterNot(_.cos.isNaN)
        .map(h => (h.queryId, h.neighborId,
          java.lang.Double.doubleToLongBits(h.cos))).toSet
      assert(got == want, s"sample $sample: only-streamed ${got -- want}, " +
        s"only-sequential ${want -- got}")
    }
  }

  test("ChangelogCompact: any delivery order/batching, dups absorbed, snapshot exact") {
    (1 to 3).foreach { sample =>
      val rnd = rng(testId = 6, sample)
      val log = (1L to 12L).flatMap { k =>
        val m = 1 + rnd.nextInt(4)
        (1 to m).map(s => StreamOps.CdcOp(k, s"S${k % 3}", s,
          if (s == 1) "I" else if (rnd.nextInt(4) == 0) "D" else "U",
          s"$k.$s"))
      }
      // arbitrary global order + injected duplicates
      val withDups = rnd.shuffle(log ++ Seq.fill(10)(log(rnd.nextInt(log.length))))
      val name = s"cdcprop$sample"
      val input = MemoryStream[StreamOps.CdcOp](spark)
      val q = StreamOps.compactChangelog(input.toDS())
        .toDF().writeStream.format("memory").queryName(name)
        .option("checkpointLocation", tmpDir(name))
        .outputMode("update").start()
      try {
        withDups.grouped(1 + rnd.nextInt(9)).foreach { chunk =>
          input.addData(chunk)
          q.processAllAvailable()
        }
      } finally q.stop()
      val emitted = spark.table(name).as[StreamOps.CdcOp].collect().toSeq
      // no (k, seq) ever emits twice, duplicates notwithstanding
      assert(emitted.map(r => (r.k, r.seq)).distinct.size == emitted.size,
        s"sample $sample: duplicate emission in $emitted")
      // the latest op always emits (it advances past anything delivered
      // before it), so compacting the OUT topic recovers the true snapshot
      val maxSeq = log.groupBy(_.k).map { case (k, ops) =>
        k -> ops.map(_.seq).max }
      val snapshot = emitted.groupBy(_.k).map { case (k, rows) =>
        k -> rows.maxBy(_.seq) }
      maxSeq.foreach { case (k, s) =>
        assert(snapshot(k).seq == s && snapshot(k).op ==
          log.find(r => r.k == k && r.seq == s).get.op,
          s"sample $sample key $k: ${snapshot(k)} is not the latest op")
      }
    }
  }

  /** The two contracts the streaming corpus build rests on
    * ([[StreamOps.CanonicalFirst]]): under the wire's doc_id-ASCENDING
    * delivery, EXACTLY one doc emits per fingerprint — any batch split —
    * and it is the min-id doc (the batch twin's canonical). Under
    * ARBITRARY (shuffled) delivery the exactly-once guarantee
    * deliberately relaxes to convergence: emissions per fingerprint are
    * strictly decreasing minima whose last value is the global min, so
    * a min-per-fp rollup of the out topic still recovers the canonical
    * set — the property that would hold if a deployment fed the index
    * from an unordered backfill.
    */
  test("canonicalFirst: exactly-once per fingerprint ascending; min-convergent shuffled") {
    (1 to 3).foreach { sample =>
      val rnd = rng(testId = 7, sample)
      val docs = (1 to 120).map(i => StreamOps.CorpusDoc(
        s"F${rnd.nextInt(25)}", i.toLong, s"s${rnd.nextInt(3)}",
        rnd.nextInt(10).toLong))
      val want = docs.groupBy(_.fp).map { case (fp, ds) =>
        fp -> ds.minBy(_.docId) }
      def run(stream: Seq[StreamOps.CorpusDoc], name: String) = {
        val input = MemoryStream[StreamOps.CorpusDoc](spark)
        val q = StreamOps.canonicalFirst(input.toDS())
          .toDF().writeStream.format("memory").queryName(name)
          .option("checkpointLocation", tmpDir(name))
          .outputMode("update").start()
        try {
          stream.grouped(1 + rnd.nextInt(40)).foreach { chunk =>
            input.addData(chunk)
            q.processAllAvailable()
          }
        } finally q.stop()
        spark.table(name).as[StreamOps.CorpusDoc].collect().toSeq
      }
      val asc = run(docs, s"canprop${sample}a")
      assert(asc.size == want.size &&
        asc.map(d => d.fp -> d).toMap == want,
        s"sample $sample ascending: ${asc.sortBy(_.docId)} vs $want")
      val shuffled = run(rnd.shuffle(docs), s"canprop${sample}b")
      shuffled.groupBy(_.fp).foreach { case (fp, emitted) =>
        val mins = emitted.sortBy(-_.docId).map(_.docId)
        assert(mins == mins.distinct.sorted.reverse &&
          emitted.minBy(_.docId) == want(fp),
          s"sample $sample shuffled fp $fp: $emitted")
      }
      assert(shuffled.map(_.fp).toSet == want.keySet)
    }
  }
}
