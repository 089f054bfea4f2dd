package graft

import org.apache.spark.sql.functions._

import graft.functions.Bloom
import graft.functions.TextFunctions._
import graft.operators.{EventSuite, SimilaritySuite, TextSuite}

/** Properties of the round-3 training-prep operators: Bloom
  * decontamination, repetition signals, chunking, per-source capping,
  * int8 quantization, funnel. The cross-engine value checks live in the
  * DuckDB oracles; these specs pin the structural guarantees the oracles
  * can't express (no-false-negative supersets, tiling, determinism).
  */
class TrainPrepSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bloom probe is a superset of exact membership (zero false negatives)") {
    val docs = graft.model.Tables.documents(spark, sf)
    val docSh = docs.select(col("doc_id"),
      explode(shingleHashes(col("text"), 3)).as("h"))
    val benchSh = docs.filter(col("doc_id") < 5)
      .select(explode(shingleHashes(col("text"), 3)).as("h")).distinct()
    val bloom = benchSh.agg(
      Bloom.bloomAgg(col("h"), expectedItems = 4096L, numBits = 1L << 19).as("bloom"))
    val probed = docSh
      .withColumn("bloom_hit", Bloom.mightContain(bloom, col("h")))
      .join(benchSh.withColumn("exact_hit", lit(true)), Seq("h"), "left")
      .select(col("bloom_hit"), coalesce(col("exact_hit"), lit(false)).as("exact_hit"))
      .cache()
    // every exact member must probe true — the decontamination guarantee
    assert(probed.filter(col("exact_hit") && !col("bloom_hit")).count() == 0,
      "bloom filter produced a false negative")
    // and the false-positive rate stays near the m/n=16-bit design point
    // (~0.05%); 2% gives wide headroom against unlucky fixtures
    val nonMembers = probed.filter(!col("exact_hit")).count()
    val falsePos = probed.filter(!col("exact_hit") && col("bloom_hit")).count()
    assert(nonMembers > 0)
    assert(falsePos.toDouble / nonMembers <= 0.02,
      s"bloom FP rate ${falsePos.toDouble / nonMembers} above bound")
    probed.unpersist()
  }

  test("bloom build + probe is deterministic run to run") {
    val items = (0L until 1000L).toDF("h")
    def flagged: Set[Long] = {
      val bloom = items.filter(col("h") % 3 === 0)
        .agg(Bloom.bloomAgg(col("h"), 512L, 1L << 14).as("bloom"))
      items.filter(Bloom.mightContain(bloom, col("h")))
        .as[Long].collect().toSet
    }
    assert(flagged == flagged, "bloom probe set changed between runs")
  }

  test("chunkDocs tiles every document: stride-spaced starts, full coverage") {
    val chunks = TextSuite.chunkDocs(spark, sf, size = 64, stride = 48)
      .select(col("doc_id"), col("chunk_id"), col("chunk_start"), col("chunk_tokens"))
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, cs) => id -> cs.sortBy(_._2) }
    val nTokens = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (id, cs) =>
      // starts are exactly 0, stride, 2*stride, ...
      cs.zipWithIndex.foreach { case ((_, cid, start, len), i) =>
        assert(cid == i && start == 48L * i, s"doc $id chunk $i misplaced")
        assert(len >= 1 && len <= 64, s"doc $id chunk $i size $len")
      }
      // the last chunk reaches the end of the doc: coverage is total
      val (_, _, lastStart, lastLen) = cs.last
      assert(lastStart + lastLen == nTokens(id),
        s"doc $id tokens ${nTokens(id)} not covered (last ${lastStart + lastLen})")
      // and the doc has no chunk starting at/after its end
      assert(lastStart < nTokens(id))
    }
    // docs with zero tokens emit no chunks
    val emptyDocs = nTokens.filter(_._2 == 0L).keySet
    assert(emptyDocs.forall(!chunks.contains(_)))
  }

  test("domainCap keeps at most cap docs per source, deterministically") {
    val capped = TextSuite.domainCap(spark, sf, cap = 7)
    val bySource = capped.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(bySource.values.forall(_ <= 7), s"cap exceeded: $bySource")
    val again = TextSuite.domainCap(spark, sf, cap = 7)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(capped.select(col("doc_id")).as[Long].collect().toSet == again,
      "hash-ordered sample is not reproducible")
  }

  test("repSignals separates repetitive from diverse text") {
    val docs = Seq(
      (0L, Seq.fill(50)("spam ham").mkString(" ")), // one bigram repeated
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // all distinct
      (2L, "") // empty -> all zero
    ).toDF("doc_id", "text")
    // same expression pipeline as the wired query, applied to synthetic docs
    val toks = tokens(col("text"))
    val words = docs.select(col("doc_id"), explode(toks).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), max(col("c")).as("top"),
        count(lit(1)).as("d"))
      .select(col("doc_id"), (col("top").cast("double") / col("n")).as("twf"),
        (col("d").cast("double") / col("n")).as("dwr"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(words(0L)._1 == 0.5 && words(0L)._2 == 0.02) // 50x "spam", 2 distinct / 100
    assert(words(1L)._1 == 0.01 && words(1L)._2 == 1.0)
    // the wired query emits zeros (not nulls) for empty docs
    val wired = TextSuite.repSignals(spark, sf)
    assert(wired.filter(col("top_word_frac").isNull || col("top_bigram_frac").isNull
      || col("distinct_word_ratio").isNull).count() == 0)
  }

  test("embedQuant codes stay in [0,255] and reconstruction meets the bound") {
    val q = SimilaritySuite.embedQuant(spark, sf).cache()
    assert(q.filter(!col("within_bound")).count() == 0,
      "quantization error above half-scale bound")
    // q_sum of 64 codes in [0,255] is bounded by 64*255
    assert(q.filter(col("q_sum") < 0 || col("q_sum") > 64L * 255L).count() == 0)
    q.unpersist()
  }

  test("funnel stage populations are monotonically non-increasing") {
    val stages = EventSuite.funnel(spark, sf)
      .as[(String, Long)].collect().sortBy(_._1).map(_._2)
    assert(stages.length == 3)
    assert(stages(0) >= stages(1) && stages(1) >= stages(2),
      s"funnel not monotone: ${stages.toSeq}")
  }

  test("contamFrac flags the benchmark docs themselves at exactly 1.0") {
    val flagged = TextSuite.contamFrac(spark, sf).cache()
    // every benchmark doc overlaps itself completely
    assert(flagged.filter(col("doc_id") < 5 && col("contam_frac") =!= 1.0)
      .count() == 0, "a benchmark doc scored below full overlap")
    assert(flagged.filter(col("doc_id") < 5).count() == 5)
    // fraction is a fraction, and hits can never exceed the doc's shingles
    assert(flagged.filter(col("n_hits") > col("n_sh")
      || col("contam_frac") < 0 || col("contam_frac") > 1).count() == 0)
    flagged.unpersist()
  }

  test("adaptiveQuality keeps the top three quarters of every source") {
    val aq = TextSuite.adaptiveQuality(spark, sf).cache()
    assert(aq.filter(col("n_kept") > col("n_docs")).count() == 0)
    // cume_dist >= 0.25 keeps >= 75% of rows (ties only ADD rows at the
    // cut, never remove them)
    assert(aq.filter(col("n_kept") * 4 < col("n_docs") * 3).count() == 0,
      "a source kept fewer than 3/4 of its docs")
    aq.unpersist()
  }

  test("sourceOverlap emits ordered source pairs with positive counts") {
    val so = TextSuite.sourceOverlap(spark, sf).cache()
    assert(so.count() > 0, "fixture has cross-source near-dups; none found")
    assert(so.filter(col("source_a") >= col("source_b")).count() == 0,
      "pair ordering not canonical")
    assert(so.filter(col("n_pairs") < 1).count() == 0)
    so.unpersist()
  }

  test("labelCentroids yields every unordered label pair with |cos| <= 1") {
    val lc = SimilaritySuite.labelCentroids(spark, sf).cache()
    val n = graft.model.Tables.embeddings(spark, sf)
      .select(col("label")).distinct().count()
    assert(lc.count() == n * (n - 1) / 2,
      s"expected C($n,2) pairs, got ${lc.count()}")
    assert(lc.filter(col("label_a") >= col("label_b")).count() == 0)
    assert(lc.filter(abs(col("cosine")) > 1.0).count() == 0,
      "cosine out of range")
    lc.unpersist()
  }

  test("textRedaction: hit accounting equals token-level recount, removal exact") {
    val docs = graft.model.Tables.documents(spark, sf)
    // independent recount at token granularity: the corpus is whitespace-
    // separated words, so \b-regex hits == exact token matches
    val tok = docs.select(col("source"), explode(tokens(col("text"))).as("t"))
    val expected = tok.groupBy(col("source"))
      .agg(sum(when(col("t") === "customer" || col("t") === "key", 1L)
        .otherwise(0L)).as("hits"),
        sum(when(col("t") === "customer", 2L).otherwise(0L)).as("removed"))
      .as[(String, Long, Long)].collect()
      .map { case (s, h, r) => s -> ((h, r)) }.toMap
    val got = TextSuite.textRedaction(spark, sf)
      .select(col("source"), col("total_hits"), col("chars_removed"))
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (s, h, r) =>
      assert((h, r) == expected(s),
        s"$s: scrub said ($h hits, $r removed), recount ${expected(s)}")
    }
  }

  test("bpePairs: top-20 equals a brute-force adjacent-pair recount") {
    val texts = graft.model.Tables.documents(spark, sf)
      .select(col("text")).as[String].collect()
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      val w = t.trim.split("\\s+").filter(_.nonEmpty)
      w.iterator.zip(w.iterator.drop(1)).foreach { case (a, b) =>
        val p = a + " " + b
        counts(p) = counts.getOrElse(p, 0L) + 1
      }
    }
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = TextSuite.bpePairs(spark, sf)
      .as[(String, Long)].collect().toSeq
    assert(got == expected, s"top-20 merge pairs diverge:\n$got\n$expected")
  }

  test("weightedSample: dense per-lang ranks, min-draw priority, determinism") {
    val ws = TextSuite.weightedSample(spark, sf, k = 16).cache()
    val langs = graft.model.Tables.documents(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // per-language: exactly min(k, |lang|) rows, ranks dense from 1
    val perLang = ws.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), min(col("rnk")).as("lo"),
        max(col("rnk")).as("hi"), countDistinct(col("rnk")).as("d"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(perLang.nonEmpty)
    perLang.foreach { case (lang, n, lo, hi, d) =>
      assert(n == math.min(16L, langs(lang)), s"$lang sampled $n")
      assert(lo == 1L && hi == n && d == n, s"$lang ranks not dense 1..$n")
    }
    // rank order IS min-chunk-draw order: recompute each sampled doc's
    // priority with the same xxhash64 draws and check monotonicity in rnk
    val docs = graft.model.Tables.documents(spark, sf)
    val prios = docs.join(ws.select(col("doc_id"), col("lang"), col("rnk")),
        Seq("doc_id", "lang"))
      .select(col("doc_id"), col("lang"), col("rnk"),
        tokenCount(col("text")).cast("long").as("tc"))
      .select(col("doc_id"), col("lang"), col("rnk"),
        explode(sequence(lit(0L),
          greatest(lit(1L), expr("(tc + 31) div 32")) - 1)).as("i"))
      .groupBy(col("lang"), col("rnk"), col("doc_id"))
      .agg(min(xxhash64(col("doc_id"), col("i"))).as("p"))
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1)
    prios.foreach { case (lang, rows) =>
      val byRank = rows.sortBy(_._2).map(r => (r._4, r._3)) // (p, doc_id)
      assert(byRank.sorted.sameElements(byRank),
        s"$lang sample order disagrees with (min draw, doc_id) order")
    }
    // bit-reproducible run to run
    val again = TextSuite.weightedSample(spark, sf, k = 16)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(again == ws.as[(String, Long, Long, Long)].collect().toSet,
      "weighted sample changed between runs")
    ws.unpersist()
  }
}
