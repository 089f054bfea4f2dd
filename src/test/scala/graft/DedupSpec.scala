package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // base doc + variants: near-dup (1 word changed), exact dup (case/space),
  // and an unrelated doc
  private val base = (1 to 60).map(i => s"w$i").mkString(" ")
  private val nearDup = (1 to 60).map(i => if (i == 30) "CHANGED" else s"w$i").mkString(" ")
  private val unrelated = (100 to 160).map(i => s"z$i").mkString(" ")
  private lazy val docs = Seq(
    (0L, base), (1L, base.toUpperCase.replace(" ", "  ")), (2L, nearDup), (3L, unrelated)
  ).toDF("doc_id", "text")

  test("exact dedup groups case/whitespace variants") {
    val groups = Dedup.exact(docs).collect()
    assert(groups.length == 3)
    val g = groups.find(_.getAs[Long]("n_copies") == 2).get
    assert(g.getAs[Long]("canonical_id") == 0L)
  }

  test("minhash estimate tracks exact jaccard and LSH finds the near-dup pair") {
    val pairs = Dedup.minhashPairs(docs, threshold = 0.3)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    // doc 2 differs from doc 0 in 1 word => 3 of 58 shingles differ;
    // exact jaccard = 55/61 ~ 0.90
    val est = pairs.getOrElse((0L, 2L), fail(s"LSH missed the near-dup pair; got ${pairs.keys}"))
    assert(est > 0.7 && est <= 1.0, s"estimate $est far from exact ~0.90")
    // unrelated doc must not pair with anything
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash estimate agrees with exact ngram jaccard within 0.15") {
    val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.3)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    val est = Dedup.minhashPairs(docs, threshold = 0.3)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(exact.contains((0L, 2L)))
    assert(math.abs(exact((0L, 2L)) - est((0L, 2L))) < 0.15)
  }

  test("stop-shingle pruning bounds hot-shingle buckets without losing real pairs") {
    // 40 docs sharing ONE universal shingle ("common boiler plate") but
    // otherwise disjoint, plus one genuine near-dup pair (ids 100, 101)
    val hot = (0 until 40).map { i =>
      (i.toLong, s"common boiler plate u${i}a u${i}b u${i}c u${i}d u${i}e")
    }
    val realA = (1 to 30).map(i => s"r$i").mkString(" ")
    val realB = (1 to 30).map(i => if (i == 15) "X" else s"r$i").mkString(" ")
    val corpus = (hot ++ Seq((100L, realA), (101L, realB))).toDF("doc_id", "text")

    // cutoff below the hot shingle's 40/42 df: the universal shingle is
    // dropped, so the 40 boiler-plate docs — whose only overlap is that
    // shingle — produce ZERO pairs instead of C(40,2) = 780 join rows
    val pruned = Dedup.ngramJaccardPairs(corpus, threshold = 0.01,
        maxDocFreqFrac = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(pruned.exists { case (a, b, j) => a == 100L && b == 101L && j > 0.5 },
      s"pruning must keep the genuine near-dup pair: ${pruned.mkString(",")}")
    assert(pruned.forall { case (a, b, _) => a >= 100L && b >= 100L },
      s"hot-shingle-only pairs must be pruned away: ${pruned.length} pairs")

    // with the cutoff above the hot shingle's df nothing is pruned: the
    // quadratic bucket is back (semantics unchanged relative to no pruning)
    val unpruned = Dedup.ngramJaccardPairs(corpus, threshold = 0.01,
        maxDocFreqFrac = 1.0)
      .as[(Long, Long, Double)].collect()
    assert(unpruned.length == pruned.length + 40 * 39 / 2,
      s"expected the hot shingle to contribute C(40,2) pairs: ${unpruned.length}")
  }

  test("connected components label chains and cliques to their min doc id") {
    // chain 1-2-3-4 (diameter 3), clique {10,11,12}, pair {20,21};
    // doc 30 appears in no pair -> not emitted (its own canonical)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)
    ).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs, iters = 6)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L), s"bad labels: $got")
  }

  test("fixture shingle df stays below the default prune cutoff (headroom)") {
    // the engine AND the DuckDB oracles now both prune at
    // max(0.02 * n_docs, 8) — this pins the complementary fixture property
    // that nothing actually prunes there, so a fixture refresh that grows a
    // hot shingle past the cutoff is caught here (not as a silent semantic
    // shift), and the measured df numbers quoted in Dedup.ngramJaccardPairs
    // stay honest
    import graft.functions.TextFunctions.shingleHashes
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = graft.model.Tables.documents(spark, s"/root/testdata/$sf")
      val sh = docs.select(col("doc_id"),
        explode(shingleHashes(col("text"), 3)).as("h"))
      val (maxDf, nDocs) = sh.groupBy(col("h")).count()
        .agg(max(col("count"))).as[Long].head() -> docs.count()
      val cutoff = math.min(math.max(nDocs * 0.02, 8.0), 256.0)
      assert(maxDf <= cutoff,
        s"$sf: max shingle df $maxDf exceeds prune cutoff $cutoff — " +
          "the wired dedup queries would now diverge from an unpruned run")
    }
  }

  test("connected components: iters=4 is a fixpoint on the fixture; " +
    "unconverged detects an undersized iters") {
    // the wired dedup_clusters parameters must fully converge — one more
    // round is a no-op (ADVICE r2: expose convergence as an assertion)
    val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.01")
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.2)
      .persist()
    try {
      val labels = Dedup.connectedComponents(pairs, iters = 4).persist()
      assert(Dedup.unconverged(pairs, labels).isEmpty,
        "dedup_clusters iters=4 no longer converges on the fixture")
      labels.unpersist(blocking = false)
    } finally pairs.unpersist(blocking = false)

    // sanity of the detector itself: a diameter-5 chain cannot converge in
    // 2 rounds, and unconverged must say so
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val short = Dedup.connectedComponents(chain, iters = 2)
    assert(!Dedup.unconverged(chain, short).isEmpty,
      "unconverged failed to flag a known-undersized iters")
  }

  test("fixpoint components converge on a chain far deeper than any " +
    "fixed-depth default") {
    // a 30-hop path (diameter 30 >> the wired iters=4) plus a separate
    // triangle: the fixpoint variant must label both exactly
    val chain = (1L until 30L).map(i => (i, i + 1))
    val triangle = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val pairs = (chain ++ triangle).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponentsFixpoint(pairs)
      .as[(Long, Long)].collect().toMap
    assert((1L to 30L).forall(labels(_) == 1L),
      s"chain must flood to min id 1: ${labels.filter(_._1 <= 30)}")
    assert((100L to 102L).forall(labels(_) == 100L))
    assert(Dedup.unconverged(pairs,
      Dedup.connectedComponentsFixpoint(pairs)).isEmpty,
      "fixpoint output must be a fixpoint")
    Dedup.releaseComponentCache(spark)
  }

  test("cluster_split holds a diameter-11 chain in one fold (fixpoint path)") {
    // the leakage scenario the fixed-depth labeling misses: a near-dup
    // CHAIN deeper than any fixed iters (version ladders, boilerplate
    // families). 12 chained docs + 2 singletons through the production
    // cluster-split path: the chain must resolve to ONE cluster, so its
    // docs structurally land in one fold — a depth-4 labeling would split
    // it into multiple clusters and let fold assignment straddle the chain.
    val docs = (1L to 14L).toDF("doc_id")
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val folds = graft.operators.TextSuite.clusterSplitFolds(docs, chain)
      .collect()
    assert(folds.map(_.getAs[Long]("n_docs")).sum == 14L)
    assert(folds.map(_.getAs[Long]("n_clusters")).sum == 3L,
      s"chain must be exactly one cluster (plus 2 singletons): " +
        folds.mkString(", "))
    assert(folds.count(_.getAs[Long]("n_docs") >= 12L) == 1,
      s"all 12 chained docs must share one fold: ${folds.mkString(", ")}")
    Dedup.releaseComponentCache(spark)
  }

  test("fixpoint components refuse to return partial labels") {
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponentsFixpoint(chain, maxIters = 3)
    }
    assert(e.getMessage.contains("no fixpoint"))
    Dedup.releaseComponentCache(spark)
  }

  test("edge caches are query-scoped: interleaved invocations both stay live") {
    // two component computations on one session, labels executed AFTER
    // both were constructed — the single-slot design evicted the first
    // cache and silently recomputed; the registry keeps both
    val a = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val b = Seq((7L, 8L)).toDF("doc_a", "doc_b")
    val la = Dedup.connectedComponents(a, iters = 2)
    val lb = Dedup.connectedComponents(b, iters = 2)
    assert(la.as[(Long, Long)].collect().toMap == Map(1L -> 1L, 2L -> 1L))
    assert(lb.as[(Long, Long)].collect().toMap == Map(7L -> 7L, 8L -> 7L))
    Dedup.releaseComponentCache(spark)
  }

  test("simhash: identical texts hash identically, near-dups land close") {
    val sh = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(2L)) < hamming(sh(0L), sh(3L)),
      "near-dup must be closer in hamming space than unrelated doc")
    // bands > maxHamming guarantees the banding cannot miss (pigeonhole)
    val dupPair = Dedup.simhashPairs(docs, maxHamming = 10, bands = 16)
      .as[(Long, Long, Int)].collect()
    assert(dupPair.exists(p => p._1 == 0L && p._2 == 2L),
      s"simhash banding missed the near-dup pair: ${dupPair.mkString(",")}")
  }

  test("delta dedup equals the best straddling pair of the full pairing") {
    val sf = "/root/testdata/sf0.001"
    val fixture = graft.model.Tables.documents(spark, sf)
    val delta = Dedup.deltaNearDups(
        corpus = fixture.filter(col("doc_id") % 10 =!= 0),
        batch = fixture.filter(col("doc_id") % 10 === 0))
      .as[(Long, Long, Double)].collect().toSeq.sorted
    // reference: full all-pairs run, restricted to pairs straddling the
    // batch boundary, best corpus match per batch doc (same tie-break)
    val expected = Dedup.ngramJaccardPairs(fixture, n = 3, threshold = 0.2)
      .as[(Long, Long, Double)].collect().toSeq
      .flatMap { case (a, b, j) =>
        if (a % 10 == 0 && b % 10 != 0) Some((a, b, j))
        else if (b % 10 == 0 && a % 10 != 0) Some((b, a, j))
        else None
      }
      .groupBy(_._1).values
      .map(_.minBy { case (_, dup, j) => (-j, dup) }).toSeq.sorted
    assert(delta.nonEmpty, "fixture has straddling near-dups; none found")
    assert(delta == expected,
      s"delta dedup diverged from full pairing:\n$delta\nvs\n$expected")
  }

  test("substring coverage: shared run covered exactly, fragments ignored") {
    // doc 10 and 11 share one 12-token run (positions 4..15 of doc 10,
    // 0..11 of doc 11); doc 12 shares only 5 consecutive tokens (< minLen);
    // doc 13 is unrelated. With minLen = 8 the shared run contributes
    // exactly 12 covered tokens to each sharer, nothing else registers.
    val run = (1 to 12).map(i => s"s$i").mkString(" ")
    val corpus = Seq(
      (10L, s"a1 a2 a3 a4 $run a5 a6"),
      (11L, s"$run b1 b2 b3"),
      (12L, "c1 c2 " + (1 to 5).map(i => s"s$i").mkString(" ") + " c3 c4"),
      (13L, (1 to 20).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.substringCoverage(corpus, minLen = 8)
      .as[(Long, Int, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(10L)._3 == 12L, s"doc 10 covered ${out(10L)._3}, want 12")
    assert(out(11L)._3 == 12L, s"doc 11 covered ${out(11L)._3}, want 12")
    assert(out(12L)._3 == 0L, "sub-minLen fragment must not register")
    assert(out(13L)._3 == 0L, "unrelated doc must not register")
    // 12-token run = 5 duplicated 8-token windows on each side
    assert(out(10L)._4 == 5L && out(11L)._4 == 5L)
    assert(math.abs(out(10L)._5 - 12.0 / out(10L)._2) < 1e-15)
  }

  test("substring coverage: within-doc repetition counts as duplication") {
    // one doc repeating an 8-token run twice, nothing shared across docs
    val run = (1 to 8).map(i => s"r$i").mkString(" ")
    val corpus = Seq(
      (20L, s"$run x1 x2 $run"),
      (21L, (1 to 18).map(i => s"v$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.substringCoverage(corpus, minLen = 8)
      .as[(Long, Int, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(20L)._3 == 16L,
      s"both occurrences of the repeated run must be covered: ${out(20L)._3}")
    assert(out(21L)._3 == 0L)
  }

  test("span contamination: eval overlap covered exactly, rest untouched") {
    // corpus doc 30 embeds a 10-token run from the eval doc (positions
    // 3..12); doc 31 shares nothing. With minLen = 8 exactly those 10
    // tokens are covered in doc 30; the eval doc itself is NOT in the
    // corpus frame here, so no control row.
    val run = (1 to 10).map(i => s"e$i").mkString(" ")
    val evalDocs = Seq((0L, s"$run tail1 tail2")).toDF("doc_id", "text")
    val corpus = Seq(
      (30L, s"x1 x2 x3 $run y1 y2"),
      (31L, (1 to 20).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.spanContamination(corpus, evalDocs, minLen = 8)
      .as[(Long, Int, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(30L)._3 == 10L,
      s"embedded eval run must be covered exactly: ${out(30L)}")
    assert(out(30L)._4 == 3L, "a 10-token run holds 3 duplicated 8-windows")
    assert(out(31L)._3 == 0L)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("sentence dedup: keep-first removes the later identical doc wholesale") {
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    val corpus = Seq((0L, text), (1L, text)).toDF("doc_id", "text")
    val out = Dedup.sentenceDedup(corpus)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(0L)._3 == 0L, "first occurrence must keep everything")
    assert(out(1L)._3 == out(1L)._2, "every sentence of the copy is a repeat")
    assert(out(1L)._6 == 1.0)
    assert(out(0L)._2 == out(1L)._2, "identical text, identical segmentation")
  }

  test("sentence dedup: content-defined boundaries survive a prefix shift") {
    // a boundary token (md5 starts with '0') placed before the shared run
    // realigns segmentation, so the run's sentences match despite the two
    // docs' different prefix lengths — the CDC property fixed windows lack
    val boundaryTok = (1 to 10000).map(i => s"b$i")
      .find(t => md5Hex(t).startsWith("0")).get
    val shared = (1 to 30).map(i => s"s$i").mkString(" ")
    val corpus = Seq(
      (0L, s"p1 p2 p3 p4 p5 $boundaryTok $shared"),
      (1L, s"q1 $boundaryTok $shared")
    ).toDF("doc_id", "text")
    val out = Dedup.sentenceDedup(corpus)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(0L)._3 == 0L)
    assert(out(1L)._3 == out(1L)._2 - 1,
      s"all of doc 1 after its first sentence is shared: ${out(1L)}")
  }
}
