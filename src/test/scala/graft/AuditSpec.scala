package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.{EventSuite, RelationalSuite, TextSuite}

/** Structural guarantees of the round-5 QA/governance operators
  * (passage_dedup, pii_scrub, price_outliers, table_profile). Cross-engine
  * value parity lives in the DuckDB oracles; these pin the invariants an
  * oracle hash can't express.
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("passageDedup tiles: n_passages = n_tokens / w, dups bounded") {
    val w = 12
    val got = TextSuite.passageDedup(spark, sf, w)
    val expected = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= w)
      .select(col("doc_id"), (col("n_tokens") / w).cast("long").as("want"))
    val joined = got.join(expected, Seq("doc_id"), "full").cache()
    assert(joined.filter(col("want").isNull || col("n_passages").isNull).count() == 0,
      "doc set mismatch: every doc with >= w tokens gets exactly one row")
    assert(joined.filter(col("n_passages") =!= col("want")).count() == 0,
      "passage count must tile the token count at stride w")
    assert(joined.filter(col("n_dup_passages") > col("n_passages")).count() == 0)
    assert(joined.filter(col("dup_frac") < 0 || col("dup_frac") > 1).count() == 0)
    joined.unpersist()
    // near-dup fixtures must actually surface shared passages
    assert(got.filter(col("n_dup_passages") > 0).count() > 0,
      "fixture corpus contains near-dups; some passage must be shared")
  }

  test("piiScrub: stable pseudonyms, banded quasi-identifiers, no raw PII") {
    val c = graft.model.Tables.customer(spark, sf)
    val out = RelationalSuite.piiScrub(spark, sf).cache()
    assert(out.count() == c.count())
    assert(out.columns.toSet ==
      Set("c_custkey", "name_hash", "acctbal_band", "c_mktsegment"),
      "raw name/balance must not survive the scrub")
    assert(out.filter(length(col("name_hash")) =!= 64).count() == 0,
      "SHA-256 hex pseudonym")
    assert(out.filter(col("acctbal_band") % 1000.0 =!= 0.0).count() == 0,
      "balance generalized to 1000-unit bands")
    // pseudonym is deterministic and injective on distinct names
    val names = c.select(countDistinct(col("c_name"))).as[Long].head()
    val hashes = out.select(countDistinct(col("name_hash"))).as[Long].head()
    assert(names == hashes, "hash must be stable + collision-free on fixture")
    out.unpersist()
  }

  test("priceOutliers: MAD fence marks exactly the manually-fenced rows") {
    val out = RelationalSuite.priceOutliers(spark, sf).cache()
    assert(out.count() == 3)
    assert(out.filter(col("mad") <= 0).count() == 0)
    assert(out.filter(col("n_outliers") >= col("n")).count() == 0)
    // recompute one group's fence from first principles
    val li = graft.model.Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "A")
      .select(col("l_extendedprice").cast("double")).as[Double].collect().sorted
    def median(xs: Array[Double]): Double = {
      val idx = 0.5 * (xs.length - 1)
      val lo = xs(idx.toInt)
      val hi = xs(math.min(idx.toInt + 1, xs.length - 1))
      lo + (hi - lo) * (idx - idx.toInt)
    }
    val med = median(li)
    val mad = median(li.map(x => math.abs(x - med)).sorted)
    val wantOutliers = li.count(x => math.abs(x - med) > 5.0 * mad)
    val gotRow = out.filter(col("l_returnflag") === "A")
      .select(col("n_outliers"), col("mad")).as[(Long, Double)].head()
    assert(gotRow._1 == wantOutliers.toLong, "outlier count vs manual fence")
    assert(gotRow._2 == mad, "engine MAD vs manual interpolated median")
    out.unpersist()
  }

  test("tableProfile: one row per column, counts consistent") {
    val out = RelationalSuite.tableProfile(spark, sf).cache()
    assert(out.count() == 5)
    assert(out.select(countDistinct(col("column_name"))).as[Long].head() == 5)
    assert(out.filter(col("n_nonnull") > col("n_rows")).count() == 0)
    assert(out.filter(col("n_distinct") > col("n_nonnull")).count() == 0)
    assert(out.filter(col("min_val").isNull || col("max_val").isNull).count() == 0)
    out.unpersist()
  }

  test("schema evolution: explicit union schema = mergeSchema, zero inference jobs") {
    import graft.operators.StorageSuite
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    // mergeSchema path first: writes the generations (cached per JVM)
    // and is the semantic reference
    val merged = StorageSuite.schemaEvolution(spark, sf)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(merged.map(_._1).contains("legacy"),
      "v1 rows must surface as the NULL->legacy bucket")
    // the explicit-schema read must CONSTRUCT without any job: no
    // mergeSchema footer sweep, no schema-inference pass — the scale
    // property the variant exists for (catalog schema -> straight to scan)
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val explicit = try {
      val df = StorageSuite.schemaEvolutionExplicit(spark, sf)
      df.queryExecution.assertAnalyzed()
      org.apache.spark.GraftTestBridge.waitListenerBusEmpty(spark.sparkContext)
      assert(jobs == 0,
        s"explicit-schema construction ran $jobs job(s) — footer/schema " +
          "inference crept back in")
      df.as[(String, Long, Double)].collect().sortBy(_._1)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(explicit.toSeq == merged.toSeq,
      "explicit union schema and mergeSchema must read identical data")
  }

  test("sourceConcentration: Lorenz invariants on randomized source tables") {
    val rng = new scala.util.Random(0xC0CE17L)
    (1 to 5).foreach { trial =>
      val nSrc = 1 + rng.nextInt(12)
      val rows = (0 until nSrc).flatMap { s =>
        val nDocs = 1 + rng.nextInt(20)
        (0 until nDocs).map(d =>
          (s"src_$s", s.toLong * 1000 + d, 1L + rng.nextInt(5000)))
      }
      val docs = rows.toDF("source", "doc_id", "n_chars")
        .repartition(4) // invariants must not depend on physical layout
      val out = TextSuite.sourceConcentrationOf(docs)
        .orderBy(col("rank"))
        .as[(String, Long, Long, Long, Double)].collect()
      assert(out.length == nSrc, s"trial $trial: one row per source")
      assert(out.map(_._2).toSeq == (1L to nSrc).toSeq,
        s"trial $trial: rank must be the dense 1..n ranking")
      // ranked by size, desc (name tiebreak)
      assert(out.sliding(2).forall {
        case Array(a, b) => a._4 > b._4 || (a._4 == b._4 && a._1 < b._1)
        case _           => true
      }, s"trial $trial: rows must rank by n_chars desc, source asc")
      // Lorenz curve: cum_share monotone nondecreasing, last EXACTLY 1.0
      // (exact-long running sum, one IEEE division of total/total)
      assert(out.sliding(2).forall {
        case Array(a, b) => a._5 <= b._5
        case _           => true
      }, s"trial $trial: cum_share must be monotone nondecreasing")
      assert(out.last._5 == 1.0,
        s"trial $trial: final cumulative share must be exactly 1.0")
      assert(out.head._5 > 0.0 && out.forall(r => r._5 <= 1.0))
      // shares recompute from the long columns bit-exactly
      val total = out.map(_._4).sum
      var running = 0L
      out.foreach { r =>
        running += r._4
        assert(r._5 == running.toDouble / total.toDouble,
          s"trial $trial: cum_share must be the exact-long running " +
            "sum divided once in IEEE")
      }
    }
  }

  test("tableChecksum: order-independent, and any mutation moves the digest") {
    import graft.operators.StorageSuite
    val base = StorageSuite.tableChecksum(spark, sf)
      .as[(String, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(base.size == 10, "one digest row per fixture table")
    // order independence: a different physical row order, same digest
    val shuffled = graft.model.Tables.orders(spark, sf)
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val reordered = StorageSuite.checksumOf(shuffled, "orders")
      .as[(String, Long, String)].head()
    assert(reordered._3 == base("orders")._3,
      "row order must not change the checksum")
    // sensitivity: one mutated cell moves the digest
    val mutated = graft.model.Tables.orders(spark, sf)
      .withColumn("o_totalprice",
        when(col("o_orderkey") === 1L, col("o_totalprice") + 0.01)
          .otherwise(col("o_totalprice")))
    val changed = StorageSuite.checksumOf(mutated, "orders")
      .as[(String, Long, String)].head()
    assert(changed._3 != base("orders")._3,
      "a single-cell mutation must change the checksum")
    assert(changed._2 == base("orders")._2)
  }

  test("tsComovement: crafted series hit +1/-1 to the ulp, constants excluded") {
    // a and b identical up to affine scale (corr +1); c is a's mirror
    // (corr -1); d is constant (zero variance — excluded). The integer
    // statistics are exact, but corr passes through sqrt(v)^2 which can
    // land an ulp off v — so the corners are pinned to a 2-ulp band, not
    // bitwise (cross-engine bitwise equality is the ORACLE's job: both
    // engines run the identical expression)
    val hours = (0L until 8L).map(_ * 3600L)
    val base = Seq(1L, 5L, 2L, 7L, 3L, 9L, 4L, 6L)
    val grid = hours.zip(base).flatMap { case (h, v) =>
      Seq(("a", h, v), ("b", h, 2 * v + 10), ("c", h, 20 - v), ("d", h, 4L))
    }.toDF("event_type", "hour_s", "cnt")
    val got = EventSuite.tsComovementOf(grid, w = 4, k = 100)
      .select($"ta", $"tb", $"corr")
      .as[(String, String, Double)].collect().toSeq
    assert(got.nonEmpty && !got.exists(r => r._1 == "d" || r._2 == "d"),
      s"constant series must be excluded: $got")
    got.filter(r => r._1 == "a" && r._2 == "b").foreach { r =>
      assert(math.abs(r._3 - 1.0) <= 5e-16,
        s"affine twin must correlate 1.0 to the ulp: $r") }
    got.filter(r => r._1 == "a" && r._2 == "c").foreach { r =>
      assert(math.abs(r._3 + 1.0) <= 5e-16,
        s"mirror must correlate -1.0 to the ulp: $r") }
    assert(got.exists(r => r._1 == "a" && r._2 == "b") &&
      got.exists(r => r._1 == "a" && r._2 == "c"),
      s"expected a-b and a-c windows present: $got")
  }

  test("kAnonymity: exact class accounting on crafted sizes, monotone in k") {
    // classes of sizes 1, 1, 3, 5, 10 (20 rows):
    //   k=2  -> below: {1,1}       = 2 classes,  2 rows, frac 0.10
    //   k=5  -> below: {1,1,3}     = 3 classes,  5 rows, frac 0.25
    //   k=10 -> below: {1,1,3,5}   = 4 classes, 10 rows, frac 0.50
    val qids = Seq(1, 1, 3, 5, 10).zipWithIndex
      .flatMap { case (sz, cls) => Seq.fill(sz)((s"c$cls", cls % 2)) }
      .toDF("qa", "qb")
    val got = RelationalSuite.kAnonymityOf(qids).orderBy($"k")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(got == Seq((2, 2L, 2L, 0.10), (5, 3L, 5L, 0.25),
      (10, 4L, 10L, 0.50)), s"audit rows: $got")
    // monotone: growing k can only add at-risk classes/rows
    assert(got.map(_._2) == got.map(_._2).sorted &&
      got.map(_._3) == got.map(_._3).sorted)
    // every-row-unique corner: everything below any k >= 2
    val unique = (0 until 7).map(i => (s"u$i", i)).toDF("qa", "qb")
    val all = RelationalSuite.kAnonymityOf(unique).orderBy($"k")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(all.forall { case (_, cb, rar, f) => cb == 7L && rar == 7L && f == 1.0 },
      s"singleton classes must all be at risk: $all")
  }

  test("l_diversity: crafted per-class distinct-sensitive accounting") {
    // class A: 4 rows, sensitive all identical (1 distinct) — below every l
    // class B: 6 rows, 2 distinct sensitive values — below l=4 but not l=2
    // class C: 10 rows, 5 distinct — below neither candidate
    val rows = (Seq.fill(4)(("A", 9L)) ++
        (0 until 6).map(i => ("B", (i % 2).toLong)) ++
        (0 until 10).map(i => ("C", (i % 5).toLong)))
      .toDF("qa", "sensitive")
    val got = RelationalSuite.lDiversityOf(rows, ls = Seq(2, 4))
      .orderBy($"l").as[(Int, Long, Long, Double)].collect().toSeq
    assert(got == Seq((2, 1L, 4L, 0.20), (4, 2L, 10L, 0.50)),
      s"audit rows: $got")
    // a class where EVERY row shares one sensitive value is the exact
    // disclosure k-anonymity misses: k_anonymity at k=4 sees class A as
    // safe (size 4 >= 4) while l_diversity at l=2 flags all 4 rows
    val kview = RelationalSuite.kAnonymityOf(
        rows.select($"qa"), ks = Seq(4))
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(kview == Seq((4, 0L, 0L, 0.0)),
      s"classes are all k-anonymous at k=4: $kview")
  }

  test("t_closeness: a class passing k AND l still fails t (the gates are non-redundant)") {
    // class A: 4 rows on bands {0,0,0,1} — k=4 passes (size 4), l=2
    // passes (2 distinct values), but its distribution piles onto the
    // low bands while the population is spread: hand-computed EMD.
    // class B: 16 rows, 4 each on {6,7,8,9} — the population bulk.
    // Bands [0,1,6,7,8,9], m=6, N=20; global cum [3,4,8,12,16,20].
    //   A (n_c=4):  cum [3,4,4,4,4,4]; Σ|20·cumA − 4·cumG|
    //     = 48+64+48+32+16+0 = 208 → emd = 208/(4·20·5)  = 0.52
    //   B (n_c=16): cum [0,0,4,8,12,16]; same Σ = 208
    //     → emd = 208/(16·20·5) = 0.13
    // t=0.3 flags exactly A: 1 class, 4 rows, frac 0.2.
    val rows = (Seq(("A", 0L), ("A", 0L), ("A", 0L), ("A", 1L)) ++
        (0 until 16).map(i => ("B", (6 + i % 4).toLong)))
      .toDF("qa", "sensitive")
    val t = RelationalSuite.tClosenessOf(rows, ts = Seq(0.3))
      .as[(Double, Long, Long, Double)].collect().toSeq
    assert(t == Seq((0.3, 1L, 4L, 0.2)), s"t-closeness audit rows: $t")
    // the same class is INVISIBLE to the other two gates:
    val kview = RelationalSuite.kAnonymityOf(rows.select($"qa"), ks = Seq(4))
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(kview == Seq((4, 0L, 0L, 0.0)), s"k=4 sees nothing: $kview")
    val lview = RelationalSuite.lDiversityOf(rows, ls = Seq(2))
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(lview == Seq((2, 0L, 0L, 0.0)), s"l=2 sees nothing: $lview")
    // single-band corner: EMD is defined 0 — no class can fail any t
    val oneBand = Seq(("A", 5L), ("A", 5L), ("B", 5L)).toDF("qa", "sensitive")
    val ob = RelationalSuite.tClosenessOf(oneBand, ts = Seq(0.3))
      .as[(Double, Long, Long, Double)].collect().toSeq
    assert(ob == Seq((0.3, 0L, 0L, 0.0)), s"single-band corner: $ob")
  }

  test("dp_release: epsilon ladder pointwise monotone, zero-mean cutoffs, bit-reproducible") {
    import graft.operators.HashOracles
    // (a) THRESHOLD-LEVEL ladder property, engine-free: one shared
    // uniform u drives the whole ladder, so for every u the noise
    // magnitude must never GROW as epsilon does (the quantile map of a
    // symmetric family ordered by dispersion). Sweep a dense signed-
    // domain grid plus the exact cutpoints of every ladder member.
    val ladder = Seq(0.5, 1.0, 2.0)
    val maxK = 16
    def noiseOf(u: Long, eps: Double): Int = {
      val ts = HashOracles.dLaplaceThresholdsSigned(eps, maxK)
      val i = ts.indexWhere(u < _)
      (if (i < 0) ts.size else i) - maxK
    }
    val sweep = (-5000 to 5000).map(i => (i.toDouble / 5000 * 9.1e18).toLong) ++
      ladder.flatMap(e => HashOracles.dLaplaceThresholdsSigned(e, maxK)
        .flatMap(t => Seq(t - 1, t)))
    for (u <- sweep; Seq(e1, e2) <- ladder.sliding(2)) {
      val (n1, n2) = (noiseOf(u, e1), noiseOf(u, e2))
      assert(math.abs(n1) >= math.abs(n2),
        s"ladder inversion at u=$u: |noise($e1)|=$n1 < |noise($e2)|=$n2")
      // same draw, same side: tightening epsilon must never flip sign
      assert(n1.sign * n2.sign >= 0, s"sign flip at u=$u: $n1 vs $n2")
    }
    // (b) cutoff symmetry: the renormalized table is symmetric about 0,
    // so cutoff_i + cutoff_{2K-1-i} = 2^64 exactly (BigInt domain)
    for (e <- ladder) {
      val ts = HashOracles.dLaplaceThresholdsUnsigned(e, maxK)
      for (i <- ts.indices)
        assert(ts(i) + ts(ts.size - 1 - i) == (BigInt(1) << 64),
          s"asymmetric cutoffs for eps=$e at $i")
    }
    // (c) ENGINE-LEVEL: crafted cells — the ladder rows for one cell
    // share the draw (monotone |released - n|), and a re-run is
    // bit-identical (determinism is the mechanism's whole claim)
    val rows = ((0 until 40).map(i => (i.toLong % 4, 0L)) ++
      (0 until 12).map(i => (9L, -1L))).toDF("nation", "band")
    def run() = RelationalSuite.dpReleaseOf(rows, ladder, maxK)
      .as[(Long, Long, Double, Long)].collect().toSeq.sorted
    val a = run()
    assert(a == run(), "dp release not bit-reproducible across runs")
    val trueN = Map((0L, 0L) -> 10L, (1L, 0L) -> 10L, (2L, 0L) -> 10L,
      (3L, 0L) -> 10L, (9L, -1L) -> 12L)
    a.groupBy(r => (r._1, r._2)).foreach { case (cell, rs) =>
      val byEps = rs.sortBy(_._3).map(r => math.abs(r._4 - trueN(cell)))
      assert(byEps == byEps.sorted.reverse,
        s"cell $cell ladder not monotone: $byEps")
    }
    // negative band exercised the two's-complement hash lane; the
    // oracle-side twin of that lane is covered by the driver hash gate
  }

  test("survivorRankCi: fewer than 3 survivors yields NULL bounds, never an inverted interval") {
    import org.apache.spark.sql.functions.col
    // nb = 2: rank 2 is the LARGER value and rank nb-1 = 1 the smaller —
    // selecting them would emit ci_lo > ci_hi (identically on both
    // engines, so the hash gate can't catch it); the nb >= 3 predicate
    // must NULL both instead (round-15 self-review finding)
    val two = Seq(("G", 0L, 1.0), ("G", 1L, 2.0)).toDF("priority", "b", "mean_b")
    val got2 = RelationalSuite.survivorRankCi(two, "mean_b", "b", Seq("priority"))
      .collect().head
    assert(got2.isNullAt(1) && got2.isNullAt(2), s"nb=2 must NULL: $got2")
    // nb = 3: the bounds exist and are ordered (both equal the median)
    val three = Seq(("G", 0L, 1.0), ("G", 1L, 2.0), ("G", 2L, 3.0))
      .toDF("priority", "b", "mean_b")
    val got3 = RelationalSuite.survivorRankCi(three, "mean_b", "b", Seq("priority"))
      .as[(String, Double, Double)].collect().head
    assert(got3 == (("G", 2.0, 2.0)), s"nb=3 bounds: $got3")
    // global (no partition) form used by bootstrap_diff
    val g = RelationalSuite.survivorRankCi(
        three.select(col("b"), col("mean_b").as("diff_b")), "diff_b", "b", Nil)
      .as[(Double, Double)].collect().head
    assert(g == ((2.0, 2.0)), s"global nb=3 bounds: $g")
  }

  test("bootstrap_ci: constant metric collapses the CI to the point estimate") {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types.DecimalType
    // 60 rows, every p identical: every resample's weighted mean equals
    // the constant exactly (sum(w*c)/sum(w) = c in exact decimal), so
    // ci_lo = mean_full = ci_hi bit-for-bit
    val const = spark.range(60).select(
      col("id").as("k"), lit("G").as("priority"),
      lit("42.50").cast(DecimalType(18, 2)).as("p"))
    val c = RelationalSuite.bootstrapCiOf(const)
      .as[(String, Double, Double, Double)].collect().toSeq
    assert(c == Seq(("G", 42.50, 42.50, 42.50)), s"constant collapse: $c")
    // and a varied metric: CI must bracket, lo < hi strictly (resample
    // means of non-constant data differ), everything deterministic so
    // this is a fixed property of the fixture, not a flaky sample
    val varied = spark.range(200).select(
      col("id").as("k"), lit("G").as("priority"),
      (col("id") % 37).cast(DecimalType(18, 2)).as("p"))
    val v = RelationalSuite.bootstrapCiOf(varied)
      .as[(String, Double, Double, Double)].collect().head
    assert(v._3 < v._4, s"degenerate CI on varied data: $v")
    assert(v._3 <= v._2 && v._2 <= v._4,
      s"CI must bracket the point estimate: $v")
  }

  test("bootstrap_ci: singleton group survives its zero-weight resamples") {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types.DecimalType
    // ONE row: P(w=0) = e^-1 per resample, so several of the 40 resamples
    // deterministically draw total weight 0 (pure hash function of (k, b)).
    // Before the ADVICE-r14 guard their NULL means entered the rank window
    // (Spark NULLs-first vs DuckDB NULLs-last — silent cross-engine
    // divergence); with the sum(w) > 0 filter every SURVIVING resample's
    // mean is exactly p (sum(w*p)/sum(w) = p), so the CI collapses to the
    // point estimate — a fixed property of the hash, not a flaky sample.
    val one = spark.range(1).select(
      lit(7L).as("k"), lit("G").as("priority"),
      lit("13.25").cast(DecimalType(18, 2)).as("p"))
    val c = RelationalSuite.bootstrapCiOf(one)
      .as[(String, Double, Double, Double)].collect().toSeq
    assert(c == Seq(("G", 13.25, 13.25, 13.25)),
      s"singleton-group collapse through the zero-weight guard: $c")
  }

  test("bootstrap_diff: exact null and separated corners, varied null straddles zero") {
    import org.apache.spark.sql.functions.{col, concat_ws, lit, when}
    import org.apache.spark.sql.types.DecimalType
    def two(baseP: org.apache.spark.sql.Column,
            newP: org.apache.spark.sql.Column) =
      spark.range(120).select(
        col("id").as("k"),
        when(col("id") < 60, lit("base")).otherwise(lit("new")).as("period"),
        when(col("id") < 60, baseP).otherwise(newP)
          .cast(DecimalType(18, 2)).as("p"))
    // both sides constant AND equal: every resample mean is the constant,
    // every diff is 0.0 exactly — CI [0, 0], not significant
    val nullCase = RelationalSuite.bootstrapDiffOf(
        two(lit("5.00"), lit("5.00")))
      .as[(Double, Double, Double, Double, Double, Boolean)].collect().head
    assert(nullCase == ((5.0, 5.0, 0.0, 0.0, 0.0, false)), s"null: $nullCase")
    // disjoint constants: every diff is exactly +10 — CI [10, 10],
    // significant
    val sep = RelationalSuite.bootstrapDiffOf(two(lit("10.00"), lit("20.00")))
      .as[(Double, Double, Double, Double, Double, Boolean)].collect().head
    assert(sep == ((10.0, 20.0, 10.0, 10.0, 10.0, true)), s"separated: $sep")
    // identical VARIED distributions on both sides: resample means jitter
    // independently per side, so the diff CI must straddle zero (a fixed,
    // deterministic property of the crafted data — not a flaky sample)
    val varied = RelationalSuite.bootstrapDiffOf(
        two(concat_ws("", lit(""), (col("id") % 7).cast("string")),
          concat_ws("", lit(""), ((col("id") - 60) % 7).cast("string"))))
      .as[(Double, Double, Double, Double, Double, Boolean)].collect().head
    assert(varied._1 == varied._2, s"sides must be identical: $varied")
    assert(varied._4 <= 0.0 && 0.0 <= varied._5 && !varied._6,
      s"identical populations must not test significant: $varied")
  }
}
