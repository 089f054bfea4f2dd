package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench.classify — the warm-pass health gate's pure core (round-10
  * verdict ask #1 / ADVICE r10). Every branch driven with synthetic
  * QStats: clean record, transient anomaly (p3 exonerates, headline
  * stays accountable), reproducible anomaly (unhealthy), contiguous
  * contention band (external), missing p3 (stays unattributed =
  * reproducible), and the exonerated pass-ratio check.
  */
class BenchHealthSpec extends AnyFunSuite {
  import Bench.{QStat, classify}

  private def q(sec: Double, jit: Double = 0.0, cls: Long = 0): QStat =
    QStat(sec, gc = 0.0, jit = jit, cls = cls, startMs = 0L, load = 1.0)

  /** n queries, pass-1 = pass-2 = 1 s each, overridden per index. */
  private def stats(n: Int, p2Over: Map[Int, Double] = Map.empty)
      : Seq[(String, QStat, QStat)] =
    (0 until n).map(i => (f"q$i%02d", q(1.0), q(p2Over.getOrElse(i, 1.0))))

  test("clean two-pass record: ok, headline binds to pass 2") {
    val h = classify(stats(10), Map.empty)
    assert(h.status == "ok" && h.ok && h.headlinePass == 2)
    assert(h.verdicts.isEmpty && !h.band)
  }

  test("single anomaly exonerated by p3: ok; headline metric stays pinned to pass 2") {
    // the unpivot_metrics shape: 1 s -> 18.7 s with jit/cls ~ 0
    val h = classify(stats(10, Map(4 -> 18.7)), Map("q04" -> 1.1))
    assert(h.verdicts.size == 1 && h.verdicts.head.transient &&
      h.verdicts.head.severe)
    assert(h.status == "ok" && h.ok)
    // headline is PINNED (round-13 verdict ask #3): contamination is
    // expressed via pass2Adj/status, never by switching the metric
    assert(h.headlinePass == 2)
    // exonerated ratio: 9x1 + 1.1 vs 10 -> no blowup
    assert(math.abs(h.pass2Adj - 10.1) < 1e-9)
  }

  test("severe anomaly reproduced by p3: unhealthy") {
    val h = classify(stats(10, Map(4 -> 18.7)), Map("q04" -> 17.9))
    assert(h.verdicts.size == 1 && !h.verdicts.head.transient)
    assert(h.status == "unhealthy" && !h.ok && h.headlinePass == 2)
  }

  test("anomaly with NO p3 measurement stays unattributed = unhealthy") {
    val h = classify(stats(10, Map(4 -> 18.7)), Map.empty)
    assert(h.status == "unhealthy" && !h.ok)
  }

  test("contiguous band of anomalies: external; headline metric still pinned") {
    val h = classify(stats(12, Map(3 -> 9.0, 4 -> 8.0, 5 -> 7.5)), Map.empty)
    assert(h.band && h.status == "external" && h.ok && h.headlinePass == 2)
    assert(h.reproducible.isEmpty)
  }

  test("committed drift section compares against the PREVIOUS round's snapshot") {
    // round-14 verdict "what's wrong" #1: the drift gate compared r14 to
    // an earlier r14 run. The committed record must name its baseline
    // round, and that round must be the previous one: during round N the
    // highest committed BENCH_r{K}.json is K = N-1 = baseline_round; at
    // judge time (after the driver commits BENCH_r{N}.json) it is K = N =
    // baseline_round + 1. Anything older means the snapshot went stale.
    val p = java.nio.file.Paths.get("BENCH_DETAIL.json")
    if (java.nio.file.Files.exists(p)) {
      val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      """"baseline_round":(\d+)""".r.findFirstMatchIn(text).foreach { m =>
        val baseline = m.group(1).toInt
        val rx = """BENCH_r(\d+)\.json""".r
        val maxK = Option(new java.io.File(".").listFiles()).toSeq.flatten
          .flatMap(f => rx.findFirstMatchIn(f.getName).map(_.group(1).toInt))
          .sorted.lastOption.getOrElse(0)
        assert(baseline == maxK || baseline == maxK - 1,
          s"drift baseline r$baseline is stale vs newest BENCH_r$maxK")
        assert(java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"baselines/BENCH_DETAIL_r$baseline.json")),
          s"baseline snapshot baselines/BENCH_DETAIL_r$baseline.json missing")
      }
    }
  }

  test("severe row inside a band: p3 attribution decides, not the band (ADVICE r14)") {
    // a severe 9x row packed between two mild 2.2x rows forms a 3-row
    // band; the old severe-only logic would have re-run it, the r14
    // elevated-band logic skipped ALL re-runs and called it external.
    // Now: a p3 that REPRODUCES severe flips unhealthy through the band...
    val banded = stats(12, Map(3 -> 2.2, 4 -> 9.0, 5 -> 2.3))
    val h = classify(banded, Map("q04" -> 8.5))
    assert(h.band, "three packed elevated rows must band")
    assert(h.status == "unhealthy",
      s"severe reproduced in isolation cannot hide behind the band: $h")
    // ...a p3 back at pass-1 level stays external (band took the blame)...
    val h2 = classify(banded, Map("q04" -> 1.1))
    assert(h2.band && h2.status == "external", s"exonerated in-band: $h2")
    // ...a banded severe row with NO p3 SCHEDULED keeps the band's
    // external verdict (reachable only past a >12-severe storm under the
    // severe-first ordering)...
    val h3 = classify(banded, Map.empty)
    assert(h3.band && h3.status == "external", s"no-p3 in-band default: $h3")
    // ...but a banded severe row whose re-run CRASHED kept no attribution
    // and must classify unhealthy, not hide behind the band — and the
    // reproducible ledger must NAME it (round-15 self-review findings)
    val h4 = classify(banded, Map.empty, p3Failed = Set("q04"))
    assert(h4.status == "unhealthy",
      s"crashed re-run of a banded severe row must not exonerate: $h4")
    assert(h4.reproducible.map(_.name) == Seq("q04"),
      s"the ledger must name the row that flipped the record: $h4")
    // the reproduced-severe case (h above) names its row too
    assert(h.reproducible.map(_.name) == Seq("q04"),
      s"banded reproduced-severe must be in the ledger: $h")
    // and the clean-band case keeps an empty ledger
    assert(h2.reproducible.isEmpty && h3.reproducible.isEmpty)
  }

  test("headline metric constant is pass2 and matches any committed record") {
    // the r13 record switched pass2 -> pass1 silently; the metric is now
    // a pinned constant, and any future BENCH_DETAIL carrying the
    // explicit "headline" field must agree with it
    assert(Bench.headlineMetric == "pass2")
    val p = java.nio.file.Paths.get("BENCH_DETAIL.json")
    if (java.nio.file.Files.exists(p)) {
      val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      """"headline":"([a-z0-9]+)"""".r.findFirstMatchIn(text).foreach { m =>
        assert(m.group(1) == Bench.headlineMetric,
          s"committed BENCH_DETAIL headline ${m.group(1)} != pinned constant")
      }
    }
  }

  test("severe flag whose p3 reproduces only the MILD tier does not flip unhealthy") {
    // p1=1.0, p2=4.5 (severe), isolated p3=2.6: the severe anomaly did
    // NOT reproduce (2.6 < 3x), only an elevation did — recorded as a
    // non-transient verdict (counts un-exonerated toward the ratio gate)
    // but the record stays ok; p3 at severe level (3.5) still flips it
    // 20 queries so the un-exonerated 3.5 s excess stays under the 1.2x
    // ratio gate — the boundary under test is the severe trigger alone
    val h = classify(stats(20, Map(4 -> 4.5)), Map("q04" -> 2.6))
    assert(h.verdicts.size == 1 && h.verdicts.head.severe &&
      !h.verdicts.head.transient)
    assert(h.status == "ok", s"mild-reproduced severe flag must stay ok: $h")
    val h2 = classify(stats(20, Map(4 -> 4.5)), Map("q04" -> 3.5))
    assert(h2.status == "unhealthy",
      s"severe-reproduced flag must stay unhealthy: $h2")
  }

  test("elevated tier (round-13 ask #2): 1.5x-3x rows get verdicts, not unhealthy alone") {
    // embed_ivfpq's r13 shape: 1.67 -> 3.14 s (1.9x, non-severe). With a
    // p3 that reproduces the elevation, the row is recorded reproducible
    // but only the SEVERE tier can flip the record unhealthy by itself.
    val h = classify(
      Seq(("ivfpq", q(1.67), q(3.14))) ++ stats(9),
      Map("ivfpq" -> 3.0))
    assert(h.verdicts.size == 1 && !h.verdicts.head.severe)
    assert(!h.verdicts.head.transient)
    assert(h.status == "ok", s"mild reproducible row must not flip status: $h")
    // and the same row exonerated by p3 subtracts its excess from pass2Adj
    val h2 = classify(
      Seq(("ivfpq", q(1.67), q(3.14))) ++ stats(9),
      Map("ivfpq" -> 1.7))
    assert(h2.verdicts.head.transient)
    assert(math.abs(h2.pass2Adj - (9.0 + 1.7)) < 1e-9)
  }

  test("scattered anomalies (no band): unhealthy even when >=3") {
    val h = classify(stats(20, Map(0 -> 9.0, 9 -> 8.0, 19 -> 7.5)), Map.empty)
    assert(!h.band && h.status == "unhealthy")
  }

  test("broad un-attributed pass-2 blowup fails the ratio gate") {
    // every query 1.5x slower warm: no single anomaly, but pass ratio 1.5
    val h = classify((0 until 10).map(i => (s"q$i", q(1.0), q(1.5))), Map.empty)
    assert(h.verdicts.isEmpty && h.status == "unhealthy" && h.headlinePass == 2)
  }

  test("tier boundaries: 2.9x is elevated-not-severe; sub-1s excess flags nothing") {
    // "a" 1.0 -> 2.9 s: elevated (gets a verdict) but below the severe 3x;
    // "b" 0.2 -> 0.9 s: >3x ratio yet under the 1 s absolute floor of BOTH
    // tiers — never flagged
    val h = classify(
      Seq(("a", q(1.0), q(2.9)), ("b", q(0.2), q(0.9))) ++
        stats(8).map { case (n, s1, s2) => (n + "x", s1, s2) },
      Map("a" -> 1.1))
    assert(h.verdicts.map(_.name) == Seq("a"))
    assert(!h.verdicts.head.severe && h.verdicts.head.transient)
    assert(h.status == "ok")
  }

  test("pass-2 jit/class loads disqualify the SEVERE flag but not the elevated verdict") {
    // jit/cls attribute the slowness to a codegen-cache miss, so the row
    // is never severe — but the widened elevated tier still owes it a p3
    // verdict; absent one, the un-exonerated excess fails the ratio gate
    val h = classify(
      Seq(("a", q(1.0), q(9.0, jit = 2.0, cls = 1000))) ++ stats(9),
      Map.empty)
    assert(h.verdicts.size == 1 && !h.verdicts.head.severe)
    assert(h.status == "unhealthy")
  }

  test("replay rows gate on the ENGINE lane (r16 ask #8): harness jitter cannot flag") {
    // a replay row whose WALL doubles under load but whose engine wall is
    // flat: publish/restart choreography jitter — no verdict at all
    val harnessNoise = (0 until 10).map { i =>
      if (i == 4)
        ("q04", QStat(3.0, 0, 0, 0, 0L, 1.0, eng = 1.0),
          QStat(8.0, 0, 0, 0, 0L, 3.0, eng = 1.1))
      else (f"q$i%02d", q(1.0), q(1.0))
    }
    assert(classify(harnessNoise, Map.empty).verdicts.isEmpty)
    // the same row with a REAL engine regression flags severe, and its
    // p3 compares in the same engine lane: an isolated re-run back at
    // engine pass-1 level exonerates even if its wall stays noisy
    val engineReg = (0 until 10).map { i =>
      if (i == 4)
        ("q04", QStat(3.0, 0, 0, 0, 0L, 1.0, eng = 1.0),
          QStat(8.0, 0, 0, 0, 0L, 1.0, eng = 6.0))
      else (f"q$i%02d", q(1.0), q(1.0))
    }
    val flagged = classify(engineReg, Map.empty)
    assert(flagged.verdicts.size == 1 && flagged.verdicts.head.severe &&
      flagged.verdicts.head.p1 == 1.0 && flagged.verdicts.head.p2 == 6.0,
      s"engine-lane verdict wrong: ${flagged.verdicts}")
    assert(flagged.status == "unhealthy")
    val exonerated = classify(engineReg, Map("q04" -> 1.2))
    assert(exonerated.verdicts.head.transient && exonerated.status == "ok")
    // a plain batch row (eng = 0) still gates on wall exactly as before
    val batch = stats(10, Map(4 -> 8.0))
    assert(classify(batch, Map.empty).verdicts.size == 1)
  }

  test("exonerated excess is capped at the row's WALL delta (ADVICE r17)") {
    // engine-lane transient: lane excess p2−p3 = 6.0−1.2 = 4.8 but the
    // row only added 7.0−3.0 = 4.0 s of wall to pass 2 (the isolated
    // re-run's harness share undercut p2's) — the wall-based ratio gate
    // must forgive at most the wall the row actually contributed
    val rows = (0 until 10).map { i =>
      if (i == 4)
        ("q04", QStat(3.0, 0, 0, 0, 0L, 1.0, eng = 1.0),
          QStat(7.0, 0, 0, 0, 0L, 1.0, eng = 6.0))
      else (f"q$i%02d", q(1.0), q(1.0))
    }
    val h = classify(rows, Map("q04" -> 1.2))
    assert(h.verdicts.size == 1 && h.verdicts.head.transient)
    // pass2Total = 9 + 7 = 16; capped exoneration = 4.0 (not 4.8)
    assert(math.abs(h.pass2Adj - 12.0) < 1e-9, s"pass2Adj: ${h.pass2Adj}")
  }

  test("driftFlags: ratio+absolute gate, sf-changed rows skipped, new rows ignored") {
    import Bench.{CurRow, PrevRow}
    val prev = Map(
      "q_slow"   -> PrevRow(2.0, "sf0.1"), // 2.0 -> 5.0: >1.5x, >0.5s -> flagged
      "q_noise"  -> PrevRow(0.1, "sf0.1"), // 0.1 -> 0.3: 3x but only 0.2s -> no
      "q_ok"     -> PrevRow(3.0, "sf0.1"), // 3.0 -> 3.2: fine
      "q_zero"   -> PrevRow(0.0, "sf0.1"), // prev rounded to 0.000: a real
                                           // regression STILL flags, baseline
                                           // clamped to 0.001 so the recorded
                                           // ratio stays finite
      "q_zfast"  -> PrevRow(0.0, "sf0.1"), // 0.000 -> 0.3: under the 0.5s
                                           // absolute gate -> noise, not drift
      "q_moved"  -> PrevRow(4.0, "sf0.1")) // sf changed -> skipped, never flagged
    val cur = Seq(
      CurRow("q_slow", 5.0, "sf0.1"), CurRow("q_noise", 0.3, "sf0.1"),
      CurRow("q_ok", 3.2, "sf0.1"), CurRow("q_zero", 0.9, "sf0.1"),
      CurRow("q_zfast", 0.3, "sf0.1"),
      CurRow("q_moved", 0.4, "sf0.001"),
      CurRow("q_new", 9.9, "sf0.1")) // absent from prev -> not comparable
    val (flagged, compared, skipped, harness) = Bench.driftFlags(prev, cur)
    assert(flagged.map(f => (f.name, f.prev, f.now, f.metric)).toSet ==
      Set(("q_slow", 2.0, 5.0, "sec"), ("q_zero", 0.001, 0.9, "sec")))
    assert(compared == 5 && skipped == 1 && harness.isEmpty)
  }

  test("driftFlags engine lane (r15 ask #7): engine drift flags, harness noise flags separately") {
    import Bench.{CurRow, PrevRow}
    val prev = Map(
      // replay row, both records carry the split: engine regressed
      // (1.0 -> 2.6) while TOTAL only 1.44x (4.5 -> 6.5, under 1.5x) —
      // the old total-sec gate would have stayed silent
      "stream_eng" -> PrevRow(4.5, "sf0.001", eng = 1.0),
      // harness blowup: engine flat (2.0 -> 2.1), choreography 1.0 -> 4.0;
      // total 3.0 -> 6.1 would have flagged as if the ENGINE regressed
      "stream_har" -> PrevRow(3.0, "sf0.001", eng = 2.0),
      // split on one side only (old snapshot predates it) -> sec lane
      "stream_old" -> PrevRow(2.0, "sf0.001"))
    val cur = Seq(
      CurRow("stream_eng", 6.5, "sf0.001", eng = 2.6),
      CurRow("stream_har", 6.1, "sf0.001", eng = 2.1),
      CurRow("stream_old", 5.0, "sf0.001", eng = 1.0))
    val (flagged, compared, _, harness) = Bench.driftFlags(prev, cur)
    assert(compared == 3)
    assert(flagged.map(f => (f.name, f.metric)).toSet ==
      Set(("stream_eng", "engine_sec"), ("stream_old", "sec")),
      s"engine lane must flag the engine regression and the legacy row: $flagged")
    assert(harness.map(f => (f.name, f.metric)) ==
      Seq(("stream_har", "harness_sec")),
      s"harness drift must flag separately, never as engine: $harness")
  }

  test("isolated lane (r18 ask #2): IsoLane rows gate on iso, suite pressure cannot flag") {
    import Bench.{CurRow, PrevRow}
    // the pinned set is exactly the recurring drift-flagged rows: the
    // cached-edge graph trio + sketch_accuracy (r18 ask #5)
    assert(Bench.IsoLane == Set("cluster_split", "pagerank",
      "pagerank_convergence", "sketch_accuracy"))
    val prev = Map(
      // the three-round scenario this lane exists for: the suite min
      // inflated 2.0 -> 3.8 (would flag on the sec lane) but isolated
      // is commit-indistinguishable (2.0 -> 2.1) -> NO flag
      "pagerank"   -> PrevRow(2.0, "sf0.1", iso = 2.0),
      // a REAL plan regression shows in the isolated lane too -> flags
      // with metric iso_sec
      "iso_regr"   -> PrevRow(2.0, "sf0.1", iso = 2.0),
      // baseline predates the iso field (e.g. the r18 snapshot): this
      // run's ISOLATED time compares against the old in-suite min —
      // iso <= suite-min under no contention, so silence means the plan
      // held and a flag means the isolated time exceeds even the old
      // suite time
      "first_iso"  -> PrevRow(2.0, "sf0.1"),
      "first_bad"  -> PrevRow(2.0, "sf0.1"))
    val cur = Seq(
      CurRow("pagerank", 3.8, "sf0.1", iso = 2.1),
      CurRow("iso_regr", 4.1, "sf0.1", iso = 4.0),
      CurRow("first_iso", 3.8, "sf0.1", iso = 2.1),
      CurRow("first_bad", 4.2, "sf0.1", iso = 4.1))
    val (flagged, compared, _, _) = Bench.driftFlags(prev, cur)
    assert(compared == 4)
    assert(flagged.map(f => (f.name, f.metric)).toSet ==
      Set(("iso_regr", "iso_sec"), ("first_bad", "iso_vs_prev_min")),
      s"iso lane must exonerate suite pressure and flag real regressions: $flagged")
  }

  test("readPrevDetail parses the iso field into the baseline") {
    val text = """{"sf":"sf0.1","queries":{
      |  "pagerank":{"sec":3.575,"iso":2.210,"p1":3.6,"p2":3.58},
      |  "q1_agg":{"sec":0.4,"p1":0.5,"p2":0.4}
      |}}""".stripMargin
    val prev = Bench.readPrevDetail(text, "sf0.1")
    assert(prev("pagerank").iso == 2.210 && prev("pagerank").sec == 3.575)
    assert(prev("q1_agg").iso == 0.0)
  }

  test("machine canary: block round-trips, ratio verdicts, absent baseline stays silent") {
    val text = """"jit":{},"canary":{"st":[0.412,0.405,0.420],"mt":[0.510,0.498,0.530]},"health":{}"""
    val parsed = Bench.readPrevCanary(text)
    assert(parsed.contains((Seq(0.412, 0.405, 0.420), Seq(0.510, 0.498, 0.530))))
    // quiet run vs quiet baseline: ratio ~1, not inflated
    val quiet = Bench.canaryRatio(parsed, Seq(0.52, 0.50, 0.55))
    assert(quiet.exists(r => r > 0.9 && r < 1.2))
    // noisy-neighbor run: best mt sample 1.5x the baseline's best
    val noisy = Bench.canaryRatio(parsed, Seq(0.80, 0.75, 0.92))
    assert(noisy.exists(_ > 1.3),
      s"a 1.5x-slower machine must read as inflated: $noisy")
    // pre-r19 baseline (no canary block): verdict absent, never a flag
    assert(Bench.readPrevCanary(""""health":{}""").isEmpty)
    assert(Bench.canaryRatio(None, Seq(0.5)).isEmpty)
  }

  test("cumulative gate (r15 ask #2): a repeat <=1.4x climber flags at 1.8x vs the oldest baseline") {
    import Bench.{CurRow, PrevRow}
    // three rounds of 1.35x climbs: 1.0 -> 1.35 -> 1.82. Each
    // round-over-round step passes the 1.5x gate; vs the OLDEST baseline
    // the 1.8x cumulative gate catches it.
    val oldest = Map("q_creep" -> PrevRow(1.0, "sf0.1"),
      "q_flat" -> PrevRow(2.0, "sf0.1"))
    val prevRound = Map("q_creep" -> PrevRow(1.35, "sf0.1"),
      "q_flat" -> PrevRow(2.0, "sf0.1"))
    val cur = Seq(CurRow("q_creep", 1.82, "sf0.1"),
      CurRow("q_flat", 2.1, "sf0.1"))
    val (roundFlags, _, _, _) = Bench.driftFlags(prevRound, cur)
    assert(roundFlags.isEmpty, s"the per-round gate is blind to the creep: $roundFlags")
    val (cumFlags, _, _, _) = Bench.driftFlags(oldest, cur, ratio = 1.8)
    assert(cumFlags.map(_.name) == Seq("q_creep"),
      s"the cumulative gate must catch it: $cumFlags")
  }

  test("committed drift section carries the cumulative compare") {
    val p = java.nio.file.Paths.get("BENCH_DETAIL.json")
    if (java.nio.file.Files.exists(p)) {
      val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      if (text.contains(""""cumulative"""")) {
        // once present, the cumulative block must bind to the OLDEST
        // committed snapshot and publish its wider gate
        val m = """"cumulative":\{"baseline_round":(\d+)""".r
          .findFirstMatchIn(text)
        assert(m.isDefined, "cumulative block lost its baseline_round")
        val rx = """BENCH_DETAIL_r(\d+)\.json""".r
        val oldest = Option(new java.io.File("baselines").listFiles())
          .toSeq.flatten
          .flatMap(f => rx.findFirstMatchIn(f.getName).map(_.group(1).toInt))
          .sorted.headOption
        oldest.foreach(k => assert(m.get.group(1).toInt == k,
          s"cumulative baseline r${m.get.group(1)} is not the oldest snapshot r$k"))
        assert(text.contains(""""ratio_gate":1.8"""))
      }
    }
  }

  test("readPrevDetail parses its own row format, qsf overrides record sf") {
    // the exact shape Bench writes: sec first, optional qsf, trailing
    // verdict fields to prove the [^}]* scan stays inside one row
    val text =
      """{"sf":"sf0.1","queries":{
        |  "q_engine":{"sec":2.300,"p1":2.400,"p2":2.300,"load2":0.5},
        |  "stream_x":{"sec":1.100,"p1":1.200,"p2":1.100,"qsf":"sf0.001"},
        |  "q_flagged":{"sec":5.010,"p1":5.200,"p2":5.010,"verdict":"transient"}
        |}}""".stripMargin
    val m = Bench.readPrevDetail(text, "sf0.1")
    assert(m("q_engine") == Bench.PrevRow(2.3, "sf0.1"))
    assert(m("stream_x") == Bench.PrevRow(1.1, "sf0.001"))
    assert(m("q_flagged").sec == 5.01)
    // the jit "pass1"/"pass2" objects never match (they lack a "sec" key)
    assert(!m.contains("pass1"))
    // the engine split parses when present (r15 rows)
    val withEng =
      """{"sf":"sf0.1","queries":{
        |  "stream_y":{"sec":3.100,"engine_sec":2.400,"harness_sec":0.700,"p1":3.2,"qsf":"sf0.001"}
        |}}""".stripMargin
    assert(Bench.readPrevDetail(withEng, "sf0.1")("stream_y") ==
      Bench.PrevRow(3.1, "sf0.001", eng = 2.4))
  }

  test("readPrevDetail survives a prettified committed record") {
    // round 13: a tooling pass committed an indent-formatted record and
    // the strict regex parsed ZERO rows — the drift gate went vacuous for
    // one run (drift.compared: 0). The parser must be whitespace-tolerant.
    val pretty =
      """{
        | "sf": "sf0.1",
        | "queries": {
        |  "q_engine": {
        |   "sec": 2.3,
        |   "p1": 2.4
        |  },
        |  "stream_x": {
        |   "sec": 1.1,
        |   "qsf": "sf0.001"
        |  }
        | }
        |}""".stripMargin
    val m = Bench.readPrevDetail(pretty, "sf0.1")
    assert(m("q_engine") == Bench.PrevRow(2.3, "sf0.1"), s"parsed: $m")
    assert(m("stream_x") == Bench.PrevRow(1.1, "sf0.001"), s"parsed: $m")
  }
}
