package graft

import graft.operators.{RelationalSuite, SimilaritySuite, TextSuite}

/** Plan-hygiene assertions: the physical plans must keep the properties the
  * 100 TB design depends on — filters and projections reaching the parquet
  * scan, small dimensions broadcast, top-k never a full sort. A regression
  * here is a performance bug even while results stay correct.
  */
class PlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.write.format("noop").mode("overwrite").save() // finalize AQE plan
    df.queryExecution.executedPlan.toString
  }

  test("filter_project pushes predicate and prunes columns at the scan") {
    val plan = executedPlan(RelationalSuite.filterProject(spark, dir))
    assert(plan.contains("PushedFilters: ["), s"no pushed filters in:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(l_quantity,45.0)"),
      s"quantity predicate not pushed in:\n$plan")
    // pruned read schema: only the 5 referenced columns, not all 11
    assert(!plan.contains("l_returnflag"), s"scan reads unneeded column:\n$plan")
  }

  test("dimension joins broadcast the small side") {
    val plan = executedPlan(RelationalSuite.joinRevenueByRegion(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin") ||
      plan.indexOf("BroadcastHashJoin") >= 0)
  }

  test("top-k collapses to TakeOrderedAndProject, not a global sort") {
    val plan = executedPlan(RelationalSuite.topKOrders(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), s"top-k plan degraded:\n$plan")
    assert(!plan.contains("GlobalSort"))
  }

  test("aggregations are partial (map-side combine before the exchange)") {
    val plan = executedPlan(RelationalSuite.q1Agg(spark, dir))
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"no partial aggregation in:\n$plan")
  }

  test("brute-force topk broadcasts the query side, never shuffles the corpus") {
    val plan = executedPlan(SimilaritySuite.embedTopK(spark, dir))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side not broadcast in:\n$plan")
  }

  test("range join bins to a hash equi-join, never a nested-loop") {
    val plan = executedPlan(RelationalSuite.rangeShipWindows(spark, dir))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join degraded to BNLJ:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"no equi-join on the bin key in:\n$plan")
  }

  test("decontaminate broadcasts the eval shingle set and anti-joins on ids") {
    val plan = executedPlan(graft.operators.TextSuite.decontaminate(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"eval shingle set not broadcast in:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"survivor filter not an anti join in:\n$plan")
    // the fixed-size Bloom prefilter must prune the corpus shingle stream
    // BEFORE the exact broadcast join — the composition that keeps the
    // exact side's input bounded at 100 TB
    assert(plan.contains("might_contain"),
      s"Bloom prefilter missing from the corpus side in:\n$plan")
  }

  test("rep_signals builds grams natively, never via interpreted HOFs") {
    val plan = executedPlan(graft.operators.TextSuite.repSignals(spark, dir))
    assert(plan.contains("shinglehash("),
      s"native multiset ShingleHash missing in:\n$plan")
    // the round-3 regression shape: transform(sequence)/concat_ws bigram
    // construction runs on the CodegenFallback path (17.4 s vs ~1 s)
    assert(!plan.contains("concat_ws") && !plan.contains("transform("),
      s"interpreted higher-order gram construction crept back in:\n$plan")
  }

  test("lm_score builds grams natively and broadcasts only the corpus total") {
    val plan = executedPlan(graft.operators.TextSuite.lmScore(spark, dir))
    assert(plan.contains("shinglehash("),
      s"native multiset ShingleHash missing in:\n$plan")
    assert(!plan.contains("concat_ws") && !plan.contains("transform("),
      s"interpreted higher-order gram construction crept back in:\n$plan")
    // the one-row corpus total must come in as a broadcast, not shuffle the
    // per-doc side
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"corpus-total scalar is not broadcast:\n$plan")
  }

  test("pack_bins runs sharded windows, never a single-partition sort") {
    val plan = executedPlan(graft.operators.TextSuite.packBins(spark, dir))
    assert(!plan.contains("SinglePartition"),
      s"packing degraded to a single-partition global window:\n$plan")
    assert(plan.contains("hashpartitioning(shard"),
      s"running sum not partitioned by shard in:\n$plan")
  }

  test("exact percentiles aggregate to value-counts before the window") {
    val plan = executedPlan(RelationalSuite.exactPercentiles(spark, dir))
    // the window must run over the (group, value, count) aggregate — rows
    // bounded by distinct values — not over raw lineitem rows
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      s"no map-side combine before the percentile window in:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"percentile window degraded to a single partition:\n$plan")
  }

  test("bucketed fact-fact join reads co-located buckets with zero exchanges") {
    // build the layout, then pin the join-only plan: bucketing must carry
    // the partitioning through both scans into the SortMergeJoin
    graft.operators.StorageSuite.bucketedJoin(spark, dir)
    val plan = executedPlan(
      graft.operators.StorageSuite.bucketedJoinPlan(spark, "sf0_001"))
    assert(plan.contains("SortMergeJoin"), s"bucketed join not SMJ:\n$plan")
    assert(!plan.contains("ShuffleExchange") && !plan.contains("BroadcastExchange"),
      s"bucketed join still shuffles/broadcasts a side:\n$plan")
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
      s"scan does not report bucketed read:\n$plan")
  }

  test("partition-column filter prunes directories at the scan") {
    graft.operators.StorageSuite.partitionPrune(spark, dir)
    val plan = executedPlan(
      graft.operators.StorageSuite.partitionPrunePlan(spark, dir))
    assert(plan.contains("PartitionFilters: [") &&
      plan.substring(plan.indexOf("PartitionFilters: [")).take(120)
        .contains("event_type"),
      s"event_type filter did not become a partition filter:\n$plan")
    // the filter must NOT also appear as a pushed data filter — partition
    // columns never reach row groups
    assert(!plan.contains("PushedFilters: [IsNotNull(event_type"),
      s"partition column leaked into data filters:\n$plan")
  }

  test("dim-side filter prunes fact partitions dynamically at the scan") {
    graft.operators.StorageSuite.dppJoin(spark, dir)
    val plan = executedPlan(
      graft.operators.StorageSuite.dppJoinPlan(spark, dir))
    // no static event_type predicate exists in the query, so any pruning
    // visible at the fact scan must be the DPP runtime subquery
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan carries no dynamic pruning filter:\n$plan")
  }

  test("q18 pre-aggregates lineitem below the joins and top-ks without a global sort") {
    val plan = executedPlan(RelationalSuite.q18LargeOrders(spark, dir))
    // the HAVING aggregate must sit UNDER the joins (fact shrinks first):
    // in the printed tree the joins are parents, so they appear before the
    // quantity partial-agg line
    val join = plan.indexOf("Join")
    val agg = plan.indexOf("partial_sum(cast(l_quantity")
    assert(join >= 0 && agg > join,
      s"quantity pre-aggregate not below the joins in:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"q18 top-20 degraded to a global sort in:\n$plan")
  }

  test("q2 scans lineitem once: correlated min resolves as a window, dims broadcast") {
    val plan = executedPlan(RelationalSuite.q2MinCost(spark, dir))
    assert("FileScan parquet \\[l_".r.findAllIn(plan).size == 1,
      s"q2 must scan lineitem exactly once (groupBy+join-back scans twice):\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"q2 top-100 degraded to a global sort in:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"q2 dims (region suppliers, small parts) must broadcast in:\n$plan")
  }

  test("q4 pushes the date window to the orders scan and plans a semi join") {
    val plan = executedPlan(RelationalSuite.q4OrderPriority(spark, dir))
    assert(plan.contains("LeftSemi"),
      s"q4 EXISTS must plan as a semi join in:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"q4 date filter not pushed to the orders scan in:\n$plan")
  }

  test("q8 broadcasts every dimension chain; lineitem-orders is the only big join") {
    val plan = executedPlan(RelationalSuite.q8MarketShare(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      s"q8 dims (promo parts, supplier-nation, asia customers) must broadcast:\n$plan")
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).size <= 1,
      s"q8 must shuffle only the fact-fact join:\n$plan")
  }

  test("q20 decorrelates to map-side-combined aggregates and semi joins") {
    val plan = executedPlan(RelationalSuite.q20ExcessSupply(spark, dir))
    assert(plan.contains("LeftSemi"),
      s"q20 IN-chain must plan as semi joins in:\n$plan")
    assert(plan.contains("partial_max") && plan.contains("partial_sum"),
      s"q20 supplies/part-year aggregates must map-side combine:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"q20 correlated scalar agg must not plan a nested loop:\n$plan")
  }

  test("q9 broadcasts all three dimension chains; one fact-fact shuffle") {
    val plan = executedPlan(RelationalSuite.q9ProductProfit(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      s"q9 part/supplier/nation must broadcast:\n$plan")
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).size <= 1,
      s"q9 must shuffle only lineitem-orders:\n$plan")
    assert(plan.contains("partial_sum"),
      s"q9 profit terms must map-side combine:\n$plan")
  }

  test("q11 evaluates the global-total threshold as a broadcast, not a per-row subquery") {
    val plan = executedPlan(RelationalSuite.q11ImportantParts(spark, dir))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoop"),
      s"q11 1-row total must broadcast:\n$plan")
    assert(plan.contains("partial_sum"),
      s"q11 per-part values must map-side combine:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"q11 must not plan a cartesian:\n$plan")
  }

  test("q12 conditional counts map-side combine over one order-key shuffle") {
    val plan = executedPlan(RelationalSuite.q12ShipmodePriority(spark, dir))
    assert(plan.contains("partial_sum"),
      s"q12 CASE-sums must map-side combine:\n$plan")
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).size <= 1,
      s"q12 must shuffle only the order-key join:\n$plan")
  }

  test("q16 anti-joins the excluded suppliers and two-phase distinct-counts") {
    val plan = executedPlan(RelationalSuite.q16PartsSupplier(spark, dir))
    assert(plan.contains("LeftAnti"),
      s"q16 NOT-IN must plan as an anti join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"q16 must stay equi-keyed:\n$plan")
  }

  test("q21 plans EXISTS/NOT-EXISTS as semi/anti joins on one fact key") {
    val plan = executedPlan(RelationalSuite.q21WaitingSupplier(spark, dir))
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
      s"q21 EXISTS/NOT EXISTS must plan as semi + anti joins in:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"q21 inequality correlations must ride equi-joins as residuals:\n$plan")
  }

  test("substring coverage joins on gram hashes, never pairs documents") {
    val plan = executedPlan(graft.operators.TextSuite.substringDedup(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"substring_dedup must stay equi-keyed:\n$plan")
    assert(plan.contains("partial_count"),
      s"occurrence count must map-side combine:\n$plan")
  }

  test("span decontamination broadcasts the eval gram set over one corpus scan") {
    val plan = executedPlan(graft.operators.TextSuite.spanDecontam(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"eval grams must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), s"no pair explosion:\n$plan")
  }

  test("incr_agg merges partials without re-shuffling the union") {
    val plan = executedPlan(RelationalSuite.incrAgg(spark, dir))
    val union = plan.indexOf("Union")
    assert(union >= 0, s"no union of base/delta partials in:\n$plan")
    // the merge aggregate above the union must reuse the branches'
    // hash-partitioning on o_custkey — any Exchange printed BEFORE the
    // Union line is a re-shuffle of the merged stream
    val above = plan.substring(0, union)
    assert(!above.contains("Exchange"),
      s"merge aggregate re-shuffles the union in:\n$plan")
  }

  test("winsorize computes both fences from one window subtree") {
    val plan = executedPlan(RelationalSuite.winsorize(spark, dir))
    // two stacked Window nodes (two frame specs) — the filter-per-fence
    // form would plan four; and the value-counts pre-aggregate must keep
    // the window off the raw rows
    val windows = "\\bWindow\\b".r.findAllIn(plan).size
    assert(windows <= 2, s"window subtree duplicated ($windows nodes) in:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      s"no value-counts combine before the fence window in:\n$plan")
  }

  test("exact near-dup runs as a shuffled block-pair kernel, not a driver collect") {
    val plan = executedPlan(SimilaritySuite.embedNearDup(spark, dir))
    // the pairwise kernel must be a distributed MapGroups fed by a shuffle
    // on the block-pair key — never a corpus broadcast or a driver collect
    assert(plan.contains("MapGroups"), s"no distributed kernel in:\n$plan")
    assert(plan.contains("Exchange") || plan.contains("ShuffleQueryStage") ||
      plan.contains("AQEShuffleRead"), s"kernel not fed by a shuffle in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"near-dup degraded to pair-materializing BNLJ:\n$plan")
  }

  test("index_serve answers from the persisted index, never the corpus") {
    val serve = SimilaritySuite.indexServe(spark, dir)
    val plan = executedPlan(serve)
    // the only corpus touches are the PRUNED per-request reads: the five
    // query docs (their shingles are request processing) and the five
    // query vectors — both filter-pushed to the scan
    // every FileScan chunk over a corpus table must carry the pushed
    // query-id prune — i.e. NO unpruned corpus read exists anywhere in
    // the serve plan (the lexical tail legitimately references the
    // pruned query-doc read twice: once for scoring, once for the df
    // semi-join)
    val scanChunks = plan.split("FileScan").toSeq.drop(1)
    val docChunks = scanChunks.filter(_.contains("documents.parquet"))
    assert(docChunks.nonEmpty &&
      docChunks.forall(_.contains("LessThan(doc_id,5)")),
      s"an UNPRUNED documents scan survives in the serve plan:\n$plan")
    val embChunks = scanChunks.filter(_.contains("embeddings.parquet"))
    assert(embChunks.nonEmpty &&
      embChunks.forall(_.contains("LessThan(vec_id,5)")),
      s"an UNPRUNED embeddings scan survives in the serve plan:\n$plan")
    // and the index artifacts are what it serves from — asserted on the
    // RESOLVED RELATION PATHS, not the rendered string: the executed-plan
    // toString runs under Spark's plan-string budget and round 19's
    // slightly longer store paths pushed a FileScan's Location past the
    // cutoff, failing a plan.contains() check against a relation the plan
    // demonstrably reads (its columns were right there, truncated mid-
    // InMemoryFileIndex). Leaf paths are truncation-immune.
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val servePaths = serve.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten
    Seq("ivf_cells", "lex_tf", "lex_df", "lex_n").foreach(a =>
      assert(servePaths.exists(_.contains(a)),
        s"serve plan does not read artifact $a: $servePaths"))
    // the inline ranker, by contrast, rebuilds from the corpus — the
    // split is real, not two names for one plan
    val inline = executedPlan(SimilaritySuite.hybridRetrievalIvf(spark, dir))
    assert("documents\\.parquet".r.findAllIn(inline).size > 1 ||
      "embeddings\\.parquet".r.findAllIn(inline).size > 1,
      s"inline hybrid unexpectedly stopped scanning the corpus:\n$inline")
  }

  test("stream_index_serve's STREAMING plan reads artifacts, never the corpus") {
    // the streaming serve answers requests (which carry their own text
    // + vector) from the persisted artifacts via stream-static joins —
    // the corpus tables must appear NOWHERE in the streaming plan: at
    // 100 TB any corpus relation here is a per-micro-batch 100 TB scan
    val frame = SimilaritySuite.streamIndexServePlanFrame(spark, dir)
    // analyzed, not optimized: a streaming frame refuses batch
    // optimization outside writeStream.start(). The analyzed tree's
    // toString elides file paths, so read the resolved relations' root
    // paths directly off the leaves.
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val paths = frame.queryExecution.analyzed.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten
    assert(paths.nonEmpty, "no resolved file relations found in the plan")
    assert(!paths.exists(_.contains("documents.parquet")),
      s"the streaming serve plan reads the documents corpus: $paths")
    assert(!paths.exists(_.contains("embeddings.parquet")),
      s"the streaming serve plan reads the embeddings corpus: $paths")
    // lex_n folds into the plan as a literal at build time (a one-value
    // artifact read), so the leaf relations are the three table-shaped
    // artifacts
    Seq("ivf_cells", "lex_tf", "lex_df").foreach(a =>
      assert(paths.exists(_.contains(a)),
        s"streaming serve plan does not read artifact $a: $paths"))
  }

  test("unpivot melts via a single-scan Expand, not a union of scans") {
    val plan = executedPlan(RelationalSuite.unpivotMetrics(spark, dir))
    assert(plan.contains("Expand"), s"unpivot lost its Expand node in:\n$plan")
    assert("FileScan parquet|Scan parquet".r.findAllIn(plan).size == 1,
      s"unpivot must scan the fact exactly once in:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"per-metric profile must map-side combine in:\n$plan")
  }

  test("cdc_apply scans once and prunes the LWW window below the exchange") {
    val plan = executedPlan(RelationalSuite.cdcApply(spark, dir))
    assert("FileScan parquet|Scan parquet".r.findAllIn(plan).size == 1,
      s"changelog synthesis must be ONE scan (filtered-array explode), " +
        s"not a union of scans:\n$plan")
    // Spark 4 pushes the rn=1 top-1-per-key down as a partial
    // WindowGroupLimit before the key exchange — each map task ships at
    // most one candidate version per key instead of the whole changelog
    assert("WindowGroupLimit".r.findAllIn(plan).size == 2,
      s"LWW compaction lost its partial WindowGroupLimit (map-side " +
        s"version pruning) in:\n$plan")
  }

  test("weighted_sample: one scan, map-side min, rank capped by WindowGroupLimit") {
    val plan = executedPlan(TextSuite.weightedSample(spark, dir))
    assert("FileScan parquet|Scan parquet".r.findAllIn(plan).size == 1,
      s"weighted sample must make ONE pass over the corpus:\n$plan")
    // min(draw) per doc combines before the shuffle — the chunk-exploded
    // rows (O(tokens/32)) never leave their map task
    assert(plan.contains("partial_min"),
      s"chunk draws must combine map-side in:\n$plan")
    // the per-language top-k prunes to k rows per map task BEFORE the
    // rank window's exchange (partial + final = 2 nodes)
    assert("WindowGroupLimit".r.findAllIn(plan).size == 2,
      s"rank filter lost its partial WindowGroupLimit in:\n$plan")
  }

  test("runtime bloom filter injects on a shuffled join under a selective dim filter") {
    // at 100 TB a selective filter on one shuffle-join side should prune
    // the OTHER side's scan via an injected bloom filter (Spark's
    // InjectRuntimeFilter). Fixture tables all sit under the broadcast
    // and application-side thresholds, so rig the confs to the scenario
    // and pin that the engine's plans engage the rewrite.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val o = graft.model.Tables.orders(spark, dir)
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
        .select(org.apache.spark.sql.functions.col("o_orderkey"))
      val li = graft.model.Tables.lineitem(spark, dir)
        .select(org.apache.spark.sql.functions.col("l_orderkey"),
          org.apache.spark.sql.functions.col("l_quantity"))
      val plan = li.join(o,
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected in:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }

  test("snapshot_diff joins the two aggregates without re-shuffling them") {
    val plan = executedPlan(RelationalSuite.snapshotDiff(spark, dir))
    assert(plan.contains("FullOuter"), s"diff must plan a full-outer join:\n$plan")
    // both sides aggregate on the customer key (one exchange each); the
    // full-outer SMJ reuses that partitioning, and only the constant-size
    // class aggregate shuffles again — 3 exchanges total, never 4+
    val exchanges = "\\bExchange\\b".r.findAllIn(plan).size
    assert(exchanges <= 3,
      s"join re-shuffles an already-partitioned aggregate ($exchanges exchanges):\n$plan")
  }

  test("checksum_buckets drill-down stays one map-side-combined scan") {
    val plan = executedPlan(graft.operators.StorageSuite.checksumBuckets(spark, dir))
    assert("FileScan parquet|Scan parquet".r.findAllIn(plan).size == 1,
      s"bucket digests must come from ONE orders scan:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"bucket digest must map-side combine:\n$plan")
  }

  test("q15 reuses the revenue aggregate's exchange for the scalar max") {
    // the per-supplier revenue subtree appears under both the filter side
    // and the max side; AQE must materialize its shuffle ONCE and reuse
    // the stage — a final plan with two lineitem scans does the quarter's
    // work twice. Reuse happens at RUNTIME (stage cache keyed on the
    // canonicalized exchange), so execute the df's own query execution
    // and inspect the finalized adaptive plan.
    val df = RelationalSuite.q15TopSupplier(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"plan not finalized:\n$plan")
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"q15 revenue subtree not reused (extra lineitem scan) in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"q15 supplier dim must broadcast in:\n$plan")
  }

  test("agg_pushdown answers COUNT/MIN/MAX from parquet footers, not a row scan") {
    val plan = executedPlan(graft.operators.StorageSuite.aggPushdown(spark, dir))
    assert("PushedAggregation: \\[COUNT".r.findAllIn(plan).size == 2,
      s"both tables' aggregates must push to the scan:\n$plan")
    assert(plan.contains("MIN(o_totalprice)") &&
      plan.contains("MAX(l_extendedprice)"),
      s"min/max not pushed in:\n$plan")
  }

  test("global_rank never funnels event rows through one partition") {
    val plan = executedPlan(graft.operators.EventSuite.globalRank(spark, dir))
    // the data-carrying Window must partition by bucket; the ONLY
    // single-partition stage is the prefix sum over the bounded
    // per-bucket histogram (and its broadcast). A bare global
    // row_number would show an empty partition spec over the events.
    assert(plan.contains("windowspecdefinition(bucket"),
      s"ranking window must partition by bucket:\n$plan")
    assert("Exchange SinglePartition".r.findAllIn(plan).size <= 1,
      s"more than the histogram prefix-sum runs single-partition:\n$plan")
  }

  test("source_concentration: one corpus scan, funnel only the per-source aggregate") {
    val plan = executedPlan(graft.operators.TextSuite.sourceConcentration(spark, dir))
    // ONE scan of documents (rank + running sum + grand total all derive
    // from the same bounded per-source aggregate — a separate total agg
    // would scan the corpus twice)
    assert("FileScan parquet".r.findAllIn(plan).size == 1,
      s"documents must be scanned exactly once:\n$plan")
    // the only single-partition funnel sits ABOVE the per-source
    // HashAggregate: corpus rows partially aggregate map-side, and the
    // unpartitioned Lorenz windows see only the |sources|-row table
    assert("Exchange SinglePartition".r.findAllIn(plan).size == 1,
      s"only the bounded per-source aggregate may run single-partition:\n$plan")
    assert(plan.contains("partial_count"),
      s"per-source aggregate must map-side combine before its shuffle:\n$plan")
    // rank, cum sum, and total share ONE Window operator (one sort pass)
    assert("""\+- Window \[""".r.findAllIn(plan).size == 1,
      s"Lorenz stats split across multiple Window passes:\n$plan")
  }

  test("rolling_zscore computes all three baseline stats in ONE window pass") {
    val plan = executedPlan(graft.operators.EventSuite.rollingZscore(spark, dir))
    // count/sum/sum-of-squares over the same frame must share a single
    // Window operator (one sort, one state pass) — a composite expression
    // inside an agg would split them across two sorts of the series
    assert("""\+- Window \[""".r.findAllIn(plan).size == 1,
      s"baseline stats split across multiple Window passes:\n$plan")
    // and the hourly pre-aggregation map-side combines before its shuffle
    assert(plan.contains("partial_count"),
      s"hourly grain must partially aggregate:\n$plan")
  }

  test("triangle_coocc broadcasts degrees and never falls back to a nested loop") {
    val plan = executedPlan(graft.operators.RelationalSuite.triangleCoocc(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"degree table must broadcast in:\n$plan")
    // exactly TWO nested-loop joins: the single-row x single-row audit
    // combines at the top. Any more means a wedge/closure join degraded
    // to a pair-explosion plan.
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size == 2 &&
      !plan.contains("CartesianProduct"),
      s"wedge/closure joins degraded to a pair-explosion plan:\n$plan")
  }

  test("late_interaction: native MaxSim projection — no explode, no aggregate") {
    val plan = executedPlan(
      graft.operators.SimilaritySuite.queries("late_interaction")(spark, dir))
    // the query side must broadcast against ONE corpus pass
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"query vectors must broadcast in:\n$plan")
    // per-query top-k caps partials before the final rank window
    assert(plan.contains("WindowGroupLimit"),
      s"top-k must partial-limit per partition in:\n$plan")
    // the native expression computes the WHOLE score in the pair
    // projection: any Generate (token explode) or HashAggregate (per-pair
    // maxima reassembly) means the plan regressed to the 16x-row
    // composed form (kept only as MaxSimSpec's parity reference)
    assert(!plan.contains("Generate") && !plan.contains("HashAggregate"),
      s"MaxSim must be one projection, not explode+aggregate:\n$plan")
  }

  test("bm25_retrieval: dl table never shuffles for its join, same pruning as lexical") {
    val plan = executedPlan(
      graft.operators.TextSuite.bm25Retrieval(spark, dir))
    // same pins as lexical_retrieval: pushed query filter, broadcast
    // probes, no postings-sized shuffle join, capped rank
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,5)]"),
      s"query-doc filter not pushed to the scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"query shingle set must broadcast in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the (N, A) pair must broadcast, not cartesian:\n$plan")
    // the NEW table bm25 adds — per-doc lengths — joins the broadcast
    // query-candidate side, so neither postings NOR dl move for a join
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      s"bm25's dl join must stream dl against broadcast candidates:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"top-k must partial-limit per partition in:\n$plan")
  }

  test("lexical_retrieval: broadcast query probes, pushed query filter, capped rank") {
    val plan = executedPlan(
      graft.operators.TextSuite.lexicalRetrieval(spark, dir))
    // the query-side scan must push doc_id < 5 to parquet — the corpus
    // never re-scans to build the 5-doc query shingle set at 100 TB
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,5)]"),
      s"query-doc filter not pushed to the scan:\n$plan")
    // the query set and the one-row corpus count reach the postings by
    // broadcast, never by shuffling the postings to them
    assert(plan.contains("BroadcastHashJoin"),
      s"query shingle set must broadcast in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the one-row count must broadcast, not cartesian:\n$plan")
    // round-14 verdict ask #7: the broadcast query pruning sits BELOW the
    // tf⋈df join, so NO join in the plan moves postings-sized data — a
    // sort-merge or shuffled-hash join here means the corpus-wide tf⋈df
    // join came back and its output is being built just to be discarded
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      s"tf and df must be query-pruned before they join (broadcast-only " +
        s"joins expected) in:\n$plan")
    // per-query top-k caps partials before the rank window
    assert(plan.contains("WindowGroupLimit"),
      s"top-k must partial-limit per partition in:\n$plan")
  }

  test("hybrid_retrieval(+_ivf): both rankers top-k capped BEFORE the fusion aggregate") {
    for (q <- Seq("hybrid_retrieval", "hybrid_retrieval_ivf", "hybrid_bm25")) {
      val plan = executedPlan(
        graft.operators.SimilaritySuite.queries(q)(spark, dir))
      // three rank windows — lexical branch, semantic branch, fused rank —
      // and every one must partial-limit per partition: an uncapped branch
      // would feed corpus-sized candidates into the fusion aggregate
      val wgl = "WindowGroupLimit".r.findAllIn(plan).size
      assert(wgl >= 3,
        s"$q: expected 3 capped rank windows (2 branches + fusion), saw $wgl in:\n$plan")
      // the semantic branch's query vectors (or probe pairs) broadcast
      // against one corpus pass, and nothing degenerates to a cartesian
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("BroadcastHashJoin"),
        s"$q: query vectors must broadcast in:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$q: no cartesian anywhere in the fused plan:\n$plan")
      // the lexical branch's pruning survives composition: no join moves
      // postings-sized data (same pin as the standalone lexical test)
      assert(!plan.contains("SortMergeJoin") &&
        !plan.contains("ShuffledHashJoin"),
        s"$q: postings-sized shuffle join regressed into the fused plan:\n$plan")
    }
  }

  test("ts_comovement global top-k never funnels pair-window rows through one sort") {
    val plan = executedPlan(graft.operators.EventSuite.tsComovement(spark, dir))
    // LimitPushDownThroughWindow must rewrite the rank filter into a
    // limit BELOW the final Window, which compiles to
    // TakeOrderedAndProject: per-partition top-20, then a 20×partitions
    // merge. Without it, |types|²/2 × |hours| scored rows all sort in a
    // single partition under the global rank window.
    assert(plan.contains("TakeOrderedAndProject(limit=20"),
      s"global top-k lost its per-partition limit:\n$plan")
    // the only single-partition exchanges are gapFill's one-row time-range
    // aggregate (computed once, broadcast) — never the scored pair table
    assert("Exchange SinglePartition".r.findAllIn(plan).size <= 2,
      s"more than the bounded range aggregates run single-partition:\n$plan")
  }

  test("t_closeness: threshold explode and EMD windows run over bounded tables only") {
    val plan = executedPlan(
      graft.operators.RelationalSuite.tCloseness(spark, dir))
    // cell counts partially aggregate map-side before any shuffle
    assert(plan.contains("partial_count"),
      s"cell counts must map-side combine before their shuffle:\n$plan")
    // the |ts| explode (Generate) sits ABOVE the per-class EMD aggregate —
    // below it, every grid row would multiply by |ts| pre-aggregation
    val genAt = plan.indexOf("Generate explode")
    val aggAt = plan.lastIndexOf("partial_count")
    assert(genAt >= 0 && aggAt >= 0 && genAt < aggAt,
      s"threshold explode must run over the bounded class table:\n$plan")
    // the class x band grid is built by BROADCAST joins (bands and the
    // one-row totals are tiny), never a shuffle or cartesian of the rows
    assert(!plan.contains("CartesianProduct"),
      s"grid must broadcast, not cartesian:\n$plan")
  }

  test("k_anonymity explodes thresholds over the bounded class table only") {
    val plan = executedPlan(
      graft.operators.RelationalSuite.kAnonymity(spark, dir))
    // ONE scan of customer; class sizes partially aggregate map-side
    assert("FileScan parquet".r.findAllIn(plan).size == 1,
      s"customer must be scanned exactly once:\n$plan")
    assert(plan.contains("partial_count"),
      s"class sizes must map-side combine before their shuffle:\n$plan")
    // the |ks| explode (Generate) must sit ABOVE the class aggregate —
    // below it, every customer row would multiply by |ks| pre-shuffle
    val genAt = plan.indexOf("Generate explode")
    val aggAt = plan.indexOf("partial_count")
    assert(genAt >= 0 && aggAt >= 0 && genAt < aggAt,
      s"threshold explode must run over the bounded class table:\n$plan")
  }
}
