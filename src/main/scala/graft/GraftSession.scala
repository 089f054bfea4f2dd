package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Scale posture: AQE on (runtime shuffle coalescing + skew-join splitting),
  * UTC pinned (epoch-aligned windows must match the DuckDB oracle),
  * shuffle partitions sized to the local core count rather than the 200
  * default — on a real cluster this would be set to ~2-3x total cores and
  * AQE coalesces down per-stage.
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static conf (must be set before the first session; spark.conf.set
      // would throw): size the janino compiled-class cache to a many-query
      // session — the default 100 entries thrashes past ~50 queries and a
      // cache miss means recompile + a class load that deopt-storms every
      // already-hot method (round-6 bench postmortem, Bench.scala).
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    tune(spark)
  }

  /** Apply the engine's standard SQL conf to an externally-created session
    * (e.g. the driver-owned Verify/Bench sessions).
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // events.parquet stores TIMESTAMP(NANOS) which Spark's reader rejects;
    // read as Long ns and convert in Tables.table.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // wide-aggregate plans (64-permutation MinHash / 64-bit SimHash buffers)
    // must stay inside whole-stage codegen; the 100-field default kicks them
    // out into the interpreted row path
    spark.conf.set("spark.sql.codegen.maxFields", "256")
    // streaming state must spill past executor memory at scale: RocksDB
    // state store (default HDFSBacked keeps every key on-heap), with
    // changelog checkpointing so commits ship deltas, not full SST sets
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    // engine-native SQL functions (also injectable via GraftExtensions)
    graft.functions.DotProduct.register(spark)
    graft.functions.ShingleHash.register(spark)
    graft.functions.MaxSim.register(spark)
    // engine optimizer rules (idempotent). ORDER MATTERS: the length guard
    // must be in place before SingleEval hoists the kernel out of the
    // filter/join condition — once hoisted, the filter references an
    // attribute and the guard rule can no longer see the levenshtein.
    // SingleEval lives ONLY here (extraOptimizations = the optimizer's
    // final batch); injecting it into the operator batch via
    // GraftExtensions would loop against PushDownPredicates.
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.LevenshteinLengthGuard))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.LevenshteinLengthGuard)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.LevenshteinSingleEval))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.LevenshteinSingleEval)
    spark
  }
}
