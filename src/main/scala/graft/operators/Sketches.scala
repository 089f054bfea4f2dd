package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Graft-native DETERMINISTIC approximation sketches — the constant-memory
  * estimators that replace exact distinct/percentile at 100 TB, built so
  * the estimate is a bit-reproducible function of the input SET (no
  * merge-order or partitioning dependence anywhere):
  *
  *  - [[hllDistinct]]: HyperLogLog (Flajolet et al. 2007) over xxhash64.
  *    Registers are per-(group, bucket) MAXes — commutative, so any
  *    partitioning/merge order yields identical registers. The harmonic
  *    denominator sum(2^-rho) is computed in EXACT integer arithmetic
  *    (terms scaled by 2^55 and summed as DECIMAL(38,0) — double
  *    summation would be order-dependent in its last bits) and converted
  *    to double exactly once at the end. Small-range linear counting
  *    (m ln(m/V)) applies below 2.5m with empty registers, as in the
  *    original paper.
  *  - [[histPercentiles]]: equi-width histogram percentiles — two scans
  *    (exact min/max bounds, then m-bounded bucket counts) and a linear
  *    interpolation inside the target bucket. Every arithmetic step is a
  *    fixed double-op sequence over exact inputs, so engines agree
  *    bit-for-bit; bucket width (hi-lo)/2^k is an exact power-of-two
  *    division.
  *
  * Both are group-keyed, map-side combinable, and bounded at m (or k)
  * rows per group through the shuffle — the mergeable-sketch shape. The
  * DuckDB recompute lives in HashOracles.approxSketchesOracle /
  * histPercentileCtes; SketchDeterminismSpec pins cross-partitioning
  * bit-equality, and the driver's approx_sketches row hash-compares the
  * whole estimate end-to-end. (Spark's own approx_count_distinct /
  * percentile_approx built-ins remain exercised and accuracy-gated by the
  * sketch_accuracy row; they cannot take this row's exact oracle because
  * HLL++'s bias-interpolation tables and GK summaries' partition-order
  * dependence are not reproducible cross-engine.)
  */
object Sketches {

  /** alpha_m * m^2 * 2^55 for the scaled-integer harmonic denominator;
    * valid for m >= 128 (the standard alpha approximation). Embedded as
    * the SAME double literal on both engine and oracle sides.
    */
  def hllNumerator(p: Int): Double = {
    val m = 1 << p
    require(m >= 128, s"alpha approximation needs m >= 128 (p=$p)")
    val alpha = 0.7213 / (1 + 1.079 / m)
    alpha * m * m * math.pow(2.0, 55)
  }

  /** HLL distinct-count estimate of `value` per `group`:
    * (group, <out> long). `p` index bits => m = 2^p registers, relative
    * error ~1.04/sqrt(m). The rho derivation uses bin()-string length —
    * integer-exact and identical in DuckDB — instead of a floating log.
    */
  def hllDistinct(df: DataFrame, group: Column, value: Column, p: Int,
                  out: String): DataFrame = {
    val m = 1 << p
    val h = xxhash64(value)
    val rest = shiftrightunsigned(h, p)
    // leading zeros of the (64-p)-bit remainder + 1; rest has its top p
    // bits clear, so bin(rest) is the minimal binary string of a
    // nonnegative long and rho = (64-p) - bitlen + 1 (rest=0 => 64-p+1,
    // which the same formula yields with bitlen forced to 0)
    val bitlen = when(rest === 0, lit(0)).otherwise(length(bin(rest)))
    val rho = lit(64 - p + 1) - bitlen
    val regs = df
      .filter(value.isNotNull)
      .select(group.as("g"), h.bitwiseAND(lit((m - 1).toLong)).as("bucket"),
        rho.as("rho"))
      .groupBy(col("g"), col("bucket"))
      .agg(max(col("rho")).as("r"))
    // scaled term 2^(55-r) as an exact long (r in [1, 55] for p >= 10);
    // DECIMAL(38,0) sum keeps the denominator exact and order-free
    val agg = regs
      .withColumn("term", expr("shiftleft(CAST(1 AS BIGINT), 55 - r)"))
      .groupBy(col("g"))
      .agg(sum(col("term").cast(DecimalType(38, 0))).as("s"),
        count(lit(1)).as("nreg"))
    val denom = (col("s") +
      (lit(m) - col("nreg")).cast(DecimalType(38, 0)) *
        lit(1L << 55).cast(DecimalType(38, 0))).cast("double")
    val raw = lit(hllNumerator(p)) / denom
    val v = lit(m) - col("nreg")
    agg.select(col("g"),
      when(v > 0 && raw <= lit(2.5 * m),
        round(lit(m.toDouble) * log(lit(m.toDouble) / v)))
        .otherwise(round(raw)).cast("long").as(out))
  }

  /** Equi-width-histogram percentile estimates of `value` per `group`:
    * (group, <outs(0)>, <outs(1)>, ...) doubles, one column per quantile
    * in `qs`. `k` buckets; rank r = q*(n-1); estimate = lo + w*(bucket +
    * (r - cumBefore)/cnt) inside the bucket whose cumulative count spans
    * r. `k` must be a power of two so the width division is exact.
    */
  def histPercentiles(df: DataFrame, group: Column, value: Column,
                      qs: Seq[(Double, String)], k: Int = 256): DataFrame = {
    require(k > 0 && (k & (k - 1)) == 0, s"k must be a power of two, got $k")
    val bounds = df.filter(value.isNotNull)
      .groupBy(group.as("g"))
      .agg(min(value).as("lo"), max(value).as("hi"), count(lit(1)).as("n"))
    val w = (col("hi") - col("lo")) / lit(k.toDouble)
    val bucket = when(col("hi") === col("lo"), lit(0))
      .otherwise(least(floor((value - col("lo")) / w), lit(k - 1)))
      .cast("int")
    val counts = df.filter(value.isNotNull)
      .join(broadcast(bounds), group === col("g"))
      .select(col("g"), col("lo"), col("hi"), col("n"), bucket.as("bucket"))
      .groupBy(col("g"), col("lo"), col("hi"), col("n"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("g")).orderBy(col("bucket"))))
    qs.map { case (q, out) =>
      val r = lit(q) * (col("n") - 1)
      counts
        .filter(col("cum") - col("cnt") <= r && r < col("cum"))
        .select(col("g"),
          (col("lo") + w *
            (col("bucket") + (r - (col("cum") - col("cnt"))) / col("cnt")))
            .as(out))
    }.reduce(_.join(_, "g"))
  }
}
