package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter build + probe over 64-bit hash columns, exposed from
  * Spark's own runtime-filtering expressions (`BloomFilterAggregate` /
  * `BloomFilterMightContain` — the machinery behind
  * spark.sql.optimizer.runtimeFilter.bloomFilter); they are not in the
  * public function registry, so GraftColumnBridge surfaces them.
  *
  * Why this matters at 100 TB: benchmark decontamination broadcasts the
  * eval-set shingle set to every executor. As an exact set that broadcast
  * grows with the eval corpus (hundreds of MB for a large benchmark
  * suite); as a Bloom filter it is `numBits/8` bytes FLAT (1 MiB for 2^23
  * bits) with zero false NEGATIVES — a contaminated doc can never slip
  * through; false positives only send a few extra candidates to the exact
  * verify stage. Build and probe are deterministic (fixed seed inside
  * Spark's BloomFilter sketch), so results are reproducible run to run.
  */
object Bloom {

  /** Aggregate a LongType column into a serialized Bloom filter (binary).
    * `numBits/expectedItems` sets the false-positive rate: m/n = 16 bits
    * per item gives ~0.046% FPP at the optimal hash count Spark derives.
    */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    GraftColumnBridge.column(new BloomFilterAggregate(
      GraftColumnBridge.expression(c),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Probe: `value` (LongType) might be in the Bloom filter built by
    * `bloomDf` (a one-row, one-binary-column frame — typically
    * `df.agg(bloomAgg(...))`). The bloom side rides along as a scalar
    * subquery: executed once, result broadcast to every probe task —
    * never a per-row re-evaluation.
    */
  def mightContain(bloomDf: DataFrame, value: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      GraftColumnBridge.expression(GraftColumnBridge.scalarSubquery(bloomDf)),
      GraftColumnBridge.expression(value)))
}
