package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default in GraftSession): it splits oversized shuffle partitions at
  * runtime. These helpers cover the cases AQE cannot fix: a single join KEY
  * too hot for any partition split (AQE splits partitions, not keys), and
  * deliberate pre-salting of write-side layout.
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a random-but-seeded salt
    * in [0, salt); the small side is replicated `salt` times. Each hot key's
    * rows spread over `salt` shuffle partitions instead of one. Inner/left
    * semantics preserved; cost = small side x salt (keep the replicated side
    * genuinely small).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int = 8, seed: Long = 42L,
                 joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer").contains(joinType.toLowerCase),
      s"saltedJoin preserves only inner/left semantics; '$joinType' would " +
        "duplicate unmatched replicated-side rows")
    val b = big.withColumn("_salt", (rand(seed) * salt).cast("int"))
    val s = small.withColumn("_salt",
      explode(array((0 until salt).map(lit(_)): _*)))
    b.join(s, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Two-phase aggregation for a skewed group key: partial-aggregate on
    * (key, salt), then final-aggregate on key. Useful when the per-group
    * state is heavy (collect_set-like) — plain sums/counts already get this
    * from HashAggregate's partial mode for free.
    */
  def saltedTwoPhaseAgg(df: DataFrame, key: String, salt: Int, seed: Long)(
      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame =
    df.withColumn("_salt", (rand(seed) * salt).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(finalAgg.head, finalAgg.tail: _*)
}
