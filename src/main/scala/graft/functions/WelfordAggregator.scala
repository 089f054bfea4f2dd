package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation surface (SURVEY.md §2.2: the reference has no
  * user-registrable aggregates; `Aggregator[IN, BUF, OUT]` is the engine's
  * UDAF story): streaming-friendly mean/variance via Welford's online
  * algorithm with the standard parallel (Chan et al.) merge — one pass, no
  * global sort, partial-aggregable, so it distributes exactly like a
  * built-in agg (map-side combine, shuffle only the 3-number buffer).
  */
object WelfordAggregator {
  final case class Moments(n: Long, mean: Double, m2: Double)
  final case class MomentsOut(n: Long, mean: Double, variance: Double)
}

class WelfordAggregator
    extends Aggregator[Double, WelfordAggregator.Moments, WelfordAggregator.MomentsOut] {
  import WelfordAggregator._

  override def zero: Moments = Moments(0L, 0.0, 0.0)

  override def reduce(b: Moments, x: Double): Moments = {
    val n = b.n + 1
    val delta = x - b.mean
    val mean = b.mean + delta / n
    Moments(n, mean, b.m2 + delta * (x - mean))
  }

  override def merge(a: Moments, b: Moments): Moments =
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val delta = b.mean - a.mean
      Moments(n,
        a.mean + delta * b.n / n,
        a.m2 + b.m2 + delta * delta * a.n * b.n / n)
    }

  override def finish(r: Moments): MomentsOut =
    MomentsOut(r.n, r.mean, if (r.n > 1) r.m2 / (r.n - 1) else 0.0)

  override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
  override def outputEncoder: Encoder[MomentsOut] = Encoders.product[MomentsOut]
}
