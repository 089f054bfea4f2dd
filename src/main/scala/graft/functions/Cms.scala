package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.CountMinSketchAgg
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized count-min sketch for an item's frequency estimate.
  * The sketch side must be a plan constant (literal or scalar subquery —
  * executed once, broadcast to probe tasks); it is deserialized lazily ONCE
  * per task, not per row. CodegenFallback is fine here: probes run over
  * bounded candidate sets (top-k heavy hitters), never inside a scan or
  * join kernel. String items are probed by their UTF-8 bytes — exactly the
  * bytes `CountMinSketchAgg` added, so add/probe hashing agrees.
  */
case class CmsEstimate(sketch: Expression, item: Expression)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = sketch
  override def right: Expression = item
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    // the sketch is deserialized once (lazily) and reused for every row, so
    // it must be a plan constant — same restriction Spark places on
    // BloomFilterMightContain's filter side
    val constantSketch = sketch.foldable ||
      sketch.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]
    if (!constantSketch)
      TypeCheckResult.TypeCheckFailure(
        "cms_estimate: the sketch side must be a literal or scalar subquery")
    else if (sketch.dataType == BinaryType &&
        (item.dataType == StringType || item.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects (binary sketch, string|long item), got " +
        s"(${sketch.dataType.simpleString}, ${item.dataType.simpleString})")
  }

  @transient private lazy val cms: CountMinSketch = {
    val bytes = sketch.eval(null).asInstanceOf[Array[Byte]]
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    val v = item.eval(input)
    if (v == null) null
    else v match {
      case s: UTF8String => cms.estimateCount(s.getBytes)
      case other => cms.estimateCount(other)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(sketch = newLeft, item = newRight)
}

/** Count-min sketch build + probe — the constant-memory frequency
  * estimator that replaces exact per-key counts at 100 TB (heavy-hitter
  * detection, frequency capping, skew diagnosis). The build is Spark's own
  * `count_min_sketch` aggregate (seeded — deterministic run to run); the
  * probe is the CmsEstimate expression above, fed via scalar subquery like
  * the Bloom filter path. CMS guarantees estimate >= true count always,
  * and estimate <= true count + eps * N with probability `confidence`.
  */
object Cms {

  def cmsAgg(c: Column, eps: Double, confidence: Double, seed: Int): Column =
    GraftColumnBridge.column(new CountMinSketchAgg(
      GraftColumnBridge.expression(c),
      Literal(eps), Literal(confidence), Literal(seed)).toAggregateExpression())

  def estimate(cmsDf: DataFrame, item: Column): Column =
    GraftColumnBridge.column(CmsEstimate(
      GraftColumnBridge.expression(GraftColumnBridge.scalarSubquery(cmsDf)),
      GraftColumnBridge.expression(item)))
}
