package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of two integer keys — the space-filling-curve
  * clustering key behind multi-dimensional data layout (the technique Delta
  * Lake / Iceberg expose as `OPTIMIZE ... ZORDER BY`). Sorting a table by
  * `z = interleave(x, y)` makes rows close in z close in BOTH x and y, so
  * each written file covers a small (x, y) box and parquet min/max row-group
  * stats prune 2-D range queries on either column — a single-column sort
  * can only ever prune one of them.
  *
  * Bit layout: the low 32 bits of each input are spread to even positions
  * (x) and odd positions (y) of a 64-bit value via the standard
  * magic-number doubling masks — O(log w) shifts, no loop, branch-free.
  * Inputs are taken mod 2^32 (the caller buckets/offsets values into
  * unsigned-32 range; fixture keys are small positives). The expression is
  * an ordering key, not a portable value — no cross-engine contract needed,
  * results of layout queries are layout-independent by construction.
  *
  * Codegen: stays inside whole-stage codegen by emitting a call to the
  * static [[ZOrder.interleave]] below (same pattern as ShingleHash) — the
  * JIT inlines the shift cascade.
  */
case class ZValue(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case IntegerType | LongType | ShortType | ByteType => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_value expects integral inputs, got ${left.dataType.simpleString}" +
        s" and ${right.dataType.simpleString}")
  }

  private def asLong(e: Expression, v: Any): Long = e.dataType match {
    case LongType => v.asInstanceOf[Long]
    case IntegerType => v.asInstanceOf[Int].toLong
    case ShortType => v.asInstanceOf[Short].toLong
    case ByteType => v.asInstanceOf[Byte].toLong
    case other => throw new IllegalStateException(s"unexpected type $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    ZOrder.interleave(asLong(left, l), asLong(right, r))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder.interleave((long) $a, (long) $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder {

  /** Spread the low 32 bits of `v` to the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code: x on even bits, y on odd bits. */
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** Column-API surface. */
  def zValue(x: Column, y: Column): Column =
    GraftColumnBridge.column(ZValue(GraftColumnBridge.expression(x),
      GraftColumnBridge.expression(y)))
}
