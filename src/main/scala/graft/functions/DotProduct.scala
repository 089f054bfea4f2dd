package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native Catalyst expression for the similarity hot path: dot product of
  * two numeric arrays with double accumulation.
  *
  * Why a custom Expression (preference order (b) from the build rules): the
  * composable forms are either interpreted (`aggregate`/`zip_with` are
  * CodegenFallback — ~100x slower in pairwise joins) or dimension-bound
  * (unrolled `element_at` chains, whose thousands-of-node trees were
  * measured to blow up codegen time). This expression is dimension-agnostic
  * AND participates in whole-stage codegen: `doGenCode` emits a tight
  * primitive loop over the unsafe array data, no boxing, no virtual calls.
  *
  * Summation is sequential left-to-right in index order with both elements
  * promoted to double first — bit-identical to the higher-order-function
  * form and to the DuckDB oracle's DOUBLE[] cosine.
  *
  * Nulls: null array -> null (BinaryExpression default); null *elements* are
  * treated as 0 contribution (embeddings have none; documented contract).
  * Length mismatch: the overhang is ignored (zip semantics).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float>/array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (lt == FloatType) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rt == FloatType) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API surface. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))

  val functionName = "dot_product"

  /** Shared by the registry and extensions paths — both must arity-check. */
  val sqlBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$functionName takes exactly 2 arguments")
    DotProduct(exprs.head, exprs(1))
  }
  private val builder = sqlBuilder

  private def info = new ExpressionInfo(classOf[DotProduct].getName, functionName)

  /** Register `dot_product` for SQL use on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(functionName, builder, "built-in")
}

/** SparkSessionExtensions entry point — the connector-style registration
  * (`.withExtensions(new GraftExtensions)` or
  * spark.sql.extensions=graft.functions.GraftExtensions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier(DotProduct.functionName),
      new ExpressionInfo(classOf[DotProduct].getName, DotProduct.functionName),
      DotProduct.sqlBuilder))
    e.injectFunction((FunctionIdentifier(ShingleHash.functionName),
      new ExpressionInfo(classOf[ShingleHash].getName, ShingleHash.functionName),
      ShingleHash.sqlBuilder))
    e.injectFunction((FunctionIdentifier(MaxSim.functionName),
      new ExpressionInfo(classOf[MaxSim].getName, MaxSim.functionName),
      MaxSim.sqlBuilder))
    e.injectOptimizerRule(_ => graft.plans.LevenshteinLengthGuard)
  }
}
