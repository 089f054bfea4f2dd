package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native late-interaction (MaxSim) score: `left` (a document vector) and
  * `right` (a query vector) are each read as `nTokens` contiguous
  * sub-vectors of `subDim` components, and the result is
  * Σ over query tokens of the MAX cosine against any document token.
  *
  * Why a custom Expression (the [[DotProduct]] argument, one level up):
  * the composable form explodes both sides 4-ways and re-joins —
  * a 16x row multiplication through the pair join plus a hash aggregate
  * to reassemble per-pair maxima. At fixture scale that is noise; at a
  * 100 TB corpus the join ships 16x the rows and the aggregate re-hashes
  * every (query, doc, token) triple. This expression computes the whole
  * score inside the pair projection — whole-stage-codegen'd, zero extra
  * rows, zero aggregate — so the MaxSim plan is EXACTLY the brute-force
  * top-k plan with a different score column.
  *
  * Bit-parity contract (spec-pinned in MaxSimSpec, oracle-pinned by
  * late_interaction): per (query token, doc token), cosine is
  * dot / (norm_d * norm_q) with the dot accumulated sequentially in
  * index order and both operands promoted to double first — identical
  * IEEE ops to the exploded form (multiplication is commutative
  * bit-for-bit, sqrt is correctly rounded); the per-query-token max
  * treats NaN as greatest, matching Spark's Max aggregate AND DuckDB's
  * max; and the final score adds the per-token maxima in ascending
  * token order, matching the fixed m0+m1+… column sum.
  *
  * Short arrays degrade exactly like the exploded form's `slice`: a
  * sub-vector is whatever components exist in [off, off+subDim), dots
  * run over the shorter of the two, an empty-vs-anything token scores
  * 0/0 = NaN.
  */
case class MaxSim(left: Expression, right: Expression,
                  nTokens: Int, subDim: Int)
    extends BinaryExpression {

  require(nTokens > 0 && subDim > 0,
    s"max_sim needs positive token geometry, got $nTokens x $subDim")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"max_sim expects array<float>/array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val d = l.asInstanceOf[ArrayData]
    val q = r.asInstanceOf[ArrayData]
    val (df, qf) = (isFloat(left), isFloat(right))
    def at(a: ArrayData, f: Boolean, i: Int): Double =
      if (f) a.getFloat(i).toDouble else a.getDouble(i)
    val (dn, qn) = (d.numElements(), q.numElements())
    var score = 0.0
    var qt = 0
    while (qt < nTokens) {
      val qOff = qt * subDim
      val qEnd = math.min(qOff + subDim, qn)
      var nq = 0.0
      var i = qOff
      while (i < qEnd) { val v = at(q, qf, i); nq += v * v; i += 1 }
      val qNorm = math.sqrt(nq)
      var best = Double.NegativeInfinity
      var dt = 0
      while (dt < nTokens && !java.lang.Double.isNaN(best)) {
        val dOff = dt * subDim
        val dEnd = math.min(dOff + subDim, dn)
        var nd = 0.0
        var j = dOff
        while (j < dEnd) { val v = at(d, df, j); nd += v * v; j += 1 }
        var dot = 0.0
        var k = 0
        val n = math.min(dEnd - dOff, qEnd - qOff)
        while (k < n) {
          dot += at(d, df, dOff + k) * at(q, qf, qOff + k)
          k += 1
        }
        val c = dot / (math.sqrt(nd) * qNorm)
        // NaN is greatest — Spark's Max aggregate and DuckDB's max agree
        if (java.lang.Double.isNaN(c) || c > best) best = c
        dt += 1
      }
      score += best
      qt += 1
    }
    score
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dGet = if (isFloat(left)) "getFloat" else "getDouble"
    val qGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (d, q) => {
      val score = ctx.freshName("score")
      val qt = ctx.freshName("qt")
      val dt = ctx.freshName("dt")
      val i = ctx.freshName("i")
      val qOff = ctx.freshName("qOff")
      val qEnd = ctx.freshName("qEnd")
      val dOff = ctx.freshName("dOff")
      val dEnd = ctx.freshName("dEnd")
      val nq = ctx.freshName("nq")
      val nd = ctx.freshName("nd")
      val dot = ctx.freshName("dot")
      val best = ctx.freshName("best")
      val qNorm = ctx.freshName("qNorm")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val v = ctx.freshName("v")
      s"""
         |double $score = 0.0;
         |for (int $qt = 0; $qt < $nTokens; $qt++) {
         |  int $qOff = $qt * $subDim;
         |  int $qEnd = java.lang.Math.min($qOff + $subDim, $q.numElements());
         |  double $nq = 0.0;
         |  for (int $i = $qOff; $i < $qEnd; $i++) {
         |    double $v = (double) $q.$qGet($i); $nq += $v * $v;
         |  }
         |  double $qNorm = java.lang.Math.sqrt($nq);
         |  double $best = java.lang.Double.NEGATIVE_INFINITY;
         |  for (int $dt = 0; $dt < $nTokens && !java.lang.Double.isNaN($best); $dt++) {
         |    int $dOff = $dt * $subDim;
         |    int $dEnd = java.lang.Math.min($dOff + $subDim, $d.numElements());
         |    double $nd = 0.0;
         |    for (int $i = $dOff; $i < $dEnd; $i++) {
         |      double $v = (double) $d.$dGet($i); $nd += $v * $v;
         |    }
         |    double $dot = 0.0;
         |    int $n = java.lang.Math.min($dEnd - $dOff, $qEnd - $qOff);
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += (double) $d.$dGet($dOff + $i) * (double) $q.$qGet($qOff + $i);
         |    }
         |    double $c = $dot / (java.lang.Math.sqrt($nd) * $qNorm);
         |    if (java.lang.Double.isNaN($c) || $c > $best) $best = $c;
         |  }
         |  $score += $best;
         |}
         |${ev.value} = $score;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MaxSim {
  /** Column-API surface: MaxSim score of document `d` against query `q`. */
  def maxSim(d: Column, q: Column, nTokens: Int, subDim: Int): Column =
    GraftColumnBridge.column(MaxSim(GraftColumnBridge.expression(d),
      GraftColumnBridge.expression(q), nTokens, subDim))

  val functionName = "max_sim"

  /** SQL surface: `max_sim(d, q, nTokens, subDim)` — the token geometry
    * must be INT literals (it is burned into the generated code, exactly
    * like shingle width in `shingle_hashes`).
    */
  val sqlBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 4,
      s"$functionName takes exactly 4 arguments (d, q, nTokens, subDim)")
    def intLit(e: Expression, name: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$functionName: $name must be an INT literal, got $other")
    }
    MaxSim(exprs(0), exprs(1), intLit(exprs(2), "nTokens"),
      intLit(exprs(3), "subDim"))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName, sqlBuilder, "built-in")
}
