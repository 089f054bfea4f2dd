package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression computing the hashed word-n-gram shingles of a text
  * column in ONE pass per row: tokenize on whitespace, FNV-1a hash each
  * token, combine n consecutive token hashes polynomially; `distinct`
  * dedupes (the set form MinHash/SimHash/Jaccard need), `distinct = false`
  * keeps every occurrence (the multiset form frequency/repetition
  * statistics need).
  *
  * Why: the composable pipeline (split -> transform(sequence)/concat_ws ->
  * array_distinct -> transform(xxhash64)) runs on the interpreted
  * higher-order path and profiled at ~9 s of every dedup-family query at
  * sf0.1 — 38 us per shingle, pure interpreter overhead. This expression
  * is one JVM method call per row (~0.5 s for the same work).
  *
  * The hash VALUES are engine-internal: downstream operators (MinHash,
  * SimHash, Jaccard joins, gram counting) only need equal-shingle <=>
  * equal-hash (collision odds ~d^2/2^64). Tokenization treats ASCII
  * control chars + space as separators, matching `\s+` on the fixture
  * corpus.
  */
case class ShingleHash(child: Expression, n: Int, distinct: Boolean = true,
                       winnow: Int = 0)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects (string, n>=1), got ${child.dataType.simpleString}, n=$n")

  override def nullSafeEval(input: Any): Any =
    ShingleHash.compute(input.asInstanceOf[UTF8String], n, distinct, winnow)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHash.compute($c, $n, $distinct, $winnow)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHash {

  val functionName = "shingle_hashes"

  /** SQL builder: `shingle_hashes(text, n [, keep_duplicates])` — n and the
    * optional multiset flag must be literals (they parameterize codegen).
    * Shared by the session registry and the GraftExtensions injection path.
    */
  val sqlBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2 || exprs.length == 3,
      s"$functionName takes (text, n[, keep_duplicates]), got ${exprs.length} args")
    import org.apache.spark.sql.catalyst.expressions.Literal
    val n = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$functionName: n must be an INT literal, got $other")
    }
    val distinct = exprs match {
      case Seq(_, _, Literal(b: Boolean, BooleanType)) => !b
      case Seq(_, _) => true
      case Seq(_, _, other) => throw new IllegalArgumentException(
        s"$functionName: keep_duplicates must be a BOOLEAN literal, got $other")
    }
    ShingleHash(exprs.head, n, distinct)
  }

  /** Register `shingle_hashes` for SQL use on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName, sqlBuilder, "built-in")

  def shingleHashesNative(c: Column, n: Int): Column =
    GraftColumnBridge.column(ShingleHash(GraftColumnBridge.expression(c), n))

  /** Multiset form: one hash per shingle OCCURRENCE, in document order. */
  def shingleHashesAllNative(c: Column, n: Int): Column =
    GraftColumnBridge.column(
      ShingleHash(GraftColumnBridge.expression(c), n, distinct = false))

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** One-pass tokenize + hash + n-gram combine (+ dedupe, + optional
    * winnowing). Called from both the interpreted eval and the generated
    * code (one invocation per row).
    *
    * `winnow > 0` applies standard robust winnowing (Schleimer/Wilkerson/
    * Aiken, MOSS): slide a window of `winnow` consecutive gram hashes over
    * the document-order multiset and select each window's minimum
    * (rightmost on ties), recording a selection only when the position
    * changes. GUARANTEE: two documents sharing a token run of length
    * >= winnow + n - 1 always share a selected fingerprint — positional
    * plagiarism/near-dup detection at ~1/winnow the fingerprint density.
    * `distinct` then dedupes the selected VALUES (the set form a
    * fingerprint join wants).
    */
  def compute(s: UTF8String, n: Int, distinct: Boolean = true,
              winnow: Int = 0): ArrayData = {
    if (winnow > 0) return winnowed(s, n, distinct, winnow)
    val bytes = s.getBytes
    val ring = new Array[Long](n)   // last n token hashes, circular
    var tokenCount = 0
    val seen = if (distinct) new java.util.HashSet[java.lang.Long]() else null
    val out = new scala.collection.mutable.ArrayBuffer[Long]()

    var i = 0
    val len = bytes.length
    while (i <= len) {
      // scan one token
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        var h = FnvOffset
        while (i < len && !isSpace(bytes(i))) {
          h = (h ^ (bytes(i) & 0xffL)) * FnvPrime
          i += 1
        }
        ring(tokenCount % n) = h
        tokenCount += 1
        if (tokenCount >= n) {
          // combine the window's n hashes oldest-to-newest
          var g = 0L
          var j = tokenCount - n
          while (j < tokenCount) {
            g = g * 0x9e3779b97f4a7c15L + ring(j % n)
            g ^= (g >>> 32)
            j += 1
          }
          if (!distinct || seen.add(g)) out += g
        }
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Winnowing selection over the full multiset gram sequence. A document
    * with fewer grams than the window still emits its global minimum, so
    * every non-empty document carries at least one fingerprint.
    */
  private def winnowed(s: UTF8String, n: Int, distinct: Boolean,
                       w: Int): ArrayData = {
    val grams = compute(s, n, distinct = false, winnow = 0).toLongArray()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    if (grams.nonEmpty) {
      val win = math.min(w, grams.length)
      var lastPos = -1
      var start = 0
      while (start + win <= grams.length) {
        // rightmost minimum of the window
        var p = start
        var i = start + 1
        while (i < start + win) {
          if (grams(i) <= grams(p)) p = i
          i += 1
        }
        if (p != lastPos) { out += grams(p); lastPos = p }
        start += 1
      }
    }
    if (!distinct) new GenericArrayData(out.toArray)
    else {
      val seen = new java.util.HashSet[java.lang.Long]()
      new GenericArrayData(out.filter(seen.add(_)).toArray)
    }
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b
}
