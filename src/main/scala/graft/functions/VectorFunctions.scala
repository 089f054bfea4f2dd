package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * Two forms of each primitive:
  *   - generic (`dot`/`norm2`/`cosine`): higher-order functions
  *     (`aggregate`/`zip_with`), dimension-agnostic. CAUTION: Spark's
  *     higher-order functions are CodegenFallback — interpreted per row —
  *     fine for per-document work, ~100x too slow for pairwise similarity.
  *   - fixed-dim (`dotFixed`/`norm2Fixed`/`cosineFixed`): the fold unrolled
  *     into a flat `element_at` expression tree that whole-stage codegen
  *     compiles to straight-line arithmetic. Same left-to-right summation
  *     order, so results are bit-identical to the generic form. Use these
  *     in any O(n^2)/join hot path.
  *
  * All arithmetic is promoted to double BEFORE multiplying: the fixtures
  * store float32, and float-precision intermediate products would diverge
  * from any double-precision oracle (and lose accuracy at 100 TB reduce
  * widths). Folds are sequential left-to-right, deterministic.
  */
object VectorFunctions {

  private def asDouble(a: Column): Column = transform(a, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _), lit(0.0), _ + _)

  def norm2(a: Column): Column =
    sqrt(aggregate(transform(asDouble(a), x => x * x), lit(0.0), _ + _))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Squared L2 distance (cheaper than cosine when both sides are
    * pre-normalized; monotonic with cosine on the unit sphere).
    */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _)

  // ---- native codegen'd forms (custom Catalyst Expression) ----

  /** Dimension-agnostic codegen'd dot product — the preferred pairwise
    * primitive (see DotProduct's scaladoc for why neither the higher-order
    * nor the unrolled form survives a join hot path).
    */
  def dotNative(a: Column, b: Column): Column = DotProduct.dot(a, b)

  def norm2Native(a: Column): Column = sqrt(DotProduct.dot(a, a))

  def cosineNative(a: Column, b: Column): Column =
    dotNative(a, b) / (norm2Native(a) * norm2Native(b))

  // ---- fixed-dimension, codegen'd forms ----

  private def at(a: Column, i: Int): Column =
    element_at(a, i + 1).cast("double")

  /** Unrolled dot product: same summation order as the sequential fold. */
  def dotFixed(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map(i => at(a, i) * at(b, i)).reduce(_ + _)

  def norm2Fixed(a: Column, dim: Int): Column =
    sqrt((0 until dim).map(i => at(a, i) * at(a, i)).reduce(_ + _))

  /** cosine = dot / (|a| * |b|) — identical association to `cosine`, so the
    * two forms (and the DuckDB oracle) agree bit-for-bit.
    */
  def cosineFixed(a: Column, b: Column, dim: Int): Column =
    dotFixed(a, b, dim) / (norm2Fixed(a, dim) * norm2Fixed(b, dim))

  /** Sign-bit sketch against a fixed hyperplane: 1 if a . h >= 0. `h` is a
    * literal array column (seeded, driver-generated, plan-constant), dotted
    * via the native expression — compact in the plan (unrolling bits x
    * tables x dim literals was measured to explode codegen cost ~20x) yet
    * codegen'd per row. Inherits DotProduct's input contract: float/double
    * arrays, null elements contribute 0, length mismatch truncates.
    */
  def signBit(a: Column, h: Column): Column =
    when(dotNative(a, h) >= 0, 1L).otherwise(0L)
}
