package graft

import org.apache.spark.sql.functions._

import graft.operators.TextSuite
import graft.plans.{LevenshteinLengthGuard, LevenshteinSingleEval}

/** The LevenshteinLengthGuard optimizer rule: fires on thresholded
  * levenshtein filters, inserts exactly one guard (idempotent under the
  * fixed-point batch), and never changes results.
  */
class GuardRuleSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("guard is injected ahead of the levenshtein kernel, exactly once") {
    val plan = TextSuite.editDistanceNear(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("abs((length("),
      s"length guard not injected in:\n$plan")
    // idempotency: the fixed-point optimizer batch must not stack guards
    val guards = "abs\\(\\(length\\(".r.findAllIn(plan).size
    assert(guards == 1, s"expected exactly 1 guard, found $guards in:\n$plan")
  }

  test("single-eval: the kernel appears exactly once, above the guard") {
    // Catalyst pushdown re-inlines a projected-then-filtered levenshtein
    // into the join condition, so without LevenshteinSingleEval the
    // optimized plan pays the O(len^2) kernel once per candidate pair AND
    // once per survivor. The rewritten shape must hold: one kernel in a
    // shared projection, the threshold filter on its attribute, and the
    // free length guard still BELOW the projection so mismatched pairs
    // short-circuit before the kernel.
    val plan = TextSuite.editDistanceNear(spark, dir)
      .queryExecution.optimizedPlan.toString
    val kernels = "levenshtein\\(".r.findAllIn(plan).size
    assert(kernels == 1, s"expected exactly 1 kernel eval, found $kernels in:\n$plan")
    assert(plan.contains("_lev_once"), s"shared projection missing in:\n$plan")
    val guardAt = plan.indexOf("abs((length(")
    val kernelAt = plan.indexOf("levenshtein(")
    assert(guardAt > kernelAt, // plan prints top-down: below = later offset
      s"guard must sit below the shared kernel projection in:\n$plan")
  }

  test("single-eval preserves results: rule on == rule off") {
    val withRule = TextSuite.editDistanceNear(spark, dir)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == LevenshteinSingleEval)
    try {
      val df = TextSuite.editDistanceNear(spark, dir)
      assert(!df.queryExecution.optimizedPlan.toString.contains("_lev_once"),
        "rule still active after removal")
      assert(df.orderBy("doc_a", "doc_b").collect().toSeq == withRule,
        "single-eval rewrite changed query results")
    } finally spark.experimental.extraOptimizations = saved
  }

  test("single-eval upgrades a thresholded kernel to the banded 3-arg form") {
    val plan = TextSuite.editDistanceNear(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Some(60)) AS _lev_once"),
      s"threshold must move inside the banded kernel in:\n$plan")
    assert("Filter \\(_lev_once#\\d+ >= 0\\)".r.findFirstIn(plan).isDefined,
      s"hoisted filter must test the -1 sentinel in:\n$plan")
  }

  test("property: banded single-eval never changes results on random pairs") {
    // project-then-filter over a real scan: the shape the rule rewrites to
    // levenshtein(a, b, k) + `>= 0`; kept set AND projected distances must
    // be identical with the rule off (exact 2-arg kernel twice)
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val alphabet = "abλ中é🙂 "
    def randStr(): String =
      Seq.fill(rng.nextInt(24))(alphabet(rng.nextInt(alphabet.length))).mkString
    val tmp = java.nio.file.Files.createTempDirectory("graft_lev").toString
    Seq.fill(400)((randStr(), randStr())).toDF("a", "b")
      .write.mode("overwrite").parquet(tmp)
    def run(active: Boolean): Seq[(String, String, Long)] = {
      val saved = spark.experimental.extraOptimizations
      if (!active) spark.experimental.extraOptimizations =
        saved.filterNot(_ == LevenshteinSingleEval)
      try spark.read.parquet(tmp)
        .select(col("a"), col("b"),
          levenshtein(col("a"), col("b")).cast("long").as("d"))
        .filter(col("d") <= 7)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      finally spark.experimental.extraOptimizations = saved
    }
    assert(run(active = true).sortBy(t => (t._1, t._2)) ==
      run(active = false).sortBy(t => (t._1, t._2)))
  }

  test("guard preserves results: rule on == rule off") {
    val withRule = TextSuite.editDistanceNear(spark, dir)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == LevenshteinLengthGuard)
    try {
      val df = TextSuite.editDistanceNear(spark, dir)
      assert(!df.queryExecution.optimizedPlan.toString.contains("abs((length("),
        "rule still active after removal")
      assert(df.orderBy("doc_a", "doc_b").collect().toSeq == withRule,
        "guard changed query results")
    } finally spark.experimental.extraOptimizations = saved
  }

  test("property: guard never changes the kept set on random (incl. multibyte) pairs") {
    // char-counting consistency matters: Length and Levenshtein must both
    // count CHARACTERS for the bound to hold on multibyte text
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val alphabet = "abλλ中文é🙂 "
    def randStr(): String =
      Seq.fill(rng.nextInt(30))(alphabet(rng.nextInt(alphabet.length))).mkString
    val pairs = Seq.fill(300)((randStr(), randStr()))
    val df = pairs.toDF("a", "b")
    def kept(active: Boolean): Set[(String, String)] = {
      val saved = spark.experimental.extraOptimizations
      if (!active) spark.experimental.extraOptimizations =
        saved.filterNot(_ == LevenshteinLengthGuard)
      try df.filter(levenshtein(col("a"), col("b")) <= 7)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      finally spark.experimental.extraOptimizations = saved
    }
    assert(kept(active = true) == kept(active = false))
  }

  test("guard itself filters nothing the kernel would keep (bound is implied)") {
    // direct construction: pairs with wildly different lengths must be
    // rejected by both the guarded and unguarded predicate
    import spark.implicits._
    // (no plan assertion here: constant folding pre-evaluates a
    // literal-only filter at optimize time — injection is pinned by the
    // first test on a real scan)
    val df = Seq(("abc", "abcd"), ("ab", "a" * 200), ("same", "same"))
      .toDF("a", "b")
      .filter(levenshtein(col("a"), col("b")) <= 3)
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("abc", "abcd"), ("same", "same")))
  }
}
