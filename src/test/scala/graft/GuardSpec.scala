package graft

import graft.operators.{Dedup, Skew}

/** The API guards added for silent-failure modes must actually throw. */
class GuardSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")

  test("minhashSignatures rejects numPerm > 64 (duplicate rotations)") {
    val e = intercept[IllegalArgumentException](
      Dedup.minhashSignatures(docs, numPerm = 128))
    assert(e.getMessage.contains("numPerm"))
  }

  test("lshBuckets rejects bands that do not divide numPerm") {
    val sigs = Dedup.minhashSignatures(docs, numPerm = 64)
    val e = intercept[IllegalArgumentException](
      Dedup.lshBuckets(sigs, numPerm = 64, bands = 12))
    assert(e.getMessage.contains("divide"))
  }

  test("saltedJoin rejects join types broken by small-side replication") {
    val big = Seq((1L, 1L)).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k", "name")
    val e = intercept[IllegalArgumentException](
      Skew.saltedJoin(big, small, Seq("k"), joinType = "right"))
    assert(e.getMessage.contains("inner/left"))
    // allowed types still work
    assert(Skew.saltedJoin(big, small, Seq("k"), joinType = "left").count() == 1)
  }

  test("mix planners reject out-of-range fractions") {
    val e1 = intercept[IllegalArgumentException](
      graft.operators.TextSuite.tokenBudgetMix(spark, "/tmp", capFrac = 0.0))
    assert(e1.getMessage.contains("capFrac"))
    val e2 = intercept[IllegalArgumentException](
      graft.operators.TextSuite.mixRealize(spark, "/tmp", budgetFrac = 1.5))
    assert(e2.getMessage.contains("budgetFrac"))
  }

  test("dot_product SQL function rejects wrong arity") {
    graft.functions.DotProduct.register(spark)
    Seq((Array(1.0f), Array(2.0f))).toDF("a", "b").createOrReplaceTempView("gv")
    val e = intercept[Exception](
      spark.sql("SELECT dot_product(a, b, a) FROM gv").collect())
    assert(e.getMessage.contains("2 arguments") || e.getMessage.contains("dot_product"))
  }
}
