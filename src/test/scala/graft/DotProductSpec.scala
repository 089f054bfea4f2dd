package graft

import org.apache.spark.sql.functions._

import graft.functions.{DotProduct, VectorFunctions}

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rng = new scala.util.Random(11)
    (0 until 50).map { i =>
      (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat),
        Array.fill(64)(rng.nextGaussian().toFloat))
    }.toDF("id", "a", "b")
  }

  test("native dot product is bit-identical to the higher-order form") {
    val rows = vecs.select(
      VectorFunctions.dotNative($"a", $"b").as("native"),
      VectorFunctions.dot($"a", $"b").as("hof")).as[(Double, Double)].collect()
    rows.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h))
    }
  }

  test("cosineNative matches cosine bit for bit") {
    val rows = vecs.select(
      VectorFunctions.cosineNative($"a", $"b").as("native"),
      VectorFunctions.cosine($"a", $"b").as("hof")).as[(Double, Double)].collect()
    rows.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h))
    }
  }

  test("participates in whole-stage codegen (not CodegenFallback)") {
    // repartition first (a bare LocalTableScan skips codegen entirely) and
    // execute before inspecting: under AQE the final plan only materializes
    // after the job runs
    val df = vecs.repartition(2).select(VectorFunctions.dotNative($"a", $"b"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen stage in plan strings; a
    // CodegenFallback expression would leave the Project un-starred
    assert("""\*\(\d+\) Project \[dotproduct""".r.findFirstIn(plan).isDefined,
      s"expected dotproduct inside a codegen stage in:\n$plan")
  }

  test("registered SQL function dot_product works") {
    DotProduct.register(spark)
    vecs.createOrReplaceTempView("dp_vecs")
    val viaSql = spark.sql("SELECT dot_product(a, b) AS d FROM dp_vecs")
      .as[Double].collect()
    val viaCol = vecs.select(VectorFunctions.dotNative($"a", $"b"))
      .as[Double].collect()
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("null array yields null; double arrays accepted") {
    val df = Seq((Some(Array(1.0, 2.0)), Array(3.0, 4.0)),
      (None, Array(1.0, 1.0))).toDF("a", "b")
    val got = df.select(VectorFunctions.dotNative($"a", $"b").as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).contains(11.0))
    assert(got(1).isEmpty)
  }
}
