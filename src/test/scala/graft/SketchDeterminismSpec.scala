package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.{RelationalSuite, Sketches}

/** The round-11 exact-oracle upgrade for approx_sketches /
  * custom_agg_moments rests on two claims this spec machine-checks:
  *
  *  1. BIT-DETERMINISM ACROSS PARTITIONING. Both queries must produce
  *     bit-identical doubles under different shuffle partition counts —
  *     the HLL denominator because it is an exact integer sum, the
  *     histogram because its double ops run over exact per-group scalars,
  *     and the Welford UDAF because the deterministic layout (group-keyed
  *     repartition + in-partition sort on a tie-broken key + single
  *     partial merged into the empty buffer) pins the update sequence.
  *     This also guards against a future optimizer change silently
  *     removing the layout (e.g. sort elimination below aggregates).
  *
  *  2. ROUNDING MARGIN. The one cross-engine libm call in the pipeline is
  *     ln() in HLL's linear-counting branch (JVM Math.log vs DuckDB ln may
  *     differ in the last ulp). The branch result is rounded to a long, so
  *     a flip can only happen when m*ln(m/V) sits within an ulp of a .5
  *     boundary. Assert the fixture's values keep a wide margin (>1e-6,
  *     ~1e7 ulps at this magnitude) so the oracle compare can never flake.
  */
class SketchDeterminismSpec extends SparkSpec {

  private val dirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  /** Run `q` under a config-scoped child session pinned to `parts`
    * shuffle partitions (Dedup's shared round-scoping helper — the same
    * conf-copied child-session mechanism the replays use) and return rows
    * sorted for comparison.
    */
  private def underPartitions(parts: Int)(q: org.apache.spark.sql.SparkSession
      => DataFrame): Seq[Row] =
    q(graft.operators.Dedup.roundScopedSession(spark, parts))
      .collect().toSeq.sortBy(_.toString)

  private def assertBitEqual(name: String, a: Seq[Row], b: Seq[Row]): Unit = {
    assert(a.size == b.size, s"$name: row counts differ")
    a.zip(b).foreach { case (ra, rb) =>
      (0 until ra.length).foreach { i =>
        (ra.get(i), rb.get(i)) match {
          case (x: java.lang.Double, y: java.lang.Double) =>
            assert(java.lang.Double.doubleToRawLongBits(x) ==
              java.lang.Double.doubleToRawLongBits(y),
              s"$name col $i: $x vs $y differ in raw bits")
          case (x, y) => assert(x == y, s"$name col $i: $x vs $y")
        }
      }
    }
  }

  test("custom_agg_moments is bit-identical across partition counts") {
    dirs.foreach { dir =>
      val r3 = underPartitions(3)(s => RelationalSuite.customAggMoments(s, dir))
      val r17 = underPartitions(17)(s => RelationalSuite.customAggMoments(s, dir))
      assertBitEqual(s"moments@$dir", r3, r17)
    }
  }

  test("approx_sketches is bit-identical across partition counts") {
    dirs.foreach { dir =>
      val r3 = underPartitions(3)(s => RelationalSuite.approxSketches(s, dir))
      val r17 = underPartitions(17)(s => RelationalSuite.approxSketches(s, dir))
      assertBitEqual(s"sketches@$dir", r3, r17)
    }
  }

  test("the deterministic layout's sort survives optimization") {
    // the bit-equality test above would catch a removal too, but only
    // probabilistically; the plan pin makes the failure mode explicit
    val plan = RelationalSuite
      .customAggMoments(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Sort "),
      s"expected the in-partition sort to survive optimization:\n$plan")
  }

  test("native sketch estimates are close to the exact answers") {
    // the exact oracle pins REPRODUCTION; this pins ACCURACY — a sketch
    // that faithfully reproduces a bad estimate must still fail
    for (dir <- dirs :+ "/root/testdata/sf0.1") {
      val li = graft.model.Tables.lineitem(spark, dir)
      val est = RelationalSuite.approxSketches(spark, dir)
      val exact = li.groupBy(col("l_returnflag").as("g")).agg(
        countDistinct(col("l_partkey")).as("dparts"),
        countDistinct(col("l_suppkey")).as("dsupp"),
        expr("percentile(l_extendedprice, 0.5)").as("e50"),
        expr("percentile(l_extendedprice, 0.99)").as("e99"),
        min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
      est.join(exact, est("l_returnflag") === exact("g")).collect().foreach { r =>
        def rel(a: Double, b: Double) = math.abs(a - b) / math.max(b, 1.0)
        // 3 sigma for p=10 is ~10%; p=12 ~5%
        assert(rel(r.getAs[Long]("approx_parts").toDouble,
          r.getAs[Long]("dparts").toDouble) < 0.10, s"hll parts off: $r")
        assert(rel(r.getAs[Long]("approx_supp").toDouble,
          r.getAs[Long]("dsupp").toDouble) < 0.05, s"hll supp off: $r")
        // histogram resolution: one bucket width of slack
        val w = (r.getAs[Double]("hi") - r.getAs[Double]("lo")) / 256.0
        assert(math.abs(r.getAs[Double]("p50_price") -
          r.getAs[Double]("e50")) <= w, s"p50 off by > bucket width: $r")
        assert(math.abs(r.getAs[Double]("p99_price") -
          r.getAs[Double]("e99")) <= w, s"p99 off by > bucket width: $r")
      }
    }
  }

  test("HLL linear-counting values sit far from their rounding boundary") {
    // recompute V (empty registers) per group for both wired HLL columns
    // and check every ACTIVE linear-counting estimate's distance to the
    // nearest .5 rounding boundary
    for (dir <- dirs :+ "/root/testdata/sf0.1";
         (col0, p) <- Seq("l_partkey" -> 10, "l_suppkey" -> 12)) {
      val m = 1 << p
      val li = graft.model.Tables.lineitem(spark, dir)
      val h = xxhash64(col(col0))
      val regs = li.select(col("l_returnflag").as("g"),
          h.bitwiseAND(lit((m - 1).toLong)).as("bucket"))
        .groupBy("g", "bucket").agg(count(lit(1)))
        .groupBy("g").agg(count(lit(1)).as("nreg"))
        .collect()
      regs.foreach { r =>
        val v = m - r.getLong(1)
        if (v > 0) {
          val est = m.toDouble * math.log(m.toDouble / v)
          val frac = est - math.floor(est)
          val margin = math.abs(frac - 0.5)
          assert(margin > 1e-6,
            s"$dir $col0 group ${r.getString(0)}: linear-count estimate " +
              s"$est is within $margin of a rounding boundary — pick a " +
              "different p so a last-ulp libm divergence cannot flip it")
        }
      }
    }
  }
}
