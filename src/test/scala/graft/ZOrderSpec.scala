package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave puts x on even bits, y on odd bits, and preserves order locality") {
    assert(ZOrder.interleave(0L, 0L) == 0L)
    assert(ZOrder.interleave(1L, 0L) == 1L)
    assert(ZOrder.interleave(0L, 1L) == 2L)
    assert(ZOrder.interleave(3L, 0L) == 5L)     // 0b11 -> 0b0101
    assert(ZOrder.interleave(0L, 3L) == 10L)    // 0b11 -> 0b1010
    assert(ZOrder.interleave(0xFFFFFFFFL, 0L) == 0x5555555555555555L)
    assert(ZOrder.interleave(0L, 0xFFFFFFFFL) == 0xAAAAAAAAAAAAAAAAL)
    // de-interleave round-trip on random points
    val rng = new scala.util.Random(7)
    (0 until 1000).foreach { _ =>
      val x = rng.nextInt(1 << 16).toLong
      val y = rng.nextInt(1 << 16).toLong
      val z = ZOrder.interleave(x, y)
      var (dx, dy) = (0L, 0L)
      (0 until 32).foreach { i =>
        dx |= ((z >>> (2 * i)) & 1L) << i
        dy |= ((z >>> (2 * i + 1)) & 1L) << i
      }
      assert(dx == x && dy == y)
    }
  }

  test("expression evals like the static helper and stays in codegen") {
    val df = (0 until 500).map(i => (i.toLong, (i * 37 % 91).toLong))
      .toDF("x", "y").repartition(2)
      .select($"x", $"y", ZOrder.zValue($"x", $"y").as("z"))
    // collect df ITSELF (not a derived .as Dataset) so AQE finalizes the
    // same queryExecution we inspect below
    val rows = df.collect()
    rows.foreach { r => assert(r.getLong(2) == ZOrder.interleave(r.getLong(0), r.getLong(1))) }
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
      s"expected z_value inside a codegen stage in:\n$plan")
  }

  test("z-ordered layout gives every file a small (x, y) bounding box") {
    // 64x64 grid, uniformly filled: any contiguous z-range of 1/16 of the
    // points covers ~1/16 of the AREA (a box ~1/4 on each side); a
    // single-column sort would instead give each file the FULL range of
    // the other column. Assert the mean per-file box area is far below
    // the single-sort layout's.
    val n = 64
    val pts = (0 until n * n).map(i => (i / n, i % n)).toDF("x", "y")
    val dir = tmpDir("zorder")
    pts.withColumn("z", ZOrder.zValue($"x", $"y"))
      .repartitionByRange(16, $"z").sortWithinPartitions($"z").drop("z")
      .write.mode("overwrite").parquet(dir)
    val boxes = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(((max($"x") - min($"x") + 1) * (max($"y") - min($"y") + 1))
        .as("area"))
      .agg(avg($"area")).as[Double].head()
    val totalArea = n.toDouble * n
    // single-sort-by-x layout: every file spans all of y -> area >= n*n/16
    assert(boxes < totalArea / 8,
      s"mean per-file box area $boxes should be << $totalArea")
  }
}
