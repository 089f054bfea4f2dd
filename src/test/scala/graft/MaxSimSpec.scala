package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Bit-parity for the native MaxSim expression against the independent
  * exploded/composed implementation it replaced — the same treatment
  * DotProductSpec gives the dot kernel, one level up: random vectors
  * (including short arrays and zero sub-vectors), every pair's score
  * compared at the BIT level, and the full top-k query compared
  * end-to-end so rank tie-breaks agree too.
  */
class MaxSimSpec extends SparkSpec {
  import spark.implicits._

  private def randomVecs(seed: Long, n: Int, dim: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Array.fill(dim)((rnd.nextGaussian() * 2).toFloat)))
  }

  test("native MaxSim == composed explode/aggregate form, bit for bit") {
    val vecs = randomVecs(0x5EED1L, 40, 32).toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 6)
    val native = Similarity.lateInteractionTopK(vecs, queries,
        k = 40, nTokens = 4, subDim = 8)
      .select($"query_id", $"neighbor_id", $"score")
      .as[(Long, Long, Double)].collect()
      .map { case (q, d, s) =>
        (q, d) -> java.lang.Double.doubleToLongBits(s) }.toMap
    val composed = Similarity.lateInteractionComposed(vecs, queries,
        k = 40, nTokens = 4, subDim = 8)
      .select($"query_id", $"neighbor_id", $"score")
      .as[(Long, Long, Double)].collect()
      .map { case (q, d, s) =>
        (q, d) -> java.lang.Double.doubleToLongBits(s) }.toMap
    assert(native.keySet == composed.keySet,
      s"pair sets differ: ${native.keySet.size} vs ${composed.keySet.size}")
    val drifted = native.collect {
      case (k, bits) if composed(k) != bits =>
        (k, java.lang.Double.longBitsToDouble(bits),
          java.lang.Double.longBitsToDouble(composed(k)))
    }
    assert(drifted.isEmpty, s"score bits drifted: ${drifted.take(5)}")
  }

  test("interpreted eval == codegen'd eval (short arrays, zero tokens)") {
    // a doc shorter than nTokens*subDim and a zero sub-vector exercise
    // the slice-degradation and NaN-is-greatest branches in both modes
    val rows = Seq(
      (1L, Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)),   // full 2x4
      (2L, Array(1f, 2f, 3f, 4f, 5f)),               // short second token
      (3L, Array(0f, 0f, 0f, 0f, 1f, 2f, 3f, 4f)),   // zero first token
      (4L, Array(2f, -1f, 0.5f, 3f, -2f, 1f, 4f, -3f)))
      .toDF("vec_id", "embedding")
    val q = rows.filter($"vec_id" === 4L)
      .select($"embedding".as("q_emb"))
    val expr = graft.functions.MaxSim.maxSim($"embedding", $"q_emb", 2, 4)
    def run(codegen: String): Map[Long, Long] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try rows.crossJoin(q)
        .select($"vec_id", expr.as("s"))
        .as[(Long, Double)].collect()
        .map { case (id, s) =>
          id -> java.lang.Double.doubleToLongBits(s) }.toMap
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val gen = run("CODEGEN_ONLY")
    val interp = run("NO_CODEGEN")
    assert(gen == interp, s"codegen vs interpreted drift: $gen vs $interp")
    // the self-pair scores exactly nTokens (cos 1.0 per token)
    assert(java.lang.Double.longBitsToDouble(gen(4L)) == 2.0,
      "self MaxSim must be exactly nTokens")
  }

  test("max_sim is SQL-callable, matches the Column API, rejects non-literal geometry") {
    randomVecs(0xBEEFL, 8, 16).toDF("vec_id", "embedding")
      .createOrReplaceTempView("ms_vecs")
    val viaSql = spark.sql(
      """SELECT a.vec_id AS qa, b.vec_id AS qb,
        |       max_sim(b.embedding, a.embedding, 2, 8) AS s
        |FROM ms_vecs a JOIN ms_vecs b ON a.vec_id <> b.vec_id""".stripMargin)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) =>
        (a, b) -> java.lang.Double.doubleToLongBits(s) }.toMap
    val df = spark.table("ms_vecs")
    val viaCol = df.as("a")
      .join(df.as("b"), $"a.vec_id" =!= $"b.vec_id")
      .select($"a.vec_id".as("qa"), $"b.vec_id".as("qb"),
        graft.functions.MaxSim.maxSim($"b.embedding", $"a.embedding", 2, 8)
          .as("s"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) =>
        (a, b) -> java.lang.Double.doubleToLongBits(s) }.toMap
    assert(viaSql == viaCol, "SQL and Column APIs must agree to the bit")
    // geometry must be literal — it is burned into the generated code
    intercept[Exception] {
      spark.sql("SELECT max_sim(embedding, embedding, CAST(rand()*2 AS INT), 8) FROM ms_vecs")
        .collect()
    }
  }
}
