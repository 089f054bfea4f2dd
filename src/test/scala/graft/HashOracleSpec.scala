package graft

import org.apache.spark.sql.functions._

/** Preconditions the generated hash oracles (HashOracles) rest on — each
  * checked here so a violated assumption fails with its CAUSE instead of
  * an opaque downstream hash mismatch:
  *
  *  1. ASCII corpus: the DuckDB side hashes unicode() CODE POINTS while
  *     the engine's ShingleHash hashes UTF-8 BYTES; these agree only when
  *     every character is < 0x80. Checked at all three fixture scales.
  *  2. The XXH64 model: the oracle generator embeds its own arithmetic
  *     model of Spark's xxhash64 (8-byte fold + 4-byte literal path). Pin
  *     Spark's actual outputs for known inputs against hard values
  *     produced by that model, so a Spark-side hash change (or a model
  *     regression) surfaces here, not as 500 mismatched signatures.
  */
class HashOracleSpec extends SparkSpec {

  test("documents fixture is pure ASCII at every scale (FNV oracle precondition)") {
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val bad = spark.read
        .parquet(s"/root/testdata/$sf/documents.parquet")
        .filter(col("text").rlike("[^\\x00-\\x7F]"))
        .count()
      assert(bad == 0L,
        s"$sf: $bad documents contain non-ASCII characters — the DuckDB " +
          "shingle oracle's unicode()-codepoint FNV no longer equals the " +
          "engine's UTF-8-byte FNV; hash the oracle over bytes instead")
    }
  }

  test("Spark xxhash64 matches the oracle generator's arithmetic model") {
    import spark.implicits._
    // expected values computed from the XXH64 model HashOracles encodes
    // (8-byte fold with running seed 42; the trailing INT literal takes
    // the 4-byte path) — independently cross-checked against Spark at
    // model-validation time in round 11
    val rows = Seq(0L, 123456789L, -1L, Long.MinValue, 982451653L).toDF("v")
    val got = rows
      .select(xxhash64(col("v")).as("h1"),
        xxhash64(col("v"), lit(42L)).as("h42"),
        xxhash64(array(col("v"), col("v") + 1), lit(5)).as("harr"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val expected = Seq(
      (-5252525462095825812L, -8994656443351902500L, -2346842137098179939L),
      (3415128141240069951L, 1931208496436971612L, -5573205512054763102L),
      (3858142552250413010L, 8741282122755872498L, -4061166197709530373L),
      (-8619748838626508300L, -2902973889360472374L, -2714985762516472886L),
      (-3651523063254546804L, 5117773879108247644L, 5579463011714226890L))
    assert(got == expected,
      s"Spark's xxhash64 diverged from the HashOracles arithmetic model:\n" +
        s"got $got\nexpected $expected")
  }
}
