package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit cases for [[OracleLint]] — red on the exact round-12 defects,
  * green on their CAST-wrapped fixes. (The sweep over every wired oracle
  * against real Spark schemas lives in CollectLintSpec, piggybacking on
  * its single construction pass.)
  */
class OracleLintSpec extends AnyFunSuite {

  test("flags the three round-12 uncast-sum shapes") {
    // map_analytics `total` (pre-fix)
    assert(OracleLint.uncastAggAliases(
      "SELECT user_id, count(*) AS n_types, sum(cnt) AS total FROM c GROUP BY 1",
      Set("total", "n_types")) == Seq("total"))
    // variant_props `sum_k` (pre-fix): sum of an inner CAST is still HUGEINT
    assert(OracleLint.uncastAggAliases(
      "SELECT sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS sum_k FROM e",
      Set("sum_k")) == Seq("sum_k"))
    // source_concentration `n_chars` (pre-fix): CTE alias, bare passthrough
    assert(OracleLint.uncastAggAliases(
      """WITH s AS (SELECT source, sum(n_chars) AS n_chars FROM d GROUP BY 1)
        |SELECT source, n_chars FROM s""".stripMargin,
      Set("n_chars")) == Seq("n_chars"))
  }

  test("green once the aggregate is CAST-wrapped") {
    assert(OracleLint.uncastAggAliases(
      "SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c",
      Set("total")).isEmpty)
    assert(OracleLint.uncastAggAliases(
      """SELECT CAST(sum(CAST(json_extract(p, '$.k') AS BIGINT))
        |  AS BIGINT) AS sum_k FROM e""".stripMargin,
      Set("sum_k")).isEmpty)
    assert(OracleLint.uncastAggAliases(
      "SELECT CAST(coalesce(sum(CASE WHEN x THEN c END), 0) AS BIGINT) AS n FROM t",
      Set("n")).isEmpty)
    // the CAST need not be outermost — token_budget_mix's capped_tokens
    // (driver-green r12): sum inside CAST inside least()
    assert(OracleLint.uncastAggAliases(
      """SELECT least(total_tokens,
        |  CAST(floor(sum(total_tokens) OVER () * 0.3e0) AS BIGINT))
        |  AS capped_tokens FROM t""".stripMargin,
      Set("capped_tokens")).isEmpty)
    // but an inner CAST on the ARGUMENT does not protect the outer sum
    assert(OracleLint.uncastAggAliases(
      "SELECT sum(CAST(x AS BIGINT)) AS s FROM t",
      Set("s")) == Seq("s"))
  }

  test("multi-line sum expressions are covered") {
    assert(OracleLint.uncastAggAliases(
      "SELECT sum(k)\n  AS total_k FROM e",
      Set("total_k")) == Seq("total_k"))
  }

  test("a preceding CTE's sum is not attributed to a later clean alias") {
    // the q17_small_qty shape: the backward scan from `AS n_small`
    // crosses the balanced CTE `s` — its sum(qty) must not flag the
    // count(*) projection that follows
    assert(OracleLint.uncastAggAliases(
      """WITH li AS (SELECT l_partkey, qty FROM lineitem),
        |s AS (SELECT l_partkey, sum(qty) AS qty_sum FROM li GROUP BY 1)
        |SELECT count(*) AS n_small
        |FROM li JOIN s USING (l_partkey) WHERE qty < qty_sum""".stripMargin,
      Set("n_small")).isEmpty)
    // but a LONG column the final SELECT passes through FROM such a CTE
    // still flags at its own (CTE) alias site
    assert(OracleLint.uncastAggAliases(
      """WITH s AS (SELECT k, sum(q) AS qty_sum FROM t GROUP BY 1)
        |SELECT k, qty_sum FROM s""".stripMargin,
      Set("qty_sum")) == Seq("qty_sum"))
  }

  test("non-sum aggregates and non-long aliases are not flagged") {
    // DuckDB count — plain or DISTINCT — returns BIGINT (int64 after
    // fetch), not HUGEINT: the driver proved it by hash-passing
    // mergeable_rollup's uncast `count(DISTINCT user_id)` in round 12
    assert(OracleLint.uncastAggAliases(
      "SELECT count(*) AS n_docs, max(x) AS mx FROM t",
      Set("n_docs", "mx")).isEmpty)
    assert(OracleLint.uncastAggAliases(
      "SELECT count(DISTINCT k)\n  AS n_distinct_k FROM e",
      Set("n_distinct_k")).isEmpty)
    // window row_number wrapped in CAST, inner `AS BIGINT` is not an alias
    assert(OracleLint.uncastAggAliases(
      "SELECT CAST(row_number() OVER w AS BIGINT) AS rank FROM s WINDOW w AS (ORDER BY x)",
      Set("rank")).isEmpty)
    // a DOUBLE column is outside longCols and never inspected
    assert(OracleLint.uncastAggAliases(
      "SELECT sum(share) AS cum_share FROM s", Set.empty).isEmpty)
  }
}
