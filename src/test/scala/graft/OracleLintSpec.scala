package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit cases for [[OracleLint]] — red on the exact round-12 defects
  * (uncast sums) AND the exact round-16 defects (wide-decimal final
  * types), green on their fixed shapes. (The sweep over every wired
  * oracle against real Spark schemas lives in CollectLintSpec,
  * piggybacking on its single construction pass.)
  */
class OracleLintSpec extends AnyFunSuite {

  test("flags the two round-16 wide-decimal final-type shapes") {
    // state_inspect_lexical h_sum (pre-fix): outermost CAST targets
    // DECIMAL(38,0) — DuckDB fetches float64, Spark parquet is exact
    assert(OracleLint.wideDecimalAliases(
      """SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_terms,
        |       CAST(sum(tf) AS BIGINT) AS dl,
        |       CAST(sum(CAST(h0 AS HUGEINT))
        |         AS DECIMAL(38,0)) AS h_sum
        |FROM tfh GROUP BY doc_id""".stripMargin,
      Set("doc_id", "n_terms", "dl", "h_sum")) == Seq("h_sum"))
    // state_inspect_asof price_sum (pre-fix): inner (18,2) cast does not
    // save an outermost DECIMAL(38,2)
    assert(OracleLint.wideDecimalAliases(
      """SELECT o_custkey AS user_id,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |         AS DECIMAL(38,2)) AS price_sum
        |FROM orders GROUP BY 1""".stripMargin,
      Set("user_id", "price_sum")) == Seq("price_sum"))
    // DuckDB postfix cast form of the same defect
    assert(OracleLint.wideDecimalAliases(
      "SELECT sum(x)::DECIMAL(38,0) AS s FROM t",
      Set("s")) == Seq("s"))
    // a CTE-defined wide decimal passed through bare by the final SELECT
    // inherits the wide type
    assert(OracleLint.wideDecimalAliases(
      """WITH c AS (SELECT CAST(sum(d) AS DECIMAL(38,0)) AS chk FROM t)
        |SELECT chk FROM c""".stripMargin,
      Set("chk")) == Seq("chk"))
  }

  test("green on the round-16 fixed shapes and on internal wide decimals") {
    // the fix: outermost cast re-surfaces as VARCHAR (table_checksum
    // discipline) — the inner DECIMAL(38,0) stays internal
    assert(OracleLint.wideDecimalAliases(
      """SELECT doc_id,
        |       CAST(CAST(sum(CAST(h0 AS HUGEINT))
        |         AS DECIMAL(38,0)) AS VARCHAR) AS h_sum
        |FROM tfh GROUP BY doc_id""".stripMargin,
      Set("doc_id", "h_sum")).isEmpty)
    assert(OracleLint.wideDecimalAliases(
      """SELECT CAST(CAST(sum(CAST(p AS DECIMAL(18,2)))
        |  AS DECIMAL(18,2)) AS VARCHAR) AS price_sum FROM o""".stripMargin,
      Set("price_sum")).isEmpty)
    // a narrow (p<=18) final decimal is outside this rule's scope
    assert(OracleLint.wideDecimalAliases(
      "SELECT CAST(sum(p) AS DECIMAL(18,2)) AS ps FROM o",
      Set("ps")).isEmpty)
    // a wide decimal INTERMEDIATE under a different alias never flags
    // the output column (bm25's exact integer kernel shape)
    assert(OracleLint.wideDecimalAliases(
      """WITH k AS (SELECT doc, CAST(tf AS DECIMAL(38,0)) AS w FROM p)
        |SELECT doc, CAST(sum(w) AS BIGINT) AS score FROM k GROUP BY 1""".stripMargin,
      Set("doc", "score")).isEmpty)
    // cast-free aliases are clean
    assert(OracleLint.wideDecimalAliases(
      "SELECT count(*) AS n FROM t", Set("n")).isEmpty)
  }

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
