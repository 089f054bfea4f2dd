package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Driver-contract integrity: SparkEntry concatenates six suite maps, so
  * a duplicated query name across suites would SILENTLY drop one of the
  * two implementations (last map wins) — and an oracle without a wired
  * query would silently never be checked. Both are pure-map invariants, no
  * Spark session needed.
  */
class EntryContractSpec extends AnyFunSuite {

  private val suites = Seq(
    "EventSuite" -> (EventSuite.queries.keySet, EventSuite.oracles.keySet),
    "RelationalSuite" -> (RelationalSuite.queries.keySet, RelationalSuite.oracles.keySet),
    "TextSuite" -> (TextSuite.queries.keySet, TextSuite.oracles.keySet),
    "SimilaritySuite" -> (SimilaritySuite.queries.keySet, SimilaritySuite.oracles.keySet),
    "MediaSuite" -> (MediaSuite.queries.keySet, MediaSuite.oracles.keySet),
    "StorageSuite" -> (StorageSuite.queries.keySet, StorageSuite.oracles.keySet))

  test("no query name collides across suites") {
    val all = suites.flatMap { case (n, (qs, _)) => qs.map(_ -> n) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"colliding query names: $dups")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle has a wired query, within its own suite") {
    suites.foreach { case (n, (qs, os)) =>
      val orphans = os.diff(qs)
      assert(orphans.isEmpty, s"$n oracles without a query: $orphans")
    }
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every wired query carries an oracle (no rows-only checks remain)") {
    // round 11 closed the last four: the seeded hash sketches recompute in
    // DuckDB via HashOracles, approx_sketches moved to the deterministic
    // native sketches, and custom_agg_moments pinned a deterministic
    // aggregation layout — a new rows-only query is a regression
    val noOracle = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(noOracle.isEmpty,
      s"queries without an oracle (driver would record a weaker rows-only check): $noOracle")
  }
}
