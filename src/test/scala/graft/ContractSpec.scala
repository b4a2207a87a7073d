package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariants — the exact drift that zeroed round 1
  * (authored queries never registered) must be structurally impossible
  * to reintroduce. */
class ContractSpec extends AnyFunSuite {

  test("every oracle key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("inventory size matches the declared SURVEY totals") {
    assert(SparkEntry.queries.size == 138,
      s"queries has ${SparkEntry.queries.size} keys — update SURVEY §2.11 totals")
    assert(SparkEntry.oracleSql.size == 135,
      s"oracleSql has ${SparkEntry.oracleSql.size} keys — update SURVEY §2.11 totals")
  }

  test("no-oracle keys are exactly the inherently uncheckable sketch ones") {
    // Each is approximate BY CONSTRUCTION with engine-specific sketch
    // internals (HLL++ / Greenwald-Khanna vs DuckDB's HLL / t-digest),
    // so no DuckDB twin can hash-match; each carries a quantitative
    // Spark-test bound instead (OperatorSpec / PipelineSpec).
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("q_agg_approx_distinct",
      "q_agg_percentile_approx", "q_quality_outliers_approx"), noOracle)
  }

  test("every key follows the q_ naming convention (file-path safe)") {
    SparkEntry.queries.keys.foreach { k =>
      assert(k.matches("q_[a-z0-9_]+"), s"unsafe key name: $k")
    }
  }
}
