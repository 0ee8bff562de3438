package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks for the driver interface. */
class SparkEntrySpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query except declared no-oracle ops has an oracle") {
    // rows-only checked ops (sketches are engine-specific by design)
    val noOracle = Set("rel_approx_distinct")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- noOracle
    assert(missing.isEmpty, s"queries without oracles: $missing")
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("scan pushdown reaches the parquet source") {
    val df = SparkEntry.queries("s1_scan_pushdown")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(event_id,100)"),
      s"expected pushed filters in:\n$plan")
    // projection pruned to the 3 referenced columns
    assert(plan.contains("ReadSchema: struct<event_id:bigint,user_id:bigint,value:double>"),
      "expected pruned ReadSchema")
  }
}
