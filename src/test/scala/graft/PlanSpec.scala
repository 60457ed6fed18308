package graft

/** Physical-plan shape assertions: the scale properties the engine claims
  * (pushdown, broadcast, partial aggregation) must be visible in the plans
  * Catalyst actually produces — not just intended.
  */
class PlanSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("f10: filters are pushed to the parquet scan") {
    val plan = planOf("f10_pushdown_scan")
    assert(plan.contains("PushedFilters"), "no PushedFilters in scan")
    assert(plan.contains("GreaterThan(l_discount"),
      s"discount filter not pushed:\n${plan.take(800)}")
  }

  test("q5: dimension chain joins are broadcast, not shuffled") {
    val plan = planOf("q5_region_revenue")
    assert(plan.contains("BroadcastHashJoin"), "expected BroadcastHashJoin")
    assert(!plan.contains("SortMergeJoin"), "dimension join degenerated to SMJ")
  }

  test("q1: aggregation is partial+final (map-side combine)") {
    val plan = planOf("q1_pricing_summary")
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"),
      "no hash aggregation in plan")
  }

  test("j_anti: anti join on the fact side") {
    val plan = planOf("j_anti_customers")
    assert(plan.contains("LeftAnti"), "expected a left-anti join")
  }

  test("scan prunes columns to the read schema") {
    val plan = planOf("f10_pushdown_scan")
    // only the needed lineitem columns should be read
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("l_comment"), "unused column in read schema")
    val read = plan.split("ReadSchema:")(1).takeWhile(_ != '\n')
    assert(!read.contains("l_orderkey"), s"pruning failed: $read")
  }
}
