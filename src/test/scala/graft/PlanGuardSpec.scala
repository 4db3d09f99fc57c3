package graft

/** Physical-plan regression guards: properties the engine's scale story
  * depends on, asserted against the actual planned queries so a refactor
  * that silently loses them fails CI (plans are otherwise only *recorded*
  * in docs/PLANS_r3.md).
  */
class PlanGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_meta_series plans exactly ONE parquet scan (single-parse meta lane)") {
    // the round-2 shape parsed the corpus twice; the fused lane must keep
    // one scan feeding both the volume and route-count series
    val plan = planOf("q_meta_series")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 1, s"expected 1 parquet scan, found $scans:\n${plan.take(3000)}")
  }

  test("q_scan reaches the parquet reader with pushed filters") {
    val plan = planOf("q_scan")
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(!plan.contains("PushedFilters: []"), plan.take(2000))
  }

  test("q_join_broadcast builds a broadcast join, not a shuffle of the fact side") {
    val plan = planOf("q_join_broadcast")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q_similarity_topk keeps the partition-local WindowGroupLimit before the exchange") {
    // the round-1 shape put the whole corpus through one window task
    val plan = planOf("q_similarity_topk")
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }
}
