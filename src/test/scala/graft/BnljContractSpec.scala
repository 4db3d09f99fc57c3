package graft

import org.apache.spark.sql.functions._

/** The nested-loop-broadcast contract, machine-checked (round-14 verdict
  * item: 178 BNLJs across the audited plans are all 1-row/K-row stat
  * joins, but only prose said so). `ExplainAudit.bnljViolations` must
  * accept the codebase's legitimate shapes — a 1-row global-aggregate
  * broadcast, a bounded-limit broadcast — and reject a PLANTED unbounded
  * build side, so the PLANS_r14 run's clean bill is a real check, not a
  * vacuous matcher.
  */
class BnljContractSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("1-row global-aggregate broadcast stat join passes") {
    val docs = Tables(spark, sf).documents
    val stats = docs.agg(count(lit(1)).as("n_total"))
    val joined = docs.crossJoin(broadcast(stats))
    val viol = graft.tools.ExplainAudit.bnljViolations(joined.queryExecution.executedPlan)
    assert(viol.isEmpty, viol.mkString("\n"))
  }

  test("bounded-limit broadcast passes") {
    val docs = Tables(spark, sf).documents
    val top = docs.orderBy(col("doc_id")).limit(5).select(col("doc_id").as("probe"))
    val joined = docs.crossJoin(broadcast(top))
    val viol = graft.tools.ExplainAudit.bnljViolations(joined.queryExecution.executedPlan)
    assert(viol.isEmpty, viol.mkString("\n"))
  }

  test("a planted unbounded build side is rejected") {
    val docs = Tables(spark, sf).documents
    // corpus × corpus with no bounding node on the broadcast side — the
    // exact shape the contract exists to forbid
    val joined = docs.select(col("doc_id"))
      .crossJoin(broadcast(docs.select(col("doc_id").as("d2"))))
    val viol = graft.tools.ExplainAudit.bnljViolations(joined.queryExecution.executedPlan)
    assert(viol.nonEmpty, "planted unbounded BNLJ build side was not flagged")
  }

  test("an exploded (Generate) build side is rejected even under a bounded parent") {
    val docs = Tables(spark, sf).documents
    // limit-then-explode: the limit bounds its INPUT, but Generate
    // multiplies rows data-dependently downstream of it — pass-through
    // matching must not see through the explode
    val exploded = docs.limit(3)
      .select(explode(split(col("text"), " ")).as("tok"))
    val joined = docs.select(col("doc_id")).crossJoin(broadcast(exploded))
    val viol = graft.tools.ExplainAudit.bnljViolations(joined.queryExecution.executedPlan)
    assert(viol.nonEmpty, "explode above the bounding limit was not flagged")
  }
}
