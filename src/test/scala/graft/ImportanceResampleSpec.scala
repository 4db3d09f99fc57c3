package graft

import org.apache.spark.sql.functions._

/** `q_importance_resample` — the DSIR-shaped importance resampler
  * (hashed-ngram importance weights + Gumbel top-k draw).
  *
  * Pins: (1) the sorted-fold logw equals an order-free recompute to float
  * tolerance (the fold exists for cross-engine determinism, not to change
  * the value); (2) the self-selection property — the target language's
  * mean log importance weight strictly dominates every other language's
  * (the weights point TOWARD the target distribution, which is the whole
  * point of the operator); (3) the Gumbel draw is reproducible and favors
  * high-weight documents (sampled mean logw above the population mean);
  * (4) the plan is the scale shape the lane documents: a
  * TakeOrderedAndProject top-k (never a global sort) with the B-row
  * contribution table broadcast.
  */
class ImportanceResampleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("sorted-bucket fold equals an order-free sum of the same terms") {
    val dw = graft.queries.PipelineQueries.dsirWeights(spark, sf).persist()
    val free = dw
      .select(col("doc_id"),
        explode(col("terms")).as("t"), col("logw"))
      .groupBy(col("doc_id"), col("logw"))
      .agg(sum(col("t.term")).as("logw_free"))
    val drift = free
      .filter(abs(col("logw") - col("logw_free")) > 1e-9).count()
    assert(drift === 0L)
    dw.unpersist()
    Bench.cleanup(spark)
  }

  test("self-selection: target-language mean logw dominates every other language") {
    val dw = graft.queries.PipelineQueries.dsirWeights(spark, sf)
    val means = dw.groupBy(col("lang")).agg(avg(col("logw")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val en = means("en")
    means.filter(_._1 != "en").foreach { case (l, m) =>
      assert(en > m, s"mean logw of en ($en) must dominate $l ($m)")
    }
    Bench.cleanup(spark)
  }

  test("Gumbel draw is reproducible and favors high-weight documents") {
    val q = SparkEntry.queries("q_importance_resample")
    val a = q(spark, sf).collect().map(_.toString).toSeq
    val b = q(spark, sf).collect().map(_.toString).toSeq
    assert(a === b)
    assert(a.size === 30)
    val dw = graft.queries.PipelineQueries.dsirWeights(spark, sf).persist()
    val popMean = dw.agg(avg(col("logw"))).head().getDouble(0)
    val sampled = q(spark, sf).select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val sampMean = dw.filter(col("doc_id").isin(sampled.toSeq: _*))
      .agg(avg(col("logw"))).head().getDouble(0)
    assert(sampMean > popMean,
      s"sampled mean logw ($sampMean) must exceed population mean ($popMean)")
    dw.unpersist()
    Bench.cleanup(spark)
  }

  test("plan: top-k via TakeOrderedAndProject, contribution table broadcast, no global sort") {
    // the lane checkpoints its declared output (round-20 attribution
    // sweep) — guard the registered pre-force plan
    graft.plans.AuditFrames.clear()
    val declared = SparkEntry.queries("q_importance_resample")(spark, sf)
    val plan = graft.plans.AuditFrames.get("q_importance_resample")
      .getOrElse(declared).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
    // the only acceptable Sort nodes are inside per-partition aggregation,
    // never a global (singlePartition-exchanged) ordering
    assert(!plan.contains("rangepartitioning"))
    Bench.cleanup(spark)
  }
}
