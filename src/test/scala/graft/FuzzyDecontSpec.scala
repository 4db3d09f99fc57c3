package graft

import org.apache.spark.sql.functions._

/** The fuzzy-decontamination contract (`q_decontaminate_fuzzy`): the
  * planted leaks are PROVABLY invisible to the exact word-8-gram arm
  * (longest unbroken token run is 4), the fuzzy arm catches them at the
  * measured banding recall, and every miss is a banding miss — the
  * planted pairs' exact Jaccard all clear the verify threshold.
  */
class FuzzyDecontSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val evalMod = 97

  private def evalDocs(dir: String) = Tables(spark, dir).documents
    .filter(col("doc_id") % evalMod === 0)
    .select(col("doc_id"), col("text"))

  /** (doc_id, original text, every-5th-token-dropped text). */
  private def planted(dir: String) = evalDocs(dir)
    .withColumn("mut",
      concat_ws(" ", filter(split(col("text"), " "), (_, i) => i % 5 =!= 0)))

  test("planted leaks share ZERO word-8-grams with their eval sources") {
    // the structural gap the lane exists for: dropping every 5th token
    // caps unbroken runs at 4 tokens, so no 8-gram of the mutated text
    // can match an 8-gram of the original — the exact arm
    // (q_decontaminate's shape) scores these leaks a hard zero
    def g8(c: org.apache.spark.sql.Column) = {
      val l = split(c, " ")
      array_distinct(transform(
        when(size(l) >= 8, sequence(lit(1), size(l) - 7)).otherwise(array()),
        i => concat_ws(" ", (0 to 7).map(k => element_at(l, i + k)): _*)))
    }
    val overlaps = planted(sf)
      .withColumn("shared", size(array_intersect(g8(col("text")), g8(col("mut")))))
      .filter(col("shared") > 0)
    assert(overlaps.count() === 0L)
    Bench.cleanup(spark)
  }

  test("every planted pair's exact Jaccard clears the 0.2 verify threshold") {
    // so any planted pair the query misses was missed by the BANDS, not
    // the verify — the analytic (1-j)^16 ≈ 0.6% per-pair banding miss
    // rate at the planted jac floor (H raised 8 → 16 in round 15 off
    // the measured curve in docs/SCALING.md)
    def sh3(c: org.apache.spark.sql.Column) = {
      val l = split(c, " ")
      array_distinct(transform(
        when(size(l) >= 3, sequence(lit(1), size(l) - 2)).otherwise(array()),
        i => concat_ws("_", element_at(l, i), element_at(l, i + 1), element_at(l, i + 2))))
    }
    val jac = planted(sf)
      .withColumn("sa", sh3(col("text"))).withColumn("sb", sh3(col("mut")))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jac", col("inter").cast("double")
        / (size(col("sa")) + size(col("sb")) - col("inter")))
    assert(jac.filter(col("jac") < 0.2).count() === 0L)
    assert(jac.agg(min(col("jac"))).collect()(0).getDouble(0) > 0.26)
    Bench.cleanup(spark)
  }

  test("fuzzy arm catches all 6 planted leaks at sf0.001 AND sf0.01") {
    // at H=8 the sf0.01 run missed one planted pair (exact jac 0.276 —
    // all 8 width-1 bands missed it, the measured instance of the
    // analytic (1-j)^H rate); H=16 closes it, which is exactly why the
    // default moved (docs/SCALING.md has the 8/12/16 curve)
    val out = SparkEntry.queries("q_decontaminate_fuzzy")(spark, sf)
      .persist()
    val caught = out.filter(col("train_id") === col("eval_id") + 3000000L).count()
    assert(caught === 6L)
    // every emitted row clears the threshold (verify is downstream of bands)
    assert(out.filter(col("jac") < 0.2).count() === 0L)
    out.unpersist()
    val out01 = SparkEntry.queries("q_decontaminate_fuzzy")(spark, "/root/testdata/sf0.01")
    val caught01 = out01.filter(col("train_id") === col("eval_id") + 3000000L).count()
    assert(caught01 === 6L)
    Bench.cleanup(spark)
  }

  test("the eval band index is on the broadcast side of the candidate join") {
    val plan = SparkEntry.queries("q_decontaminate_fuzzy")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "candidate join must broadcast the eval side")
    assert(!plan.contains("CartesianProduct"))
    Bench.cleanup(spark)
  }
}
