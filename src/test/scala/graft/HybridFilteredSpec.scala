package graft

import org.apache.spark.sql.functions._

/** The filtered-hybrid contract (`q_hybrid_filtered`): the lang
  * predicate holds end-to-end on the fused output, each arm's ranks are
  * computed AFTER the filter (contiguous from 1 — a filtered-out doc
  * never occupies a rank), and the vector arm's index scan carries both
  * the probe-cell partition filters and the pushed lang predicate.
  */
class HybridFilteredSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every fused doc is lang='de' and both arms contribute") {
    val fused = SparkEntry.queries("q_hybrid_filtered")(spark, sf).persist()
    assert(fused.count() === 10L)
    val langs = fused.join(
        Tables(spark, sf).documents.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("lang")).distinct().collect().map(_.getString(0)).toSet
    assert(langs === Set("de"))
    assert(fused.filter(col("r_lex") > 0).count() > 0L)
    assert(fused.filter(col("r_vec") > 0).count() > 0L)
    fused.unpersist()
    Bench.cleanup(spark)
  }

  test("lex ranks are post-filter: fused r_lex equals an independent filtered recompute") {
    // if the filter were applied AFTER ranking, a doc's reported r_lex
    // would be its rank among ALL langs (gaps where non-de docs held
    // ranks); post-filter, it is its rank among 'de' docs only — the
    // independent recompute here
    val docs = Tables(spark, sf).documents
    val truth = graft.queries.TextQueries.bm25ScoredDocs(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .filter(col("lang") === "de")
      .withColumn("want", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("bm25").desc, col("doc_id"))))
      .filter(col("want") <= 10)
      .select(col("doc_id"), col("want"))
    // one invocation serves both assertions — the lane eagerly rebuilds
    // its index per call, so a second call doubles the test's cost
    val fused = SparkEntry.queries("q_hybrid_filtered")(spark, sf).persist()
    val mism = fused.filter(col("r_lex") > 0)
      .select(col("doc_id"), col("r_lex"))
      .join(truth, "doc_id")
      .filter(col("r_lex") =!= col("want"))
    assert(mism.count() === 0L)
    // and the best post-filter candidates of both arms made the fusion
    assert(fused.filter(col("r_lex") === 1).count() === 1L)
    assert(fused.filter(col("r_vec") === 1).count() === 1L)
    fused.unpersist()
    Bench.cleanup(spark)
  }

  test("the vector arm's index scan carries partition filters AND the pushed lang filter") {
    // the serve is checkpointed (round-20 attribution sweep) — the plan
    // pin reads the registered pre-force frame
    graft.plans.AuditFrames.clear()
    val declared = SparkEntry.queries("q_hybrid_filtered")(spark, sf)
    val plan = graft.plans.AuditFrames.get("q_hybrid_filtered")
      .getOrElse(declared).queryExecution.executedPlan.toString
    val indexScans = plan.linesIterator
      .filter(_.contains("graft-hybrid-filtered-index"))
      .mkString("\n")
    assert(indexScans.nonEmpty, s"filtered hybrid index scan not found:\n${plan.take(2000)}")
    assert(indexScans.contains("PartitionFilters: [c_id"),
      s"no probe-cell partition filter:\n$indexScans")
    assert(indexScans.contains("EqualTo(lang,de)"),
      s"lang predicate not pushed into the probed cells:\n$indexScans")
    Bench.cleanup(spark)
  }
}
