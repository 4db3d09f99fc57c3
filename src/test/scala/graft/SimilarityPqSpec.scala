package graft

import org.apache.spark.sql.functions._

/** Product-quantization ANN (`q_similarity_pq`, landed end of round 4).
  * Structural properties only — value parity is the DuckDB oracle's job.
  */
class SimilarityPqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run() = SparkEntry.queries("q_similarity_pq")(spark, dir)

  test("pq: 8 queries x contiguous ranks 1..5, no self-match") {
    val r = run().cache()
    try {
      assert(r.select(col("q_id")).distinct().count() == 8)
      val bad = r.groupBy(col("q_id"))
        .agg(count(lit(1)).as("k"), max(col("rank")).as("mx"),
          countDistinct(col("rank")).as("nd"))
        .filter(col("k") =!= 5 || col("mx") =!= 5 || col("nd") =!= 5)
      assert(bad.isEmpty, "ranks per query are not a contiguous 1..5 ranking")
      assert(r.filter(col("q_id") === col("vec_id")).isEmpty, "self-match leaked")
    } finally { r.unpersist(); () }
  }

  test("pq: ADC distance is a squared L2 — nonnegative and nondecreasing in rank") {
    val r = run()
    assert(r.filter(col("adc") < -1e-9).isEmpty, "negative squared distance")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("rank"))
    val bad = r.withColumn("prev", lag(col("adc"), 1).over(w))
      .filter(col("prev").isNotNull && col("adc") < col("prev") - 1e-9)
    assert(bad.isEmpty, "ADC not nondecreasing with rank")
  }

  test("pq: deterministic — same input, same top-k") {
    val a = run()
    val b = run()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, "PQ top-k not deterministic")
  }
}
