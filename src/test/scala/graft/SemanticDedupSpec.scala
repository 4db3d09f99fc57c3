package graft

import org.apache.spark.sql.functions._

import graft.queries.{DedupQueries, SimilarityQueries}

/** SemDeDup (q_dedup_semantic) contract: cluster-then-prune over the
  * IvfProvision cells. Pins what the oracle hash can't see by itself —
  * the exactly-one-keeper invariant, the measured cluster-boundary miss
  * (the method's documented tradeoff vs the LSH lane), and the paper's
  * keep-the-farthest-from-centroid rule. */
class SemanticDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val out =
    SparkEntry.queries("q_dedup_semantic")(spark, dir).cache()

  test("full corpus assignment; every multi group keeps exactly one member") {
    assert(out.count() === 1000L, "one row per corpus vector")
    val bad = out.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(when(col("keep"), 1L).otherwise(0L)).as("k"))
      .filter(col("n") > 1 && col("k") =!= 1L)
    assert(bad.isEmpty, "a dup group without exactly one keeper")
    // singletons are all kept
    val badSingle = out.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), min(when(col("keep"), 1L).otherwise(0L)).as("k"))
      .filter(col("n") === 1 && col("k") =!= 1L)
    assert(badSingle.isEmpty, "a singleton marked pruned")
  }

  test("cluster-boundary miss is exactly the cross-cell twins (474/500 at sf0.001)") {
    val twins = out.filter(col("vec_id") < 1000000L)
      .select(col("vec_id"), col("c_id").as("ca"), col("grp").as("ga"))
      .join(
        out.filter(col("vec_id") >= 1000000L)
          .select((col("vec_id") - 1000000L).as("vec_id"), col("c_id").as("cb"), col("grp").as("gb")),
        "vec_id")
      .cache()
    try {
      val coCell = twins.filter(col("ca") === col("cb"))
      // every co-celled twin pair is grouped (cos ≈ 0.995 ≫ 0.98); every
      // split pair is missed — the boundary miss is the ONLY miss mode
      assert(coCell.filter(col("ga") =!= col("gb")).isEmpty,
        "a co-celled twin pair not grouped")
      assert(twins.filter(col("ca") =!= col("cb") && col("ga") === col("gb")).isEmpty,
        "a cross-cell twin pair grouped (no edge can exist)")
      assert(coCell.count() === 474L,
        "measured sf0.001 boundary-miss count moved — re-pin SCALING.md")
    } finally { twins.unpersist(); () }
  }

  test("kept member is the farthest from its centroid (min ccos, tie min vec_id)") {
    val n = DedupQueries.embedCorpus(spark, dir)
    val cents = SimilarityQueries.IvfProvision
      .seeds(n.filter(col("vec_id") < 1000000L))
      .select(col("vec_id").as("c_id"), col("e").as("ce"))
    val ccos = SimilarityQueries.assignCells(n, cents, Seq.empty, keepCos = true)
      .select(col("vec_id"), col("ccos"))
    val ranked = out.join(ccos, "vec_id")
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("grp")).orderBy(col("ccos").asc, col("vec_id").asc)))
    assert(ranked.filter(col("keep") =!= (col("rk") === 1)).isEmpty,
      "keep flag diverges from the farthest-from-centroid rule")
  }
}
