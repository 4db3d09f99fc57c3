package graft

import org.apache.spark.sql.functions._

import graft.queries.DedupQueries

/** Scale evidence for the banded q_dedup_embed: the LSH candidate filter
  * must (a) prune the pair space well below the per-label quadratic scan it
  * replaced and (b) lose none of the cos ≥ 0.98 output — verified against
  * an unblocked full label-pair scan on the same corpus. */
class DedupBlockingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("embed LSH candidates ≪ label pairs; blocked output equals the unblocked scan") {
    val n = DedupQueries.embedCorpus(spark, dir).cache()
    try {
      val labelPairs = n.groupBy(col("label")).count()
        .agg(sum(col("count") * (col("count") - 1) / 2)).collect().head.getAs[Any](0).toString.toDouble
      val cands = DedupQueries.embedCandidates(n).cache()
      val nCands = cands.count().toDouble
      assert(nCands < 0.3 * labelPairs,
        s"LSH pruned too little: $nCands candidates vs $labelPairs label pairs")

      // unblocked reference: full label-pair exact cosine
      val a = n.select(col("vec_id").as("vec_a"), col("label"), col("e").as("ea"))
      val b = n.select(col("vec_id").as("vec_b"), col("label").as("label2"), col("e").as("eb"))
      val full = a.join(b, col("label") === col("label2") && col("vec_a") < col("vec_b"))
        .withColumn("cos", graft.functions.VectorExpressions.cosineSimilarity(col("ea"), col("eb")))
        .filter(col("cos") >= 0.98)
        .select(col("vec_a"), col("vec_b"))
      val blocked = cands
        .join(a.select(col("vec_a"), col("ea")), "vec_a")
        .join(b.select(col("vec_b"), col("eb")), "vec_b")
        .withColumn("cos", graft.functions.VectorExpressions.cosineSimilarity(col("ea"), col("eb")))
        .filter(col("cos") >= 0.98)
        .select(col("vec_a"), col("vec_b"))
      assert(full.exceptAll(blocked).isEmpty && blocked.exceptAll(full).isEmpty,
        "blocked result diverges from the unblocked scan")
    } finally { n.unpersist(); () }
  }
}
