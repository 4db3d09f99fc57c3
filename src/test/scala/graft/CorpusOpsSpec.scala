package graft

import org.apache.spark.sql.functions._

import graft.queries.DedupQueries

/** Round-4 corpus operators: near-dup clustering (connected components),
  * deterministic shuffle ordering, data-derived corpus mixing, and token
  * entropy. Structural properties only — value parity is the DuckDB
  * oracle's job.
  */
class CorpusOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("dedup_cluster: labels are closed over the edge set and reps are unique minima") {
    val labels = run("q_dedup_cluster").cache()
    try {
      val pairs = DedupQueries.simhashPairs(spark, dir).select(col("doc_a"), col("doc_b"))
      // every near-dup pair must land in one cluster — the whole point of
      // the transitive-closure step
      val split = pairs
        .join(labels.select(col("doc_id").as("doc_a"), col("cluster_id").as("ca")), "doc_a")
        .join(labels.select(col("doc_id").as("doc_b"), col("cluster_id").as("cb")), "doc_b")
        .filter(col("ca") =!= col("cb"))
      assert(split.isEmpty, "some edge spans two clusters — propagation stopped early")

      // cluster_id is the member minimum, exactly one rep per cluster
      val badMin = labels.groupBy(col("cluster_id"))
        .agg(min(col("doc_id")).as("mn"), sum(when(col("is_rep"), 1).otherwise(0)).as("reps"))
        .filter(col("mn") =!= col("cluster_id") || col("reps") =!= 1)
      assert(badMin.isEmpty, "cluster_id != member min or rep count != 1")

      // csize agrees with the actual member count
      val badSize = labels.groupBy(col("cluster_id"), col("csize")).count()
        .filter(col("csize") =!= col("count"))
      assert(badSize.isEmpty, "csize column disagrees with member count")
    } finally { labels.unpersist(); () }
  }

  test("connected components: distributed label-propagation path agrees with union-find endgame") {
    val pairs = DedupQueries.simhashPairs(spark, dir)
      .select(col("doc_a"), col("doc_b")).cache()
    try {
      val local = DedupQueries.connectedComponents(spark, pairs) // endgame path
      val dist = DedupQueries.connectedComponents(spark, pairs, 0L) // forced loop path
      assert(local.exceptAll(dist).isEmpty && dist.exceptAll(local).isEmpty,
        "loop and union-find component labelings differ")
    } finally { pairs.unpersist(); () }
  }

  test("shuffle_order: 8 shards, contiguous 1..k positions, deterministic") {
    val a = run("q_shuffle_order").cache()
    try {
      assert(a.agg(min(col("shard")), max(col("shard"))).head.toSeq == Seq(0L, 7L))
      // positions per shard are exactly 1..k: max == count and all distinct
      val bad = a.groupBy(col("shard"))
        .agg(count(lit(1)).as("k"), max(col("pos")).as("mx"), countDistinct(col("pos")).as("nd"))
        .filter(col("mx") =!= col("k") || col("nd") =!= col("k"))
      assert(bad.isEmpty, "per-shard positions are not a contiguous 1..k ranking")
      // same inputs → same permutation (seeded hash, no RNG)
      val b = run("q_shuffle_order")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, "shuffle order not deterministic")
    } finally { a.unpersist(); () }
  }

  test("corpus_mix: every language keeps exactly least(n, 2*min_n) docs") {
    val docs = Tables(spark, dir).documents
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val minN = counts.agg(min(col("n"))).head.getLong(0)
    val expected = counts.select(col("lang"), least(col("n"), lit(2L * minN)).as("cap"))
    val kept = run("q_corpus_mix").groupBy(col("lang")).agg(count(lit(1)).as("kept"))
    val bad = kept.join(expected, "lang").filter(col("kept") =!= col("cap"))
    assert(bad.isEmpty, "kept count != least(n, 2*min_n) for some language")
  }

  test("quality_entropy: 0 <= ent <= ln(n_distinct), ent_norm <= 1") {
    val e = run("q_quality_entropy")
    val bad = e.filter(
      col("ent") < 0 || col("ent_norm") < 0 || col("ent_norm") > lit(1.0 + 1e-9) ||
        col("ent") > log(col("n_distinct").cast("double")) + lit(1e-9))
    assert(bad.isEmpty, "entropy outside [0, ln(n_distinct)] or ent_norm > 1")
    // a doc of all-distinct tokens has maximal normalized entropy
    val allDistinct = e.filter(col("n_distinct") === col("n_tokens") && col("n_tokens") > 1)
      .filter(col("ent_norm") < 0.999999)
    assert(allDistinct.isEmpty, "all-distinct doc with ent_norm < 1")
  }
}
