package graft

import org.apache.spark.sql.functions._

/** The stored-IVF serving contract: the cell-partitioned index scan must
  * be partition-PRUNED to the probe cells (the whole point of paying the
  * partitioned write), and the served results must be bit-identical to
  * the in-memory q_similarity_ivf_probe2 — stored and in-memory serving
  * share one oracle, and this spec pins the equality directly.
  */
class StoredIvfSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("stored and in-memory nprobe=2 serving produce identical rows") {
    val mem = SparkEntry.queries("q_similarity_ivf_probe2")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val stored = SparkEntry.queries("q_similarity_ivf_stored")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(stored === mem)
    assert(stored.nonEmpty)
    Bench.cleanup(spark)
  }

  test("the index scan is partition-pruned to the probe cells") {
    val plan = SparkEntry.queries("q_similarity_ivf_stored")(spark, sf)
      .queryExecution.executedPlan.toString
    // the parquet scan of the STORED INDEX (only — the embeddings scans
    // are unpartitioned and legitimately carry no partition filters)
    // must carry the probe-cell literals as partition filters; an empty
    // list would mean the serving read opens every cell directory
    val indexScans = plan.linesIterator
      .filter(_.contains("graft-ivf-index"))
      .mkString("\n")
    assert(indexScans.nonEmpty, s"index scan not found:\n${plan.take(3000)}")
    assert(indexScans.contains("PartitionFilters: [c_id"),
      s"no partition filter on the index scan:\n$indexScans")
    assert(indexScans.contains(" IN ("),
      s"probe cells not pushed as IN literals:\n$indexScans")
    Bench.cleanup(spark)
  }

  test("filtered serving: metadata predicate reaches the pruned index scan") {
    val plan = SparkEntry.queries("q_similarity_ivf_filtered")(spark, sf)
      .queryExecution.executedPlan.toString
    val indexScans = plan.linesIterator
      .filter(_.contains("graft-ivf-filtered-index"))
      .mkString("\n")
    assert(indexScans.nonEmpty, s"filtered index scan not found:\n${plan.take(3000)}")
    // BOTH filter kinds on the ONE scan: probe cells as partition
    // filters AND the metadata predicate as a pushed parquet data
    // filter — the predicate is evaluated inside the probed cells,
    // upstream of the top-K window (post-filtering a top-K would let a
    // filtered-out neighbor occupy a rank)
    assert(indexScans.contains("PartitionFilters: [c_id"),
      s"no partition filter on the filtered index scan:\n$indexScans")
    assert(indexScans.contains("PushedFilters: [") &&
      indexScans.contains("EqualTo(label,3)"),
      s"label predicate not pushed into the index scan:\n$indexScans")
    Bench.cleanup(spark)
  }

  test("filtered serving: near-zero-selectivity predicate returns empty, not error") {
    // a predicate matching NO row of any probed cell (label 99 does not
    // exist) must serve an empty top-K — the rank window over an empty
    // candidate set, not a crash and not rows leaking past the filter
    val v = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("nrm", sqrt(aggregate(transform(col("e"), x => x * x),
        lit(0.0), (a, x) => a + x)))
    val cents = graft.queries.SimilarityQueries.IvfProvision.seeds(v)
      .select(col("vec_id").as("c_id"), col("e").as("ce"))
    val path = graft.plans.ScratchDirs.unique("graft-ivf-zero-sel").getAbsolutePath
    graft.queries.SimilarityQueries.assignCells(v, cents, Seq("label", "e", "nrm"))
      .write.mode("overwrite").partitionBy("c_id").parquet(path)
    val served = graft.queries.SimilarityQueries.serveStoredIndex(
      spark, v.drop("label"), cents, path, candPred = col("label") === 99)
    assert(served.count() === 0L)
    Bench.cleanup(spark)
  }

  test("filtered probe-2 recall vs brute-force filtered top-K is the measured 14/24") {
    // probe-2 under a filter is approximate: a true filtered neighbor
    // can live outside the probed cells. The honest number, measured at
    // sf0.001 and pinned: 14 of the 24 brute-force filtered top-3 rows
    // are recovered (recall 0.583; sf0.01 measures 13/24, sf0.1 19/24 —
    // recall RISES with corpus size as cells densify). The oracle pins
    // the exact probe-2 semantics; this pins the distance to exact.
    val served = SparkEntry.queries("q_similarity_ivf_filtered")(spark, sf)
      .select(col("q_id"), col("vec_id"))
    val v = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("nrm", sqrt(aggregate(transform(col("e"), x => x * x),
        lit(0.0), (a, x) => a + x)))
    val q = v.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
    val brute = v.filter(col("label") === 3)
      .crossJoin(q).filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        aggregate(org.apache.spark.sql.functions.zip_with(
          col("qe"), col("e"), (a, b) => a * b), lit(0.0), (acc, x) => acc + x)
          / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("vec_id"))
    val overlap = served.intersect(brute).count()
    assert(brute.count() === 24L)
    assert(served.count() === 24L)
    assert(overlap === 14L, s"measured filtered recall changed: $overlap/24")
    Bench.cleanup(spark)
  }
}
