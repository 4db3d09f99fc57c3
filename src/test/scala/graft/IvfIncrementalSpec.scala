package graft

import org.apache.spark.sql.functions._

/** The incremental stored-IVF contract — the structure the SQL oracle
  * cannot see (it only proves the final results match a one-shot build):
  *
  *  - INGEST IS O(batch): the append job's physical plan reads the
  *    corpus parquet only — never the stored index. A rebuild-in-
  *    disguise (read index + union + rewrite) would pass the oracle and
  *    fail here.
  *  - THE LAYOUT IS EXACT: after the append, the index holds every
  *    corpus row exactly once — base plus batch, no dropped cell, no
  *    double-ingested row.
  *  - SERVING STAYS PRUNED: the merged layout is still read through
  *    probe-cell partition filters, i.e. the increments did not cost the
  *    stored lane its partition pruning.
  */
class IvfIncrementalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("ingest is O(batch): plan never touches the stored index; layout is exactly base+batch") {
    val (path, ingestPlan, served) =
      graft.queries.SimilarityQueries.ivfIncrementalServe(spark, sf)
    assert(!ingestPlan.contains("graft-ivf-inc-index"),
      s"ingest plan reads the stored index (rebuild in disguise):\n${ingestPlan.take(3000)}")
    // batch slice + centroid derivation are the only file reads
    val scans = "Scan parquet".r.findAllIn(ingestPlan).length
    assert(scans <= 2, s"ingest plan has $scans file scans:\n${ingestPlan.take(3000)}")

    val n = Tables(spark, sf).embeddings.count()
    val nBatch = Tables(spark, sf).embeddings
      .filter(col("vec_id") % 4 === 3).count()
    val idx = spark.read.parquet(path)
    assert(idx.count() === n, "index must hold every corpus row exactly once")
    assert(idx.filter(col("vec_id") % 4 === 3).count() === nBatch,
      "appended batch rows missing or double-ingested")
    assert(idx.select("vec_id").distinct().count() === n,
      "a vec_id landed in more than one cell")
    assert(served.collect().nonEmpty)
    Bench.cleanup(spark)
  }

  test("serving over the merged layout is partition-pruned to the probe cells") {
    val (_, _, served) =
      graft.queries.SimilarityQueries.ivfIncrementalServe(spark, sf)
    val plan = served.queryExecution.executedPlan.toString
    val indexScans = plan.linesIterator
      .filter(_.contains("graft-ivf-inc-index"))
      .mkString("\n")
    assert(indexScans.nonEmpty, s"index scan not found:\n${plan.take(3000)}")
    assert(indexScans.contains("PartitionFilters: [c_id"),
      s"no partition filter on the merged index scan:\n$indexScans")
    assert(indexScans.contains(" IN ("),
      s"probe cells not pushed as IN literals:\n$indexScans")
    Bench.cleanup(spark)
  }
}
