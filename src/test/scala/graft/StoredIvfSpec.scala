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
}
