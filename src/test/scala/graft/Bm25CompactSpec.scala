package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** The lexical index-store compaction contract (the third family's
  * stored/incremental/compact symmetry):
  *
  *  1. LAYOUT-ONLY: serving over the compacted epoch equals serving
  *     over the fragmented store bit-for-bit.
  *  2. FEWER FILES: postings collapse below the fragmented count; the
  *     totals partials fold to exactly ONE row with the same sums.
  *  3. READS ONLY THE STORE: the rewrite plans never scan documents.
  *  4. LAYOUT UPGRADE: the epoch's postings are bucketed by token and
  *     the fixed 3-term serving filter prunes buckets
  *     (SelectedBucketsCount in the scan).
  */
class Bm25CompactSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("compaction: fewer files, one folded totals row, store-only rewrite, served bit-equal, bucket pruning") {
    graft.plans.AuditFrames.clear()
    val (store, epoch, rewritePlan, servedFrag, servedEpoch) =
      TextQueries.bm25CompactServe(spark, dir)
    def parquetFiles(p: String) = new java.io.File(p).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    // base + 3 appends fragmented the postings; the epoch has at most
    // one file per token bucket
    assert(parquetFiles(s"$store/postings").length >
      parquetFiles(s"$epoch/postings").length,
      s"frag=${parquetFiles(s"$store/postings").length} " +
        s"epoch=${parquetFiles(s"$epoch/postings").length}")
    assert(parquetFiles(s"$epoch/postings").length <= 8)
    // totals: 4 partial rows folded into one, sums preserved exactly
    val fragT = spark.read.parquet(s"$store/totals")
      .agg(sum(col("n_docs")), sum(col("sum_dl"))).head()
    val epochT = spark.read.parquet(s"$epoch/totals").collect()
    assert(epochT.length === 1, s"totals must fold to ONE row, got ${epochT.length}")
    assert(spark.read.parquet(s"$store/totals").count() === 4)
    assert(epochT.head.getLong(0) === fragT.getLong(0) &&
      epochT.head.getLong(1) === fragT.getLong(1))
    // postings row multiset identity across layouts
    val fp = spark.read.parquet(s"$store/postings")
      .collect().map(_.toString).sorted.toSeq
    val ep = spark.read.parquet(s"$epoch/postings")
      .collect().map(_.toString).sorted.toSeq
    assert(fp === ep)
    assert(fp.nonEmpty)
    // the rewrite reads only the store
    assert(!rewritePlan.contains("documents"),
      s"compaction must not rescan the corpus:\n${rewritePlan.take(2000)}")
    // serving bit-equality across layouts
    assert(servedFrag.collect().map(_.toString).sorted.toSeq ===
      servedEpoch.collect().map(_.toString).sorted.toSeq)
    // the epoch's term scan prunes buckets — the serve is checkpointed
    // (round-20 attribution sweep), so the pin reads the registered
    // pre-force frame
    val plan = graft.plans.AuditFrames.get("q_bm25_compact")
      .getOrElse(servedEpoch).queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount"),
      s"epoch serving must bucket-prune the term scan:\n${plan.take(3000)}")
    Bench.cleanup(spark)
  }
}
