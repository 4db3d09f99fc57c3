package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** The incremental lexical-index contract — IvfIncrementalSpec's three
  * guarantees at the BM25 lane:
  *
  *  - INGEST IS O(batch): the append plans read the batch slice of the
  *    corpus only — never the stored postings/doc-stats/totals (a
  *    rebuild-in-disguise would pass the oracle and fail here).
  *  - THE MERGE IS EXACT: serving over the merged artifacts equals the
  *    one-shot q_bm25 top-10 row-for-row (score doubles included — the
  *    integer df/tf/dl/N merge is exact and avgdl divides the same
  *    integers through the shared bm25Score tail).
  *  - SERVING IS PUSHED DOWN: the term filter reaches the postings
  *    parquet scan as PushedFilters, so a query reads posting bytes for
  *    its terms, not the whole index.
  */
class Bm25IncrementalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("ingest is O(batch); merged serving == one-shot q_bm25; term pushdown") {
    val (store, ingestPlan, served) =
      TextQueries.bm25IncrementalServe(spark, sf)
    assert(!ingestPlan.contains("graft-bm25-index"),
      s"an ingest plan reads the stored index (rebuild in disguise):\n${ingestPlan.take(3000)}")

    val got = served.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val oneShot = SparkEntry.queries("q_bm25")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === oneShot, "merged-artifact serving diverged from the one-shot scorer")
    assert(got.nonEmpty)

    // the lane's served frame is a forced leaf (round-18 attribution
    // sweep), so the pushdown contract is asserted on a fresh serving
    // frame over the SAME store — the identical reader text the lane ran
    val plan = TextQueries.bm25ServeStored(spark, store)
      .queryExecution.executedPlan.toString
    val postingScans = plan.linesIterator
      .filter(l => l.contains(s"graft-bm25-index") && l.contains("postings"))
      .mkString("\n")
    assert(postingScans.nonEmpty, s"postings scan not found:\n${plan.take(3000)}")
    assert(postingScans.contains("PushedFilters: [") &&
      postingScans.contains("In(token"),
      s"term filter not pushed to the postings scan:\n$postingScans")

    // artifact shape: postings hold exactly the full corpus's (doc, token)
    // pairs, totals partials fold to the corpus size
    val n = Tables(spark, sf).documents.count()
    val totals = spark.read.parquet(s"$store/totals")
      .agg(sum(col("n_docs"))).collect().head.getLong(0)
    assert(totals === n, "totals partials must fold to the corpus doc count")
    val statDocs = spark.read.parquet(s"$store/docstats").count()
    assert(statDocs === n, "doc-stats must hold every doc exactly once")
    Bench.cleanup(spark)
  }
}
