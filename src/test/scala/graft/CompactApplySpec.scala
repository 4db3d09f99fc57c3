package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** q_compact_apply's physical contract — everything the hour-count
  * oracle cannot see:
  *
  *  - THE FILE COUNT DROPS: the fragmented store has one data file per
  *    (day, hour) directory; the compacted store must hold strictly
  *    fewer data files, and no more than the plan's bin count.
  *  - THE REWRITE READS THE STORE: the rewrite plan scans the
  *    fragmented store (the catalog stand-in), never the source events
  *    parquet — a rewrite that re-derived from source would pass the
  *    oracle and defeat the point of compacting a live table.
  *  - CONTENT IS BIT-IDENTICAL: row multiset equality between the
  *    compacted store and the original events slice.
  */
class CompactApplySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def dataFiles(root: String): Seq[String] = {
    val s = Files.walk(Paths.get(root))
    try s.iterator().asScala.filter(p => p.toString.endsWith(".parquet")).map(_.toString).toSeq
    finally s.close()
  }

  test("compaction drops the physical file count, bounded by the plan's bins; rewrite reads the store") {
    val (fragPath, compPath, rewritePlan, served) =
      graft.queries.AnalyticsQueries.compactApplyServe(spark, sf)
    try {
      assert(!rewritePlan.contains("events.parquet"),
        s"rewrite re-derives from the source table:\n${rewritePlan.take(3000)}")
      // the frag frame is cached, so the plan shows either the store scan
      // or the cache built over it — both prove store-derived provenance
      assert(rewritePlan.contains("graft-compact-frag")
          || rewritePlan.contains("InMemoryTableScan")
          || rewritePlan.contains("TableCacheQueryStage"),
        s"rewrite does not read the fragmented store:\n${rewritePlan.take(3000)}")
      val fragFiles = dataFiles(fragPath).size
      val compFiles = dataFiles(compPath).size
      assert(compFiles < fragFiles,
        s"compaction did not reduce files: $fragFiles -> $compFiles")
      val nBins = served.select("day", "file_id").distinct().count()
      assert(compFiles <= nBins,
        s"more files ($compFiles) than planned bins ($nBins)")
    } finally Bench.cleanup(spark)
  }

  test("the compacted store holds exactly the original rows (lossless rewrite)") {
    val (_, compPath, _, _) =
      graft.queries.AnalyticsQueries.compactApplyServe(spark, sf)
    try {
      val cols = Seq("event_id", "user_id", "event_type", "value", "props")
      val orig = Tables(spark, sf).events
        .select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
      val comp = spark.read.parquet(compPath)
        .select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
      assert(comp === orig, "compacted content differs from the source rows")
      assert(orig.nonEmpty)
    } finally Bench.cleanup(spark)
  }
}
