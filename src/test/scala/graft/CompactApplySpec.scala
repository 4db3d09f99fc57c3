package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** q_compact_apply's physical contract — everything the hour-count
  * oracle cannot see:
  *
  *  - THE STORE IS THE INPUT: the frag frame's plan (captured before the
  *    cache hides its scan) reads the fragmented store, never the source
  *    events parquet — a rewrite that re-derived from source would pass
  *    the oracle and defeat the point of compacting a live table.
  *  - THE FILE COUNT DROPS: the fragmented store has one data file per
  *    (day, hour) directory; the compacted store must hold strictly
  *    fewer data files, and no more than the PLANNED bin count (counted
  *    on the bins frame itself, independent of the output under test).
  *  - CONTENT IS BIT-IDENTICAL: row multiset equality between the
  *    compacted store and the original events slice.
  *
  * One shared pipeline run serves all tests — the fixture workload
  * (hundreds of physical file creates) is the most expensive in the
  * suite and must not be paid per assertion group.
  */
class CompactApplySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val run = graft.queries.AnalyticsQueries.compactApplyServe(spark, sf)

  private def dataFiles(root: String): Seq[String] = {
    val s = Files.walk(Paths.get(root))
    try s.iterator().asScala.filter(p => p.toString.endsWith(".parquet")).map(_.toString).toSeq
    finally s.close()
  }

  test("compaction drops the physical file count, bounded by the PLANNED bins; store is the input") {
    val (fragPath, compPath, fragPlan, bins, served) = run
    assert(fragPlan.contains("graft-compact-frag"),
      s"frag frame does not scan the fragmented store:\n${fragPlan.take(3000)}")
    assert(!fragPlan.contains("events.parquet"),
      s"frag frame re-derives from the source table:\n${fragPlan.take(3000)}")
    val fragFiles = dataFiles(fragPath).size
    val compFiles = dataFiles(compPath).size
    assert(compFiles < fragFiles,
      s"compaction did not reduce files: $fragFiles -> $compFiles")
    // bound vs the PLAN, not vs the output (a rewrite that dropped a bin
    // would shrink an output-derived bound in lockstep)
    val nBins = bins.select("day", "file_id").distinct().count()
    assert(compFiles <= nBins,
      s"more files ($compFiles) than planned bins ($nBins)")
    assert(served.collect().nonEmpty)
  }

  test("the compacted store holds exactly the original rows (lossless rewrite)") {
    val (_, compPath, _, _, _) = run
    val cols = Seq("event_id", "user_id", "event_type", "value", "props")
    val orig = Tables(spark, sf).events
      .select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
    val comp = spark.read.parquet(compPath)
      .select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
    assert(comp === orig, "compacted content differs from the source rows")
    assert(orig.nonEmpty)
    Bench.cleanup(spark)
  }
}
