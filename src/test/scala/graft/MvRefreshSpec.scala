package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

/** q_mv_refresh's at-scale contract, pinned at the FILE level: an
  * incremental refresh must rewrite only the lateness-horizon partitions
  * of the stored MV — the history directories keep the exact files the
  * base build wrote. Parquet part-file names carry their write-job's UUID,
  * so "which write produced this partition" is directly observable: the
  * base build and the refresh are two jobs, hence exactly two UUID groups,
  * and the refresh group must cover exactly the horizon days.
  */
class MvRefreshSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def dayAndValue = Tables(spark, dir).events.select(
    col("event_type"),
    date_format(date_trunc("day", timestamp_micros(expr("ts div 1000"))),
      "yyyy-MM-dd").as("day"),
    col("value"),
    (col("event_id") % 13 === 0).as("late"))

  test("refresh rewrites only horizon partitions and equals the full recompute") {
    // same scratch-dir lifecycle as the production query: JVM-unique
    // path + shutdown-hook backstop for abnormal exits
    val root = graft.plans.ScratchDirs.unique("graft-mv-spec")
    val path = new File(root, "mv").getAbsolutePath
    try {
      val served = graft.queries.RelationalQueries.mvRefresh(spark, dir, path)
      val got = served.collect()

      // --- full-recompute parity under the same lateness contract ------
      val ev = dayAndValue
      val maxd = ev.agg(max(col("day"))).head.getString(0)
      val horizon = java.time.LocalDate.parse(maxd).minusDays(7).toString
      val full = ev
        .filter(!col("late") || col("day") >= lit(horizon))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
        .collect()
      def keyed(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(keyed(got) === keyed(full))
      assert(got.nonEmpty)

      // --- file-level partition hygiene --------------------------------
      // every day dir → the set of write-job UUIDs of its part files
      val dayDirs = new File(path).listFiles().filter(_.getName.startsWith("day="))
      assert(dayDirs.length > 10, "fixture should span many day partitions")
      val uuidRe = "part-\\d+-([0-9a-f-]{36})".r
      val byDay: Map[String, Set[String]] = dayDirs.map { d =>
        val uuids = d.listFiles().map(_.getName)
          .flatMap(n => uuidRe.findFirstMatchIn(n).map(_.group(1))).toSet
        d.getName.stripPrefix("day=") -> uuids
      }.toMap
      // no partition mixes writes, and there are exactly two writes total
      assert(byDay.values.forall(_.size == 1), s"mixed-write partition: $byDay")
      // small-files discipline: repartition-by-day before the partitioned
      // write means each day directory holds exactly ONE data file
      dayDirs.foreach { d =>
        val files = d.listFiles().count(_.getName.startsWith("part-"))
        assert(files == 1, s"${d.getName} holds $files part files, want 1")
      }
      val allUuids = byDay.values.flatten.toSet
      assert(allUuids.size == 2,
        s"expected exactly base-build + refresh UUIDs, got ${allUuids.size}")
      // the refresh wrote exactly the horizon days — history untouched
      val touched = ev.filter(col("late") && col("day") >= lit(horizon))
        .select(col("day")).distinct().collect().map(_.getString(0)).toSet
      assert(touched.nonEmpty && touched.size <= 8, s"horizon days: $touched")
      val refreshUuid = byDay(touched.head).head
      byDay.foreach { case (day, uuids) =>
        if (touched.contains(day))
          assert(uuids.head == refreshUuid, s"horizon day $day not refreshed")
        else
          assert(uuids.head != refreshUuid, s"history day $day was rewritten")
      }

      // --- read-side pruning: touched-day filter reaches the partitions
      val probe = spark.read.parquet(path)
        .filter(col("day").cast("string").isInCollection(touched.toSeq))
      probe.collect()
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [") &&
        !plan.replaceAll("\\s", "").contains("PartitionFilters:[]"),
        s"day filter did not become a partition filter:\n${plan.take(2000)}")
    } finally graft.plans.ScratchDirs.remove(root)
  }
}
