package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Partition pruning as the write-side layout technique: a corpus
  * partitioned by a coarse time column is filtered at the DIRECTORY
  * level — the scan's PartitionFilters carry the predicate and
  * non-matching partitions are never listed, the difference between
  * reading one year and reading 100 TB. Complements BucketJoinSpec
  * (join-key layout) with the time-slice layout every log/corpus table
  * wants at scale.
  */
class PartitionPruningSpec extends SparkSpec {

  test("year-partitioned orders prune non-matching partitions at the scan") {
    val dir = Files.createTempDirectory("graft-parts").toString
    val t = Tables(spark, "/root/testdata/sf0.01")
    t.orders.withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(s"$dir/orders_p")

    val pruned = spark.read.parquet(s"$dir/orders_p")
      .filter(col("o_year") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (directory pruning),
    // not ride along as a data filter evaluated per row
    assert("PartitionFilters: \\[[^\\]]*o_year[^\\]]* = 1995"
      .r.findFirstIn(plan).isDefined, plan.take(3000))

    // pruning must be semantically invisible: same rows as filtering the
    // unpartitioned table
    val expect = t.orders.filter(year(col("o_orderdate")) === 1995).count()
    assert(pruned.count() === expect)
    assert(expect > 0)
  }

  // Row-group granularity: the data-skipping claim q_zorder_key's scale
  // notes rest on, proven end-to-end. The z-ordered layout
  // (repartitionByRange(zkey) + sortWithinPartitions) must let parquet
  // min/max stats skip row groups for a predicate on BOTH interleaved
  // dimensions; the same data written in hash order has every group's
  // min/max spanning the full domain, so nothing skips. The scan metric
  // (rows surviving row-group/page skipping, BEFORE the post-scan
  // filter — the vectorized reader does no record-level filtering) is
  // the observable.
  test("z-ordered layout skips parquet row groups on BOTH dimensions; hash order reads everything") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

    val dir = Files.createTempDirectory("graft-zorder").toString
    // same 10×5-bit interleave as q_zorder_key, spliced verbatim
    val zTerms = (0 until 10).map { i =>
      val xe = s"(((x >> $i) & 1) << ${2 * i})"
      if (i < 5) s"$xe + (((y >> $i) & 1) << ${2 * i + 1})" else xe
    }.mkString(" + ")
    val base = Tables(spark, "/root/testdata/sf0.01").events
      .select(
        (col("user_id") % 1024).as("x"),
        dayofmonth(timestamp_micros(expr("ts div 1000"))).cast("long").as("y"),
        col("value"))
      .withColumn("zkey", expr(zTerms))
    // z-ordered: range-partition by zkey, sort inside each file; small
    // parquet blocks so files carry several independently-skippable groups
    base.repartitionByRange(8, col("zkey")).sortWithinPartitions(col("zkey"))
      .write.option("parquet.block.size", 32 * 1024)
      .mode("overwrite").parquet(s"$dir/z")
    // baseline: identical rows, hash-shuffled order — no locality
    base.repartition(8)
      .write.option("parquet.block.size", 32 * 1024)
      .mode("overwrite").parquet(s"$dir/h")

    def rowsRead(df: DataFrame): Long = {
      df.collect()
      def finalPlan(p: SparkPlan): SparkPlan = p match {
        case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
        case other => other
      }
      finalPlan(df.queryExecution.executedPlan)
        .collectLeaves()
        .collect { case f: FileSourceScanExec => f.metrics("numOutputRows").value }
        .sum
    }

    // a small rectangle in BOTH dimensions — the multi-dim case directory
    // partitioning and single-column sorting each fail at
    val pred = col("x").between(96, 127) && col("y").between(4, 7)
    val zDf = spark.read.parquet(s"$dir/z").filter(pred)
    val hDf = spark.read.parquet(s"$dir/h").filter(pred)

    // both dims' bounds must reach the reader as pushed filters (read the
    // scan node's metadata directly — the plan STRING truncates the list)
    val pushed = zDf.queryExecution.executedPlan
      .collectLeaves()
      .collect { case f: FileSourceScanExec => f.metadata("PushedFilters") }
      .mkString(";")
    assert(pushed.contains("GreaterThanOrEqual(x,96)"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(y,4)"), pushed)
    assert(pushed.contains("LessThanOrEqual(y,7)"), pushed)

    // semantically invisible layout change
    val zCount = zDf.count()
    assert(zCount === hDf.count())
    assert(zCount > 0)

    val zRows = rowsRead(zDf)
    val hRows = rowsRead(hDf)
    val total = base.count()
    info(s"rows read: z-order $zRows / hash $hRows / table $total (matches: $zCount)")
    assert(hRows === total, s"hash layout should skip nothing: read $hRows of $total")
    assert(zRows <= total / 2,
      s"z-order layout skipped too little: read $zRows of $total rows (hash layout: $hRows)")
  }
}
