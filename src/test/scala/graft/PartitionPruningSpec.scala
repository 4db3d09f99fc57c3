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
}
