package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Runtime filtering — the two Spark mechanisms that shrink a 100 TB
  * fact scan using information only available at RUN time, complementing
  * the static layout specs (PartitionPruningSpec: directory pruning on a
  * literal; BucketJoinSpec: join-key layout):
  *
  *  - dynamic partition pruning: a selective filter on the DIM side of a
  *    join prunes fact PARTITIONS via a runtime subquery, so the fact
  *    scan lists only the directories the joined keys can live in;
  *  - runtime bloom-filter join pruning: the same idea below directory
  *    granularity — a bloom filter built from the dim side's join keys
  *    is pushed into the fact scan as a row-level semi-join filter.
  *
  * Both are correctness-invisible (they only skip rows the join would
  * drop), which the tests pin alongside the plan shape.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("dynamic partition pruning: dim filter prunes fact partitions through the join") {
    val dir = Files.createTempDirectory("graft-dpp").toString
    val t = Tables(spark, "/root/testdata/sf0.01")
    // orders partitioned by year = the fact; a filtered 1-year dim drives
    // the runtime pruning
    t.orders.withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(s"$dir/orders_p")
    val fact = spark.read.parquet(s"$dir/orders_p")
    // DPP requires a SELECTIVE FILTER over a scan on the dim side — a
    // year-dimension table where only one row survives the predicate
    spark.range(1992, 1999)
      .select(col("id").cast("int").as("o_year"),
        when(col("id") === 1995, "picked").otherwise("skip").as("tag"))
      .write.mode("overwrite").parquet(s"$dir/years")
    val dim = spark.read.parquet(s"$dir/years").filter(col("tag") === "picked")

    val joined = fact.join(dim, Seq("o_year"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning subquery in fact scan:\n${plan.take(3000)}")

    // pruning must be semantically invisible
    val expect = t.orders.filter(year(col("o_orderdate")) === 1995).count()
    assert(joined.count() === expect)
    assert(expect > 0)
  }

  test("runtime bloom filter from the dim side reaches the fact scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force the shuffle-join path the bloom filter targets
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val t = Tables(spark, "/root/testdata/sf0.01")
      // selective dim: a fraction of customers; fact: orders
      val dim = t.customer.filter(col("c_custkey") % 97 === 0)
        .select(col("c_custkey").as("o_custkey"))
      val joined = t.orders.join(dim, Seq("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
        s"no bloom-filter runtime pruning in plan:\n${plan.take(3000)}")

      // filter must be semantically invisible
      val expect = t.orders.filter(col("o_custkey") % 97 === 0).count()
      assert(joined.count() === expect)
      assert(expect > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
