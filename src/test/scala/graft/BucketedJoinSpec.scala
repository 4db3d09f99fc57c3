package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the 100 TB answer to repeated
  * fact-to-fact joins: both sides bucketed on the join key at write time,
  * so the join plans with zero shuffle exchanges. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed lineitem ⋈ orders plans without a shuffle") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
      t.lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
      t.orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_b")

      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))

      assert(joined.count() > 0)
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // the join itself reads co-bucketed scans; the only allowed exchange
      // is the post-join aggregation shuffle
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.size <= 1, s"expected no join shuffle, got:\n$plan")
      val joinNodes = plan.collect {
        case j if j.nodeName.contains("SortMergeJoin") || j.nodeName.contains("ShuffledHashJoin") => j
      }
      assert(joinNodes.nonEmpty)
      // no shuffle below the join
      joinNodes.foreach { j =>
        assert(j.collect { case s: ShuffleExchangeExec => s }.isEmpty,
          "join input should be co-bucketed, not shuffled")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
