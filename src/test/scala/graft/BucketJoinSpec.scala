package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing as the co-located-join technique: two tables bucketed (and
  * sorted) on the join key by the SAME bucket count join with ZERO
  * exchanges — the 100-TB pattern for fact⋈fact joins that recur on one
  * key (pre-shuffle once at write time, then every downstream join of the
  * pair is shuffle-free). The spec proves both halves of the contract:
  * the plan has no Exchange under the join, and the result matches the
  * plain (shuffled) join bit-for-bit.
  */
class BucketJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("bucketed lineitem ⋈ orders on the order key joins with zero exchanges") {
    // explicit paths → external tables; the (static) warehouse dir is
    // never touched
    val wh = Files.createTempDirectory("graft-bucketed").toString
    val t = Tables(spark, sf)
    // both sides bucketed+sorted on the join key, same bucket count
    t.lineitem.select("l_orderkey", "l_extendedprice").write
      .mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    t.orders.select("o_orderkey", "o_orderstatus").write
      .mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_b").saveAsTable("ord_b")
    val bkey = "spark.sql.autoBroadcastJoinThreshold"
    val prevB = spark.conf.get(bkey)
    try {
      // at fixture scale the planner broadcasts orders; at 100-TB fact⋈fact
      // scale neither side broadcasts — pin THAT shape (tfidf-guard trick)
      spark.conf.set(bkey, "-1")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("rev"))
      val executed = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
      val plan = executed.toString
      // bucketing IS the exchange, paid once at write: the join itself
      // must not reshuffle either side (only the final tiny group-by
      // exchange remains)
      val exchanges = executed.collect { case s: ShuffleExchangeExec => s }
      assert(exchanges.size === 1, s"expected only the agg exchange, got ${exchanges.size}:\n${plan.take(3000)}")
      assert(plan.contains("SortMergeJoin"), plan.take(3000))
      assert(plan.contains("SelectedBucketsCount"), plan.take(3000))
      // structurally: NO shuffle anywhere below the join node itself —
      // both inputs must come straight off the co-bucketed scans
      val joinNodes = executed.collect {
        case j if j.nodeName.contains("SortMergeJoin") || j.nodeName.contains("ShuffledHashJoin") => j
      }
      assert(joinNodes.nonEmpty, plan.take(3000))
      joinNodes.foreach { j =>
        assert(j.collect { case s: ShuffleExchangeExec => s }.isEmpty,
          s"join input should be co-bucketed, not shuffled:\n${plan.take(3000)}")
      }

      // co-location must be semantically invisible: same result as the
      // plain shuffled join
      val expect = t.lineitem.select("l_orderkey", "l_extendedprice")
        .join(t.orders.select("o_orderkey", "o_orderstatus"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("rev"))
      assert(joined.collect().map(_.toString).sorted.toSeq ===
        expect.collect().map(_.toString).sorted.toSeq)
    } finally {
      spark.conf.set(bkey, prevB)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
