package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Throwaway round-16 probe (deleted at round close). */
object ProbeR16 {
  def flatten(p: SparkPlan, seen: java.util.IdentityHashMap[SparkPlan, Boolean]): Seq[SparkPlan] = {
    if (seen.containsKey(p)) return Nil
    seen.put(p, true)
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => Seq(m.relation.cachedPlan)
      case o => o.children
    }
    p +: kids.flatMap(flatten(_, seen))
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q_multimodal_dedup")(spark, "/root/testdata/sf0.001")
    val seen = new java.util.IdentityHashMap[SparkPlan, Boolean]()
    val all = flatten(df.queryExecution.executedPlan, seen)
    all.filter(p => p.nodeName.contains("Exchange") || p.nodeName.contains("Join"))
      .foreach(p => println("NODE: " + p.nodeName + " :: " + p.simpleStringWithNodeId().take(150)))
    spark.stop()
  }
}
