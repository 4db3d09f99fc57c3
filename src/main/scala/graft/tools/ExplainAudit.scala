package graft.tools

import graft.{GraftSession, SparkEntry}

/** Prints formatted physical plans for the plan-shape-critical queries so
  * regressions in pushdown/broadcast/codegen are visible:
  * `sbt "runMain graft.tools.ExplainAudit [names...]"` */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-explain")
    val dir = "/root/testdata/sf0.01"
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_scan", "q1_agg", "q_join_broadcast", "q_join_shuffle", "q_topk", "q_window_rank")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
