package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.optimizer.BuildLeft
import org.apache.spark.sql.execution.{ExplainMode, SparkPlan}

import graft.{GraftSession, SparkEntry}

/** Dumps formatted physical plans for the plan-shape-critical queries so
  * regressions in pushdown/broadcast/codegen are visible and reviewable:
  * `sbt "runMain graft.tools.ExplainAudit [outFile] [names...]"`
  *
  * Round 14: the audit also MACHINE-CHECKS the nested-loop-broadcast
  * contract. The codebase's position is that every
  * BroadcastNestedLoopJoin is a scalar/bounded stat join (a 1-row global
  * aggregate or a ≤K-row limit broadcast over the stream side) — prose
  * said so for 178 BNLJs across 96 plans; [[bnljViolations]] now proves
  * it per plan, and `main` exits nonzero if any build side lacks a
  * row-count-bounding node. */
object ExplainAudit {

  /** Does this physical subtree guarantee a bounded (plan-constant) row
    * count? True at a global aggregate (no grouping → exactly one row),
    * any limit operator, or a tiny literal table; bounded-ness passes
    * through row-count-non-increasing unary operators (project / filter /
    * sort / exchange / codegen glue) and combines across nested-loop /
    * cartesian children (bounded × bounded is bounded). GenerateExec
    * (explode) multiplies rows data-dependently, so it is NEVER treated
    * as pass-through. */
  private[graft] def isBounded(p: SparkPlan): Boolean = p match {
    case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
      a.groupingExpressions.isEmpty
    case _: org.apache.spark.sql.execution.GlobalLimitExec |
         _: org.apache.spark.sql.execution.CollectLimitExec |
         _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case l: org.apache.spark.sql.execution.LocalTableScanExec => l.rows.size <= 64
    case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
      isBounded(j.left) && isBounded(j.right)
    case j: org.apache.spark.sql.execution.joins.CartesianProductExec =>
      isBounded(j.left) && isBounded(j.right)
    case _: org.apache.spark.sql.execution.GenerateExec => false
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      isBounded(a.inputPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      isBounded(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      isBounded(r.child)
    // object-mapped / expanding unary operators can GROW rows
    // data-dependently — never pass-through (round-14 ADVICE: a typed
    // flatMap's MapPartitionsExec could slip the BNLJ build-side bound;
    // ExpandExec multiplies rows for cube/rollup; FlatMap* nodes are
    // flatMap/flatMapGroups by construction)
    case _: org.apache.spark.sql.execution.MapPartitionsExec => false
    case _: org.apache.spark.sql.execution.ExpandExec => false
    case u: org.apache.spark.sql.execution.UnaryExecNode
        if u.getClass.getSimpleName.startsWith("FlatMap") => false
    case u: org.apache.spark.sql.execution.UnaryExecNode => isBounded(u.child)
    case _ => false
  }

  /** AQE-aware traversal (TreeNode.collect stops at AdaptiveSparkPlanExec
    * and query-stage wrappers, whose logical children lists are empty). */
  private def walk(p: SparkPlan): Iterator[SparkPlan] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.inputPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case _ => p.children
    }
    Iterator(p) ++ kids.iterator.flatMap(walk)
  }

  /** One violation line per BroadcastNestedLoopJoin whose BUILD side is
    * not plan-guaranteed bounded. Empty = the plan honors the contract. */
  private[graft] def bnljViolations(plan: SparkPlan): Seq[String] =
    walk(plan).collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
        val build = if (j.buildSide == BuildLeft) j.left else j.right
        if (isBounded(build)) None
        else Some(s"BroadcastNestedLoopJoin build side unbounded:\n${build.toString.take(1500)}")
    }.flatten.toSeq
  private val defaultNames = Seq(
    "q_scan", "q1_agg", "q_join_broadcast", "q_join_shuffle", "q_join_asof",
    "q_topk", "q_window_rank", "q_dim_project", "q_dedup_simhash", "q_similarity_topk"
  )

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-explain")
    val dir = "/root/testdata/sf0.01"
    val (out, names) = args.toSeq match {
      case head +: rest if head.endsWith(".md") => (Some(head), if (rest.nonEmpty) rest else defaultNames)
      case Nil                                  => (None, defaultNames)
      case ns                                   => (None, ns)
    }
    val sb = new StringBuilder
    sb.append("# Physical plan audit\n\nGenerated by `graft.tools.ExplainAudit` at sf0.01.\n")
    sb.append("BNLJ build-side contract machine-checked per plan (bnljViolations).\n")
    val bnljFailures = scala.collection.mutable.Buffer[String]()
    names.foreach { n =>
      graft.plans.AuditFrames.clear()
      val declared = SparkEntry.queries(n)(spark, dir)
      // eager-leaf lanes (declared output forced to a localCheckpoint
      // inside their Bench.phase) register the UN-forced frame in
      // AuditFrames — audit that plan, not the bare ExistingRDD scan the
      // checkpoint leaves behind, so the serve plan stays reviewable and
      // the BNLJ contract is machine-checked over it
      val (qe, preForce) = graft.plans.AuditFrames.get(n) match {
        case Some(pre) => (pre.queryExecution, true)
        case None      => (declared.queryExecution, false)
      }
      val plan = qe.explainString(ExplainMode.fromString("formatted"))
      val viol = bnljViolations(qe.executedPlan)
      viol.foreach { v =>
        bnljFailures += s"$n: $v"
        System.err.println(s"BNLJ CONTRACT VIOLATION in $n:\n$v")
      }
      val tag = if (preForce) " (pre-force serve plan)" else ""
      sb.append(s"\n## $n$tag\n\n```\n$plan```\n")
      println(s"========== $n ==========")
      // some declared bodies persist internally, and the stored-index
      // lanes run their writes eagerly at build time BY DESIGN (the
      // returned plan embeds scans + partition-filter literals over the
      // artifacts they build — docs/SCALING.md "Why stored-lane query
      // bodies build eagerly") — release per query or the storage pool
      // fills across an 80-plan audit, the same pathology Bench.cleanup
      // documents
      graft.Bench.cleanup(spark)
    }
    out match {
      case Some(p) => Files.writeString(Paths.get(p), sb.toString)
      case None    => println(sb.toString)
    }
    spark.stop()
    if (bnljFailures.nonEmpty) {
      System.err.println(s"ExplainAudit: ${bnljFailures.size} BNLJ contract violations")
      sys.exit(1)
    }
  }
}
