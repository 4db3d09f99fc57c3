package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

import graft.{GraftSession, SparkEntry}

/** Writes `.explain("formatted")` for declared queries to files — the
  * optimization rounds' before/after plan evidence
  * (`plans/r<N>/<query>_<tag>.txt`):
  * `runMain graft.tools.PlanDump <outDir> <tag> <sfDir> <name...>`.
  * Eager-leaf lanes register their pre-force serve frame in AuditFrames
  * (the ExplainAudit convention) — that plan is the reviewable one, not
  * the bare checkpoint scan the declared frame leaves behind.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val sfDir = args(2)
    val names = args.drop(3).toSeq
    Files.createDirectories(outDir)
    val spark = GraftSession.local("graft-plandump")
    names.foreach { n =>
      graft.plans.AuditFrames.clear()
      val declared = SparkEntry.queries(n)(spark, sfDir)
      val qe = graft.plans.AuditFrames.get(n) match {
        case Some(pre) => pre.queryExecution
        case None      => declared.queryExecution
      }
      val plan = qe.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(outDir.resolve(s"${n}_$tag.txt"), plan)
      println(s"PLAN $n -> ${outDir.resolve(s"${n}_$tag.txt")}")
      graft.Bench.cleanup(spark)
    }
    spark.stop()
  }
}
