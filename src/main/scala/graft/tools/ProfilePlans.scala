package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.parse.LogParse
import graft.routes.RouteEngine
import graft.project.MetricProject

/** Measures plan sizes / wall-times per pipeline stage to localize
  * expression-tree blowup. Not part of the engine API.
  */
object ProfilePlans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-profile")
    import spark.implicits._
    val taskCounts = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        taskCounts.add((sc.stageInfo.stageId, sc.stageInfo.numTasks))
    })

    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val lines = (1 to n).map { i =>
      s"""2017-08-15T18:39:07.000000+00:00 host-$i production--app-$i/arn[$i]: {"title":"t$i","value":$i,"d":"x","_kvmeta":{"team":"t","routes":[{"type":"alerts","series":"s$i","dimensions":["d","title"],"stat_type":"counter","value_field":"value","rule":"r"}]}}"""
    }
    // Parquet-backed input: a LocalRelation gets evaluated whole at
    // optimization time (ConvertToLocalRelation) and hides real plan costs.
    val tmp = java.nio.file.Files.createTempDirectory("graft-profile").toString
    lines.toDF("raw").write.mode("overwrite").parquet(s"$tmp/raw")
    val raw = spark.read.parquet(s"$tmp/raw").repartition(32)

    def stage(name: String, df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      val execT = (System.nanoTime() - t0) / 1e9
      val planLen = df.queryExecution.executedPlan.toString.length
      val optLen = df.queryExecution.optimizedPlan.toString.length
      Thread.sleep(300)
      val stages = {
        val sb = new StringBuilder
        while (!taskCounts.isEmpty) { val (s, t) = taskCounts.poll(); sb.append(s"$s:$t ") }
        sb.toString.trim
      }
      println(f"[profile] $name%-16s rows=$n%6d  time=$execT%7.2fs  optPlanChars=$optLen%9d  execPlanChars=$planLen%9d  stageTasks=$stages")
    }

    val parsed = LogParse.parse(raw, "test-env")
    val routed = RouteEngine.withRoutes(parsed)
    val out = MetricProject.project(routed)

    // count() prunes unused columns, so force evaluation explicitly
    stage("rawlog", parsed.agg(sum(length(col("rawlog")))))
    stage("envelope", parsed.agg(sum(length(col("hostname")) + length(col("programname")))))
    stage("payload", parsed.agg(sum(size(col("payload")))))
    stage("fields", parsed.agg(sum(size(col("fields")))))
    stage("kvmeta", parsed.agg(sum(size(col("kvmeta.routes")))))
    stage("routes", routed.agg(sum(size(col("routes")))))
    stage("record_err", out.deadLetter.select(col("record_err")))
    stage("dd", out.dd)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/ddplan.txt"),
      out.dd.queryExecution.optimizedPlan.toString
    )
    spark.stop()
  }
}
