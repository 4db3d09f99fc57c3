package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-time profile of a declared query: at bench SF the tables
  * are small, so lane time hides in the NUMBER of Spark jobs/stages/tasks
  * a body launches (writes, checkpoints, collects, audits), not in data
  * volume. Localizes which action inside a lane burns the wall clock.
  *
  * `runMain graft.tools.JobProfile <sfDir> <name...>` — one warm-up rep at
  * sf0.001, then one profiled rep at sfDir; prints per-job wall /
  * stage+task counts / description, plus the lane total and the gap
  * between the lane wall and the sum of job walls (pure driver time).
  */
object JobProfile {
  private final case class Job(id: Int, desc: String, submitted: Long,
                               var finished: Long = 0L,
                               var stages: Int = 0, var tasks: Int = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.fs.NioLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new ConcurrentLinkedQueue[Job]()
    val live = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    // per-stage executor metrics: (stageId, wall ms, runTime ms, cpuTime
    // ms, gc ms, task count) — splits a slow job into compute vs GC vs
    // scheduling without the UI
    val stageMetrics = new ConcurrentLinkedQueue[(Int, Long, Long, Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val tm = si.taskMetrics
        // Record only stages carrying both timestamps (round-20 advice:
        // a missing one yielded a bogus huge/negative wall that passed
        // the >=100ms print filter).
        if (tm != null && si.submissionTime.isDefined && si.completionTime.isDefined)
          stageMetrics.add((si.stageId,
            si.completionTime.get - si.submissionTime.get,
            tm.executorRunTime, tm.executorCpuTime / 1000000L,
            tm.jvmGCTime, si.numTasks))
      }
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        val j = Job(e.jobId, d, e.time)
        j.stages = e.stageInfos.size
        j.tasks = e.stageInfos.map(_.numTasks).sum
        live.put(e.jobId, j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = live.remove(e.jobId)
        if (j != null) { j.finished = e.time; jobs.add(j) }
      }
    })

    // Warm-up dir: env-overridable, defaulting to the sf0.001 sibling of
    // sfDir so the tool works on any host/layout (round-20 advice: the
    // hardcoded /root/testdata path silently mis-warmed elsewhere). Fail
    // loudly when neither resolves.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001").getPath)
    require(new java.io.File(warmDir).isDirectory,
      s"JobProfile warm-up dir not found: $warmDir (set SPARK_GRAFT_WARM_DIR)")
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, warmDir).count()
      catch { case e: Throwable => System.err.println(s"warm $n: $e") }
      graft.Bench.cleanup(spark)
      jobs.clear(); live.clear(); stageMetrics.clear()
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_.id)
      val jobSum = js.map(j => (j.finished - j.submitted) / 1e3).sum
      println(f"PROFILE $n rows=$rows wall=$wall%.2f jobs=${js.size} " +
        f"jobwall=$jobSum%.2f driverGap=${wall - jobSum}%.2f " +
        f"stages=${js.map(_.stages).sum} tasks=${js.map(_.tasks).sum}")
      js.foreach { j =>
        val dt = (j.finished - j.submitted) / 1e3
        if (dt >= 0.02)
          println(f"  JOB ${j.id}%4d ${dt}%6.2fs stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(110)}")
      }
      stageMetrics.asScala.toSeq.sortBy(_._1).foreach {
        case (sid, wall, run, cpu, gc, nt) =>
          if (wall >= 100)
            println(f"  STAGE $sid%4d wall=${wall / 1e3}%6.2fs run=${run / 1e3}%7.2fs cpu=${cpu / 1e3}%7.2fs gc=${gc / 1e3}%5.2fs tasks=$nt%4d")
      }
      graft.Bench.cleanup(spark)
    }
    spark.stop()
  }
}
