package graft.tools

import org.apache.spark.sql.SparkSession

/** Regression-reproduction harness: replays Bench's exact rep discipline
  * (runRep + cleanup, interleaved full rounds) over an arbitrary query
  * subset so a rep-profile anomaly seen in the full 172-query artifact
  * can be bisected to the smallest co-running set that triggers it.
  * `runMain graft.tools.ReproBench <sfDir> <rounds> <name...>` — prints
  * every query's per-round times in Bench's rep order.
  */
object ReproBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rounds = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val hostCpus = Runtime.getRuntime.availableProcessors
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.fs.NioLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warm-up queries as Bench
    val warmDir = "/root/testdata/sf0.001"
    Seq("q_dim_project", "q_tag_batch", "q1_agg").foreach { n =>
      try graft.SparkEntry.queries(n)(spark, warmDir).count()
      catch { case _: Throwable => }
      graft.Bench.cleanup(spark)
    }
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    def jvmHealth(): String = {
      import java.lang.management.ManagementFactory
      import scala.jdk.CollectionConverters._
      val gc = ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(b => s"${b.getName.replace(' ', '_')}=${b.getCollectionCount}/${b.getCollectionTime}ms").mkString(",")
      val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(p => p.getName.contains("CodeHeap") || p.getName.contains("Metaspace") || p.getName.contains("Old"))
        .map(p => s"${p.getName.replace(' ', '_')}=${p.getUsage.getUsed / 1048576}MB").mkString(",")
      val ct = ManagementFactory.getCompilationMXBean.getTotalCompilationTime
      s"gc[$gc] pools[$pools] jit=${ct}ms"
    }
    (1 to rounds).foreach { r =>
      names.foreach { n =>
        val h0 = if (n == names.last) jvmHealth() else ""
        val (t, _, _) = graft.Bench.runRep(spark, n, sfDir, hostCpus)
        times(n) = times.getOrElse(n, Nil) :+ t
        System.err.println(f"REPRO round=$r $n $t%.2f")
        if (n == names.last)
          System.err.println(s"HEALTH pre  round=$r $h0\nHEALTH post round=$r ${jvmHealth()}")
      }
    }
    names.foreach { n =>
      println(f"REPRO $n " + times(n).map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
