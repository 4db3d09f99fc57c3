package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway round-16 probe (deleted at round close): run queries once
  * at an SF and dump Bench.phaseTimes — local phase attribution without
  * a full bench run. Usage: runMain graft.tools.ProbeR16 <sfDir> <name...> */
object ProbeR16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    args.drop(1).foreach { n =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val tb = (System.nanoTime() - t0) / 1e9
      df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $n%s total=$dt%.2f body=$tb%.2f count=${dt - tb}%.2f")
      val plan = df.queryExecution.executedPlan.toString
      println("SCANS parquet=" + "Scan parquet".r.findAllIn(plan).length +
        " imts=" + "InMemoryTableScan".r.findAllIn(plan).length +
        " cos=" + "cosine".r.findAllIn(plan).length +
        " win=" + "Window".r.findAllIn(plan).length)
      graft.Bench.cleanup(spark)
    }
    import scala.jdk.CollectionConverters._
    graft.Bench.phaseTimes.asScala.toSeq.sortBy(_._1).foreach { case (k, ts) =>
      println(f"PHASE $k%s min=${ts.min}%.2f reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
