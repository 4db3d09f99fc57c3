package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures individual declared queries: `runMain graft.tools.TimeQuery
  * <sfDir> <reps> <name...>` — one warm-up pass at sf0.001, then `reps`
  * timed runs each (min is the comparable number; singles are load-noisy,
  * see docs: compare ratios, not absolutes). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => }
      // drop the warm-up's phase samples so the per-phase mins below
      // aggregate ONLY the timed reps at sfDir
      graft.Bench.phaseTimes.clear()
      val times = (1 to reps).map { _ =>
        // cold-cache per rep: a query that persist()s must not carry its
        // cache into the next rep (Bench runs each query exactly once)
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9 -> rows
      }
      println(f"TIME $n rows=${times.head._2} " +
        times.map(t => f"${t._1}%.2f").mkString(" ") +
        f" min=${times.map(_._1).min}%.2f")
      import scala.jdk.CollectionConverters._
      graft.Bench.phaseTimes.asScala.toSeq.sortBy(_._1).foreach {
        case (ph, samples) =>
          println(f"PHASE $ph%s min=${samples.min}%.2f n=${samples.size}")
      }
      graft.Bench.phaseTimes.clear()
    }
    spark.stop()
  }
}
