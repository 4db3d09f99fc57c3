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
      .config("spark.hadoop.fs.file.impl", classOf[graft.fs.NioLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => }
      import scala.jdk.CollectionConverters._
      // per-rep phase snapshots, Bench.runRep's capture discipline: the
      // printed phases come from the SAME rep that produced the min, so
      // local iteration previews exactly what the artifact will publish
      val times = (1 to reps).map { _ =>
        // cold-cache per rep with Bench's EXACT cleanup discipline
        // (clearCache + unpersist every persistent RDD + System.gc):
        // clearCache alone leaves localCheckpoint blocks accumulating
        // across reps, and the storage-pool pressure lands as roving
        // multi-second GC spikes in later reps — the same pathology
        // Bench.cleanup documents, measured here as a 23/43/23 s rep
        // profile on a lane Bench times at 8.7 s.
        graft.Bench.cleanup(spark)
        graft.Bench.phaseTimes.clear()
        val t0 = System.nanoTime()
        val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        val phs = graft.Bench.phaseTimes.asScala.collect {
          case (k, ts) if k.startsWith(n + ".") => k -> ts.sum
        }.toMap
        (dt, rows, phs)
      }
      val minRep = times.minBy(_._1)
      println(f"TIME $n rows=${times.head._2} " +
        times.map(t => f"${t._1}%.2f").mkString(" ") +
        f" min=${minRep._1}%.2f")
      val phs = minRep._3
      phs.toSeq.sortBy(_._1).foreach { case (ph, t) =>
        val umbrella =
          if (phs.keys.exists(o => o != ph && o.startsWith(ph + "."))) " (umbrella)" else ""
        println(f"PHASE $ph%s ${t}%.2f$umbrella (min rep)")
      }
      val leafSum = phs.collect {
        case (k, v) if !phs.keys.exists(o => o != k && o.startsWith(k + ".")) => v
      }.sum
      if (phs.nonEmpty)
        println(f"ATTRIB $n ${100 * leafSum / minRep._1}%.1f%% (leaf sum ${leafSum}%.2f of ${minRep._1}%.2f)")
      graft.Bench.phaseTimes.clear()
    }
    spark.stop()
  }
}
