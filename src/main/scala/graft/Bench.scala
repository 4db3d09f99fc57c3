package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query once at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line with per-query and total seconds. A small
  * untimed warm-up (JIT, codegen caches, parquet footers, fast-lane
  * classloading) runs first so the first timed query isn't charged for
  * JVM startup effects.
  */
object Bench {

  /** Inter-query cleanup (also asserted by DeclareGateSpec): queries
    * persist/localCheckpoint frames internally and a single JVM runs all
    * declared queries back to back; without this the storage pool fills
    * and a full-GC pause lands on whichever query happens to be running
    * (the round-4 roving 10-15 s spikes). Runs OUTSIDE the timed region.
    */
  def cleanup(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    System.gc()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up (not timed): smallest sf exercises the same code paths
    val warmDir = "/root/testdata/sf0.001"
    Seq("q_dim_project", "q_tag_batch", "q1_agg", "q_similarity_topk").foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).count()
      catch { case _: Throwable => }
    }

    // a failed query records -1 (not its fast wall time to the throw) and
    // is listed in "failed" — a regression must look broken, not quick.
    // Each query runs in TWO interleaved full rounds and records the MIN:
    // this host shows bursty hypervisor CPU steal (a rep can measure
    // 10-40× its true cost), and interleaving decorrelates the rounds so
    // one multi-second burst can't poison both reps of the same query
    // (back-to-back reps both landed inside a single burst). Cold-cache
    // per rep (cleanup between), so the min is a real uncached run.
    val reps = 2
    val names = SparkEntry.queries.keys.toSeq
    val timesByName = scala.collection.mutable.Map.empty[String, List[Double]]
    (1 to reps).foreach { _ =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        val ok =
          try { SparkEntry.queries(name)(spark, sfDir).count(); true }
          catch {
            case e: Throwable =>
              System.err.println(s"BENCH FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
              false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup(spark)
        timesByName(name) = (if (ok) dt else -1.0) :: timesByName.getOrElse(name, Nil)
      }
    }
    val results = names.map { name =>
      val ts = timesByName(name)
      name -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"reps":$reps,"agg":"min","sf":"$sfDir"}""")
    spark.stop()
  }
}
