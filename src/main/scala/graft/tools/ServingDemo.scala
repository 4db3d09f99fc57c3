package graft.tools

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.{GraftSession, SparkEntry}
import graft.queries.{AnalyticsQueries, SimilarityQueries}

/** Drives the index-MAINTENANCE lanes end-to-end at the package boundary —
  * the serving-infrastructure lifecycle the declared queries exercise one
  * stage at a time:
  *
  *   1. stored-IVF build + incremental append + partition-pruned serving
  *      (q_similarity_ivf_incremental's pipeline),
  *   2. the index-health report that schedules the eventual retrain
  *      (q_ivf_balance),
  *   3. the retrain-and-rebuild APPLY the report schedules: trigger
  *      evaluation → (conditionally) train a new quantizer → rebuild as
  *      a new epoch → serve from it, old epoch untouched
  *      (q_ivf_retrain_apply's pipeline),
  *   4. small-file compaction of a fragmented day-store, with the
  *      before/after physical file counts (q_compact_apply's pipeline),
  *   5. hybrid lexical+vector serving over the stored index
  *      (q_hybrid_retrieval — BM25 ∪ ANN under integer RRF).
  *
  * Usage: `sbt "runMain graft.tools.ServingDemo [sfDir]"`
  */
object ServingDemo {

  private def dataFiles(root: String): Int = {
    val s = Files.walk(Paths.get(root))
    try s.iterator().asScala.count(p => p.toString.endsWith(".parquet"))
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local("graft-serving-demo")
    spark.sparkContext.setLogLevel("WARN")

    println(s"== 1) stored IVF: base build + incremental append + serve ($sfDir)")
    val (idxPath, ingestPlan, served) =
      SimilarityQueries.ivfIncrementalServe(spark, sfDir)
    println(s"   index: $idxPath (${dataFiles(idxPath)} cell files)")
    println(s"   ingest touched the stored index: ${ingestPlan.contains("graft-ivf-inc-index")} (must be false)")
    println("   probe-2 top-3 per query, served off the merged layout:")
    served.show(12, truncate = false)
    graft.Bench.cleanup(spark)

    println("== 2) index health / retrain trigger")
    SparkEntry.queries("q_ivf_balance")(spark, sfDir).show(30, truncate = false)
    graft.Bench.cleanup(spark)

    println("== 3) retrain-and-rebuild apply: trigger -> new epoch -> serve")
    val ctx = SimilarityQueries.ivfRetrainBuildV0(spark, sfDir)
    val retrainServed = SimilarityQueries.ivfRetrainFinish(spark, ctx).served
    val v1 = new java.io.File(s"${ctx.store}/v1")
    println(s"   store: ${ctx.store} (epoch-1 built: ${v1.isDirectory})")
    retrainServed.show(6, truncate = false)
    graft.Bench.cleanup(spark)

    println("== 4) compaction: fragmented day-store -> bin-packed files")
    val (fragPath, compPath, _, bins, compacted) =
      AnalyticsQueries.compactApplyServe(spark, sfDir)
    val nBins = bins.select("day", "file_id").distinct().count()
    println(s"   files: ${dataFiles(fragPath)} fragmented -> ${dataFiles(compPath)} compacted (planned bins: $nBins)")
    compacted.orderBy("day", "file_id", "hr").show(8)
    graft.Bench.cleanup(spark)

    println("== 5) hybrid retrieval: BM25 ∪ stored-IVF ANN under integer RRF")
    SparkEntry.queries("q_hybrid_retrieval")(spark, sfDir).show(10, truncate = false)
    graft.Bench.cleanup(spark)

    spark.stop()
  }
}
