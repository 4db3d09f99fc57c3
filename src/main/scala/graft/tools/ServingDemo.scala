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
  *      (q_hybrid_retrieval — BM25 ∪ ANN under integer RRF),
  *   6. the MAINTAINED hybrid under continuous arrival (round 13): both
  *      arms' stores built from the base slice, micro-batches appended
  *      through the idempotent streaming sinks (StreamingIvf /
  *      StreamingBm25 — one append deliberately REDELIVERED to show the
  *      per-batch dynamic-partition-overwrite no-op), fused serving off
  *      the live-maintained stores,
  *   7. takedowns (round 17): tombstones streamed into stage 6's live
  *      store (one delete batch REDELIVERED — same no-op device),
  *      compaction-applied physical drops, serving over the survivor
  *      epoch, then the hybrid fused over BOTH delete-compacted epochs
  *      (q_hybrid_delete's pipeline).
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

    println("== 6) maintained hybrid under continuous arrival (idempotent appends)")
    val (ivf6, v6) = locally {
      import org.apache.spark.sql.functions._
      val docs = graft.Tables(spark, sfDir).documents.select(col("doc_id"), col("text"))
      val v = graft.Tables(spark, sfDir).embeddings
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("e"))
        .withColumn("nrm",
          sqrt(aggregate(transform(col("e"), x => x * x), lit(0.0), (a, x) => a + x)))
      val ivf = graft.streaming.StreamingIvf.buildIndex(spark,
        v.filter(col("vec_id") % 4 =!= 3).select(col("vec_id"), col("e")))
      val lex = graft.streaming.StreamingBm25.buildIndex(spark,
        docs.filter(col("doc_id") % 4 =!= 3))
      Seq(3L, 7L, 11L).zipWithIndex.foreach { case (r, b) =>
        graft.streaming.StreamingIvf.appendBatch(ivf,
          v.filter(col("vec_id") % 12 === r).select(col("vec_id"), col("e")), b.toLong)
        graft.streaming.StreamingBm25.appendBatch(lex,
          docs.filter(col("doc_id") % 12 === r), b.toLong)
      }
      // at-least-once in action: redeliver batch 1 — a layout no-op
      graft.streaming.StreamingBm25.appendBatch(lex,
        docs.filter(col("doc_id") % 12 === 7), 1L)
      val fusedLex = SimilarityQueries.rankLex(
        graft.queries.TextQueries.bm25ServeStored(spark, lex))
      val fusedVec = SimilarityQueries.serveStoredIndex(spark, v, ivf.cents, ivf.path,
          queryPred = col("vec_id") === 0, topK = 10)
        .select(col("vec_id").as("doc_id"), col("rank").as("r_vec"))
      println("   fused top-10 off the live-maintained stores (redelivery absorbed):")
      SimilarityQueries.rrfFuse(fusedLex, fusedVec).show(10, truncate = false)
      (ivf, v)
    }
    graft.Bench.cleanup(spark)

    println("== 7) takedowns: streamed tombstones -> compaction-applied deletes -> survivor serving")
    locally {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      // the takedown list is a REQUEST PAYLOAD (bounded by definition),
      // not a corpus query — a driver-local frame, so the ingest plan
      // provably scans nothing
      val delIds = v6.filter(col("vec_id") % 10 === 7)
        .select(col("vec_id")).as[Long].collect().toSeq
      val dels = delIds.toDF("vec_id")
      val delPlan = graft.streaming.StreamingIvf.appendDeletes(ivf6, dels, 0L)
      // at-least-once in action again: redeliver the delete batch — the
      // same (batch_id) dynamic-partition-overwrite no-op as appends
      graft.streaming.StreamingIvf.appendDeletes(ivf6, dels, 0L)
      println(s"   tombstone ingest scanned parquet: ${delPlan.contains("Scan parquet")} (must be false)")
      val (epoch, _) = graft.streaming.StreamingIvf.compactWithDeletes(spark, ivf6)
      val survivingTomb = spark.read.parquet(epoch)
        .filter(col("vec_id") % 10 === 7).count()
      println(s"   compacted epoch: $epoch (tombstoned rows surviving: $survivingTomb — must be 0)")
      println("   probe-2 top-10 over the survivor epoch:")
      SimilarityQueries.serveStoredIndex(spark, v6, ivf6.cents, epoch,
          queryPred = col("vec_id") === 0, topK = 10)
        .show(10, truncate = false)
      println("   hybrid fused over BOTH delete-compacted epochs (q_hybrid_delete):")
      SparkEntry.queries("q_hybrid_delete")(spark, sfDir).show(10, truncate = false)
    }
    graft.Bench.cleanup(spark)

    spark.stop()
  }
}
