package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.TextQueries

/** Streaming BM25 index maintenance — the LEXICAL twin of
  * [[StreamingIvf]], completing the maintained-RAG story's second arm
  * under continuous arrival: the inverted-index artifacts
  * (postings (doc_id, token, tf), doc-stats (doc_id, dl), and MERGEABLE
  * corpus totals — one partial row per ingest, the sketch-union idiom)
  * are built once from the base corpus, and every arriving micro-batch
  * of documents lands its own O(batch-tokens) artifact rows. No stored
  * row is ever read or rewritten by an ingest (the batch lane's
  * Bm25IncrementalSpec contract, pinned at the streaming boundary by
  * StreamingHybridSpec); serving reads the merged artifacts through the
  * one shared scorer (`TextQueries.bm25ServeStored`), so maintained
  * serving equals the one-shot recompute bit-for-bit — integer
  * df/tf/dl/N merge exactly, avgdl divides the same integers.
  *
  * foreachBatch delivery is at-least-once, so the append is made
  * IDEMPOTENT the same way [[StreamingIvf.appendBatch]] is: each batch
  * writes its own batch_id partition under dynamic partition overwrite,
  * and a redelivered batch (same batchId, same rows — the
  * replayable-source contract) overwrites its own partition with
  * identical content instead of appending a second copy. The base build
  * owns batch_id = -1. Partition directories are transparent to the
  * serving reader, and token-IN predicate pushdown on postings is a
  * data-column filter, untouched by the layout.
  */
object StreamingBm25 {

  private def write(df: DataFrame, dir: String, batchId: Long): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(dir)

  /** One-time base build: the three artifacts from the base corpus
    * (doc_id, text), landed as batch_id = -1 through the SAME
    * artifact-landing sequence every ingest uses — one code path, so
    * base and batch layouts cannot diverge. Returns the store path. */
  def buildIndex(s: SparkSession, baseDocs: DataFrame): String = {
    val store = graft.plans.ScratchDirs.unique("graft-stream-bm25-index").getAbsolutePath
    appendBatch(store, baseDocs, batchId = -1L)
    store
  }

  /** Ingest ONE micro-batch of documents: O(batch-tokens) artifact rows
    * into the batch's own partitions. Returns the ingest plan strings
    * (captured before the writes) so specs can prove the append never
    * touches the stored artifacts. */
  def appendBatch(store: String, batch: DataFrame, batchId: Long): String = {
    val (p, d, t) = TextQueries.bm25Parts(batch)
    val plan = p.queryExecution.executedPlan.toString + "\n" +
      d.queryExecution.executedPlan.toString + "\n" +
      t.queryExecution.executedPlan.toString
    write(p, s"$store/postings", batchId)
    write(d, s"$store/docstats", batchId)
    write(t, s"$store/totals", batchId)
    p.unpersist()
    plan
  }

  /** Wire a document stream (doc_id, text) to the stored artifacts via
    * foreachBatch — each trigger pays only its own batch. */
  def run(docStream: DataFrame, store: String): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // empty-trigger guard (same as the StreamingIvf wiring): an empty
        // micro-batch must not land three empty batch_id partition dirs
        if (!batch.isEmpty) appendBatch(store, batch, batchId): Unit
      }
      .start()

  // --- streaming DELETE lane (the takedown stream) ----------------------

  /** The store's sibling tombstone directory — separate from the three
    * artifact dirs so delete ingest can never interleave with them (the
    * [[StreamingIvf.tombstonePath]] discipline). */
  def tombstonePath(store: String): String = s"$store-tombstones"

  /** Tombstone ONE micro-batch of takedown requests (doc_id rows) — the
    * lexical twin of [[StreamingIvf.appendDeletes]]: O(deletes) per
    * trigger, landing as the batch's OWN batch_id partition under
    * dynamic partition overwrite so a REDELIVERED delete batch
    * overwrites itself. Never reads, lists, or rewrites the artifacts or
    * earlier tombstones. Returns the ingest plan (captured pre-write). */
  def appendDeletes(store: String, dels: DataFrame, batchId: Long): String = {
    val t = dels.select(col("doc_id")).withColumn("batch_id", lit(batchId))
    val plan = t.queryExecution.executedPlan.toString
    t.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(tombstonePath(store))
    plan
  }

  /** Wire a takedown stream (doc_id) to the tombstone store; checkpoint
    * derived from the tombstone path so redelivery idempotence holds
    * across restarts. */
  def runDeletes(delStream: DataFrame, store: String): StreamingQuery =
    delStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"${tombstonePath(store)}/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) appendDeletes(store, batch, batchId): Unit
      }
      .start()

  /** Apply accumulated tombstones physically — q_bm25_delete_apply's
    * compaction at the streaming boundary: reads ONLY the store + the
    * tombstone directory (never the corpus), drops tombstoned docs from
    * postings and doc-stats via broadcast anti-joins, and RE-DERIVES the
    * exact integer totals from the surviving doc-stats — a takedown
    * invalidates the mergeable partials (a fold can add but never
    * subtract), and serving off stale totals would let deleted docs keep
    * influencing every survivor's IDF/avgdl. Returns (epochPath,
    * rewritePlan); the epoch serves through the same
    * `TextQueries.bm25ServeStored` reader as the live store. */
  def compactWithDeletes(s: SparkSession, store: String): (String, String) = {
    import s.implicits._
    val tomb = StreamingStores.readTombstones(
      s, tombstonePath(store), Seq.empty[Long].toDF("doc_id"))
    val survP = s.read.parquet(s"$store/postings")
      .select(col("doc_id"), col("token"), col("tf"))
      .join(broadcast(tomb), Seq("doc_id"), "left_anti")
    val survD = s.read.parquet(s"$store/docstats")
      .select(col("doc_id"), col("dl"))
      .join(broadcast(tomb), Seq("doc_id"), "left_anti")
    val plan = Seq(survP, survD)
      .map(_.queryExecution.executedPlan.toString).mkString("\n")
    val epoch = graft.plans.ScratchDirs.unique("graft-stream-bm25-epoch").getAbsolutePath
    survP.write.mode("overwrite").parquet(s"$epoch/postings")
    survD.coalesce(1).write.mode("overwrite").parquet(s"$epoch/docstats")
    survD.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$epoch/totals")
    (epoch, plan)
  }
}
