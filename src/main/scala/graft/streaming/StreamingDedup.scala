package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.DedupQueries

/** Streaming incremental near-dup — the continuous-ingestion composition
  * of the stored-index dedup lane (q_dedup_incremental_stored) with
  * Structured Streaming: the corpus band index and shingle table are
  * built ONCE (the full-corpus pass, stored), and every arriving
  * micro-batch of documents is banded, joined against the stored index,
  * and Jaccard-verified — the per-batch work is O(batch tokens) plus one
  * keyed join against co-located index buckets, exactly the incremental
  * contract, now running as each batch ARRIVES instead of as a nightly
  * job. Dataflow per batch (inside foreachBatch, the fan-out sink's
  * pattern — stream-static joins where the static side is the stored
  * index):
  *
  *   batch docs → shingle arrays → minhash bands
  *     → join STORED band table (bucketed by (b, bv): zero exchange on
  *       the index side, only batch bands shuffle to the bucket layout)
  *     → candidate (doc_batch, dup_of) pairs, cross-set by construction
  *     → exact-Jaccard verify: batch shingles (just computed) × stored
  *       corpus shingles (read from the index artifact)
  *     → (doc_batch, dup_of, jac) verdicts, handed to the sink.
  *
  * Batches never compare against each other here — the index is the
  * dedup authority, the nightly full pass refreshes it; that matches the
  * production contract where an increment dedups against the CORPUS
  * (intra-increment dups are the next full pass's job). Verdicts are
  * deterministic per batch, so at-least-once redelivery re-emits
  * identical rows (StreamingDedupSpec pins verdict-set equality with the
  * batch q_dedup_incremental_stored lane).
  */
object StreamingDedup {

  /** The stored artifacts a streaming dedup consumer serves against:
    * the (b, bv, doc_b) band table — written bucketed+sorted by the join
    * key, the exchange paid once — the corpus (doc_b, sb) shingle table
    * the verify step reads, and the store's root path (the takedown
    * stream tombstones against it). */
  final case class StoredDedupIndex(bands: DataFrame, shingles: DataFrame,
      path: String)

  /** One-time index build from a corpus frame (doc_id, lang, text):
    * writes both artifacts under JVM-unique exit-cleaned paths and
    * returns frames READING THE STORED FILES (not the in-memory lineage),
    * so the streaming consumer's plans hit disk exactly as a separately
    * launched consumer would. */
  def buildIndex(s: SparkSession, corpus: DataFrame): StoredDedupIndex = {
    val sarr = DedupQueries.shingleArrays(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = graft.plans.ScratchDirs.unique("graft-stream-dedup-index")
    val bandPath = new java.io.File(base, "bands").getAbsolutePath
    val shinglePath = new java.io.File(base, "shingles").getAbsolutePath
    val tbl = ("graft_stream_band_index_" + base.getName).replace('-', '_')
    DedupQueries.minhashBands(sarr)
      .select(col("b"), col("bv"), col("doc_id").as("doc_b"))
      .repartition(DedupQueries.indexBuckets, col("b"), col("bv"))
      .write.mode("overwrite")
      .bucketBy(DedupQueries.indexBuckets, "b", "bv").sortBy("b", "bv")
      .option("path", bandPath)
      .saveAsTable(tbl)
    sarr.select(col("doc_id").as("doc_b"), col("sarr").as("sb"))
      .write.mode("overwrite").parquet(shinglePath)
    sarr.unpersist(false)
    StoredDedupIndex(s.table(tbl), s.read.parquet(shinglePath),
      base.getAbsolutePath)
  }

  /** Verdicts from a PREPARED batch shingle frame (doc_id, sarr): band,
    * join the stored index (merge-hinted — the declared plan is the
    * bucketed 100-TB plan even when the fixture index would broadcast),
    * exact-Jaccard verify. The `doc_a =!= doc_b` guard matters here in a
    * way it doesn't for the batch lane (whose splitId predicate makes
    * the sides disjoint by construction): a stream can REDELIVER a
    * document whose id the index already holds (checkpoint-loss replay
    * after a full pass absorbed it), and without the guard that doc
    * would match its own index entry and emit a spurious
    * (X, X, 1.0) self-duplicate. */
  private def verdictsFrom(index: StoredDedupIndex, sarrB: DataFrame,
      threshold: Double): DataFrame = {
    val bandsB = DedupQueries.minhashBands(sarrB)
      .select(col("b"), col("bv"), col("doc_id").as("doc_a"))
    val cands = bandsB.join(index.bands.hint("merge"), Seq("b", "bv"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    DedupQueries.jaccardVerifyAcross(
      sarrB.select(col("doc_id").as("doc_a"), col("sarr").as("sa")),
      index.shingles, cands, threshold)
      .select(col("doc_a").as("doc_batch"), col("doc_b").as("dup_of"), col("jac"))
  }

  /** Verdicts for ONE batch of documents (doc_id, lang, text). */
  def batchVerdicts(index: StoredDedupIndex, batch: DataFrame,
      threshold: Double): DataFrame =
    verdictsFrom(index, DedupQueries.shingleArrays(batch), threshold)

  /** Wire a document stream (doc_id, lang, text) to a verdict sink via
    * foreachBatch — the stream-static shape: the static side is the
    * stored index, the batch side is whatever the trigger delivered.
    * The batch shingle frame is referenced twice (band derivation and
    * the verify join), so each batch's is localCheckpoint'd once and its
    * blocks released as soon as the sink returns — per-trigger shingling
    * is paid once, and state never accretes across batches. */
  def run(docStream: DataFrame, index: StoredDedupIndex, threshold: Double)
      (sink: (DataFrame, Long) => Unit): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val sarrB = DedupQueries.shingleArrays(batch).localCheckpoint(true)
        try sink(verdictsFrom(index, sarrB, threshold), id)
        finally graft.plans.Checkpoints.checkpointedRdd(sarrB)
          .foreach(_.unpersist(false))
      }
      .start()

  // --- streaming DELETE lane (the takedown stream) ----------------------

  /** The index's sibling tombstone directory (the
    * [[StreamingIvf.tombstonePath]] discipline). */
  def tombstonePath(index: StoredDedupIndex): String = s"${index.path}-tombstones"

  /** Tombstone ONE micro-batch of takedown requests (doc_id rows):
    * O(deletes) per trigger, idempotent under redelivery via the batch's
    * own batch_id partition; never reads the band or shingle artifacts.
    * Returns the ingest plan (captured pre-write). */
  def appendDeletes(index: StoredDedupIndex, dels: DataFrame, batchId: Long): String = {
    val t = dels.select(col("doc_id")).withColumn("batch_id", lit(batchId))
    val plan = t.queryExecution.executedPlan.toString
    t.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(tombstonePath(index))
    plan
  }

  /** Wire a takedown stream (doc_id) to the tombstone store; checkpoint
    * derived from the tombstone path so batch numbering (and with it
    * redelivery idempotence) survives restarts. */
  def runDeletes(delStream: DataFrame, index: StoredDedupIndex): StreamingQuery =
    delStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"${tombstonePath(index)}/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) appendDeletes(index, batch, batchId): Unit
      }
      .start()

  /** Apply accumulated tombstones physically — q_dedup_delete_apply's
    * compaction at the streaming boundary: reads ONLY the two artifacts
    * + the tombstone directory, drops the tombstoned docs' band rows and
    * shingle rows via broadcast anti-joins, and lands a fresh epoch in
    * the live layout (band table bucketed by (b, bv), shingles plain
    * parquet). After it, a takedown'd document can never again be the
    * `dup_of` of an arriving batch doc — the observable effect a
    * serve-time mask would have to fake. Returns the new index and the
    * rewrite plan. */
  def compactWithDeletes(s: SparkSession, index: StoredDedupIndex)
      : (StoredDedupIndex, String) = {
    import s.implicits._
    val tomb = StreamingStores.readTombstones(
        s, tombstonePath(index), Seq.empty[Long].toDF("doc_id"))
      .withColumnRenamed("doc_id", "doc_b")
    val survB = index.bands
      .join(broadcast(tomb), Seq("doc_b"), "left_anti")
    val survS = index.shingles
      .join(broadcast(tomb), Seq("doc_b"), "left_anti")
    val plan = Seq(survB, survS)
      .map(_.queryExecution.executedPlan.toString).mkString("\n")
    val base = graft.plans.ScratchDirs.unique("graft-stream-dedup-delepoch")
    val bandPath = new java.io.File(base, "bands").getAbsolutePath
    val shinglePath = new java.io.File(base, "shingles").getAbsolutePath
    val tbl = ("graft_stream_band_epoch_" + base.getName).replace('-', '_')
    survB.repartition(DedupQueries.indexBuckets, col("b"), col("bv"))
      .write.mode("overwrite")
      .bucketBy(DedupQueries.indexBuckets, "b", "bv").sortBy("b", "bv")
      .option("path", bandPath)
      .saveAsTable(tbl)
    survS.write.mode("overwrite").parquet(shinglePath)
    (StoredDedupIndex(s.table(tbl), s.read.parquet(shinglePath),
      base.getAbsolutePath), plan)
  }
}
