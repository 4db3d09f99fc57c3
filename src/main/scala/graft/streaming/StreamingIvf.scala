package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.SimilarityQueries

/** Streaming IVF ingest — the continuous-ingestion composition of the
  * incremental stored-index lane (q_similarity_ivf_incremental) with
  * Structured Streaming, the ANN twin of [[StreamingDedup]]: the
  * cell-partitioned index is built ONCE from the base corpus with the
  * coarse quantizer FROZEN from it (the versioned-quantizer contract),
  * and every arriving micro-batch of embeddings is assigned against the
  * frozen centroids and APPENDED into the existing cell directories.
  *
  * Per-trigger work is O(batch): the centroid table is COLLECTED once
  * at build time (O(cells) driver rows — the frozen-quantizer contract
  * made physical: a trigger can never accidentally re-derive cells
  * from a moved corpus, and no per-batch plan re-scans the base) and
  * rides into each assignment as a broadcast of local rows; the append
  * never reads, rewrites, or even lists the accumulated index
  * (StreamingIvfSpec pins both properties in the ingest plan). Because
  * frozen-centroid assignment is per-row, the final layout after ANY
  * arrival chunking is SET-identical to the batch incremental lane's —
  * ingest order changes file names inside a cell directory, never cell
  * membership. foreachBatch delivery is at-least-once, so the append is
  * made IDEMPOTENT: each batch lands in its own (c_id, batch_id)
  * partitions under dynamic partition overwrite, and a redelivered
  * batch overwrites exactly those partitions with the same rows (the
  * replayable-source contract) — a no-op at the layout level, the same
  * idempotent-sink device Delivery.scala's dd lane uses
  * (StreamingIvfSpec drives a redelivery and pins the layout
  * unchanged). Serving keeps the stored lane's probe-cell
  * partition pruning regardless of how many triggers have appended
  * (the q_similarity_ivf_stored contract).
  *
  * At 100 TB this is the steady-state shape: the corpus grows by
  * micro-batches, each paying only its own assignment + append, and the
  * q_ivf_balance → q_ivf_retrain_apply pair watches the frozen
  * quantizer's drift and versions a new epoch when cells run hot/cold.
  */
object StreamingIvf {

  /** The stored serving artifact: the cell-partitioned index path and
    * the FROZEN centroid frame (c_id, ce) it was built with — the pair a
    * serving system versions together. */
  final case class StoredIvfIndex(path: String, cents: DataFrame)

  /** Normalize a raw (vec_id, e) embedding frame with the corpus norm
    * column the assignment and serving kernels expect. */
  private def withNorm(v: DataFrame): DataFrame =
    v.withColumn("nrm",
      sqrt(aggregate(transform(col("e"), x => x * x), lit(0.0), (a, x) => a + x)))

  /** One-time base build: freeze the centroid set from the base corpus
    * (the same bounded [[SimilarityQueries.IvfProvision]] strided rule
    * as the batch incremental lane — K rows, never ∝ N) and write
    * the cell-partitioned index. `base` is (vec_id, e). */
  def buildIndex(s: SparkSession, base: DataFrame): StoredIvfIndex = {
    import s.implicits._
    val v = withNorm(base)
    // FREEZE the quantizer physically: collect the ≤ K centroid rows
    // (a HARD bound — the provisioning rule, not a corpus rate) and
    // rebuild them as a local relation, so every later assignment
    // broadcasts driver rows instead of re-planning (and re-scanning)
    // the base corpus per micro-batch
    val centRows: Seq[(Long, Seq[Double])] = SimilarityQueries.IvfProvision.seeds(v)
      .select(col("vec_id"), col("e")).as[(Long, Seq[Double])]
      .collect().sortBy(_._1).toSeq
    val cents = centRows.toDF("c_id", "ce")
    val path = graft.plans.ScratchDirs.unique("graft-stream-ivf-index").getAbsolutePath
    SimilarityQueries.assignCells(v, cents, Seq("e", "nrm"))
      .withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").partitionBy("c_id", "batch_id").parquet(path)
    StoredIvfIndex(path, cents)
  }

  /** Assign ONE micro-batch (vec_id, e) against the frozen centroids and
    * land it in the cell directories as that batch's OWN
    * (c_id, batch_id) partitions via dynamic partition overwrite — the
    * idempotence device that turns foreachBatch's at-least-once into
    * exactly-once layout: a REDELIVERED batch (same batchId, same rows —
    * the replayable-source contract) overwrites its own partitions with
    * identical content instead of appending a second physical copy, so
    * no duplicate vec_id can ever surface in a top-K serve
    * (StreamingIvfSpec drives the redelivery path). The base build owns
    * batch_id = -1; serving partition-pruning on c_id is untouched
    * (c_id is the OUTER partition level). Returns the ingest plan string
    * (captured before the write) so callers/specs can prove the append
    * is O(batch) — it must never touch the stored index. */
  def appendBatch(index: StoredIvfIndex, batch: DataFrame, batchId: Long): String = {
    val ingest = SimilarityQueries.assignCells(
        withNorm(batch), index.cents, Seq("e", "nrm"))
      .withColumn("batch_id", lit(batchId))
    val plan = ingest.queryExecution.executedPlan.toString
    ingest.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("c_id", "batch_id").parquet(index.path)
    plan
  }

  /** Wire an embedding stream (vec_id, e) to the stored index via
    * foreachBatch — the stream-static shape where the static side is the
    * frozen centroid table and each trigger pays only its own batch.
    * The checkpoint location is DERIVED from the index path (round-15
    * ADVICE: a fresh scratch dir per run() meant a restarted query
    * renumbered from batchId 0, and dynamic partition overwrite could
    * replace old partitions with unrelated batches — the exact failure
    * the checkpoint exists to prevent); the underscore-prefixed sibling
    * dir is invisible to the store's own parquet reads, so a restart
    * resumes offsets and the (c_id, batch_id) idempotence contract
    * holds ACROSS restarts. */
  def run(vecStream: DataFrame, index: StoredIvfIndex): StreamingQuery =
    vecStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"${index.path}/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(index, batch, batchId): Unit
      }
      .start()

  // --- streaming DELETE lane (the takedown stream) ----------------------

  /** The index's sibling tombstone store — a SEPARATE directory (not a
    * partition level inside the index) so delete ingest can never
    * interleave with, list, or lock the cell directories, and so the
    * compactor's "reads ONLY store + tombstones" plan guard stays
    * greppable by path. */
  def tombstonePath(index: StoredIvfIndex): String = s"${index.path}-tombstones"

  /** Tombstone ONE micro-batch of delete requests (vec_id rows) — the
    * streaming twin of q_ivf_delete_apply's step 1: O(deletes) per
    * trigger, landing as that batch's OWN batch_id partition under
    * dynamic partition overwrite, so a REDELIVERED delete batch
    * overwrites itself (the appendBatch idempotence device — a takedown
    * replayed twice is the same takedown). Never reads, lists, or
    * rewrites the index or earlier tombstones. Returns the ingest plan
    * (captured pre-write) so the spec can prove store-blindness. */
  def appendDeletes(index: StoredIvfIndex, dels: DataFrame, batchId: Long): String = {
    val t = dels.select(col("vec_id")).withColumn("batch_id", lit(batchId))
    val plan = t.queryExecution.executedPlan.toString
    t.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(tombstonePath(index))
    plan
  }

  /** Wire a takedown stream (vec_id) to the tombstone store. Checkpoint
    * derived from the tombstone path (the run() restart contract): a
    * restarted query resumes batch numbering, so redelivery idempotence
    * holds across restarts here too. */
  def runDeletes(delStream: DataFrame, index: StoredIvfIndex): StreamingQuery =
    delStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"${tombstonePath(index)}/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendDeletes(index, batch, batchId): Unit
      }
      .start()

  /** Apply accumulated tombstones physically — q_ivf_delete_apply's
    * step 2 at the streaming boundary: reads ONLY the store and the
    * tombstone directory (never the corpus), broadcast anti-join, one
    * c_id-keyed shuffle, fresh one-directory-per-cell epoch; the old
    * store and tombstones retire read-only. Between triggers of this
    * (scheduled, not per-batch — compaction is a maintenance verb) a
    * deployment serves with the tombstone mask; after it the rows are
    * physically gone. Returns (epochPath, rewritePlan). */
  def compactWithDeletes(s: SparkSession, index: StoredIvfIndex): (String, String) = {
    import s.implicits._
    // a SCHEDULED compactor can fire before the first takedown lands:
    // runDeletes creates only <path>/_checkpoint at stream start, and
    // s.read.parquet on a missing or checkpoint-only directory throws
    // instead of compacting zero deletes — treat that state as an empty
    // tombstone set (the epoch is then a pure layout rewrite). The probe
    // goes through the Hadoop FileSystem API like every other store read
    // (round-17 ADVICE: a java.io.File walk is driver-LOCAL — on
    // HDFS/S3 it always reported no tombstones and compaction silently
    // degraded to a pure layout rewrite that dropped nothing).
    val tomb = StreamingStores.readTombstones(
      s, tombstonePath(index), Seq.empty[Long].toDF("vec_id"))
    val survivors = s.read.parquet(index.path)
      .select(col("vec_id"), col("e"), col("nrm"),
        col("c_id").cast("long").as("c_id"), col("batch_id"))
      .join(broadcast(tomb), Seq("vec_id"), "left_anti")
      .repartition(col("c_id"))
    val plan = survivors.queryExecution.executedPlan.toString
    val epochPath = graft.plans.ScratchDirs.unique("graft-stream-ivf-epoch").getAbsolutePath
    survivors.write.mode("overwrite").partitionBy("c_id", "batch_id").parquet(epochPath)
    (epochPath, plan)
  }
}
