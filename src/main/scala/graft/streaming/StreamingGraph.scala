package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.SimilarityQueries

/** Streaming kNN-graph ingest — the continuous-ingestion composition of
  * the incremental graph lane (q_graph_incremental) with Structured
  * Streaming, completing the graph family's maintenance symmetry with
  * the IVF family ([[StreamingIvf]]): the bounded edge table is built
  * ONCE from the base corpus with the coarse quantizer FROZEN from it,
  * and every arriving micro-batch of embeddings gets its top-M edges
  * computed against the FROZEN base candidates (vectors sharing one of
  * the batch vector's two nearest cells) and appended as that batch's
  * own partition.
  *
  * Per-trigger work: the batch's 2-cell assignment rides the collected
  * ≤ K centroid rows as a broadcast of local rows (the frozen-quantizer
  * contract made physical — no trigger re-derives cells), candidates
  * come from ONE keyed join of batch cells against the persisted base
  * assignment, and edge scoring fetches base vectors by key. The append
  * never reads, rewrites, or lists the accumulated edge store
  * (StreamingGraphSpec pins it in the ingest plan). foreachBatch is
  * at-least-once, so the append is made IDEMPOTENT exactly as
  * [[StreamingIvf]]'s: each batch lands in its own batch_id partition
  * under dynamic partition overwrite — a redelivered batch overwrites
  * its own partition with identical rows (replayable-source contract),
  * never a second copy.
  *
  * Because frozen-candidate edge derivation is per-batch-row, the
  * accumulated edge SET after any arrival chunking equals the batch
  * incremental lane's (ingest order changes file layout, never edges) —
  * StreamingGraphSpec pins set identity. Serving wants the bucketed
  * zero-exchange layout, so the maintenance loop closes through
  * [[compactToEpoch]]: the q_graph_compact move applied to the
  * streaming store — read ONLY the store, rewrite one-file-per-bucket
  * into a bucketed epoch table, serve from the epoch.
  */
object StreamingGraph {

  /** The streaming edge-store artifact: store path + the frozen pieces a
    * serving system versions with it (centroids, base 2-cell assignment,
    * normalized base vectors — the static sides every trigger joins). */
  final case class StoredGraphIndex(path: String, cents: DataFrame,
      baseAssign2: DataFrame, base: DataFrame)

  /** One-time base build: freeze ≤ K centroid rows from the base corpus
    * (collected — a HARD provisioning bound, never a corpus rate), build
    * the base's bounded edge table, land it as batch_id = -1. `base` is
    * (vec_id, e). */
  def buildIndex(s: SparkSession, base: DataFrame): StoredGraphIndex = {
    import s.implicits._
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val v = base.persist(MEMORY_AND_DISK)
    val centRows: Seq[(Long, Seq[Double])] = SimilarityQueries.IvfProvision.seeds(v)
      .select(col("vec_id"), col("e")).as[(Long, Seq[Double])]
      .collect().sortBy(_._1).toSeq
    val cents = centRows.toDF("c_id", "ce")
    val a2base = SimilarityQueries.graphAssign2(v, cents).persist(MEMORY_AND_DISK)
    val path = graft.plans.ScratchDirs.unique("graft-stream-graph").getAbsolutePath
    SimilarityQueries
      .graphEdgesFrom(SimilarityQueries.graphBuildCands(a2base), v, v)
      .withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").partitionBy("batch_id").parquet(path)
    StoredGraphIndex(path, cents, a2base, v)
  }

  /** Ingest ONE micro-batch (vec_id, e): top-M edges against the frozen
    * base candidates, landed as the batch's own partition via dynamic
    * partition overwrite (idempotent under redelivery). Returns the
    * ingest plan string captured before the write so specs can prove the
    * append never touches the store. */
  def appendBatch(index: StoredGraphIndex, batch: DataFrame, batchId: Long): String = {
    val a2batch = SimilarityQueries.graphAssign2(batch, index.cents)
    val xcand = a2batch.select(col("c_id"), col("vec_id").as("u"))
      .join(index.baseAssign2.select(col("c_id"), col("vec_id").as("w")), "c_id")
      .select(col("u"), col("w")).distinct()
    val ingest = SimilarityQueries.graphEdgesFrom(xcand, batch, index.base)
      .withColumn("batch_id", lit(batchId))
    val plan = ingest.queryExecution.executedPlan.toString
    ingest.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(index.path)
    plan
  }

  /** Wire an embedding stream (vec_id, e) to the edge store via
    * foreachBatch. The checkpoint location is DERIVED from the index
    * path (round-15 ADVICE: a fresh scratch dir per run() meant a
    * restarted query renumbered from batchId 0, and dynamic partition
    * overwrite could replace old partitions with unrelated batches —
    * the exact failure the checkpoint exists to prevent); an
    * underscore-prefixed sibling dir is invisible to the parquet reads
    * of the store itself, so a restart resumes offsets and batch
    * numbering and redelivered batches overwrite themselves. */
  def run(vecStream: DataFrame, index: StoredGraphIndex): StreamingQuery =
    vecStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"${index.path}/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(index, batch, batchId): Unit
      }
      .start()

  /** Compact the accumulated streaming store into a bucketed serving
    * epoch (the q_graph_compact move): read ONLY the store, rewrite
    * bucketed+sorted by u so the hop joins serve with zero exchange on
    * the stored side. Returns (epoch table name, epoch path). */
  def compactToEpoch(s: SparkSession, index: StoredGraphIndex): (String, String) = {
    val dirF = graft.plans.ScratchDirs.unique("graft-stream-graph-epoch")
    val tbl = dirF.getName.replace('-', '_').replace('.', '_')
    val path = dirF.getAbsolutePath
    s.read.parquet(index.path).select(col("u"), col("w"))
      .repartition(SimilarityQueries.graphIndexBuckets, col("u"))
      .write.mode("overwrite")
      .bucketBy(SimilarityQueries.graphIndexBuckets, "u").sortBy("u")
      .option("path", path)
      .saveAsTable(tbl)
    (tbl, path)
  }

  // --- streaming DELETE lane (the takedown stream) ----------------------

  /** The edge store's sibling tombstone directory (the
    * [[StreamingIvf.tombstonePath]] discipline). */
  def tombstonePath(index: StoredGraphIndex): String = s"${index.path}-tombstones"

  /** Tombstone ONE micro-batch of takedown requests (vec_id rows):
    * O(deletes) per trigger, idempotent under redelivery via the batch's
    * own batch_id partition. Never reads the edge store or earlier
    * tombstones. Returns the ingest plan (captured pre-write). */
  def appendDeletes(index: StoredGraphIndex, dels: DataFrame, batchId: Long): String = {
    val t = dels.select(col("vec_id")).withColumn("batch_id", lit(batchId))
    val plan = t.queryExecution.executedPlan.toString
    t.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(tombstonePath(index))
    plan
  }

  /** Wire a takedown stream (vec_id) to the tombstone store; checkpoint
    * derived from the tombstone path so batch numbering (and with it
    * redelivery idempotence) survives restarts. */
  def runDeletes(delStream: DataFrame, index: StoredGraphIndex): StreamingQuery =
    delStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"${tombstonePath(index)}/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) appendDeletes(index, batch, batchId): Unit
      }
      .start()

  /** Apply accumulated tombstones physically — q_graph_delete_apply's
    * compaction at the streaming boundary: reads ONLY the edge store +
    * the tombstone directory, drops every edge INCIDENT to a tombstoned
    * node (u or w — an edge pointing AT a deleted vector is as dead as
    * one leaving it), lands the survivors as a bucketed serving epoch
    * (the compactToEpoch layout). Emptied rank slots re-knit on the next
    * EPOCH REBUILD, exactly as in the batch lane — a takedown must not
    * read the corpus, and slot-refill needs vectors. Returns
    * (epochTbl, epochPath, rewritePlan). */
  def compactWithDeletes(s: SparkSession, index: StoredGraphIndex)
      : (String, String, String) = {
    import s.implicits._
    val tomb = StreamingStores.readTombstones(
      s, tombstonePath(index), Seq.empty[Long].toDF("vec_id"))
    val survivors = s.read.parquet(index.path).select(col("u"), col("w"))
      .join(broadcast(tomb.withColumnRenamed("vec_id", "u")), Seq("u"), "left_anti")
      .join(broadcast(tomb.withColumnRenamed("vec_id", "w")), Seq("w"), "left_anti")
      // a USING-column join hoists its key first — pin the (u, w) schema
      // so the epoch's column order matches the live store's
      .select(col("u"), col("w"))
    val plan = survivors.queryExecution.executedPlan.toString
    val dirF = graft.plans.ScratchDirs.unique("graft-stream-graph-delepoch")
    val tbl = dirF.getName.replace('-', '_').replace('.', '_')
    val path = dirF.getAbsolutePath
    survivors
      .repartition(SimilarityQueries.graphIndexBuckets, col("u"))
      .write.mode("overwrite")
      .bucketBy(SimilarityQueries.graphIndexBuckets, "u").sortBy("u")
      .option("path", path)
      .saveAsTable(tbl)
    (tbl, path, plan)
  }
}
