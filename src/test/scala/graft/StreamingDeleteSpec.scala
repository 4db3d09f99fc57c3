package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries
import graft.streaming.StreamingIvf

/** The streaming DELETE (takedown) contract over the stored IVF index —
  * q_ivf_delete_apply's semantics pushed to the streaming boundary:
  *
  *  - DELETE INGEST IS O(deletes): every per-trigger tombstone plan reads
  *    only its batch — never the index, never earlier tombstones.
  *  - REDELIVERY IS A NO-OP: a replayed delete batch (same batchId, same
  *    rows) overwrites its own tombstone partition with identical rows.
  *  - COMPACTION DROPS PHYSICALLY and serving over the compacted epoch
  *    equals BOTH the serve-time tombstone mask over the old store and
  *    the one-shot rebuild over survivors, bit for bit.
  */
class StreamingDeleteSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed takedowns: store-blind ingest, idempotent redelivery, physical compaction, mask-equal serving") {
    implicit val sqlCtx = spark.sqlContext
    val v = Tables(spark, dir).embeddings
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("e"))
    val index = StreamingIvf.buildIndex(spark, v)
    val nAll = spark.read.parquet(index.path).count()

    // the takedown list, streamed in two chunks
    val delIds = v.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id")).as[Long].collect().sorted
    assert(delIds.length > 5)

    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val ms = MemoryStream[Long]
    val stream = ms.toDF().toDF("vec_id")
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (!batch.isEmpty) plans.synchronized {
          plans += StreamingIvf.appendDeletes(index, batch, batchId)
        }: Unit
      }
      .start()
    try {
      val (c1, c2) = delIds.splitAt(delIds.length / 2)
      Seq(c1, c2).foreach { chunk =>
        ms.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    assert(plans.size >= 2, "deletes must arrive across multiple micro-batches")
    plans.foreach { p =>
      assert(!p.contains("graft-stream-ivf-index"),
        s"a delete ingest read the stored index:\n${p.take(2000)}")
      assert(!p.contains("Scan parquet"),
        s"a delete ingest scanned parquet (tombstones must come from the stream alone):\n${p.take(2000)}")
    }

    val tombDir = StreamingIvf.tombstonePath(index)
    def tombRows(): Seq[(Long, Long)] = spark.read.parquet(tombDir)
      .select(col("vec_id"), col("batch_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val before = tombRows()
    assert(before.map(_._1) === delIds.toSeq, "tombstones must hold exactly the takedown ids")

    // redelivery: replay batch 0's rows under the same batchId — layout unchanged
    val (c1, _) = delIds.splitAt(delIds.length / 2)
    StreamingIvf.appendDeletes(index, c1.toSeq.toDF("vec_id"), 0L)
    assert(tombRows() === before, "a redelivered delete batch must be a layout no-op")

    // compaction: survivors only, physically
    val (epochPath, rewritePlan) = StreamingIvf.compactWithDeletes(spark, index)
    assert(!rewritePlan.contains("embeddings"),
      "compaction must read only store + tombstones, never the corpus")
    val nEpoch = spark.read.parquet(epochPath).count()
    assert(nEpoch === nAll - delIds.length, "compaction must drop tombstoned rows physically")
    assert(spark.read.parquet(epochPath)
      .filter(col("vec_id").isin(delIds.toSeq: _*)).count() === 0L)

    // serving: compacted epoch == serve-time mask over the old store ==
    // one-shot rebuild over survivors
    val vn = v.withColumn("nrm",
      sqrt(aggregate(transform(col("e"), x => x * x), lit(0.0), (a, x) => a + x)))
    def servedSet(path: String, mask: org.apache.spark.sql.Column) =
      SimilarityQueries.serveStoredIndex(spark, vn, index.cents, path, candPred = mask)
        .collect().map(_.toSeq).toSet
    val epochServed = servedSet(epochPath, lit(true))
    assert(epochServed === servedSet(index.path, col("vec_id") % 10 =!= 7),
      "compacted-epoch serving diverged from the serve-time tombstone mask")
    // one-shot rebuild over survivors (fresh store, same frozen centroids)
    val rebuilt = graft.plans.ScratchDirs.unique("graft-stream-del-rebuild").getAbsolutePath
    SimilarityQueries.assignCells(
        vn.filter(col("vec_id") % 10 =!= 7), index.cents, Seq("e", "nrm"))
      .write.mode("overwrite").partitionBy("c_id").parquet(rebuilt)
    assert(epochServed === servedSet(rebuilt, lit(true)),
      "compacted-epoch serving diverged from the one-shot survivor rebuild")
    Bench.cleanup(spark)
  }
}
