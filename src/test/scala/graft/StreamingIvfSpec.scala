package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingIvf

/** The streaming IVF ingest contract:
  *
  *  - FINAL-LAYOUT EQUALITY: after the base build plus a chunked arrival
  *    schedule of the batch slice, the stored index holds exactly the
  *    (vec_id, c_id) assignment the BATCH incremental lane produces —
  *    chunking must not change any cell membership, because
  *    frozen-centroid assignment is per-row.
  *  - INGEST IS O(batch): every per-trigger append plan reads only its
  *    batch — never the accumulated index (rebuild-in-disguise guard,
  *    IvfIncrementalSpec's test at the streaming boundary).
  */
class StreamingIvfSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("chunked streamed appends == the batch incremental layout; each append O(batch)") {
    implicit val sqlCtx = spark.sqlContext
    val v = Tables(spark, dir).embeddings
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("e"))
    val index = StreamingIvf.buildIndex(spark, v.filter(col("vec_id") % 4 =!= 3))

    val batchSide = v.filter(col("vec_id") % 4 === 3)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(batchSide.length > 10)

    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val ms = MemoryStream[(Long, Seq[Double])]
    val stream = ms.toDF().toDF("vec_id", "e")
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (!batch.isEmpty) plans.synchronized {
          plans += StreamingIvf.appendBatch(index, batch, batchId)
        }: Unit
      }
      .start()
    try {
      val (c1, rest) = batchSide.splitAt(batchSide.length / 3)
      val (c2, c3) = rest.splitAt(rest.length / 2)
      Seq(c1, c2, c3).foreach { chunk =>
        ms.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    assert(plans.size >= 2, "appends must arrive across multiple micro-batches")
    plans.foreach { p =>
      assert(!p.contains("graft-stream-ivf-index"),
        s"a streamed append read the stored index (rebuild in disguise):\n${p.take(2000)}")
      // the frozen centroids are LOCAL rows collected at build time and
      // the batch comes from the stream, so a correct ingest plan scans
      // NO parquet at all — a 'Scan parquet' here means a trigger is
      // re-deriving centroids from the base corpus (O(base) per batch)
      assert(!p.contains("Scan parquet"),
        s"a streamed append re-scans the corpus (unfrozen centroids):\n${p.take(2000)}")
    }

    // the batch lane's one-shot layout over the same corpus split
    val (batchPath, _, _) =
      graft.queries.SimilarityQueries.ivfIncrementalServe(spark, dir)
    def layout(path: String): Set[(Long, Long)] = spark.read.parquet(path)
      .select(col("vec_id"), col("c_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = layout(index.path)
    assert(streamed === layout(batchPath),
      "streamed layout diverged from the batch incremental lane")
    assert(streamed.size === v.count(), "index must hold every corpus row exactly once")
    Bench.cleanup(spark)
  }

  test("a REDELIVERED batch is a layout no-op: same batchId overwrites its own partitions") {
    val v = Tables(spark, dir).embeddings
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("e"))
    val index = StreamingIvf.buildIndex(spark, v.filter(col("vec_id") % 4 =!= 3))
    val batch = v.filter(col("vec_id") % 4 === 3)

    StreamingIvf.appendBatch(index, batch, batchId = 7L)
    def state(): (Long, Set[(Long, Long)]) = {
      val df = spark.read.parquet(index.path)
      (df.count(),
        df.select(col("vec_id"), col("c_id").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    }
    val (n1, l1) = state()
    assert(n1 === v.count(), "first delivery must land every corpus row once")

    // at-least-once redelivery: foreachBatch re-invokes with the SAME
    // batchId and rows (the replayable-source contract) — the dynamic
    // partition overwrite must replace, not duplicate
    StreamingIvf.appendBatch(index, batch, batchId = 7L)
    val (n2, l2) = state()
    assert(n2 === n1, s"redelivery duplicated rows: $n1 -> $n2")
    assert(l2 === l1, "redelivery changed the (vec_id, c_id) layout")
    Bench.cleanup(spark)
  }
}
