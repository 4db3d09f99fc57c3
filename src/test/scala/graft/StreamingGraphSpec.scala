package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries
import graft.streaming.StreamingGraph

/** The streaming kNN-graph maintenance contract — [[StreamingIvf]]'s
  * composition applied to the second index family:
  *
  *  1. ARRIVAL-INVARIANT: the accumulated edge set after chunked
  *     streamed appends equals the batch incremental lane's edges
  *     (base build + one-shot batch append), regardless of chunking.
  *  2. O(batch) INGEST: no append's plan reads the accumulated store.
  *  3. IDEMPOTENT under redelivery: re-running a batch (same batchId,
  *     same rows — the replayable-source contract) leaves the edge
  *     multiset unchanged.
  *  4. The loop CLOSES: compacting the streaming store into the
  *     bucketed epoch serves bit-identically to the frozen one-shot
  *     rebuild (q_graph_incremental's own serving math).
  */
class StreamingGraphSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def corpus = Tables(spark, dir).embeddings
    .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("e"))

  test("chunked streamed appends build the batch lane's edge set; ingest O(batch); redelivery idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val v = corpus
    val index = StreamingGraph.buildIndex(spark, v.filter(col("vec_id") % 4 =!= 3))

    val batchSide = v.filter(col("vec_id") % 4 === 3)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(batchSide.length > 5)

    val plans = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val ms = MemoryStream[(Long, Seq[Double])]
    val stream = ms.toDF().toDF("vec_id", "e")
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (!batch.isEmpty) plans.synchronized {
          plans += ((batchId, StreamingGraph.appendBatch(index, batch, batchId)))
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

    // 2. ingest never reads the store
    plans.foreach { case (_, p) =>
      assert(!p.contains(index.path), s"ingest plan touches the store:\n${p.take(1500)}")
    }

    // 1. arrival-invariant: streamed edges == batch incremental edges
    def edgeSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("u"), col("w")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val streamed = edgeSet(spark.read.parquet(index.path))
    val base = v.filter(col("vec_id") % 4 =!= 3)
    val batch = v.filter(col("vec_id") % 4 === 3)
    val a2base = index.baseAssign2
    val a2batch = SimilarityQueries.graphAssign2(batch, index.cents)
    val expected = edgeSet(
      SimilarityQueries.graphEdgesFrom(
        SimilarityQueries.graphBuildCands(a2base), base, base)
      .unionByName(
        SimilarityQueries.graphEdgesFrom(
          a2batch.select(col("c_id"), col("vec_id").as("u"))
            .join(a2base.select(col("c_id"), col("vec_id").as("w")), "c_id")
            .select(col("u"), col("w")).distinct(),
          batch, base)))
    assert(streamed === expected)
    assert(streamed.nonEmpty)

    // 3. redelivery: replay the FIRST chunk under its original batchId —
    // dynamic partition overwrite must leave the multiset unchanged
    val (c1, _) = batchSide.splitAt(batchSide.length / 3)
    val firstId = plans.map(_._1).min
    StreamingGraph.appendBatch(index,
      c1.toIndexedSeq.toDF("vec_id", "e"), firstId)
    assert(edgeSet(spark.read.parquet(index.path)) === expected,
      "a redelivered batch must not change the edge multiset")

    // 4. compact → epoch serves == the frozen one-shot rebuild
    val (epochTbl, epochPath) = StreamingGraph.compactToEpoch(spark, index)
    assert(edgeSet(spark.read.parquet(epochPath)) === expected)
    val assign1 = a2base.unionByName(a2batch)
      .filter(col("rn") === 1).select(col("vec_id"), col("c_id"))
    val qv = v.filter(col("vec_id") < 8).limit(8)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val (_, gallEpoch) = SimilarityQueries.graphServeCands(
      assign1, spark.table(epochTbl).hint("merge"), v, qv)
    val servedEpoch = SimilarityQueries.graphTop5(gallEpoch, v, qv)
      .collect().map(_.toString).sorted.toSeq
    val memGraph = expected.toDF("u", "w")
    val (_, gallMem) = SimilarityQueries.graphServeCands(assign1, memGraph, v, qv)
    val servedMem = SimilarityQueries.graphTop5(gallMem, v, qv)
      .collect().map(_.toString).sorted.toSeq
    assert(servedEpoch === servedMem)
    assert(servedEpoch.nonEmpty)
    Bench.cleanup(spark)
  }
}
