package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDedup

/** The streaming incremental-dedup contract: documents arriving over a
  * stream, deduped per micro-batch against the STORED corpus band index,
  * must reach exactly the verdicts the batch incremental lane
  * (q_dedup_incremental semantics) reaches for the same documents — the
  * storage layout and the arrival schedule are both semantically
  * invisible. Uses the dedup fixture corpus (base docs = index, mutated
  * +1000000 twins = the arriving increment).
  */
class StreamingDedupSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed verdicts across micro-batches == the batch incremental lane") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.queries.DedupQueries.corpus(spark, dir)
    val index = StreamingDedup.buildIndex(spark,
      corpus.filter(col("doc_id") < 1000000L))
    val batchSide = corpus.filter(col("doc_id") >= 1000000L)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(batchSide.length > 10)

    val got = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Long, Long, Double)]()
    val batchesSeen = new java.util.concurrent.atomic.AtomicInteger()
    val ms = MemoryStream[(Long, String, String)]
    val stream = ms.toDF().toDF("doc_id", "lang", "text")
    val q = StreamingDedup.run(stream, index, 0.3) { (verdicts, _) =>
      val rows = verdicts.collect()
      if (rows.nonEmpty) batchesSeen.incrementAndGet()
      rows.foreach(r => got.add((r.getLong(0), r.getLong(1), r.getDouble(2))))
    }
    try {
      // three arrival chunks — the dedup authority is the stored index,
      // so the chunking must not change any verdict
      val (c1, rest) = batchSide.splitAt(batchSide.length / 3)
      val (c2, c3) = rest.splitAt(rest.length / 2)
      Seq(c1, c2, c3).foreach { chunk =>
        ms.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val expected = graft.queries.DedupQueries
      .incrementalDedup(corpus, 1000000L, 0.3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got.asScala.toSet === expected)
    assert(expected.nonEmpty, "fixture must produce cross-set duplicates")
    assert(batchesSeen.get() >= 2, "verdicts must arrive across multiple micro-batches")
    Bench.cleanup(spark)
  }

  test("a redelivered doc already present in the index never matches itself") {
    // checkpoint-loss replay after a full pass absorbed earlier streamed
    // docs: the arriving doc's id EXISTS in the index. Its bands match
    // its own index entry; without the doc_a =!= doc_b guard the lane
    // would emit a spurious (X, X, 1.0) self-duplicate verdict.
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.queries.DedupQueries.corpus(spark, dir)
    val index = StreamingDedup.buildIndex(spark,
      corpus.filter(col("doc_id") < 1000000L))
    val replayed = corpus.filter(col("doc_id") < 1000000L)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().take(5)
    val got = scala.collection.mutable.Buffer[(Long, Long)]()
    val ms = MemoryStream[(Long, String, String)]
    val q = StreamingDedup.run(ms.toDF().toDF("doc_id", "lang", "text"), index, 0.3) {
      (verdicts, _) =>
        verdicts.collect().foreach(r => got += ((r.getLong(0), r.getLong(1))))
    }
    try {
      ms.addData(replayed.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.forall { case (a, b) => a != b },
      s"self-duplicate verdicts emitted: ${got.filter(p => p._1 == p._2)}")
    Bench.cleanup(spark)
  }

  test("an arriving doc with no corpus match produces no verdict") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.queries.DedupQueries.corpus(spark, dir)
    val index = StreamingDedup.buildIndex(spark,
      corpus.filter(col("doc_id") < 1000000L))
    val novel = Seq((9999999L, "en",
      "entirely novel words that no fixture document has ever contained before now"))
    val count = new java.util.concurrent.atomic.AtomicLong()
    val ms = MemoryStream[(Long, String, String)]
    val q = StreamingDedup.run(ms.toDF().toDF("doc_id", "lang", "text"), index, 0.3) {
      (verdicts, _) => count.addAndGet(verdicts.count())
    }
    try {
      ms.addData(novel)
      q.processAllAvailable()
    } finally q.stop()
    assert(count.get() === 0L)
    Bench.cleanup(spark)
  }
}
