package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.streaming.StreamingIvf

/** The maintenance loop COMPOSED: a streaming-shaped store (base build
  * + three appendBatch triggers, the exact layout StreamingIvfSpec
  * proves stream-equal) accumulates (c_id, batch_id) partition
  * directories and per-trigger files; the q_similarity_ivf_compact
  * rewrite collapses it into a one-file-per-cell epoch; serving over
  * the compacted epoch is bit-identical to serving over the
  * accumulated streamed store. This is the full steady-state story —
  * ingest fragments, compaction heals, serving never notices.
  */
class StreamingCompactSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streamed store -> compacted epoch: files collapse, serving is bit-identical") {
    val v = Tables(spark, dir).embeddings
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("e"))
    val index = StreamingIvf.buildIndex(spark, v.filter(col("vec_id") % 4 =!= 3))
    val batch = v.filter(col("vec_id") % 4 === 3)
    (0 until 3).foreach { k =>
      StreamingIvf.appendBatch(index,
        batch.filter(pmod(col("vec_id"), lit(3)) === k), batchId = k.toLong)
    }

    // the streamed layout really is fragmented: every cell dir holds the
    // base partition plus one batch_id subdir per touched trigger
    def parquetFiles(root: File): Seq[File] = {
      val kids = Option(root.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.filter(_.isFile).filter(_.getName.endsWith(".parquet")) ++
        kids.filter(_.isDirectory).flatMap(parquetFiles)
    }
    val cellDirs = new File(index.path).listFiles().filter(_.isDirectory).toSeq
    val fragCounts = cellDirs.map(d => d.getName -> parquetFiles(d).size).toMap
    assert(fragCounts.values.sum > fragCounts.size,
      s"streamed store not fragmented: $fragCounts")

    // compact: the q_similarity_ivf_compact rewrite — one c_id-keyed
    // shuffle into a fresh epoch, batch_id dropped (a layout lineage
    // detail, not serving data), reading only the store
    val frag = spark.read.parquet(index.path)
      .select(col("vec_id"), col("e"), col("nrm"), col("c_id").cast("long").as("c_id"))
    val compPath = graft.plans.ScratchDirs.unique("graft-stream-compact-epoch").getAbsolutePath
    frag.repartition(col("c_id"))
      .write.mode("overwrite").partitionBy("c_id").parquet(compPath)
    val compCounts = new File(compPath).listFiles().filter(_.isDirectory)
      .map(d => d.getName -> parquetFiles(d).size).toMap
    assert(compCounts.values.forall(_ == 1),
      s"compacted cells not single-file: $compCounts")
    assert(compCounts.keySet === fragCounts.keySet,
      "cell directories must survive compaction unchanged")

    // serving equality over the SAME frozen centroids
    val vn = v.withColumn("nrm",
      sqrt(aggregate(transform(col("e"), x => x * x), lit(0.0), (a, x) => a + x)))
    val servedFrag = graft.queries.SimilarityQueries
      .serveStoredIndex(spark, vn, index.cents, index.path)
      .collect().map(_.toString).sorted.toSeq
    val servedComp = graft.queries.SimilarityQueries
      .serveStoredIndex(spark, vn, index.cents, compPath)
      .collect().map(_.toString).sorted.toSeq
    assert(servedFrag.nonEmpty)
    assert(servedComp === servedFrag)
    Bench.cleanup(spark)
  }
}
