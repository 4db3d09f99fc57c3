package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.queries.{SimilarityQueries, TextQueries}

/** Tombstone DELETE + compaction-applied drop across the three stored
  * index families (round-16 verdict item 2) — the lifecycle verb the
  * stores were missing. Per family this pins what the SQL oracles
  * cannot see:
  *
  *  - the TOMBSTONE APPEND is O(deletes): its physical plan never
  *    touches the store (takedowns cost the takedown list, not the
  *    index);
  *  - the COMPACTION is store-only (no corpus re-scan, no assignment /
  *    tokenize recompute) and DROPS the tombstoned rows PHYSICALLY —
  *    epoch row multisets prove it, and epoch 0 retains every original
  *    row read-only (the retire pattern);
  *  - SERVING over the compacted epoch equals the serve-time-mask arm
  *    (the between-delete-and-compaction behavior) bit-for-bit, so the
  *    mask and the physical drop can never drift.
  */
class DeleteApplySpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def asDouble(c: org.apache.spark.sql.Column) =
    transform(c, x => x.cast("double"))

  private def hasShuffle(plan: String): Boolean =
    plan.linesIterator.exists(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))

  test("ivf: tombstone append is store-blind; compaction drops physically; epoch serves like the mask") {
    val r = SimilarityQueries.ivfDeleteServe(spark, dir)
    // the delete itself never reads the index
    assert(!r.tombstonePlan.contains(r.store0),
      "tombstone-append plan scans the store — deletes must be O(deletes)")
    // compaction reads only the store + tombstones
    assert(!r.rewritePlan.contains("embeddings"),
      "compaction re-scanned the corpus — it must be store-only")
    val store0 = spark.read.parquet(r.store0)
    val epoch = spark.read.parquet(r.epochPath)
    val nDels = spark.read.parquet(r.tombPath).count()
    assert(nDels > 0, "fixture must contain tombstoned ids")
    // physical drop: epoch = store0 minus tombstoned, and epoch 0 keeps
    // every original row (retired read-only, including the deleted ones)
    assert(epoch.count() === store0.count() - nDels)
    assert(epoch.filter(col("vec_id") % 10 === 7).count() === 0L,
      "a tombstoned row survived compaction")
    assert(store0.filter(col("vec_id") % 10 === 7).count() === nDels,
      "epoch 0 lost rows — retired epochs are read-only")
    // served equality with the serve-time mask over the OLD store (the
    // pre-compaction deployment behavior serveStoredIndex's candPred
    // models)
    val v = Tables(spark, dir).embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("nrm", sqrt(aggregate(transform(col("e"), x => x * x),
        lit(0.0), (a, x) => a + x)))
    val cents = SimilarityQueries.IvfProvision.seeds(v)
      .select(col("vec_id").as("c_id"), col("e").as("ce"))
    val masked = SimilarityQueries.serveStoredIndex(spark, v, cents, r.store0,
        candPred = col("vec_id") % 10 =!= 7)
      .collect().map(_.toSeq).toSet
    assert(r.served.collect().map(_.toSeq).toSet === masked,
      "compacted-epoch serving diverged from the serve-time tombstone mask")
    Bench.cleanup(spark)
  }

  test("graph: edges with a tombstoned endpoint die; rewrite is store-only and exchange-free; q7 stops querying") {
    val r = SimilarityQueries.graphDeleteServe(spark, dir)
    assert(!r.tombstonePlan.contains(r.store0Path),
      "tombstone-append plan scans the edge store")
    assert(!r.rewritePlan.contains("embeddings"),
      "graph compaction re-scanned the corpus")
    assert(!hasShuffle(r.rewritePlan),
      s"graph delete-compaction shuffled — the bucketed scan must flow to the bucketed write:\n${r.rewritePlan.take(2000)}")
    // multiset identity: epoch == store0 edges with both endpoints alive
    val store0 = spark.read.parquet(r.store0Path).select(col("u"), col("w"))
    val epoch = spark.read.parquet(r.epochPath).select(col("u"), col("w"))
    val expected = store0.filter(col("u") % 10 =!= 7 && col("w") % 10 =!= 7)
    assert(epoch.count() === expected.count())
    assert(epoch.exceptAll(expected).count() === 0L)
    assert(epoch.count() < store0.count(),
      "fixture produced no tombstoned edges — the drop path was not exercised")
    // query- and candidate-side removal
    val rows = r.served.collect()
    assert(!rows.exists(_.getLong(0) % 10 == 7), "deleted id 7 still queries")
    assert(!rows.exists(_.getLong(1) % 10 == 7), "a deleted id was served")
    // served equality with an in-memory mask over the OLD store's edges
    val v = Tables(spark, dir).embeddings
      .select(col("vec_id"),
        graft.plans.OptimizerBarrier.once(asDouble(col("embedding"))).as("e"))
    val base = v.filter(col("vec_id") % 4 =!= 3)
    val batch = v.filter(col("vec_id") % 4 === 3)
    val cents = SimilarityQueries.IvfProvision.seeds(base)
      .select(col("vec_id").as("c_id"), col("e").as("ce"))
    val assign1 = SimilarityQueries.graphAssign2(base, cents)
      .unionByName(SimilarityQueries.graphAssign2(batch, cents))
      .filter(col("rn") === 1 && col("vec_id") % 10 =!= 7)
      .select(col("vec_id"), col("c_id"))
    val qv = v.filter(col("vec_id") < 8 && col("vec_id") % 10 =!= 7).limit(8)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val (_, gallMask) = SimilarityQueries.graphServeCands(assign1, expected, v, qv)
    val masked = SimilarityQueries.graphTop5(gallMask, v, qv)
      .collect().map(_.toSeq).toSet
    assert(rows.map(_.toSeq).toSet === masked,
      "compacted-epoch graph serving diverged from the masked old store")
    Bench.cleanup(spark)
  }

  test("bm25: postings/stats drop tombstoned docs; totals re-derive exactly; epoch equals survivor one-shot") {
    val r = TextQueries.bm25DeleteServe(spark, dir)
    assert(!r.tombstonePlan.contains(r.store0),
      "tombstone-append plan scans the lexical store")
    assert(!r.rewritePlan.contains("documents"),
      "bm25 compaction re-tokenized the corpus")
    val nDels = spark.read.parquet(r.tombPath).count()
    assert(nDels > 0)
    // physical drop on both artifacts
    val p0 = spark.read.parquet(s"${r.store0}/postings")
    val p1 = spark.read.parquet(s"${r.epochPath}/postings")
    assert(p1.filter(col("doc_id") % 10 === 7).count() === 0L)
    assert(p1.count() === p0.filter(col("doc_id") % 10 =!= 7).count())
    val d1 = spark.read.parquet(s"${r.epochPath}/docstats")
    assert(d1.filter(col("doc_id") % 10 === 7).count() === 0L)
    // totals: ONE exact row re-derived from the survivors (a fold of the
    // old partials can add but never subtract)
    val t1 = spark.read.parquet(s"${r.epochPath}/totals").collect()
    assert(t1.length === 1)
    val survStats = d1.agg(count(lit(1)), sum(col("dl"))).head()
    assert(t1(0).getLong(0) === survStats.getLong(0))
    assert(t1(0).getLong(1) === survStats.getLong(1))
    // served equality with the one-shot scorer over survivors — for BM25
    // tombstone-drop IS the rebuild (per-doc-independent stats), so this
    // is exact, including the IDF/avgdl denominators
    val oneShot = TextQueries.bm25ScoredDocs(
        Tables(spark, dir).documents.filter(col("doc_id") % 10 =!= 7))
      .orderBy(col("bm25").desc, col("doc_id")).limit(10)
      .collect().map(_.toSeq).toSet
    assert(r.served.collect().map(_.toSeq).toSet === oneShot,
      "compacted-epoch bm25 serving diverged from the survivor one-shot")
    Bench.cleanup(spark)
  }

  test("bm25 list-driven takedown: deletes arrive as an id TABLE; compaction broadcasts the list, never a predicate") {
    val r = TextQueries.bm25DeleteListServe(spark, dir)
    // the takedown set really is the materialized list file's contents
    val listIds = Tables(spark, dir).documents
      .filter(col("lang") === "de").select(col("doc_id"))
      .orderBy(col("doc_id")).limit(40)
      .collect().map(_.getLong(0)).sorted.toSeq
    val tombIds = spark.read.parquet(r.tombPath)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(tombIds === listIds, "tombstones must hold exactly the list table's ids")
    // the compaction plan carries the list as a BROADCAST side and never
    // re-reads the corpus — the id source is opaque rows, so no scan
    // predicate can reproduce it (the lane's whole point: the tombstone
    // path is list-driven end-to-end, not an id-rule pushed into scans)
    assert(r.rewritePlan.contains("BroadcastExchange"),
      s"compaction must anti-join a broadcast list:\n${r.rewritePlan.take(2000)}")
    assert(!r.rewritePlan.contains("documents"),
      "list-driven compaction re-read the corpus")
    // no lang='de'-derived predicate appears anywhere in the rewrite —
    // the list's ORIGIN is invisible to the store pipeline
    assert(!r.rewritePlan.contains("lang"),
      "the list's generating predicate leaked into the compaction plan")
    // physical drop + survivor-one-shot equality (the shared contract)
    val p1 = spark.read.parquet(s"${r.epochPath}/postings")
    assert(p1.filter(col("doc_id").isin(listIds: _*)).count() === 0L)
    val oneShot = TextQueries.bm25ScoredDocs(
        Tables(spark, dir).documents
          .join(listIds.toDF("doc_id"), Seq("doc_id"), "left_anti"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(10)
      .collect().map(_.toSeq).toSet
    assert(r.served.collect().map(_.toSeq).toSet === oneShot,
      "list-driven epoch serving diverged from the survivor one-shot")
    Bench.cleanup(spark)
  }

  test("dedup: band rows of tombstoned docs die; compaction is store-only; a deleted doc is nobody's dup_of") {
    val r = graft.queries.DedupQueries.dedupDeleteServe(spark, dir)
    // the takedown list never reads the band store
    assert(!r.tombstonePlan.contains("graft_band_del_v0") &&
        !r.tombstonePlan.contains("graft-band-del-v0"),
      "tombstone-append plan scans the band store")
    // compaction reads only the stored table + tombstones — never text
    assert(!r.rewritePlan.contains("documents"),
      "dedup compaction re-shingled the corpus")
    val store0 = spark.table(r.store0Tbl)
    val epoch = spark.table(r.epochTbl)
    val nDels = spark.read.parquet(r.tombPath).count()
    assert(nDels > 0)
    // physical drop + epoch-0 retire: multiset identity over survivors
    assert(epoch.filter(col("doc_b") % 10 === 7).count() === 0L,
      "a tombstoned doc's band rows survived compaction")
    val expected = store0.filter(col("doc_b") % 10 =!= 7)
    assert(epoch.count() === expected.count())
    assert(epoch.exceptAll(expected).count() === 0L)
    assert(epoch.count() < store0.count(),
      "fixture produced no tombstoned band rows — the drop path was not exercised")
    // served semantics: no deleted doc is anyone's dup_of, and the result
    // equals the undeleted incremental lane minus decisions whose target
    // died (band rows are per-doc independent — drop IS the rebuild)
    val rows = r.served.collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(_.getLong(1) % 10 == 7), "a deleted doc was served as dup_of")
    val undeleted = graft.queries.DedupQueries.incrementalDedupStored(
        spark, graft.queries.DedupQueries.corpus(spark, dir), 1000000L, 0.3)
      .filter(col("dup_of") % 10 =!= 7)
      .collect().map(_.toSeq).toSet
    assert(rows.map(_.toSeq).toSet === undeleted,
      "delete-applied serving diverged from the survivor-filtered incremental lane")
    Bench.cleanup(spark)
  }

  test("graph delete -> rebuild: the post-takedown rebuild epoch re-knits the emptied rank slots from survivors") {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val M = SimilarityQueries.graphDegree // the per-node out-edge budget
    val r = SimilarityQueries.graphDeleteServe(spark, dir)
    // tombstone-drop leaves rank-<=M slots EMPTY (the documented
    // append-only-style decay the delete lane accepts until the next
    // rebuild): survivor nodes that lost a deleted neighbor sit below
    // their edge budget in the compacted epoch
    val degDel = spark.read.parquet(r.epochPath)
      .groupBy(col("u")).agg(count(lit(1)).as("deg")).persist(MEMORY_AND_DISK)
    val underDel = degDel.filter(col("deg") < M).count()
    assert(underDel > 0,
      "fixture produced no emptied slots — the decay the rebuild repairs was not exercised")
    // the repair: a fresh epoch rebuilt from the SURVIVORS' 2-cell
    // candidates under the frozen (pre-delete) quantizer — the
    // q_graph_rebuild_apply machinery pointed at the survivor population
    val v = Tables(spark, dir).embeddings
      .select(col("vec_id"),
        graft.plans.OptimizerBarrier.once(
          transform(col("embedding"), x => x.cast("double"))).as("e"))
      .persist(MEMORY_AND_DISK)
    val cents = SimilarityQueries.IvfProvision.seeds(v.filter(col("vec_id") % 4 =!= 3))
      .select(col("vec_id").as("c_id"), col("e").as("ce"))
    val surv = v.filter(col("vec_id") % 10 =!= 7)
    val a2surv = SimilarityQueries.graphAssign2(surv, cents)
    val rebuilt = SimilarityQueries.graphEdgesFrom(
        SimilarityQueries.graphBuildCands(a2surv), surv, surv)
      .persist(MEMORY_AND_DISK)
    // no deleted endpoint can re-enter
    assert(rebuilt.filter(col("u") % 10 === 7 || col("w") % 10 === 7).count() === 0L)
    // re-knit: strictly fewer under-budget nodes than the delete epoch —
    // the emptied slots refill with survivor neighbors
    val underReb = rebuilt.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") < M).count()
    assert(underReb < underDel,
      s"rebuild did not re-knit: $underReb under-budget nodes vs $underDel after the delete")
    degDel.unpersist(); rebuilt.unpersist(); v.unpersist()
    Bench.cleanup(spark)
  }

  test("one materialized takedown table drives all four families: list in plan, corpus and origin out") {
    // the PRODUCTION shape round 17/18 established for bm25 extended
    // family-wide (round-18 verdict item 3): ONE id table — the DMCA /
    // contamination artifact an operator actually hands the stores —
    // materialized once, then every family's tombstone append copies it
    // and every compaction broadcast-anti-joins it. The fixture id
    // space is shared (doc_id and vec_id both enumerate 0..n-1 at this
    // SF), so literally the same file drives all four. Three plan
    // assertions per family, the bm25 list arm's contract verbatim:
    // the list rides a broadcast, the corpus is never re-read, and the
    // list's generating predicate (lang='de') is invisible to the store
    // pipeline.
    val listPath = graft.plans.ScratchDirs
      .unique("graft-shared-takedown").getAbsolutePath
    Tables(spark, dir).documents.filter(col("lang") === "de")
      .select(col("doc_id")).orderBy(col("doc_id")).limit(40)
      .write.mode("overwrite").parquet(listPath)
    val listIds = spark.read.parquet(listPath)
      .collect().map(_.getLong(0)).toSet
    assert(listIds.nonEmpty, "fixture has no 'de' docs — empty takedown list")
    val listSeq = listIds.toSeq
    def checkPlans(name: String, tombstonePlan: String, rewritePlan: String,
        corpusToken: String): Unit = {
      assert(rewritePlan.contains("BroadcastExchange"),
        s"$name: compaction must anti-join a broadcast list:\n${rewritePlan.take(2000)}")
      assert(!rewritePlan.contains(corpusToken),
        s"$name: list-driven compaction re-read the corpus")
      assert(!rewritePlan.contains("lang") && !tombstonePlan.contains("lang"),
        s"$name: the list's generating predicate leaked into the store pipeline")
    }
    def listAsCol(c: String) =
      Some(spark.read.parquet(listPath).select(col("doc_id").as(c)))
    // ivf — query-side symmetry with the graph family (r19 advice): the
    // queryPred is widened to name a LISTED id explicitly, and the serve
    // must still refuse to query it — a listed id stops being queryable,
    // not just servable, in every family
    val aListed = listSeq.min
    val iv = SimilarityQueries.ivfDeleteServe(spark, dir,
      queryPred = col("vec_id") < 8 || col("vec_id") === aListed,
      takedown = listAsCol("vec_id"))
    checkPlans("ivf", iv.tombstonePlan, iv.rewritePlan, "embeddings")
    assert(spark.read.parquet(iv.tombPath)
      .collect().map(_.getLong(0)).toSet === listIds,
      "ivf tombstones must hold exactly the shared list's ids")
    assert(spark.read.parquet(iv.epochPath)
      .filter(col("vec_id").isin(listSeq: _*)).count() === 0L)
    val ivRows = iv.served.collect()
    assert(ivRows.nonEmpty)
    assert(!ivRows.exists(r => listIds(r.getLong(0))),
      "ivf: a listed id still queries")
    assert(!ivRows.exists(r => listIds(r.getLong(1))),
      "ivf: a listed id was served")
    Bench.cleanup(spark)
    // graph — serve-side exclusions (queries, assignments) also derive
    // from the list, so a listed id stops being queryable too
    val gr = SimilarityQueries.graphDeleteServe(spark, dir, takedown = listAsCol("vec_id"))
    checkPlans("graph", gr.tombstonePlan, gr.rewritePlan, "embeddings")
    val gEpoch = spark.read.parquet(gr.epochPath)
    assert(gEpoch.filter(col("u").isin(listSeq: _*) ||
      col("w").isin(listSeq: _*)).count() === 0L)
    val gRows = gr.served.collect()
    assert(gRows.nonEmpty)
    assert(!gRows.exists(r => listIds(r.getLong(0))), "a listed id still queries")
    assert(!gRows.exists(r => listIds(r.getLong(1))), "a listed id was served")
    Bench.cleanup(spark)
    // dedup
    val dd = graft.queries.DedupQueries.dedupDeleteServe(spark, dir,
      takedown = listAsCol("doc_id"))
    checkPlans("dedup", dd.tombstonePlan, dd.rewritePlan, "documents")
    assert(spark.table(dd.epochTbl)
      .filter(col("doc_b").isin(listSeq: _*)).count() === 0L)
    assert(!dd.served.collect().exists(r => listIds(r.getLong(1))),
      "a listed doc was served as dup_of")
    Bench.cleanup(spark)
    // bm25 — the family the shape was proven on, now driven from the
    // SAME file as the other three
    val bm = TextQueries.bm25DeleteServe(spark, dir, takedown = listAsCol("doc_id"))
    checkPlans("bm25", bm.tombstonePlan, bm.rewritePlan, "documents")
    assert(spark.read.parquet(s"${bm.epochPath}/postings")
      .filter(col("doc_id").isin(listSeq: _*)).count() === 0L)
    assert(bm.served.collect().nonEmpty)
    Bench.cleanup(spark)
  }

  test("hybrid: a deleted doc can appear in NO arm and NO fused rank; rrf re-derives from the row's own ranks") {
    val rows = SparkEntry.queries("q_hybrid_delete")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (docId, rLex, rVec, rrf) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(docId % 10 != 7, s"deleted doc $docId surfaced in the fused top-K")
      val expect = (if (rLex > 0) 1000000000L / (60 + rLex) else 0L) +
        (if (rVec > 0) 1000000000L / (60 + rVec) else 0L)
      assert(rrf === expect, s"rrf_q of $docId is not the integer fold of its ranks")
      assert(rLex > 0 || rVec > 0, s"doc $docId fused from no arm")
    }
    Bench.cleanup(spark)
  }

  test("hybrid list-driven takedown: ONE materialized id table flows through BOTH arms' lifecycles into the fused top-K") {
    // the four-family list test drives each family's serve in isolation;
    // this arm composes the SAME production artifact — one id table —
    // through the RAG capstone (round-19 verdict item 5): both arms'
    // delete lifecycles take the list, both compactions carry the three
    // list-contract assertions, and the fusion can surface no listed id
    // from either column because neither arm can produce one.
    val listPath = graft.plans.ScratchDirs
      .unique("graft-hybrid-takedown").getAbsolutePath
    Tables(spark, dir).documents.filter(col("lang") === "de")
      .select(col("doc_id")).orderBy(col("doc_id")).limit(40)
      .write.mode("overwrite").parquet(listPath)
    val listIds = spark.read.parquet(listPath)
      .collect().map(_.getLong(0)).toSet
    assert(listIds.nonEmpty, "fixture has no 'de' docs — empty takedown list")
    def listAs(c: String) =
      Some(spark.read.parquet(listPath).select(col("doc_id").as(c)))
    def checkPlans(name: String, tombstonePlan: String, rewritePlan: String,
        corpusToken: String): Unit = {
      assert(rewritePlan.contains("BroadcastExchange"),
        s"$name: compaction must anti-join a broadcast list")
      assert(!rewritePlan.contains(corpusToken),
        s"$name: list-driven compaction re-read the corpus")
      assert(!rewritePlan.contains("lang") && !tombstonePlan.contains("lang"),
        s"$name: the list's generating predicate leaked into the store pipeline")
    }
    // both lifecycles off the ONE list, exactly the q_hybrid_delete body
    // with the takedown parameter threaded through
    val vecR = SimilarityQueries.ivfDeleteServe(spark, dir,
      queryPred = col("vec_id") === 0, topK = 10, takedown = listAs("vec_id"))
    checkPlans("ivf", vecR.tombstonePlan, vecR.rewritePlan, "embeddings")
    val lexR = TextQueries.bm25DeleteServe(spark, dir, takedown = listAs("doc_id"))
    checkPlans("bm25", lexR.tombstonePlan, lexR.rewritePlan, "documents")
    val vec = vecR.served.select(col("vec_id").as("doc_id"), col("rank").as("r_vec"))
    val fused = SimilarityQueries.rrfFuse(
      SimilarityQueries.rankLex(lexR.served), vec).collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val (docId, rLex, rVec, rrf) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(!listIds(docId), s"takedown'd doc $docId surfaced in the fused top-K")
      val expect = (if (rLex > 0) 1000000000L / (60 + rLex) else 0L) +
        (if (rVec > 0) 1000000000L / (60 + rVec) else 0L)
      assert(rrf === expect, s"rrf_q of $docId is not the integer fold of its ranks")
    }
    Bench.cleanup(spark)
  }
}
