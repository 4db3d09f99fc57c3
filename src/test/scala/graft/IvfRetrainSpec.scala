package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** The retrain-and-rebuild contract — the structure the SQL oracle cannot
  * see (it only proves the served results and the replayed branch match):
  *
  *  - RETIRED EPOCHS ARE READ-ONLY: the apply writes the NEW epoch
  *    directory and never rewrites (or deletes) a byte of epoch 0 — the
  *    versioned-index contract that makes a rollback and a concurrent
  *    reader safe during a retrain.
  *  - THE BRANCH IS DATA-DRIVEN: the fixture trips the 1.1×/0.85× balance
  *    trigger at sf0.01 (rebuild, serve epoch 1) and stays balanced at
  *    sf0.001 (no epoch-1 directory is ever created; epoch 0 serves) —
  *    both arms re-derived here from the stored index's own cell counts.
  *  - SERVING STAYS PRUNED: whichever epoch serves, the index scan reads
  *    through probe-cell partition filters.
  */
class IvfRetrainSpec extends SparkSpec {

  private def snapshot(dir: File): Map[String, (Long, Long)] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).map(f => f.getPath -> (f.length(), f.lastModified())).toMap
  }

  private def flaggedFromStore(store: String): Long = {
    val counts = spark.read.parquet(s"$store/v0")
      .groupBy(col("c_id")).agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    val total = counts.sum
    val ncells = counts.length.toLong
    counts.count(n => n * ncells * 10 > total * 11 || n * ncells * 100 < total * 85).toLong
  }

  test("sf0.01: trigger fires, epoch 1 is built, epoch 0 files are untouched bytes") {
    val ctx = SimilarityQueries.ivfRetrainBuildV0(spark, "/root/testdata/sf0.01")
    val before = snapshot(new File(s"${ctx.store}/v0"))
    assert(before.nonEmpty, "epoch-0 index was not written")
    val result = SimilarityQueries.ivfRetrainFinish(spark, ctx)
    val rows = result.served.collect()
    val after = snapshot(new File(s"${ctx.store}/v0"))
    assert(after === before,
      "retrain rewrote epoch-0 files — retired epochs must be read-only")
    assert(new File(s"${ctx.store}/v1").isDirectory,
      "trigger fired but no epoch-1 directory was built")
    // branch re-derivation from the stored index's own counts
    val flagged = flaggedFromStore(ctx.store)
    assert(flagged > 0, "fixture no longer trips the trigger at sf0.01")
    assert(rows.map(_.getLong(5)).distinct.toSeq === Seq(flagged))
    assert(rows.map(_.getLong(4)).distinct.toSeq === Seq(1L), "must serve epoch 1")

    // THE LOOP CONTINUES: after the retrain, a new increment appends
    // against the TRAINED quantizer into epoch 1 — O(batch), both
    // retired artifacts untouched — so retrain never interrupts the
    // steady-state ingest lane, it only moves which epoch absorbs it
    val trained = result.cents
    assert(result.epoch === 1L)
    assert(trained.nonEmpty, "retrain must have returned its quantizer")
    assert(trained.map(_._2.toSeq) !== ctx.seeds.map(_._2.toSeq),
      "epoch-1 quantizer must be the TRAINED one, not the seeds")
    val v1Before = snapshot(new File(s"${ctx.store}/v1"))
    val n1Before = spark.read.parquet(s"${ctx.store}/v1").count()
    import SharedSpark.spark.implicits._
    val batch = ctx.vq.limit(7).collect()
      .map(r => (r.getLong(0) + 10000000L, r.getSeq[Long](1))).toSeq
    SimilarityQueries.assignCellsL2(batch.toDF("vec_id", "vq"),
        SimilarityQueries.broadcastableCents(spark, trained))
      .write.mode("append").partitionBy("c_id").parquet(s"${ctx.store}/v1")
    assert(snapshot(new File(s"${ctx.store}/v0")) === before,
      "post-retrain append touched retired epoch 0")
    // data files only: the _SUCCESS job marker is legitimately refreshed
    // by the append job; the immutability contract is about row bytes
    val v1After = snapshot(new File(s"${ctx.store}/v1"))
    v1Before.filter(_._1.endsWith(".parquet")).foreach { case (path, attrs) =>
      assert(v1After.get(path) === Some(attrs),
        s"post-retrain append rewrote existing epoch-1 data file $path")
    }
    assert(spark.read.parquet(s"${ctx.store}/v1").count() === n1Before + batch.length,
      "epoch 1 must hold exactly the old rows plus the increment")
    Bench.cleanup(spark)
  }

  test("sf0.001: balanced index skips the rebuild entirely and serves epoch 0, pruned") {
    val ctx = SimilarityQueries.ivfRetrainBuildV0(spark, "/root/testdata/sf0.001")
    val result = SimilarityQueries.ivfRetrainFinish(spark, ctx)
    assert(result.epoch === 0L)
    assert(result.cents.map(_._1) === ctx.seeds.map(_._1),
      "no-op branch must keep serving the seed quantizer")
    val served = result.served
    val rows = served.collect()
    assert(flaggedFromStore(ctx.store) === 0L,
      "fixture unexpectedly trips the trigger at sf0.001")
    assert(!new File(s"${ctx.store}/v1").exists(),
      "no-op branch must not create an epoch-1 directory")
    assert(rows.map(_.getLong(4)).distinct.toSeq === Seq(0L), "must serve epoch 0")
    assert(rows.map(_.getLong(5)).distinct.toSeq === Seq(0L))
    // serving is partition-pruned to the probe cells on the serving
    // epoch — the serve is checkpointed (round-20 attribution sweep), so
    // the plan pin reads the registered pre-force frame
    val plan = graft.plans.AuditFrames.get("q_ivf_retrain_apply")
      .getOrElse(served).queryExecution.executedPlan.toString
    val indexScans = plan.linesIterator
      .filter(_.contains("graft-ivf-retrain")).mkString("\n")
    assert(indexScans.nonEmpty, s"index scan not found:\n${plan.take(3000)}")
    assert(indexScans.contains("PartitionFilters: [c_id"),
      s"no partition filter on the index scan:\n$indexScans")
    assert(indexScans.contains(" IN ("),
      s"probe cells not pushed as IN literals:\n$indexScans")
    Bench.cleanup(spark)
  }
}
