package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** The stored-index incremental-dedup contract, both halves:
  *
  *  1. PLAN: the candidate join reads the index band table straight off
  *     its co-located buckets — ZERO ShuffleExchange on the index side of
  *     the join. Bucketing is the index's exchange, paid once at write
  *     time by the full-corpus pass; per increment only the batch bands
  *     move. This is the claim q_dedup_incremental's scaladoc makes about
  *     100-TB operation, pinned here as plan structure instead of prose.
  *  2. RESULT: storage layout is semantically invisible — the stored
  *     variant's (doc_batch, dup_of, jac) output is bit-for-bit the
  *     in-memory variant's.
  */
class StoredIndexDedupSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  private def corpus = {
    val d = Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("doc_id"), col("lang"), col("text"))
    d.unionByName(d.select(
      (col("doc_id") + 1000000L).as("doc_id"), col("lang"),
      concat_ws(" ", filter(split(col("text"), " "), (_, i) => i % 7 =!= 0)).as("text")))
  }

  /** Pre-order traversal that descends through AQE stage boundaries
    * (QueryStageExec is a leaf whose real plan hangs off a field) — plain
    * `collect` stops at them and misses everything inside a stage. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case o                        => o.children
    }
    p +: kids.flatMap(flatten)
  }

  private def hasBucketedScan(p: SparkPlan): Boolean =
    flatten(p).exists {
      case s: FileSourceScanExec => s.relation.bucketSpec.isDefined
      case _                     => false
    }

  test("candidate join has zero exchange on the stored-index side") {
    val out = graft.queries.DedupQueries
      .incrementalDedupStored(spark, corpus, 1000000L, 0.3)
    out.collect() // finalize AQE so the executed plan is the real one
    val all = flatten(out.queryExecution.executedPlan)
    val plan = out.queryExecution.executedPlan.toString
    // the index side must come off the bucketed table scan
    assert(plan.contains("SelectedBucketsCount"), plan.take(4000))
    // find the band join: the SMJ whose subtree holds the bucketed scan
    val bandJoins = all.filter(j =>
      j.nodeName.contains("SortMergeJoin") && hasBucketedScan(j))
    assert(bandJoins.nonEmpty, s"no SMJ over the bucketed index scan:\n${plan.take(4000)}")
    bandJoins.foreach { j =>
      // the child whose subtree contains the bucketed scan is the index
      // side; it must contain NO shuffle — the bucket layout satisfies
      // the join's required distribution directly
      val idxSides = j.children.filter(hasBucketedScan)
      assert(idxSides.nonEmpty, plan.take(4000))
      idxSides.foreach { side =>
        val shuffles = flatten(side).collect { case s: ShuffleExchangeExec => s }
        assert(shuffles.isEmpty,
          s"index side of the band join must not reshuffle:\n${plan.take(4000)}")
      }
      // and the batch side DOES move to the bucket layout — that shuffle
      // is the whole per-increment cost
      val batSides = j.children.filterNot(hasBucketedScan)
      assert(batSides.exists(s =>
        flatten(s).exists(_.isInstanceOf[ShuffleExchangeExec])),
        s"batch side should shuffle to the bucket layout:\n${plan.take(4000)}")
    }
  }

  test("stored variant returns bit-for-bit the in-memory variant's result") {
    val mem = graft.queries.DedupQueries
      .incrementalDedup(corpus, 1000000L, 0.3)
      .collect().map(_.toString).sorted.toSeq
    val stored = graft.queries.DedupQueries
      .incrementalDedupStored(spark, corpus, 1000000L, 0.3)
      .collect().map(_.toString).sorted.toSeq
    assert(stored === mem)
    assert(mem.nonEmpty, "fixture must produce at least one planted near-dup")
  }

  test("cross-set-only property holds for the stored variant too") {
    val text = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val docs = Seq(
      (1L, "en", text),
      (2L, "en", text), // intra-index dup — must not surface
      (100L, "en", text + " tail"),
      (101L, "en", "unrelated batch text that matches nothing in the index at all today ok"),
      (102L, "en", "unrelated batch text that matches nothing in the index at all today ok")
    ).toDF("doc_id", "lang", "text")
    val out = graft.queries.DedupQueries
      .incrementalDedupStored(spark, docs, 100L, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((100L, 1L), (100L, 2L)))
  }
}
