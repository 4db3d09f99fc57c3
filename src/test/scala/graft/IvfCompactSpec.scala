package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** The index-compaction contract (`q_similarity_ivf_compact`): the
  * fragmented store really is fragmented (appends multiplied per-cell
  * file counts), the compacted epoch is exactly one file per cell, the
  * rewrite is layout-only (reads the store, never the embeddings), the
  * row multiset is preserved, and serving over either layout is
  * bit-identical.
  */
class IvfCompactSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def cellFiles(root: String): Map[String, Int] =
    new File(root).listFiles().filter(_.isDirectory)
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
      .toMap

  test("compaction: fragmented cells hold many files, compacted cells exactly one") {
    val (fragPath, compPath, rewritePlan, served, _) =
      SimilarityQueries.ivfCompactServe(spark, sf)
    served.collect() // seal the lazy tail so both stores are final
    val frag = cellFiles(fragPath)
    val comp = cellFiles(compPath)
    // same cell directories exist on both sides
    assert(frag.keySet === comp.keySet)
    // the manufacture step really fragmented: 1 base + 3 appends → ≥ 2
    // files in every cell that received batch rows, > cells total files
    assert(frag.values.sum > frag.size,
      s"fragmentation did not manufacture: $frag")
    assert(frag.values.max >= 2)
    // the whole point: exactly one file per cell after compaction
    assert(comp.values.forall(_ == 1), s"compacted cells not single-file: $comp")

    // layout-only: the rewrite plan reads the STORE, never the source
    assert(rewritePlan.contains("graft-ivf-frag-index"))
    assert(!rewritePlan.contains("embeddings.parquet"),
      "compaction must not recompute assignments from the source table")

    // row multiset identity across layouts
    val a = spark.read.parquet(fragPath)
      .select(col("vec_id"), col("c_id").cast("long").as("c_id"))
    val b = spark.read.parquet(compPath)
      .select(col("vec_id"), col("c_id").cast("long").as("c_id"))
    assert(a.count() === b.count())
    assert(a.exceptAll(b).count() === 0L)
    Bench.cleanup(spark)
  }

  test("serving over the compacted epoch equals serving over the fragmented store") {
    val (fragPath, _, _, servedComp, _) = SimilarityQueries.ivfCompactServe(spark, sf)
    val v = Tables(spark, sf).embeddings
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("nrm", sqrt(aggregate(transform(col("e"), x => x * x),
        lit(0.0), (a, x) => a + x)))
    val cents = SimilarityQueries.IvfProvision.seeds(v.filter(col("vec_id") % 4 =!= 3))
      .select(col("vec_id").as("c_id"), col("e").as("ce"))
    val servedFrag = SimilarityQueries.serveStoredIndex(spark, v, cents, fragPath)
    val x = servedComp.collect().map(_.toString).sorted.toSeq
    val y = servedFrag.collect().map(_.toString).sorted.toSeq
    assert(x === y)
    assert(x.nonEmpty)
    Bench.cleanup(spark)
  }

  test("the compacted serving scan keeps its probe-cell partition filters") {
    val (_, _, _, served, _) = SimilarityQueries.ivfCompactServe(spark, sf)
    val plan = served.queryExecution.executedPlan.toString
    val indexScans = plan.linesIterator
      .filter(_.contains("graft-ivf-compact-epoch"))
      .mkString("\n")
    assert(indexScans.nonEmpty, s"compacted scan not found:\n${plan.take(2000)}")
    assert(indexScans.contains("PartitionFilters: [c_id"),
      s"no probe-cell partition filter on the compacted scan:\n$indexScans")
    Bench.cleanup(spark)
  }
}
