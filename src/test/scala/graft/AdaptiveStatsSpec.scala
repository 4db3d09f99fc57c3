package graft

import org.apache.spark.sql.functions._

/** `q_ivf_label_stats` is the statistic the adaptive filtered-serving
  * branch reads in production. This spec pins the contract between
  * them: a label-only predicate's corpus cardinality is an EXACT sum
  * over the histogram (no scan needed), the ppm shares re-derive from
  * the row's own numbers, and the output stays O(cells × labels).
  */
class AdaptiveStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("the adaptive lanes' label-predicate counts are exact sums over the histogram") {
    val stats = SparkEntry.queries("q_ivf_label_stats")(spark, sf).persist()
    val v = Tables(spark, sf).embeddings
    // wide lane: label = 3
    val wideFromStats = stats.filter(col("label") === 3)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    val wideScan = v.filter(col("label") === 3).count()
    assert(wideFromStats === wideScan)
    // half lane: label % 2 = 1
    val halfFromStats = stats.filter(col("label") % 2 === 1)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    val halfScan = v.filter(col("label") % 2 === 1).count()
    assert(halfFromStats === halfScan)
    // and the threshold decision itself reproduces: at T=100 the wide
    // lane (43 at sf0.001) goes exact, the half lane (250) goes IVF —
    // the branch q_similarity_filtered_adaptive takes from its probe
    assert(wideFromStats <= 100L && halfFromStats > 100L)
    stats.unpersist()
    Bench.cleanup(spark)
  }

  test("ppm shares re-derive from the histogram's own counts; output is O(cells x labels)") {
    val stats = SparkEntry.queries("q_ivf_label_stats")(spark, sf).persist()
    val rows = stats.collect()
    val cells = rows.map(_.getLong(0)).distinct
    assert(cells.length === graft.queries.SimilarityQueries.IvfProvision
      .cellsFor(Tables(spark, sf).embeddings.count()))
    assert(rows.length <= cells.length * 10) // 10 labels in the fixture
    // per cell, members sum back and each ppm equals n*1e6 div n_cell
    val byCell = rows.groupBy(_.getLong(0))
    byCell.foreach { case (_, rs) =>
      val nCell = rs.map(_.getLong(2)).sum
      rs.foreach { r =>
        assert(r.getLong(3) === r.getLong(2) * 1000000L / nCell)
      }
    }
    // every corpus vector is counted exactly once
    assert(rows.map(_.getLong(2)).sum ===
      Tables(spark, sf).embeddings.count())
    stats.unpersist()
    Bench.cleanup(spark)
  }
}
