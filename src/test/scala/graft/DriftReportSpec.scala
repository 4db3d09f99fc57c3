package graft

import org.apache.spark.sql.functions._

/** q_drift_report sensitivity contract, on planted frames the stationary
  * fixture can't exercise: an exact known shift must produce the exact
  * integer TV distance, identical slices must read zero, and
  * current-side range excursions must clamp into the reference-derived
  * edge bins instead of inventing new ones.
  */
class DriftReportSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  private def report(rows: Seq[(Long, String, Double)]) =
    graft.queries.AnalyticsQueries.driftReport(
      rows.toDF("day", "event_type", "value"))

  test("planted categorical shift yields the exact TV ppm; constant value column reads zero") {
    // ref (day 0): 10×a; cur (day 2, mid=1): 5×a + 5×b
    // p_ref = {a:1.0}, p_cur = {a:0.5, b:0.5} → TV = (0.5 + 0.5)/2 = 500000 ppm
    val rows = (1 to 10).map(_ => (0L, "a", 1.0)) ++
      (1 to 5).map(_ => (2L, "a", 1.0)) ++ (1 to 5).map(_ => (2L, "b", 1.0))
    val out = report(rows).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    Bench.cleanup(spark)
    assert(out(("event_type", "a")) === ((1000000L, 500000L, 500000L)))
    assert(out(("event_type", "b")) === ((0L, 500000L, 500000L)))
    // value is constant → hi == lo → everything in b0, zero drift
    assert(out(("value", "b0")) === ((1000000L, 1000000L, 0L)))
    assert(!out.keySet.exists(k => k._1 == "value" && k._2 != "b0"))
  }

  test("identical slices read zero drift on both monitors") {
    val side = (1 to 20).map(i => ("ev" + (i % 3), 1.0 + (i % 5)))
    val rows = side.map { case (t, v) => (0L, t, v) } ++
      side.map { case (t, v) => (2L, t, v) }
    val out = report(rows).collect()
    Bench.cleanup(spark)
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(5) === 0L, s"${r.getString(0)}/${r.getString(1)}: nonzero tv")
      assert(r.getLong(4) === 0L, s"${r.getString(0)}/${r.getString(1)}: nonzero diff")
    }
  }

  test("current-side range excursions clamp into the reference edge bins") {
    // ref values span [0, 10]; cur contains -100 and +100 → b0 / b9
    val rows = (0 to 10).map(i => (0L, "a", i.toDouble)) ++
      Seq((2L, "a", -100.0), (2L, "a", 100.0), (2L, "a", 5.0))
    val bins = report(rows).filter(col("col") === "value")
      .select("bin").collect().map(_.getString(0)).toSet
    Bench.cleanup(spark)
    assert(bins.subsetOf((0 to 9).map("b" + _).toSet),
      s"out-of-range bins invented: $bins")
    assert(bins.contains("b0") && bins.contains("b9"))
  }
}
