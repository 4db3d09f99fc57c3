package graft

import org.apache.spark.sql.functions._

/** q_ann_recall_graph contract: the graph candidate set is a superset of
  * probe-1 (recall can only rise), the measured uplift is pinned, and the
  * expansion frontier respects its L·M·(1+M) serving bound — the constant
  * that makes graph expansion O(1) per query where probe-2 pays a second
  * cell scan. */
class GraphRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val out =
    SparkEntry.queries("q_ann_recall_graph")(spark, dir).cache()

  test("graph candidates are a superset of probe-1: recall_g >= recall_p1 per query") {
    assert(out.count() === 8L)
    assert(out.filter(col("n_hit_g") < col("n_hit_p1")).isEmpty,
      "graph candidate set lost a probe-1 hit — not a superset")
    assert(out.filter(col("n_cand_g") < col("n_cand_p1")).isEmpty)
  }

  test("measured uplift at sf0.001 is pinned: 18 -> 34 of 40 exact hits") {
    val (p1, g) = out
      .agg(sum(col("n_hit_p1")), sum(col("n_hit_g"))).collect().head match {
        case r => (r.getLong(0), r.getLong(1))
      }
    assert(p1 === 18L, s"probe-1 hits moved ($p1) — re-pin SCALING.md")
    assert(g === 34L, s"graph hits moved ($g) — re-pin SCALING.md")
  }

  test("expansion frontier respects the L*M*(1+M) = 360 per-query bound") {
    val badBound = out
      .filter(col("n_cand_g") - col("n_cand_p1") > lit(360L))
    assert(badBound.isEmpty,
      "a query's expansion exceeded the documented constant serving bound")
  }
}
