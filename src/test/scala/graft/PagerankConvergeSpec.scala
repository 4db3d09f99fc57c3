package graft

import org.apache.spark.sql.functions._

/** The convergence LOOP contract of pagerankConverge, on a graph small
  * enough to solve by hand: the undirected star K(1,4) (hub 0, leaves
  * 1..4). With damping d and pr = (1-d) + d·Σ inbound, the fixpoint
  * solves h = (1-d) + d·n·leaf, leaf = (1-d) + d·h/n; at d = 0.5, n = 4
  * that is hub = 2.0, leaf = 0.75 exactly (fixed-point nano arithmetic
  * lands within integer-floor distance of it). The spec pins: the loop
  * reaches that fixpoint within eps, reports a deterministic round
  * count, and respects the maxRounds bound.
  */
class PagerankConvergeSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  private def star = {
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("a", "b")
    e.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
  }

  test("star graph converges to the closed-form fixpoint") {
    val (ranks, rounds) = graft.queries.AnalyticsQueries
      .pagerankConverge(spark, star, 1000000L, 60)
    val got = ranks.collect().map(r => r.getLong(0) -> r.getLong(1) / 1e9).toMap
    assert(math.abs(got(0L) - 2.0) < 2e-3, s"hub rank ${got(0L)}")
    (1L to 4L).foreach { l =>
      assert(math.abs(got(l) - 0.75) < 2e-3, s"leaf $l rank ${got(l)}")
    }
    // deltas shrink geometrically at the damping rate; from |Δ|≈1 to 1e-3
    // takes ~10 halvings — the loop must neither stop early (ranks would
    // be off) nor spin past the bound
    assert(rounds >= 5 && rounds <= 20, s"round count $rounds")
    // determinism: same fixture, same count (integer sums commute; the
    // convergence metric is an order-free max)
    val (_, rounds2) = graft.queries.AnalyticsQueries
      .pagerankConverge(spark, star, 1000000L, 60)
    assert(rounds2 === rounds)
  }

  test("local and distributed paths are bit-identical: same ranks, same round count") {
    // forcing localThreshold = 0 sends the same graph down the
    // distributed loop; commutative integer arithmetic makes the two
    // paths EQUAL, not approximately equal
    val (lr, lRounds) = graft.queries.AnalyticsQueries
      .pagerankConverge(spark, star, 1000000L, 60)
    val (dr, dRounds) = graft.queries.AnalyticsQueries
      .pagerankConverge(spark, star, 1000000L, 60, localThreshold = 0L)
    assert(dRounds === lRounds)
    val lm = lr.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dm = dr.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dm === lm)
  }

  test("maxRounds bounds the loop even when eps is unreachable") {
    val (ranks, rounds) = graft.queries.AnalyticsQueries
      .pagerankConverge(spark, star, 0L, 7)
    assert(rounds === 7)
    assert(ranks.count() === 5)
  }
}
