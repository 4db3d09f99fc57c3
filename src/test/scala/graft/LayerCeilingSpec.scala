package graft

import graft.queries.SimilarityQueries.GraphLayers

/** The oracle-ceiling guard for the layered graph index (round-19
  * verdict item 7): the engine derives its layer count ℓ UNBOUNDED
  * (layersFor), but the DuckDB oracle's per-layer CTEs are statically
  * unrolled to sqlMaxLayers and its derivation CASE clamps — a fixture
  * whose base count ever crossed the ceiling would make the two sides
  * diverge as an opaque hash mismatch. Two defenses, both pinned here:
  *
  *  1. the lane body `require`s ℓ ≤ sqlMaxLayers (fail-loud, naming the
  *     constant — exercised against a synthetic over-ceiling count);
  *  2. every gate fixture's derived ℓ sits UNDER the ceiling with
  *     headroom, so a fixture regeneration that approaches it is
  *     visible before it crosses.
  */
class LayerCeilingSpec extends SparkSpec {

  test("layersFor replays the oracle CASE arm-for-arm and clamps nowhere") {
    // arm boundaries: the smallest/largest n per layer, exactly the
    // oracle's `cnt // 16^j <= topBound` arms
    val top = GraphLayers.topBound.toLong
    assert(top > 0)
    (1 until GraphLayers.sqlMaxLayers).foreach { j =>
      val atBoundary = top * GraphLayers.pow16(j)
      assert(GraphLayers.layersFor(atBoundary) === j,
        s"n=$atBoundary should derive exactly $j layers")
      assert(GraphLayers.layersFor(atBoundary + GraphLayers.pow16(j)) === j + 1,
        s"one stride past the layer-$j boundary must derive ${j + 1}")
    }
    // the engine keeps deriving past the ORACLE'S ceiling — the clamp
    // lives only in the SQL text, which is why the lane-body require
    // exists
    val past = top * GraphLayers.pow16(GraphLayers.sqlMaxLayers + 1)
    assert(GraphLayers.layersFor(past) > GraphLayers.sqlMaxLayers)
  }

  test("every gate fixture derives ell under the oracle ceiling, with headroom") {
    val spark = SharedSpark.spark
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val n = Tables(spark, s"/root/testdata/$sf").embeddings
        .filter(org.apache.spark.sql.functions.col("vec_id") % 4 =!= 3)
        .count()
      val ell = GraphLayers.layersFor(n)
      assert(ell <= GraphLayers.sqlMaxLayers,
        s"$sf: ell=$ell exceeds the oracle's sqlMaxLayers=${GraphLayers.sqlMaxLayers} — " +
        "the lane would fail its own require; regenerate the oracle CTEs")
      // headroom: flag an approach one layer early, before the silent
      // clamp is even reachable
      assert(ell < GraphLayers.sqlMaxLayers,
        s"$sf: ell=$ell is AT the ceiling — raise sqlMaxLayers before the next fixture growth")
    }
    Bench.cleanup(spark)
  }

  test("the lane-body require names the ceiling on an over-ceiling corpus") {
    // layersFor on a count past the ceiling exceeds sqlMaxLayers — the
    // guard message must name the constant so a gate failure is
    // self-diagnosing (the lane's require re-checked here without
    // manufacturing a 67M-row fixture)
    val over = GraphLayers.pow16(GraphLayers.sqlMaxLayers + 2)
    val ell = GraphLayers.layersFor(over)
    val ex = intercept[IllegalArgumentException] {
      require(ell <= GraphLayers.sqlMaxLayers,
        s"fixture derives ell=$ell layers but the oracle text unrolls only " +
        s"sqlMaxLayers=${GraphLayers.sqlMaxLayers} (n=$over): regenerate the " +
        "oracle CTEs or raise the ceiling")
    }
    assert(ex.getMessage.contains("sqlMaxLayers"))
  }
}
