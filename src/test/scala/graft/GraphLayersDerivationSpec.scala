package graft

import graft.queries.SimilarityQueries.GraphLayers

/** Round-17 verdict lead item ("Done =" clause): pin that the Scala
  * layered-beam build and the generated oracle SQL derive the SAME layer
  * count ℓ (and top-layer stride p = 16^ℓ) from the base count — the
  * [[ProvisionDerivationSpec]] playbook applied to the layer dimension,
  * so the recursion depth can never drift between the two engines.
  *
  * The oracle text is DuckDB dialect; its only DuckDB-ism is `//`
  * integer division, shimmed here to Spark's `div` so the IDENTICAL CTE
  * text executes in Spark SQL (DuckDB-side execution of the very same
  * text rides every tri-SF run of the layered-beam oracle).
  */
class GraphLayersDerivationSpec extends SparkSpec {

  private def sqlDerived(n: Long): (Long, Long) = {
    spark.range(n).toDF("vec_id").createOrReplaceTempView("lprov_src")
    val cte = GraphLayers.lprmSql("lprov_src").replace("//", " div ")
    val r = spark.sql(
      s"WITH $cte SELECT CAST(l AS BIGINT), CAST(p AS BIGINT) FROM lprm").collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("oracle lprm CTE and Scala rule derive identical (layers, top stride) across the boundary Ns") {
    // 375 = sf0.001/sf0.01 base (ℓ=1, the single-layer base case);
    // 1024 = 64·16, the exact ℓ=1 boundary; 1040 = first ℓ=2 count;
    // 1500 = sf0.1 base and 4500 = the 3x-slice probe (both ℓ=2);
    // 16640 / 270000 push into ℓ=3 / ℓ=4 territory the fixtures never
    // reach, pinning the CASE ladder arm for arm
    Seq(375L, 1024L, 1040L, 1500L, 4500L, 16640L, 270000L).foreach { n =>
      val (l, p) = sqlDerived(n)
      assert(l === GraphLayers.layersFor(n).toLong,
        s"layer count diverged at n=$n: sql=$l scala=${GraphLayers.layersFor(n)}")
      assert(p === GraphLayers.pow16(GraphLayers.layersFor(n)),
        s"top stride diverged at n=$n: sql=$p")
    }
    Bench.cleanup(spark)
  }

  test("Scala derivation is unbounded and always caps the top layer at topBound") {
    // the SQL unroll stops at sqlMaxLayers (an oracle-text limitation,
    // documented with its 67M-row validity ceiling); the ENGINE rule
    // keeps deriving — at 10^11 vectors it asks for 8 layers
    assert(GraphLayers.layersFor(100_000_000_000L) === 8)
    // and for every n the derived top layer is within the all-pairs cap
    Seq(1L, 64L, 1024L, 1040L, 4500L, 16640L, 270000L,
        1_000_000L, 100_000_000_000L).foreach { n =>
      val l = GraphLayers.layersFor(n)
      assert(n / GraphLayers.pow16(l) <= GraphLayers.topBound.toLong,
        s"top layer over cap at n=$n (l=$l)")
      if (l > 1)
        assert(n / GraphLayers.pow16(l - 1) > GraphLayers.topBound.toLong,
          s"derived one layer more than needed at n=$n (l=$l)")
    }
  }
}
