package graft

import graft.queries.SimilarityQueries.IvfProvision

/** Round-17 verdict lead item ("Done =" clause): pin that the Scala
  * build lanes and the generated oracle SQL derive the SAME cell count K
  * and stride s from a seed-source count, at MORE THAN ONE corpus size —
  * so the derived-provisioning arithmetic (ceil-div, FP-sqrt ±1 integer
  * correction, clamp, stride) can never drift between the two engines.
  *
  * The oracle text is DuckDB dialect; its only DuckDB-ism is `//`
  * integer division, shimmed here to Spark's `div` so the IDENTICAL CTE
  * text executes in Spark SQL. (DuckDB-side execution of the very same
  * text is exercised by the tri-SF gate on every graph/IVF oracle — this
  * spec closes the remaining gap, that both engines agree on the
  * arithmetic itself at Ns the fixtures don't reach.)
  */
class ProvisionDerivationSpec extends SparkSpec {

  private def sqlDerived(n: Long): (Long, Long) = {
    spark.range(n).toDF("vec_id").createOrReplaceTempView("prov_src")
    val cte = IvfProvision.prmSql("prov_src").replace("//", " div ")
    val r = spark.sql(s"WITH $cte SELECT k, s FROM cprm").collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("oracle cprm CTE and Scala rule derive identical (K, stride) at two different Ns") {
    // 500 = the floor branch (sf0.001/sf0.01 size); 2000 = the derived
    // branch (sf0.1); 6000 = the 3x-slice probe; the rest are off-fixture
    // sizes including exact-square and square±1 boundaries where the FP
    // sqrt correction matters (32·49² = 78368 ⇒ K=49 exactly)
    Seq(500L, 2000L, 6000L, 78367L, 78368L, 78369L, 123457L).foreach { n =>
      val (k, s) = sqlDerived(n)
      assert(k === IvfProvision.cellsFor(n).toLong,
        s"K diverged at n=$n: sql=$k scala=${IvfProvision.cellsFor(n)}")
      assert(s === IvfProvision.stride(n),
        s"stride diverged at n=$n: sql=$s scala=${IvfProvision.stride(n)}")
    }
    Bench.cleanup(spark)
  }

  test("derivation respects a base-slice predicate in the FROM relation") {
    // the incremental lanes derive K from the BASE count; the oracle
    // passes "n WHERE vec_id % 4 <> 3" as the relation — same text path
    spark.range(2000L).toDF("vec_id").createOrReplaceTempView("prov_src")
    val cte = IvfProvision
      .prmSql("prov_src WHERE vec_id % 4 <> 3").replace("//", " div ")
    val r = spark.sql(s"WITH $cte SELECT k, s FROM cprm").collect()(0)
    assert(r.getLong(0) === IvfProvision.cellsFor(1500L).toLong)
    assert(r.getLong(1) === IvfProvision.stride(1500L))
    Bench.cleanup(spark)
  }
}
