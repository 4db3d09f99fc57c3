package graft

/** q_hybrid_retrieval behavioral contract:
  *  - the fused score is exactly the integer RRF fold over the row's own
  *    per-arm ranks (re-derived here, so a k-constant or scale drift in
  *    either the query or its oracle becomes a named failure);
  *  - the lexical ranks agree with q_bm25's own top-10 ordering — the
  *    shared-scorer guarantee, asserted end to end;
  *  - the fixture exercises the property RRF exists for: at least one
  *    document surfaces in BOTH arms, and every dual-arm document
  *    outranks every single-arm document whose single rank is no better
  *    than both of its ranks.
  */
class HybridRetrievalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("rrf_q == integer fold of the row's own ranks; lexical arm == q_bm25") {
    val rows = SparkEntry.queries("q_hybrid_retrieval")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 10)
    rows.foreach { case (doc, rl, rv, rrf) =>
      val expected = (if (rl > 0) 1000000000L / (60 + rl) else 0L) +
        (if (rv > 0) 1000000000L / (60 + rv) else 0L)
      assert(rrf === expected, s"doc $doc rrf drifted")
    }
    val bm25Order = SparkEntry.queries("q_bm25")(spark, sf)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (d, i) => d -> (i + 1L) }.toMap
    rows.filter(_._2 > 0).foreach { case (doc, rl, _, _) =>
      assert(bm25Order.get(doc) === Some(rl),
        s"doc $doc lexical rank drifted from q_bm25's ordering")
    }
  }

  test("dual-arm documents exist and dominate comparable single-arm ones") {
    val rows = SparkEntry.queries("q_hybrid_retrieval")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val dual = rows.filter(r => r._2 > 0 && r._3 > 0)
    assert(dual.nonEmpty, "fixture must surface at least one dual-arm document")
    val single = rows.filter(r => (r._2 > 0) != (r._3 > 0))
    for {
      (dd, drl, drv, drrf) <- dual
      (sd, srl, srv, srrf) <- single
      if math.max(srl, srv) >= math.max(drl, drv)
    } assert(drrf > srrf,
      s"dual-arm doc $dd must outrank single-arm doc $sd")
    Bench.cleanup(spark)
  }

  test("incremental hybrid: same fusion contract off the maintained stores") {
    val rows = SparkEntry.queries("q_hybrid_incremental")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 10)
    rows.foreach { case (doc, rl, rv, rrf) =>
      val expected = (if (rl > 0) 1000000000L / (60 + rl) else 0L) +
        (if (rv > 0) 1000000000L / (60 + rv) else 0L)
      assert(rrf === expected, s"doc $doc rrf drifted")
    }
    // the lexical arm must be q_bm25_incremental's own top-10 order —
    // which Bm25IncrementalSpec already pins to the one-shot scorer, so
    // this closes the chain: incremental hybrid == fused one-shot arms
    val lexOrder = SparkEntry.queries("q_bm25_incremental")(spark, sf)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (d, i) => d -> (i + 1L) }.toMap
    rows.filter(_._2 > 0).foreach { case (doc, rl, _, _) =>
      assert(lexOrder.get(doc) === Some(rl),
        s"doc $doc lexical rank drifted from q_bm25_incremental's ordering")
    }
    Bench.cleanup(spark)
  }
}
