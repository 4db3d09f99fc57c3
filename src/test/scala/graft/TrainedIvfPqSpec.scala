package graft

/** q_ann_recall_ivfpq_trained invariants, pinned at sf0.001.
  *
  * The load-bearing one is the CEILING EQUALITY: on the clustered fixture
  * with K ≈ #modes coarse cells (seed mod 29), per-query composed recall
  * equals the PQ-only recall of the same codebook
  * (q_ann_recall_pq_trained) for BOTH arms — i.e. the cell layer prunes
  * candidates without costing a single true neighbor, so the ADC stage is
  * the binding fidelity constraint. Measured to hold at sf0.001, sf0.01
  * and sf0.1; this spec re-measures the sf0.001 case so a regression in
  * either the cell assignment, the probe logic, or the shared PQ helpers
  * breaks a NAMED invariant instead of an opaque oracle hash.
  */
class TrainedIvfPqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("composed recall == PQ-only ceiling per query, both arms (cells prune recall-free)") {
    val composed = SparkEntry.queries("q_ann_recall_ivfpq_trained")(spark, sf)
      .select("q_id", "s_hit", "t_hit").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ceiling = SparkEntry.queries("q_ann_recall_pq_trained")(spark, sf)
      .select("q_id", "n_hit_standin", "n_hit_trained").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    Bench.cleanup(spark)
    assert(composed.keySet === ceiling.keySet)
    assert(composed.size === 8)
    composed.foreach { case (q, (sHit, tHit)) =>
      assert((sHit, tHit) === ceiling(q),
        s"q_id=$q: composed hits ${(sHit, tHit)} != PQ-only ceiling ${ceiling(q)} — " +
          "cell pruning dropped (or hallucinated) a true neighbor; if the fixture " +
          "changed, re-measure whether the ceiling equality still holds at all SFs")
    }
  }

  test("oracle validity: the coarse trainer's driver stride is 1 at every fixture SF") {
    // q_ann_recall_ivf_trained and q_ann_recall_ivfpq_trained train on a
    // DriverLocalGate-strided sample, but their oracles train on EVERY
    // corpus row — the two agree only while the stride is 1. A fixture
    // regeneration that grows embeddings past the gate would otherwise
    // fail the driver gate as an opaque hash mismatch; this turns it
    // into a named failure pointing at the scaladoc'd divergence.
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val n = Tables(spark, sf).embeddings.count()
      assert(n <= graft.queries.DriverLocalGate.maxLocalVectors,
        s"$sf has $n vectors > DriverLocalGate.maxLocalVectors " +
          s"(${graft.queries.DriverLocalGate.maxLocalVectors}): the trained-ANN " +
          "queries now train on a stride sample while their oracles train on the " +
          "full corpus — re-derive the oracle (or stride it identically) before " +
          "trusting the hash gate for q_ann_recall_ivf_trained / q_ann_recall_ivfpq_trained")
    }
  }

  test("cell layer actually prunes: every arm's candidate set is well under the corpus") {
    val n = Tables(spark, sf).embeddings.count()
    val rows = SparkEntry.queries("q_ann_recall_ivfpq_trained")(spark, sf)
      .select("q_id", "s_cand", "t_cand").collect()
    Bench.cleanup(spark)
    rows.foreach { r =>
      assert(r.getLong(1) < (n - 1) / 2 && r.getLong(2) < (n - 1) / 2,
        s"q_id=${r.getLong(0)}: candidates ${(r.getLong(1), r.getLong(2))} not pruned " +
          s"vs corpus $n — probe-2 over K≈#modes cells should cut most of the corpus")
    }
  }
}
