package graft

/** The k-means convergence loop's path contract: below the size threshold
  * the loop runs driver-local, above it as per-round Spark jobs — and
  * because every operation is integer micro fixed point (commutative
  * sums, truncating division, c_id tie-breaks), the two paths must be
  * BIT-IDENTICAL, not approximately equal. Also pins the termination
  * rule: eps sits above the integer-Lloyd limit-cycle amplitude, so the
  * loop converges instead of spinning to the round cap.
  */
class KmeansConvergeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("local and distributed paths produce identical rows and round counts") {
    val local = graft.queries.SimilarityQueries
      .kmeansConvergeFrame(spark, sf, 5000L, 40)
      .collect().map(_.toString).sorted.toSeq
    val dist = graft.queries.SimilarityQueries
      .kmeansConvergeFrame(spark, sf, 5000L, 40, localThreshold = 0L)
      .collect().map(_.toString).sorted.toSeq
    assert(dist === local)
    assert(local.nonEmpty)
  }

  test("every fixture converges strictly below the oracle's unroll cap") {
    // The oracle derives n_rounds IN SQL (first stage whose max move
    // drops under eps) from kmMaxUnrolledRounds unrolled stages, so it
    // is SF-independent — no more per-SF measured constant. What remains
    // to guard is the CAP: a regenerated fixture that converges slower
    // than the unroll headroom would silently flip both sides into the
    // stop-at-cap regime (still hash-equal, but no longer a converged
    // quantizer). Name that drift here before it becomes invisible.
    val cap = graft.queries.SimilarityQueries.kmMaxUnrolledRounds
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val rounds = graft.queries.SimilarityQueries
        .kmeansConvergeFrame(spark, s"/root/testdata/$sf", 5000L, cap)
        .collect().head.getLong(2)
      assert(rounds < cap,
        s"\n$sf now needs >= $rounds rounds against an unroll cap of " +
          s"$cap — the fixture was probably regenerated; raise " +
          "SimilarityQueries.kmMaxUnrolledRounds (both sides stop at the " +
          "cap, so results still match, but the quantizer is no longer " +
          "converged).")
    }
    Bench.cleanup(spark)
  }

  test("terminates well inside the round cap and reports consistent totals") {
    val rows = graft.queries.SimilarityQueries
      .kmeansConvergeFrame(spark, sf, 5000L, 40)
      .collect()
    val rounds = rows.head.getLong(2)
    assert(rounds < 40, s"hit the round cap: $rounds")
    assert(rows.map(_.getLong(2)).distinct.length === 1)
    // every vector lands in exactly one cluster
    val members = rows.map(_.getLong(1)).sum
    val n = Tables(spark, sf).embeddings.count()
    assert(members === n, s"member counts $members != corpus $n")
    Bench.cleanup(spark)
  }
}
