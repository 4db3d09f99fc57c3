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

  test("oracle round-count constant matches the sf0.01 fixture it is valid for") {
    // kmConvergeRounds is SCALE-DEPENDENT (8 @ sf0.001, 7 @ sf0.01,
    // 10 @ sf0.1) and the driver's gate runs at sf0.01 — if the driver
    // regenerates fixtures and the trajectory shifts, the oracle would
    // fail as an opaque hash mismatch. This test names the cause first.
    val rounds = graft.queries.SimilarityQueries
      .kmeansConvergeFrame(spark, "/root/testdata/sf0.01",
        5000L, 40)
      .collect().head.getLong(2)
    assert(rounds === graft.queries.SimilarityQueries.kmConvergeRounds.toLong,
      s"\nsf0.01 fixture now converges in $rounds rounds but the DuckDB " +
        s"oracle unrolls kmConvergeRounds = " +
        s"${graft.queries.SimilarityQueries.kmConvergeRounds} stages — " +
        "the fixture was probably regenerated; update " +
        "SimilarityQueries.kmConvergeRounds to the new measured count.")
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
