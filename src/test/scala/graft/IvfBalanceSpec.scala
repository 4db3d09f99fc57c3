package graft

/** q_ivf_balance behavioral contract: the status flag must be exactly the
  * integer cross-multiplication over the report's OWN numbers — an
  * independent re-derivation (total and cell count are themselves
  * recoverable from the output), so a threshold drift in either the query
  * or its oracle fails here by name before the hash gate.
  */
class IvfBalanceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("status == integer balance rule over the report's own numbers; report partitions the corpus") {
    val rows = SparkEntry.queries("q_ivf_balance")(spark, sf)
      .select("c_id", "n_members", "batch_ppm", "mean_cos_ppm", "status")
      .collect()
    Bench.cleanup(spark)
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    val ncells = rows.length.toLong
    rows.foreach { r =>
      val n = r.getLong(1)
      val expected =
        if (n * ncells * 10 > total * 11) "hot"
        else if (n * ncells * 100 < total * 85) "cold"
        else "ok"
      assert(r.getString(4) === expected, s"cell ${r.getLong(0)}")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000000, "batch_ppm out of range")
      // cosine to a frozen centroid is legitimately negative — the only
      // contract is the cosine range itself
      assert(r.getLong(3) >= -1000000 && r.getLong(3) <= 1000000,
        "mean_cos_ppm outside the cosine range")
    }
    // every corpus vector is in exactly one cell
    assert(total === Tables(spark, sf).embeddings.count())
  }
}
