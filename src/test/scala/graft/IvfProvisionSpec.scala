package graft

import org.apache.spark.sql.functions._

import graft.queries.{DriverLocalGate, SimilarityQueries}

/** The bounded-K provisioning contract for the stored / incremental /
  * retrain / streaming IVF family (round-12 verdict lead item):
  *
  *  - K IS A BOUND, NOT A RATE: the strided seed rule yields exactly the
  *    provisioned cell count at EVERY fixture SF — the old `%100`/`%251`
  *    rules grew the cell count (and with it the build-step driver
  *    collect, the centroid broadcast, and the O(N·K) assignment) in
  *    proportion to the corpus.
  *  - BASE-DERIVABLE: every seed of the base-strided rule is ≡ 0 (mod 4),
  *    so the incremental lane's frozen quantizer never depends on the
  *    `vec_id % 4 = 3` batch slice.
  *  - ORACLE-PARITY GUARD (round-12 ADVICE): the retrain trainer samples
  *    at a DriverLocalGate-derived stride while its oracle trains on the
  *    full corpus; parity holds exactly when the gate stride is 1, i.e.
  *    while every fixture corpus fits under maxLocalVectors. Pin that
  *    here so a fixture regeneration that crosses the gate becomes a
  *    NAMED failure instead of an opaque oracle hash mismatch.
  */
class IvfProvisionSpec extends SparkSpec {

  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  test("seed rule yields exactly the DERIVED K cells at every fixture SF") {
    sfs.foreach { dir =>
      val v = Tables(spark, dir).embeddings.select(col("vec_id"))
      val kFull = SimilarityQueries.IvfProvision.cellsFor(v.count())
      val full = SimilarityQueries.IvfProvision.seeds(v).collect().map(_.getLong(0))
      assert(full.length === kFull, s"full-corpus seeds at $dir")
      val base = v.filter(col("vec_id") % 4 =!= 3)
      val kBase = SimilarityQueries.IvfProvision.cellsFor(base.count())
      val baseSeeds = SimilarityQueries.IvfProvision.seeds(base).collect().map(_.getLong(0))
      assert(baseSeeds.length === kBase, s"base-slice seeds at $dir")
      assert(baseSeeds.forall(_ % 4 === 0),
        s"a base-rule seed fell in the batch slice at $dir: ${baseSeeds.mkString(",")}")
    }
    // the derivation boundary is EXERCISED by the fixtures: sf0.001/
    // sf0.01 (n=500) sit on the floor — byte-identical seed sets to the
    // static-K era — while sf0.1 (n=2000) derives past it, so the tri-SF
    // gate replays both branches of the clamp
    assert(SimilarityQueries.IvfProvision.cellsFor(500L) ===
      SimilarityQueries.IvfProvision.cells, "sf0.001/sf0.01 must sit on the floor")
    assert(SimilarityQueries.IvfProvision.cellsFor(2000L) >
      SimilarityQueries.IvfProvision.cells, "sf0.1 must exercise the derived branch")
  }

  test("seed count stays at the derived K at any corpus size (pure stride arithmetic)") {
    // the scale claim itself: ids satisfying (id % s == 0 && id < s*K)
    // number exactly K for every n >= 4K, no matter how large — and K
    // itself never exceeds the cap (the centroid collect stays bounded)
    Seq(20L, 500L, 2000L, 1000000L, 100000000000L).foreach { n =>
      val s = SimilarityQueries.IvfProvision.stride(n)
      val k = SimilarityQueries.IvfProvision.cellsFor(n)
      assert(k <= SimilarityQueries.IvfProvision.maxCells, s"K above cap at n=$n")
      assert(s % 4 === 0, s"stride must stay a multiple of 4 at n=$n")
      // count directly only for enumerable n; arithmetic bound otherwise
      if (n <= 2000000L)
        assert((0L until n).count(id => id % s == 0 && id < s * k) === k, s"n=$n")
      assert((k - 1) * s < n, s"last seed must exist in the corpus at n=$n")
    }
  }

  test("every fixture corpus sits under the DriverLocalGate stride-1 boundary") {
    sfs.foreach { dir =>
      val n = Tables(spark, dir).embeddings.count()
      assert(n <= DriverLocalGate.maxLocalVectors,
        s"$dir has $n vectors > maxLocalVectors=${DriverLocalGate.maxLocalVectors}: " +
          "the retrain trainer's sample stride exceeds 1 and the " +
          "q_ivf_retrain_apply oracle (full-corpus Lloyd) no longer " +
          "replays the engine exactly — regenerate the oracle strategy " +
          "before regenerating fixtures this large")
    }
  }
}
