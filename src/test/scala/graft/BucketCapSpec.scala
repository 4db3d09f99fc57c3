package graft

import org.apache.spark.sql.functions._

import graft.queries.{DedupQueries, MultimodalQueries}

/** The banded-dedup bucket-cap contract (round-12 verdict item): a
  * DEGENERATE bucket — a flat-image class collapsing into one all-zeros
  * band value, a boilerplate span shared corpus-wide — must cost at most
  * cap²/2 pairs and never materialize the whole bucket, instead of the
  * uncapped O(bucket²) pair bomb / single-collect_list-row memory cliff.
  * The keep rule is deterministic (lowest doc_ids) and both engines
  * replay it, so capping is a semantics the oracle shares, not a
  * silent truncation.
  */
class BucketCapSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  private val cap = DedupQueries.bandBucketCap

  test("phash: a flat-image class wider than the cap is capped at its lowest doc_ids") {
    val n = cap + 36
    // a perfectly flat corpus: every dHash bit 0, all four bands 0 —
    // one bucket of n docs per band index
    val hashes = (0 until n).map(i => (i.toLong * 10, 0, 0, 0, 0))
      .toDF("doc_id", "b0", "b1", "b2", "b3")
    val pairs = MultimodalQueries.phashPairs(hashes, maxHamming = 6).collect()
    assert(pairs.length === cap * (cap - 1) / 2,
      s"expected C($cap,2) capped pairs, got ${pairs.length}")
    // the cap's measured saving on this degenerate class (SCALING.md's
    // bucket-cap table): uncapped would pair the whole bucket —
    // C(n,2) = 4950 distinct pairs (4·C(n,2) = 19800 band emissions);
    // capped emits 4·C(cap,2) = 8064 → C(cap,2) = 2016 pairs. The
    // saving is quadratic in class width, pinned here as a number.
    val uncappedPairs = n.toLong * (n - 1) / 2
    assert(uncappedPairs - pairs.length === 2934L,
      s"cap saving changed: ${uncappedPairs - pairs.length}")
    val maxKeptId = (cap - 1).toLong * 10
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(1) <= maxKeptId,
        s"pair ${r.getLong(0)}-${r.getLong(1)} includes a doc beyond the cap keep-set")
      assert(r.getLong(2) === 0L)
    }
    Bench.cleanup(spark)
  }

  test("phash: buckets under the cap are untouched") {
    val hashes = Seq(
      (1L, 7, 7, 7, 7), (2L, 7, 7, 7, 7),   // twins, hamming 0
      (3L, 1 << 9, 2, 3, 4)                  // unrelated
    ).toDF("doc_id", "b0", "b1", "b2", "b3")
    val pairs = MultimodalQueries.phashPairs(hashes, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 0L)))
    Bench.cleanup(spark)
  }

  test("video: a flat-clip class wider than the cap is capped per (band, value, nf) bucket") {
    val n = cap + 25
    // n clips, all 4-frame, every frame-0 band zero (flat first frames)
    // plus a second population at a different frame count that must NOT
    // mix into the same buckets
    val sigs = ((0 until n).map(i => (i.toLong, 0L, 4L, 0, 0, 0, 0)) ++
      (0 until 10).map(i => (1000L + i, 0L, 6L, 0, 0, 0, 0)))
      .toDF("doc_id", "f", "nf", "b0", "b1", "b2", "b3")
    val cands = MultimodalQueries.videoPhashCandidates(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val within4 = cands.filter(_._2 < 1000L)
    val within6 = cands.filter(_._1 >= 1000L)
    assert(within4.length === cap * (cap - 1) / 2,
      s"expected C($cap,2) capped 4-frame pairs, got ${within4.length}")
    assert(within4.forall(p => p._2 < cap.toLong),
      "a clip beyond the cap keep-set slipped into the 4-frame pairs")
    assert(within6.length === 10 * 9 / 2, "6-frame bucket under the cap must be untouched")
    assert(cands.length === within4.length + within6.length,
      "a pair crossed the frame-count blocking key")
    Bench.cleanup(spark)
  }

  test("substring: a boilerplate fingerprint shared corpus-wide is df-capped") {
    val n = cap + 20
    val fps = (0 until n).map(i => (i.toLong, (i % 3 + 1).toLong, "boilerplate-fp"))
      .toDF("doc_id", "pos", "fp")
    val pairs = DedupQueries.substringPairs(fps).collect()
    assert(pairs.length === cap * (cap - 1) / 2,
      s"expected C($cap,2) capped pairs, got ${pairs.length}")
    pairs.foreach { r =>
      assert(r.getLong(1) < cap.toLong,
        "a doc beyond the cap keep-set slipped into the pairs")
      assert(r.getLong(2) === 1L) // n_shared: exactly the one boilerplate window
    }
    Bench.cleanup(spark)
  }

  // Round-15: the four banded text/embed lanes migrated off uncapped
  // collect_list posting lists onto the same capped shape (round-14
  // verdict lead item). Each case plants a flat class wider than the
  // cap — every doc identical, so every bucket holds the whole class —
  // and asserts the pair set is exactly C(cap,2) over the lowest ids.
  private val flatN = cap + 36
  private def expectCapped(pairs: Array[(Long, Long)], what: String): Unit = {
    assert(pairs.length === cap * (cap - 1) / 2,
      s"$what: expected C($cap,2) capped pairs, got ${pairs.length}")
    pairs.foreach { case (a, b) =>
      assert(a < b, s"$what: unordered pair $a-$b")
      assert(b < cap.toLong, s"$what: pair $a-$b includes a doc beyond the cap keep-set")
    }
  }

  test("minhash: a flat text class wider than the cap is capped per band bucket") {
    val docs = (0 until flatN).map(i => (i.toLong, "en", "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "lang", "text")
    val cands = DedupQueries.minhashCandsFrom(DedupQueries.shingleArrays(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    expectCapped(cands, "minhash")
    Bench.cleanup(spark)
  }

  test("ngram: a corpus-wide boilerplate shingle class is df-capped") {
    val docs = (0 until flatN).map(i => (i.toLong, "en", "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "lang", "text")
    val got = DedupQueries.ngramJaccardFrom(DedupQueries.shingleArrays(docs)).collect()
    expectCapped(got.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))), "ngram")
    // identical docs: intersection = all 4 shingles, jac = 1.0 — the
    // capped index must not under-count WITHIN the keep-set
    got.foreach(r => assert(r.getAs[Long]("inter") === 4L,
      s"inter changed: ${r.getAs[Long]("inter")}"))
    Bench.cleanup(spark)
  }

  test("simhash: a flat signature class wider than the cap is capped per band bucket") {
    val docs = (0 until flatN).map(i => (i.toLong, "en", "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "lang", "text")
    val pairs = DedupQueries.simhashPairsFrom(docs)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Number]("ham").longValue))
    expectCapped(pairs.map(p => (p._1, p._2)), "simhash")
    pairs.foreach(p => assert(p._3 === 0L, "identical docs must be hamming 0"))
    Bench.cleanup(spark)
  }

  test("embed: a flat vector class wider than the cap is capped per (label, band, value) bucket") {
    val vec = Array.tabulate(64)(d => (d % 7 + 1).toDouble)
    val n = (0 until flatN).map(i => (i.toLong, 1L, vec))
      .toDF("vec_id", "label", "e")
    val cands = DedupQueries.embedCandidates(n)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    expectCapped(cands, "embed")
    Bench.cleanup(spark)
  }

  test("substring: per-doc first-occurrence and positions survive the capped path") {
    val fps = Seq(
      (10L, 5L, "fpA"), (10L, 2L, "fpA"),   // doc 10 hits fpA twice; min pos 2
      (20L, 9L, "fpA"),
      (20L, 1L, "fpB"), (30L, 4L, "fpB")
    ).toDF("doc_id", "pos", "fp")
    val got = DedupQueries.substringPairs(fps)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(
      (10L, 20L, 1L, 2L, 9L),   // shared fpA; first positions 2 and 9
      (20L, 30L, 1L, 1L, 4L)))  // shared fpB
    Bench.cleanup(spark)
  }
}
