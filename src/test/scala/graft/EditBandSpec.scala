package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

/** Regression guard for the q_dedup_edit_verify banded-Levenshtein cutoff:
  * the band must be DERIVED from the pair (ceil(0.4·mx), the exact bound
  * the sim ≥ 0.6 filter implies), not a corpus-bound literal. A fixed
  * band of 300 was lossless only while docs stayed under ~750 chars; the
  * fixture below plants a ~2.1k-char near-dup pair whose true distance is
  * 312 — inside (300, 0.4·mx], i.e. exactly the region a fixed 300 band
  * silently drops (returns −1) while the full-DP oracle keeps it.
  */
class EditBandSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  // 300 six-char tokens; doc 2 replaces tokens 96..147 with tokens whose
  // EVERY character differs (digits re-encoded as letters j..s behind a
  // 'b' prefix) → Levenshtein = 52 × 6 = 312 pure substitutions — checked
  // against a reference DP offline. Long shared prefix+suffix keep shingle
  // Jaccard ≈ 0.69, and this exact fixture was checked offline to collide
  // in at least one MinHash band (md5 is deterministic, so candidacy is
  // pinned, not probabilistic).
  private val tokA: Int => String = i => f"a$i%05d"
  private def tokB(i: Int): String =
    "b" + f"$i%05d".map(c => ('j' + (c - '0')).toChar)
  private val docA = (0 until 300).map(tokA).mkString(" ")
  private val docB = (0 until 300)
    .map(i => if (i >= 96 && i < 148) tokB(i) else tokA(i))
    .mkString(" ")
  // doc 3 = doc 1 plus 260 appended novel tokens: every doc-1 shingle
  // survives, so shingle Jaccard ≈ 298/560 ≈ 0.53 and the pair (1,3)
  // band-collides (md5 is deterministic — candidacy is pinned by the
  // assertion below, not probability). Its length gap (1820 chars: 260
  // six-char tokens plus their 260 separators) exceeds 0.4 × max-length
  // (0.4 × 3919 ≈ 1568), so the prefilter must drop it BEFORE any DP —
  // and that drop is provably lossless: lev ≥ |len gap| always, so
  // sim = 1 − lev/mx ≤ 1 − gap/mx < 1 − 0.4 = 0.6.
  private def tokC(i: Int): String = "c" + f"$i%05d"
  private val docC = ((0 until 300).map(tokA) ++ (0 until 260).map(tokC)).mkString(" ")

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-editband").toString
    Seq(
      (1L, docA, "en", "synth", docA.length.toLong),
      (2L, docB, "en", "synth", docB.length.toLong),
      (3L, docC, "en", "synth", docC.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("band tracks document length: a 312-edit pair on ~2.1k-char docs is kept") {
    assert(docA.length === 2099 && docB.length === 2099)
    val rows = SparkEntry.queries("q_dedup_edit_verify")(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("lev"), col("sim"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val (lev, sim) = rows.getOrElse(
      (1L, 2L),
      fail(s"pair (1,2) missing — fixed-band regression (got ${rows.keys.toSeq.sorted})"))
    assert(lev === 312L)            // > the old fixed band of 300
    assert(lev <= (0.4 * 2099).toLong) // inside the sim ≥ 0.6 region
    assert(math.abs(sim - (1.0 - 312.0 / 2099.0)) < 1e-4)
    // every emitted pair still satisfies the similarity contract
    rows.values.foreach { case (l, s0) => assert(l >= 0 && s0 >= 0.6) }
  }

  test("length prefilter: provably-lossless drop — no DP for pairs the length gap already excludes") {
    import graft.queries.DedupQueries
    // (1,3) IS an LSH candidate (deterministic md5 banding)…
    val c = DedupQueries.corpus(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = DedupQueries.minhashCandsFrom(DedupQueries.shingleArrays(c))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 3L)),
      s"fixture must make (1,3) a band candidate — got ${cands.toSeq.sorted}")
    // …whose length gap exceeds the 0.4·mx prefilter bound…
    val gap = math.abs(docA.length - docC.length)
    val mx = math.max(docA.length, docC.length)
    assert(gap > 0.4 * mx)
    // …and the declared output drops it — losslessly: the FULL
    // (unbanded, un-prefiltered) DP on the pair confirms sim < 0.6, so
    // the prefilter removed work, never a result. lev ≥ |len gap| makes
    // this a theorem (sim ≤ 1 − gap/mx < 0.6), checked here with the
    // engine's own levenshtein as the witness.
    val out = SparkEntry.queries("q_dedup_edit_verify")(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!out.contains((1L, 3L)))
    import SharedSpark.spark.implicits._
    val fullLev = Seq((docA, docC)).toDF("a", "b")
      .select(org.apache.spark.sql.functions.levenshtein(col("a"), col("b")))
      .head().getInt(0)
    assert(fullLev >= gap, "levenshtein is bounded below by the length gap")
    assert(1.0 - fullLev.toDouble / mx < 0.6,
      "the prefiltered pair must be a true negative")
    Bench.cleanup(spark)
  }
}
