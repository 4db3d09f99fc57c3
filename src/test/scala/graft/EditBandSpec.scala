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

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-editband").toString
    Seq(
      (1L, docA, "en", "synth", docA.length.toLong),
      (2L, docB, "en", "synth", docB.length.toLong)
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
}
