package graft

import org.apache.spark.sql.functions._

/** The BPE training LOOP contract (bpeTrainConverge), pinned on the
  * classic hand-solvable corpus (low×5, lower×2, newest×6, widest×3 —
  * the byte-pair-encoding walkthrough example): with one rule per round
  * the merge sequence is fully derivable by hand, with batched rounds
  * the curve must fall monotonically, and a corpus whose ≥2-count pair
  * supply dries up must terminate early instead of spinning to the
  * target. Plus the measured-constant pin (bpeConvergeRounds) against the
  * sf0.01 fixture the driver's oracle gate runs at.
  */
class BpeConvergeSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  /** One doc per word occurrence keeps word counts == doc counts. */
  private def classicCorpus = {
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
  }

  test("one-rule rounds replay the classic BPE merge sequence by hand") {
    // pair counts: es=st=9 (tie → 'e'<'s' picks es), then (es,t)=9,
    // then lo=ow=7 (tie → 'l'<'o' picks lo)
    val got = graft.queries.TextQueries
      .bpeTrainConverge(spark, classicCorpus, targetMerges = 3, rulesPerRound = 1)
      .orderBy(col("round"), col("rk"))
      .collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3), r.getLong(5)))
    assert(got.toSeq === Seq(
      (1L, "e", "s", 9L),
      (2L, "es", "t", 9L),
      (3L, "l", "o", 7L)))
  }

  test("symbol totals fall monotonically and whole-symbol merges never split") {
    val rows = graft.queries.TextQueries
      .bpeTrainConverge(spark, classicCorpus, targetMerges = 8, rulesPerRound = 2)
      .orderBy(col("round"), col("rk"))
      .collect()
    val curve = rows.map(r => (r.getLong(0), r.getLong(6))).distinct
    assert(curve.map(_._2).toSeq === curve.map(_._2).sorted.reverse.toSeq,
      s"symbol curve must be non-increasing: ${curve.mkString(",")}")
    assert(curve.last._2 < curve.head._2, "merging must reduce symbols")
    // merged symbols are concatenations of the pair, and every later
    // rule's sides are whole symbols from earlier merges or single chars
    val merged = rows.map(r => r.getString(4))
    assert(rows.forall(r => r.getString(4) === r.getString(2) + r.getString(3)))
    val known = scala.collection.mutable.Set[String]()
    rows.foreach { r =>
      Seq(r.getString(2), r.getString(3)).foreach { side =>
        assert(side.length == 1 || known.contains(side),
          s"rule side '$side' is neither a char nor a previously merged symbol")
      }
      known += r.getString(4)
    }
    assert(merged.distinct.length === merged.length, "no rule learned twice")
  }

  test("terminates when the >=2-count pair supply dries up, short of target") {
    // every word unique, so every pair count is 1 — nothing to merge
    val uniq = Seq((0L, "abc"), (1L, "def"), (2L, "ghi")).toDF("doc_id", "text")
    val none = graft.queries.TextQueries
      .bpeTrainConverge(spark, uniq, targetMerges = 64, rulesPerRound = 8)
    assert(none.count() === 0L)
    // a corpus with exactly one mergeable pair learns it and stops
    val one = Seq((0L, "xy"), (1L, "xy")).toDF("doc_id", "text")
    val learned = graft.queries.TextQueries
      .bpeTrainConverge(spark, one, targetMerges = 64, rulesPerRound = 8)
      .collect()
    assert(learned.map(r => (r.getString(2), r.getString(3))).toSeq === Seq(("x", "y")))
    assert(learned.head.getLong(5) === 2L, "xy merged: 2 docs x 1 symbol")
  }

  test("encode is consistent with training: corpus token total == final symbol total") {
    // q_bpe_encode and q_bpe_train_converge share bpeTrainLoop, so the
    // sum of per-doc token counts must equal the training curve's final
    // syms_after (Σ wc × len(L)) exactly — and every id must be a valid
    // code point or merged-rule id
    val dir = "/root/testdata/sf0.001"
    val enc = SparkEntry.queries("q_bpe_encode")(spark, dir)
      .agg(sum(col("n_tokens")), sum(col("n_chars"))).head
    val curve = SparkEntry.queries("q_bpe_train_converge")(spark, dir)
      .orderBy(col("round").desc, col("rk").desc)
      .select(col("syms_after")).head.getLong(0)
    assert(enc.getLong(0) === curve,
      s"encode token total ${enc.getLong(0)} != training final symbols $curve")
    assert(enc.getLong(1) > enc.getLong(0), "chars per token must exceed 1 after merging")
    Bench.cleanup(spark)
  }

  test("token ids are collision-free and decode losslessly back to every vocab word") {
    // q_bpe_encode's id scheme (the SHARED bpeIdAssignment — this proof
    // covers the shipped mapping, not a test copy): single chars → their
    // code point, merged symbols → 128 + first-win rule index. The
    // scheme is lossless ONLY while no corpus character has a code point
    // ≥ 128 (it would collide with the first merged id) — so this runs
    // at sf0.01, the fixture the driver's oracle gate actually encodes,
    // turning a non-ASCII regeneration there into a named failure while
    // proving decode(encode(word)) == word over the whole vocabulary.
    val dir = "/root/testdata/sf0.01"
    val (learned, vocab) =
      graft.queries.TextQueries.bpeTrainLoop(spark, Tables(spark, dir).documents)
    try {
      val merged = graft.queries.TextQueries.bpeIdAssignment(learned)
      val inverse: Map[Int, String] =
        (0 until 128).map(c => c -> c.toChar.toString).toMap ++ merged.map(_.swap)
      val rows = vocab.select(col("word"), col("L"))
        .as[(String, Seq[String])].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (word, syms) =>
        val ids = syms.map { s =>
          if (s.length == 1) {
            assert(s.head.toInt < 128,
              s"non-ASCII symbol '$s' (code ${s.head.toInt}) collides with merged-rule ids")
            s.head.toInt
          } else merged(s)
        }
        assert(ids.map(inverse).mkString === word, s"round trip failed for '$word'")
      }
    } finally Bench.cleanup(spark)
  }

  test("oracle round-count constant matches the sf0.01 fixture it is valid for") {
    // bpeConvergeRounds is pinned to the sf the driver's gate runs at —
    // this test turns a fixture regeneration into a named failure
    // instead of an opaque oracle hash mismatch (the measured-round-constant
    // pattern).
    val rounds = graft.queries.TextQueries
      .bpeTrainConverge(spark, Tables(spark, "/root/testdata/sf0.01").documents)
      .agg(max(col("round"))).head.getLong(0)
    assert(rounds === graft.queries.TextQueries.bpeConvergeRounds.toLong,
      s"\nsf0.01 fixture now trains in $rounds rounds but the DuckDB oracle " +
        s"unrolls bpeConvergeRounds = " +
        s"${graft.queries.TextQueries.bpeConvergeRounds} stages — the fixture " +
        "was probably regenerated; update TextQueries.bpeConvergeRounds.")
    Bench.cleanup(spark)
  }
}
