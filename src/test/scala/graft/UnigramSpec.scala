package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** The unigram-LM (SentencePiece-style) trainer's contract:
  *
  *  1. KERNEL: the integer Viterbi prefers fewer/longer pieces (one
  *     piece beats any split at equal counts — log-probs are negative)
  *     and breaks exact score ties toward the LONGER FINAL piece, the
  *     rule the oracle's (score DESC, reversed-length-seq DESC) order
  *     replays.
  *  2. VALIDITY: every word's segmentation concatenates back to the
  *     word (single-char seeding makes a dead end impossible), at every
  *     EM round.
  *  3. M-STEP EXACTNESS: est counts are exactly Σ wc × uses, re-derived
  *     on the driver from the same segmentations.
  *  4. PRUNE SHAPE: all singles survive every round (smoothed ≥ 1),
  *     multi pieces are capped at unigramKeepMulti.
  */
class UnigramSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("Viterbi kernel: fewer pieces win; exact ties pick the longer final piece") {
    // equal counts → equal integer weights for every piece
    val sc = TextQueries.unigramScores(
      Seq("a" -> 5L, "b" -> 5L, "c" -> 5L, "ab" -> 5L, "bc" -> 5L))
    // one piece beats two at equal weights (weights are negative)
    assert(TextQueries.unigramViterbi("ab", sc) === List("ab"))
    // 'abc': [ab, c] and [a, bc] tie exactly (2 pieces, same weights) —
    // the DP's ascending-j ≥-replace scan keeps the longer FINAL piece
    assert(TextQueries.unigramViterbi("abc", sc) === List("a", "bc"))
    // no multi-char option → chars
    assert(TextQueries.unigramViterbi("ca", sc) === List("c", "a"))
  }

  test("every EM round segments every word back to itself; est counts are exact; prune shape holds") {
    import SharedSpark.spark.implicits._
    val docs = Tables(spark, dir).documents
    val (words, v0, hist) = TextQueries.unigramTrainLoop(spark, docs,
      TextQueries.unigramEncodeRounds)
    val wlocal = words.as[(String, Long)].collect()
    assert(wlocal.nonEmpty)
    var vocab = v0
    hist.zipWithIndex.foreach { case ((est, next), r) =>
      val sc = TextQueries.unigramScores(vocab)
      // validity + exact M-step, replayed on the driver with the SAME
      // shipped kernel (words are the fixture's bounded distinct set)
      val mine = scala.collection.mutable.Map.empty[String, Long]
      wlocal.foreach { case (w, wc) =>
        val ps = TextQueries.unigramViterbi(w, sc)
        assert(ps.mkString === w, s"round $r: '$w' segmented to $ps")
        ps.foreach(p => mine(p) = mine.getOrElse(p, 0L) + wc)
      }
      val got = est.collect().map(x => (x.getString(0), x.getLong(1))).toMap
      assert(got === mine.toMap, s"round $r M-step drifted")
      // prune shape: all previous singles kept (≥1), multi ≤ cap
      val singlesPrev = vocab.collect { case (p, _) if p.length == 1 => p }.toSet
      val nextSingles = next.collect { case (p, n) if p.length == 1 => (p, n) }
      assert(nextSingles.map(_._1).toSet === singlesPrev)
      assert(nextSingles.forall(_._2 >= 1L))
      assert(next.count(_._1.length > 1) <= TextQueries.unigramKeepMulti)
      vocab = next
    }
    Bench.cleanup(spark)
  }

  test("fixture words stay short enough for the oracle's path enumeration") {
    // the DuckDB oracle enumerates segmentations (exponential in word
    // length for piece-dense words — see unigramSegSql's scaladoc); the
    // engine's DP is linear. This guard fails loudly on a regenerated
    // fixture whose words could hang the gate, instead of the gate
    // hanging. Measured max: 8 code points at every fixture SF.
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val mx = Tables(spark, s"/root/testdata/$sf").documents
        .select(max(array_max(transform(split(col("text"), " "),
          w => length(w))))).head().getInt(0)
      assert(mx <= 16, s"$sf max word length $mx — oracle enumeration at risk")
    }
    Bench.cleanup(spark)
  }

  test("encode output: every doc tokenizes, pieces never beat chars, words lower-bound tokens") {
    val out = SparkEntry.queries("q_unigram_encode")(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("n_chars")).collect()
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), size(filter(split(col("text"), " "),
        w => length(w) >= 1)).cast("long").as("nw"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, nt, nc) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nt >= 1 && nt <= nc, s"doc $id: $nt tokens vs $nc chars")
      assert(nt >= docs(id), s"doc $id: fewer tokens than words")
    }
    Bench.cleanup(spark)
  }

  test("lm-ppl filter: scores re-derive from Viterbi pieces; gibberish scores above fluent text; both arms live") {
    import SharedSpark.spark.implicits._
    val docs = Tables(spark, dir).documents
    val (words, vFinal) =
      TextQueries.unigramTrainLoop(spark, docs, TextQueries.unigramEncodeRounds) match {
        case (ws, _, hist) => (ws, hist.last._2)
      }
    val sc = TextQueries.unigramScores(vFinal)
    // the lane's per-word score IS the Viterbi best path's piece sum —
    // re-derived here for a sample of real fixture words
    val sample = words.select(col("word")).as[String].take(50)
    sample.foreach { w =>
      val pieces = TextQueries.unigramViterbi(w, sc)
      assert(pieces.mkString === w)
      assert(pieces.map(sc).sum <= 0L, s"positive log-prob for '$w'")
    }
    // semantic pin: under the TRAINED model, a character-shuffled
    // gibberish word costs strictly more per char than a frequent real
    // word — the property the CCNet-style filter relies on (and the
    // one the self-frequency q_quality_perplexity cannot express for
    // out-of-corpus text: its LM has no entry at all for unseen words)
    // the probe word needs length >= 3 (r19 advice): a 1-char or
    // palindromic most-frequent word degenerates reverse+head into a
    // string that may itself be a cheap in-vocabulary piece ('a' -> 'aa')
    val frequent = words.filter(length(col("word")) >= 3)
      .orderBy(col("wc").desc).select(col("word"))
      .as[String].head
    val gibberish = frequent.reverse + frequent.headOption.getOrElse('x')
    def ppc(w: String): Long = {
      val p = TextQueries.unigramViterbi(w, sc)
      -p.map(sc).sum / w.codePointCount(0, w.length)
    }
    assert(ppc(gibberish) > ppc(frequent),
      s"trained LM must find gibberish '$gibberish' more surprising than '$frequent'")
    // and the shipped threshold exercises BOTH verdict arms at this SF
    val verdicts = SparkEntry.queries("q_quality_lm_ppl")(spark, dir)
      .groupBy(col("low_quality")).count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(verdicts.getOrElse(true, 0L) > 0L && verdicts.getOrElse(false, 0L) > 0L,
      s"threshold must split the fixture, got $verdicts")
    Bench.cleanup(spark)
  }
}
