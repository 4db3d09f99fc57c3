package graft

import java.nio.file.Files

/** Regression guard for Spark 4 ANSI mode on degenerate documents: empty,
  * one-token and two-token texts must flow through the text/dedup queries
  * (empty shingle sets, NULL second token, dup2 = 0) instead of throwing
  * from a descending `sequence(1, size-k)` + `element_at(l, 0)` or a
  * divide-by-zero. DuckDB's generate_series/list-index semantics are the
  * model: out-of-range → empty/NULL.
  */
class ShortDocSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-shortdocs").toString
    Seq(
      (1L, "", "en", "synth", 0L),
      (2L, "one", "en", "synth", 3L),
      (3L, "two tokens", "en", "synth", 10L),
      (4L, "three token doc", "en", "synth", 15L),
      (5L, "a a a a a a a a", "en", "synth", 15L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private val queries = Seq(
    "q_text_stats", "q_token_count", "q_token_bpe", "q_lang_id",
    "q_quality_score", "q_quality_repetition", "q_quality_stopword",
    "q_quality_perplexity", "q_fingerprint", "q_string_funcs",
    "q_dedup_ngram_jaccard", "q_dedup_minhash", "q_dedup_simhash",
    "q_dedup_substring"
  )

  for (name <- queries)
    test(s"$name survives empty/1-token/2-token documents") {
      // must not throw; row counts are query-specific and unasserted
      SparkEntry.queries(name)(spark, dir).collect()
    }

  test("q_quality_repetition: single-token doc scores dup2 = 0, not NaN/error") {
    val rows = SparkEntry.queries("q_quality_repetition")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup2_ratio")).toMap
    assert(rows(2L) === 0.0)
    assert(rows(5L) > 0.5) // the all-same-token doc is maximally repetitive
  }

  test("q_quality_perplexity: 0/1-token docs score finite nll/ppl, no divide-by-zero") {
    val rows = SparkEntry.queries("q_quality_perplexity")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("nll"), r.getAs[Double]("ppl"))).toMap
    // "" splits to a single empty token: n_tokens = 1, never 0
    assert(rows(1L)._1 === 1L)
    rows.values.foreach { case (n, nll, ppl) =>
      assert(n >= 1L)
      assert(!nll.isNaN && !nll.isInfinite && nll >= 0.0)
      assert(!ppl.isNaN && !ppl.isInfinite && ppl >= 1.0)
    }
    // the all-same-token doc is the most predictable → lowest perplexity
    assert(rows(5L)._3 === rows.values.map(_._3).min)
  }

  test("q_string_funcs: missing second token yields NULL-propagated columns") {
    val r = SparkEntry.queries("q_string_funcs")(spark, dir)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 2L).collect().head
    assert(r.getAs[String]("first_upper") === "ONE")
    assert(r.getAs[String]("second_padded") === null)
    assert(r.isNullAt(r.fieldIndex("edit_dist")))
  }
}
