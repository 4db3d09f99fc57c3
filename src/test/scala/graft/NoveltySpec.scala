package graft

import org.apache.spark.sql.functions._

/** `q_ngram_novelty` parity: the declared lane shingles through the
  * sanctioned per-partition imperative grams8; this spec recomputes the
  * whole thing with declarative HOFs (a genuinely different
  * implementation) and requires exact agreement — the FastKayvee parity
  * discipline for the corpus-hygiene family.
  */
class NoveltySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("imperative-shingle novelty equals a declarative HOF recompute, row for row") {
    val got = SparkEntry.queries("q_ngram_novelty")(spark, sf)
    val l = split(col("text"), " ")
    val g8 = array_distinct(transform(
      when(size(l) >= 8, sequence(lit(1), size(l) - 7)).otherwise(array()),
      i => concat_ws(" ", (0 to 7).map(k => element_at(l, i + k)): _*)))
    val sh = Tables(spark, sf).documents
      .select(col("doc_id"), explode(g8).as("s"))
    val dfC = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val want = sh.join(dfC, "s")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        graft.queries.CrossRound.col(
          col("n_novel").cast("double") / col("n_grams"), 4).as("novelty"))
    val a = got.collect().map(_.toString).sorted.toSeq
    val b = want.collect().map(_.toString).sorted.toSeq
    assert(a === b)
    assert(a.nonEmpty)
    Bench.cleanup(spark)
  }

  test("novelty separates on this corpus: bounded in [0,1], some docs below 1") {
    val nv = SparkEntry.queries("q_ngram_novelty")(spark, sf).persist()
    assert(nv.filter(col("novelty") < 0 || col("novelty") > 1).count() === 0L)
    // ~5% of 8-grams are shared corpus-wide (measured), so boilerplate
    // carriers must exist — the signal is non-degenerate
    assert(nv.filter(col("novelty") < 1).count() > 0L)
    assert(nv.filter(col("novelty") === 1).count() > 0L)
    nv.unpersist()
    Bench.cleanup(spark)
  }
}
