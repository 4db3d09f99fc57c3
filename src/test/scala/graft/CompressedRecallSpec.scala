package graft

import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** The two embedding-compression recall harnesses
  * (`q_ann_recall_binary`, `q_ann_recall_mrl`): what their oracles
  * cannot see — that the sign packing round-trips, that the two-stage
  * funnel's recall is MONOTONE in shortlist depth (exact rerank never
  * loses a shortlisted true neighbor), and that the rerank stage is
  * doing real work over raw truncation — is pinned here, plus the
  * measured sf0.001 curves the SCALING.md tables quote.
  */
class CompressedRecallSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("binary codes round-trip the sign pattern (unpack == e[i] > 0)") {
    // recompute the packing in the test and unpack both words bit by bit
    // against the raw embedding signs for every corpus row
    val v = Tables(spark, sf).embeddings
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
    def word(lo: Int) = (0 until 32).map { j =>
      when(element_at(col("e"), lo + j + 1) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val bad = v.withColumn("w1", word(0)).withColumn("w2", word(32))
      .withColumn("mismatch",
        (0 until 64).map { i =>
          val w = if (i < 32) col("w1") else col("w2")
          val bit = shiftright(w, i % 32).bitwiseAND(lit(1L)) === 1L
          when(bit =!= (element_at(col("e"), i + 1) > 0), 1).otherwise(0)
        }.reduce(_ + _))
      .filter(col("mismatch") > 0)
    assert(bad.count() === 0L)
    Bench.cleanup(spark)
  }

  test("binary recall is monotone in shortlist depth; sf0.001 curve is 10/24/40") {
    val rows = SparkEntry.queries("q_ann_recall_binary")(spark, sf)
      .groupBy(col("shortlist_l")).agg(sum(col("n_hit")).as("hits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact rerank never loses a shortlisted true neighbor, so deeper
    // shortlists can only add hits
    assert(rows(8L) <= rows(32L) && rows(32L) <= rows(128L))
    assert(rows === Map(8L -> 10L, 32L -> 24L, 128L -> 40L))
    Bench.cleanup(spark)
  }

  test("mrl funnel recall is monotone in prefix width; sf0.001 curve is 15/20/28") {
    val rows = SparkEntry.queries("q_ann_recall_mrl")(spark, sf)
      .groupBy(col("dims")).agg(sum(col("n_hit")).as("hits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(8L) <= rows(16L) && rows(16L) <= rows(32L))
    assert(rows === Map(8L -> 15L, 16L -> 20L, 32L -> 28L))
    Bench.cleanup(spark)
  }

  test("int8 codes stay inside int8 (|code| <= 127, max element exactly 127)") {
    // the q_embed_quantize codec needs no clamp: with s = max|x|/127 the
    // max element rounds to exactly ±127 and nothing exceeds it — the
    // property that makes the recall lane's reconstruction a faithful
    // int8 serving model
    val v = Tables(spark, sf).embeddings
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("s", aggregate(transform(col("e"), x => abs(x)),
        lit(0.0), (a, x) => greatest(a, x)) / 127.0)
      .filter(col("s") > 0)
      .withColumn("mx", aggregate(
        transform(col("e"), x => abs(floor(x / col("s") + 0.5))),
        lit(0.0), (a, x) => greatest(a, x)))
    assert(v.filter(col("mx") =!= 127.0).count() === 0L)
    Bench.cleanup(spark)
  }

  test("int8 recall: 39/40 direct and 40/40 reranked at sf0.001") {
    val rows = SparkEntry.queries("q_ann_recall_int8")(spark, sf)
      .groupBy(col("shortlist_l")).agg(sum(col("n_hit")).as("hits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === Map(5L -> 39L, 20L -> 40L))
    Bench.cleanup(spark)
  }

  test("the rerank stage earns its cost: funnel beats raw truncated top-5") {
    // raw truncated retrieval (prefix-cosine top-5, NO rerank) at d=16,
    // recomputed here: the funnel's 20 hits vs the raw pass's 6 is the
    // measured value of fetching 50 raw vectors per query
    import graft.functions.VectorExpressions.dotProduct
    val v = Tables(spark, sf).embeddings
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("nrm", sqrt(aggregate(transform(col("e"), x => x * x),
        lit(0.0), (a, x) => a + x)))
    val queries = v.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
    def cosAt(d: Int): org.apache.spark.sql.Column = {
      val (pa, pb) = (slice(col("qe"), 1, d), slice(col("e"), 1, d))
      dotProduct(pa, pb) / (sqrt(dotProduct(pa, pa)) * sqrt(dotProduct(pb, pb)))
    }
    def top5(scoreCol: org.apache.spark.sql.Column) = v.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("s", scoreCol)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("s").desc, col("vec_id"))))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id"))
    val exact = top5(dotProduct(col("qe"), col("e")) / (col("qn") * col("nrm")))
    val rawHits = top5(cosAt(16)).intersect(exact).count()
    assert(rawHits === 6L)
    val funnelHits = SparkEntry.queries("q_ann_recall_mrl")(spark, sf)
      .filter(col("dims") === 16).agg(sum(col("n_hit"))).collect()(0).getLong(0)
    assert(funnelHits === 20L)
    assert(funnelHits > rawHits)
    Bench.cleanup(spark)
  }
}
