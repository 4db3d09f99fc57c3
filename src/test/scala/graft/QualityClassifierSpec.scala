package graft

import org.apache.spark.sql.functions._

/** The trained quality classifier's contract (q_quality_classifier —
  * the discriminative sibling of q_quality_lm_ppl):
  *
  *  1. SEPARATION: every original doc scores non-low-quality and every
  *     planted gibberish twin scores low_quality — including the
  *     HELD-OUT fifth (doc_id % 5 = 0) the training split never saw, so
  *     the model generalizes rather than memorizes.
  *  2. MODEL SHAPE: the trained artifact is O(B) integers (≤ qcB weight
  *     rows) — the bounded driver collect the lane's scale story rests
  *     on.
  *  3. SCORE EXACTNESS: per-doc scores re-derive as the integer
  *     Σ tf·w off the same weight table (no float path anywhere after
  *     training's single ln).
  *  4. BOTH VERDICT ARMS live at the gate fixture.
  */
class QualityClassifierSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("separates originals from planted gibberish, including the held-out fifth; both arms live") {
    val spark = SharedSpark.spark
    val rows = SparkEntry.queries("q_quality_classifier")(spark, dir)
      .select(col("doc_id"), col("score_micro"), col("low_quality"))
      .collect()
    assert(rows.nonEmpty)
    val (twins, origs) = rows.partition(_.getLong(0) >= 1000000L)
    assert(twins.nonEmpty && origs.nonEmpty, "fixture must score both classes")
    // both verdict arms live
    assert(rows.exists(_.getBoolean(2)) && rows.exists(!_.getBoolean(2)))
    // full separation at fixture SF: gibberish below the log-odds zero,
    // originals above (a failure here names the doc, not a hash)
    origs.foreach { r =>
      assert(!r.getBoolean(2), s"original doc ${r.getLong(0)} scored low-quality (${r.getLong(1)})")
    }
    twins.foreach { r =>
      assert(r.getBoolean(2), s"gibberish twin ${r.getLong(0)} scored clean (${r.getLong(1)})")
    }
    // the held-out fifth was NEVER in training — separation there is
    // generalization, the property the GPT-3-style filter needs
    val heldOut = rows.filter(r => (r.getLong(0) % 1000000L) % 5 == 0)
    assert(heldOut.nonEmpty, "fixture has no held-out docs")
    heldOut.foreach { r =>
      val isTwin = r.getLong(0) >= 1000000L
      assert(r.getBoolean(2) === isTwin,
        s"held-out ${r.getLong(0)}: low_quality=${r.getBoolean(2)} but isTwin=$isTwin")
    }
    Bench.cleanup(spark)
  }

  test("verdict re-derives from the integer weight table; model is O(B) rows") {
    val spark = SharedSpark.spark
    import graft.queries.TextQueries
    // replay training independently (same split, same features) and pin
    // the lane's scores as exact integer dot products against it
    val docs = Tables(spark, dir).documents
    def gib(c: org.apache.spark.sql.Column) =
      array_join(transform(split(c, " "), w => reverse(w)), " ")
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val both = train.select(lit(1L).as("y"), col("text"))
      .unionAll(train.select(lit(0L).as("y"), gib(col("text")).as("text")))
    val toks = both.select(col("y"), split(col("text"), " ").as("ts"))
    val feats = toks.select(col("y"), explode(concat(col("ts"),
        when(size(col("ts")) >= 2,
          expr("transform(sequence(0, size(ts) - 2), i -> concat(ts[i], '_', ts[i + 1]))"))
          .otherwise(array().cast("array<string>")))).as("g"))
      .select(col("y"),
        (conv(substring(md5(col("g")), 1, 6), 16, 10).cast("long") % TextQueries.qcB).as("b"))
    val bucket = feats.groupBy(col("b"))
      .agg(sum(col("y")).as("cp"), sum(lit(1L) - col("y")).as("cn"))
    val tots = bucket.agg(sum(col("cp")), sum(col("cn"))).collect()(0)
    val (tp, tn) = (tots.getLong(0), tots.getLong(1))
    val B = TextQueries.qcB
    val w = bucket.collect().map { r =>
      r.getLong(0) -> math.floor(math.log(
        ((r.getLong(1) + 1).toDouble * (tn + B)) /
        ((r.getLong(2) + 1).toDouble * (tp + B))) * 1e6).toLong
    }.toMap
    assert(w.size <= B, s"model must be O(B) rows, got ${w.size}")
    assert(w.size == B, s"fixture training should saturate all $B buckets (got ${w.size}) — " +
      "if this ever fails the unseen-bucket drop contract needs a live test")
    // lane scores == Σ tf·w over the re-derived table, exactly
    val scoreCorpus = docs.select(col("doc_id"), col("text"))
      .unionAll(docs.select((col("doc_id") + 1000000L).as("doc_id"), gib(col("text")).as("text")))
    val sfeats = scoreCorpus.select(col("doc_id"), split(col("text"), " ").as("ts"))
      .select(col("doc_id"), explode(concat(col("ts"),
        when(size(col("ts")) >= 2,
          expr("transform(sequence(0, size(ts) - 2), i -> concat(ts[i], '_', ts[i + 1]))"))
          .otherwise(array().cast("array<string>")))).as("g"))
      .select(col("doc_id"),
        (conv(substring(md5(col("g")), 1, 6), 16, 10).cast("long") % TextQueries.qcB).as("b"))
      .collect().groupBy(_.getLong(0))
    val expected = sfeats.map { case (id, rs) =>
      id -> rs.map(r => w(r.getLong(1))).sum
    }
    val lane = SparkEntry.queries("q_quality_classifier")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(lane.keySet === expected.keySet)
    lane.foreach { case (id, sc) =>
      assert(sc === expected(id), s"doc $id: lane $sc vs re-derived ${expected(id)}")
    }
    Bench.cleanup(spark)
  }
}
