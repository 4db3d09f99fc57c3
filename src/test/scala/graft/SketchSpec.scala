package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SketchExpressions.{cmsEstimate, cmsMerge}

/** Unit coverage for the count-min-sketch re-aggregation surface
  * (functions/SketchExpressions.scala):
  *
  *  - MERGE EXACTNESS: the union of per-partition sketch blobs via
  *    CmsMergeAgg yields, for every item, the same estimate as ONE sketch
  *    built over the concatenated stream — CMS merge is cellwise counter
  *    addition, so this is an equality, not a bound. This also pins
  *    CmsEstimate's ingestion parity with the builtin count_min_sketch
  *    string path (UTF-8 bytes through the binary hash): a hashing
  *    mismatch would surface as disagreeing estimates, not a subtle bias.
  *  - ERROR CONTRACT: est ≥ true count always; est ≤ true + eps·N at the
  *    sketch's published eps (the q_cms_heavy_hitters oracle contract).
  *  - EMPTY INPUT: merging zero sketch rows evaluates to NULL (the
  *    createAggregationBuffer-is-null path through serialize/deserialize).
  */
class SketchSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  private val eps = 0.001

  private def sketchOf(df: DataFrame) =
    count_min_sketch(col("word"), lit(eps), lit(0.99), lit(42))

  private def estimates(items: DataFrame, sk: DataFrame): Map[String, Long] =
    items.crossJoin(broadcast(sk))
      .select(col("word"), cmsEstimate(col("sk"), col("word")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("merged partial sketches estimate identically to one whole-stream sketch") {
    val words = Seq.tabulate(500)(i => (i % 5, s"w${i % 7}"))
    val df = words.toDF("part", "word")

    val merged = df.groupBy(col("part")).agg(sketchOf(df).as("sk"))
      .agg(cmsMerge(col("sk")).as("sk"))
    val single = df.agg(sketchOf(df).as("sk"))
    val items = df.select(col("word")).distinct()

    val em = estimates(items, merged)
    val es = estimates(items, single)
    assert(em === es)

    val truth = words.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val bound = math.ceil(eps * words.size).toLong
    truth.foreach { case (w, c) =>
      assert(em(w) >= c, s"$w: CMS must never underestimate")
      assert(em(w) <= c + bound, s"$w: ${em(w)} outside eps-bound $c + $bound")
    }
  }

  test("cms_merge / cms_estimate registered as SQL functions agree with the Column API") {
    graft.functions.GraftExtensions.register(SharedSpark.spark)
    Seq.tabulate(300)(i => (i % 3, s"w${i % 5}")).toDF("part", "word")
      .createOrReplaceTempView("cms_words")
    val sql = SharedSpark.spark.sql(
      s"""SELECT word, cms_estimate(sk, word) AS est FROM
         |  (SELECT cms_merge(sk) AS sk FROM
         |    (SELECT count_min_sketch(word, ${eps}d, 0.99d, 42) AS sk
         |     FROM cms_words GROUP BY part)),
         |  (SELECT DISTINCT word FROM cms_words)""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 300 draws over 5 words, uniform: exact counts, sketch wide enough
    assert(sql === (0 to 4).map(i => s"w$i" -> 60L).toMap)
  }

  test("streaming pre-aggregation: per-micro-batch sketch blobs roll up to exact answers") {
    // the pattern the CMS family exists for at 100 TB: each micro-batch
    // writes ONE sketch blob to a store; any later frequency question is
    // answered by cms_merge over stored blobs — the raw stream is never
    // re-read. The queue stands in for the sketch store; the roll-up and
    // estimate run distributed.
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = SharedSpark.spark.sqlContext
    val ms = MemoryStream[String]
    val blobs = new java.util.concurrent.ConcurrentLinkedQueue[Array[Byte]]()
    val q = ms.toDF().withColumnRenamed("value", "word").writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val r = batch.agg(sketchOf(batch).as("sk")).collect()(0)
        if (!r.isNullAt(0)) blobs.add(r.getAs[Array[Byte]](0))
        ()
      }.start()
    try {
      ms.addData(Seq.fill(30)("alpha") ++ Seq.fill(12)("beta"): _*)
      q.processAllAvailable()
      ms.addData(Seq.fill(20)("alpha") ++ Seq.fill(8)("gamma"): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(blobs.size >= 2, "expected at least one sketch blob per micro-batch")
    val merged = blobs.asScala.toSeq.toDF("sk").agg(cmsMerge(col("sk")).as("sk"))
    val est = estimates(Seq("alpha", "beta", "gamma").toDF("word"), merged)
    assert(est === Map("alpha" -> 50L, "beta" -> 12L, "gamma" -> 8L))
  }

  test("merging sketches of mismatched geometry fails loudly, not silently") {
    val df = Seq.tabulate(100)(i => (i % 2, s"w$i")).toDF("part", "word")
    val mixed = df.groupBy(col("part")).agg(
      when(col("part") === 0,
        count_min_sketch(col("word"), lit(0.001), lit(0.99), lit(42)))
        .otherwise(
          count_min_sketch(col("word"), lit(0.01), lit(0.99), lit(42))).as("sk"))
    val ex = intercept[Exception] {
      mixed.agg(cmsMerge(col("sk"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => Option(c.getMessage).exists(m =>
        m.contains("Cannot merge") || m.contains("Incompatible"))),
      s"expected an incompatible-merge failure, got: $ex")
  }

  test("misra_gries: exact when distinct items fit the counters") {
    import graft.functions.SketchExpressions.misraGries
    val df = (Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(10)("c")).toDF("w")
    val m = df.agg(misraGries(col("w"), 8).as("mg"))
      .collect().head.getMap[String, Long](0)
    assert(Map("a" -> 40L, "b" -> 25L, "c" -> 10L).forall { case (k, v) => m.get(k).contains(v) })
  }

  test("misra_gries: contract holds under pressure for every merge schedule") {
    import graft.functions.SketchExpressions.misraGries
    // 4 heavy items + 60 singleton tail vs k=8 counters: prunes fire
    val heavy = Map("h1" -> 120L, "h2" -> 90L, "h3" -> 70L, "h4" -> 50L)
    val stream = heavy.toSeq.flatMap { case (w, c) => Seq.fill(c.toInt)(w) } ++
      (1 to 60).map(i => s"tail_$i")
    val n = stream.size.toLong
    val k = 8
    for (parts <- Seq(1, 7)) { // different merge schedules
      val m = stream.toDF("w").repartition(parts)
        .agg(misraGries(col("w"), k).as("mg"))
        .collect().head.getMap[String, Long](0)
      assert(m.size <= k, s"parts=$parts: more than $k counters survived")
      m.foreach { case (w, est) =>
        val truth = heavy.getOrElse(w, 1L)
        assert(est <= truth, s"parts=$parts: $w overestimated ($est > $truth)")
      }
      heavy.foreach { case (w, truth) =>
        if (truth * k > n) { // guaranteed-present support threshold
          val est = m.get(w)
          assert(est.nonEmpty, s"parts=$parts: heavy item $w missing")
          assert(est.get * k >= truth * k - n,
            s"parts=$parts: $w undercount beyond N/k (${est.get} vs $truth, n=$n)")
        }
      }
    }
  }

  test("misra_gries registered as a SQL function") {
    graft.functions.GraftExtensions.register(SharedSpark.spark)
    Seq.fill(30)("x").toDF("w").createOrReplaceTempView("mg_words")
    val m = SharedSpark.spark
      .sql("SELECT misra_gries(w, 4) AS mg FROM mg_words")
      .collect().head.getMap[String, Long](0)
    assert(m.get("x").contains(30L))
  }

  test("streaming heavy hitters: misra_gries in an update-mode agg with checkpointed state, across a restart") {
    // the lane q_mg_heavy_hitters' scaladoc promises: MG is the STREAMING
    // counterpart of the exact heavy-hitters agg. Here it actually runs
    // as a streaming aggregation — the O(k) buffer lives in the state
    // store (update mode + checkpointLocation), survives a stop/restart
    // mid-stream, and the final summary satisfies the MG contract
    // against batch-exact counts of the SAME replayed traffic: every
    // token above support N/k is present, and every estimate sits in
    // [true − N/k, true]. Traffic is the sf0.001 document token stream
    // (vocabulary ≫ k, so decrements fire) plus three planted hot tokens.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.SketchExpressions.misraGries
    implicit val sqlCtx = SharedSpark.spark.sqlContext
    val k = 16
    val docTokens = Tables(SharedSpark.spark, "/root/testdata/sf0.001").documents
      .select(explode(split(col("text"), " ")).as("token"))
      .collect().map(_.getString(0)).toSeq
    val half = docTokens.size / 2
    def hot(n: Int, t: String) = Seq.fill(n)(t)
    // hot volumes sized to clear support: corpus ≈ 28k tokens, so with
    // the planted mass N ≈ 40k and N/k ≈ 2.5k — all three hot tokens land
    // above it, nothing organic does
    val tranche1 = docTokens.take(half) ++ hot(2500, "hot_a") ++ hot(3500, "hot_b")
    val tranche2 = docTokens.drop(half) ++ hot(2500, "hot_a") ++ hot(3000, "hot_c")

    val ms = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mg-ckpt").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, Long]]()
    def start() = ms.toDF().withColumnRenamed("value", "token")
      .agg(misraGries(col("token"), k).as("mg"))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          got.add(r.getMap[String, Long](0).toMap)
        }
        ()
      }
      .start()

    val q1 = start()
    try { ms.addData(tranche1: _*); q1.processAllAvailable() } finally q1.stop()
    // the first tranche's summary must already carry its hot token
    assert(got.peek().contains("hot_a"), s"pre-restart summary: ${got.peek().keySet}")
    // restart from the checkpoint: the MG buffer comes back from the
    // state store, not from reprocessing tranche 1
    val q2 = start()
    try { ms.addData(tranche2: _*); q2.processAllAvailable() } finally q2.stop()

    val summary = {
      var last: Map[String, Long] = null
      got.forEach(m => last = m)
      last
    }
    val all = tranche1 ++ tranche2
    val n = all.size.toLong
    val exact = all.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    // presence above support: hot_a (5000), hot_b (3500), hot_c (3000)
    // vs N/k — require the planted ones that clear the threshold
    val mustHave = exact.filter { case (_, c) => c * k > n }.keySet
    assert(mustHave.contains("hot_a"), s"fixture too weak: N/k = ${n / k}")
    mustHave.foreach { t =>
      assert(summary.contains(t), s"token '$t' above support N/k missing from $summary")
    }
    // bound: est ∈ [true − N/k, true] for everything the summary kept
    summary.foreach { case (t, est) =>
      val c = exact.getOrElse(t, 0L)
      assert(est <= c, s"'$t' est $est > true $c")
      assert(est >= c - n / k, s"'$t' est $est < ${c - n / k}")
    }
    // and the restart really mattered: tranche-1-only hot_b survives only
    // if the buffer crossed the restart (it never appears in tranche 2)
    assert(got.size >= 2, "expected one summary per micro-batch")
  }

  test("cms_estimate over a frame of DISTINCT sketches serves each row its own sketch") {
    // regression: the estimate cache must key on full blob content — two
    // same-parameter sketches share their leading bytes (version +
    // totalCount high word) and often their trailing counter cell, so a
    // sampled head/tail fingerprint can collide and serve sketch A's
    // counts for sketch B's row
    val df = (Seq.fill(30)((0, "alpha")) ++ Seq.fill(40)((1, "beta")))
      .toDF("part", "word")
    val perPart = df.groupBy(col("part")).agg(sketchOf(df).as("sk"))
    val est = perPart
      .select(col("part"),
        cmsEstimate(col("sk"), lit("alpha")).as("a"),
        cmsEstimate(col("sk"), lit("beta")).as("b"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(est(0) === ((30L, 0L)), s"part 0 saw ${est(0)}")
    assert(est(1) === ((0L, 40L)), s"part 1 saw ${est(1)}")
  }

  test("merging zero sketch rows yields NULL") {
    val none = Seq.empty[(Int, String)].toDF("part", "word")
    val out = none.groupBy(col("part")).agg(sketchOf(none).as("sk"))
      .agg(cmsMerge(col("sk")).as("sk"))
      .collect()
    assert(out.length === 1 && out(0).isNullAt(0))
  }
}
