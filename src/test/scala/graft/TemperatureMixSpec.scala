package graft

import graft.queries.PipelineQueries

/** Temperature-flattened mixing quotas (q_corpus_mix_temperature's
  * engine): the fixture's language distribution is uniform, so the
  * declared query's oracle only pins the arithmetic — the PROPERTY the
  * operator exists for (α < 1 shifts share from high-resource to
  * low-resource languages, never past availability) is proved here on a
  * planted skew.
  */
class TemperatureMixSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  test("α=0.75 flattens a 10:1 skew and caps at availability") {
    val counts = Seq(("big", 40000L), ("small", 4000L), ("tiny", 10L))
      .toDF("lang", "n")
    val q = PipelineQueries.temperatureQuotas(counts, 0.75)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val total = 44010.0
    val budget = 44010L / 2
    // quota share vs corpus share: big falls, small rises
    val bigShare = q("big")._2.toDouble / budget
    val smallShare = q("small")._2.toDouble / budget
    assert(bigShare < 40000.0 / total, s"big lang share did not fall: $bigShare")
    assert(smallShare > 4000.0 / total, s"small lang share did not rise: $smallShare")
    // availability cap: tiny's proportional-flattened quota (~55) exceeds
    // its 10 docs — the draw is without replacement, so cap wins
    assert(q("tiny")._2 === 10L)
    // quotas never exceed availability anywhere
    q.values.foreach { case (n, cap) => assert(cap <= n) }
  }

  test("α=1 recovers proportional sampling (no flattening)") {
    val counts = Seq(("a", 30000L), ("b", 3000L)).toDF("lang", "n")
    val q = PipelineQueries.temperatureQuotas(counts, 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val budget = 33000L / 2
    // integer division: quota_i = budget * n_i / total (±1 on floor)
    assert(math.abs(q("a") - budget * 30000L / 33000L) <= 1)
    assert(math.abs(q("b") - budget * 3000L / 33000L) <= 1)
    Bench.cleanup(spark)
  }
}
