package graft

import org.apache.spark.sql.functions._

import graft.queries.RelationalQueries

/** Measured-skew adaptive salting (q_join_salted_auto's engine): factors
  * derive from per-key counts against a rows-per-task budget, so a planted
  * skewed frame must produce VARIABLE factors — capped for the hottest
  * key, intermediate for a warm key, zero salting for cold keys — while
  * the join result stays bit-identical to the plain join. The declared
  * query's fixture is near-uniform (all keys same factor); this spec is
  * where the variable-factor path is pinned.
  */
class SkewAutosaltSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  // fact rows carry the columns the salt hash uses (l_orderkey,
  // l_linenumber) plus the join key and a payload to aggregate.
  private def fact = spark.range(0, 6200).select(
    when(col("id") < 5000, 1L)                  // hot: 5000 rows → ceil(5000/256)=20 → cap 8
      .when(col("id") < 5600, 2L)               // warm: 600 rows → factor 3
      .otherwise(col("id") % 60 + 3L).as("l_suppkey"), // cold: ~10 rows/key
    col("id").as("l_orderkey"),
    (col("id") % 7).as("l_linenumber"),
    (col("id") % 1000).cast("double").as("l_extendedprice"))

  private def dim = spark.range(1, 70).select(
    col("id").as("s_suppkey"), concat(lit("s"), col("id")).as("s_name"))

  test("auto-salted join ≡ plain join under planted skew") {
    val plain = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("rev"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val salted = RelationalQueries.saltedAutoJoin(fact, dim)
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("rev"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(salted.toSeq === plain.toSeq)
  }

  test("factors are measured per key: capped hot, intermediate warm, zero cold") {
    // primary: the factor map itself (key -> factor) straight off
    // autosaltFactors' output — the contract, independent of whether the
    // fact's salt hash happens to hit every residue
    val factors = RelationalQueries
      .autosaltFactors(fact, budget = 256L, maxFactor = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(factors === Map(1L -> 8, 2L -> 3),
      "hot caps at maxFactor=8, warm gets ceil(600/256)=3, cold keys absent")
    // secondary, best-effort: distinct observed salts per key equals the
    // factor only when pmod(xxhash64(...)) hits every residue — true for
    // this fixture's row counts, and worth keeping as an end-to-end probe
    // that the salting actually spreads the hot key
    val joined = RelationalQueries.saltedAutoJoin(fact, dim)
    val saltsByKey = joined.groupBy(col("l_suppkey"))
      .agg(countDistinct(col("salt")).as("ns"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(saltsByKey(1L) === 8L, "hot key should cap at maxFactor=8")
    assert(saltsByKey(2L) === 3L, "warm key should get ceil(600/256)=3")
    // every cold key stays on the single unsalted path
    assert(saltsByKey.filterNot(k => k._1 == 1L || k._1 == 2L).values.forall(_ == 1L))
  }

  test("dim replication is Σfactors, not keys × maxFactor") {
    // the replicated dim side itself (the frame that shuffles): hot key
    // ×8 + warm key ×3 + the other 67 dim keys ×1 = 78 rows. Static ×8
    // salting would produce 69 × 8 = 552 — this is the shuffle-size win
    // the adaptive variant exists for, asserted on the actual frame.
    val hot = RelationalQueries.autosaltFactors(fact, budget = 256L, maxFactor = 8)
    val dimR = RelationalQueries.autosaltDim(dim, hot)
    assert(dimR.count() === 8L + 3L + 67L)
    // and each fact row still matches exactly one replica
    val joined = RelationalQueries.saltedAutoJoin(fact, dim)
    assert(joined.count() === fact.count())
    Bench.cleanup(spark)
  }
}
