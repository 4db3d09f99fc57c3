package graft

import org.apache.spark.sql.functions._

/** Skew mitigation by key salting: a hot key is split across N salt
  * buckets on the fact side while the dim side is replicated N ways —
  * results must equal the plain join. (AQE skew-join handles this at
  * runtime for sort-merge joins; explicit salting is the portable pattern
  * when AQE can't, e.g. aggregations over a hot key.)
  */
class SaltedJoinSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  test("salted join ≡ plain join under a hot key") {
    val salts = 8
    // skewed fact: 90% of rows share key 1
    val fact = spark.range(0, 20000)
      .select(when(col("id") % 10 === 0, col("id") % 100).otherwise(1L).as("k"),
        col("id").as("v"))
    val dim = spark.range(0, 100).select(col("id").as("k"), (col("id") * 10).as("w"))

    val plain = fact.join(dim, "k").groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("w")).as("sw"))

    val saltedFact = fact.withColumn("salt", (rand(42) * salts).cast("int"))
    val saltedDim = dim.crossJoin(
      spark.range(0, salts).select(col("id").cast("int").as("salt")))
    val salted = saltedFact
      .join(saltedDim, Seq("k", "salt"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("w")).as("sw"))

    val a = plain.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = salted.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    // the salted fact spreads the hot key across all buckets
    val buckets = saltedFact.filter(col("k") === 1).select(countDistinct(col("salt"))).head.getLong(0)
    assert(buckets === salts.toLong)
  }
}
