package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftExtensions, VectorExpressions}

/** Custom Catalyst vector expressions: Column API, SQL registration via
  * SparkSessionExtensions, codegen/interpreted agreement. */
class VectorFunctionsSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  test("cosine_similarity and dot_product, Column API") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      VectorExpressions.dotProduct(col("a"), col("b")),
      VectorExpressions.cosineSimilarity(col("a"), col("b"))
    ).head
    assert(r.getDouble(0) === 32.0)
    assert(math.abs(r.getDouble(1) - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
  }

  test("orthogonal and identical vectors") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0))).toDF("a", "b")
    assert(df.select(VectorExpressions.cosineSimilarity(col("a"), col("b"))).head.getDouble(0) === 0.0)
    assert(df.select(VectorExpressions.cosineSimilarity(col("a"), col("a"))).head.getDouble(0) === 1.0)
  }

  test("registered as SQL functions via extensions hook") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
        "dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d"
    ).head
    assert(r.getAs[Double]("c") === 1.0)
    assert(r.getAs[Double]("d") === 11.0)
  }
}
