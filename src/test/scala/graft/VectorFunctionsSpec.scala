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

  test("hash kernels reachable from SQL: simhash60 / minhash_sig / srp_bands") {
    GraftExtensions.register(spark)
    // SQL results must agree bit-for-bit with the Column API the query
    // lanes use (same Expression underneath)
    val df = Seq(
      (Seq("the", "quick", "brown", "fox"), Seq(0.5, -1.5, 2.0, 0.25)),
      (Seq("lorem", "ipsum"), Seq(-0.75, 0.1, -0.2, 3.0))
    ).toDF("tokens", "vec").withColumn("vec", expr("transform(vec, x -> cast(x as double))"))
    df.createOrReplaceTempView("hash_kernel_probe")
    val viaSql = spark.sql(
      """SELECT simhash60(tokens) AS sh, minhash_sig(tokens, 4) AS mh,
        |  srp_bands(vec, 16, 8) AS srp FROM hash_kernel_probe""".stripMargin).collect()
    val viaCol = df.select(
      graft.functions.TextHashExpressions.simHash(col("tokens")).as("sh"),
      graft.functions.TextHashExpressions.minHash(col("tokens"), 4).as("mh"),
      graft.functions.VectorExpressions.srpBands(
        col("vec"), graft.functions.VectorExpressions.srpPlaneWeights(16), 8).as("srp")
    ).collect()
    viaSql.zip(viaCol).foreach { case (s, c) =>
      assert(s.getLong(0) === c.getLong(0))
      assert(s.getSeq[String](1) === c.getSeq[String](1))
      assert(s.getSeq[Int](2) === c.getSeq[Int](2))
    }
    // null semantics: empty shingle array → null signature
    assert(spark.sql("SELECT minhash_sig(array(), 4) IS NULL AS n").head.getBoolean(0))
  }

  test("md5_prefix_long ≡ conv(substring(md5(x),1,n),16,10) bit-for-bit") {
    // the fused DSIR/classifier feature hash (round-21) must reproduce
    // the declarative chain's value exactly — unicode, empty string, and
    // both prefix widths the query lanes use (6 and 12), plus the % 128
    // bucket arithmetic downstream of the 6-char form
    val df = Seq("", "a", "the_quick", "tok_bigram", "héllo wörld", "字句",
        "dsir42#12345", "x" * 500)
      .toDF("g")
    val r = df.select(
      graft.functions.TextHashExpressions.md5Prefix(col("g"), 6).as("f6"),
      conv(substring(md5(col("g")), 1, 6), 16, 10).cast("long").as("c6"),
      graft.functions.TextHashExpressions.md5Prefix(col("g"), 12).as("f12"),
      conv(substring(md5(col("g")), 1, 12), 16, 10).cast("long").as("c12")
    ).collect()
    r.foreach { row =>
      assert(row.getLong(0) === row.getLong(1))
      assert(row.getLong(2) === row.getLong(3))
      assert(row.getLong(0) % 128 === row.getLong(1) % 128)
    }
    // null in → null out, like the conv chain
    val n = Seq[Option[String]](None).toDF("g")
      .select(graft.functions.TextHashExpressions.md5Prefix(col("g"), 6)).head
    assert(n.isNullAt(0))
  }

  test("non-literal kernel parameters are rejected at analysis time") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('a'), cast(rand() * 4 AS INT))").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("DESCRIBE FUNCTION documents the registered kernels") {
    GraftExtensions.register(spark)
    Seq("cosine_similarity", "dot_product", "simhash60", "minhash_sig", "srp_bands")
      .foreach { fn =>
        val desc = spark.sql(s"DESCRIBE FUNCTION $fn").collect().map(_.getString(0)).mkString("\n")
        assert(desc.contains(s"Function: $fn"), desc)
        assert(desc.toLowerCase.contains(s"usage: $fn("), desc)
      }
  }
}
