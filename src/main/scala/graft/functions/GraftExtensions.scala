package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering the engine's native expressions
  * as SQL functions, so `spark.sql("SELECT cosine_similarity(a, b)")`
  * works anywhere the library is on the classpath:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions) // or
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def info(clazz: Class[_], name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  /** Non-column arguments of the hash kernels (minhash k, SRP geometry)
    * parameterize the expression itself, so they must be literal at
    * analysis time — like the built-in `approx_percentile` accuracy arg. */
  private def foldableInt(fn: String, arg: String, e: Expression): Int = {
    require(e.foldable, s"$fn: $arg must be a literal integer")
    e.eval() match {
      case n: Number => n.intValue
      case other     => throw new IllegalArgumentException(s"$fn: $arg must be integral, got $other")
    }
  }

  val cosineSimilarity: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    info(classOf[CosineSimilarity], "cosine_similarity",
      "cosine_similarity(a, b) - cosine similarity of two double arrays"),
    (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))
  )

  val dotProduct: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    info(classOf[DotProduct], "dot_product",
      "dot_product(a, b) - dot product of two double arrays"),
    (children: Seq[Expression]) => DotProduct(children(0), children(1))
  )

  val simhash60: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash60"),
    info(classOf[SimHash60], "simhash60",
      "simhash60(tokens) - 60-bit SimHash signature of a string array"),
    (children: Seq[Expression]) => SimHash60(children(0))
  )

  val minhashSig: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    info(classOf[MinHashSig], "minhash_sig",
      "minhash_sig(shingles, k) - k md5 min-hashes of a shingle array; null for empty arrays"),
    (children: Seq[Expression]) =>
      MinHashSig(children(0), foldableInt("minhash_sig", "k", children(1)))
  )

  val srpBands: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("srp_bands"),
    info(classOf[SrpBands], "srp_bands",
      "srp_bands(vec, nPlanes, planesPerBand) - sign-random-projection LSH band signatures " +
        "over the engine's deterministic md5-parity hyperplanes"),
    (children: Seq[Expression]) => {
      val nPlanes = foldableInt("srp_bands", "nPlanes", children(1))
      val perBand = foldableInt("srp_bands", "planesPerBand", children(2))
      require(nPlanes > 0 && perBand > 0 && nPlanes % perBand == 0,
        s"srp_bands: nPlanes ($nPlanes) must be a positive multiple of planesPerBand ($perBand)")
      SrpBands(children(0), VectorExpressions.srpPlaneWeights(nPlanes), perBand)
    }
  )

  val cmsMerge: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cms_merge"),
    info(classOf[CmsMergeAgg], "cms_merge",
      "cms_merge(sketch) - aggregate: union of serialized count-min sketches " +
        "(the hll_union_agg analog for count_min_sketch blobs)"),
    // returning the AggregateFunction is the registry contract for
    // aggregates — the analyzer wraps it in an AggregateExpression
    (children: Seq[Expression]) => CmsMergeAgg(children(0))
  )

  val cmsEstimate: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cms_estimate"),
    info(classOf[CmsEstimate], "cms_estimate",
      "cms_estimate(sketch, item) - estimated count of a string item in a " +
        "serialized count-min sketch"),
    (children: Seq[Expression]) => CmsEstimate(children(0), children(1))
  )

  val misraGries: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("misra_gries"),
    info(classOf[MisraGriesAgg], "misra_gries",
      "misra_gries(item, k) - aggregate: k-counter Misra-Gries heavy-hitter " +
        "summary as map<string,bigint>; mergeable, est in [true - N/k, true]"),
    (children: Seq[Expression]) =>
      MisraGriesAgg(children(0), foldableInt("misra_gries", "k", children(1)))
  )

  /** Every engine-native SQL function, in registration order. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(cosineSimilarity, dotProduct, simhash60, minhashSig, srpBands,
      cmsMerge, cmsEstimate, misraGries)

  /** Registers on an already-built session (tests, driver-contract runs). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (id, i, builder) => reg.registerFunction(id, i, builder) }
  }
}
