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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimilarity)
    ext.injectFunction(GraftExtensions.dotProduct)
  }
}

object GraftExtensions {
  private def info(clazz: Class[_], name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

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

  /** Registers on an already-built session (tests, driver-contract runs). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    Seq(cosineSimilarity, dotProduct).foreach { case (id, i, builder) =>
      reg.registerFunction(id, i, builder)
    }
  }
}
