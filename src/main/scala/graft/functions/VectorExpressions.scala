package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native vector kernels as Catalyst expressions with whole-stage codegen.
  *
  * The built-in composition `aggregate(zip_with(a, b, *), 0.0, +)` is a
  * higher-order function — Spark evaluates HOF lambdas interpreted, one
  * boxed lambda call per element, which dominates pair-scan ANN workloads.
  * These expressions generate a tight primitive loop instead (~30× per
  * pair). Preference order per the engine's design rules: compose built-ins
  * where they codegen; drop to a custom `Expression` (this) where they
  * don't; never a Scala UDF (no codegen, boxing).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = $a.getDouble($i);
         |  double y = $b.getDouble($i);
         |  $dot += x * y; $nx += x * x; $ny += y * y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Plain dot product over array<double>, same codegen rationale. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $dot += $a.getDouble($i) * $b.getDouble($i); }
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Sign-random-projection band signature: for `nPlanes = planes.length`
  * hyperplanes grouped into bands of `planesPerBand`, returns one int per
  * band whose bit i is the sign of the dot product with plane
  * `band*planesPerBand + i`. One fused kernel instead of `nPlanes`
  * separate dot-product expression trees — with 128 planes the unfused
  * plan was dominated by optimizer/codegen overhead, not arithmetic. */
case class SrpBands(child: Expression, planes: Array[Array[Double]], planesPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "srp_bands"

  @transient private lazy val flat: Array[Double] = planes.flatten
  @transient private lazy val dims: Int = planes.headOption.map(_.length).getOrElse(0)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val nBands = planes.length / planesPerBand
    val out = new Array[Int](nBands)
    var p = 0
    while (p < planes.length) {
      val base = p * dims
      val n = math.min(x.numElements(), dims)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += x.getDouble(i) * flat(base + i); i += 1 }
      if (dot > 0) out(p / planesPerBand) |= 1 << (p % planesPerBand)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("srpPlanes", flat, "double[]")
    val nPlanes = planes.length
    val nBands = nPlanes / planesPerBand
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int[] $out = new int[$nBands];
         |int $n = java.lang.Math.min($a.numElements(), $dims);
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double $dot = 0.0;
         |  int base = $p * $dims;
         |  for (int $i = 0; $i < $n; $i++) { $dot += $a.getDouble($i) * $flatRef[base + $i]; }
         |  if ($dot > 0) $out[$p / $planesPerBand] |= 1 << ($p % $planesPerBand);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBands =
    copy(child = newChild)
}

object VectorExpressions {
  def cosineSimilarity(a: Column, b: Column): Column =
    GraftShims.column(CosineSimilarity(GraftShims.expression(a), GraftShims.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(GraftShims.expression(a), GraftShims.expression(b)))
  def srpBands(e: Column, planes: Array[Array[Double]], planesPerBand: Int): Column =
    GraftShims.column(SrpBands(GraftShims.expression(e), planes, planesPerBand))

  /** Deterministic ±1 SRP hyperplane weights: parity of the first hex char
    * of md5("p<plane>d<dim>"). Engine-wide canonical generator — the SQL
    * `srp_bands(vec, nPlanes, planesPerBand)` registration and the query
    * lanes must agree on the planes bit-for-bit (the DuckDB oracles embed
    * the same weights as literals). */
  def srpPlaneWeights(n: Int, dims: Int = 64): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(n, dims) { (p, d) =>
      md.reset()
      val hex = md.digest(s"p${p}d${d + 1}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val firstHexChar = f"${(hex(0) & 0xff)}%02x".charAt(0)
      if (firstHexChar.toInt % 2 == 1) 1.0 else -1.0
    }
  }
}
