package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity expression that reports itself non-deterministic: an explicit
  * optimizer fence around an expensive column.
  *
  * Why it exists: Catalyst has no common-subexpression sharing across
  * operators — `CollapseProject` and `PushDownPredicates` substitute a
  * projected expression into every downstream reference. For a cheap
  * expression that's the right call; for a `from_json`-over-a-raw-log-line
  * map used by a dozen consumers it multiplies both the plan (observed
  * 1.3M-char plans / 50 MiB task binaries before this fence) and the
  * runtime (the JSON parse re-runs per reference). Wrapping the column in
  * a non-deterministic no-op makes the substitution illegal, so the value
  * is computed once per row and every consumer reads the attribute.
  *
  * Codegen-transparent: delegates straight to the child, so whole-stage
  * codegen still fuses through it. The only cost is the optimizer fence
  * itself (e.g. literal-input pipelines stop constant-folding).
  */
case class OptimizerBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): OptimizerBarrier =
    copy(child = newChild)
  override def prettyName: String = "barrier"
}

object OptimizerBarrier {
  /** Fence a column: evaluated once per row, never re-inlined downstream. */
  def once(c: Column): Column =
    GraftShims.column(OptimizerBarrier(GraftShims.expression(c)))
}
