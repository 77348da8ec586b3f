package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnInterop
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over array<double> columns.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * materializes an intermediate product array and walks higher-order
  * lambda machinery per row; this expression is one fused loop in
  * generated code — the hot path for brute-force cosine over wide
  * embedding columns. Summation is sequential left-to-right, identical to
  * the fold it replaces (and to the DuckDB oracle), so results are
  * bit-equal.
  */
object VectorOps {
  /** Static kernel referenced from generated code. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def dotProduct(a: Column, b: Column): Column =
    ColumnInterop.column(
      DotProductExpr(ColumnInterop.expression(a), ColumnInterop.expression(b)))
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}
