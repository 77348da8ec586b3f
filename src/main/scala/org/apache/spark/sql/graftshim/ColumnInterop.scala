package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved `Column` onto ColumnNode and made the Expression
  * accessors `private[sql]`; this shim (compiled into the spark.sql
  * namespace, the standard interop point for extension libraries) exposes
  * the two conversions custom Catalyst expressions need. */
object ColumnInterop {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** String-only input contract for custom expressions. `AbstractDataType`
  * (the type of `ExpectsInputTypes.inputTypes`) is `private[sql]`, so the
  * trait mixing it in must live in the spark.sql namespace; expressions in
  * graft.* extend this to get analysis-time casting/rejection of
  * non-string arguments instead of a runtime codegen failure. */
trait StringUnaryInputCast
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
}
