package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Length, Literal, RegExpReplace, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Non-whitespace codepoint counting as a native codegen expression.
  *
  * `length(regexp_replace(text, '\s+', ''))` is the text-quality
  * pipeline's second scalar (avg token length feeds the quality score,
  * the prune threshold, and the curation gate) and it MATERIALIZES a
  * whitespace-stripped copy of every document just to take its length.
  * [[CharsNospaceExpr]] counts in ONE pass over the UTF-8 bytes: a
  * codepoint = one non-continuation byte (`(b & 0xC0) != 0x80`), and the
  * Java-regex `\s` class is 6 single-byte ASCII chars, so
  * `chars_nospace = leading bytes - whitespace bytes` — no regex, no
  * string copy, no allocation.
  *
  * Counting codepoints (not UTF-16 units) matches both Spark's `length`
  * on UTF8String and DuckDB's `length`, per the repo's parity rules. */
object CharsNospace {

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Static entry point referenced from generated code. */
  def count(s: UTF8String): Int = {
    val n = s.numBytes
    var chars = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0xc0) != 0x80 && !isWs(b)) chars += 1
      i += 1
    }
    chars
  }

  /** Column-level API. */
  def charsNospace(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnInterop.column(
      CharsNospaceExpr(org.apache.spark.sql.graftshim.ColumnInterop.expression(c)))
}

case class CharsNospaceExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftshim.StringUnaryInputCast {
  override def prettyName: String = "chars_nospace"
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    CharsNospace.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharsNospace.count($c)")
  override protected def withNewChildInternal(newChild: Expression): CharsNospaceExpr =
    copy(child = newChild)
}

/** Optimizer rewrite: `length(regexp_replace(x, '\s+', ''))` →
  * [[CharsNospaceExpr]](x). Narrow on purpose: the exact `\s+` pattern,
  * empty replacement, default position. Null semantics are identical
  * (both are null-safe unary), so the rewrite is a pure plan-level no-op
  * that the oracle-gated text queries re-prove on real data. */
object CharsNospaceRewrite extends Rule[LogicalPlan] {
  private val WsPattern = UTF8String.fromString("""\s+""")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Length(RegExpReplace(subj,
            Literal(p: UTF8String, StringType),
            Literal(r: UTF8String, StringType), Literal(1, IntegerType)))
          if p == WsPattern && r != null && r.numBytes == 0 &&
            subj.dataType == StringType =>
        CharsNospaceExpr(subj)
    }
}
