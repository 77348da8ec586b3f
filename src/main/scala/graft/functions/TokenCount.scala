package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Size, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.RegExpExtractAll
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace-token counting as a native codegen expression.
  *
  * `size(regexp_extract_all(text, '\S+'))` is the corpus pipeline's
  * hottest scalar (quality gate, curation flow, token histogram, pack
  * plan, corpus stats all count tokens) and it materializes an array of
  * every token just to take its length. [[TokenCountExpr]] counts maximal
  * non-whitespace runs in ONE pass over the UTF-8 bytes — no regex
  * machinery, no array, no per-token allocation.
  *
  * Semantics are EXACTLY Java-regex `\S+` match counting: whitespace is
  * the 6-char class [ \t\n\x0B\f\r]. All six are single ASCII bytes and
  * UTF-8 multi-byte sequences contain no bytes < 0x80, so byte runs equal
  * character runs on ANY input (law-tested against the regex form in
  * DedupPropsSpec, including the \x0B edge where RE2-based engines
  * differ — which is why the DuckDB oracles keep using the regex form and
  * the equivalence is proven Spark-side).
  */
object TokenCount {

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Static entry point referenced from generated code. */
  def count(s: UTF8String): Int = {
    val n = s.numBytes
    var tokens = 0
    var inTok = false
    var i = 0
    while (i < n) {
      val ws = isWs(s.getByte(i))
      if (!ws && !inTok) tokens += 1
      inTok = !ws
      i += 1
    }
    tokens
  }

  /** Column-level API. */
  def tokenCount(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnInterop.column(
      TokenCountExpr(org.apache.spark.sql.graftshim.ColumnInterop.expression(c)))
}

// StringUnaryInputCast: non-string args are cast (or rejected) at ANALYSIS
// time instead of failing inside generated code at runtime
case class TokenCountExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftshim.StringUnaryInputCast {
  override def prettyName: String = "token_count"
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    TokenCount.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCount.count($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenCountExpr =
    copy(child = newChild)
}

/** Optimizer rewrite: `size(regexp_extract_all(x, '\S+', 0))` →
  * [[TokenCountExpr]](x). Matching is deliberately narrow — group 0 only,
  * the exact `\S+` pattern — and null semantics are preserved exactly:
  * non-legacy `size` yields NULL on NULL input (as does TokenCountExpr);
  * legacy `size` (the ANSI-off default) yields -1, so that variant
  * rewrites to `coalesce(token_count(x), -1)`. A pure plan-level no-op
  * that every oracle-gated query re-proves on real data. */
object TokenCountRewrite extends Rule[LogicalPlan] {
  private val TokenPattern = UTF8String.fromString("""\S+""")

  private object TokenArray {
    def unapply(e: Expression): Option[Expression] = e match {
      case RegExpExtractAll(subj,
            Literal(p: UTF8String, StringType), Literal(0, IntegerType))
          if p == TokenPattern && subj.dataType == StringType => Some(subj)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(TokenArray(subj), false) =>
        TokenCountExpr(subj)
      case Size(TokenArray(subj), true) if !subj.nullable =>
        TokenCountExpr(subj)
      case Size(TokenArray(subj), true) =>
        org.apache.spark.sql.catalyst.expressions.Coalesce(
          Seq(TokenCountExpr(subj), Literal(-1)))
    }
}
