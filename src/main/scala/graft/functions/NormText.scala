package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Lower, RegExpReplace, StringTrim, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Corpus text normalization — `trim(regexp_replace(lower(text), '\s+',
  * ' '))`, the [[graft.ops.Dedup.normText]] idiom every exact/near-dup
  * fingerprint computes over every byte of the corpus — as ONE native
  * codegen pass.
  *
  * The regex form materializes a full whitespace-collapsed copy through
  * the Java regex engine (NFA scan + StringBuilder) before trim copies
  * again. [[NormTextExpr]] lowercases via `UTF8String.toLowerCase` — the
  * exact routine Spark's `Lower` uses under the default collation, so
  * byte-identical — then walks the lowered bytes once: the Java-regex
  * `\s` class is 6 single-byte ASCII chars (continuation bytes of
  * multi-byte codepoints are >= 0x80, so the byte test is exact in
  * UTF-8), leading/trailing runs drop, interior runs emit one 0x20.
  * Trim-equivalence: after the collapse a leading/trailing `\s+` run is
  * exactly one ' ', which `trim` removes — dropping the runs outright is
  * the same function. NBSP (U+00A0) and other non-Java-`\s` Unicode
  * whitespace are CONTENT in both forms.
  *
  * [[NormTextRewrite]] rewrites the exact idiom at plan time, so every
  * existing call site (exact fps, SimHash, Winnow inputs) gets the
  * single-pass form with the oracle SQL untouched; ExtensionsSpec pins
  * rewrite-fires + equality laws. */
object NormText {

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Static entry point referenced from generated code. */
  def norm(s0: UTF8String): UTF8String = {
    val s = s0.toLowerCase
    val n = s.numBytes
    val out = new Array[Byte](n)
    var i = 0
    var o = 0
    var pending = false
    while (i < n) {
      val b = s.getByte(i)
      if (isWs(b)) {
        if (o > 0) pending = true
      } else {
        if (pending) { out(o) = 0x20; o += 1; pending = false }
        out(o) = b
        o += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** Column-level API. */
  def normText(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnInterop.column(
      NormTextExpr(org.apache.spark.sql.graftshim.ColumnInterop.expression(c)))
}

case class NormTextExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftshim.StringUnaryInputCast {
  override def prettyName: String = "norm_text"
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    NormText.norm(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormText.norm($c)")
  override protected def withNewChildInternal(newChild: Expression): NormTextExpr =
    copy(child = newChild)
}

/** Optimizer rewrite: `trim(regexp_replace(lower(x), '\s+', ' '))` →
  * [[NormTextExpr]](x). Narrow on purpose: exactly the normText idiom
  * (that pattern, single-space replacement, default position, plain
  * one-argument trim). Null semantics identical (all layers and the
  * replacement are null-safe unary over x), so the rewrite is a pure
  * plan-level no-op that the oracle-gated dedup queries re-prove on
  * real data at every scale factor. */
object NormTextRewrite extends Rule[LogicalPlan] {
  private val WsPattern = UTF8String.fromString("""\s+""")
  private val OneSpace = UTF8String.fromString(" ")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case StringTrim(RegExpReplace(Lower(subj),
            Literal(p: UTF8String, StringType),
            Literal(r: UTF8String, StringType), Literal(1, IntegerType)),
          None)
          if p == WsPattern && r == OneSpace &&
            subj.dataType == StringType =>
        NormTextExpr(subj)
    }
}
