package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the
  * canonical-composition pass a dedup key needs before hashing: "café"
  * typed with a precomposed U+00E9 and "café" typed as e + combining
  * U+0301 are DIFFERENT byte strings (different md5, different shingles,
  * different exact-dup fingerprints) that render identically; NFC maps
  * both to one canonical form. Real multi-source corpora mix the two
  * constantly (different editors, OCR, keyboard layouts), so exact dedup
  * WITHOUT this pass silently misses visually-identical duplicates.
  *
  * Fast path: `Normalizer.isNormalized` is a scan without allocation,
  * and real-world text is overwhelmingly already NFC — the common case
  * costs one pass and returns the input UTF8String untouched.
  *
  * Cross-engine: DuckDB's `nfc_normalize` implements the same Unicode
  * canonical composition, which is what lets NFC-keyed queries hash-gate.
  */
object Nfc {

  /** Static entry point referenced from generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column-level API. */
  def nfc(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnInterop.column(
      NfcExpr(org.apache.spark.sql.graftshim.ColumnInterop.expression(c)))
}

case class NfcExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftshim.StringUnaryInputCast {
  override def prettyName: String = "nfc"
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Nfc.normalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Nfc.normalize($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcExpr =
    copy(child = newChild)
}
