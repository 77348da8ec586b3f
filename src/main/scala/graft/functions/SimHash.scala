package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash document fingerprint.
  *
  * Whitespace-tokenizes the input, MD5-hashes each token to 64 bits, and
  * accumulates +1/-1 per bit position weighted by token occurrence; the
  * sign vector is the fingerprint. Near-duplicate documents differ in a few
  * bits (compare with `bit_count(a ^ b)`).
  *
  * Implemented as a native Catalyst [[Expression]] with real codegen (the
  * generated Java calls the static [[SimHash.compute]]), so it stays inside
  * whole-stage codegen rather than dropping to a Scala UDF — the preference
  * order SURVEY.md §7.3 sets for operators Spark lacks.
  */
object SimHash {
  /** Static entry point referenced from generated code. */
  def compute(s: UTF8String): Long = computeString(s.toString)

  def computeString(s: String): Long = {
    val acc = new Array[Int](64)
    val md = MessageDigest.getInstance("MD5")
    var start = 0
    val str = s
    val len = str.length
    var i = 0
    while (i <= len) {
      if (i == len || Character.isWhitespace(str.charAt(i))) {
        if (i > start) {
          val token = str.substring(start, i)
          val d = md.digest(token.getBytes(StandardCharsets.UTF_8))
          // first 8 bytes -> 64-bit token hash
          var h = 0L
          var b = 0
          while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
          var bit = 0
          while (bit < 64) {
            if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
            bit += 1
          }
          md.reset()
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (acc(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** Static entry point referenced from generated code (16-bit variant). */
  def compute16(s: UTF8String): Long = compute16String(s.toString)

  /** 16-bit portable SimHash: token hash = first 16 bits of md5(token)
    * (== the integer value of the first 4 hex chars of the digest), bit
    * votes accumulated with token multiplicity, fingerprint bit b set iff
    * vote(b) > 0, b counted from the LOW end of the token hash. Every step
    * is md5 + integer bit-ops, so a SQL engine reproduces it exactly —
    * this is the oracle-checkable twin of the 64-bit [[computeString]]. */
  def compute16String(s: String): Long = {
    val acc = new Array[Int](16)
    val md = MessageDigest.getInstance("MD5")
    var start = 0
    val len = s.length
    var i = 0
    while (i <= len) {
      if (i == len || Character.isWhitespace(s.charAt(i))) {
        if (i > start) {
          val token = s.substring(start, i)
          val d = md.digest(token.getBytes(StandardCharsets.UTF_8))
          val h = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
          var bit = 0
          while (bit < 16) {
            if (((h >>> bit) & 1) == 1) acc(bit) += 1 else acc(bit) -= 1
            bit += 1
          }
          md.reset()
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 16) {
      if (acc(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** Column-level API (Spark 4: Column <-> Expression via the sql-package
    * interop shim). */
  def simhash(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnInterop.column(
      SimHashExpr(org.apache.spark.sql.graftshim.ColumnInterop.expression(c)))

  /** Column-level API for the 16-bit portable variant. */
  def simhash16(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnInterop.column(
      SimHash16Expr(org.apache.spark.sql.graftshim.ColumnInterop.expression(c)))
}

case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

case class SimHash16Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SimHash.compute16(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.compute16($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash16Expr =
    copy(child = newChild)
}
