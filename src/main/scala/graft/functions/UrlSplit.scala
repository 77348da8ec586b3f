package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StructField, StructType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL component split — the `q_url_normalize` extraction chain
  *
  * {{{
  *   nofrag   = regexp_replace(raw, '#.*$', '')
  *   scheme   = lower(regexp_extract(nofrag, '^([a-zA-Z]+)://', 1))
  *   hostport = regexp_extract(nofrag, '^[a-zA-Z]+://([^/?#]+)', 1)
  *   path     = regexp_extract(nofrag, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1)
  *   qs       = regexp_extract(nofrag, '\?(.*)$', 1)
  * }}}
  *
  * as ONE native codegen pass ([[NormText]] discipline). The regex form
  * walks every byte five times through the Java regex engine and
  * materializes the nofrag copy first; [[UrlSplitExpr]] walks the bytes
  * once and slices the four components out of the original buffer.
  *
  * Exactness: every delimiter those patterns test (`#`, `:`, `/`, `?`,
  * `a-zA-Z`) is a single ASCII byte, and UTF-8 continuation bytes are
  * >= 0x80, so byte scanning is exact. The only place Java regex
  * semantics diverge from "plain delimiter scan" is line terminators
  * (`.` excludes them; `$` can bind before a trailing one), so any input
  * containing a byte that can start one (0x0A, 0x0D, or the lead bytes
  * 0xC2 / 0xE2 of U+0085 / U+2028 / U+2029 — a deliberately conservative
  * superset) takes the FALLBACK path: the literal java.util.regex
  * programs above, i.e. exactly what the five built-ins would have run.
  * URLs never contain line terminators, so the fast path is the hot one.
  * Scheme matching needs no backtracking search: `([a-zA-Z]+)://` can
  * only match the MAXIMAL leading letter run (a shorter run is followed
  * by a letter, never `:`), so one run scan + a 3-byte check is the
  * whole anchor. Lowercasing is ASCII `| 0x20` on the fast path (the
  * match is all ASCII letters by construction) and
  * `UTF8String.toLowerCase` — the `Lower` routine — on the fallback.
  *
  * ExtensionsSpec pins the law: struct fields == the five-regex
  * formulation, over the order-key fixture and adversarial strings
  * (fragments, multiple `?`, missing scheme/host, line terminators,
  * multi-byte hosts, 0xC2/0xE2 fallback triggers). */
object UrlSplit {

  val schema: StructType = StructType(Seq(
    StructField("scheme", StringType, nullable = false),
    StructField("hostport", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("qs", StringType, nullable = false)))

  private val NoFragP = Pattern.compile("#.*$")
  private val SchemeP = Pattern.compile("^([a-zA-Z]+)://")
  private val HostP = Pattern.compile("^[a-zA-Z]+://([^/?#]+)")
  private val PathP = Pattern.compile("^[a-zA-Z]+://[^/?#]+([^?#]*)")
  private val QsP = Pattern.compile("\\?(.*)$")

  /** Static entry point referenced from generated code. */
  def split(raw: UTF8String): InternalRow = {
    val n = raw.numBytes
    var i = 0
    while (i < n) {
      val b = raw.getByte(i)
      // 0x0A/0x0D are line terminators; 0xC2/0xE2 (as signed bytes) lead
      // the multi-byte ones — conservative: any hit routes to the regex
      if (b == 0x0a || b == 0x0d || b == 0xc2.toByte || b == 0xe2.toByte)
        return slowSplit(raw)
      i += 1
    }
    fastSplit(raw)
  }

  private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  private def fastSplit(raw: UTF8String): InternalRow = {
    val bs = raw.getBytes
    // nofrag = prefix before the first '#' (the global replace's single
    // possible match runs from there to end of input)
    var end = 0
    while (end < bs.length && bs(end) != '#') end += 1
    var scheme = UTF8String.EMPTY_UTF8
    var hostport = UTF8String.EMPTY_UTF8
    var path = UTF8String.EMPTY_UTF8
    var i = 0
    while (i < end && isAlpha(bs(i))) i += 1
    if (i > 0 && i + 3 <= end &&
        bs(i) == ':' && bs(i + 1) == '/' && bs(i + 2) == '/') {
      val lower = new Array[Byte](i)
      var j = 0
      while (j < i) {
        lower(j) = (bs(j) | 0x20).toByte // ASCII letters only, by the scan
        j += 1
      }
      scheme = UTF8String.fromBytes(lower)
      val hs = i + 3
      var he = hs
      while (he < end && bs(he) != '/' && bs(he) != '?') he += 1
      if (he > hs) { // [^/?#]+ needs at least one byte, else no match
        hostport = UTF8String.fromBytes(bs, hs, he - hs)
        var pe = he
        while (pe < end && bs(pe) != '?') pe += 1
        path = UTF8String.fromBytes(bs, he, pe - he)
      }
    }
    var q = 0
    while (q < end && bs(q) != '?') q += 1
    val qs =
      if (q < end) UTF8String.fromBytes(bs, q + 1, end - q - 1)
      else UTF8String.EMPTY_UTF8
    new GenericInternalRow(Array[Any](scheme, hostport, path, qs))
  }

  /** The literal five-regex program, for inputs with (possible) line
    * terminators — byte-identical to the built-in chain by construction. */
  private def slowSplit(raw: UTF8String): InternalRow = {
    val nofrag = NoFragP.matcher(raw.toString).replaceAll("")
    def ext(p: Pattern): String = {
      val m = p.matcher(nofrag)
      if (m.find()) m.group(1) else ""
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(ext(SchemeP)).toLowerCase,
      UTF8String.fromString(ext(HostP)),
      UTF8String.fromString(ext(PathP)),
      UTF8String.fromString(ext(QsP))))
  }

  /** Column-level API: struct(scheme, hostport, path, qs). */
  def urlParts(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnInterop.column(
      UrlSplitExpr(org.apache.spark.sql.graftshim.ColumnInterop.expression(c)))
}

case class UrlSplitExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftshim.StringUnaryInputCast {
  override def prettyName: String = "url_split"
  override def dataType: DataType = UrlSplit.schema
  override def nullSafeEval(input: Any): Any =
    UrlSplit.split(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlSplit.split($c)")
  override protected def withNewChildInternal(newChild: Expression): UrlSplitExpr =
    copy(child = newChild)
}
