package graft.functions

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring counter (Aho & Corasick, CACM
  * 1975) — the blocklist primitive of web-corpus curation (the C4
  * "bad words" filter class: match a document against THOUSANDS of
  * banned phrases). The win over per-pattern scanning is structural:
  * one automaton pass over the text costs O(len + matches) regardless
  * of pattern count, where the `replace`/`rlike`-per-pattern
  * formulation rescans the corpus once PER PATTERN — at a production
  * blocklist size (10k+ phrases) that is a 10,000× scan blowup no
  * cluster survives.
  *
  * COUNTING SEMANTICS: per pattern, GREEDY LEFT-TO-RIGHT NON-OVERLAPPING
  * occurrences — exactly what SQL's
  * `(length(t) - length(replace(t, p, ''))) / length(p)` computes, so a
  * DuckDB oracle replays the counts with no automaton at all. (Matches
  * of DIFFERENT patterns may overlap freely; only same-pattern overlaps
  * collapse.) Aho–Corasick discovers each pattern's occurrences in
  * increasing end-position order, so the greedy filter is one
  * last-accepted-end register per pattern.
  *
  * Native Catalyst expression (generated code calls the automaton via a
  * plan reference object — stays inside whole-stage codegen), no UDF
  * serialization. The automaton is built ONCE PER EXECUTOR from the
  * pattern list riding the serialized plan (content-keyed cache), so a
  * 10k-phrase blocklist costs one trie build per JVM, not per task.
  */
object MultiMatch {

  /** Frozen automaton: goto edges in one open-addressed long→int table
    * (key = node << 16 | utf16Char — no per-node alphabet arrays, so
    * memory is O(total pattern chars) however wide the alphabet), fail
    * links, and dictionary suffix links for O(matches) reporting. */
  final class Automaton(val patterns: Array[String]) extends Serializable {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty strings")
    require(patterns.distinct.length == patterns.length,
      "patterns must be distinct")

    // --- build: mutable trie -------------------------------------------
    private val (keys, vals, fail, dict, patEnd, mask) = {
      val edges = new java.util.HashMap[java.lang.Long, Integer]()
      val endAt = mutable.ArrayBuffer(-1) // node -> pattern id ending here
      var nNodes = 1
      def edgeKey(st: Int, ch: Char): java.lang.Long =
        java.lang.Long.valueOf((st.toLong << 16) | ch.toLong)
      patterns.zipWithIndex.foreach { case (p, pid) =>
        var st = 0
        p.foreach { ch =>
          val k = edgeKey(st, ch)
          val nxt = edges.get(k)
          if (nxt == null) {
            edges.put(k, nNodes); endAt += -1; st = nNodes; nNodes += 1
          } else st = nxt.intValue()
        }
        endAt(st) = pid
      }
      val failA = new Array[Int](nNodes)
      val dictA = new Array[Int](nNodes)
      // BFS over trie edges to resolve fail + dictionary links
      val byNode = Array.fill(nNodes)(mutable.ArrayBuffer.empty[(Char, Int)])
      edges.forEach { (k, v) =>
        byNode((k >> 16).toInt) += (((k & 0xffffL).toChar, v.intValue()))
      }
      val queue = mutable.Queue.empty[Int]
      byNode(0).foreach { case (_, v) => failA(v) = 0; queue += v }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        dictA(u) =
          if (endAt(failA(u)) >= 0) failA(u) else dictA(failA(u))
        byNode(u).foreach { case (ch, v) =>
          var f = failA(u)
          var hop = edges.get(edgeKey(f, ch))
          while (f != 0 && hop == null) {
            f = failA(f); hop = edges.get(edgeKey(f, ch))
          }
          failA(v) = if (hop != null && hop.intValue() != v) hop.intValue() else 0
          queue += v
        }
      }
      // freeze the edge map into an open-addressed table (linear probe,
      // power-of-2, EMPTY = -1; keys are >= 0 by construction)
      var cap = 8
      while (cap < edges.size * 2) cap <<= 1
      val ks = Array.fill(cap)(-1L)
      val vs = new Array[Int](cap)
      val m = cap - 1
      edges.forEach { (k, v) =>
        var i = (java.lang.Long.hashCode(k) * 0x9e3779b9) & m
        while (ks(i) != -1L) i = (i + 1) & m
        ks(i) = k; vs(i) = v.intValue()
      }
      (ks, vs, failA, dictA, endAt.toArray, m)
    }

    @inline private def step(st: Int, ch: Char): Int = {
      val k = (st.toLong << 16) | ch.toLong
      var i = (java.lang.Long.hashCode(k) * 0x9e3779b9) & mask
      while (keys(i) != -1L && keys(i) != k) i = (i + 1) & mask
      if (keys(i) == k) vals(i) else -1
    }

    private val patLen: Array[Int] = patterns.map(_.length)

    def counts(s: UTF8String): Array[Long] = countsString(s.toString)

    /** Greedy non-overlapping per-pattern counts in one pass. */
    def countsString(text: String): Array[Long] = {
      val cnt = new Array[Long](patterns.length)
      val lastEnd = new Array[Int](patterns.length) // 0 = nothing accepted
      var st = 0
      var i = 0
      val n = text.length
      while (i < n) {
        val ch = text.charAt(i)
        var nxt = step(st, ch)
        while (st != 0 && nxt == -1) { st = fail(st); nxt = step(st, ch) }
        st = if (nxt == -1) 0 else nxt
        // report: this node if it ends a pattern, then the dict chain
        var o = if (patEnd(st) >= 0) st else dict(st)
        while (o != 0) {
          val pid = patEnd(o)
          val start = i + 1 - patLen(pid)
          if (start >= lastEnd(pid)) { cnt(pid) += 1; lastEnd(pid) = i + 1 }
          o = dict(o)
        }
        i += 1
      }
      cnt
    }
  }

  /** One automaton per (executor JVM, pattern list): the expression ships
    * only the string array; the trie is rebuilt lazily and shared. The
    * cache is BOUNDED (a long-lived executor seeing many blocklist
    * versions must not accumulate one trie per version forever) and the
    * key is LENGTH-PREFIXED, so no pattern content -- including embedded
    * NUL or separator characters -- can make two distinct lists collide. */
  private val MaxCached = 8
  private val cache = TrieMap.empty[String, Automaton]
  def automaton(patterns: Array[String]): Automaton = {
    val key = patterns.map(p => s"${p.length}:$p").mkString("|")
    cache.getOrElse(key, {
      // evict ONE entry at the bound, not the whole map: a long-lived
      // executor alternating among many blocklist versions would rebuild
      // every hot trie after each clear(). The victim is headOption —
      // arbitrary hash order, NOT LRU — so the hottest automaton can be
      // evicted while a cold one survives; with MaxCached=8 that is
      // bounded churn (worst case: 9 alternating versions thrash one
      // slot), not a correctness issue, and not worth an access-ordered
      // map under a lock on this path. The size-check/insert pair is
      // racy but benign — concurrent first builds can transiently exceed
      // the bound by one entry each, and the next miss re-trims.
      if (cache.size >= MaxCached)
        cache.headOption.foreach { case (k, _) => cache.remove(k) }
      cache.getOrElseUpdate(key, new Automaton(patterns))
    })
  }

  /** array<long> of per-pattern non-overlapping counts, aligned with
    * `patterns` order. */
  def multiMatchCounts(c: Column, patterns: Seq[String]): Column =
    org.apache.spark.sql.graftshim.ColumnInterop.column(
      MultiMatchCountsExpr(
        org.apache.spark.sql.graftshim.ColumnInterop.expression(c),
        patterns))
}

case class MultiMatchCountsExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  override def prettyName: String = "multi_match_counts"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val auto = MultiMatch.automaton(patterns.toArray)

  override def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(auto.counts(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", auto,
      classOf[MultiMatch.Automaton].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($ref.counts($c))")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MultiMatchCountsExpr = copy(child = newChild)
}
