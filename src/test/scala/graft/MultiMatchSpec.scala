package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.MultiMatch

/** Laws for the Aho–Corasick multi-pattern counter: equivalence to the
  * naive per-pattern greedy scan (the DuckDB replace identity), overlap
  * collapse, suffix-link reporting, and codegen/eval agreement through a
  * real plan. */
class MultiMatchSpec extends SparkSuite {

  /** Reference semantics: per pattern independently, greedy left-to-right
    * non-overlapping occurrences — what
    * (length(t) - length(replace(t, p, ''))) / length(p) computes. */
  private def naive(text: String, pats: Seq[String]): Seq[Long] =
    pats.map { p =>
      var cnt = 0L
      var from = 0
      var i = text.indexOf(p, from)
      while (i >= 0) { cnt += 1; from = i + p.length; i = text.indexOf(p, from) }
      cnt
    }

  test("same-pattern overlaps collapse greedily (the replace identity)") {
    val a = MultiMatch.automaton(Array("x x"))
    assert(a.countsString("x x x").toSeq == Seq(1L)) // NOT 2: overlap at pos 2
    assert(a.countsString("x x x x").toSeq == Seq(2L))
    assert(naive("x x x", Seq("x x")) == Seq(1L))
  }

  test("different patterns may overlap; suffix-link matches are reported") {
    // "bab" ends inside "abab"'s second "ab"; both must count
    val a = MultiMatch.automaton(Array("ab", "bab"))
    assert(a.countsString("abab").toSeq == Seq(2L, 1L))
    // pattern that is a proper suffix of another, found only via the
    // dictionary link of the longer pattern's path
    val b = MultiMatch.automaton(Array("he", "she", "his", "hers"))
    assert(b.countsString("ushers").toSeq == Seq(1L, 1L, 0L, 1L))
  }

  test("randomized law: automaton == naive greedy scan per pattern") {
    val rnd = new Random(42)
    val alphabet = "ab "
    (1 to 300).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(60))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val nPats = 1 + rnd.nextInt(5)
      val pats = Iterator.continually(
        Seq.fill(1 + rnd.nextInt(4))(
          alphabet(rnd.nextInt(alphabet.length))).mkString)
        .distinct.take(nPats).toArray
      val got = MultiMatch.automaton(pats).countsString(text).toSeq
      assert(got == naive(text, pats.toSeq),
        s"text='$text' pats=${pats.mkString("[", ",", "]")}")
    }
  }

  test("expression evaluates through a real plan (codegen path) and matches eval") {
    val pats = Seq("the quick", "brown fox", "fox")
    val texts = Seq(
      "the quick brown fox jumps over the quick brown fox",
      "no match here", "fox fox fox")
    import spark.implicits._
    val df = texts.toDF("t")
      .select(MultiMatch.multiMatchCounts(col("t"), pats).as("c"))
    val rows = df.collect().map(_.getSeq[Long](0).toSeq).toSeq
    assert(rows == texts.map(t => naive(t, pats)))
    // the plan carries the native expression, not an rlike/replace chain
    // (over a parquet scan — a local relation would constant-fold away)
    val scan = spark.read.parquet(s"$sf/documents.parquet")
      .select(MultiMatch.multiMatchCounts(col("text"), pats).as("c"))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("multi_match_counts"))
    assert(!plan.toLowerCase.contains("rlike"))
  }

  test("streaming blocklist gate: survivors + audit match the batch rules") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graftcur")
      .toFile.getAbsolutePath
    val pats = Seq("bad phrase", "also banned")
    val src = MemoryStream[(Long, String)]
    val docs = src.toDF().toDF("doc_id", "text")
    def run(): Unit = graft.streaming.CurationStream.runBlocklistGate(
      spark, docs, pats, s"$tmp/kept", s"$tmp/audit", s"$tmp/ckpt")
    // batch 1: 1 kept, 2 blocked (hit), 3 too short
    src.addData(
      (1L, "a perfectly fine long document"),
      (2L, "contains a bad phrase in the middle"),
      (3L, "too short"))
    run()
    // batch 2: 4 blocked by the second pattern, 5 kept, 6 null text and
    // 7 whitespace-only — both must land in the SHORT bucket, not vanish
    // (the ledger invariant n_in = blocked + short + kept)
    src.addData(
      (4L, "this text is also banned for sure"),
      (5L, "another clean document that survives"),
      (6L, null.asInstanceOf[String]),
      (7L, "   "))
    run()
    val kept = spark.read.parquet(s"$tmp/kept")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L), s"wrong survivors: $kept")
    val audit = spark.read.parquet(s"$tmp/audit")
      .orderBy("batch_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(audit.toSeq == Seq((0L, 3L, 1L, 1L, 1L), (1L, 4L, 1L, 2L, 1L)),
      s"wrong audit ledger: ${audit.toSeq}")
    audit.foreach { case (_, nIn, b, sh, k) =>
      assert(nIn == b + sh + k, "audit buckets must partition the batch")
    }
    // replay-idempotence law: re-running the LAST committed batch — what
    // a crash recovery does when the sink write landed but the checkpoint
    // commit didn't — must leave both stores byte-identical (the
    // overwrite-by-batch-id sink makes the append exactly-once)
    def snap(path: String): Seq[String] =
      spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    val keptBefore = snap(s"$tmp/kept")
    val auditBefore = snap(s"$tmp/audit")
    val replay = Seq(
      (4L, "this text is also banned for sure"),
      (5L, "another clean document that survives"),
      (6L, null.asInstanceOf[String]),
      (7L, "   ")).toDF("doc_id", "text")
    graft.streaming.CurationStream.processBatch(
      replay, 1L, pats, s"$tmp/kept", s"$tmp/audit", 3)
    assert(snap(s"$tmp/kept") == keptBefore,
      "replaying a committed batch must not change the kept store")
    assert(snap(s"$tmp/audit") == auditBefore,
      "replaying a committed batch must not change the audit ledger")
  }

  test("blocklist query: per-doc totals equal the sum of its pattern hits") {
    val df = graft.queries.TextQueries.queries("q_blocklist_hits")(
      spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty, "fixture corpus must trip the derived blocklist")
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val total = rs.map(_.getLong(2)).sum
      assert(rs.forall(_.getLong(3) == total))
      assert(rs.forall(_.getBoolean(4) == (total >= 4)))
    }
  }
}
