package graft

import org.apache.spark.sql.functions._
import graft.ops.Retrieval

/** Laws for the retrieval operators ([[graft.ops.Retrieval]]): the
  * integer BM25 against a naive BigInt reimplementation, and the
  * block-delta postings cost against a REAL LEB128 encoder. */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "apple banana apple cherry"),
    (1L, "banana banana durian"),
    (2L, "apple cherry cherry cherry fig grape"),
    (3L, "durian fig"),
    (4L, "apple apple apple banana cherry durian fig grape hazel iris"),
    (5L, "hazel iris iris"),
    (6L, ""),
    (7L, "grape"))

  /** Naive rational-idf BM25 in BigInt — the contribution formula
    * restated independently from first principles. */
  private def naiveBm25(query: Seq[String]): Map[Long, (Long, BigInt)] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val n = BigInt(corpus.size)
    val tTot = BigInt(toks.values.map(_.size).sum)
    val df = query.map(t => t -> BigInt(toks.count(_._2.contains(t)))).toMap
    toks.toSeq.flatMap { case (id, ws) =>
      val dl = BigInt(ws.size)
      val hits = query.filter(ws.contains)
      if (hits.isEmpty) None
      else {
        val score = hits.map { t =>
          val tf = BigInt(ws.count(_ == t))
          (BigInt(2) * (n - df(t)) + 1) * 22 * tf * tTot * 1000000 /
            ((BigInt(2) * df(t) + 1) * (10 * tf * tTot + 3 * tTot + 9 * dl * n))
        }.sum
        Some(id -> (hits.size.toLong, score))
      }
    }.toMap
  }

  test("bm25TopK matches the naive BigInt scorer, rank ties broken by doc id") {
    val docs = corpus.toDF("doc_id", "text").repartition(5)
    // query doc 0's top-5 terms are all its distinct tokens
    val got = Retrieval.bm25TopK(docs, col("doc_id") < 1, nTerms = 5, k = 10)
      .orderBy("rank").collect()
    val want = naiveBm25(Seq("apple", "banana", "cherry"))
    assert(got.length == want.size)
    val ranked = want.toSeq.sortBy { case (id, (_, s)) => (-s, id) }
    got.zip(ranked).foreach { case (r, (id, (nHit, score))) =>
      assert(r.getAs[Long]("doc_id") == id)
      assert(r.getAs[Long]("n_terms_hit") == nHit)
      assert(BigInt(r.getAs[Long]("score")) == score)
    }
  }

  /** Real LEB128: 7 value bits per byte. */
  private def varintBytes(v: Long): Long = {
    var x = v; var b = 0L
    while ({ b += 1; x >>= 7; x != 0 }) ()
    b
  }

  test("invertedIndexStats encoded_bytes equals a real LEB128 encoding of block gaps") {
    // doc ids straddling several 128-blocks, repeated tokens
    val docs = Seq(1L, 2L, 100L, 127L, 128L, 129L, 300L, 1000L, 1001L)
      .map(id => (id, "tok filler" + (if (id % 2 == 0) " even" else "")))
      .toDF("doc_id", "text").repartition(4)
    val got = Retrieval.invertedIndexStats(docs, blockSize = 128, topN = 10)
      .collect().map(r => r.getAs[String]("tok") ->
        (r.getAs[Long]("df"), r.getAs[Long]("n_blocks"),
          r.getAs[Long]("encoded_bytes"))).toMap
    // naive: per token, per 128-block, LEB128 of (first: id - 128*blk + 1,
    // rest: delta to previous)
    def naive(ids: Seq[Long]): (Long, Long, Long) = {
      val blocks = ids.sorted.groupBy(_ / 128)
      val bytes = blocks.values.map { blk =>
        val gaps = (blk.head - blk.head / 128 * 128 + 1) +:
          blk.sliding(2).collect { case Seq(a, b) => b - a }.toSeq
        gaps.map(varintBytes).sum
      }.sum
      (ids.size.toLong, blocks.size.toLong, bytes)
    }
    val all = Seq(1L, 2L, 100L, 127L, 128L, 129L, 300L, 1000L, 1001L)
    assert(got("tok") == naive(all))
    assert(got("filler") == naive(all))
    assert(got("even") == naive(all.filter(_ % 2 == 0)))
  }

  test("incremental BM25 index merge equals the full rebuild (restriction law)") {
    // append-only split mid-corpus: ids <= 4 are the shipped index,
    // ids >= 5 the arriving batch (larger than every indexed id)
    val docs = corpus.toDF("doc_id", "text").repartition(5)
    val base = docs.filter(col("doc_id") <= 4)
    val delta = docs.filter(col("doc_id") > 4)
    val merged = Retrieval.mergeBm25Index(Retrieval.buildBm25Index(base), delta)
    val incr = Retrieval.bm25TopKFromScores(
        Retrieval.bm25ScoresFromIndex(merged, col("doc_id") < 1, nTerms = 5), 10)
      .orderBy("rank").collect()
    val full = Retrieval.bm25TopK(docs, col("doc_id") < 1, nTerms = 5, k = 10)
      .orderBy("rank").collect()
    assert(incr.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
    // and the merged stats frame really added the batch
    val st = merged.stats.head()
    assert(st.getAs[Long]("n") == corpus.size)
  }

  test("incremental block merge equals the full rebuild, boundary block re-priced") {
    // ids straddle a 128-block boundary AND the batch split lands
    // mid-block (base ends at 129, delta starts at 300 in the same
    // block-2-and-up range; block 1 gets delta-only id 135)
    val all = Seq(1L, 2L, 100L, 127L, 128L, 129L, 135L, 300L, 1000L, 1001L)
    def tfOf(ids: Seq[Long]) = Retrieval.termFrequencies(
      ids.map(id => (id, "tok filler")).toDF("doc_id", "text"))
    val (baseIds, deltaIds) = all.partition(_ <= 129)
    val merged = Retrieval.mergeIndexBlocks(
      Retrieval.indexBlocks(tfOf(baseIds)), tfOf(deltaIds))
      .orderBy("tok", "blk").collect().map(_.toSeq).toSeq
    val full = Retrieval.indexBlocks(tfOf(all))
      .orderBy("tok", "blk").collect().map(_.toSeq).toSeq
    assert(merged == full)
    // delta lands mid-block for block 1 (135 after base 128, 129):
    // the bridge-gap correction is exercised, not just block pass-through
    assert(baseIds.exists(_ / 128 == 1) && deltaIds.exists(_ / 128 == 1))
  }

  test("phraseMatch equals a naive token-subsequence scan") {
    val docs = (corpus :+ (8L, "apple banana apple apple banana apple cherry"))
      .toDF("doc_id", "text").repartition(3)
    val got = Retrieval.phraseMatch(docs, col("doc_id") < 1, phraseLen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // query: doc 0's first 3 tokens = ["apple", "banana", "apple"]
    val phrase = Seq("apple", "banana", "apple")
    val want = (corpus :+ ((8L, "apple banana apple apple banana apple cherry")))
      .flatMap { case (id, t) =>
        val ws = t.split("\\s+").filter(_.nonEmpty).toSeq
        val n = ws.sliding(3).count(_ == phrase)
        if (n > 0) Some((0L, id) -> n.toLong) else None
      }.toMap
    assert(got == want)
    // doc 8 contains the phrase twice (overlapping occurrences at
    // starts 1 and 4) — the start-anchored count must see both
    assert(want((0L, 8L)) == 2L)
  }

  test("phraseMatch plans as a broadcast posting probe, never a substring scan") {
    val docs = corpus.toDF("doc_id", "text")
    val plan = Retrieval.phraseMatch(docs, col("doc_id") < 1)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastHashJoin"),
      s"phrase terms lost the broadcast probe:\n${plan.take(1200)}")
    assert(!plan.toLowerCase.contains("rlike") && !plan.contains("Contains("),
      s"phrase match degraded to a substring scan:\n${plan.take(1200)}")
  }

  test("maxscore safety: every top-k doc contains at least one essential term") {
    val docs = graft.core.Tables.documents(spark, sf).select("doc_id", "text")
    val idx = Retrieval.buildBm25Index(docs)
    val pred = col("doc_id") < 3
    val contribs = Retrieval.bm25TermContribs(idx, pred, 5).cache()
    val scored = contribs.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("c")).as("score"))
    val thr = Retrieval.bm25TopKFromScores(scored, 10)
      .groupBy("query_id").agg(min(col("score")).as("threshold"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // per (query, term): bound + postings; essential = NOT in the
    // ascending-bound prefix whose cum stays strictly below the floor
    val bounds = contribs.groupBy("query_id", "tok")
      .agg(max(col("c")).as("ub")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val essential = bounds.groupBy(_._1).toSeq.flatMap { case (q, ts) =>
      var cum = BigInt(0)
      ts.sortBy(t => (t._3, t._2)).toSeq.flatMap { case (_, tok, ub) =>
        cum += ub
        if (cum < thr(q)) None else Some((q, tok))
      }
    }.toSet
    // the report's counts agree with this recomputation
    val report = SparkEntry.queries("q_maxscore_prune")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    report.foreach { case (q, (nTerms, nNon)) =>
      val ess = essential.count(_._1 == q)
      assert(nTerms - nNon == ess, s"query $q essential count")
      assert(nNon > 0, s"query $q: pruning degenerate (no skippable terms)")
    }
    // safety: a doc in the final top-k always matched an essential term
    val termsByDoc = contribs.select("query_id", "doc_id", "tok").collect()
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .view.mapValues(_.map(_.getString(2)).toSet).toMap
    val topk = Retrieval.bm25TopKFromScores(scored, 10).collect()
    assert(topk.nonEmpty)
    topk.foreach { r =>
      val (q, d) = (r.getLong(0), r.getLong(1))
      assert(termsByDoc((q, d)).exists(t => essential((q, t))),
        s"top-k doc $d of query $q has only non-essential terms")
    }
    contribs.unpersist()
    graft.core.SharedFrames.clear()
  }

  test("blockmax safety: flags re-verify in BigInt; top-k docs keep a live block") {
    val docs = graft.core.Tables.documents(spark, sf).select("doc_id", "text")
    val idx = Retrieval.buildBm25Index(docs)
    val pred = col("doc_id") < 3
    val contribs = Retrieval.bm25TermContribs(idx, pred, 5).cache()
    val scored = contribs.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("c")).as("score"))
    val thr = Retrieval.bm25TopKFromScores(scored, 10)
      .groupBy("query_id").agg(min(col("score")).as("threshold"))
      .collect().map(r => r.getLong(0) -> BigInt(r.getLong(1))).toMap
    val ub = contribs.groupBy("query_id", "tok").agg(max(col("c")).as("ub"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> BigInt(r.getLong(2)))
      .toMap
    val tot = ub.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val rows = contribs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), BigInt(r.getLong(3))))
    // per (query, term, block): recompute the skip flag from scratch
    val blkMax = rows.groupBy(t => (t._1, t._2, t._3 / 128))
      .view.mapValues(_.map(_._4).max).toMap
    val skip = blkMax.map { case (k @ (q, t, _), m) =>
      k -> (m + (tot(q) - ub((q, t))) < thr(q))
    }
    // per-doc block-max upper bound and its rejection flag
    val ubDoc = rows.groupBy(t => (t._1, t._3))
      .view.mapValues(_.map(t => blkMax((t._1, t._2, t._3 / 128))).sum).toMap
    val rejected = ubDoc.iterator.collect {
      case (k @ (q, _), u) if u < thr(q) => k
    }.toSet
    // the report's counts agree with the BigInt recomputation
    val rep = SparkEntry.queries("q_blockmax_prune")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    rep.foreach { case (q, (nb, ns, nd, nr)) =>
      assert(nb == skip.keys.count(_._1 == q), s"query $q block count")
      assert(ns == skip.count { case (k, v) => k._1 == q && v },
        s"query $q skippable count")
      assert(nd == ubDoc.keys.count(_._1 == q), s"query $q doc count")
      assert(nr == rejected.count(_._1 == q), s"query $q rejected count")
      assert(nr > 0, s"query $q: block-max rejection degenerate")
    }
    // safety: a rejected doc can never be in the top-k (its block-max
    // bound dominates its exact score, and the bound is below the floor)
    val topk = Retrieval.bm25TopKFromScores(scored, 10).collect()
    topk.foreach { r =>
      val (q, d) = (r.getLong(0), r.getLong(1))
      assert(!rejected((q, d)), s"top-k doc $d of query $q was rejected")
    }
    contribs.unpersist()
    graft.core.SharedFrames.clear()
  }

  test("proximityRank equals a naive quadratic min-gap scorer") {
    val docs = corpus.toDF("doc_id", "text").repartition(3)
    val got = Retrieval.proximityRank(docs, col("doc_id") < 1, nTerms = 5, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    val toks = corpus.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    // query terms: doc 0's top-5 by (tf desc, tok asc)
    val q = toks(0L).groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (t, n) => (-n, t) }.take(5).map(_._1)
    // naive: per doc, min |p1 - p2| over the FULL position cross product
    // for every term pair present — the quadratic form the in-row tagged
    // merge must reproduce exactly
    val want = toks.toSeq.flatMap { case (id, ws) =>
      val pos = ws.zipWithIndex.map { case (w, i) => (w, i + 1L) }
      val gaps = (for {
        i <- q.indices
        j <- q.indices
        if q(i) < q(j)
        ps1 = pos.filter(_._1 == q(i)).map(_._2)
        ps2 = pos.filter(_._1 == q(j)).map(_._2)
        if ps1.nonEmpty && ps2.nonEmpty
      } yield (for (a <- ps1; b <- ps2) yield math.abs(a - b)).min).toSeq
      if (gaps.isEmpty) None
      else Some(id -> (gaps.size.toLong, gaps.map(g => 1000000L / g).sum))
    }
    val ranked = want.sortBy { case (id, (_, s)) => (-s, id) }.take(10)
      .zipWithIndex
      .map { case ((id, (np, s)), i) => (0L, id, np, s, i + 1) }.toSet
    assert(got == ranked)
    // the multi-occurrence term (apple twice in doc 0, thrice in doc 4)
    // exercises the merge fold beyond single-position pairs
    assert(ranked.exists(_._2 == 4L))
  }

  test("proximityRank plans as a broadcast posting probe with the exact-BIGINT heap") {
    val docs = corpus.toDF("doc_id", "text")
    val plan = Retrieval.proximityRank(docs, col("doc_id") < 1)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastHashJoin"),
      s"query terms lost the broadcast probe:\n${plan.take(1200)}")
    assert(plan.contains("top_k_long") || plan.contains("TopKLong"),
      s"proximity top-k lost the bounded-heap aggregate:\n${plan.take(1200)}")
  }

  test("ndcg: DCG never exceeds the ideal; ppm bounded; discounts are the true floors") {
    val rows = SparkEntry.queries("q_ndcg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dcg = r.getAs[Long]("dcg")
      val idcg = r.getAs[Long]("idcg")
      val ppm = r.getAs[Long]("ndcg_ppm")
      // rearrangement law: the ideal ordering dominates ANY ranking —
      // fails if the IDCG counts or the discount join are wrong
      assert(dcg >= 0 && idcg >= 0 && dcg <= idcg,
        s"query ${r.getLong(0)}: dcg $dcg > idcg $idcg")
      assert(ppm >= 0 && ppm <= 1000000, s"ndcg_ppm $ppm out of [0, 1e6]")
      if (idcg > 0)
        assert(ppm == (BigInt(dcg) * 1000000 / BigInt(idcg)).toLong)
    }
    // the published constants really are floor(1e12 / log2(r+1)) —
    // interval check with double slack far above the fp error (~3e-4)
    val ds = Seq(1000000000000L, 630929753571L, 500000000000L,
      430676558073L, 386852807234L, 356207187108L, 333333333333L,
      315464876785L, 301029995663L, 289064826317L)
    ds.zipWithIndex.foreach { case (w, i) =>
      val l2 = math.log(i + 2) / math.log(2)
      assert(w * l2 <= 1e12 + 0.01, s"rank ${i + 1} discount too large")
      assert((w + 1) * l2 > 1e12 - 0.01, s"rank ${i + 1} discount not the floor")
    }
    graft.core.SharedFrames.clear()
  }

  test("bm25 contributions are integer-exact: single-term self-retrieval ranks by the formula") {
    // ensure no float sneaks in: every score must be reproducible from
    // the integer formula exactly (checked above), and the plan contains
    // no window sort over the corpus for the final top-k
    val docs = corpus.toDF("doc_id", "text")
    val plan = Retrieval.bm25TopK(docs, col("doc_id") < 1)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("top_k_long") || plan.contains("TopKLong"),
      s"bm25 final selection lost the EXACT-BIGINT bounded-heap aggregate " +
        s"(double-keyed top_k collapses scores above 2^53):\n${plan.take(1200)}")
  }

  test("topKLong ranks exactly above 2^53 where the double-keyed heap misorders") {
    // adversarial fixture: 2^53 and 2^53 + 1 are DISTINCT longs but the
    // SAME double (the mantissa runs out), so the double-keyed heap ties
    // them and its id-asc tiebreak picks the WRONG doc — the failure
    // bm25TopKFromScores switched to topKLong to rule out (idf ~ 0.67·N
    // crosses 2^53 near N ~ 1e10 docs)
    import spark.implicits._
    val two53 = 9007199254740992L
    val rows = Seq((0L, 1L, two53), (0L, 2L, two53 + 1L), (0L, 3L, two53 - 1L))
      .toDF("g", "id", "v")
    val gotLong = rows.groupBy("g")
      .agg(graft.functions.TopK.topKLong(col("v"), col("id"), 1).as("top"))
      .select(expr("top[0].id")).head().getLong(0)
    assert(gotLong == 2L,
      s"topKLong must rank 2^53+1 above 2^53 exactly, picked id $gotLong")
    val gotDouble = rows.groupBy("g")
      .agg(graft.functions.TopK.topK(col("v"), col("id"), 1).as("top"))
      .select(expr("top[0].id")).head().getLong(0)
    assert(gotDouble == 1L,
      "fixture self-check: the double heap should collapse 2^53+1 to 2^53 " +
        s"and misorder via the id tiebreak (picked id $gotDouble) — if this " +
        "fails the fixture no longer demonstrates the hazard")
  }

  test("maxSimRerank and prfExpand plan as broadcast probes, no cartesian") {
    val docs = corpus.toDF("doc_id", "text")
    val ms = Retrieval.maxSimRerank(docs, col("doc_id") < 1)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(ms.contains("BroadcastHashJoin"),
      s"maxsim candidate probe lost the broadcast:\n${ms.take(1200)}")
    assert(!ms.contains("CartesianProduct"),
      s"maxsim plan grew a cartesian product:\n${ms.take(1200)}")
    val prf = Retrieval.prfExpand(docs, col("doc_id") < 1)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(prf.contains("top_k_long") || prf.contains("TopKLong"),
      s"prf candidate cuts lost the bounded-heap aggregate:\n${prf.take(1200)}")
    assert(!prf.contains("CartesianProduct"),
      s"prf plan grew a cartesian product:\n${prf.take(1200)}")
  }

  test("maxSimRerank equals the first-principles MaxSim over the BM25 top-k") {
    // naive char-3-gram hashed token vector (the fh3_ md5 recipe restated
    // independently; substr clamps 1-2 char tokens to themselves)
    def h(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    def vec(tok: String): Map[Int, Long] = {
      val grams =
        if (tok.length <= 2) Seq(tok)
        else (0 to tok.length - 3).map(i => tok.substring(i, i + 3))
      grams.foldLeft(Map.empty[Int, Long].withDefaultValue(0L)) { (m, g) =>
        val hv = h("fh3_" + g)
        m.updated((hv % 16).toInt, m((hv % 16).toInt) + (1L - 2L * ((hv / 16) % 2)))
      }
    }
    def dot(a: Map[Int, Long], b: Map[Int, Long]): Long =
      a.keysIterator.map(k => a(k) * b.getOrElse(k, 0L)).sum
    val toks = corpus.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    // query terms: top-3 by (tf desc, tok asc) per query doc (< 3)
    def qterms(id: Long): Seq[String] =
      toks(id).groupBy(identity).map { case (t, o) => (t, o.size) }.toSeq
        .sortBy { case (t, n) => (-n, t) }.take(3).map(_._1)
    val docs = corpus.toDF("doc_id", "text")
    val out = Retrieval.maxSimRerank(docs, col("doc_id") < 3, k = 3, nTerms = 3)
      .orderBy("query_id", "new_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getInt(4)))
    assert(out.nonEmpty)
    // per query: naive maxsim of each candidate, then the rerank order
    out.groupBy(_._1).foreach { case (qid, rows) =>
      val naive = rows.map { case (_, did, bmRank, _, _) =>
        val ms = qterms(qid).map { qt =>
          val vq = vec(qt)
          val best = toks(did).distinct.map(dt => dot(vq, vec(dt)))
            .foldLeft(0L)(math.max) // clamp at 0: empty/neg => 0
          best
        }.sum
        (did, bmRank, ms)
      }
      rows.foreach { case (_, did, _, maxsim, _) =>
        assert(maxsim == naive.find(_._1 == did).get._3,
          s"query $qid doc $did maxsim")
      }
      val expectedOrder = naive.sortBy { case (did, bmRank, ms) => (-ms, bmRank) }
        .map(_._1).toSeq
      assert(rows.sortBy(_._5).map(_._2).toSeq == expectedOrder,
        s"query $qid rerank order")
    }
  }
}
