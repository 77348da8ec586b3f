package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Dedup

/** Deduplication over `documents`: exact (hash-groupBy), n-gram Jaccard
  * (shingle equi-join), MinHash+LSH (band bucket-join + exact verify), and
  * SimHash (native expression; banded hamming). The md5-based hashing keeps
  * every variant portable to the DuckDB oracle except SimHash, whose 64-bit
  * bit-vector fold is not reasonably SQL-expressible (rows-only check).
  */
object DedupQueries extends QueryGroup {

  private val shingleSqlPrefix =
    """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents),
      |idx AS (SELECT doc_id, words, unnest(generate_series(1, len(words) - 2)) AS i FROM w),
      |sh AS (SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle FROM idx),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id)""".stripMargin

  /** Exact dedup: md5 fingerprint of normalized text; canonical = min id. */
  private def exact(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("fp")
    Tables.documents(s, dir)
      .withColumn("fp", md5(Dedup.normText(col("text"))))
      .withColumn("n_same", count(lit(1)).over(w))
      .withColumn("is_canonical", col("doc_id") === min(col("doc_id")).over(w))
      .select("doc_id", "fp", "n_same", "is_canonical")
      .orderBy("doc_id")
  }

  /** N-gram Jaccard near-dup pairs (threshold 0.8). */
  private def jaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(Dedup.shingles(Tables.documents(s, dir)), 0.8)
      .select("id_a", "id_b", "common", "size_a", "size_b", "jaccard")
      .orderBy("id_a", "id_b")

  /** MinHash (k=8) + LSH (4 bands of 2) candidates, exact-verified >= 0.7. */
  private def minhash(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingles(Tables.documents(s, dir))
    val banded = Dedup.withBands(Dedup.minhashSignatures(sh, 8), 8, 2)
    Dedup.verifyCandidates(Dedup.bandCandidates(banded, 4), sh, 0.7)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** SimHash near-dup pairs (native Catalyst expression; rows-only check).
    * maxHamming=6 calibrated on the shared-vocabulary corpus: <=6 keeps
    * tens of pairs (the planted near-dups) where <=16 admitted 159k
    * vocabulary-induced collisions at sf0.1. */
  private def simhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(s, dir), maxHamming = 6)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")

  /** Winnowing fingerprint overlap pairs (rolling-hash k-gram minima;
    * rows-only check — the fingerprint algorithm lives in native code in
    * both engines or neither). Docs sharing >= 5 selected fingerprints are
    * overlap candidates; the guarantee is structural (common substrings of
    * length >= W+K-1 share a fingerprint). */
  private def winnowPairs(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(graft.functions.Winnow.winnow(Dedup.normText(col("text")))).as("fp"))
      .distinct()
    // document-frequency pruning: a fingerprint shared by dozens of docs is
    // vocabulary, not overlap, and quadratically explodes the self-join
    val keep = raw.groupBy("fp").agg(count(lit(1)).as("df")).filter(col("df") <= 20)
      .select("fp")
    val fps = raw.join(keep, Seq("fp")).persist()
    fps.select(col("doc_id").as("id_a"), col("fp"))
      .join(fps.select(col("doc_id").as("id_b"), col("fp")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= 5)
      .orderBy("id_a", "id_b")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_winnow" -> winnowPairs,
    "q_dedup_exact" -> exact,
    "q_dedup_jaccard" -> jaccard,
    "q_dedup_minhash" -> minhash,
    "q_dedup_simhash" -> simhash,
  )

  override def oracle: Map[String, String] = Map(
    "q_dedup_exact" ->
      """WITH fps AS (
        |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents)
        |SELECT doc_id, fp,
        |  count(*) OVER (PARTITION BY fp) AS n_same,
        |  doc_id = min(doc_id) OVER (PARTITION BY fp) AS is_canonical
        |FROM fps ORDER BY doc_id""".stripMargin,

    "q_dedup_jaccard" ->
      s"""$shingleSqlPrefix,
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, common, sa.sz AS size_a, sb.sz AS size_b,
         |  CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) AS jaccard
         |FROM pairs
         |JOIN sizes sa ON id_a = sa.doc_id
         |JOIN sizes sb ON id_b = sb.doc_id
         |WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_minhash" ->
      s"""$shingleSqlPrefix,
         |sig AS (
         |  SELECT doc_id,
         |    min(md5('1' || shingle)) AS h1, min(md5('2' || shingle)) AS h2,
         |    min(md5('3' || shingle)) AS h3, min(md5('4' || shingle)) AS h4,
         |    min(md5('5' || shingle)) AS h5, min(md5('6' || shingle)) AS h6,
         |    min(md5('7' || shingle)) AS h7, min(md5('8' || shingle)) AS h8
         |  FROM sh GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, md5(h1 || h2) AS band1, md5(h3 || h4) AS band2,
         |    md5(h5 || h6) AS band3, md5(h7 || h8) AS band4
         |  FROM sig),
         |cands AS (
         |  SELECT DISTINCT id_a, id_b FROM (
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM banded a
         |      JOIN banded b ON a.band1 = b.band1 AND a.doc_id < b.doc_id
         |    UNION
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM banded a
         |      JOIN banded b ON a.band2 = b.band2 AND a.doc_id < b.doc_id
         |    UNION
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM banded a
         |      JOIN banded b ON a.band3 = b.band3 AND a.doc_id < b.doc_id
         |    UNION
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM banded a
         |      JOIN banded b ON a.band4 = b.band4 AND a.doc_id < b.doc_id)),
         |common AS (
         |  SELECT c.id_a, c.id_b, count(*) AS common
         |  FROM cands c
         |  JOIN sh sa ON sa.doc_id = c.id_a
         |  JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
         |  GROUP BY 1, 2)
         |SELECT m.id_a, m.id_b,
         |  CAST(m.common AS DOUBLE) / (sa.sz + sb.sz - m.common) AS jaccard
         |FROM common m
         |JOIN sizes sa ON m.id_a = sa.doc_id
         |JOIN sizes sb ON m.id_b = sb.doc_id
         |WHERE CAST(m.common AS DOUBLE) / (sa.sz + sb.sz - m.common) >= 0.7
         |ORDER BY id_a, id_b""".stripMargin,
  )
}
