package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.SimHash

/** Deduplication operators for the training-data pipeline surface:
  * exact (hash-groupBy), n-gram Jaccard (shingle equi-join), MinHash+LSH
  * (band bucket-join + exact verify), and SimHash (native expression +
  * banded hamming candidates).
  *
  * Scale notes (the 100 TB design point):
  *  - shingle joins shuffle on the shingle string — high cardinality, well
  *    distributed; document-frequency pruning (drop shingles appearing in
  *    > df_max docs) bounds worst-case skew and is standard for web-scale
  *    near-dup; exposed via `maxShingleFreq`;
  *  - MinHash/LSH replaces the quadratic pair space with band-bucket
  *    equi-joins: candidates ~ true-positive pairs + band collisions, then
  *    an exact Jaccard verify over candidates only;
  *  - everything is hash-portable (md5-based), so results are reproducible
  *    across engines and runs — no JVM hashCode dependence.
  */
object Dedup {

  /** Normalized text: lower, collapse whitespace. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Word n-gram shingles, one row per (doc_id, distinct shingle). */
  def shingles(docs: DataFrame, n: Int = 3,
               maxShingleFreq: Option[Int] = None): DataFrame = {
    val words = split(trim(col("text")), "\\s+")
    val base = docs
      .withColumn("words", words)
      .withColumn("i",
        explode(when(size(col("words")) >= n,
            sequence(lit(1), size(col("words")) - (n - 1)))
          .otherwise(array().cast("array<int>"))))
      .withColumn("shingle",
        concat_ws(" ", (0 until n).map(k => element_at(col("words"), col("i") + k)): _*))
      .select("doc_id", "shingle")
      .distinct()
    val pruned = maxShingleFreq match {
      case None => base
      case Some(f) =>
        // document-frequency pruning: stop-shingles explode the pair space
        val keep = base.groupBy("shingle").count().filter(col("count") <= f)
          .select("shingle")
        base.join(keep, Seq("shingle"))
    }
    // every consumer (sizes, pair join, signatures, verify) re-reads this
    // frame several times in one plan; persisting the post-distinct result
    // replaces 3-4 repeated scan+explode+shuffle subtrees with one
    pruned.persist()
  }

  /** Exact pairwise Jaccard over a shingle equi-join; emits pairs with
    * jaccard >= `threshold`. */
  def jaccardPairs(sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = sh.select(col("doc_id").as("id_a"), col("shingle"))
    val b = sh.select(col("doc_id").as("id_b"), col("shingle"))
    val common = a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("size_a")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("size_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("size_a") + col("size_b") - col("common")))
      .filter(col("jaccard") >= threshold)
  }

  /** Portable MinHash signature: h_j = min over shingles of md5(j || shingle)
    * (lexicographic min of the hex string == min of the 128-bit hash). */
  def minhashSignatures(sh: DataFrame, k: Int): DataFrame =
    sh.groupBy("doc_id").agg(
      (1 to k).map(j => min(md5(concat(lit(j.toString), col("shingle")))).as(s"h$j")).head,
      (1 to k).map(j => min(md5(concat(lit(j.toString), col("shingle")))).as(s"h$j")).tail: _*)

  /** LSH band keys over a signature: band b = md5(h_{2b-1} || h_{2b}).
    * Persisted — [[bandCandidates]] self-joins this frame once per band,
    * which would otherwise recompute the signature aggregation 2x per
    * band. */
  def withBands(sig: DataFrame, k: Int, rowsPerBand: Int): DataFrame = {
    val nBands = k / rowsPerBand
    (1 to nBands).foldLeft(sig) { (df, b) =>
      val cols = ((b - 1) * rowsPerBand + 1 to b * rowsPerBand).map(j => col(s"h$j"))
      df.withColumn(s"band$b", md5(concat(cols: _*)))
    }.persist()
  }

  /** Candidate pairs from any band collision (distinct). */
  def bandCandidates(banded: DataFrame, nBands: Int): DataFrame =
    (1 to nBands).map { b =>
      val a = banded.select(col("doc_id").as("id_a"), col(s"band$b").as("bk"))
      val c = banded.select(col("doc_id").as("id_b"), col(s"band$b").as("bk"))
      a.join(c, Seq("bk")).filter(col("id_a") < col("id_b")).select("id_a", "id_b")
    }.reduce(_ unionByName _).distinct()

  /** Exact-Jaccard verification restricted to candidate pairs. */
  def verifyCandidates(cands: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val common = cands
      .join(sh.select(col("doc_id").as("id_a"), col("shingle")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("shingle").as("shingle_b")), Seq("id_b"))
      .filter(col("shingle") === col("shingle_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("size_a")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("size_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("size_a") + col("size_b") - col("common")))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup candidates: 4x16-bit bands of the 64-bit fingerprint
    * as bucket keys, hamming distance <= `maxHamming` verify. */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val withSh = docs.select(col("doc_id"),
      SimHash.simhash(normText(col("text"))).as("sh"))
    val banded = withSh
      .withColumn("b1", col("sh").bitwiseAND(lit(0xffffL)))
      .withColumn("b2", shiftrightunsigned(col("sh"), 16).bitwiseAND(lit(0xffffL)))
      .withColumn("b3", shiftrightunsigned(col("sh"), 32).bitwiseAND(lit(0xffffL)))
      .withColumn("b4", shiftrightunsigned(col("sh"), 48).bitwiseAND(lit(0xffffL)))
      .persist() // self-joined once per band below
    val cands = (1 to 4).map { b =>
      val a = banded.select(col("doc_id").as("id_a"), col("sh").as("sh_a"), col(s"b$b").as("bk"))
      val c = banded.select(col("doc_id").as("id_b"), col("sh").as("sh_b"), col(s"b$b").as("bk"))
      a.join(c, Seq("bk")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
    }.reduce(_ unionByName _).distinct()
    cands
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
  }
}
