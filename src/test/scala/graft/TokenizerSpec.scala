package graft

import org.apache.spark.sql.functions._

import graft.ops.Bpe
import graft.queries.TokenizerQueries

/** Laws for the BPE trainer beyond its oracle rows: merging never
  * destroys or creates characters, the apply is greedy-leftmost
  * non-overlapping (the BPE semantics the bracket representation
  * exists to guarantee), and the segment counts are mutually bounded. */
class TokenizerSpec extends SparkSuite {

  test("char mass is conserved: stripped final repr equals the word") {
    val (_, repr) = Bpe.trained(spark, sf)
    val broken = repr.filter(
      translate(col("repr"), "[]", "") =!=
        expr("replace(word, '][', '')")) // words have no brackets; identity
    assert(broken.count() == 0L)
  }

  test("merge apply is greedy leftmost non-overlapping") {
    import spark.implicits._
    val docs = Seq((0L, "aaa aaa")).toDF("doc_id", "text")
    val (merges, repr) = Bpe.train(docs, 1)
    assert(merges == Seq(Bpe.Merge(0, "a", "a", 4L)))
    // leftmost-first: [a][a][a] -> [aa][a], never [a][aa]
    val r = repr.select("repr").as[String].collect()
    assert(r.sameElements(Array("[aa][a]")))
  }

  test("training runs dry gracefully when every word is one symbol") {
    import spark.implicits._
    val docs = Seq((0L, "ab ab ab")).toDF("doc_id", "text")
    // round 0 merges (a,b); afterwards "ab" is a single symbol and no
    // pair exists — extra rounds must not throw or invent merges
    val (merges, repr) = Bpe.train(docs, 4)
    assert(merges == Seq(Bpe.Merge(0, "a", "b", 3L)))
    assert(repr.select("repr").as[String].collect().sameElements(Array("[ab]")))
  }

  test("q_bpe_train emits one strictly-positive merge per round") {
    val m = TokenizerQueries.queries("q_bpe_train")(spark, sf).collect()
    assert(m.length == Bpe.Rounds)
    assert(m.map(_.getInt(0)).toSeq == (0 until Bpe.Rounds))
    assert(m.forall(_.getLong(3) > 0L))
  }

  test("segment counts are mutually bounded: tokens <= symbols <= chars") {
    val bad = TokenizerQueries.queries("q_bpe_segment")(spark, sf)
      .filter(col("n_symbols") < col("n_tokens") ||
        col("n_chars") < col("n_symbols"))
    assert(bad.count() == 0L)
  }

  test("encode: symbols reconstruct the source words, ids are a dense bijection") {
    val enc = TokenizerQueries.queries("q_bpe_encode")(spark, sf).cache()
    // LOSSLESS: concatenating a position's symbols in sym_idx order must
    // rebuild the original word at that position exactly
    val rebuilt = enc.groupBy("doc_id", "pos")
      .agg(concat_ws("", org.apache.spark.sql.functions.array_sort(
        collect_list(struct(col("sym_idx"), col("symbol"))))
        .getField("symbol")).as("word"))
    val expected = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("p", "w")))
      .filter(col("w") =!= "" && col("p") < 10)
      .select(col("doc_id"), (col("p") + 1).as("pos"), col("w"))
    val broken = rebuilt.join(expected, Seq("doc_id", "pos"))
      .filter(col("word") =!= col("w")).count()
    assert(broken == 0, "token stream does not reconstruct the corpus")
    // ids: one id per symbol, dense 0..V-1
    val ids = enc.select("symbol", "token_id").distinct().collect()
    assert(ids.map(_.getString(0)).distinct.length == ids.length)
    val idVals = ids.map(_.getInt(1)).sorted
    assert(idVals.head == 0 && idVals.last == idVals.length - 1 &&
      idVals.distinct.length == idVals.length,
      "token ids must be dense and unique")
    enc.unpersist()
  }
}
