package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the native gopher_rep expression: bit-equality with the
  * declarative sorted-fold it replaced (TextQueries.repRunStats), on the
  * real corpus, on adversarial fixtures, and under scalacheck. */
class GopherRepSpec extends AnyFunSuite with SparkSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(20)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  /** (top2,dup2,...,top6,dup6) via the retained declarative fold. */
  private def foldCols = (2 to 6).flatMap { n =>
    val r = graft.queries.TextQueries.repRunStats(n)
    Seq(r.getField("topc").as(s"ftop$n"), r.getField("dup").as(s"fdup$n"))
  }

  private def nativeCols = (2 to 6).flatMap { n =>
    val r = graft.functions.GopherRep.gopherRep(col("words"))
    Seq(r.getField(s"top$n").as(s"ntop$n"), r.getField(s"dup$n").as(s"ndup$n"))
  }

  private def assertEqualOn(df: org.apache.spark.sql.DataFrame): Unit = {
    val both = df.select(col("words") +: (foldCols ++ nativeCols): _*)
    val bad = both.where(
      (2 to 6).map(n =>
        col(s"ftop$n") =!= col(s"ntop$n") || col(s"fdup$n") =!= col(s"ndup$n"))
        .reduce(_ || _))
    val rows = bad.limit(3).collect()
    assert(rows.isEmpty, s"native gopher_rep diverges from the fold: ${rows.mkString("; ")}")
  }

  test("full-corpus equality: native == sorted fold on documents") {
    val docs = graft.core.Tables.documents(spark, sf)
      .withColumn("words", split(trim(col("text")), "\\s+"))
    assertEqualOn(docs)
  }

  test("adversarial fixtures: ties, empties, unicode, nulls") {
    import scala.jdk.CollectionConverters._
    val fixtures: Seq[Seq[String]] = Seq(
      Seq.empty[String],                       // no words at all
      Seq(""),                                 // split("") -> [""]
      Seq("a"),                                // shorter than every n
      Seq("a", "a", "a", "a", "a", "a", "a"),  // one run covers everything
      Seq("a", "b", "a", "b", "a", "b"),       // alternating bigram champs
      // count tie between grams of DIFFERENT char lengths: the sorted
      // fold takes the binary-smallest gram, so topc depends on the tie
      // break ("aa bb" vs "x y" both appear twice)
      Seq("aa", "bb", "x", "y", "aa", "bb", "x", "y"),
      Seq("x", "y", "aa", "bb", "x", "y", "aa", "bb"),
      // empty words inside the array (concat_ws keeps their separators)
      Seq("", "a", "", "a", "", "a"),
      // multi-byte: 2-byte, 3-byte, and supplementary-plane (4-byte)
      // code points — numChars must count code points, not UTF-16 units
      Seq("café", "世界", "😀", "café", "世界", "😀"),
      // supplementary char vs BMP private-use: UTF8 binary order differs
      // from UTF-16 order here — the tie-break must be binary
      Seq("😀", "", "😀", "", "z", "z"),
      // null elements route to the slow concat_ws-replay path
      Seq(null, "a", "b", null, "a", "b"),
      Seq(null, null, null),
      // words containing spaces cannot happen via split, but grams must
      // still compare exactly (gram boundaries vs embedded separators)
      Seq("a b", "c", "a", "b c", "a b", "c"))
    val rows = fixtures.map(w => Row(w)).asJava
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("words",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))))
    assertEqualOn(spark.createDataFrame(rows, schema))
  }

  test("property: native == fold on random word arrays") {
    import scala.jdk.CollectionConverters._
    val word = Gen.oneOf(
      Gen.oneOf("a", "b", "ab", "", "aa", "é", "世", "😀"),
      Gen.stringOfN(2, Gen.oneOf('a', 'b', ' ')))
    val wordsGen = Gen.chooseNum(0, 14).flatMap(k => Gen.listOfN(k, word))
    check(Prop.forAll(Gen.listOfN(24, wordsGen)) { (batch: List[List[String]]) =>
      val rows = batch.map(w => Row(w)).asJava
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("words",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))))
      val df = spark.createDataFrame(rows, schema)
      val both = df.select(col("words") +: (foldCols ++ nativeCols): _*)
      both.where((2 to 6).map(n =>
        col(s"ftop$n") =!= col(s"ntop$n") || col(s"fdup$n") =!= col(s"ndup$n"))
        .reduce(_ || _)).isEmpty
    })
  }
}
