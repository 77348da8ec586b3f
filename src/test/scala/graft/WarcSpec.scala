package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Warc, WarcFixtures}

/** WARC record-walk laws: Content-Length framing (not delimiter
  * splitting), gzip-member transparency, unknown-header tolerance, and
  * truncation behavior. Pure JVM — no Spark needed. */
class WarcSpec extends AnyFunSuite {

  private def record(uri: String, body: String, extra: String = ""): String =
    "WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      extra +
      s"Content-Length: ${body.getBytes(UTF_8).length}\r\n" +
      "\r\n" + body + "\r\n\r\n"

  test("payload containing WARC/1.0 literals does not break framing") {
    // the exact case delimiter splitting gets wrong by construction
    val evil = "before\r\nWARC/1.0\r\nWARC-Type: response\r\nafter"
    val bytes = (record("http://a", evil) + record("http://b", "plain")).getBytes(UTF_8)
    val rs = Warc.parseWarc(bytes)
    assert(rs.map(_.target_uri) == Seq("http://a", "http://b"))
    assert(new String(rs.head.payload, UTF_8) == evil)
  }

  test("unknown headers and header-name case are tolerated") {
    val bytes = record("http://c", "x", "X-Custom: 1\r\ncOnTeNt-LaNgUaGe: en\r\n")
      .getBytes(UTF_8)
    val rs = Warc.parseWarc(bytes)
    assert(rs.size == 1 && rs.head.content_length == 1)
  }

  test("gzip members decompress to the identical record walk") {
    val docs = Seq((1L, "hello world", "en"), (2L, "bonjour", "fr"))
    val plain = WarcFixtures.synthWarc(0L, docs) // even group: plain
    val gz = WarcFixtures.synthWarc(1L, docs)    // odd group: gzip members
    val (a, b) = (Warc.parseWarc(plain), Warc.parseWarc(gz))
    assert(a.map(r => (r.warc_type, r.target_uri, r.content_length, r.offset)) ==
      b.map(r => (r.warc_type, r.target_uri, r.content_length, r.offset)))
    assert(a.head.warc_type == "warcinfo" && a.head.offset == 0L)
    assert(a(1).offset == WarcFixtures.infoRecordSize.toLong)
  }

  test("truncated payload terminates the walk with the intact prefix") {
    val full = (record("http://a", "abc") + record("http://b", "defgh")).getBytes(UTF_8)
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 6)
    val rs = Warc.parseWarc(cut)
    assert(rs.map(_.target_uri) == Seq("http://a"))
  }

  test("streaming archive ingest: store wins re-crawls, min URI wins in-batch") {
    val spark = SparkSuite.session
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graftwarc")
      .toFile.getAbsolutePath
    val src = MemoryStream[(Long, Array[Byte])]
    val archives = src.toDF().toDF("group_id", "payload")
    def run(): Unit = graft.streaming.WarcStream.runArchiveIngest(
      spark, archives, s"$tmp/store", s"$tmp/ckpt")
    // batch 1 (plain group): two distinct docs
    src.addData((0L, WarcFixtures.synthWarc(0L,
      Seq((1L, "hello world", "en"), (2L, "other content", "fr")))))
    run()
    // batch 2 (gzip group): doc 3 re-crawls doc 1's content (suppressed,
    // store wins); docs 4 and 5 share NEW content (min URI doc/4 wins)
    src.addData((1L, WarcFixtures.synthWarc(1L,
      Seq((3L, "hello world", "en"), (4L, "brand new", "de"),
        (5L, "brand new", "de")))))
    run()
    val store = spark.read.parquet(s"$tmp/store")
      .select("target_uri").collect().map(_.getString(0)).toSet
    assert(store == Set(
      WarcFixtures.uriOf(1L), WarcFixtures.uriOf(2L), WarcFixtures.uriOf(4L)),
      s"wrong store contents: $store")
  }

  test("multibyte payloads frame by OCTETS, not characters") {
    val zh = "你好世界" // 4 chars, 12 UTF-8 bytes
    val bytes = (record("http://z", zh) + record("http://t", "tail")).getBytes(UTF_8)
    val rs = Warc.parseWarc(bytes)
    assert(rs.head.content_length == 12L)
    assert(rs.map(_.target_uri) == Seq("http://z", "http://t"))
  }
}
