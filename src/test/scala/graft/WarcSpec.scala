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

  test("multibyte payloads frame by OCTETS, not characters") {
    val zh = "你好世界" // 4 chars, 12 UTF-8 bytes
    val bytes = (record("http://z", zh) + record("http://t", "tail")).getBytes(UTF_8)
    val rs = Warc.parseWarc(bytes)
    assert(rs.head.content_length == 12L)
    assert(rs.map(_.target_uri) == Seq("http://z", "http://t"))
  }
}
