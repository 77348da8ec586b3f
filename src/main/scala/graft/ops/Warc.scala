package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) record parsing — the ingestion format of
  * web-crawl training corpora (Common Crawl ships WARC/WET files; every
  * large LLM text pipeline starts by walking them). The reference's only
  * web-ingest analog is the scraper's page fetch
  * (`chat_acreage_bot.py:537–630`), which consumes live HTML; WARC is
  * the at-rest form the same content takes at corpus scale.
  *
  * Format (public spec): a WARC file is a concatenation of records
  *
  * {{{
  * WARC/1.0\r\n
  * <name>: <value>\r\n ...      (headers)
  * \r\n
  * <Content-Length bytes of payload>
  * \r\n\r\n
  * }}}
  *
  * Correct parsing REQUIRES Content-Length framing — payloads may contain
  * `WARC/1.0` literals, so delimiter splitting is wrong by construction.
  * Real Common Crawl files are `.warc.gz` with each record an INDEPENDENT
  * gzip member (so readers can seek to member boundaries); the parser
  * here detects the gzip magic and inflates the concatenated members
  * first — offsets then refer to the logical (decompressed) stream, which
  * is also what makes compressed and uncompressed inputs oracle-identical.
  *
  * Scale shape: one archive = one row (binary payload); the record walk
  * runs per-partition via `mapPartitions` like the media decoders — bytes
  * are parsed where they sit and only (type, uri, length, digest, offset)
  * rows leave the executor. Archives are independent, so the scan
  * parallelizes across files exactly as a 100 TB crawl does.
  */
object Warc {

  /** One parsed record: `offset` is the record's byte position in the
    * logical (decompressed) stream — the framing arithmetic the oracle
    * recomputes symbolically. */
  case class WarcRecord(
      warc_type: String,
      target_uri: String,
      content_lang: String,
      content_length: Long,
      payload: Array[Byte],
      offset: Long)

  private val Crlf = "\r\n".getBytes(UTF_8)

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Inflate ALL gzip members of a concatenated-member stream (the
    * `.warc.gz` layout). `GZIPInputStream` stops after members it can
    * coalesce; the loop re-opens at the next member boundary. */
  private[graft] def gunzipMembers(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length * 4)
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  /** Walk every record of one WARC file (gzip-transparent). Tolerant of
    * unknown headers and header-name case; records without a
    * Content-Length header terminate the walk (framing is lost). */
  def parseWarc(bytes: Array[Byte]): Seq[WarcRecord] = {
    val b = if (isGzip(bytes)) gunzipMembers(bytes) else bytes
    val out = Seq.newBuilder[WarcRecord]
    var i = 0
    def lineEnd(from: Int): Int = {
      var j = from
      while (j + 1 < b.length && !(b(j) == '\r' && b(j + 1) == '\n')) j += 1
      j
    }
    while (i + 8 <= b.length) {
      val offset = i.toLong
      // magic
      val magicEnd = lineEnd(i)
      val magic = new String(b, i, magicEnd - i, UTF_8)
      if (!magic.startsWith("WARC/")) return out.result()
      i = magicEnd + 2
      // headers until blank line
      var wtype = ""; var uri = ""; var lang = ""; var clen = -1L
      var blank = false
      while (!blank && i < b.length) {
        val e = lineEnd(i)
        if (e == i) { blank = true; i += 2 }
        else {
          val line = new String(b, i, e - i, UTF_8)
          val sep = line.indexOf(':')
          if (sep > 0) {
            val k = line.substring(0, sep).trim.toLowerCase
            val v = line.substring(sep + 1).trim
            k match {
              case "warc-type" => wtype = v
              case "warc-target-uri" => uri = v
              case "warc-identified-content-language" => lang = v
              case "content-length" => clen = v.toLong
              case _ => () // unknown headers tolerated
            }
          }
          i = e + 2
        }
      }
      if (clen < 0 || i + clen > b.length) return out.result()
      val payload = java.util.Arrays.copyOfRange(b, i, i + clen.toInt)
      out += WarcRecord(wtype, uri, lang, clen, payload, offset)
      i += clen.toInt
      // record trailer \r\n\r\n
      if (i + 4 <= b.length && b(i) == '\r' && b(i + 1) == '\n' &&
          b(i + 2) == '\r' && b(i + 3) == '\n') i += 4
      else return out.result()
    }
    out.result()
  }

  case class ParsedDoc(
      group_id: Long,
      warc_type: String,
      target_uri: String,
      content_lang: String,
      content_length: Long,
      payload_md5: String,
      offset: Long)

  /** Parse a (group_id, payload) archive frame into per-record rows —
    * bytes stay in the partition; only digests and framing facts leave. */
  def parseArchives(spark: SparkSession, archives: Dataset[(Long, Array[Byte])]): DataFrame = {
    import spark.implicits._
    archives.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { case (g, bytes) =>
        parseWarc(bytes).iterator.map { r =>
          val digest = md.digest(r.payload)
          md.reset()
          ParsedDoc(g, r.warc_type, r.target_uri, r.content_lang,
            r.content_length, digest.map(x => f"${x & 0xff}%02x").mkString,
            r.offset)
        }
      }
    }.toDF()
  }
}

/** INDEPENDENT fixture encoder (shares no code with the parser): renders
  * the documents table as synthetic WARC archives — one file per
  * `doc_id div GroupSize` group, a `warcinfo` lead record (which the
  * consumer query must recognize and skip, like a real reader), one
  * `response` record per doc in doc_id order. Odd groups are written as
  * per-record gzip members (the `.warc.gz` Common Crawl layout); even
  * groups stay plain — the parser must treat both identically, and the
  * oracle's framing arithmetic applies to both because offsets are
  * defined on the decompressed stream. */
private[graft] object WarcFixtures {

  val GroupSize = 64L
  val InfoPayload = "software: graft-synth\r\n"

  /** Byte size of the warcinfo lead record (mirrored as a literal in the
    * oracle SQL; a miscount fails the offset hash). */
  def infoRecordSize: Int = infoRecord.length

  private def infoRecord: Array[Byte] = {
    val h = "WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n" +
      s"Content-Length: ${InfoPayload.getBytes(UTF_8).length}\r\n" +
      "\r\n"
    (h + InfoPayload + "\r\n\r\n").getBytes(UTF_8)
  }

  def uriOf(docId: Long): String = s"http://synth.test/doc/$docId"

  private def responseRecord(docId: Long, text: String, lang: String): Array[Byte] = {
    val payload = text.getBytes(UTF_8)
    val h = "WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Target-URI: ${uriOf(docId)}\r\n" +
      s"WARC-Identified-Content-Language: $lang\r\n" +
      s"Content-Length: ${payload.length}\r\n" +
      "\r\n"
    val out = new ByteArrayOutputStream()
    out.write(h.getBytes(UTF_8))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  private def gzipMember(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(b); gz.close()
    out.toByteArray
  }

  /** One archive from this group's (doc_id, text, lang) rows. */
  def synthWarc(groupId: Long, docs: Seq[(Long, String, String)]): Array[Byte] = {
    val records = infoRecord +: docs.sortBy(_._1).map { case (id, t, l) =>
      responseRecord(id, t, l)
    }
    val out = new ByteArrayOutputStream()
    val compress = groupId % 2 == 1
    records.foreach { r => out.write(if (compress) gzipMember(r) else r) }
    out.toByteArray
  }
}
