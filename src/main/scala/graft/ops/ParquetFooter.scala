package graft.ops

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet FOOTER reader from scratch — the metadata/manifest layer a
  * planner consults for row counts, null counts, and chunk sizes WITHOUT
  * touching data pages (the same facts file-pruning and ANALYZE-free
  * statistics ride on at 100 TB). No parquet-mr, no arrow: the footer is
  * located by the trailing `len + "PAR1"` magic and decoded by a
  * hand-written Thrift COMPACT-protocol walker (varint + zigzag field
  * headers, short-form lists, nested structs) that skips every field it
  * doesn't extract — so writer-added fields (new stats, encodings,
  * bloom offsets) never break the parse, the property that keeps a
  * footer reader alive across parquet versions.
  *
  * Extracted (FileMetaData → RowGroup → ColumnChunk → ColumnMetaData):
  * per-chunk physical type, dotted path_in_schema, codec, num_values,
  * compressed/uncompressed sizes, and Statistics.null_count.
  *
  * Scale shape: footers are a few KB at the END of each file; the
  * binaryFile source hands whole files here (fine at fixture scale), a
  * production variant reads only the tail range per file — either way
  * parsing is per-partition and only chunk facts leave the executor.
  */
object ParquetFooter {

  case class ChunkMeta(
      rowGroup: Int,
      columnIdx: Int,
      path: String,
      physType: String,
      codec: String,
      numValues: Long,
      totalCompressed: Long,
      totalUncompressed: Long,
      nullCount: Option[Long])

  case class FooterMeta(numRows: Long, chunks: Seq[ChunkMeta])

  private val TypeNames = Array("BOOLEAN", "INT32", "INT64", "INT96",
    "FLOAT", "DOUBLE", "BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY")
  private val CodecNames = Array("UNCOMPRESSED", "SNAPPY", "GZIP", "LZO",
    "BROTLI", "LZ4", "ZSTD", "LZ4_RAW")

  /** Thrift compact-protocol reader over a byte range. */
  private final class TC(b: Array[Byte], var pos: Int) {
    def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def varint(): Long = {
      var r = 0L; var sh = 0; var x = 0
      while ({ x = u8(); r |= (x & 0x7fL) << sh; sh += 7; (x & 0x80) != 0 }) ()
      r
    }
    def zig(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1L) }
    def binary(): Array[Byte] = {
      val n = varint().toInt
      val r = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; r
    }
    /** (fieldId, typeId) or null at STOP; `last` is the previous id. */
    def fieldHeader(last: Int): (Int, Int) = {
      val h = u8()
      if (h == 0) null
      else {
        val delta = (h >> 4) & 0xf
        val tpe = h & 0xf
        val fid = if (delta == 0) zig().toInt else last + delta
        (fid, tpe)
      }
    }
    def listHeader(): (Int, Int) = { // (size, elemType)
      val h = u8()
      val tpe = h & 0xf
      val sz = (h >> 4) & 0xf
      (if (sz == 15) varint().toInt else sz, tpe)
    }
    def skip(tpe: Int): Unit = tpe match {
      case 1 | 2 => () // bool encoded in the field header
      case 3 => u8()
      case 4 | 5 | 6 => varint()
      case 7 => pos += 8
      case 8 =>
        // evaluate the length FIRST: `pos += varint()` reads the OLD pos
        // before varint() advances it (Scala's left-to-right order) and
        // silently drops the length byte from the count
        val n = varint().toInt; pos += n
      case 9 | 10 =>
        val (n, et) = listHeader()
        var i = 0; while (i < n) { skip(et); i += 1 }
      case 11 =>
        val n = varint().toInt
        if (n > 0) {
          val kv = u8()
          var i = 0
          while (i < n) { skip((kv >> 4) & 0xf); skip(kv & 0xf); i += 1 }
        }
      case 12 => skipStruct()
      case t => throw new IllegalArgumentException(s"thrift type $t")
    }
    def skipStruct(): Unit = {
      var last = 0
      var f = fieldHeader(last)
      while (f != null) { skip(f._2); last = f._1; f = fieldHeader(last) }
    }
  }

  /** Statistics struct → null_count (field 3). */
  private def statistics(tc: TC): Option[Long] = {
    var last = 0
    var out: Option[Long] = None
    var f = tc.fieldHeader(last)
    while (f != null) {
      if (f._1 == 3 && f._2 == 6) out = Some(tc.zig())
      else tc.skip(f._2)
      last = f._1; f = tc.fieldHeader(last)
    }
    out
  }

  /** ColumnMetaData struct. */
  private def columnMeta(tc: TC, rg: Int, idx: Int): ChunkMeta = {
    var last = 0
    var tpe = -1; var codec = -1
    var path = ""; var nv = -1L; var tu = -1L; var tcmp = -1L
    var nulls: Option[Long] = None
    var f = tc.fieldHeader(last)
    while (f != null) {
      f._1 match {
        case 1 => tpe = tc.zig().toInt
        case 3 =>
          val (n, _) = tc.listHeader()
          path = (0 until n).map(_ => new String(tc.binary(), UTF_8)).mkString(".")
        case 4 => codec = tc.zig().toInt
        case 5 => nv = tc.zig()
        case 6 => tu = tc.zig()
        case 7 => tcmp = tc.zig()
        case 12 => nulls = statistics(tc)
        case _ => tc.skip(f._2)
      }
      last = f._1; f = tc.fieldHeader(last)
    }
    ChunkMeta(rg, idx, path,
      if (tpe >= 0 && tpe < TypeNames.length) TypeNames(tpe) else s"T$tpe",
      if (codec >= 0 && codec < CodecNames.length) CodecNames(codec) else s"C$codec",
      nv, tcmp, tu, nulls)
  }

  /** ColumnChunk struct → its ColumnMetaData (field 3). */
  private def columnChunk(tc: TC, rg: Int, idx: Int): Option[ChunkMeta] = {
    var last = 0
    var out: Option[ChunkMeta] = None
    var f = tc.fieldHeader(last)
    while (f != null) {
      if (f._1 == 3 && f._2 == 12) out = Some(columnMeta(tc, rg, idx))
      else tc.skip(f._2)
      last = f._1; f = tc.fieldHeader(last)
    }
    out
  }

  /** RowGroup struct → chunks of its columns list (field 1). */
  private def rowGroup(tc: TC, rg: Int): Seq[ChunkMeta] = {
    var last = 0
    val out = Seq.newBuilder[ChunkMeta]
    var f = tc.fieldHeader(last)
    while (f != null) {
      if (f._1 == 1 && f._2 == 9) {
        val (n, _) = tc.listHeader()
        for (i <- 0 until n) out ++= columnChunk(tc, rg, i)
      } else tc.skip(f._2)
      last = f._1; f = tc.fieldHeader(last)
    }
    out.result()
  }

  /** Parse the footer of one complete parquet file. */
  def parse(bytes: Array[Byte]): Option[FooterMeta] = try {
    val n = bytes.length
    if (n < 12 || new String(bytes, n - 4, 4, UTF_8) != "PAR1") return None
    val flen = (bytes(n - 8) & 0xff) | ((bytes(n - 7) & 0xff) << 8) |
      ((bytes(n - 6) & 0xff) << 16) | ((bytes(n - 5) & 0xff) << 24)
    val tc = new TC(bytes, n - 8 - flen)
    // FileMetaData: 3 = num_rows, 4 = row_groups
    var last = 0
    var numRows = -1L
    val chunks = Seq.newBuilder[ChunkMeta]
    var f = tc.fieldHeader(last)
    while (f != null) {
      f._1 match {
        case 3 if f._2 == 6 => numRows = tc.zig()
        case 4 if f._2 == 9 =>
          val (ng, _) = tc.listHeader()
          for (g <- 0 until ng) chunks ++= rowGroup(tc, g)
        case _ => tc.skip(f._2)
      }
      last = f._1; f = tc.fieldHeader(last)
    }
    Some(FooterMeta(numRows, chunks.result()))
  } catch { case _: Exception => None }

  case class TableColumnMeta(
      tbl: String,
      path_in_schema: String,
      phys_type: String,
      num_values: Long,
      null_count: Long)

  /** Footer facts for every `*.parquet` under `dir`, aggregated across
    * row groups (num_values and null_count sums are split-invariant, so
    * the result is a pure function of the DATA — which is what lets the
    * oracle recompute it from the tables without touching a file). */
  def tableColumnMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val tbl = path.split('/').last.stripSuffix(".parquet")
        parse(bytes).toSeq.flatMap { fm =>
          fm.chunks
            .groupBy(c => (c.path, c.physType))
            .map { case ((p, t), cs) =>
              TableColumnMeta(tbl, p, t, cs.map(_.numValues).sum,
                cs.flatMap(_.nullCount).sum)
            }
        }
      }.toDF()
  }
}
