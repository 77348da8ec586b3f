package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{SharedFrames, Tables}
import graft.ops.{ImageHash, Multimodal, Similarity}

/** Similarity search over `embeddings` and multimodal feature extraction
  * over binary payloads: brute-force cosine top-k (the correctness
  * baseline), random-hyperplane LSH bucketed near-dup pairs, seeded IVF
  * ANN (both scale paths), and the partition-wise media decode stub.
  * Every query is oracle-verified — the LSH plane matrix is inlined into
  * the generated SQL, and the IVF centroid seeding is recomputed by the
  * SQL itself.
  */
object SimilarityQueries extends QueryGroup {

  /** Brute-force cosine top-5 for query vectors vec_id < 5. */
  private def topk(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineTopK(Tables.embeddings(s, dir), col("vec_id") < 5, 5)
      .orderBy("query_id", "rank")

  /** Embedding-space decontamination — the semantic sibling of the
    * n-gram/winnow checks: flag corpus vectors whose cosine to ANY
    * benchmark vector (modeled as vec_id < 8) reaches 0.3 (calibrated to
    * the synthetic embeddings, max cross cosine ~0.49). Directional
    * broadcast shape: the eval set is tiny and rides to every executor,
    * the corpus never shuffles, and the per-vector argmax window
    * partitions on vec_id with at most |eval| rows — the check costs one
    * narrow pass over the corpus at any scale. Output per contaminated
    * vector: hit count, best-matching benchmark id (cosine desc, id asc
    * tiebreak on the ROUNDED cosine — the cross-engine comparison key),
    * best cosine. */
  private def contaminationEmbed(s: SparkSession, dir: String): DataFrame = {
    val n = Similarity.withNorm(Tables.embeddings(s, dir))
    val q = n.filter(col("vec_id") < 8)
      .select(col("vec_id").as("eval_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val hits = n.filter(col("vec_id") >= 8)
      .crossJoin(broadcast(q))
      .withColumn("cosine",
        round(Similarity.dot(col("qv"), col("v")) /
          (col("qn") * col("nrm")), 6))
      .filter(col("cosine") >= 0.3)
    val cw = org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
    val rw = org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
      .orderBy(col("cosine").desc, col("eval_id").asc)
    hits
      .withColumn("n_eval_hits", count(lit(1)).over(cw))
      .withColumn("rn", row_number().over(rw))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("n_eval_hits"),
        col("eval_id").as("best_eval_id"), col("cosine").as("best_cosine"))
      .orderBy("vec_id")
  }

  /** LSH near-dup pair frame (8 hyperplanes; cosine >= 0.35 — calibrated
    * to the synthetic embeddings, whose max pairwise cosine is ~0.51),
    * built once per (session, dir): the bucket-join + cosine-verify is the
    * expensive subtree and feeds both the pair-listing query and the
    * semantic-cluster query. */
  private[queries] def sharedLshPairs(s: SparkSession, dir: String): DataFrame =
    SharedFrames.cached(s, s"lshpairs:$dir") {
      Similarity.lshNearDupPairs(Tables.embeddings(s, dir), 8, 0.35)
    }

  /** LSH-bucketed ANN near-dup pairs. Oracle-verified: the md5-derived
    * plane matrix is inlined into the generated SQL, so DuckDB buckets
    * identically. */
  private def lsh(s: SparkSession, dir: String): DataFrame =
    sharedLshPairs(s, dir)
      .select(col("id_a"), col("id_b"), col("bucket"), col("cosine"))
      .orderBy("id_a", "id_b")

  /** The SQL form of [[Similarity.planes]] — identical values by
    * construction (same md5 derivation, rendered as list literals). */
  private def lshPairsSqlPrefix: String = {
    val ps = Similarity.planes(8, 64)
    val bucketExpr = ps.zipWithIndex.map { case (p, i) =>
      val lst = p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product(v, ${lst}::DOUBLE[]) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("\n     + ")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |b AS (SELECT vec_id, v, nrm,
       |  CAST($bucketExpr AS BIGINT) AS bucket
       |  FROM n),
       |pairs AS (
       |  SELECT a.vec_id AS id_a, c.vec_id AS id_b, a.bucket,
       |    round(list_dot_product(a.v, c.v) / (a.nrm * c.nrm), 6) AS cosine
       |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)""".stripMargin
  }

  /** `q_sim_curve` oracle: same inlined plane matrix, sampled vectors,
    * all-pairs cosine bucketed by floor(c·10) (floor BEFORE the int cast
    * — a bare integer cast truncates toward zero on the negative
    * buckets). */
  private def simCurveOracleSql: String = {
    val ps = Similarity.planes(8, 64)
    val bucketExpr = ps.zipWithIndex.map { case (p, i) =>
      val lst = p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product(v, ${lst}::DOUBLE[]) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("\n     + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings WHERE vec_id % 5 = 0),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |b AS (SELECT vec_id, v, nrm, CAST($bucketExpr AS BIGINT) AS bucket
       |      FROM n),
       |pr AS (
       |  SELECT a.bucket = c.bucket AS is_cand,
       |    list_dot_product(a.v, c.v) / (a.nrm * c.nrm) AS cosine
       |  FROM b a JOIN b c ON a.vec_id < c.vec_id)
       |SELECT CAST(floor(cosine * 10) AS INTEGER) AS cos_bucket,
       |  count(*) AS n_pairs,
       |  CAST(sum(CASE WHEN is_cand THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_candidates,
       |  round(CAST(sum(CASE WHEN is_cand THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*), 6) AS candidate_rate
       |FROM pr GROUP BY 1 ORDER BY cos_bucket""".stripMargin
  }

  private def lshOracleSql: String =
    s"""WITH $lshPairsSqlPrefix
       |SELECT id_a, id_b, bucket, cosine FROM pairs
       |WHERE cosine >= 0.35 ORDER BY id_a, id_b""".stripMargin

  /** Same recursive closure as q_dedup_clusters, over the LSH cosine
    * pair graph. */
  /** Shared recursive-closure preamble: LSH pairs → undirected edges →
    * transitive reach → per-vector smallest-member component label. */
  private def simCompSqlPrefix: String =
    s"""$lshPairsSqlPrefix,
       |jp AS (SELECT id_a, id_b FROM pairs WHERE cosine >= 0.35),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM jp
       |          UNION SELECT id_b, id_a FROM jp),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src),
       |comp AS (
       |  SELECT src AS vec_id, least(src, min(dst)) AS cluster_id
       |  FROM reach GROUP BY src)""".stripMargin

  private def simClustersOracleSql: String =
    s"""WITH RECURSIVE $simCompSqlPrefix
       |SELECT vec_id, cluster_id,
       |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       |  vec_id = cluster_id AS is_canonical
       |FROM comp ORDER BY vec_id""".stripMargin

  /** SemDeDup APPLY: drop every non-canonical member of a semantic
    * near-dup cluster (keep the smallest vec_id per component plus all
    * unclustered vectors) — the embedding-space mirror of
    * `q_dedup_apply`. One anti-join of the corpus against the
    * non-canonical side of the shared cluster frame; the LSH+CC subtree
    * is the persisted [[sharedSimClusters]], so the apply costs one
    * probe regardless of how many queries read the clusters. */
  private def semdedupApply(s: SparkSession, dir: String): DataFrame = {
    val dropIds = sharedSimClusters(s, dir)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("vec_id"))
    Tables.embeddings(s, dir)
      .join(dropIds, Seq("vec_id"), "left_anti")
      .select("vec_id", "label")
      .orderBy("vec_id")
  }

  /** Multimodal decode: binary payloads -> typed features via partition-wise
    * stub codec (md5-derived, so fully oracle-checkable). */
  private def mmFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(s, Multimodal.asMedia(Tables.documents(s, dir)))
      .toDF()
      .orderBy("doc_id")

  /** IVF ANN top-5 (8 seeded centroids, probe 3). Oracle-verified: the
    * centroids are the 8 corpus vectors whose md5("ivf_" || vec_id) keys
    * sort first — a deterministic function of the data the SQL oracle
    * recomputes itself, so seed choice, list assignment, probe order and
    * final ranking are all pinned cross-engine. The k-means-refined
    * [[Similarity.ivfTopK]] stays the production path (recall-tested in
    * DedupSpec). */
  private def ivf(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfSeededTopK(Tables.embeddings(s, dir), col("vec_id") < 5,
        k = 5, nCentroids = 8, nProbe = 3)
      .orderBy("query_id", "rank")

  /** Incremental IVF insert ([[Similarity.ivfIncrementalTopK]]): vectors
    * with vec_id % 10 == 9 arrive as the batch; centroids seed from the
    * corpus ONLY, the batch lands in the existing lists, and the same
    * queries immediately see inserted neighbors (`from_batch`). The
    * incremental-index discipline of the dedup families applied to ANN. */
  private def ivfIncr(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfIncrementalTopK(Tables.embeddings(s, dir),
        isNew = col("vec_id") % 10 === 9, isQuery = col("vec_id") < 5,
        k = 5, nCentroids = 8, nProbe = 3)
      .withColumn("from_batch", col("neighbor_id") % 10 === 9)
      .orderBy("query_id", "rank")

  /** Audio decode over audio-typed payloads: real WAV header parse where
    * the bytes are RIFF, md5-derived stand-in otherwise (the text corpus
    * is all stand-in — that is what the oracle replays; real-WAV parsing
    * is pinned by MultimodalSpec fixture bytes). */
  private def mmAudio(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeAudio(s, Multimodal.asMedia(Tables.documents(s, dir)))
      .toDF()
      .orderBy("doc_id")

  /** Video container decode over video-typed payloads: real MP4 mvhd
    * parse where the bytes are ISO-BMFF, md5-derived stand-in otherwise
    * (the text corpus is all stand-in — what the oracle replays; real
    * MP4 parsing is pinned by MultimodalSpec fixture bytes). */
  private def mmVideo(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeVideo(s, Multimodal.asMedia(Tables.documents(s, dir)))
      .toDF()
      .orderBy("doc_id")

  /** Frame sampling over video payloads: per-frame rows fan out AFTER
    * partition-wise feature extraction, so media bytes are never
    * duplicated per frame (see [[Multimodal.sampleFrames]]). */
  private def mmFrames(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(s, Multimodal.asMedia(Tables.documents(s, dir)))
      .toDF()
      .orderBy("doc_id", "frame_idx")

  /** REAL GIF frame decode under an oracle gate: every doc_id is encoded
    * into a structurally varied well-formed GIF ([[graft.ops.GifFixtures]]
    * — color tables, comment extensions, graphic-control delays, multi-
    * sub-block image data, all pure integer functions of doc_id), then
    * decoded back by the real block walk [[GifHeaders.gifInfo]]. The SQL
    * oracle predicts the metadata from the same formulas WITHOUT parsing
    * bytes, so a hash match proves the parser rediscovers exactly what the
    * independent encoder wrote. */
  private def mmGif(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id")).as[Long]
      .map(id => Multimodal.MediaRecord(
        id, graft.ops.GifFixtures.synthGif(id), "image"))
      .toDF()
    Multimodal.decodeGifFrames(s, media).toDF().orderBy("doc_id", "frame_idx")
  }

  /** Pixel-level fixture corpus: every doc_id encoded as a 4-color GIF
    * with REAL LZW-compressed pixels ([[graft.ops.GifPixelFixtures]] —
    * an independent compressor; the decode side shares no code). */
  private def pixelGifMedia(s: SparkSession, dir: String,
                            limit: Option[Long] = None): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, dir).select(col("doc_id"))
    limit.fold(ids)(n => ids.filter(col("doc_id") < n)).as[Long]
      .map(id => Multimodal.MediaRecord(
        id, graft.ops.GifPixelFixtures.synthPixelGif(id), "image"))
      .toDF()
  }

  /** REAL PNG pixel decode under an oracle gate ([[graft.ops.Png]]):
    * every doc_id < 600 is encoded as a PNG by the independent fixture
    * encoder ([[graft.ops.PngFixtures]] — own filtered-scanline writer +
    * Deflater zlib stream, per-row filter type cycling through ALL FIVE
    * predictors, gray/RGB/RGBA color types by doc_id % 3), then decoded
    * back by the real chunk walk + CRC verify + Inflater + un-filter
    * chain and dHashed. The SQL oracle recomputes every pixel, cell sum,
    * and band bit from the channel formulas without touching a byte —
    * agreement pins signature/CRC/inflate/all-five-filters/luma/dHash
    * end to end. Corpus bounded (doc_id < 600) only to bound the
    * oracle's per-pixel replay; the Spark path is per-partition. */
  private def mmPng(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id")).filter(col("doc_id") < 600).as[Long]
      .map(id => Multimodal.MediaRecord(
        id, graft.ops.PngFixtures.synthPng(id), "image"))
      .toDF()
    graft.ops.Png.phash(s, media).toDF().orderBy("doc_id")
  }

  /** REAL baseline JPEG pixel decode under an oracle gate
    * ([[graft.ops.Jpeg]]): block-constant grayscale fixtures from the
    * independent encoder (own bit-writer, canonical-code assignment,
    * restart markers, byte stuffing) through the full marker walk +
    * Huffman + dequant + IDCT chain, then dHashed. A constant 8x8 block
    * has only a DC coefficient, whose quantize->dequantize->IDCT
    * round-trip is integer arithmetic — decoded = clamp(v + v%2) at
    * q_DC=16 — which is what makes a LOSSY codec hash-gateable; the
    * general AC path is JpegSpec's bounded-error round-trip. */
  private def mmJpegPx(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id")).filter(col("doc_id") < 600).as[Long]
      .map(id => Multimodal.MediaRecord(
        id, graft.ops.JpegFixtures.synthJpeg(id), "image"))
      .toDF()
    graft.ops.Jpeg.phash(s, media).toDF().orderBy("doc_id")
  }

  /** Per-frame VIDEO PIXEL decode: AVI containers whose every 00dc frame
    * is a real block-constant baseline JPEG; the RIFF walk + full JPEG
    * decode chain runs per frame and the oracle replays each frame's
    * decoded luma from the closed form ([[graft.ops.Multimodal.decodeAviPixelFrames]]).
    * Composes the two decoders the round built separately: container
    * framing from `q_mm_video_frames`, pixel arithmetic from
    * `q_mm_jpeg_px`. */
  private def mmVideoPx(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id")).filter(col("doc_id") < 400).as[Long]
      .map(id => Multimodal.MediaRecord(
        id, graft.ops.AviFixtures.synthMjpegPxAvi(id), "video"))
      .toDF()
    Multimodal.decodeAviPixelFrames(s, media).toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** Scene-change detection over decoded video frames — the frame-sample
    * selector a video training pipeline runs (keep one frame per scene
    * instead of one per N): consecutive-frame mean-luma comparison in
    * the EXACT cross-multiplied integer domain, cut when
    * |luma·px_prev − luma_prev·px| ≥ 16·px·px_prev (mean-luma jump of
    * 16/255) — no per-pixel diff ever crosses the decode boundary, and
    * no decision sits on a float. Products are frame-bounded
    * (luma ≤ 255·px; at 1e6-px production frames the cross terms stay
    * ~2.5e14 « 2^63). Decode is per-partition (the q_mm_video_px
    * chain); the only exchange is the doc-keyed lag window over
    * frames-per-video rows. */
  private def mmSceneCuts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id")).filter(col("doc_id") < 400).as[Long]
      .map(id => Multimodal.MediaRecord(
        id, graft.ops.AviFixtures.synthMjpegPxAvi(id), "video"))
      .toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    Multimodal.decodeAviPixelFrames(s, media).toDF()
      .withColumn("prev_luma", lag("luma_sum", 1).over(w))
      .withColumn("prev_px", lag("n_pixels", 1).over(w))
      .filter(col("prev_luma").isNotNull)
      .withColumn("is_cut",
        abs(col("luma_sum") * col("prev_px") -
          col("prev_luma") * col("n_pixels")) >=
          lit(16L) * col("n_pixels") * col("prev_px"))
      .withColumn("n_cuts",
        sum(when(col("is_cut"), 1L).otherwise(0L))
          .over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .select("doc_id", "frame_idx", "n_pixels", "luma_sum",
        "prev_px", "prev_luma", "is_cut", "n_cuts")
      .orderBy("doc_id", "frame_idx")
  }

  /** Per-frame MP4 PIXEL decode ([[graft.ops.Multimodal.decodeMp4PixelFrames]]):
    * MJPEG-in-MP4 containers from the independent fixture muxer
    * ([[graft.ops.Mp4Fixtures]] — real ftyp/mdat/moov with a 2-run stsc,
    * per-sample stsz, absolute stco), every sample located purely via
    * the stsd/stsc/stsz/stco walk and decoded by the full baseline JPEG
    * chain. The oracle replays the decoded luma from the closed form and
    * the chunk assignment from the stsc plan — a shifted offset or
    * miscounted size anywhere in the table walk breaks the hash. */
  private def mmMp4Frames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id")).filter(col("doc_id") < 400).as[Long]
      .map(id => Multimodal.MediaRecord(
        id, graft.ops.Mp4Fixtures.synthMjpegMp4(id), "video"))
      .toDF()
    Multimodal.decodeMp4PixelFrames(s, media).toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** ANN index EVALUATION: recall@5 of the seeded IVF against the
    * brute-force exact top-5, per query — the accept/reject number an
    * index rollout is judged by, produced by the engine itself instead
    * of a notebook. Both pipelines are deterministic (md5 seeding,
    * tie-broken ranks), so even the recall fractions hash-gate. Costs
    * one join of two k-row-per-query frames the group already builds. */
  private def annRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val brute = Similarity.cosineTopK(emb, col("vec_id") < 5, 5)
      .select(col("query_id"), col("neighbor_id"))
    val ivf = Similarity.ivfSeededTopK(emb, col("vec_id") < 5,
        k = 5, nCentroids = 8, nProbe = 3)
      .select(col("query_id"), col("neighbor_id").as("ivf_neighbor"))
    brute.join(ivf,
        brute("query_id") === ivf("query_id") &&
          col("neighbor_id") === col("ivf_neighbor"), "left")
      .groupBy(brute("query_id").as("query_id"))
      .agg(count(col("ivf_neighbor")).as("n_hits"))
      .withColumn("recall", round(col("n_hits").cast("double") / 5, 6))
      .orderBy("query_id")
  }

  /** Audio track demuxed from INTERLEAVED AVI containers
    * ([[graft.ops.Multimodal.decodeAviAudio]]): 01wb PCM chunks woven
    * between the 00dc video frames concatenate into the stream's track,
    * fingerprinted by the SAME 65-window energy pipeline standalone WAV
    * uses — one audio fingerprint across container formats. */
  private def mmAviAudio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id")).filter(col("doc_id") < 300).as[Long]
      .map(id => Multimodal.MediaRecord(
        id, graft.ops.AviFixtures.synthAvAvi(id), "video"))
      .toDF()
    Multimodal.decodeAviAudio(s, media).toDF().orderBy("doc_id")
  }

  /** REAL pixel decode under an oracle gate: LZW-decompress frame 0,
    * map the palette to integer luma, box-downscale to the 9x8 dHash
    * grid, emit the 64 comparison bits as four 16-bit bands. The SQL
    * oracle recomputes every pixel, cell sum, and bit from the fixture
    * formulas WITHOUT touching bytes — a hash match proves the
    * independent encode -> LZW decode -> downscale -> hash chain. */
  private def mmPhash(s: SparkSession, dir: String): DataFrame =
    ImageHash.phash(s, pixelGifMedia(s, dir)).toDF().orderBy("doc_id")

  /** Image near-dup pairs over the perceptual hashes: banded equi-join
    * candidates (4 x 16-bit bands — hamming <= 3 recall is EXACT by
    * pigeonhole, same invariant as the SimHash64 text detector), then
    * the full 64-bit hamming verify. Restricted to doc_id < 120 to keep
    * the oracle's brute-force twin bounded; the Spark side never goes
    * all-pairs at any corpus size. */
  private def mmPhashDup(s: SparkSession, dir: String): DataFrame =
    ImageHash.phashPairs(
        ImageHash.phash(s, pixelGifMedia(s, dir, Some(120L))).toDF(),
        maxHamming = 3)
      .orderBy("doc_a", "doc_b")

  /** Frame sampling with REAL pixel decode: every frame of every
    * (1-or-2-frame) fixture GIF is LZW-decoded and summarized by exact
    * luma sum — the animated-media version of the phash gate. */
  private def mmFramePx(s: SparkSession, dir: String): DataFrame =
    ImageHash.frameLumas(s, pixelGifMedia(s, dir)).toDF()
      .orderBy("doc_id", "frame_idx")

  /** REAL per-frame video decode under an oracle gate: every doc_id is
    * encoded as an MJPEG/raw AVI ([[graft.ops.AviFixtures]] — RIFF lists,
    * JUNK padding, idx1 index, odd-size chunk padding, per-frame JPEG
    * dimensions and raw 8-bit rasters, all pure integer functions of
    * doc_id), then decoded back by the real container walk
    * ([[graft.ops.AviHeaders]] + the per-frame SOF parse / exact luma
    * sum). The SQL oracle predicts geometry, byte counts, and pixel sums
    * from the same formulas WITHOUT parsing bytes. Corpus bounded at
    * doc_id < 600 to keep the oracle's per-pixel replay bounded at any
    * sf; the Spark decode path itself is per-partition streaming and
    * corpus-size-independent. */
  private def mmVideoFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id")).filter(col("doc_id") < 600).as[Long]
      .map(id => Multimodal.MediaRecord(
        id, graft.ops.AviFixtures.synthAvi(id), "video"))
      .toDF()
    Multimodal.decodeAviFrames(s, media).toDF().orderBy("doc_id", "frame_idx")
  }

  /** PCM fixture corpus: every doc_id encoded as a 16-bit mono WAV whose
    * samples follow [[graft.ops.AudioFixtures]]' integer formulas. */
  private def wavMedia(s: SparkSession, dir: String,
                       limit: Option[Long] = None): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, dir).select(col("doc_id"))
    limit.fold(ids)(n => ids.filter(col("doc_id") < n)).as[Long]
      .map(id => Multimodal.MediaRecord(
        id, graft.ops.AudioFixtures.synthWav(id), "audio"))
      .toDF()
  }

  /** REAL PCM decode under an oracle gate: 16-bit LE samples decoded
    * from the independently-encoded WAV, 65-window exact abs-sum
    * energies, 64 adjacent comparisons as 4x16-bit bands — the audio
    * mirror of `q_mm_phash`. */
  private def mmAudioFp(s: SparkSession, dir: String): DataFrame =
    graft.ops.AudioHash.fingerprint(s, wavMedia(s, dir)).toDF()
      .orderBy("doc_id")

  /** Silence-aware audio segmentation — the VAD-style pass a speech
    * corpus runs before transcription (split tracks on low-energy
    * stretches, keep voiced segments): a fingerprint window is SILENT
    * when its mean |sample| falls below 9/10 of the track mean, decided
    * in the cross-multiplied integer domain (10·e·n < 9·total·c — no
    * float boundary). The comparison operands are DECIMAL(38,0): for a
    * day-long 16-bit 48 kHz track both products reach ~1e22, past 2^63,
    * so the raw-BIGINT form would wrap exactly at the documented
    * production scale. Contiguous voiced windows group into segments by the
    * island identity w − row_number() (two doc-keyed windows over 65
    * rows per track); output is one row per voiced segment with its
    * window span and energy. Decode is per-partition
    * ([[graft.ops.AudioHash.windowEnergies]]); bytes never shuffle. */
  private def mmSilence(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wins = graft.ops.AudioHash.windowEnergies(s, wavMedia(s, dir)).toDF()
    val voiced = wins
      .filter(col("e").cast("decimal(38,0)") * 10 * col("n") >=
        col("total").cast("decimal(38,0)") * 9 * col("c"))
    val byDoc = Window.partitionBy("doc_id").orderBy("w")
    voiced
      .withColumn("island", col("w") - row_number().over(byDoc))
      .groupBy("doc_id", "island")
      .agg(min(col("w")).as("start_w"), max(col("w")).as("end_w"),
        count(lit(1)).as("n_windows"), sum(col("e")).as("seg_energy"))
      .withColumn("seg_idx",
        row_number().over(Window.partitionBy("doc_id").orderBy("start_w"))
          .cast("int"))
      .select("doc_id", "seg_idx", "start_w", "end_w", "n_windows",
        "seg_energy")
      .orderBy("doc_id", "seg_idx")
  }

  /** Audio near-dup pairs: the SAME banded pair generator as image
    * dHash ([[ImageHash.phashPairs]]) over the audio fingerprints —
    * hamming <= 3 recall exact by pigeonhole; brute-force oracle twin
    * over doc_id < 120. */
  private def mmAudioDup(s: SparkSession, dir: String): DataFrame =
    ImageHash.phashPairs(
        graft.ops.AudioHash.fingerprint(s, wavMedia(s, dir, Some(120L))).toDF(),
        maxHamming = 3)
      .orderBy("doc_a", "doc_b")

  /** Incremental image near-dup: docs >= 100 arrive as a new batch
    * against the persisted fingerprint index of docs < 100 —
    * batch-vs-index + batch-vs-batch banded joins only. The oracle is
    * the FULL brute-force pair set restricted to batch-touching pairs
    * (exact restriction, since fingerprints are per-doc). */
  private def mmPhashIncr(s: SparkSession, dir: String): DataFrame = {
    val fpAll = ImageHash.phash(s, pixelGifMedia(s, dir, Some(120L))).toDF()
    ImageHash.incrementalPhashPairs(
        fpAll.filter(col("doc_id") < 100),
        fpAll.filter(col("doc_id") >= 100),
        maxHamming = 3)
      .orderBy("doc_a", "doc_b")
  }

  /** Incremental audio near-dup: same split as `q_mm_phash_incr`, same
    * generic banded core ([[ImageHash.incrementalPhashPairs]] works on
    * ANY doc_id + p0..p3 frame) over the audio fingerprints. */
  private def mmAudioIncr(s: SparkSession, dir: String): DataFrame = {
    val fpAll = graft.ops.AudioHash.fingerprint(s, wavMedia(s, dir, Some(120L))).toDF()
    ImageHash.incrementalPhashPairs(
        fpAll.filter(col("doc_id") < 100),
        fpAll.filter(col("doc_id") >= 100),
        maxHamming = 3)
      .orderBy("doc_a", "doc_b")
  }

  /** Cross-modal near-dup ensemble: the image-dHash and audio-energy
    * pair sets (both banded, hamming <= 3) full-outer merged with a
    * modality-agreement count — the multimodal mirror of the lexical
    * `q_dedup_ensemble`. A pair flagged in BOTH modalities is the
    * highest-confidence duplicate; single-modality pairs localize WHICH
    * channel matches. Inputs are the same banded joins, so the ensemble
    * costs one outer join over two bounded pair sets. */
  private def mmEnsemble(s: SparkSession, dir: String): DataFrame = {
    val img = ImageHash.phashPairs(
        ImageHash.phash(s, pixelGifMedia(s, dir, Some(120L))).toDF(), 3)
      .withColumnRenamed("hamming", "img_hamming")
    val aud = ImageHash.phashPairs(
        graft.ops.AudioHash.fingerprint(s, wavMedia(s, dir, Some(120L))).toDF(), 3)
      .withColumnRenamed("hamming", "aud_hamming")
    img.join(aud, Seq("doc_a", "doc_b"), "full_outer")
      .withColumn("n_modalities",
        when(col("img_hamming").isNotNull, 1).otherwise(0) +
          when(col("aud_hamming").isNotNull, 1).otherwise(0))
      .orderBy("doc_a", "doc_b")
  }

  /** Symmetric int8 quantization of the embedding column (the compression
    * step before shipping vectors to an ANN index): per-vector scale =
    * amax/127, q_i = floor(v_i/scale + 0.5) — exact integer round-trip
    * invariants (L1 and sum-of-squares of the codes) plus the
    * reconstruction MSE. Pure projection over the scan; the arrays never
    * leave the row, so this rides any scale. floor(x+0.5) (not round) is
    * deliberate: both engines floor identically, while double round
    * half-rules can differ. */
  /** Distributed Gram / covariance matrix over the embedding corpus —
    * the X^T X building block of PCA whitening and feature decorrelation.
    * Exact: see [[Similarity.covarianceNumerators]] (integer numerators
    * at scale 2^44, DECIMAL/HUGEINT sums; doubles only in the final
    * n^2*2^88 normalization). */
  private def embedCov(s: SparkSession, dir: String): DataFrame =
    Similarity.covarianceMatrix(sharedCovNum(s, dir)).orderBy("i", "j")

  /** First principal component by fixed-point power iteration (8 exact
    * integer rounds over the covariance numerators; see
    * [[Similarity.pc1PowerIteration]]) — the direction a whitening /
    * dimensionality-reduction pass would project out first. */
  private def embedPca(s: SparkSession, dir: String): DataFrame =
    Similarity.pc1PowerIteration(sharedCovNum(s, dir)).orderBy("pos")

  /** PCA apply: every embedding projected onto PC1 (see
    * [[Similarity.pc1Projection]]) — exact integer dot products against
    * the shared fixed-point iterate, pure projection over the scan. */
  private def embedProj(s: SparkSession, dir: String): DataFrame =
    Similarity.pc1Projection(Tables.embeddings(s, dir), sharedCovNum(s, dir))
      .orderBy("vec_id")

  private def embedQuant(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("amax", array_max(transform(col("v"), x => abs(x))))
      .withColumn("qscale", col("amax") / lit(127.0d))
      .withColumn("q", transform(col("v"), x =>
        when(col("amax") > 0, floor(x / col("qscale") + lit(0.5d)).cast("long"))
          .otherwise(lit(0L))))
      .withColumn("q_l1", aggregate(col("q"), lit(0L), (a, x) => a + abs(x)))
      .withColumn("q_sq", aggregate(col("q"), lit(0L), (a, x) => a + x * x))
      .withColumn("sse", aggregate(
        zip_with(col("v"), col("q"), (x, qi) =>
          (x - qi.cast("double") * col("qscale")) *
            (x - qi.cast("double") * col("qscale"))),
        lit(0.0d), (a, e) => a + e))
      .select(col("vec_id"),
        round(col("qscale"), 6).as("qscale"),
        col("q_l1"), col("q_sq"),
        round(col("sse") / size(col("v")), 8).as("mse"))
      .orderBy("vec_id")

  /** Semantic dedup clusters (the SemDeDup shape): connected components
    * over the embedding-cosine near-dup graph — LSH-bucketed pair
    * generation, then the same min-label propagation that clusters the
    * lexical pair graph. cluster_id = smallest member vec_id. */
  /** CC label frame over the LSH pair graph, built once per (session,
    * dir) — the iterative propagation is the expensive part. */
  private[queries] def sharedSimClusters(s: SparkSession, dir: String): DataFrame =
    SharedFrames.cached(s, s"simclusters:$dir") {
      // unwrapped (CC projects id_a/id_b itself): a .select here would
      // hide the persist from the assertPersisted contract check
      graft.ops.Dedup.connectedComponents(
        sharedLshPairs(s, dir),
        knownSize = Some(SharedFrames.memoCount(s, s"lshpairs:$dir")(
          sharedLshPairs(s, dir))))
    }

  private def simClusters(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
    sharedSimClusters(s, dir)
      .withColumnRenamed("doc_id", "vec_id")
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("is_canonical", col("vec_id") === col("cluster_id"))
      .orderBy("vec_id")
  }

  /** Exact integer covariance numerators, built once per (session, dir)
    * — shared by the covariance matrix and the PCA power iteration. */
  private[queries] def sharedCovNum(s: SparkSession, dir: String): DataFrame =
    SharedFrames.cached(s, s"covnum:$dir") {
      Similarity.covarianceNumerators(Tables.embeddings(s, dir))
    }

  override def shared: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "sim_lsh_pairs" -> sharedLshPairs,
    "sim_clusters" -> sharedSimClusters,
    "embed_cov_num" -> sharedCovNum,
    "hash_embed_vecs" -> (hashEmbedVectors(_, _)),
    "dense_cosines" -> (denseCosines(_, _)),
  )

  /** PQ codes + reconstruction error over the embedding corpus: 4
    * subspaces x 4 centroids, md5-seeded codebooks the oracle recomputes
    * (see [[Similarity.pqCodes]]). Pure projection — codebooks are
    * literals, assignment never shuffles. */
  private def embedPq(s: SparkSession, dir: String): DataFrame =
    Similarity.pqCodes(Tables.embeddings(s, dir), m = 4, k = 4)
      .orderBy("vec_id")

  /** ADC search over the PQ codes: queries vec_id < 5, top-5 by the
    * code-table distance (see [[Similarity.pqTopK]]). */
  private def simPq(s: SparkSession, dir: String): DataFrame =
    Similarity.pqTopK(Tables.embeddings(s, dir), col("vec_id") < 5,
        topK = 5, m = 4, k = 4)
      .orderBy("query_id", "rank")

  /** The composed IVF+PQ search: probe 3 of 8 IVF lists, rank
    * candidates by ADC over their PQ codes only — the full production
    * ANN pipeline in one oracle-pinned query. */
  private def simIvfPq(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfPqTopK(Tables.embeddings(s, dir), col("vec_id") < 5,
        topK = 5, nCentroids = 8, nProbe = 3, m = 4, k = 4)
      .orderBy("query_id", "rank")

  /** Feature-hashing dimension count. 16 keeps the oracle replay and the
    * |sources|²·d pair join tiny; the op is d-generic. */
  private val HashDim = 16

  /** Engine-GENERATED lexical embeddings (the hashing trick): every token
    * occurrence hashes to one of [[HashDim]] dimensions with a ±1 sign
    * drawn from an independent digest bit, and a document's vector is the
    * signed occurrence count per dimension — the classic feature-hashing
    * bag-of-words embedding (Weinberger et al.), all in exact integers.
    * This closes the loop between the text and similarity families: the
    * engine can embed a corpus with no external model and feed its own
    * centroid/cosine machinery ([[hashEmbedSim]] does exactly that).
    *
    * Long-form output (doc_id, dim, v, n_occ) — only observed dims
    * materialize, so rows ≤ min(n_tokens, d) per doc. One token explode +
    * one map-side-combined aggregation; md5-derived hash and sign, so the
    * vectors are a pure function of the data (rerun/layout stable). */
  private[queries] def hashEmbedVectors(s: SparkSession, dir: String): DataFrame =
    SharedFrames.cached(s, s"hashembed:$dir") {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(split(trim(col("text")), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0)
        .withColumn("h",
          conv(substring(md5(concat(lit("fh_"), col("tok"))), 1, 8), 16, 10)
            .cast("long"))
        .withColumn("dim", pmod(col("h"), lit(HashDim)).cast("int"))
        .withColumn("sgn", lit(1L) - lit(2L) * pmod(expr("h div 16"), lit(2)))
        .groupBy("doc_id", "dim")
        .agg(sum(col("sgn")).as("v"), count(lit(1)).as("n_occ"))
    }

  private def hashEmbed(s: SparkSession, dir: String): DataFrame =
    hashEmbedVectors(s, dir).orderBy("doc_id", "dim")

  /** Hybrid retrieval by reciprocal-rank fusion (RRF, k=60): the BM25
    * top-20 (sparse list, [[graft.ops.Retrieval.bm25TopK]]) full-outer
    * merged with the hash-embedding cosine top-20 (dense list, the same
    * [[hashEmbedVectors]] features `q_hash_embed` gates), fused by
    * integer-scaled 10^8 div (60 + rank) per list — RRF is already
    * rational, so the fused ranking never compares floats. Top-10 per
    * query, ties broken by doc id. Shape at scale: both candidate lists
    * arrive as bounded-heap top-k aggregates (20 rows per query), so the
    * fusion join and final window touch ≤40 rows per query no matter the
    * corpus size; the dense side's query vectors broadcast against the
    * (doc, dim) feature frame exactly like the BM25 postings probe. */
  /** Dense-side retrieval scores: hash-embedding cosine of every doc
    * against each query doc (doc_id < 3) — integer dots over the
    * (doc, dim) feature frame with the query vectors broadcast, doubles
    * only in the final rounded cosine. Zero-vector docs drop out. */
  private def denseCosines(s: SparkSession, dir: String): DataFrame =
    SharedFrames.cached(s, s"densecos:$dir") { denseCosinesBuild(s, dir) }

  private def denseCosinesBuild(s: SparkSession, dir: String): DataFrame = {
    val vecs = hashEmbedVectors(s, dir)
    val norms = vecs.groupBy("doc_id").agg(sum(col("v") * col("v")).as("nrm2"))
    val qv = vecs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("dim"), col("v").as("qv"))
    val qn = norms.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("nrm2").as("qn2"))
    vecs.join(broadcast(qv), Seq("dim"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("v") * col("qv")).as("dot"))
      .join(norms, Seq("doc_id"))
      .join(broadcast(qn), Seq("query_id"))
      .filter(col("nrm2") > 0 && col("qn2") > 0)
      .withColumn("cosine", round(col("dot").cast("double") /
        (sqrt(col("nrm2").cast("double")) * sqrt(col("qn2").cast("double"))), 6))
  }

  private def rankFusion(s: SparkSession, dir: String): DataFrame = {
    val sparse = graft.ops.Retrieval
      .bm25TopK(Tables.documents(s, dir), col("doc_id") < 3, 5, 20,
        scoredOpt = Some(CorpusQueries.sharedBm25Scores(s, dir)))
      .select(col("query_id"), col("doc_id"), col("rank").as("bm25_rank"))
    val dense = denseCosines(s, dir).groupBy("query_id")
      .agg(graft.functions.TopK.topK(col("cosine"), col("doc_id"), 20).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("doc_id"),
        (col("pos") + 1).cast("int").as("cos_rank"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("rrf_scaled").desc, col("doc_id").asc)
    sparse.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_scaled",
        coalesce(expr("100000000 div (60 + bm25_rank)"), lit(0L)) +
          coalesce(expr("100000000 div (60 + cos_rank)"), lit(0L)))
      .withColumn("fused_rank", row_number().over(w).cast("int"))
      .filter(col("fused_rank") <= 10)
      .select("query_id", "doc_id", "bm25_rank", "cos_rank",
        "rrf_scaled", "fused_rank")
      .orderBy("query_id", "fused_rank")
  }

  /** MMR diversity rerank (λ = 0.7) of the dense top-20: greedily pick 5
    * results maximizing λ·rel − (1−λ)·max-sim-to-already-selected — the
    * rerank step after [[rankFusion]]'s candidate fusion, which stops a
    * result page (or a few-shot example set) from being five paraphrases
    * of the same document. rel = query cosine, sim = candidate-pair
    * cosine, both the rounded-6 cross-engine keys; λ-arithmetic runs in
    * raw doubles (identical operand order both engines, so no fudge).
    *
    * Shape at scale: candidate generation (bounded-heap top-20) and the
    * candidate-pair similarity matrix (≤ queries·k² rows via the dim
    * equi-join) stay distributed; ONLY the queries·k candidate rows and
    * queries·k²/2 sim rows — bounded by the report size, not the corpus —
    * are pulled to the driver for the inherently sequential k-step
    * greedy, the same bounded-collect envelope as the IVF centroid
    * matrices. The greedy replays in the oracle as 5 unrolled SQL
    * rounds. */
  private def mmrRerank(s: SparkSession, dir: String): DataFrame = {
    val (kCand, kSel) = (20, 5)
    // LOAD-BEARING bound for the driver pull below: the greedy collects
    // queries·kCand candidate rows + queries·kCand²/2 sim rows. Scale-safe
    // only while kCand stays report-sized — if it ever becomes a parameter,
    // this guard fails fast instead of silently pulling a corpus slice
    // (move the greedy into a per-query mapGroups at that point).
    require(kCand <= 100,
      s"mmrRerank pulls O(queries * kCand^2) rows to the driver; " +
        s"kCand=$kCand exceeds the audited report-size bound")
    val cand = denseCosines(s, dir).groupBy("query_id")
      .agg(graft.functions.TopK.topK(col("cosine"), col("doc_id"), kCand)
        .as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t.id").as("doc_id"),
        col("t.value").as("rel"))
    val vecs = hashEmbedVectors(s, dir)
    val norms = vecs.groupBy("doc_id").agg(sum(col("v") * col("v")).as("nrm2"))
    val cd = cand.select("query_id", "doc_id")
    val cv = cd.join(vecs, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), col("dim"), col("v"))
    val dots = cv.alias("a").join(cv.alias("b"),
        col("a.query_id") === col("b.query_id") &&
          col("a.dim") === col("b.dim") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.query_id").as("query_id"), col("a.doc_id").as("d_a"),
        col("b.doc_id").as("d_b"))
      .agg(sum(col("a.v") * col("b.v")).as("dot"))
    val sims = cd.alias("x").join(cd.alias("y"),
        col("x.query_id") === col("y.query_id") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.query_id").as("query_id"), col("x.doc_id").as("d_a"),
        col("y.doc_id").as("d_b"))
      .join(dots, Seq("query_id", "d_a", "d_b"), "left")
      .join(norms.select(col("doc_id").as("d_a"), col("nrm2").as("na")),
        Seq("d_a"))
      .join(norms.select(col("doc_id").as("d_b"), col("nrm2").as("nb")),
        Seq("d_b"))
      .select(col("query_id"), col("d_a"), col("d_b"),
        round(coalesce(col("dot"), lit(0L)).cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))),
          6).as("sim"))
    // bounded driver pull: queries·k candidates + queries·k²/2 sims
    val candRows = cand.select("query_id", "doc_id", "rel").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val simMap = sims.collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getDouble(3)))
      .toMap
    def simOf(q: Long, a: Long, b: Long): Double =
      if (a < b) simMap((q, a, b)) else simMap((q, b, a))
    val out = candRows.groupBy(_._1).toSeq.flatMap { case (q, cs) =>
      var remaining = cs.map { case (_, d, rel) => (d, rel) }.toList
      var selected = List.empty[Long]
      (1 to kSel).flatMap { r =>
        if (remaining.isEmpty) None
        else {
          val best = remaining.map { case (d, rel) =>
            val ms =
              if (selected.isEmpty) 0.0
              else selected.map(sd => simOf(q, d, sd)).max
            (d, rel, ms, 0.7 * rel - 0.3 * ms)
          }.minBy { case (d, _, _, m) => (-m, d) }
          selected ::= best._1
          remaining = remaining.filterNot(_._1 == best._1)
          Some((q, best._1, best._2, best._3, best._4, r))
        }
      }
    }
    import s.implicits._
    out.toDF("query_id", "doc_id", "rel", "max_sim", "mmr", "sel_rank")
      .withColumn("sel_rank", col("sel_rank").cast("int"))
      .orderBy("query_id", "sel_rank")
  }

  /** Source-centroid cosine matrix over the HASHED vectors — the lexical
    * source-similarity monitor, computed entirely from engine-generated
    * embeddings: per-(source, dim) sums (the un-normalized centroid — the
    * 1/n cancels inside cosine, as in `q_label_cosine`), then pairwise
    * integer dots over a |sources|²·d-bounded self-join. Doubles appear
    * only in the final sqrt/divide. A pair of sources that copy each
    * other's text shows up here even when no single document pair
    * crosses the near-dup threshold. */
  private def hashEmbedSim(s: SparkSession, dir: String): DataFrame = {
    val cent = hashEmbedVectors(s, dir)
      .join(Tables.documents(s, dir).select("doc_id", "source"), "doc_id")
      .groupBy("source", "dim")
      .agg(sum("v").cast("decimal(38,0)").as("sv"))
    val norms = cent.groupBy("source")
      .agg(sum(col("sv") * col("sv")).as("nrm"))
    val a = cent.select(col("source").as("source_a"), col("dim"),
      col("sv").as("sva"))
    val b = cent.select(col("source").as("source_b"), col("dim"),
      col("sv").as("svb"))
    a.join(b, Seq("dim"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(sum(col("sva") * col("svb")).as("dot"))
      .join(norms.select(col("source").as("source_a"), col("nrm").as("na")),
        Seq("source_a"))
      .join(norms.select(col("source").as("source_b"), col("nrm").as("nb")),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"),
        col("dot").cast("long").as("dot"),
        when(col("na") === 0 || col("nb") === 0, lit(null)).otherwise(
          round(col("dot").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))),
            6)).as("cosine"))
      .orderBy("source_a", "source_b")
  }

  /** EXIF metadata extraction under the oracle gate ([[graft.ops.Exif]]):
    * every doc is a REAL JPEG ([[graft.ops.JpegFixtures]] stream) with an
    * APP1 EXIF block spliced in by the INDEPENDENT fixture encoder —
    * TIFF byte order alternates by doc_id, odd ids bury the APP1 behind
    * another segment (so only a real marker WALK finds it), strings are
    * offset-stored, scalars inline, exposure an offset RATIONAL, plus an
    * unknown tag mid-IFD proving generic skip. The from-scratch TIFF IFD
    * walker parses it all back per partition (bytes never shuffle), and
    * the oracle recomputes every field from the doc_id formulas without
    * touching a byte. Typed capture metadata is what multimodal curation
    * filters on: orientation-aware dedup, capture-time windows, camera
    * strata. */
  private def mmExif(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap(id => graft.ops.Exif.exifInfo(
        id, graft.ops.ExifFixtures.synthJpegWithExif(id))))
      .toDF()
      .select(col("docId").as("doc_id"), col("byteOrder").as("byte_order"),
        col("orientation"), col("make"), col("model"),
        col("dateTime").as("datetime"), col("pxX").as("px_x"),
        col("pxY").as("px_y"), col("iso"), col("exposureDen").as("exposure_den"))
      .orderBy("doc_id")
  }

  /** Hyperplane-LSH tuning report — the semantic twin of `q_lsh_curve`:
    * for every vector pair in a DETERMINISTIC sample (vec_id % 5 — the
    * curve is a property of the geometry, not the corpus size, so a
    * sample is how this diagnostic runs at 100 TB), bucket the exact
    * cosine into tenths and report what fraction of each bucket the
    * 8-plane sign bucket surfaces (identical signs on all planes). The
    * ground truth is inherently all-pairs, so the sample side BROADCASTS
    * (the cosineTopK pattern) — bounded by the sample, never a shuffle
    * cartesian. Reads: high-cosine buckets should collide (recall),
    * low/negative ones shouldn't (wasted verifies). */
  private def simCurve(s: SparkSession, dir: String): DataFrame = {
    val sampled = Tables.embeddings(s, dir).filter(col("vec_id") % 5 === 0)
    val b = SharedFrames.register(
      Similarity.withNorm(Similarity.withLshBucket(sampled, 8)))
    val a = b.select(col("vec_id").as("id_a"), col("v").as("v_a"),
      col("nrm").as("n_a"), col("bucket").as("bkt_a"))
    val c = b.select(col("vec_id").as("id_b"), col("v").as("v_b"),
      col("nrm").as("n_b"), col("bucket").as("bkt_b"))
    a.crossJoin(broadcast(c))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        Similarity.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .withColumn("cos_bucket", floor(col("cosine") * 10).cast("int"))
      .withColumn("is_cand", (col("bkt_a") === col("bkt_b")).cast("long"))
      .groupBy("cos_bucket")
      .agg(count(lit(1)).as("n_pairs"), sum("is_cand").as("n_candidates"))
      .select(col("cos_bucket"), col("n_pairs"), col("n_candidates"),
        round(col("n_candidates").cast("double") / col("n_pairs"), 6)
          .as("candidate_rate"))
      .orderBy("cos_bucket")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_curve" -> simCurve,
    "q_mm_exif" -> mmExif,
    "q_hash_embed" -> hashEmbed,
    "q_hash_embed_sim" -> hashEmbedSim,
    "q_rank_fusion" -> rankFusion,
    "q_mmr_rerank" -> mmrRerank,
    "q_sim_clusters" -> simClusters,
    "q_semdedup_apply" -> semdedupApply,
    "q_embed_quant" -> embedQuant,
    "q_embed_cov" -> embedCov,
    "q_label_cosine" -> labelCosine,
    "q_embed_pca" -> embedPca,
    "q_embed_proj" -> embedProj,
    "q_embed_pq" -> embedPq,
    "q_sim_pq" -> simPq,
    "q_sim_ivf_pq" -> simIvfPq,
    "q_sim_topk" -> topk,
    "q_contamination_embed" -> contaminationEmbed,
    "q_sim_lsh" -> lsh,
    "q_sim_ivf" -> ivf,
    "q_sim_ivf_incr" -> ivfIncr,
    "q_ann_recall" -> annRecall,
    "q_mm_features" -> mmFeatures,
    "q_mm_frames" -> mmFrames,
    "q_mm_gif" -> mmGif,
    "q_mm_png" -> mmPng,
    "q_mm_jpeg_px" -> mmJpegPx,
    "q_mm_video_px" -> mmVideoPx,
    "q_mm_scene_cuts" -> mmSceneCuts,
    "q_mm_mp4_frames" -> mmMp4Frames,
    "q_mm_avi_audio" -> mmAviAudio,
    "q_mm_phash" -> mmPhash,
    "q_mm_phash_dup" -> mmPhashDup,
    "q_mm_frame_px" -> mmFramePx,
    "q_mm_audio" -> mmAudio,
    "q_mm_audio_fp" -> mmAudioFp,
    "q_mm_silence" -> mmSilence,
    "q_mm_audio_dup" -> mmAudioDup,
    "q_mm_ensemble" -> mmEnsemble,
    "q_mm_phash_incr" -> mmPhashIncr,
    "q_mm_audio_incr" -> mmAudioIncr,
    "q_mm_video" -> mmVideo,
    "q_mm_video_frames" -> mmVideoFrames,
  )

  /** Shared phash oracle preamble: replays the ENTIRE pixel pipeline of
    * [[graft.ops.GifPixelFixtures]] + [[graft.ops.ImageHash]] from the
    * fixture formulas — per-pixel luma, 9x8 floor-div cell sums, the 64
    * cross-multiplied comparison bits, and the four 16-bit bands — ending
    * in a `ph(doc_id, w, h, gray_sum, p0..p3)` CTE. `docFilter` bounds
    * the doc set (e.g. "WHERE doc_id < 120" for the pair twin); `n`
    * prefixes every CTE name so two preambles can share one WITH clause
    * (parameterized names, never post-hoc string surgery). */
  private def phashSqlPrefix(docFilter: String, n: String = ""): String =
    s"""${n}d AS (
       |  SELECT doc_id, doc_id % 7 AS base, doc_id % 40 AS poff,
       |    9 * ((doc_id % 7) % 3 + 2) AS w, 8 * ((doc_id % 7) % 4 + 2) AS h,
       |    CASE WHEN doc_id % 29 = 0 THEN 1 ELSE 0 END AS pert
       |  FROM documents $docFilter),
       |${n}xs AS (SELECT unnest(generate_series(0, 35)) AS x),
       |${n}ys AS (SELECT unnest(generate_series(0, 39)) AS y),
       |${n}pix AS (
       |  SELECT doc_id, w, h, x, y,
       |    40 * ((CAST(base + 1 AS BIGINT) * (3 * x + 7 * y + x * y + 1)
       |           + CASE WHEN pert = 1 AND x = y THEN 1 ELSE 0 END) % 4) + poff AS g
       |  FROM ${n}d CROSS JOIN ${n}xs CROSS JOIN ${n}ys
       |  WHERE x < w AND y < h),
       |${n}cells AS (
       |  SELECT doc_id, (y * 8) // h AS r, (x * 9) // w AS c,
       |    CAST(sum(g) AS BIGINT) AS cs, COUNT(*) AS cn
       |  FROM ${n}pix GROUP BY 1, 2, 3),
       |${n}bits AS (
       |  SELECT a.doc_id, a.r * 8 + a.c AS idx,
       |    CASE WHEN a.cs * b.cn < b.cs * a.cn THEN 1 ELSE 0 END AS bit
       |  FROM ${n}cells a JOIN ${n}cells b
       |    ON a.doc_id = b.doc_id AND a.r = b.r AND b.c = a.c + 1
       |  WHERE a.c < 8),
       |${n}bands AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN idx // 16 = 0 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS p0,
       |    CAST(sum(CASE WHEN idx // 16 = 1 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS p1,
       |    CAST(sum(CASE WHEN idx // 16 = 2 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS p2,
       |    CAST(sum(CASE WHEN idx // 16 = 3 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS p3
       |  FROM ${n}bits GROUP BY doc_id),
       |${n}gs AS (SELECT doc_id, CAST(sum(g) AS BIGINT) AS gray_sum FROM ${n}pix GROUP BY doc_id),
       |${n}ph AS (
       |  SELECT ${n}d.doc_id, w, h, gray_sum, p0, p1, p2, p3
       |  FROM ${n}d JOIN ${n}gs USING (doc_id) JOIN ${n}bands USING (doc_id))""".stripMargin

  /** Shared audio-fingerprint oracle preamble: replays sample synthesis
    * ([[graft.ops.AudioFixtures]] formulas) -> 65-window abs-sum energies
    * -> 64 comparison bits -> 4x16-bit bands, ending in an
    * `af(doc_id, n, abs_sum, p0..p3)` CTE. `n` prefixes every CTE name
    * (shared-WITH composition, as in [[phashSqlPrefix]]). */
  private def audioFpSqlPrefix(docFilter: String, n: String = ""): String =
    s"""${n}d AS (
       |  SELECT doc_id, doc_id % 5 AS abase,
       |    2048 + (doc_id % 5) * 512 AS n,
       |    CASE WHEN doc_id % 31 = 0 THEN 1 ELSE 0 END AS clicky
       |  FROM documents $docFilter),
       |${n}ts AS (SELECT unnest(generate_series(0, 5119)) AS t),
       |${n}smp AS (
       |  SELECT doc_id, n, t, (t * 65) // n AS w,
       |    CAST((abase + 1) * ((t * t + 3 * t) % 977) % 2001 - 1000
       |      + CASE WHEN clicky = 1 AND t % 50 = 0 THEN 200 ELSE 0 END AS BIGINT) AS s
       |  FROM ${n}d CROSS JOIN ${n}ts WHERE t < n),
       |${n}wins AS (
       |  SELECT doc_id, w, CAST(sum(abs(s)) AS BIGINT) AS e, COUNT(*) AS c
       |  FROM ${n}smp GROUP BY 1, 2),
       |${n}bits AS (
       |  SELECT a.doc_id, a.w AS idx,
       |    CASE WHEN a.e * b.c < b.e * a.c THEN 1 ELSE 0 END AS bit
       |  FROM ${n}wins a JOIN ${n}wins b ON a.doc_id = b.doc_id AND b.w = a.w + 1
       |  WHERE a.w < 64),
       |${n}bands AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN idx // 16 = 0 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS p0,
       |    CAST(sum(CASE WHEN idx // 16 = 1 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS p1,
       |    CAST(sum(CASE WHEN idx // 16 = 2 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS p2,
       |    CAST(sum(CASE WHEN idx // 16 = 3 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS p3
       |  FROM ${n}bits GROUP BY doc_id),
       |${n}asum AS (SELECT doc_id, CAST(sum(abs(s)) AS BIGINT) AS abs_sum FROM ${n}smp GROUP BY doc_id),
       |${n}af AS (
       |  SELECT ${n}d.doc_id, n, abs_sum, p0, p1, p2, p3
       |  FROM ${n}d JOIN ${n}asum USING (doc_id) JOIN ${n}bands USING (doc_id))""".stripMargin

  /** Shared PQ oracle preamble (after an `e(vec_id, v)` CTE): per
    * subspace j, `cent<j>(c, cv)` = the md5-seeded codebook and
    * `a<j>(vec_id, code_j, d_j)` = the argmin assignment — the SQL twin
    * of [[Similarity.pqCodes]], consumed by q_embed_pq and q_sim_pq. */
  private def pqSqlSubs: String = (1 to 4).map { j =>
    val lo = (j - 1) * 16 + 1
    val hi = j * 16
    s"""cent$j AS (
       |  SELECT CAST(row_number() OVER (ORDER BY md5('pq${j}_' || CAST(vec_id AS VARCHAR))) AS INTEGER) - 1 AS c,
       |    v[$lo:$hi] AS cv
       |  FROM e
       |  QUALIFY row_number() OVER (ORDER BY md5('pq${j}_' || CAST(vec_id AS VARCHAR))) <= 4),
       |a$j AS (
       |  SELECT vec_id, c AS code_$j, d AS d$j FROM (
       |    SELECT e.vec_id, cent$j.c,
       |      list_dot_product(cent$j.cv, cent$j.cv)
       |        - 2 * list_dot_product(e.v[$lo:$hi], cent$j.cv) AS d
       |    FROM e CROSS JOIN cent$j)
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, c) = 1)""".stripMargin
  }.mkString(",\n")

  /** Shared oracle preamble for the covariance family: scaled integer
    * elements (x * 2^44 is exact for every float32 in the data range),
    * per-dimension sums, upper-triangle product sums, and the exact
    * integer numerator cnum(i, j, c) with the vector count in nn. */
  /** Per-label centroid cosine matrix ([[Similarity.labelCentroidCosine]])
    * — the topic-collapse monitor; diagonal = 1 by construction. */
  private def labelCosine(s: SparkSession, dir: String): DataFrame =
    Similarity.labelCentroidCosine(Tables.embeddings(s, dir))
      .withColumn("cosine", round(col("cosine"), 6))
      .orderBy("label_a", "label_b")

  private val covSqlPrefix: String =
    """WITH ex AS MATERIALIZED (SELECT vec_id, i - 1 AS pos,
      |    CAST(x * 17592186044416 AS HUGEINT) AS xs
      |  FROM (SELECT vec_id, unnest(embedding)::DOUBLE AS x,
      |        generate_subscripts(embedding, 1) AS i FROM embeddings)),
      |nn AS MATERIALIZED (SELECT count(DISTINCT vec_id) AS n FROM ex),
      |si AS MATERIALIZED (SELECT pos, sum(xs) AS s FROM ex GROUP BY pos),
      |sij AS MATERIALIZED (SELECT a.pos AS i, b.pos AS j, sum(a.xs * b.xs) AS s
      |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.pos <= b.pos
      |  GROUP BY 1, 2),
      |cnum AS MATERIALIZED (SELECT i, j,
      |    (SELECT n FROM nn) * sij.s - si1.s * si2.s AS c
      |  FROM sij JOIN si si1 ON sij.i = si1.pos
      |           JOIN si si2 ON sij.j = si2.pos)""".stripMargin

  /** Unrolled power-iteration rounds w1/m1/v1 .. w_n/m_n/v_n over the
    * `cs` matrix CTE (mirrors [[Similarity.pc1PowerIteration]]). */
  private def pcaRoundsSql(n: Int): String =
    (1 to n).map { k =>
      s""",
         |w$k AS MATERIALIZED (SELECT cs.i AS pos, sum(cs.c * v.v) AS w
         |  FROM cs JOIN v${k - 1} v ON cs.j = v.pos GROUP BY 1),
         |m$k AS MATERIALIZED (SELECT max(abs(w)) AS m FROM w$k),
         |v$k AS MATERIALIZED (SELECT pos, CASE WHEN w < 0
         |  THEN -((-w) * 1048576 // (SELECT m FROM m$k))
         |  ELSE w * 1048576 // (SELECT m FROM m$k) END AS v FROM w$k)""".stripMargin
    }.mkString("")

  /** Shared oracle preamble: token occurrences hashed to (dim, sign).
    * `('0x'||substr(md5,1,8))::BIGINT` == Spark `conv(substring,16,10)`;
    * dim uses digest bits 0–3, the sign bit 4 — independent slices. */
  /** Dense-retrieval CTEs: hash-embedding features → per-doc norms →
    * query (doc_id < 3) dots → rounded cosine frame `den(query_id,
    * doc_id, cosine)`. Shared by the rank-fusion and MMR oracles. */
  private def denseCtesSql: String =
    s"""ht AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
       |       FROM documents),
       |hv2 AS (SELECT doc_id,
       |    CAST(('0x' || substr(md5('fh_' || tok), 1, 8)) AS BIGINT) AS h
       |  FROM ht),
       |dv AS (SELECT doc_id, CAST(h % $HashDim AS INTEGER) AS dim,
       |    CAST(sum(1 - 2 * ((h // 16) % 2)) AS BIGINT) AS v
       |  FROM hv2 GROUP BY 1, 2),
       |nr AS (SELECT doc_id, sum(v * v) AS nrm2 FROM dv GROUP BY 1),
       |qdv AS (SELECT doc_id AS query_id, dim, v AS qv FROM dv WHERE doc_id < 3),
       |qnr AS (SELECT doc_id AS query_id, nrm2 AS qn2 FROM nr WHERE doc_id < 3),
       |dots AS (SELECT q.query_id, d.doc_id, sum(d.v * q.qv) AS dot
       |  FROM dv d JOIN qdv q ON d.dim = q.dim GROUP BY 1, 2),
       |den AS (SELECT dots.query_id AS query_id, dots.doc_id AS doc_id,
       |    round(CAST(dot AS DOUBLE) /
       |      (sqrt(CAST(nrm2 AS DOUBLE)) * sqrt(CAST(qn2 AS DOUBLE))), 6) AS cosine
       |  FROM dots JOIN nr ON dots.doc_id = nr.doc_id
       |  JOIN qnr ON dots.query_id = qnr.query_id
       |  WHERE nrm2 > 0 AND qn2 > 0)""".stripMargin

  /** The unrolled MMR greedy: round 1 picks max rel; each later round
    * anti-joins the picked set, takes max-sim-to-selected from the
    * symmetric pair frame, and argmaxes 0.7·rel − 0.3·max_sim with a
    * doc-id tiebreak — exactly the driver-side loop, replayed as SQL. */
  private def mmrRoundsSql(kSel: Int): String = {
    val b = new StringBuilder
    b ++= """sel1 AS (SELECT query_id, doc_id, rel, CAST(0.0 AS DOUBLE) AS max_sim,
            |    0.7 * rel - 0.3 * 0.0 AS mmr, 1 AS sel_rank
            |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
            |      ORDER BY 0.7 * rel - 0.3 * 0.0 DESC, doc_id ASC) AS rn FROM mcand)
            |  WHERE rn = 1),
            |selu1 AS (SELECT query_id, doc_id FROM sel1)""".stripMargin
    for (r <- 2 to kSel) {
      b ++= s""",
               |cand$r AS (SELECT c.* FROM mcand c LEFT JOIN selu${r - 1} s
               |    ON c.query_id = s.query_id AND c.doc_id = s.doc_id
               |  WHERE s.doc_id IS NULL),
               |sc$r AS (SELECT c.query_id, c.doc_id, c.rel, max(m.sim) AS max_sim
               |  FROM cand$r c
               |  JOIN ms2 m ON m.query_id = c.query_id AND m.d_a = c.doc_id
               |  JOIN selu${r - 1} s ON s.query_id = m.query_id AND s.doc_id = m.d_b
               |  GROUP BY 1, 2, 3),
               |sel$r AS (SELECT query_id, doc_id, rel, max_sim,
               |    0.7 * rel - 0.3 * max_sim AS mmr, $r AS sel_rank
               |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
               |      ORDER BY 0.7 * rel - 0.3 * max_sim DESC, doc_id ASC) AS rn
               |    FROM sc$r)
               |  WHERE rn = 1),
               |selu$r AS (SELECT query_id, doc_id FROM selu${r - 1}
               |  UNION ALL SELECT query_id, doc_id FROM sel$r)""".stripMargin
    }
    b.toString
  }

  private def hashTokSql: String =
    """t AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
      |  FROM documents),
      |hv AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5('fh_' || tok), 1, 8)) AS BIGINT) AS h
      |  FROM t)""".stripMargin

  override def oracle: Map[String, String] = Map(
    // every EXIF field replayed from the fixture's doc_id formulas —
    // a single wrong byte anywhere in the IFD walk fails the hash
    "q_mm_exif" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
        |  CAST(doc_id % 8 + 1 AS INTEGER) AS orientation,
        |  'Maker' || CAST(doc_id % 5 AS VARCHAR) AS make,
        |  'Cam' || CAST(doc_id % 7 AS VARCHAR) AS model,
        |  '2026:08:' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
        |    ' 10:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') || ':00'
        |    AS datetime,
        |  CAST(64 + doc_id % 100 AS INTEGER) AS px_x,
        |  CAST(48 + doc_id % 80 AS INTEGER) AS px_y,
        |  CAST(100 * (doc_id % 4 + 1) AS INTEGER) AS iso,
        |  CAST(doc_id % 500 + 1 AS INTEGER) AS exposure_den
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_hash_embed" ->
      s"""WITH $hashTokSql
         |SELECT doc_id, CAST(h % $HashDim AS INTEGER) AS dim,
         |  CAST(sum(1 - 2 * ((h // 16) % 2)) AS BIGINT) AS v,
         |  count(*) AS n_occ
         |FROM hv GROUP BY 1, 2 ORDER BY doc_id, dim""".stripMargin,
    // centroid = per-(source, dim) SUM vector (1/n cancels in cosine);
    // HUGEINT dots/norms, doubles only in the final sqrt/divide
    "q_hash_embed_sim" ->
      s"""WITH $hashTokSql,
         |dv AS (
         |  SELECT hv.doc_id, CAST(h % $HashDim AS INTEGER) AS dim,
         |    sum(1 - 2 * ((h // 16) % 2)) AS v
         |  FROM hv GROUP BY 1, 2),
         |cent AS (
         |  SELECT d.source, dv.dim, sum(CAST(dv.v AS HUGEINT)) AS sv
         |  FROM dv JOIN documents d ON dv.doc_id = d.doc_id
         |  GROUP BY 1, 2),
         |nrm AS (SELECT source, sum(sv * sv) AS nrm FROM cent GROUP BY 1),
         |pairs AS (
         |  SELECT a.source AS source_a, b.source AS source_b,
         |    sum(a.sv * b.sv) AS dot
         |  FROM cent a JOIN cent b ON a.dim = b.dim AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT source_a, source_b, CAST(dot AS BIGINT) AS dot,
         |  CASE WHEN na.nrm = 0 OR nb.nrm = 0 THEN NULL ELSE
         |    round(CAST(CAST(dot AS VARCHAR) AS DOUBLE) /
         |          (sqrt(CAST(CAST(na.nrm AS VARCHAR) AS DOUBLE)) *
         |           sqrt(CAST(CAST(nb.nrm AS VARCHAR) AS DOUBLE))), 6) END
         |    AS cosine
         |FROM pairs
         |JOIN nrm na ON pairs.source_a = na.source
         |JOIN nrm nb ON pairs.source_b = nb.source
         |ORDER BY source_a, source_b""".stripMargin,
    "q_sim_lsh" -> lshOracleSql,
    "q_sim_curve" -> simCurveOracleSql,
    "q_sim_clusters" -> simClustersOracleSql,
    // non-canonical cluster members dropped; singletons survive
    "q_semdedup_apply" ->
      s"""WITH RECURSIVE $simCompSqlPrefix
         |SELECT vec_id, label FROM embeddings
         |WHERE vec_id NOT IN (SELECT vec_id FROM comp WHERE vec_id <> cluster_id)
         |ORDER BY vec_id""".stripMargin,

    // mirrors Similarity.pqCodes: per subspace j, codebook = the 4
    // subvectors of the md5('pq<j>_'||vec_id)-first vectors; assignment =
    // argmin (|c|^2 - 2 v_j.c, then c); sse = |v|^2 + sum_j d_j in
    // left-fold order
    "q_embed_pq" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |$pqSqlSubs
         |SELECT e.vec_id, code_1, code_2, code_3, code_4,
         |  round(list_dot_product(e.v, e.v) + d1 + d2 + d3 + d4, 6) AS sse
         |FROM e JOIN a1 USING (vec_id) JOIN a2 USING (vec_id)
         |  JOIN a3 USING (vec_id) JOIN a4 USING (vec_id)
         |ORDER BY e.vec_id""".stripMargin,

    // ADC search: per-pair distance = sum_j (|c|^2 - 2 q_j.c) over the
    // corpus vector's CODES (centroids joined by code), rank on the
    // rounded distance with vec_id tiebreak — mirrors Similarity.pqTopK
    "q_sim_pq" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |$pqSqlSubs,
         |codes AS (
         |  SELECT e.vec_id, code_1, code_2, code_3, code_4
         |  FROM e JOIN a1 USING (vec_id) JOIN a2 USING (vec_id)
         |    JOIN a3 USING (vec_id) JOIN a4 USING (vec_id)),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
         |pairs AS (
         |  SELECT q.query_id, codes.vec_id,
         |    round(
         |      (list_dot_product(c1.cv, c1.cv) - 2 * list_dot_product(q.qv[1:16], c1.cv))
         |    + (list_dot_product(c2.cv, c2.cv) - 2 * list_dot_product(q.qv[17:32], c2.cv))
         |    + (list_dot_product(c3.cv, c3.cv) - 2 * list_dot_product(q.qv[33:48], c3.cv))
         |    + (list_dot_product(c4.cv, c4.cv) - 2 * list_dot_product(q.qv[49:64], c4.cv)), 6) AS adc_dist
         |  FROM q CROSS JOIN codes
         |  JOIN cent1 c1 ON c1.c = codes.code_1
         |  JOIN cent2 c2 ON c2.c = codes.code_2
         |  JOIN cent3 c3 ON c3.c = codes.code_3
         |  JOIN cent4 c4 ON c4.c = codes.code_4
         |  WHERE codes.vec_id <> q.query_id),
         |ranked AS (
         |  SELECT query_id, vec_id AS neighbor_id, adc_dist,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY adc_dist, vec_id) AS INTEGER) AS rank
         |  FROM pairs)
         |SELECT query_id, neighbor_id, adc_dist, rank FROM ranked
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // the COMPOSED pipeline: IVF seeding/assignment/probing (q_sim_ivf's
    // CTEs) restricts candidates, ADC over PQ codes (q_sim_pq's CTEs)
    // ranks them — the oracle replays both halves in one query
    "q_sim_ivf_pq" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
         |cent AS (
         |  SELECT CAST(row_number() OVER (ORDER BY md5('ivf_' || CAST(vec_id AS VARCHAR))) AS INTEGER) - 1 AS c,
         |         v AS cv
         |  FROM n
         |  QUALIFY row_number() OVER (ORDER BY md5('ivf_' || CAST(vec_id AS VARCHAR))) <= 8),
         |dists AS (
         |  SELECT n.vec_id, n.v, cent.c,
         |    list_dot_product(cent.cv, cent.cv) - 2 * list_dot_product(n.v, cent.cv) AS d
         |  FROM n CROSS JOIN cent),
         |lists AS (
         |  SELECT vec_id, c AS list_id FROM dists
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, c) = 1),
         |probes AS (
         |  SELECT vec_id AS query_id, v AS qv, c AS list_id FROM dists
         |  WHERE vec_id < 5
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, c) <= 3),
         |$pqSqlSubs,
         |codes AS (
         |  SELECT e.vec_id, code_1, code_2, code_3, code_4
         |  FROM e JOIN a1 USING (vec_id) JOIN a2 USING (vec_id)
         |    JOIN a3 USING (vec_id) JOIN a4 USING (vec_id)),
         |cand AS (
         |  SELECT probes.query_id, probes.qv,
         |    codes.vec_id, code_1, code_2, code_3, code_4
         |  FROM probes JOIN lists USING (list_id)
         |  JOIN codes ON codes.vec_id = lists.vec_id
         |  WHERE lists.vec_id <> probes.query_id),
         |pairs AS (
         |  SELECT query_id, vec_id,
         |    round(
         |      (list_dot_product(c1.cv, c1.cv) - 2 * list_dot_product(qv[1:16], c1.cv))
         |    + (list_dot_product(c2.cv, c2.cv) - 2 * list_dot_product(qv[17:32], c2.cv))
         |    + (list_dot_product(c3.cv, c3.cv) - 2 * list_dot_product(qv[33:48], c3.cv))
         |    + (list_dot_product(c4.cv, c4.cv) - 2 * list_dot_product(qv[49:64], c4.cv)), 6) AS adc_dist
         |  FROM cand
         |  JOIN cent1 c1 ON c1.c = cand.code_1
         |  JOIN cent2 c2 ON c2.c = cand.code_2
         |  JOIN cent3 c3 ON c3.c = cand.code_3
         |  JOIN cent4 c4 ON c4.c = cand.code_4),
         |ranked AS (
         |  SELECT query_id, vec_id AS neighbor_id, adc_dist,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY adc_dist, vec_id) AS INTEGER) AS rank
         |  FROM pairs)
         |SELECT query_id, neighbor_id, adc_dist, rank FROM ranked
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // exact integer covariance numerators (HUGEINT == Spark DECIMAL(38,0)):
    // c(i,j) = n*sum(xi*xj) - sum(xi)*sum(xj) over x*2^44 integers; the
    // only doubles are the final correctly-rounded normalizations.
    // AS MATERIALIZED: DuckDB inlines CTEs, and the power-iteration chain
    // references each round twice -- inlining would re-evaluate
    // exponentially (and reopen the parquet per reference)
    // centroid cosine on SUM vectors (the 1/n cancels), integer sums and
    // decimal products until the one final double ratio; HUGEINT->DOUBLE
    // routed through VARCHAR per the >2^63 correct-rounding rule
    "q_label_cosine" ->
      """WITH ex AS MATERIALIZED (SELECT label, i - 1 AS pos,
        |    CAST(x * 17592186044416 AS HUGEINT) AS xs
        |  FROM (SELECT label, unnest(embedding)::DOUBLE AS x,
        |        generate_subscripts(embedding, 1) AS i FROM embeddings)),
        |sums AS MATERIALIZED (SELECT label, pos, sum(xs) AS s FROM ex GROUP BY 1, 2),
        |dots AS MATERIALIZED (
        |  SELECT a.label AS label_a, b.label AS label_b, sum(a.s * b.s) AS dot
        |  FROM sums a JOIN sums b ON a.pos = b.pos AND a.label <= b.label
        |  GROUP BY 1, 2),
        |norms AS (SELECT label_a AS label, dot AS nrm FROM dots WHERE label_a = label_b)
        |SELECT d.label_a, d.label_b,
        |  round(CAST(CAST(d.dot AS VARCHAR) AS DOUBLE)
        |    / (sqrt(CAST(CAST(na.nrm AS VARCHAR) AS DOUBLE))
        |       * sqrt(CAST(CAST(nb.nrm AS VARCHAR) AS DOUBLE))), 6) AS cosine
        |FROM dots d
        |JOIN norms na ON d.label_a = na.label
        |JOIN norms nb ON d.label_b = nb.label
        |ORDER BY label_a, label_b""".stripMargin,

    "q_embed_cov" ->
      s"""$covSqlPrefix
         |SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
         |  CAST(CAST(c AS VARCHAR) AS DOUBLE)
         |    / ((SELECT n FROM nn) * (SELECT n FROM nn))
         |    / CAST(309485009821345068724781056 AS DOUBLE) AS cov
         |FROM cnum ORDER BY i, j""".stripMargin,

    // 8 unrolled fixed-point power-iteration rounds; sign-split // keeps
    // DuckDB's flooring division equal to Spark's truncating div
    "q_embed_pca" ->
      s"""$covSqlPrefix,
         |cfull AS MATERIALIZED (SELECT i, j, c FROM cnum
         |  UNION ALL SELECT j, i, c FROM cnum WHERE i <> j),
         |cs AS MATERIALIZED (SELECT i, j, CASE WHEN c < 0
         |  THEN -((-c) // 281474976710656) ELSE c // 281474976710656 END AS c
         |  FROM cfull),
         |v0 AS MATERIALIZED (SELECT DISTINCT i AS pos, CAST(1048576 AS HUGEINT) AS v FROM cs)
         |${pcaRoundsSql(8)},
         |nrm AS (SELECT sqrt(CAST(sum(v * v) AS DOUBLE)) AS z FROM v8)
         |SELECT CAST(pos AS INTEGER) AS pos,
         |  CAST(v AS DOUBLE) / (SELECT z FROM nrm) AS pc1
         |FROM v8 ORDER BY pos""".stripMargin,

    // PCA apply: per-vector dot against the round-8 iterate is an exact
    // HUGEINT sum (mirrors Spark's in-row DECIMAL fold — order
    // irrelevant for exact integers); doubles only in the final scaling
    "q_embed_proj" ->
      s"""$covSqlPrefix,
         |cfull AS MATERIALIZED (SELECT i, j, c FROM cnum
         |  UNION ALL SELECT j, i, c FROM cnum WHERE i <> j),
         |cs AS MATERIALIZED (SELECT i, j, CASE WHEN c < 0
         |  THEN -((-c) // 281474976710656) ELSE c // 281474976710656 END AS c
         |  FROM cfull),
         |v0 AS MATERIALIZED (SELECT DISTINCT i AS pos, CAST(1048576 AS HUGEINT) AS v FROM cs)
         |${pcaRoundsSql(8)},
         |nrm AS (SELECT sqrt(CAST(sum(v * v) AS DOUBLE)) AS z FROM v8),
         |proj AS (SELECT ex.vec_id, sum(ex.xs * v8.v) AS p
         |  FROM ex JOIN v8 ON ex.pos = v8.pos GROUP BY 1)
         |SELECT vec_id,
         |  CAST(CAST(p AS VARCHAR) AS DOUBLE) / 17592186044416
         |    / (SELECT z FROM nrm) AS proj
         |FROM proj ORDER BY vec_id""".stripMargin,

    // mirrors embedQuant: same unrounded scale feeds the codes, exact
    // integer invariants over the codes, error fold in array order
    "q_embed_quant" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM e),
        |sc AS (SELECT vec_id, v, amax, amax / 127 AS qscale FROM m),
        |q AS (SELECT vec_id, v, amax, qscale,
        |  list_transform(v, x -> CASE WHEN amax > 0
        |    THEN CAST(floor(x / qscale + 0.5) AS BIGINT) ELSE 0 END) AS qv
        |  FROM sc),
        |err AS (SELECT vec_id, qscale, qv,
        |  list_transform(generate_series(1, len(v)),
        |    i -> (v[i] - qv[i] * qscale) * (v[i] - qv[i] * qscale)) AS e2,
        |  len(v) AS dim
        |  FROM q)
        |SELECT vec_id, round(qscale, 6) AS qscale,
        |  CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
        |  CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS q_sq,
        |  round(list_sum(e2) / dim, 8) AS mse
        |FROM err ORDER BY vec_id""".stripMargin,

    // mirrors Similarity.ivfSeededTopK: centroid c = (rank in
    // md5('ivf_'||vec_id) order) - 1; d(v,c) = |c|^2 - 2 v.c (|v|^2
    // dropped — constant per row); assignment = argmin (d, then c);
    // queries probe the 3 nearest lists; exact cosine top-5 within lists
    // both rankings are deterministic, so recall itself hash-gates;
    // brute = exact window over all pairs, ivf = the seeded probe stack
    "q_ann_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
        |bp AS (
        |  SELECT query_id, vec_id,
        |    round(list_dot_product(qv, v) / (qn * nrm), 6) AS cosine
        |  FROM q CROSS JOIN n WHERE vec_id <> query_id),
        |brute AS (
        |  SELECT query_id, vec_id AS neighbor_id FROM (
        |    SELECT query_id, vec_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY cosine DESC, vec_id ASC) AS rank
        |    FROM bp) WHERE rank <= 5),
        |cent AS (
        |  SELECT CAST(row_number() OVER (ORDER BY md5('ivf_' || CAST(vec_id AS VARCHAR))) AS INTEGER) - 1 AS c,
        |         v AS cv
        |  FROM n
        |  QUALIFY row_number() OVER (ORDER BY md5('ivf_' || CAST(vec_id AS VARCHAR))) <= 8),
        |dists AS (
        |  SELECT n.vec_id, n.v, n.nrm, cent.c,
        |    list_dot_product(cent.cv, cent.cv) - 2 * list_dot_product(n.v, cent.cv) AS d
        |  FROM n CROSS JOIN cent),
        |lists AS (
        |  SELECT vec_id, v, nrm, c AS list_id FROM dists
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, c) = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, c AS list_id FROM dists
        |  WHERE vec_id < 5
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, c) <= 3),
        |ip AS (
        |  SELECT query_id, vec_id,
        |    round(list_dot_product(qv, v) / (qn * nrm), 6) AS cosine
        |  FROM probes JOIN lists USING (list_id)
        |  WHERE vec_id <> query_id),
        |ivf AS (
        |  SELECT query_id, vec_id AS neighbor_id FROM (
        |    SELECT query_id, vec_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY cosine DESC, vec_id ASC) AS rank
        |    FROM ip) WHERE rank <= 5)
        |SELECT b.query_id,
        |  CAST(count(i.neighbor_id) AS BIGINT) AS n_hits,
        |  round(CAST(count(i.neighbor_id) AS DOUBLE) / 5, 6) AS recall
        |FROM brute b LEFT JOIN ivf i
        |  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
        |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin,

    // same probe/search arithmetic as q_sim_ivf, but the centroid seed
    // subquery EXCLUDES the batch (vec_id % 10 = 9) — the index the
    // batch inserts into is a pure function of the prior corpus
    "q_sim_ivf_incr" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |cent AS (
        |  SELECT CAST(row_number() OVER (ORDER BY md5('ivf_' || CAST(vec_id AS VARCHAR))) AS INTEGER) - 1 AS c,
        |         v AS cv
        |  FROM n WHERE vec_id % 10 <> 9
        |  QUALIFY row_number() OVER (ORDER BY md5('ivf_' || CAST(vec_id AS VARCHAR))) <= 8),
        |dists AS (
        |  SELECT n.vec_id, n.v, n.nrm, cent.c,
        |    list_dot_product(cent.cv, cent.cv) - 2 * list_dot_product(n.v, cent.cv) AS d
        |  FROM n CROSS JOIN cent),
        |lists AS (
        |  SELECT vec_id, v, nrm, c AS list_id FROM dists
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, c) = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, c AS list_id FROM dists
        |  WHERE vec_id < 5
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, c) <= 3),
        |pairs AS (
        |  SELECT query_id, vec_id,
        |    round(list_dot_product(qv, v) / (qn * nrm), 6) AS cosine
        |  FROM probes JOIN lists USING (list_id)
        |  WHERE vec_id <> query_id),
        |ranked AS (
        |  SELECT query_id, vec_id AS neighbor_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |         ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
        |  FROM pairs)
        |SELECT query_id, neighbor_id, cosine, rank,
        |  neighbor_id % 10 = 9 AS from_batch
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_sim_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |cent AS (
        |  SELECT CAST(row_number() OVER (ORDER BY md5('ivf_' || CAST(vec_id AS VARCHAR))) AS INTEGER) - 1 AS c,
        |         v AS cv
        |  FROM n
        |  QUALIFY row_number() OVER (ORDER BY md5('ivf_' || CAST(vec_id AS VARCHAR))) <= 8),
        |dists AS (
        |  SELECT n.vec_id, n.v, n.nrm, cent.c,
        |    list_dot_product(cent.cv, cent.cv) - 2 * list_dot_product(n.v, cent.cv) AS d
        |  FROM n CROSS JOIN cent),
        |lists AS (
        |  SELECT vec_id, v, nrm, c AS list_id FROM dists
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, c) = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, c AS list_id FROM dists
        |  WHERE vec_id < 5
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, c) <= 3),
        |pairs AS (
        |  SELECT query_id, vec_id,
        |    round(list_dot_product(qv, v) / (qn * nrm), 6) AS cosine
        |  FROM probes JOIN lists USING (list_id)
        |  WHERE vec_id <> query_id),
        |ranked AS (
        |  SELECT query_id, vec_id AS neighbor_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |         ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
        |  FROM pairs)
        |SELECT query_id, neighbor_id, cosine, rank FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // sparse = the shared BM25 CTEs (rank <= 20); dense = hash-embedding
    // cosine rank <= 20; RRF = integer-scaled 1/(60+rank) sums
    "q_rank_fusion" ->
      s"""WITH ${CorpusQueries.bm25CtesSql},
         |$denseCtesSql,
         |dr AS (SELECT query_id, doc_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, doc_id ASC) AS INTEGER) AS cos_rank
         |  FROM den),
         |sr AS (SELECT query_id, doc_id, rank AS bm25_rank FROM rk WHERE rank <= 20),
         |dr20 AS (SELECT * FROM dr WHERE cos_rank <= 20),
         |fu AS (SELECT coalesce(s.query_id, d.query_id) AS query_id,
         |    coalesce(s.doc_id, d.doc_id) AS doc_id,
         |    s.bm25_rank, d.cos_rank,
         |    CAST(coalesce(100000000 // (60 + s.bm25_rank), 0)
         |       + coalesce(100000000 // (60 + d.cos_rank), 0) AS BIGINT) AS rrf_scaled
         |  FROM sr s FULL OUTER JOIN dr20 d
         |    ON s.query_id = d.query_id AND s.doc_id = d.doc_id),
         |ff AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf_scaled DESC, doc_id ASC) AS INTEGER) AS fused_rank FROM fu)
         |SELECT query_id, doc_id, bm25_rank, cos_rank, rrf_scaled, fused_rank
         |FROM ff WHERE fused_rank <= 10 ORDER BY query_id, fused_rank""".stripMargin,

    // dense top-20 candidates + symmetric pair-sim frame, then the
    // 5-round unrolled greedy (mmrRoundsSql) — λ = 0.7, doc-id tiebreak
    "q_mmr_rerank" ->
      s"""WITH $denseCtesSql,
         |mcand AS (SELECT query_id, doc_id, cosine AS rel FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, doc_id ASC) AS crn FROM den)
         |  WHERE crn <= 20),
         |cdv AS (SELECT c.query_id, c.doc_id, dv.dim, dv.v
         |  FROM mcand c JOIN dv ON c.doc_id = dv.doc_id),
         |pd AS (SELECT a.query_id, a.doc_id AS d_a, b.doc_id AS d_b,
         |    sum(a.v * b.v) AS dot
         |  FROM cdv a JOIN cdv b ON a.query_id = b.query_id
         |    AND a.dim = b.dim AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3),
         |msim AS (SELECT x.query_id, x.doc_id AS d_a, y.doc_id AS d_b,
         |    round(CAST(coalesce(pd.dot, 0) AS DOUBLE) /
         |      (sqrt(CAST(na.nrm2 AS DOUBLE)) * sqrt(CAST(nb.nrm2 AS DOUBLE))), 6)
         |      AS sim
         |  FROM mcand x JOIN mcand y
         |    ON x.query_id = y.query_id AND x.doc_id < y.doc_id
         |  LEFT JOIN pd ON pd.query_id = x.query_id
         |    AND pd.d_a = x.doc_id AND pd.d_b = y.doc_id
         |  JOIN nr na ON na.doc_id = x.doc_id
         |  JOIN nr nb ON nb.doc_id = y.doc_id),
         |ms2 AS (SELECT query_id, d_a, d_b, sim FROM msim
         |  UNION ALL SELECT query_id, d_b, d_a, sim FROM msim),
         |${mmrRoundsSql(5)}
         |SELECT query_id, doc_id, rel, max_sim, mmr,
         |  CAST(sel_rank AS INTEGER) AS sel_rank
         |FROM (SELECT * FROM sel1 UNION ALL SELECT * FROM sel2
         |  UNION ALL SELECT * FROM sel3 UNION ALL SELECT * FROM sel4
         |  UNION ALL SELECT * FROM sel5)
         |ORDER BY query_id, sel_rank""".stripMargin,

    // eval set = vec_id < 8; flag/argmax on the ROUNDED cosine
    "q_contamination_embed" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |q AS (SELECT vec_id AS eval_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 8),
        |hits AS (
        |  SELECT n.vec_id, eval_id,
        |    round(list_dot_product(qv, v) / (qn * nrm), 6) AS cosine
        |  FROM q CROSS JOIN n WHERE n.vec_id >= 8),
        |f AS (SELECT * FROM hits WHERE cosine >= 0.3),
        |rk AS (
        |  SELECT vec_id, eval_id, cosine,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY cosine DESC, eval_id ASC) AS rn,
        |    CAST(count(*) OVER (PARTITION BY vec_id) AS BIGINT) AS n_eval_hits
        |  FROM f)
        |SELECT vec_id, n_eval_hits, eval_id AS best_eval_id,
        |  cosine AS best_cosine
        |FROM rk WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "q_sim_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
        |pairs AS (
        |  SELECT query_id, vec_id,
        |    round(list_dot_product(qv, v) / (qn * nrm), 6) AS cosine
        |  FROM q CROSS JOIN n WHERE vec_id <> query_id),
        |ranked AS (
        |  SELECT query_id, vec_id AS neighbor_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |         ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
        |  FROM pairs)
        |SELECT query_id, neighbor_id, cosine, rank FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // every doc becomes a synthetic GIF whose metadata is a pure integer
    // function of doc_id (GifFixtures formulas, replayed here); the Spark
    // side gets those values by PARSING the encoded bytes with the real
    // block walk — agreement pins the decode path end to end
    "q_mm_gif" ->
      """WITH d AS (SELECT doc_id, doc_id % 3 + 1 AS nf FROM documents),
        |f AS (SELECT doc_id, nf, unnest(generate_series(0, nf - 1)) AS i FROM d)
        |SELECT doc_id,
        |  CAST(i AS INTEGER) AS frame_idx,
        |  CAST(nf AS INTEGER) AS n_frames,
        |  CAST(doc_id % 300 + 20 AS INTEGER) AS screen_w,
        |  CAST(doc_id % 200 + 20 AS INTEGER) AS screen_h,
        |  CAST((doc_id + 3 * i) % 10 AS INTEGER) AS frame_left,
        |  CAST((doc_id + 5 * i) % 8 AS INTEGER) AS frame_top,
        |  CAST((doc_id + 11 * i) % 64 + 1 AS INTEGER) AS frame_w,
        |  CAST((doc_id + 7 * i) % 48 + 1 AS INTEGER) AS frame_h,
        |  CAST((doc_id + i) % 500 AS INTEGER) AS delay_cs
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    // the whole PNG pipeline (chunk walk -> CRC -> inflate -> un-filter
    // x5 -> luma -> 9x8 cells -> dHash bands) replayed from the channel
    // formulas without parsing a byte
    "q_mm_png" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 3 AS m,
        |    17 + doc_id % 16 AS w, 14 + doc_id % 13 AS h
        |  FROM documents WHERE doc_id < 600),
        |xs AS (SELECT unnest(generate_series(0, 32)) AS x),
        |ys AS (SELECT unnest(generate_series(0, 26)) AS y),
        |pix AS (
        |  SELECT doc_id, w, h, x, y,
        |    CASE WHEN m = 0 THEN (7 * doc_id + 3 * x + 11 * y + x * y) % 256
        |         ELSE (299 * ((doc_id + 5 * x + 2 * y) % 256)
        |             + 587 * ((3 * doc_id + x + 7 * y) % 256)
        |             + 114 * ((doc_id + x * y) % 256)) // 1000 END AS g
        |  FROM d CROSS JOIN xs CROSS JOIN ys WHERE x < w AND y < h),
        |cells AS (
        |  SELECT doc_id, (y * 8) // h AS r, (x * 9) // w AS c,
        |    CAST(sum(g) AS BIGINT) AS cs, COUNT(*) AS cn
        |  FROM pix GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT a.doc_id, a.r * 8 + a.c AS idx,
        |    CASE WHEN a.cs * b.cn < b.cs * a.cn THEN 1 ELSE 0 END AS bit
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND a.r = b.r AND b.c = a.c + 1
        |  WHERE a.c < 8),
        |bands AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN idx // 16 = 0 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS p0,
        |    CAST(sum(CASE WHEN idx // 16 = 1 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS p1,
        |    CAST(sum(CASE WHEN idx // 16 = 2 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS p2,
        |    CAST(sum(CASE WHEN idx // 16 = 3 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS p3
        |  FROM bits GROUP BY doc_id),
        |gs AS (SELECT doc_id, CAST(sum(g) AS BIGINT) AS gray_sum
        |  FROM pix GROUP BY doc_id)
        |SELECT d.doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(CASE WHEN m = 0 THEN 0 WHEN m = 1 THEN 2 ELSE 6 END AS INTEGER)
        |    AS color_type,
        |  CAST(w * h AS BIGINT) AS n_pixels, gray_sum, p0, p1, p2, p3
        |FROM d JOIN gs USING (doc_id) JOIN bands USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // demuxed audio track = concatenated 01wb payloads; the 65-window
    // energy fingerprint replayed from the chunk sample formula
    "q_mm_avi_audio" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(doc_id % 4 + 2 AS INTEGER) AS nc,
        |    256 * (doc_id % 4 + 2) AS n
        |  FROM documents WHERE doc_id < 300),
        |ts AS (SELECT unnest(generate_series(0, 1279)) AS t),
        |smp AS (
        |  SELECT doc_id, nc, n, t, (t * 65) // n AS w,
        |    CAST((doc_id * 31 + 7 * t + (t * t) % 101) % 4001 - 2000 AS BIGINT) AS s
        |  FROM d CROSS JOIN ts WHERE t < n),
        |wins AS (
        |  SELECT doc_id, w, CAST(sum(abs(s)) AS BIGINT) AS e, COUNT(*) AS c
        |  FROM smp GROUP BY 1, 2),
        |bits AS (
        |  SELECT a.doc_id, a.w AS idx,
        |    CASE WHEN a.e * b.c < b.e * a.c THEN 1 ELSE 0 END AS bit
        |  FROM wins a JOIN wins b ON a.doc_id = b.doc_id AND b.w = a.w + 1
        |  WHERE a.w < 64),
        |bands AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN idx // 16 = 0 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS a0,
        |    CAST(sum(CASE WHEN idx // 16 = 1 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS a1,
        |    CAST(sum(CASE WHEN idx // 16 = 2 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS a2,
        |    CAST(sum(CASE WHEN idx // 16 = 3 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS a3
        |  FROM bits GROUP BY doc_id),
        |asum AS (SELECT doc_id, CAST(sum(abs(s)) AS BIGINT) AS abs_sum
        |         FROM smp GROUP BY doc_id)
        |SELECT d.doc_id, nc AS n_chunks, CAST(n AS BIGINT) AS n_samples,
        |  abs_sum, a0, a1, a2, a3
        |FROM d JOIN asum USING (doc_id) JOIN bands USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // container walk + full JPEG decode per frame; block-level sums with
    // edge-crop visibility factors (vw x vh) replay each frame's luma
    "q_mm_video_px" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 400),
        |fr AS (SELECT doc_id,
        |    unnest(generate_series(0, doc_id % 4 + 1)) AS frame_idx FROM d),
        |g AS (SELECT doc_id, frame_idx, doc_id * 7 + frame_idx AS fid FROM fr),
        |dim AS (SELECT *,
        |    (2 + fid % 3) * 8 - (fid % 3) AS w,
        |    (2 + fid % 4) * 8 - (fid % 5) AS h FROM g),
        |bxs AS (SELECT unnest(generate_series(0, 3)) AS bx),
        |bys AS (SELECT unnest(generate_series(0, 4)) AS byy),
        |bl AS (SELECT dim.*, bx, byy FROM dim CROSS JOIN bxs CROSS JOIN bys
        |       WHERE bx < 2 + fid % 3 AND byy < 2 + fid % 4),
        |s AS (SELECT doc_id, frame_idx, w, h,
        |    sum((least(255,
        |          ((11 * fid + 23 * bx + 37 * byy + bx * byy) % 256)
        |          + ((11 * fid + 23 * bx + 37 * byy + bx * byy) % 256) % 2))
        |        * least(8, w - bx * 8) * least(8, h - byy * 8)) AS luma_sum
        |  FROM bl GROUP BY 1, 2, 3, 4)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(w * h AS BIGINT) AS n_pixels, CAST(luma_sum AS BIGINT) AS luma_sum
        |FROM s ORDER BY doc_id, frame_idx""".stripMargin,

    // same decoded-luma preamble as q_mm_video_px, then the lag window
    // and the cross-multiplied cut test replayed on the closed form
    "q_mm_scene_cuts" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 400),
        |fr AS (SELECT doc_id,
        |    unnest(generate_series(0, doc_id % 4 + 1)) AS frame_idx FROM d),
        |g AS (SELECT doc_id, frame_idx, doc_id * 7 + frame_idx AS fid FROM fr),
        |dim AS (SELECT *,
        |    (2 + fid % 3) * 8 - (fid % 3) AS w,
        |    (2 + fid % 4) * 8 - (fid % 5) AS h FROM g),
        |bxs AS (SELECT unnest(generate_series(0, 3)) AS bx),
        |bys AS (SELECT unnest(generate_series(0, 4)) AS byy),
        |bl AS (SELECT dim.*, bx, byy FROM dim CROSS JOIN bxs CROSS JOIN bys
        |       WHERE bx < 2 + fid % 3 AND byy < 2 + fid % 4),
        |s AS (SELECT doc_id, frame_idx, w, h,
        |    sum((least(255,
        |          ((11 * fid + 23 * bx + 37 * byy + bx * byy) % 256)
        |          + ((11 * fid + 23 * bx + 37 * byy + bx * byy) % 256) % 2))
        |        * least(8, w - bx * 8) * least(8, h - byy * 8)) AS luma_sum
        |  FROM bl GROUP BY 1, 2, 3, 4),
        |f AS (SELECT doc_id, frame_idx,
        |    CAST(w * h AS BIGINT) AS n_pixels, CAST(luma_sum AS BIGINT) AS luma_sum
        |  FROM s),
        |lg AS (SELECT doc_id, frame_idx, n_pixels, luma_sum,
        |    lag(n_pixels) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev_px,
        |    lag(luma_sum) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev_luma
        |  FROM f),
        |c AS (SELECT *,
        |    abs(luma_sum * prev_px - prev_luma * n_pixels)
        |      >= 16 * n_pixels * prev_px AS is_cut
        |  FROM lg WHERE prev_luma IS NOT NULL)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  n_pixels, luma_sum, prev_px, prev_luma, is_cut,
        |  CAST(sum(CASE WHEN is_cut THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id) AS BIGINT) AS n_cuts
        |FROM c ORDER BY doc_id, frame_idx""".stripMargin,

    // same decoded-luma closed form as q_mm_video_px (identical frame
    // JPEGs at pxSeed = doc_id*7 + frame_idx); the chunk columns replay
    // the fixture's stsc plan (chunk 0 = samples 0,1; then 1 sample per
    // chunk), which the Spark side must RECOVER from the sample tables
    "q_mm_mp4_frames" ->
      """WITH d AS (SELECT doc_id, doc_id % 4 + 2 AS nf
        |           FROM documents WHERE doc_id < 400),
        |fr AS (SELECT doc_id, nf,
        |    unnest(generate_series(0, nf - 1)) AS frame_idx FROM d),
        |g AS (SELECT doc_id, nf, frame_idx,
        |    doc_id * 7 + frame_idx AS fid FROM fr),
        |dim AS (SELECT *,
        |    (2 + fid % 3) * 8 - (fid % 3) AS w,
        |    (2 + fid % 4) * 8 - (fid % 5) AS h FROM g),
        |bxs AS (SELECT unnest(generate_series(0, 3)) AS bx),
        |bys AS (SELECT unnest(generate_series(0, 4)) AS byy),
        |bl AS (SELECT dim.*, bx, byy FROM dim CROSS JOIN bxs CROSS JOIN bys
        |       WHERE bx < 2 + fid % 3 AND byy < 2 + fid % 4),
        |s AS (SELECT doc_id, nf, frame_idx, w, h,
        |    sum((least(255,
        |          ((11 * fid + 23 * bx + 37 * byy + bx * byy) % 256)
        |          + ((11 * fid + 23 * bx + 37 * byy + bx * byy) % 256) % 2))
        |        * least(8, w - bx * 8) * least(8, h - byy * 8)) AS luma_sum
        |  FROM bl GROUP BY 1, 2, 3, 4, 5)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST(CASE WHEN frame_idx < 2 THEN 0 ELSE frame_idx - 1 END
        |    AS INTEGER) AS chunk_idx,
        |  CAST(nf - 1 AS INTEGER) AS n_chunks, 'jpeg' AS codec,
        |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(w * h AS BIGINT) AS n_pixels, CAST(luma_sum AS BIGINT) AS luma_sum
        |FROM s ORDER BY doc_id, frame_idx""".stripMargin,

    // the LOSSY codec replayed exactly: a constant 8x8 block quantizes to
    // DC-only, and round(DC/16)*16/8 collapses to g = least(255, v + v%2)
    // — the whole Huffman+IDCT chain must land on that closed form
    "q_mm_jpeg_px" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    (2 + doc_id % 3) * 8 - (doc_id % 3) AS w,
        |    (2 + doc_id % 4) * 8 - (doc_id % 5) AS h
        |  FROM documents WHERE doc_id < 600),
        |xs AS (SELECT unnest(generate_series(0, 29)) AS x),
        |ys AS (SELECT unnest(generate_series(0, 39)) AS y),
        |pix AS (
        |  SELECT doc_id, w, h, x, y,
        |    least(255,
        |      ((11 * doc_id + 23 * (x // 8) + 37 * (y // 8) + (x // 8) * (y // 8)) % 256)
        |      + ((11 * doc_id + 23 * (x // 8) + 37 * (y // 8) + (x // 8) * (y // 8)) % 256) % 2) AS g
        |  FROM d CROSS JOIN xs CROSS JOIN ys WHERE x < w AND y < h),
        |cells AS (
        |  SELECT doc_id, (y * 8) // h AS r, (x * 9) // w AS c,
        |    CAST(sum(g) AS BIGINT) AS cs, COUNT(*) AS cn
        |  FROM pix GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT a.doc_id, a.r * 8 + a.c AS idx,
        |    CASE WHEN a.cs * b.cn < b.cs * a.cn THEN 1 ELSE 0 END AS bit
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND a.r = b.r AND b.c = a.c + 1
        |  WHERE a.c < 8),
        |bands AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN idx // 16 = 0 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS p0,
        |    CAST(sum(CASE WHEN idx // 16 = 1 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS p1,
        |    CAST(sum(CASE WHEN idx // 16 = 2 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS p2,
        |    CAST(sum(CASE WHEN idx // 16 = 3 THEN bit << (idx % 16) ELSE 0 END) AS INTEGER) AS p3
        |  FROM bits GROUP BY doc_id),
        |gs AS (SELECT doc_id, CAST(sum(g) AS BIGINT) AS gray_sum
        |  FROM pix GROUP BY doc_id)
        |SELECT d.doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(w * h AS BIGINT) AS n_pixels, gray_sum, p0, p1, p2, p3
        |FROM d JOIN gs USING (doc_id) JOIN bands USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // the whole pixel pipeline (LZW decode -> palette luma -> 9x8 cells
    // -> dHash bands) replayed from the fixture formulas without parsing
    // a single byte — agreement pins the codec chain end to end
    "q_mm_phash" ->
      s"""WITH ${phashSqlPrefix("")}
         |SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         |  CAST(w * h AS BIGINT) AS n_pixels, gray_sum, p0, p1, p2, p3
         |FROM ph ORDER BY doc_id""".stripMargin,

    // brute-force pair twin of the banded join: at hamming <= 3 with 4
    // bands the banded candidate set is provably complete (pigeonhole),
    // so brute force and the banded join agree exactly
    "q_mm_phash_dup" ->
      s"""WITH ${phashSqlPrefix("WHERE doc_id < 120")}
         |SELECT doc_a, doc_b, CAST(hamming AS INTEGER) AS hamming FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    bit_count(xor(a.p0, b.p0)) + bit_count(xor(a.p1, b.p1))
         |      + bit_count(xor(a.p2, b.p2)) + bit_count(xor(a.p3, b.p3)) AS hamming
         |  FROM ph a JOIN ph b ON a.doc_id < b.doc_id)
         |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,

    // per-frame pixel decode: the multiplier advances per frame, so each
    // frame's exact luma sum is an independent probe of the LZW stream
    "q_mm_frame_px" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 7 AS base, doc_id % 40 AS poff,
        |    9 * ((doc_id % 7) % 3 + 2) AS w, 8 * ((doc_id % 7) % 4 + 2) AS h,
        |    doc_id % 2 + 1 AS nf,
        |    CASE WHEN doc_id % 29 = 0 THEN 1 ELSE 0 END AS pert
        |  FROM documents),
        |fr AS (SELECT d.*, unnest(generate_series(0, nf - 1)) AS f FROM d),
        |xs AS (SELECT unnest(generate_series(0, 35)) AS x),
        |ys AS (SELECT unnest(generate_series(0, 39)) AS y),
        |pix AS (
        |  SELECT doc_id, f, w, h,
        |    40 * ((CAST((base + f) % 7 + 1 AS BIGINT) * (3 * x + 7 * y + x * y + 1)
        |           + CASE WHEN pert = 1 AND x = y THEN 1 ELSE 0 END) % 4) + poff AS g
        |  FROM fr CROSS JOIN xs CROSS JOIN ys WHERE x < w AND y < h)
        |SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
        |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(w * h AS BIGINT) AS n_pixels, CAST(sum(g) AS BIGINT) AS gray_sum
        |FROM pix GROUP BY doc_id, f, w, h
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // videos = doc_id % 3 = 2 (asMedia's type tag); stub frame checksum =
    // md5(payload || frame_idx digits), identical byte-wise in both engines
    "q_mm_frames" ->
      """WITH v AS (
        |  SELECT doc_id, text, octet_length(encode(text)) % 7 + 1 AS n
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT doc_id, text, unnest(generate_series(0, n - 1)) AS frame_idx FROM v)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  md5(text || CAST(frame_idx AS VARCHAR)) AS frame_checksum,
        |  CAST(('0x' || substr(md5(text || CAST(frame_idx AS VARCHAR)), 1, 2)) AS INTEGER) AS brightness
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    // the whole PCM pipeline (LE sample decode -> 65-window energies ->
    // fingerprint bands) replayed from the fixture formulas
    "q_mm_audio_fp" ->
      s"""WITH ${audioFpSqlPrefix("")}
         |SELECT doc_id, CAST(n AS BIGINT) AS n_samples, abs_sum, p0, p1, p2, p3
         |FROM af ORDER BY doc_id""".stripMargin,

    // same smp/wins/asum closed form; the 9/10-mean silence test and the
    // island grouping replayed in SQL
    "q_mm_silence" ->
      s"""WITH ${audioFpSqlPrefix("")},
         |v AS (SELECT w.doc_id, w.w, w.e, w.c
         |      FROM wins w JOIN asum USING (doc_id) JOIN d USING (doc_id)
         |      WHERE w.e * 10 * d.n >= 9 * asum.abs_sum * w.c),
         |isl AS (SELECT doc_id, w, e,
         |    w - row_number() OVER (PARTITION BY doc_id ORDER BY w) AS island
         |  FROM v),
         |seg AS (SELECT doc_id, island, min(w) AS start_w, max(w) AS end_w,
         |    count(*) AS n_windows, CAST(sum(e) AS BIGINT) AS seg_energy
         |  FROM isl GROUP BY 1, 2)
         |SELECT doc_id,
         |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_w)
         |    AS INTEGER) AS seg_idx,
         |  CAST(start_w AS INTEGER) AS start_w,
         |  CAST(end_w AS INTEGER) AS end_w, n_windows, seg_energy
         |FROM seg ORDER BY doc_id, seg_idx""".stripMargin,

    // brute-force pair twin: complete at hamming <= 3 (pigeonhole over
    // the 4 bands), so it agrees exactly with the banded join
    "q_mm_audio_dup" ->
      s"""WITH ${audioFpSqlPrefix("WHERE doc_id < 120")}
         |SELECT doc_a, doc_b, CAST(hamming AS INTEGER) AS hamming FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    bit_count(xor(a.p0, b.p0)) + bit_count(xor(a.p1, b.p1))
         |      + bit_count(xor(a.p2, b.p2)) + bit_count(xor(a.p3, b.p3)) AS hamming
         |  FROM af a JOIN af b ON a.doc_id < b.doc_id)
         |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,

    // full brute-force pair set restricted to pairs touching the new
    // batch (doc_id >= 100) — what the incremental banded join must equal
    "q_mm_phash_incr" ->
      s"""WITH ${phashSqlPrefix("WHERE doc_id < 120")}
         |SELECT doc_a, doc_b, CAST(hamming AS INTEGER) AS hamming FROM (
         |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    bit_count(xor(x.p0, y.p0)) + bit_count(xor(x.p1, y.p1))
         |      + bit_count(xor(x.p2, y.p2)) + bit_count(xor(x.p3, y.p3)) AS hamming
         |  FROM ph x JOIN ph y ON x.doc_id < y.doc_id)
         |WHERE hamming <= 3 AND (doc_a >= 100 OR doc_b >= 100)
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q_mm_audio_incr" ->
      s"""WITH ${audioFpSqlPrefix("WHERE doc_id < 120")}
         |SELECT doc_a, doc_b, CAST(hamming AS INTEGER) AS hamming FROM (
         |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    bit_count(xor(x.p0, y.p0)) + bit_count(xor(x.p1, y.p1))
         |      + bit_count(xor(x.p2, y.p2)) + bit_count(xor(x.p3, y.p3)) AS hamming
         |  FROM af x JOIN af y ON x.doc_id < y.doc_id)
         |WHERE hamming <= 3 AND (doc_a >= 100 OR doc_b >= 100)
         |ORDER BY doc_a, doc_b""".stripMargin,

    // both fingerprint preambles share one WITH via parameterized CTE
    // prefixes (i/a); pair sets brute-forced (complete at hamming <= 3)
    // then full-outer merged exactly like the Spark side
    "q_mm_ensemble" ->
      s"""WITH ${phashSqlPrefix("WHERE doc_id < 120", "i")},
         |${audioFpSqlPrefix("WHERE doc_id < 120", "a")},
         |ip AS (
         |  SELECT doc_a, doc_b, CAST(hamming AS INTEGER) AS img_hamming FROM (
         |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |      bit_count(xor(x.p0, y.p0)) + bit_count(xor(x.p1, y.p1))
         |        + bit_count(xor(x.p2, y.p2)) + bit_count(xor(x.p3, y.p3)) AS hamming
         |    FROM iph x JOIN iph y ON x.doc_id < y.doc_id)
         |  WHERE hamming <= 3),
         |ap AS (
         |  SELECT doc_a, doc_b, CAST(hamming AS INTEGER) AS aud_hamming FROM (
         |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |      bit_count(xor(x.p0, y.p0)) + bit_count(xor(x.p1, y.p1))
         |        + bit_count(xor(x.p2, y.p2)) + bit_count(xor(x.p3, y.p3)) AS hamming
         |    FROM aaf x JOIN aaf y ON x.doc_id < y.doc_id)
         |  WHERE hamming <= 3)
         |SELECT COALESCE(ip.doc_a, ap.doc_a) AS doc_a,
         |  COALESCE(ip.doc_b, ap.doc_b) AS doc_b,
         |  img_hamming, aud_hamming,
         |  CAST((CASE WHEN img_hamming IS NOT NULL THEN 1 ELSE 0 END)
         |     + (CASE WHEN aud_hamming IS NOT NULL THEN 1 ELSE 0 END) AS INTEGER) AS n_modalities
         |FROM ip FULL JOIN ap ON ip.doc_a = ap.doc_a AND ip.doc_b = ap.doc_b
         |ORDER BY doc_a, doc_b""".stripMargin,

    // audio = doc_id % 3 = 1 (asMedia's type tag); text bytes are never
    // RIFF, so every row takes the md5-derived stand-in the SQL replays:
    // rate in 8000..47999 (division-safe), integer-floor duration
    "q_mm_audio" ->
      """WITH a AS (
        |  SELECT doc_id, octet_length(encode(text)) AS byte_len, md5(text) AS checksum
        |  FROM documents WHERE doc_id % 3 = 1),
        |f AS (
        |  SELECT doc_id, byte_len, checksum,
        |    8000 + CAST(('0x' || substr(checksum, 5, 4)) AS INTEGER) % 40000 AS sample_rate,
        |    CAST(('0x' || substr(checksum, 9, 1)) AS INTEGER) % 2 + 1 AS channels,
        |    8 * (CAST(('0x' || substr(checksum, 10, 1)) AS INTEGER) % 2 + 1) AS bits_per_sample
        |  FROM a)
        |SELECT doc_id, CAST(byte_len AS BIGINT) AS byte_len, checksum,
        |  CAST(sample_rate AS INTEGER) AS sample_rate,
        |  CAST(channels AS INTEGER) AS channels,
        |  CAST(bits_per_sample AS INTEGER) AS bits_per_sample,
        |  CAST(byte_len AS BIGINT) AS n_samples,
        |  CAST(byte_len * 1000 // sample_rate AS BIGINT) AS duration_ms
        |FROM f ORDER BY doc_id""".stripMargin,

    // real AVI decode replayed from the AviFixtures formulas: MJPEG frame
    // geometry/byte counts are closed-form; raw-frame luma sums re-derive
    // every pixel from the formula (the sum is CAST out of DuckDB's
    // HUGEINT promotion). A hash match proves the RIFF walk + per-frame
    // SOF parse + exact byte sums against the independent encoder.
    "q_mm_video_frames" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 4 + 2 AS nf,
        |    16 * (doc_id % 5 + 1) AS w, 8 * (doc_id % 7 + 1) AS h
        |  FROM documents WHERE doc_id < 600),
        |f AS (SELECT doc_id, nf, w, h, unnest(generate_series(0, nf - 1)) AS i FROM d),
        |mj AS (
        |  SELECT doc_id, i, nf,
        |    CAST(42 + (doc_id + 3 * i) % 11 AS BIGINT) AS frame_bytes,
        |    w + i AS width, h + 2 * i AS height
        |  FROM f WHERE i % 2 = 0),
        |xs AS (SELECT unnest(generate_series(0, 79)) AS x),
        |ys AS (SELECT unnest(generate_series(0, 55)) AS y),
        |rawsum AS (
        |  SELECT doc_id, i, CAST(sum((doc_id + 3 * x + 7 * y + 11 * i) % 256) AS BIGINT) AS luma_sum
        |  FROM f CROSS JOIN xs CROSS JOIN ys
        |  WHERE i % 2 = 1 AND x < w AND y < h
        |  GROUP BY doc_id, i)
        |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |  CAST(nf AS INTEGER) AS n_frames, 'mjpeg' AS codec, frame_bytes,
        |  CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
        |  CAST(NULL AS BIGINT) AS luma_sum, CAST(NULL AS BIGINT) AS mean_luma
        |FROM mj
        |UNION ALL
        |SELECT f.doc_id, CAST(f.i AS INTEGER), CAST(f.nf AS INTEGER), 'raw',
        |  CAST(f.w * f.h AS BIGINT),
        |  CAST(f.w AS INTEGER), CAST(f.h AS INTEGER),
        |  r.luma_sum, r.luma_sum // (f.w * f.h)
        |FROM f JOIN rawsum r ON f.doc_id = r.doc_id AND f.i = r.i
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // video = doc_id % 3 = 2; text bytes never walk as ISO-BMFF boxes, so
    // every row takes the md5 stand-in: timescale in the conventional
    // mvhd band 600..90599 (division-safe), ticks = byte length
    "q_mm_video" ->
      """WITH v AS (
        |  SELECT doc_id, octet_length(encode(text)) AS byte_len, md5(text) AS checksum
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT doc_id, byte_len, checksum,
        |    600 + CAST(('0x' || substr(checksum, 5, 4)) AS INTEGER) % 90000 AS timescale
        |  FROM v)
        |SELECT doc_id, CAST(byte_len AS BIGINT) AS byte_len, checksum,
        |  CAST(timescale AS INTEGER) AS timescale,
        |  CAST(byte_len AS BIGINT) AS duration_ticks,
        |  CAST(byte_len * 1000 // timescale AS BIGINT) AS duration_ms
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_mm_features" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS media_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  md5(text) AS checksum,
        |  CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) AS width,
        |  CAST(('0x' || substr(md5(text), 3, 2)) AS INTEGER) AS height,
        |  CAST(octet_length(encode(text)) % 7 + 1 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
