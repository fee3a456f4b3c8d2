package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** [EXT] Multimodal-column handling (SURVEY §7.8): media payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB (`FakeDecoder`) — but everything
  * Spark-side is real and tested: the (id, modality, bytes, meta) schema,
  * binary-column expressions, the partition-wise decoder lifecycle
  * (decoder constructed once per partition, amortizing real codec init
  * cost), batch shapes, and the explode/sample plumbing.
  *
  * The media "fixture" derives deterministically from `documents`: payload
  * bytes are the utf-8 text, modality cycles by doc_id — so metadata
  * queries are DuckDB-oracle-checkable (md5/byte-length of utf-8 text are
  * engine-independent).
  *
  * Scale: payloads stay in executors end-to-end (no driver collect); the
  * decode stage is mapPartitions so a real decoder would amortize init per
  * partition; frame sampling explodes lazily inside codegen.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  case class Media(doc_id: Long, modality: String, bytes: Array[Byte], n_bytes: Long)
  case class MediaFeatures(doc_id: Long, modality: String, width: Int, height: Int,
    n_frames: Int, byte_mean_x100: Long, byte_min: Int, byte_max: Int)

  /** Media table: (doc_id, modality, bytes, n_bytes). */
  def media(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("bytes"),
      length(col("text")).cast("long").as("n_bytes"))

  private val mediaCte: String =
    """media AS (
      |  SELECT doc_id,
      |         (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS modality,
      |         encode(text) AS bytes,
      |         CAST(length(text) AS BIGINT) AS n_bytes
      |  FROM documents)""".stripMargin

  /** MM1: binary metadata — length + content hash per payload (oracled:
    * bytes are utf-8 text, so md5(bytes) ≡ md5(text) in any engine). */
  val mm1: Q = (s, d) =>
    media(s, d).select(col("doc_id"), col("modality"),
      length(col("bytes")).cast("long").as("byte_len"),
      md5(col("bytes")).as("payload_md5"))
      .orderBy("doc_id")
  val mm1Sql: String =
    s"""WITH $mediaCte
       |SELECT doc_id, modality, CAST(octet_length(bytes) AS BIGINT) AS byte_len,
       |       md5(bytes::VARCHAR) AS payload_md5
       |FROM media ORDER BY doc_id""".stripMargin

  /** MM2: per-modality storage stats (the partition-planning query a media
    * lake runs before a decode pass). */
  val mm2: Q = (s, d) =>
    media(s, d).groupBy("modality")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("total_bytes"),
        max(col("n_bytes")).as("max_bytes"))
      .orderBy("modality")
  val mm2Sql: String =
    s"""WITH $mediaCte
       |SELECT modality, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       |       CAST(max(n_bytes) AS BIGINT) AS max_bytes
       |FROM media GROUP BY modality ORDER BY modality""".stripMargin

  // ---- the decode stage (STUBBED codec, real Spark plumbing) ----

  /** STUB decoder — stands in for a real image/audio codec (none in this
    * container). Deterministic: "dimensions" and "frames" derive from the
    * payload bytes; feature moments are computed from the real bytes.
    * A production impl swaps `decode` for e.g. javax.imageio / ffmpeg
    * bindings; the lifecycle (one instance per partition) is the real
    * pattern for amortizing codec initialization. */
  final class FakeDecoder {
    def decode(m: Media): MediaFeatures = {
      val bs = m.bytes
      val b0 = if (bs.nonEmpty) bs(0) & 0xff else 0
      val width = 16 + b0 % 48
      val height = 16 + (if (bs.length > 1) (bs(1) & 0xff) % 48 else 0)
      val nFrames = m.modality match {
        case "image" => 1
        case "audio" => 1 + (bs.length % 16)
        case _       => 1 + (bs.length % 30)
      }
      val ints = bs.map(_ & 0xff)
      val mean = if (ints.isEmpty) 0L else ints.map(_.toLong).sum * 100 / ints.length
      MediaFeatures(m.doc_id, m.modality, width, height, nFrames,
        mean, if (ints.isEmpty) 0 else ints.min, if (ints.isEmpty) 0 else ints.max)
    }
  }

  /** MM3: decode + feature extraction via mapPartitions — one decoder per
    * partition, rows streamed through it (never materialized driver-side).
    * Deterministic stub ⇒ still DuckDB-checkable via integer byte math. */
  val mm3: Q = (s, d) => {
    val sp = s
    import sp.implicits._
    val ds: Dataset[Media] = media(s, d).as[Media]
    ds.mapPartitions { it =>
      val decoder = new FakeDecoder // init once per partition (codec pattern)
      it.map(decoder.decode)
    }.toDF().orderBy("doc_id")
  }
  // oracle replicates the stub's integer byte math on utf-8 text (ascii ⇒
  // byte values are code points; documents are ascii by construction)
  val mm3Sql: String =
    s"""WITH $mediaCte,
       |chars AS (
       |  SELECT doc_id, unnest(string_split_regex(bytes::VARCHAR, '')) AS c FROM media),
       |cstats AS (
       |  SELECT doc_id, CAST(sum(ord(c)) AS BIGINT) AS bsum,
       |         min(ord(c)) AS bmin, max(ord(c)) AS bmax
       |  FROM chars WHERE c <> '' GROUP BY doc_id)
       |SELECT m.doc_id, m.modality,
       |       CAST(CASE WHEN m.n_bytes = 0 THEN 16
       |            ELSE 16 + ord(substr(m.bytes::VARCHAR, 1, 1)) % 48 END AS INTEGER) AS width,
       |       CAST(16 + (CASE WHEN m.n_bytes > 1 THEN ord(substr(m.bytes::VARCHAR, 2, 1)) ELSE 0 END) % 48 AS INTEGER) AS height,
       |       CAST(CASE m.modality WHEN 'image' THEN 1
       |                            WHEN 'audio' THEN 1 + m.n_bytes % 16
       |                            ELSE 1 + m.n_bytes % 30 END AS INTEGER) AS n_frames,
       |       CAST(CASE WHEN m.n_bytes = 0 THEN 0
       |            ELSE coalesce(s.bsum * 100 // m.n_bytes, 0) END AS BIGINT) AS byte_mean_x100,
       |       CAST(coalesce(s.bmin, 0) AS INTEGER) AS byte_min,
       |       CAST(coalesce(s.bmax, 0) AS INTEGER) AS byte_max
       |FROM media m LEFT JOIN cstats s ON m.doc_id = s.doc_id
       |ORDER BY m.doc_id""".stripMargin

  /** MM4: frame sampling — explode the (stubbed) frame index space and keep
    * every 5th frame; the lazily-generated explode is the real plumbing a
    * video pipeline uses to fan out frame work. */
  val mm4: Q = (s, d) =>
    media(s, d)
      .filter(col("modality") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0), ((col("n_bytes") % 30)).cast("int"))).as("frame_idx"))
      .filter(col("frame_idx") % 5 === 0)
      .groupBy("doc_id").agg(count(lit(1)).as("n_sampled"),
        max(col("frame_idx")).as("last_frame"))
      .orderBy("doc_id")
  val mm4Sql: String =
    s"""WITH $mediaCte
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sampled,
       |       CAST(max(frame_idx) AS INTEGER) AS last_frame
       |FROM (
       |  SELECT doc_id, unnest(range(0, CAST(n_bytes % 30 AS INTEGER) + 1)) AS frame_idx
       |  FROM media WHERE modality = 'video')
       |WHERE frame_idx % 5 = 0
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** MM5: resize planning — aspect-fit each (stub-decoded) image into a
    * 224×224 box with exact integer math (scale in thousandths), the shape
    * a preprocessing pipeline computes before the actual pixel resample. */
  val mm5: Q = (s, d) => {
    val sp = s
    import sp.implicits._
    // filter BEFORE the opaque mapPartitions — Catalyst cannot push a
    // predicate through it, and decode is row-wise, so decoding the ~2/3
    // non-image rows first would be pure waste (3x with a real codec)
    val feats = media(s, d).filter(col("modality") === "image")
      .as[Media].mapPartitions { it =>
        val decoder = new FakeDecoder
        it.map(decoder.decode)
      }.toDF()
    feats
      .select(col("doc_id"), col("width"), col("height"),
        expr("least(224000 div width, 224000 div height)").cast("long").as("scale_x1000"))
      .select(col("doc_id"), col("width"), col("height"), col("scale_x1000"),
        expr("width * scale_x1000 div 1000").as("out_w"),
        expr("height * scale_x1000 div 1000").as("out_h"))
      .orderBy("doc_id")
  }
  val mm5Sql: String =
    s"""WITH $mediaCte,
       |dims AS (
       |  SELECT doc_id, modality,
       |         CAST(CASE WHEN n_bytes = 0 THEN 16
       |              ELSE 16 + ord(substr(bytes::VARCHAR, 1, 1)) % 48 END AS INTEGER) AS width,
       |         CAST(16 + (CASE WHEN n_bytes > 1 THEN ord(substr(bytes::VARCHAR, 2, 1)) ELSE 0 END) % 48 AS INTEGER) AS height
       |  FROM media)
       |SELECT doc_id, width, height,
       |       CAST(least(224000 // width, 224000 // height) AS BIGINT) AS scale_x1000,
       |       width * CAST(least(224000 // width, 224000 // height) AS BIGINT) // 1000 AS out_w,
       |       height * CAST(least(224000 // width, 224000 // height) AS BIGINT) // 1000 AS out_h
       |FROM dims WHERE modality = 'image' ORDER BY doc_id""".stripMargin

  /** MM6: cross-asset duplicate-frame detection — the multimodal dedup
    * crossover: sample frames (mm4's every-5th plumbing), fingerprint
    * each frame's bytes (stub: md5 of the 8-byte window at the frame
    * offset — a real pipeline hashes the decoded frame), and group BY
    * FINGERPRINT to find frames shared across different videos. The
    * shuffle carries (hash, doc_id) pairs — never frame bytes; the
    * report is one hash aggregate + a distinct-video count, the d1
    * exact-dedup shape applied to the frame grain. */
  val mm6: Q = (s, d) =>
    media(s, d)
      .filter(col("modality") === "video")
      .select(col("doc_id"), col("bytes"), col("n_bytes"),
        explode(sequence(lit(0), (col("n_bytes") % 30).cast("int"))).as("frame_idx"))
      .filter(col("frame_idx") % 5 === 0)
      .select(col("doc_id"),
        expr("md5(substr(decode(bytes, 'UTF-8'), frame_idx + 1, 8))").as("frame_hash"))
      .groupBy("frame_hash")
      .agg(countDistinct(col("doc_id")).as("n_videos"),
        count(lit(1)).as("n_frames"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_videos") > 1)
      .orderBy("frame_hash")
  val mm6Sql: String =
    s"""WITH $mediaCte,
       |frames AS (
       |  SELECT doc_id, bytes::VARCHAR AS t,
       |         unnest(range(0, CAST(n_bytes % 30 AS INTEGER) + 1)) AS f
       |  FROM media WHERE modality = 'video'),
       |fh AS (
       |  SELECT doc_id, md5(substr(t, CAST(f AS INTEGER) + 1, 8)) AS frame_hash
       |  FROM frames WHERE f % 5 = 0)
       |SELECT frame_hash, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_videos,
       |       CAST(count(*) AS BIGINT) AS n_frames, min(doc_id) AS first_doc
       |FROM fh GROUP BY frame_hash HAVING count(DISTINCT doc_id) > 1
       |ORDER BY frame_hash""".stripMargin

  // ---- MM7: multimodal-aware sequence packing ----

  /** Fixed per-modality token budgets (the LLaVA-style convention: an
    * image enters the sequence as a fixed patch-token block; audio/video
    * cost their frame/codec budgets). Index order matches [[media]]'s
    * modality assignment (image, audio, video). */
  private val ModalityToks = Seq(576L, 1500L, 2304L)
  private val MmPackBudget = 8192L

  /** MM7: sequence packing where a document's cost is text tokens PLUS
    * its media placeholder budget — the packing shape multimodal
    * training actually needs (a pure text-token cumsum under-fills every
    * window that carries an image by 576 tokens). Reuses pack1's
    * windowed per-shard prefix-sum verbatim with the combined cost
    * column, so the scale story is identical: one shuffle per (lang)
    * shard, no global sort. Per window: doc count, text vs media token
    * split, total cost, straddlers. */
  val mm7: Q = (s, d) => {
    val costs = graft.Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("text_toks"),
        expr(s"element_at(array(${ModalityToks.mkString("L, ")}L), CAST(doc_id % 3 + 1 AS INT))")
          .as("media_toks"))
      .withColumn("cost", col("text_toks") + col("media_toks"))
    graft.ops.ScaleOps.packWindowsOf(costs, "lang", "doc_id", "cost", MmPackBudget)
      .groupBy("lang", "win")
      .agg(count(lit(1)).as("n_docs"),
        sum("text_toks").as("sum_text_toks"),
        sum("media_toks").as("sum_media_toks"),
        sum("cost").as("sum_cost"),
        sum(when(col("last_win") =!= col("win"), 1L).otherwise(0L)).as("n_straddlers"))
      .orderBy("lang", "win")
  }
  val mm7Sql: String =
    s"""WITH t AS (
       |  SELECT lang,
       |         CAST(len(str_split(text, ' ')) AS BIGINT) AS text_toks,
       |         ([${ModalityToks.mkString(", ")}])[CAST(doc_id % 3 + 1 AS INTEGER)] AS media_toks,
       |         CAST(len(str_split(text, ' ')) AS BIGINT)
       |           + ([${ModalityToks.mkString(", ")}])[CAST(doc_id % 3 + 1 AS INTEGER)] AS cost,
       |         CAST(coalesce(sum(CAST(len(str_split(text, ' ')) AS BIGINT)
       |             + ([${ModalityToks.mkString(", ")}])[CAST(doc_id % 3 + 1 AS INTEGER)])
       |           OVER (PARTITION BY lang ORDER BY doc_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |           AS cum_before
       |  FROM documents)
       |SELECT lang, cum_before // $MmPackBudget AS win,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(text_toks) AS BIGINT) AS sum_text_toks,
       |       CAST(sum(media_toks) AS BIGINT) AS sum_media_toks,
       |       CAST(sum(cost) AS BIGINT) AS sum_cost,
       |       CAST(sum(CASE WHEN (cum_before + cost - 1) // $MmPackBudget
       |                          != cum_before // $MmPackBudget
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
       |FROM t GROUP BY lang, win ORDER BY lang, win""".stripMargin

  // ---- MM8: perceptual near-dup assets (byte-grain SimHash + Hamming) ----

  /** Bit width of the asset fingerprint (chars of the bit string). */
  private val Mm8Bits = 0 until 32
  /** Skew cap for a band bucket — the d5 MaxBucket rationale at the
    * asset grain. */
  private val Mm8MaxBucket = 50

  /** MM8: perceptual-hash near-duplicate detection over BINARY media
    * payloads — the image-dedup pass of a media lake (re-encodes, crops
    * and thumbnails of one image that exact d1/mm1 hashing can never
    * link). A real deployment computes pHash/aHash from DECODED pixels;
    * the codec is stubbed here (the mm3 contract), so the fingerprint
    * is a SimHash over the payload's byte 4-grams — the same
    * locality-sensitive property (small payload edits flip few bits),
    * with every downstream stage real: fingerprint aggregation,
    * quarter-band blocking with the d5 skew cap, candidate dedup, and
    * the native `graft_hamming` cut. The asset table plants a
    * "cropped re-encode" twin (leading bytes dropped) for every
    * doc_id % 9 = 0 image, so the op demonstrably links what exact
    * hashing cannot.
    *
    * Scale: byte-gram explosion is linear in payload bytes and stays
    * executor-side; banding bounds the candidate space exactly as d5
    * (≤ cap·bucket pairs per band); the Hamming filter runs on the
    * deduped candidate set only. */
  private[multimodal] def imageAssets(s: SparkSession, d: String): DataFrame = {
    val base = media(s, d).filter(col("modality") === "image")
      .select(col("doc_id").as("asset_id"),
        expr("decode(bytes, 'UTF-8')").as("body"))
    base.unionAll(base.filter(col("asset_id") % 9 === 0)
      .select((col("asset_id") + 5000000L).as("asset_id"),
        expr("substr(body, 8)").as("body")))
  }

  val mm8: Q = (s, d) => {
    val grams = imageAssets(s, d)
      .select(col("asset_id"),
        explode(expr("sequence(1, greatest(length(body) - 3, 1))")).as("i"),
        col("body"))
      .select(col("asset_id"), expr("substr(body, i, 4)").as("g"))
    val bitCols = Mm8Bits.map { j =>
      when(sum(when(substring(md5(col("g")), j + 1, 1) >= "8", 1L).otherwise(-1L)) >= 0, "1")
        .otherwise("0").as(s"b$j")
    }
    val ph = grams.groupBy("asset_id").agg(bitCols.head, bitCols.tail: _*)
      .select(col("asset_id"), concat(Mm8Bits.map(j => col(s"b$j")): _*).as("ph"))
    // band/cap/candidate blocking through the SHARED generator (the d5
    // body) — one place owns the cap policy and the persist hygiene
    val cand = graft.ops.Dedup.bandedCandidates(ph, "asset_id", "ph",
      nBands = 4, bandLen = 8, cap = Mm8MaxBucket)
    graft.functions.GraftFunctions.register(s)
    cand.select(col("id_a"), col("id_b"),
        expr("graft_hamming(sig_a, sig_b)").as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("id_a", "id_b")
  }
  val mm8Sql: String = {
    val bitExprs = Mm8Bits.map { j =>
      s"CASE WHEN sum(CASE WHEN substr(md5(g), ${j + 1}, 1) >= '8' THEN 1 ELSE -1 END) >= 0 THEN '1' ELSE '0' END"
    }
    val ham = Mm8Bits.map { j =>
      s"CASE WHEN substr(ph_a, ${j + 1}, 1) <> substr(ph_b, ${j + 1}, 1) THEN 1 ELSE 0 END"
    }.mkString(" + ")
    s"""WITH $mediaCte,
       |base AS (
       |  SELECT doc_id AS asset_id, bytes::VARCHAR AS body
       |  FROM media WHERE modality = 'image'),
       |assets AS (
       |  SELECT asset_id, body FROM base
       |  UNION ALL
       |  SELECT asset_id + 5000000, substr(body, 8) FROM base WHERE asset_id % 9 = 0),
       |grams AS (
       |  SELECT asset_id, substr(body, CAST(i AS INTEGER), 4) AS g
       |  FROM assets, unnest(range(1, greatest(len(body) - 3, 1) + 1)) AS u(i)),
       |ph AS (
       |  SELECT asset_id, ${bitExprs.mkString(" ||\n         ")} AS ph
       |  FROM grams GROUP BY asset_id),
       |bands AS (
       |${(0 until 4).map(k =>
        s"  SELECT asset_id, ph, substr(ph, ${k * 8 + 1}, 8) AS band, $k AS bi FROM ph")
        .mkString("\n  UNION ALL\n")}),
       |ok AS (SELECT band, bi FROM bands GROUP BY band, bi HAVING count(*) <= $Mm8MaxBucket),
       |bounded AS (SELECT h.* FROM bands h JOIN ok USING (band, bi)),
       |cand AS (
       |  SELECT DISTINCT a.asset_id AS id_a, b.asset_id AS id_b,
       |         a.ph AS ph_a, b.ph AS ph_b
       |  FROM bounded a JOIN bounded b
       |    ON a.band = b.band AND a.bi = b.bi AND a.asset_id < b.asset_id)
       |SELECT id_a, id_b, hamming FROM (
       |  SELECT id_a, id_b, CAST($ham AS BIGINT) AS hamming FROM cand)
       |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "mm8_phash_neardup" -> mm8,
    "mm7_multimodal_pack" -> mm7,
    "mm6_dup_frames" -> mm6,
    "mm1_binary_metadata" -> mm1,
    "mm5_resize_planning" -> mm5,
    "mm2_modality_stats" -> mm2,
    "mm3_decode_features" -> mm3,
    "mm4_frame_sampling" -> mm4,
  )

  val oracle: Map[String, String] = Map(
    "mm8_phash_neardup" -> mm8Sql,
    "mm7_multimodal_pack" -> mm7Sql,
    "mm6_dup_frames" -> mm6Sql,
    "mm1_binary_metadata" -> mm1Sql,
    "mm5_resize_planning" -> mm5Sql,
    "mm2_modality_stats" -> mm2Sql,
    "mm3_decode_features" -> mm3Sql,
    "mm4_frame_sampling" -> mm4Sql,
  )
}
