package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** An opaque media payload with typed metadata (SURVEY.md §2.12 [N]):
  * image/audio/video as `binary` columns — the Spark-native way to move
  * multimodal data through a 100 TB pipeline (no object-per-file reads;
  * payloads ride the columnar format next to their metadata).
  */
case class MediaAsset(asset_id: Long, kind: String, payload: Array[Byte])

/** Decoded-asset features (what a real codec would emit). */
case class MediaFeatures(asset_id: Long, kind: String, n_bytes: Long,
                         byte_sum: Long, width: Long, height: Long,
                         n_frames: Long)

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extract / resize / frame-sample as PARTITION-batch
  * transforms over a typed `Dataset` (`mapPartitions` — one JVM-side loop
  * per partition, the Scala analog of arrow-batched UDFs: amortized setup,
  * no per-row planning, schema carried by the `Encoder`).
  *
  * The codec itself is a STUB — this container has no image/audio
  * libraries, so [[Multimodal.decodeStub]] derives deterministic fake
  * dimensions/frames from the payload bytes. Everything AROUND the stub is
  * real and load-bearing: the binary schema, the Dataset encoders, the
  * partition-batch shape, and the feature outputs (which the DuckDB oracle
  * recomputes byte-for-byte because the fake decode is pure arithmetic).
  * Swapping in a real codec changes one function.
  *
  * No binary table ships in the corpus, so assets are derived
  * deterministically from `documents` (payload = UTF-8 text bytes — ASCII
  * in this corpus, so byte arithmetic is oracle-expressible).
  */
object Multimodal {

  /** Deterministic corpus of binary assets from the documents table.
    * NULL-text rows are dropped here (an undecodable asset with no
    * payload) — matching the oracle's WHERE, and keeping one bad row from
    * NPE-ing a whole partition's task inside mapPartitions. */
  def assets(s: SparkSession, d: String): Dataset[MediaAsset] = {
    import s.implicits._
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id").as("asset_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaAsset]
  }

  /** STUB codec — stands in for libjpeg/ffmpeg/etc. Deterministic pure
    * arithmetic over the payload so tests and the SQL oracle can verify
    * the surrounding plumbing end-to-end. Null payloads decode as empty
    * (defensive — [[assets]] already filters them). */
  def decodeStub(a: MediaAsset): MediaFeatures = {
    val bytes = if (a.payload == null) Array.emptyByteArray else a.payload
    val n = bytes.length.toLong
    val byteSum = bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff))
    val (w, h, frames) = a.kind match {
      case "image" => (1L + n % 64, 1L + n % 48, 1L)
      case _       => (0L, 0L, (n + 255) / 256) // audio: 256-byte frames
    }
    MediaFeatures(a.asset_id, a.kind, n, byteSum, w, h, frames)
  }

  /** Feature extraction as a partition-batch transform: the iterator is
    * consumed lazily inside one task — a real decoder would allocate its
    * native context once per partition here, not once per row. */
  def extractFeatures(ds: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { batch => batch.map(decodeStub) }
  }

  /** Resize: recompute target dims preserving aspect (integer math on the
    * stub dims; a real impl would transform pixels in the same shape). */
  def resize(ds: Dataset[MediaFeatures], maxSide: Long): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { f =>
      if (f.kind != "image" || math.max(f.width, f.height) <= maxSide) f
      else {
        val scaleNum = maxSide
        val scaleDen = math.max(f.width, f.height)
        f.copy(width = math.max(1L, f.width * scaleNum / scaleDen),
          height = math.max(1L, f.height * scaleNum / scaleDen))
      }
    })
  }

  /** Embedding stub — the binary→vector bridge into the ANN family. A
    * real encoder is a model forward pass per batch; the stand-in
    * accumulates byte values by position class (dim j sums bytes at
    * positions ≡ j mod D), pure integer arithmetic widened to float, so
    * the vector is deterministic while the PLUMBING is the real thing:
    * partition-batched map (one encoder context per task), a fixed-D
    * `array<float>` column, and output shaped exactly like the
    * embeddings table the q35–q108 similarity operators consume. */
  def embedStub(ds: Dataset[MediaAsset], dim: Int = 64): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { a =>
      val bytes = if (a.payload == null) Array.emptyByteArray else a.payload
      val acc = new Array[Long](dim)
      var i = 0
      while (i < bytes.length) { acc(i % dim) += bytes(i) & 0xff; i += 1 }
      // L2-normalize, as a real encoder would: unit-scale components keep
      // the downstream integer-quantized cosine recipe inside long range
      val norm = math.sqrt(acc.foldLeft(0d)((s, v) =>
        s + v.toDouble * v.toDouble))
      val vec = if (norm == 0d) acc.map(_.toFloat)
                else acc.map(v => (v / norm).toFloat)
      (a.asset_id, vec)
    }).toDF("vec_id", "embedding")
  }

  /** Frame sampling: keep every k-th frame of an audio/video payload —
    * emits (asset_id, frame_idx, frame_bytes) rows, the exploded shape a
    * downstream encoder consumes. */
  def sampleFrames(ds: Dataset[MediaAsset], every: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.filter(_.kind != "image")
      .mapPartitions(_.flatMap { a =>
        val bytes = if (a.payload == null) Array.emptyByteArray else a.payload
        bytes.grouped(256).zipWithIndex.collect {
          case (frame, i) if i % every == 0 =>
            (a.asset_id, i.toLong, frame.length.toLong)
        }
      })
      .toDF("asset_id", "frame_idx", "frame_bytes")
  }

  // ---- q39: end-to-end multimodal feature extraction -------------------
  def q39MultimodalFeatures(s: SparkSession, d: String): DataFrame =
    extractFeatures(assets(s, d)).toDF().orderBy(col("asset_id"))

  // The oracle recomputes the stub arithmetic from the source text (ASCII
  // ⇒ octet length == char length, byte values == code points). The
  // c <> '' filter guards empty text: DuckDB string_split('', '') yields
  // [''] with ord('') = -1, which would make byte_sum -1 where Spark's
  // fold over zero bytes yields 0. COALESCE covers list_sum([]) = NULL.
  val q39Sql: String = """
    SELECT doc_id AS asset_id,
      CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
      CAST(length(text) AS BIGINT) AS n_bytes,
      CAST(COALESCE(list_sum(list_transform(
        list_filter(string_split(text, ''), c -> c <> ''),
        c -> ord(c))), 0) AS BIGINT) AS byte_sum,
      CASE WHEN doc_id % 2 = 0 THEN 1 + length(text) % 64
           ELSE 0 END AS width,
      CASE WHEN doc_id % 2 = 0 THEN 1 + length(text) % 48
           ELSE 0 END AS height,
      CASE WHEN doc_id % 2 = 0 THEN 1
           ELSE (length(text) + 255) // 256 END AS n_frames
    FROM documents WHERE text IS NOT NULL ORDER BY asset_id"""

  // ---- q40: frame-sample + aggregate (partition-batch op feeding an
  //      ordinary relational agg) ---------------------------------------
  def q40FrameSample(s: SparkSession, d: String): DataFrame =
    sampleFrames(assets(s, d), every = 2)
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("frame_bytes")).as("bytes"))
      .orderBy(col("asset_id"))

  val q40Sql: String = """
    SELECT doc_id AS asset_id,
      CAST((((length(text) + 255) // 256) + 1) // 2 AS BIGINT) AS n_sampled,
      CAST(CASE
        -- sampled frames are full 256B except a sampled trailing frame
        WHEN ((length(text) + 255) // 256 - 1) % 2 = 0
        THEN ((((length(text) + 255) // 256) + 1) // 2 - 1) * 256
             + CASE WHEN length(text) % 256 = 0 THEN 256
                    ELSE length(text) % 256 END
        ELSE (((length(text) + 255) // 256) + 1) // 2 * 256
      END AS BIGINT) AS bytes
    FROM documents
    WHERE doc_id % 2 = 1 AND text IS NOT NULL AND length(text) > 0
    ORDER BY asset_id"""

  // ---- q97: binary format sniffing (REAL byte-level work, no codec) ----
  // Unlike the stubbed decode, format sniffing needs no media library —
  // it IS the real operation: payloads get genuine magic headers (PNG /
  // RIFF) prepended via unhex, and the sniffer dispatches on the first
  // four bytes, exactly what an ingest router does before handing a
  // blob to the right decoder. Pure per-row binary work at the scan
  // (hex + prefix compare, codegen'd), one aggregate, no shuffle
  // beyond it. DuckDB 1.0 cannot slice BLOBs, so both engines sniff
  // via substring(hex(payload), 1, 8) — the identical expression.
  def q97BinarySniff(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
        concat(
          unhex(when(col("doc_id") % 2 === 0, "89504E47")
            .otherwise("52494646")),
          encode(col("text"), "UTF-8")).as("payload"))
      .withColumn("sniffed", expr(
        "CASE substring(hex(payload), 1, 8) WHEN '89504E47' THEN 'png'" +
          " WHEN '52494646' THEN 'riff' ELSE 'unknown' END"))
      .groupBy(col("kind"), col("sniffed"))
      .agg(count(lit(1)).as("n_assets"),
        sum(length(col("payload")).cast("long")).as("total_bytes"),
        min(length(col("payload")).cast("long")).as("min_bytes"),
        max(length(col("payload")).cast("long")).as("max_bytes"))
      .orderBy(col("kind"), col("sniffed"))

  val q97Sql: String = """
    WITH a AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        unhex(CASE WHEN doc_id % 2 = 0 THEN '89504E47' ELSE '52494646' END)
          || CAST(text AS BLOB) AS payload
      FROM documents WHERE text IS NOT NULL)
    SELECT kind,
      CASE substring(hex(payload), 1, 8) WHEN '89504E47' THEN 'png'
        WHEN '52494646' THEN 'riff' ELSE 'unknown' END AS sniffed,
      CAST(COUNT(*) AS BIGINT) AS n_assets,
      CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
      CAST(MIN(octet_length(payload)) AS BIGINT) AS min_bytes,
      CAST(MAX(octet_length(payload)) AS BIGINT) AS max_bytes
    FROM a GROUP BY 1, 2 ORDER BY 1, 2"""

  // ---- q143: raw-file landing via the binaryFile source ----------------
  // The step BEFORE every multimodal operator above: media arrives as
  // RAW FILES under an object-store prefix, and the landing job turns
  // them into the binary-column table the pipeline consumes — Spark's
  // built-in `binaryFile` source reads (path, length, content) with
  // pathGlobFilter pushdown, no codec required. Deterministic fixture: a
  // bounded slice of the derived asset corpus (asset_id < LandN) spills
  // as one .bin file per asset into a session-salted scratch dir (at
  // scale the prefix ALREADY exists — the file-per-object layout is the
  // source's shape, and ending it is this job's purpose), re-ingests
  // through binaryFile, and aggregates per kind with a sorted content
  // digest, so the oracle (recomputed from `documents`) verifies every
  // byte of every file survived the round trip. Scratch is deleted
  // before returning (the q117 checkpoint-then-clean discipline).
  private val LandN = 500L

  def q143BinaryLanding(s: SparkSession, d: String): DataFrame = {
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      "graft-assets-land-" + java.lang.Long.toHexString(
        DedupOps.h60("land:" + d + ":" + s.sparkContext.applicationId)))
    dir.mkdirs()
    val root = dir.getPath
    // The fixture slice is written from the DRIVER (collect of LandN=500
    // tiny rows), not foreachPartition: executor-side local writes are
    // only visible to the driver-side binaryFile re-read in local mode,
    // so the executor variant was silently environment-coupled. At real
    // scale the landing prefix is shared storage (S3/HDFS) and already
    // exists — this query models the re-ingest, not the scatter.
    assets(s, d).filter(_.asset_id < LandN).collect()
      .foreach { a =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(root, s"${a.kind}-${a.asset_id}.bin"),
          a.payload): Unit
      }
    val landed = s.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(root)
      .select(
        regexp_extract(col("path"), "([a-z]+)-\\d+\\.bin$", 1).as("kind"),
        col("length"), md5(col("content")).as("h"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("length")).as("total_bytes"),
        md5(concat_ws("", sort_array(collect_list(col("h")))))
          .as("content_md5"))
      .orderBy(col("kind"))
      // eager checkpoint forces the binaryFile read NOW (4 rows of
      // state), so the scratch files can be deleted before returning
      .localCheckpoint(true)
    Io.deleteRecursively(dir)
    landed
  }

  // ASCII corpus ⇒ DuckDB length(text) == payload bytes and md5(text)
  // == md5 of the file's content — the q117 digest discipline
  val q143Sql: String = s"""
    SELECT CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
      CAST(COUNT(*) AS BIGINT) AS n_assets,
      CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
      md5(string_agg(md5(text), '' ORDER BY md5(text))) AS content_md5
    FROM documents
    WHERE text IS NOT NULL AND doc_id < $LandN
    GROUP BY 1 ORDER BY 1"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_multimodal_features" -> q39MultimodalFeatures _,
    "q40_frame_sample"        -> q40FrameSample _,
    "q97_binary_sniff"        -> q97BinarySniff _,
    "q143_binary_landing"     -> q143BinaryLanding _)

  val oracles: Map[String, String] = Map(
    "q39_multimodal_features" -> q39Sql,
    "q40_frame_sample"        -> q40Sql,
    "q97_binary_sniff"        -> q97Sql,
    "q143_binary_landing"     -> q143Sql)
}
