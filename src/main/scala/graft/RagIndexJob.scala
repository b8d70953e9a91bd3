package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.hadoop.fs.Path

import ops.{CurationOps, PartitionSwap, SimOps}

/** End-to-end retrieval-index job — the SERVING-side complement of
  * [[CurationJob]]'s training-side pipeline: where CurationJob turns raw
  * documents into training shards, this job turns the same corpus into a
  * chunk-level ANN index an embedding-retrieval (RAG) service reads.
  *
  * Build (`runMain graft.RagIndexJob <sfDir> <indexRoot>`):
  *
  *   1. chunking — the q145 token-window lattice (width 32 / stride 24,
  *      case-preserving), via [[CurationOps.docChunks]];
  *   2. chunk-level exact dedup — one canonical chunk per `chunk_md5`,
  *      the lexicographic-min (doc_id, chunk_idx) survivor (the
  *      overlapping lattice makes intra-doc duplicates common and
  *      boilerplate makes cross-doc ones common; indexing them all
  *      wastes index space and returns redundant hits);
  *   3. stub chunk encoder — UTF-8 byte-fold into a Dim-length integer
  *      vector ([[ops.Multimodal.embedStub]]'s text twin: the real
  *      encoder is the sandbox-stubbed model, the PLUMBING — schema,
  *      partition-batched map, fixed-dim vector column — is the real
  *      thing and swaps for a model server call without plan changes);
  *   4. LSH bucketing — the SAME corpus-size-derived sign-random-
  *      projection the ANN operators use ([[SimOps.planesFor]] /
  *      `bucketExpr`), so bucket balance carries over;
  *   5. one index artifact — `index.parquet` (md5, ids, text, vector,
  *      bucket) range-partitioned and sorted by bucket, so a serve-time
  *      `bucket = q` filter prunes files and row groups by parquet
  *      min/max stats instead of scanning the index. At cluster scale
  *      this layout is `bucketBy` into the catalog; a 1-row
  *      `manifest.parquet` pins the plane count so neither lookups nor
  *      updates re-derive corpus statistics.
  *
  * Incremental ingest ([[update]]): chunk the new batch, canonicalize
  * within it, LEFT-ANTI probe the index's md5 ledger, and append only
  * novel chunks bucketed under the MANIFEST's pinned planes — O(batch)
  * writes per firing, the [[ops.DedupOps.incrementalDedup]] store
  * contract with the index itself as the ledger. Because the ledger and
  * the serve artifact are ONE file set written by ONE job commit,
  * a crashed firing leaves no partial state and a rerun appends zero
  * rows (idempotent). Appended file sets are bucket-sorted internally;
  * [[compact]] merges them back into the single global bucket-sorted
  * layout when append debt accumulates (each appended set adds files
  * every probed bucket must touch — serve-side pruning degrades
  * linearly in firings until compaction restores it), and
  * [[retunePlanes]] re-buckets the index from its own stored vectors
  * when the grown corpus has drifted past the manifest's pinned plane
  * count. Both publish through [[ops.PartitionSwap.swapDir]] — the
  * index and its manifest move as ONE directory swap, so no crash
  * point can ever pair a new index with an old manifest (which would
  * silently mis-bucket every lookup). [[maintain]] is the scheduled
  * wrapper: retune if drifted (a retune also restores the layout),
  * else compact if fragmented, else no-op.
  *
  * Serve path ([[lookup]]): embed the query with the same stub, bucket
  * it with the same planes, read ONLY the matching index slice, exact
  * integer-dot cosine re-rank, top-k with the chunk text. O(bucket)
  * work per query — the build-once / serve-many contract the pinned ANN
  * stages model inside the bench, here as durable on-disk artifacts.
  *
  * Determinism: every stage is a pure function of the corpus bytes, so
  * a rebuild rewrites byte-identical artifacts (spec-pinned).
  */
object RagIndexJob {

  private[graft] val Dim = 64

  private def foldBytes(bytes: Array[Byte]): Array[Long] = {
    val acc = new Array[Long](Dim)
    var i = 0
    while (i < bytes.length) { acc(i % Dim) += (bytes(i) & 0xff).toLong; i += 1 }
    acc
  }

  /** Canonical survivor per fingerprint: struct min = lexicographic-min
    * (doc_id, chunk_idx) — deterministic under any partitioning. */
  private def canonicalChunks(chunks: DataFrame): DataFrame =
    chunks
      .groupBy(col("chunk_md5"))
      .agg(min(struct(col("doc_id"), col("chunk_idx"), col("n_toks"),
        col("chunk_text"))).as("r"))
      .select(col("chunk_md5"), col("r.doc_id").as("doc_id"),
        col("r.chunk_idx").as("chunk_idx"), col("r.n_toks").as("n_toks"),
        col("r.chunk_text").as("chunk_text"))

  /** Deterministic integer chunk vectors (column `qa`, [[SimOps]]'s
    * quantized-vector convention), carried alongside the chunk row.
    *
    * Partition-batched, [[ops.Multimodal.embedStub]]'s shape: one
    * encoder context per task, rows encoded in fixed-size batches — the
    * contract a real model-server call has (per-batch forward pass, not
    * per-row round trips through the row encoders). Swapping the stub
    * for an RPC changes only the body of the `grouped` block. */
  private val EncodeBatch = 64

  private[graft] def encodeChunks(chunks: DataFrame): DataFrame = {
    import chunks.sparkSession.implicits._
    chunks.select(col("chunk_md5"), col("doc_id"), col("chunk_idx"),
        col("n_toks"), col("chunk_text"))
      .as[(String, Long, Long, Long, String)]
      .mapPartitions { rows =>
        // one "encoder" per task; each grouped(..) slice models one
        // batched forward pass over EncodeBatch chunk texts
        rows.grouped(EncodeBatch).flatMap { batch =>
          batch.map { case (md5v, docId, ci, nt, txt) =>
            (md5v, docId, ci, nt, txt, foldBytes(
              txt.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          }
        }
      }
      .toDF("chunk_md5", "doc_id", "chunk_idx", "n_toks", "chunk_text",
        "qa")
  }

  private def writeSlice(indexed: DataFrame, indexRoot: String,
      mode: String, files: Int): Unit =
    indexed.repartitionByRange(files, col("bucket"))
      .sortWithinPartitions(col("bucket"))
      .write.mode(mode).parquet(s"$indexRoot/index.parquet")

  private def rootFs(spark: SparkSession, indexRoot: String) =
    new Path(indexRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Heal any maintenance swap a crash left half-done; every entry point
    * that reads the root calls this first. */
  private def recoverRoot(spark: SparkSession, indexRoot: String): Unit =
    PartitionSwap.recoverDir(rootFs(spark, indexRoot), new Path(indexRoot))

  /** Data files currently under the index artifact (append debt =
    * anything beyond the build's global layout). */
  private[graft] def indexDataFiles(spark: SparkSession,
      indexRoot: String): Int = {
    val fs = rootFs(spark, indexRoot)
    val dir = new Path(s"$indexRoot/index.parquet")
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir).count(f => f.isFile &&
      !f.getPath.getName.startsWith("_") &&
      !f.getPath.getName.startsWith("."))
  }

  private def manifestPlanes(spark: SparkSession, indexRoot: String): Int =
    spark.read.parquet(s"$indexRoot/manifest.parquet")
      .collect()(0).getAs[Int]("planes")

  /** Stage `index` (+ a fresh manifest pinning `planes`) as a sibling
    * root and swap it in whole — the index and manifest change together
    * or not at all. */
  private def publishRoot(spark: SparkSession, indexRoot: String,
      index: DataFrame, planes: Int, files: Int): Unit = {
    import spark.implicits._
    val fs = rootFs(spark, indexRoot)
    val staging = new Path(indexRoot + "__staging")
    fs.delete(staging, true)
    writeSlice(index, staging.toString, "overwrite", files)
    Seq((planes, Dim)).toDF("planes", "dim")
      .write.mode("overwrite").parquet(s"$staging/manifest.parquet")
    PartitionSwap.swapDir(fs, staging, new Path(indexRoot))
  }

  /** Compaction: merge the appended file sets back into the single
    * global bucket-sorted layout the build wrote, restoring serve-side
    * file/row-group pruning (each append made every probed bucket touch
    * one more file set). One bucket-range shuffle of the index — the
    * scheduled companion job, run between (never during) update
    * firings. Returns (files before, files after); a no-op below
    * `maxFiles` debt. */
  def compact(spark: SparkSession, indexRoot: String,
      maxFiles: Int = 8, targetFiles: Int = 8): (Int, Int) = {
    recoverRoot(spark, indexRoot)
    val before = indexDataFiles(spark, indexRoot)
    if (before <= maxFiles) return (before, before)
    publishRoot(spark, indexRoot,
      spark.read.parquet(s"$indexRoot/index.parquet"),
      manifestPlanes(spark, indexRoot), targetFiles)
    (before, indexDataFiles(spark, indexRoot))
  }

  /** True when the corpus has grown (or shrunk) past the manifest's
    * pinned plane count — the rebuild trigger: stale planes mean each
    * bucket holds ~2× the target rows per missing plane, degrading
    * lookup cost, while too many planes starve buckets and hurt recall. */
  def needsRetune(spark: SparkSession, indexRoot: String): Boolean = {
    recoverRoot(spark, indexRoot)
    SimOps.planesFor(
      spark.read.parquet(s"$indexRoot/index.parquet").count()) !=
      manifestPlanes(spark, indexRoot)
  }

  /** Re-tune the plane count to the grown corpus WITHOUT the source
    * documents: the index stores every chunk's vector, so re-bucketing
    * is one scan of the index itself (re-chunking and re-encoding 100 TB
    * of source text would be the expensive path; this is O(index)).
    * Returns the new plane count, or None if already tuned. */
  def retunePlanes(spark: SparkSession, indexRoot: String)
      : Option[Int] = {
    recoverRoot(spark, indexRoot)
    val idx = spark.read.parquet(s"$indexRoot/index.parquet")
    val target = SimOps.planesFor(idx.count())
    if (target == manifestPlanes(spark, indexRoot)) None
    else {
      publishRoot(spark, indexRoot,
        idx.drop("bucket")
          .withColumn("bucket", SimOps.bucketExpr(target)),
        target, files = 8)
      Some(target)
    }
  }

  /** Scheduled maintenance policy: retune if the plane count drifted (a
    * retune rewrites the global layout, subsuming compaction), else
    * compact if append debt accumulated, else nothing. Returns what it
    * did.
    *
    * `allowRetune = false` is the recall-sensitive mode the sf1ish
    * lifecycle drive motivated (BASELINE.md round 11): on clone-heavy
    * corpora near-identical vectors concentrate into shared buckets, so
    * a retune narrows candidate sets far less than the plane math
    * promises while still splitting near-dup neighborhoods across the
    * new hyperplanes (measured: single-probe recall@10 0.57 → 0.45).
    * Compaction is recall-neutral (pure layout), so a serve fleet that
    * prefers recall can cap maintenance at compact-only and absorb the
    * larger buckets with multi-probe lookups. */
  def maintain(spark: SparkSession, indexRoot: String,
      maxFiles: Int = 8, allowRetune: Boolean = true): String =
    (if (allowRetune) retunePlanes(spark, indexRoot) else None) match {
      case Some(p) => s"retuned:$p"
      case None =>
        val (before, after) = compact(spark, indexRoot, maxFiles)
        if (after < before) s"compacted:$before->$after" else "noop"
    }

  /** Builds the index artifacts; returns (total chunks, unique chunks,
    * planes). */
  def build(spark: SparkSession, sfDir: String, indexRoot: String)
      : (Long, Long, Int) = {
    import spark.implicits._
    recoverRoot(spark, indexRoot)
    val chunks = CurationOps.docChunks(spark, sfDir).persist()
    val nChunks = chunks.count()
    val unique = canonicalChunks(chunks).persist()
    val nUnique = unique.count()
    chunks.unpersist()
    val planes = SimOps.planesFor(nUnique)
    writeSlice(
      encodeChunks(unique).withColumn("bucket", SimOps.bucketExpr(planes)),
      indexRoot, "overwrite", files = 8)
    unique.unpersist()
    Seq((planes, Dim)).toDF("planes", "dim")
      .write.mode("overwrite").parquet(s"$indexRoot/manifest.parquet")
    (nChunks, nUnique, planes)
  }

  /** Incremental firing: index every chunk of `batchDir`'s documents not
    * already in the ledger. Returns the number of appended chunks. */
  def update(spark: SparkSession, batchDir: String, indexRoot: String)
      : Long = {
    recoverRoot(spark, indexRoot)
    val planes = manifestPlanes(spark, indexRoot)
    val ledger = spark.read.parquet(s"$indexRoot/index.parquet")
      .select(col("chunk_md5"))
    val novel = canonicalChunks(CurationOps.docChunks(spark, batchDir))
      .join(ledger, Seq("chunk_md5"), "left_anti")
      .persist()
    val n = novel.count()
    if (n > 0)
      writeSlice(
        encodeChunks(novel).withColumn("bucket", SimOps.bucketExpr(planes)),
        indexRoot, "append", files = 2)
    novel.unpersist()
    n
  }

  /** Serve path: top-k unique chunks for a query string. Reads only the
    * query-bucket slice of the index (file/row-group pruned via the
    * bucket-sorted layout); candidates re-rank by exact cosine over the
    * integer vectors. Ties break on (doc_id, chunk_idx) for a total
    * order. `multiProbe` widens the slice to every single-bit-flip
    * neighbor bucket (the q68 trick: a near-identical chunk whose
    * vector sits on the wrong side of ONE near-zero hyperplane lands
    * one Hamming bit away) — planes+1 pruned slices instead of one,
    * still never a scan of the index. */
  def lookup(spark: SparkSession, indexRoot: String, queryText: String,
      k: Int, multiProbe: Boolean = false): DataFrame = {
    import spark.implicits._
    recoverRoot(spark, indexRoot)
    val planes = manifestPlanes(spark, indexRoot)
    val qa = foldBytes(
      queryText.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the query rides the SAME bucket expression the build used, on a
    // 1-row frame — no reimplementation that could drift
    val qBucket = Seq(Tuple1(qa)).toDF("qa")
      .select(SimOps.bucketExpr(planes).as("b")).collect()(0).getLong(0)
    val probed: Seq[Long] =
      if (multiProbe) qBucket +: (0 until planes).map(p => qBucket ^ (1L << p))
      else Seq(qBucket)
    val qNorm = qa.foldLeft(0d)((s, v) => s + v.toDouble * v.toDouble)
    spark.read.parquet(s"$indexRoot/index.parquet")
      .filter(col("bucket").isin(probed: _*))
      .withColumn("dot",
        aggregate(zip_with(col("qa"), lit(qa), (x, w) => x * w),
          lit(0L), (acc, t) => acc + t))
      .withColumn("nq",
        aggregate(transform(col("qa"), x => x * x), lit(0L),
          (acc, t) => acc + t))
      // norm product in double: both squared norms can reach ~1e10, and
      // their long product would overflow; the cosine is serve-side
      // ranking only (no oracle twin), so IEEE is the right type
      .withColumn("cosine",
        col("dot").cast("double") /
          sqrt(col("nq").cast("double") * lit(qNorm)))
      .orderBy(col("cosine").desc, col("doc_id").asc, col("chunk_idx").asc)
      .limit(k)
      .select(col("doc_id"), col("chunk_idx"), col("bucket"),
        col("cosine"), col("chunk_text"))
  }

  private val Usage =
    """usage: RagIndexJob build <sfDir> <indexRoot>
      |       RagIndexJob update <batchDir> <indexRoot>
      |       RagIndexJob maintain <indexRoot>
      |       RagIndexJob lookup <indexRoot> <queryText> [k]
      |       RagIndexJob <sfDir> <indexRoot>          (legacy = build)""".stripMargin

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-rag-index-job")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.toList match {
      case "build" :: sfDir :: root :: Nil =>
        val (n, u, p) = build(spark, sfDir, root)
        println(s"[rag-index-job] indexed $u unique of $n chunks, $p planes")
      case "update" :: batchDir :: root :: Nil =>
        val n = update(spark, batchDir, root)
        println(s"[rag-index-job] appended $n novel chunks")
      case "maintain" :: root :: Nil =>
        println(s"[rag-index-job] maintain: ${maintain(spark, root)}")
      case "lookup" :: root :: query :: rest if rest.length <= 1 =>
        val k = rest.headOption.map(_.toInt).getOrElse(5)
        lookup(spark, root, query, k).collect().foreach { r =>
          println(s"[rag-index-job] hit doc=${r.getAs[Long]("doc_id")}" +
            s" chunk=${r.getAs[Long]("chunk_idx")}" +
            f" cos=${r.getAs[Double]("cosine")}%.4f")
        }
      case sfDir :: root :: Nil
          if !Set("build", "update", "maintain", "lookup")(sfDir) =>
        val (n, u, p) = build(spark, sfDir, root)
        println(s"[rag-index-job] indexed $u unique of $n chunks, $p planes")
      case _ => System.err.println(Usage); sys.exit(2)
    }
    spark.stop()
  }
}
