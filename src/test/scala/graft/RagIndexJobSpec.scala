package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RagIndexJobSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val root = {
    val dir = java.nio.file.Files.createTempDirectory("rag-index").toString
    RagIndexJob.build(spark, sf, dir) -> dir
  }

  test("build dedups the chunk lattice into one canonical index artifact") {
    val ((n, u, p), dir) = root
    assert(n > 0 && u > 0 && u <= n)
    assert(p >= 4 && p <= 24)
    val index = spark.read.parquet(s"$dir/index.parquet")
    assert(index.count() == u)
    // one canonical row per fingerprint, and it is the lexicographic-min
    // survivor: no lattice chunk with the same md5 sorts before it
    assert(index.select("chunk_md5").distinct().count() == u)
    val lattice = ops.CurationOps.q145DocChunks(spark, sf)
    val earlier = lattice.as("l")
      .join(index.as("c"), col("l.chunk_md5") === col("c.chunk_md5") &&
        struct(col("l.doc_id"), col("l.chunk_idx")) <
          struct(col("c.doc_id"), col("c.chunk_idx")))
    assert(earlier.count() == 0)
  }

  private def digest(dir: String): String =
    spark.read.parquet(s"$dir/index.parquet")
      .select(col("doc_id"), col("chunk_idx"), col("bucket"),
        md5(to_json(struct(col("qa")))).as("h"))
      .orderBy(col("doc_id"), col("chunk_idx"))
      .agg(md5(concat_ws(",",
        collect_list(concat_ws(":", col("doc_id"), col("chunk_idx"),
          col("bucket"), col("h"))))).as("d"))
      .collect()(0).getString(0)

  test("rebuild is byte-deterministic (stateless idempotence)") {
    val (_, dir) = root
    val before = digest(dir)
    RagIndexJob.build(spark, sf, dir)
    assert(digest(dir) == before)
  }

  test("update is an O(batch) idempotent firing against the index ledger") {
    val (counts, dir) = root
    // re-feeding the whole indexed corpus appends nothing
    assert(RagIndexJob.update(spark, sf, dir) == 0L)
    // a genuinely new document appends exactly its chunk lattice and is
    // immediately servable
    import spark.implicits._
    val batch = java.nio.file.Files.createTempDirectory("rag-batch").toString
    val novelText = ("zxqvy wubble frotz" * 1) +
      (1 to 40).map(i => s" novelterm$i").mkString
    Seq((900001L, novelText, "en", "srcX", novelText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$batch/documents.parquet")
    val appended = RagIndexJob.update(spark, batch, dir)
    val expect = ops.CurationOps.q145DocChunks(spark, batch).count()
    assert(appended == expect && appended >= 2)
    // the firing is idempotent: a rerun of the same batch appends zero
    assert(RagIndexJob.update(spark, batch, dir) == 0L)
    val index = spark.read.parquet(s"$dir/index.parquet")
    assert(index.count() == counts._2 + appended)
    // serve the appended content
    val probe = index.filter(col("doc_id") === 900001L)
      .orderBy(col("chunk_idx")).collect()(0)
    val hits = RagIndexJob.lookup(spark, dir,
      probe.getAs[String]("chunk_text"), 3).collect()
    assert(hits(0).getAs[Long]("doc_id") == 900001L &&
      hits(0).getAs[Long]("chunk_idx") ==
        probe.getAs[Long]("chunk_idx"))
  }

  test("lookup self-retrieves an indexed chunk as top-1 through the bucket slice") {
    val (_, dir) = root
    // query an indexed chunk's exact text: the byte-fold embeds it
    // identically, the same planes bucket it identically, so the pruned
    // slice must contain it and cosine = 1 must rank it first
    val probe = spark.read.parquet(s"$dir/index.parquet")
      .orderBy(col("doc_id"), col("chunk_idx"))
      .filter(col("n_toks") >= 8).limit(50).collect()(25)
    val hits = RagIndexJob.lookup(spark, dir,
      probe.getAs[String]("chunk_text"), 5).collect()
    assert(hits.nonEmpty)
    assert(hits(0).getAs[Long]("doc_id") == probe.getAs[Long]("doc_id") &&
      hits(0).getAs[Long]("chunk_idx") == probe.getAs[Long]("chunk_idx"),
      s"self-retrieval missed: ${hits.mkString(";")}")
    assert(math.abs(hits(0).getAs[Double]("cosine") - 1.0) < 1e-12)
    assert(hits(0).getAs[String]("chunk_text") ==
      probe.getAs[String]("chunk_text"))
  }

  test("multi-probe widens the slice monotonically and keeps self-retrieval") {
    val (_, dir) = root
    val probe = spark.read.parquet(s"$dir/index.parquet")
      .orderBy(col("doc_id"), col("chunk_idx"))
      .filter(col("n_toks") >= 8).limit(50).collect()(30)
    val q = probe.getAs[String]("chunk_text")
    val single = RagIndexJob.lookup(spark, dir, q, 3).collect()
    val multi = RagIndexJob.lookup(spark, dir, q, 3,
      multiProbe = true).collect()
    // the self bucket is always probed, so the exact hit survives, and
    // widening the candidate slice can only improve (or tie) the
    // best-runner-up cosine
    assert(multi(0).getAs[Long]("doc_id") == single(0).getAs[Long]("doc_id")
      && multi(0).getAs[Long]("chunk_idx") ==
        single(0).getAs[Long]("chunk_idx"))
    if (single.length > 1 && multi.length > 1)
      assert(multi(1).getAs[Double]("cosine") >=
        single(1).getAs[Double]("cosine") - 1e-15)
    assert(multi.length >= single.length)
  }

  test("compact after N updates: identical lookups, file count restored, pruning kept") {
    import spark.implicits._
    // a private copy of the index so the shared `root` fixture stays
    // untouched for the other tests
    val dir = java.nio.file.Files.createTempDirectory("rag-compact").toString
    RagIndexJob.build(spark, sf, dir)
    val baseFiles = RagIndexJob.indexDataFiles(spark, dir)
    // N firings, each with novel content -> append debt accumulates
    (1 to 3).foreach { b =>
      val batch =
        java.nio.file.Files.createTempDirectory(s"rag-cbatch$b").toString
      val txt = (1 to 40).map(i => s"compactbatch${b}term$i").mkString(" ")
      Seq((910000L + b, txt, "en", "srcC", txt.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$batch/documents.parquet")
      assert(RagIndexJob.update(spark, batch, dir) > 0L)
    }
    val fragmented = RagIndexJob.indexDataFiles(spark, dir)
    assert(fragmented > baseFiles, s"updates added no files ($fragmented)")
    // freeze lookup results + full index content before compaction
    val q1 = spark.read.parquet(s"$dir/index.parquet")
      .filter(col("doc_id") === 910001L).orderBy(col("chunk_idx"))
      .collect()(0).getAs[String]("chunk_text")
    val hitsBefore = RagIndexJob.lookup(spark, dir, q1, 5).collect().toSeq
    val contentBefore = digest(dir)
    val (before, after) = RagIndexJob.compact(spark, dir, maxFiles = 8)
    assert(before == fragmented && after <= 8 && after < before,
      s"compact $before->$after")
    // byte-identical serving: same rows, same order, same cosines
    assert(digest(dir) == contentBefore)
    assert(RagIndexJob.lookup(spark, dir, q1, 5).collect().toSeq ==
      hitsBefore)
    // the compacted layout still prunes: bucket filter reaches the scan
    val plan = spark.read.parquet(s"$dir/index.parquet")
      .filter(col("bucket") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("bucket"))
    // compaction is idempotent: second call is a no-op
    assert(RagIndexJob.compact(spark, dir, maxFiles = 8) == (after, after))
  }

  test("retunePlanes re-buckets from the index's own vectors when the corpus outgrows the pin") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rag-retune").toString
    val (_, u0, p0) = RagIndexJob.build(spark, sf, dir)
    assert(!RagIndexJob.needsRetune(spark, dir))
    // grow the corpus past the next power-of-two bucket-count boundary:
    // planesFor(n) = clamped ceil(log2(ceil(n/32))), so from u0≈1350
    // (p=6) the pin drifts once unique chunks exceed 2048 — 600 novel
    // 40-token docs add ~1200 unique chunks (2 lattice windows each)
    val batch = java.nio.file.Files.createTempDirectory("rag-grow").toString
    val docs = (1 to 600).map { d =>
      val txt = (1 to 40).map(i => s"growterm${d}x$i").mkString(" ")
      (920000L + d, txt, "en", "srcG", txt.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$batch/documents.parquet")
    assert(RagIndexJob.update(spark, batch, dir) > 0L)
    assert(RagIndexJob.needsRetune(spark, dir),
      s"planes did not drift (u0=$u0, p0=$p0)")
    val probe = spark.read.parquet(s"$dir/index.parquet")
      .filter(col("doc_id") === 920005L).orderBy(col("chunk_idx"))
      .collect()(0).getAs[String]("chunk_text")
    // recall-sensitive mode: with retune disallowed, maintenance still
    // clears the append debt (compaction is recall-neutral layout work)
    // but leaves the pinned planes — and so the drift — alone
    val guarded = RagIndexJob.maintain(spark, dir, allowRetune = false)
    assert(guarded.startsWith("compacted:"), guarded)
    assert(RagIndexJob.indexDataFiles(spark, dir) <= 8)
    assert(RagIndexJob.needsRetune(spark, dir),
      "compact-only maintenance must not silently retune")
    val pNew = RagIndexJob.maintain(spark, dir)
    assert(pNew.startsWith("retuned:"), pNew)
    assert(!RagIndexJob.needsRetune(spark, dir))
    // manifest and index moved together: the new planes serve correctly
    val hits = RagIndexJob.lookup(spark, dir, probe, 3).collect()
    assert(hits(0).getAs[Long]("doc_id") == 920005L)
    assert(math.abs(hits(0).getAs[Double]("cosine") - 1.0) < 1e-12)
    // a retune also restores the global layout
    assert(RagIndexJob.indexDataFiles(spark, dir) <= 8)
    // second maintain call: nothing left to do
    assert(RagIndexJob.maintain(spark, dir) == "noop")
  }

  test("the serve scan pushes the bucket filter into the parquet source") {
    val (_, dir) = root
    val plan = spark.read.parquet(s"$dir/index.parquet")
      .filter(col("bucket") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("bucket"),
      s"bucket filter not pushed to the index scan:\n$plan")
  }
}
