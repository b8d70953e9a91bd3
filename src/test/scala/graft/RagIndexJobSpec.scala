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

  test("the serve scan pushes the bucket filter into the parquet source") {
    val (_, dir) = root
    val plan = spark.read.parquet(s"$dir/index.parquet")
      .filter(col("bucket") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("bucket"),
      s"bucket filter not pushed to the index scan:\n$plan")
  }
}
