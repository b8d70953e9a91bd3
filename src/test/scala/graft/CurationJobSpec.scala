package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationJobSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("one firing gates, scrubs, dedups, packs, and balances shards") {
    val in = tmp("cur-in")
    val shards = tmp("cur-shards")
    val state = tmp("cur-state")
    // corpus with a short doc (gated), an internal duplicate pair, and
    // planted PII that must not survive
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .unionByName(Seq(
        (100001L, "too short"),
        (100002L, "reach me at spam.bot@mail.example for offers " +
          ("filler token stream " * 5).trim),
        (100003L, Tables.documents(spark, sf)
          .orderBy("doc_id").select("text").as[String].head()))
        .toDF("doc_id", "text"))
    docs.write.parquet(s"$in/batch1")

    val n1 = CurationJob.runOnce(spark, s"$in/batch1", shards, state)
    val out1 = spark.read.parquet(s"$shards/firing=0")
    assert(n1 == out1.count())
    // the short doc was gated; the duplicate text (100003 copies doc 0's
    // text, and the store keeps the min doc_id) shipped exactly once
    assert(out1.filter(col("doc_id") === 100001L).count() == 0)
    assert(out1.filter(col("doc_id") === 100003L).count() == 0)
    // no un-scrubbed email shapes survive anywhere
    assert(out1.filter(col("text").rlike("[a-z0-9._]+@[a-z0-9.]+"))
      .count() == 0)
    assert(out1.filter(col("text").contains("<EMAIL>")).count() == 1)
    // shard balance: every full shard carries the same token mass to
    // within one chunk boundary's document (64 chunks x 512 tokens)
    val byShard = out1.groupBy("shard").agg(sum("n_tok").as("tok"))
      .orderBy("shard").collect()
    if (byShard.length > 1) {
      val full = byShard.dropRight(1).map(_.getAs[Long]("tok"))
      val target = 64L * 512L
      full.foreach { t =>
        assert(math.abs(t - target) <= 512,
          s"full shard off-balance: $t vs $target")
      }
    }

    // firing 2: all-seen input produces an empty firing (idempotent)
    val n2 = CurationJob.runOnce(spark, s"$in/batch1", shards, state)
    assert(n2 == 0)
    // firing 3: one genuinely novel doc ships alone
    Seq((200001L, ("fresh novel content stream " * 4).trim))
      .toDF("doc_id", "text").write.parquet(s"$in/batch3")
    val n3 = CurationJob.runOnce(spark, s"$in/batch3", shards, state)
    assert(n3 == 1)
    val out3 = spark.read.parquet(s"$shards/firing=2")
    assert(out3.select("doc_id").as[Long].collect().toSeq == Seq(200001L))

    // firing 4: a PARAPHRASE of firing 3's doc — not byte-identical, so
    // the fingerprint store admits it; the near-dup signature store
    // must reject it (one word changed out of 16)
    Seq((300001L, ("fresh novel content stream " * 4).trim
        .replaceAll("stream$", "river")))
      .toDF("doc_id", "text").write.parquet(s"$in/batch4")
    val n4 = CurationJob.runOnce(spark, s"$in/batch4", shards, state)
    assert(n4 == 0, "paraphrase of a shipped doc must not ship")
  }
}
