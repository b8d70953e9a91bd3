package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import ops.TextOps

class TextOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("fingerprint is content-determined: same text same fp, distinct texts distinct fp") {
    val fp = TextOps.q28Fingerprint(spark, sf)
    val docs = Tables.documents(spark, sf)
    // all texts in the corpus are distinct → fps must be (mod-collisions
    // aside, none at this size)
    assert(fp.select("fp").distinct().count() == docs.count())
    // duplicating the input duplicates the fingerprint
    val doubled = docs.unionByName(docs)
    val fp2 = doubled.withColumn("fp", expr(
      "aggregate(split(text, ''), 0L," +
        " (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)"))
    assert(fp2.groupBy("fp").count().filter(col("count") =!= 2).count() == 0)
  }

  test("quality bands partition the corpus and ratios are in [0,1]") {
    val q = TextOps.q25TextQuality(spark, sf)
    assert(q.count() == Tables.documents(spark, sf).count())
    assert(q.filter(col("stop_ratio") < 0 || col("stop_ratio") > 1).count() == 0)
    assert(q.filter(!col("quality_band").isin("good", "fair", "low")).count() == 0)
  }

  test("lang-id confusion matrix covers every document exactly once") {
    val m = TextOps.q26LangId(spark, sf)
    val total = m.agg(sum("n")).head().getLong(0)
    assert(total == Tables.documents(spark, sf).count())
  }

  test("BPE-ish token count >= whitespace token count") {
    val t = TextOps.q27TokenCounts(spark, sf)
    assert(t.filter(col("sum_bpe_tokens") < col("sum_ws_tokens")).count() == 0)
  }
}
