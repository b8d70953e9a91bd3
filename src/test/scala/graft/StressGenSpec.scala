package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StressGenSpec extends AnyFunSuite {
  import SparkTestSession._

  test("stress corpus replicates with disjoint keys and intact join graph") {
    val out = java.nio.file.Files.createTempDirectory("graft-stress").toString
    val counts = StressGen.generate(spark, sf, out, replicas = 2)
    // facts scale by the replica count; broadcast dims stay fixed
    assert(counts("lineitem") == 2 * Tables.rowCount(spark, sf, "lineitem"))
    assert(counts("documents") == 2 * Tables.rowCount(spark, sf, "documents"))
    assert(counts("nation") == Tables.rowCount(spark, sf, "nation"))

    // keys are disjoint across replicas: distinct count also doubles
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.select("doc_id").distinct().count() == counts("documents"))
    // replica texts differ (exact dedup must not collapse replicas)
    assert(docs.select("text").distinct().count() == counts("documents"))

    // join graph fans out linearly, never across replicas: every lineitem
    // still matches exactly one order
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val ord = spark.read.parquet(s"$out/orders.parquet")
    assert(li.join(ord, li("l_orderkey") === ord("o_orderkey")).count()
      == counts("lineitem"))

    // embedding rotation preserves the norm but changes direction
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    val base = Tables.rowCount(spark, sf, "embeddings")
    val norms = emb.select(
      (col("vec_id") % StressGen.KEY_OFFSET).as("base_id"),
      aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x * x).as("n2"))
      .groupBy("base_id")
      .agg((max(col("n2")) - min(col("n2"))).as("spread"))
    assert(norms.filter(col("spread") > 1e-6).count() == 0,
      "rotation changed a vector's norm")
    assert(emb.select("embedding").distinct().count() == 2 * base,
      "rotated replicas should be distinct vectors")

    // events round-trips through the adaptive loader (LongType branch)
    val ev = Tables.events(spark, out)
    assert(ev.schema("ts").dataType.typeName == "timestamp")
    assert(ev.count() == 2 * Tables.rowCount(spark, sf, "events"))
  }
}
