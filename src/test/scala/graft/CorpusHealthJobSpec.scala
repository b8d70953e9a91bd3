package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusHealthJobSpec extends AnyFunSuite {
  import SparkTestSession._

  private val AllMonitors = Set("ks_drift", "ranking_auc", "rater_kappa",
    "calibration", "composition", "mixing", "embedding_hygiene")

  test("record writes one single-file snapshot with all seven monitors; rerun is idempotent") {
    val root = java.nio.file.Files.createTempDirectory("health-a").toString
    val n1 = CorpusHealthJob.record(spark, sf, root, 1L)
    assert(n1 > 0L)
    val hist = spark.read.parquet(s"$root/history.parquet")
    assert(hist.count() == n1)
    assert(hist.select("monitor").distinct().collect()
      .map(_.getString(0)).toSet == AllMonitors)
    // entity grain sanity: every (monitor, entity) appears once per run
    assert(hist.groupBy("monitor", "entity").count()
      .filter(col("count") =!= 1L).count() == 0)
    // the run publishes as a run_id-named PARTITION directory — the
    // idempotency mechanism: a duplicate publish overwrites this dir
    // instead of appending to the ledger
    val partDir = new java.io.File(s"$root/history.parquet/run_id=1")
    assert(partDir.isDirectory, "run snapshot is not a run_id partition")
    // one data file per firing (O(hundreds) rows, ever)
    val files = partDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1, s"expected 1 snapshot file, found $files")
    // idempotent rerun: ledger already has run 1 → appends nothing
    assert(CorpusHealthJob.record(spark, sf, root, 1L) == 0L)
    assert(spark.read.parquet(s"$root/history.parquet").count() == n1)
    // a racing duplicate publish (fast path missed) OVERWRITES the
    // partition: replay the publish write directly and verify the
    // ledger still holds exactly one snapshot for run 1
    val snap1 = spark.read.parquet(s"$root/history.parquet")
      .filter(col("run_id") === 1L)
      .select("monitor", "entity", "value", "band")
    val replay = spark.createDataFrame(
      java.util.Arrays.asList(snap1.collect(): _*), snap1.schema)
    replay.coalesce(1).write.mode("overwrite")
      .parquet(s"$root/history.parquet/run_id=1")
    assert(spark.read.parquet(s"$root/history.parquet").count() == n1)
    spark.catalog.clearCache()
  }

  test("trend deltas are exact and alerts isolate the one planted band flip") {
    // corpus v2 = v1 with every label-0 embedding zeroed: exactly ONE
    // monitor entity (embedding_hygiene/label:0, clean at v1 — pinned
    // fixture property) may change; every document-side monitor must
    // report delta 0 / no flip.
    val root = java.nio.file.Files.createTempDirectory("health-b").toString
    val v2 = java.nio.file.Files.createTempDirectory("health-corpus2").toString
    Tables.documents(spark, sf).write.parquet(s"$v2/documents.parquet")
    Tables.embeddings(spark, sf)
      .withColumn("embedding",
        when(col("label") === 0,
          expr("transform(embedding, x -> cast(0.0 as float))"))
          .otherwise(col("embedding")))
      .write.parquet(s"$v2/embeddings.parquet")

    assert(CorpusHealthJob.record(spark, sf, root, 1L) > 0L)
    assert(CorpusHealthJob.record(spark, v2, root, 2L) > 0L)

    val t = CorpusHealthJob.trend(spark, root).collect()
    val hist = spark.read.parquet(s"$root/history.parquet").collect()
      .map(r => (r.getAs[String]("monitor"), r.getAs[String]("entity"),
        r.getAs[Long]("run_id")) -> r).toMap
    // delta math: for every run-2 row whose entity existed at run 1,
    // delta == value2 - value1 and flipped == (band changed)
    t.filter(_.getAs[Long]("run_id") == 2L).foreach { row =>
      val key1 = (row.getAs[String]("monitor"),
        row.getAs[String]("entity"), 1L)
      hist.get(key1).foreach { prev =>
        val bothVals = !row.isNullAt(row.fieldIndex("value")) &&
          !prev.isNullAt(prev.fieldIndex("value"))
        if (bothVals)
          assert(row.getAs[Long]("delta") ==
            row.getAs[Long]("value") - prev.getAs[Long]("value"))
        assert(row.getAs[Boolean]("flipped") ==
          (row.getAs[String]("band") != prev.getAs[String]("band")))
      }
    }
    // the page-a-human subset: exactly the planted hygiene flip
    val a = CorpusHealthJob.alerts(spark, root).collect()
    assert(a.length == 1, a.mkString("; "))
    assert(a.head.getAs[String]("monitor") == "embedding_hygiene")
    assert(a.head.getAs[String]("entity") == "label:0")
    assert(a.head.getAs[String]("prev_band") == "clean")
    assert(a.head.getAs[String]("band") == "dirty")
    // document-side monitors saw an identical corpus: all deltas 0
    t.filter(r => r.getAs[Long]("run_id") == 2L &&
        r.getAs[String]("monitor") != "embedding_hygiene")
      .foreach { r =>
        if (!r.isNullAt(r.fieldIndex("delta")))
          assert(r.getAs[Long]("delta") == 0L, r.toString)
        assert(!r.getAs[Boolean]("flipped"), r.toString)
      }
    spark.catalog.clearCache()
  }

  test("trend and alerts on an empty ledger are empty, not errors") {
    val root = java.nio.file.Files.createTempDirectory("health-c").toString
    assert(CorpusHealthJob.trend(spark, root).isEmpty)
    assert(CorpusHealthJob.alerts(spark, root).isEmpty)
  }

  test("record on a text-only corpus degrades to the six document monitors") {
    val root = java.nio.file.Files.createTempDirectory("health-d").toString
    val v = java.nio.file.Files.createTempDirectory("health-noemb").toString
    Tables.documents(spark, sf).write.parquet(s"$v/documents.parquet")
    assert(CorpusHealthJob.record(spark, v, root, 1L) > 0L)
    val monitors = spark.read.parquet(s"$root/history.parquet")
      .select("monitor").distinct().collect().map(_.getString(0)).toSet
    assert(monitors == AllMonitors - "embedding_hygiene")
    spark.catalog.clearCache()
  }
}
