package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import ops.SqlOps

class SqlOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("scalar subquery outliers really are below 1/5 of their part average") {
    val out = SqlOps.q48ScalarSubquery(spark, sf)
    val avgs = Tables.lineitem(spark, sf)
      .groupBy("l_partkey").agg(avg("l_quantity").as("a"))
    val bad = out.join(avgs, "l_partkey")
      .filter(col("l_quantity") >= col("a") / 5 + 1e-9)
    assert(out.count() > 0)
    assert(bad.count() == 0)
  }

  test("INTERSECT ALL + EXCEPT ALL multiplicities reconstruct the multiset") {
    val rows = SqlOps.q49SetAll(spark, sf)
    // |A ∩all B| + |A \all B| == |A| for B ⊆ A
    assert(rows.count() == Tables.customer(spark, sf).count())
  }

  test("seeded sampling is deterministic across runs and roughly sized") {
    val a = SqlOps.q53Sample(spark, sf).collect()
    val b = SqlOps.q53Sample(spark, sf).collect()
    assert(a.sameElements(b))
    val total = Tables.documents(spark, sf).count()
    assert(a.length > total / 50 && a.length < total / 3) // ~10% ± slack
    val strat = SqlOps.q54StratifiedSample(spark, sf).collect()
    val strat2 = SqlOps.q54StratifiedSample(spark, sf).collect()
    assert(strat.sameElements(strat2))
  }

  test("null semantics: null and non-null counts partition each group") {
    val r = SqlOps.q55NullSemantics(spark, sf)
    import org.apache.spark.sql.functions._
    val bad = r.filter(col("n_null") =!= col("n_nullsafe"))
    assert(bad.count() == 0) // IS NOT DISTINCT FROM NULL == IS NULL
    val total = r.agg(sum(col("n_nonnull") + col("n_null"))).head().getLong(0)
    assert(total == Tables.orders(spark, sf).count())
  }

  test("grouping sets: both level totals equal the grand total") {
    val r = SqlOps.q50GroupingSets(spark, sf).collect()
    val grand = r.filter(_.getAs[Long]("gid") == 3L).map(_.getAs[Long]("n")).sum
    val byPrio = r.filter(_.getAs[Long]("gid") == 1L).map(_.getAs[Long]("n")).sum
    val byStatus = r.filter(_.getAs[Long]("gid") == 2L).map(_.getAs[Long]("n")).sum
    assert(grand == Tables.orders(spark, sf).count())
    assert(byPrio == grand && byStatus == grand)
  }

  test("q91 splits partition the corpus exactly (counts and id checksums)") {
    val r = SqlOps.q91Split(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(r.map(_.getAs[Long]("n")).sum == docs.count())
    assert(r.map(_.getAs[Long]("id_sum")).sum ==
      docs.agg(org.apache.spark.sql.functions.sum("doc_id"))
        .head().getLong(0))
    // every source contributes a train split; the 90/5/5 gate keeps
    // train dominant per source
    val bySource = r.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rows) =>
      val m = rows.map(x => x.getAs[String]("split") -> x.getAs[Long]("n")).toMap
      assert(m.getOrElse("train", 0L) >
        m.getOrElse("val", 0L) + m.getOrElse("test", 0L), s"$src: $m")
    }
  }

  test("q192 restores the session recursion-level limit it raises") {
    val key = "spark.sql.cteRecursionLevelLimit"
    val before = spark.conf.getOption(key)
    assert(SqlOps.q192RecursiveSessions(spark, sf).count() > 0)
    assert(spark.conf.getOption(key) == before,
      "q192 leaked its raised recursion limit into the shared session")
  }

  test("q192 recursive closure matches a brute driver-side sessionization") {
    val events = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("user_id") < 200)
      .select("user_id", "event_id", "ts").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts").getTime))
    // brute: per user, order by (ts, event_id), split on >30-min gaps
    val brute = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ord = es.sortBy(e => (e._3, e._2))
      val sessions = scala.collection.mutable.ArrayBuffer.empty[
        scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]]
      ord.foreach { e =>
        if (sessions.isEmpty || e._3 - sessions.last.last._3 > 1800000L)
          sessions += scala.collection.mutable.ArrayBuffer(e)
        else sessions.last += e
      }
      sessions.map(ss => (ss.length.toLong, ss.head._2)) // (len, root id)
    }
    val expect = brute.groupBy(_._1).map { case (len, xs) =>
      len -> ((xs.size.toLong, xs.map(_._2).sum))
    }
    val r = SqlOps.q192RecursiveSessions(spark, sf).collect()
    assert(r.map(_.getAs[Long]("session_len")).toSet == expect.keySet)
    r.foreach { row =>
      val (n, checksum) = expect(row.getAs[Long]("session_len"))
      assert(row.getAs[Long]("n_sessions") == n, row.toString)
      assert(row.getAs[Long]("id_checksum") == checksum, row.toString)
    }
    // conservation: sessions × lengths = corpus event count
    assert(r.map(x => x.getAs[Long]("session_len") *
      x.getAs[Long]("n_sessions")).sum == events.length.toLong)
  }

  test("q234 Kaplan-Meier matches a hand-computed censored fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("km").toString
    val base = java.time.LocalDate.of(2024, 1, 1).atStartOfDay()
    def ev(id: Long, u: Long, dayOff: Long) =
      (id, java.sql.Timestamp.valueOf(base.plusDays(dayOff)), u,
        "view", 1.0, "{}")
    // u1-u3 churn at week 1; u4 churns at week 2; u5 spans to the corpus
    // max (censored); u6's last event is inside the 28-day horizon
    // (censored). tmax = day 70 → censoring cut at day 42.
    val rows = Seq(
      ev(1, 1, 0), ev(2, 1, 8), ev(3, 2, 0), ev(4, 2, 8),
      ev(5, 3, 0), ev(6, 3, 8), ev(7, 4, 0), ev(8, 4, 16),
      ev(9, 5, 0), ev(10, 5, 70), ev(11, 6, 30), ev(12, 6, 65))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    // registerAll reads every corpus table — stub the others empty
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .write.parquet(s"$dir/$t.parquet")
    }
    val r = ops.SqlOps.q234SurvivalCurve(spark, dir).collect()
      .map(x => x.getAs[Long]("week") -> x).toMap
    assert(r.keySet == Set(1L, 2L, 5L, 10L))
    // week 1: 6 at risk, 3 churn → S = 500000 ppm
    assert(r(1L).getAs[Long]("n_at_risk") == 6L)
    assert(r(1L).getAs[Long]("n_churned") == 3L)
    assert(r(1L).getAs[Long]("surv_ppm") == 500000L)
    // week 2: 3 at risk, 1 churns → S = 500000·2/3 = 333333
    assert(r(2L).getAs[Long]("n_at_risk") == 3L)
    assert(r(2L).getAs[Long]("surv_ppm") == 333333L)
    // censored-only weeks leave S unchanged — censoring is not churn
    assert(r(5L).getAs[Long]("n_censored") == 1L)
    assert(r(5L).getAs[Long]("surv_ppm") == 333333L)
    assert(r(10L).getAs[Long]("n_at_risk") == 1L)
    assert(r(10L).getAs[Long]("surv_ppm") == 333333L)
  }
}
