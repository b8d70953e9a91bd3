package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import ops.{Ingest, JdbcSink}

/** S4 JDBC sink round trip against embedded Derby (in-process, offline):
  * CSV → dedup → JDBC upsert → read-back must equal the parquet path, and
  * re-running the upsert must be a no-op (ON CONFLICT DO NOTHING parity —
  * the reference's every-15-minutes rerun semantics).
  */
class JdbcSinkSpec extends AnyFunSuite {
  import SparkTestSession._

  // Derby writes derby.log to user.dir by default — redirect to tmp
  System.setProperty("derby.stream.error.file",
    Files.createTempDirectory("graft-derby-log").resolve("derby.log").toString)

  private val dbDir = Files.createTempDirectory("graft-derby").resolve("db")
  private val url = s"jdbc:derby:$dbDir;create=true"

  // the reference's states DDL (schema.sql:1-8) minus the Postgres-isms
  private val statesDdl =
    """CREATE TABLE states (
      |  date DATE NOT NULL,
      |  state VARCHAR(100) NOT NULL,
      |  fips INTEGER,
      |  cases BIGINT,
      |  deaths BIGINT)""".stripMargin

  private def fixtureCsv(): String = {
    val dir = Files.createTempDirectory("graft-jdbc-src")
    Files.writeString(dir.resolve("states.csv"), Seq(
      "date,state,fips,cases,deaths",
      "2020-03-15,Washington,53,904,48",
      "2020-03-15,Washington,53,999,50", // key dup in-feed → dedup keeps 904
      "2020-03-15,Guam,,3,0",            // null fips (P3 null preservation)
      "2020-03-16,Washington,53,1000,52").mkString("\n") + "\n")
    dir.toString
  }

  private def dedupedStates(src: String) =
    Ingest.dedupKeepFirst(Ingest.readStates(spark, src), Ingest.statesKey,
      Seq(col("cases").asc, col("deaths").asc))

  test("CSV → dedup → JDBC upsert → read-back equals the parquet path; rerun is a no-op") {
    val src = fixtureCsv()
    JdbcSink.initSchema(url, Seq(statesDdl))
    val cleaned = dedupedStates(src)

    JdbcSink.upsertJdbc(cleaned, url, "states", Ingest.statesKey)
    val viaJdbc = spark.read.jdbc(url, "states", new java.util.Properties)

    // parquet path over the same source
    val sink = Files.createTempDirectory("graft-jdbc-pq").resolve("states")
    Ingest.ingest(spark, src, Ingest.statesSchema, Ingest.statesKey,
      Seq(col("cases").asc, col("deaths").asc), sink.toString)
    val viaParquet = spark.read.parquet(sink.toString)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("date").cast("string"), col("state"), col("fips"),
        col("cases"), col("deaths"))
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(canon(viaJdbc) == canon(viaParquet))
    assert(viaJdbc.count() == 3) // 4 rows - 1 in-feed key dup

    // rerun: every key already present (incl. the NULL-fips row — the
    // null-safe match must treat NULL = NULL) → zero new rows
    JdbcSink.upsertJdbc(cleaned, url, "states", Ingest.statesKey)
    assert(spark.read.jdbc(url, "states", new java.util.Properties)
      .count() == 3)

    // incremental batch: one conflicting key (existing row wins — the
    // stored cases=904 survives), one new key
    import spark.implicits._
    val batch2 = Seq(
      ("2020-03-15", "Washington", Some(53), 777L, 7L),
      ("2020-03-17", "Washington", Some(53), 1100L, 55L))
      .toDF("date", "state", "fips", "cases", "deaths")
      .select(col("date").cast("date"), col("state"), col("fips"),
        col("cases"), col("deaths"))
    JdbcSink.upsertJdbc(batch2, url, "states", Ingest.statesKey)
    val after = spark.read.jdbc(url, "states", new java.util.Properties)
    assert(after.count() == 4)
    assert(after.filter(col("cases") === 904).count() == 1)
    assert(after.filter(col("cases") === 777).count() == 0)
  }

  test("writeJdbc appends via Spark's batched writer and creates the table") {
    val src = fixtureCsv()
    val cleaned = dedupedStates(src)
    JdbcSink.writeJdbc(cleaned, url, "states_plain", batchSize = 2)
    val back = spark.read.jdbc(url, "states_plain", new java.util.Properties)
    assert(back.count() == 3)
    assert(back.columns.map(_.toLowerCase).toSet ==
      Set("date", "state", "fips", "cases", "deaths"))
  }

  test("JDBC read-back pushes filters and prunes columns into the database") {
    // the S4 source direction: a Spark read over the JDBC relation must
    // ship the predicate and projection to the database (the JDBC twin
    // of parquet's PushedFilters) — at scale the DB evaluates the WHERE,
    // not the cluster after a full-table fetch
    val src = fixtureCsv()
    JdbcSink.writeJdbc(dedupedStates(src), url, "states_push", batchSize = 2)
    val df = spark.read.jdbc(url, "states_push", new java.util.Properties)
      .filter(col("cases") > 900L)
      .select(col("state"), col("cases"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("cases"),
      s"filter not pushed to JDBC:\n$p")
    // only the two selected columns (plus the filter column) reach the
    // relation — no SELECT *
    assert(!p.toLowerCase.contains("deaths"), s"column pruning lost:\n$p")
    assert(df.collect().map(_.getLong(1)).sorted.sameElements(
      Array(904L, 1000L)))
  }
}
