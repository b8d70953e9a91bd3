package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import ops.{Ingest, JdbcSink, Streaming}

/** The end-to-end NYT job (SURVEY.md §2.11 O1) — one command that runs the
  * reference's ENTIRE pipeline with bug-fixed semantics: the two-feed
  * counties-then-states batch job
  * (/root/reference/src/main/kotlin/covid19/nytimes/processor/
  * NytimesBatchProcessorApplication.kt:70-74 runs countiesStep then
  * statesStep) over CSV drop directories into a date-partitioned parquet
  * sink, incrementally (the reference's every-15-minutes cron,
  * deploy/deploy.sh:29, becomes one `main` invocation per firing), with an
  * optional JDBC upsert mirror of the reference's actual Postgres sink.
  *
  * Usage: `runMain graft.NytJob <srcRoot> <sinkRoot> <checkpointRoot>
  * [jdbcUrl]` where `srcRoot/counties/` and `srcRoot/states/` hold the
  * feed CSVs (new files accumulate between firings; the checkpoint skips
  * files already ingested — the reference re-downloads and re-inserts the
  * full feed every firing, we ingest each file once).
  *
  * Each firing is O(new data): the file-source checkpoint skips seen
  * files, and the sink merge rewrites only the date partitions present in
  * the new batch (Streaming.ingestAvailableNow) — at years of history and
  * a 15-minute cadence the job stays constant-size. The optional JDBC
  * mirror upserts ONLY the same touched partitions, read back from the
  * freshly merged sink (ON CONFLICT DO NOTHING parity via
  * JdbcSink.upsertJdbc).
  *
  * Deliberate fixes vs the reference (SURVEY.md §1.6): correct date
  * parsing (no month off-by-one), true NULL fips (no -1 sentinel),
  * deterministic conflict winner (total-order tiebreak).
  */
object NytJob {

  /** Deterministic DO-NOTHING winner: lowest (cases, deaths) —
    * a total order over the non-key columns. */
  private val tiebreak = Seq(col("cases").asc, col("deaths").asc)

  final case class Feed(name: String, schema: org.apache.spark.sql.types.StructType,
                        keys: Seq[String], jdbcTable: String, ddl: String)

  /** The two NYT feeds, in the reference's execution order (.kt:70-74:
    * counties first, then states). DDL mirrors schema.sql minus
    * Postgres-isms; fips/cases/deaths nullable (P3 null preservation). */
  val feeds: Seq[Feed] = Seq(
    Feed("counties", Ingest.countiesSchema, Ingest.countiesKey, "counties",
      """CREATE TABLE counties (
        |  date DATE NOT NULL,
        |  county VARCHAR(100) NOT NULL,
        |  state VARCHAR(100) NOT NULL,
        |  fips INTEGER,
        |  cases BIGINT,
        |  deaths BIGINT)""".stripMargin),
    Feed("states", Ingest.statesSchema, Ingest.statesKey, "states",
      """CREATE TABLE states (
        |  date DATE NOT NULL,
        |  state VARCHAR(100) NOT NULL,
        |  fips INTEGER,
        |  cases BIGINT,
        |  deaths BIGINT)""".stripMargin))

  /** One "cron firing": incremental-ingest every feed, then mirror the
    * feeds' current sinks to JDBC if a URL is given. Returns after the
    * backlog drains. */
  def runOnce(spark: SparkSession, srcRoot: String, sinkRoot: String,
              checkpointRoot: String, jdbcUrl: Option[String] = None): Unit = {
    feeds.foreach { f =>
      val touched = Streaming.ingestAvailableNow(spark,
        srcDir = s"$srcRoot/${f.name}",
        schema = f.schema, keys = f.keys, tiebreak = tiebreak,
        checkpoint = s"$checkpointRoot/${f.name}",
        sinkPath = s"$sinkRoot/${f.name}")
      jdbcUrl.filter(_ => touched.nonEmpty).foreach { url =>
        JdbcSink.initSchema(url, Seq(f.ddl))
        // mirror ONLY this firing's partitions to the DB (partition-pruned
        // read of the freshly merged sink) — upsert is idempotent, so rows
        // the DB already has are skipped (the reference's rerun semantics)
        // and the firing stays O(batch) end to end
        JdbcSink.upsertJdbc(
          spark.read.parquet(s"$sinkRoot/${f.name}")
            .filter(col("date").isin(touched: _*))
            .select(f.schema.fieldNames.map(col).toSeq: _*),
          url, f.jdbcTable, f.keys)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: NytJob <srcRoot> <sinkRoot> <checkpointRoot> [jdbcUrl]")
    val spark = SparkSession.builder()
      .appName("nyt-batch-job")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .getOrCreate()
    try runOnce(spark, args(0), args(1), args(2), args.lift(3))
    finally spark.stop()
  }
}
