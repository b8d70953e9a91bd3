package graft.ops

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** JDBC sink surface (SURVEY.md §2.1 S4) — the reference's ONLY sink is a
  * batched Postgres insert with conflict-skip
  * (`JdbcBatchItemWriter` + `INSERT … ON CONFLICT (…) DO NOTHING`,
  * /root/reference/src/main/kotlin/covid19/nytimes/processor/
  * NytimesBatchProcessorApplication.kt:90-96, SQL at :138-141,175-178).
  *
  * Two Spark-first mappings, both exercised against embedded Derby
  * (`/opt/spark/jars/derby-*.jar` — in-process, offline-testable):
  *
  *  1. [[writeJdbc]] — the declarative path: `df.write.jdbc` with
  *     `batchsize`, Spark's own partition-parallel batched writer (each
  *     task opens one connection and streams its partition in batches —
  *     the reference's chunk(1000) transaction loop, .kt:88, distributed).
  *     Append-only: no conflict handling, for first loads and
  *     insert-only tables.
  *
  *  2. [[upsertJdbc]] — the reference's actual semantics: idempotent
  *     keyed insert-if-absent. Spark's JDBC writer has no upsert mode, so
  *     this is the documented `foreachPartition` escape hatch: each
  *     partition binds one prepared `INSERT … SELECT … WHERE NOT EXISTS`
  *     (ANSI; works on Derby, Postgres, anything) and executes it in
  *     JDBC batches inside a transaction.
  *
  * Scale: both paths ship N executor-side connections (one per
  * partition) writing concurrently — the DB, not Spark, is the
  * bottleneck; `repartition(k)` the frame first to match the DB's
  * connection budget. Nothing collects to the driver.
  *
  * Concurrency note for upsert: `NOT EXISTS` sees committed rows, so
  * re-runs and cross-run overlaps dedup exactly like ON CONFLICT DO
  * NOTHING. Within ONE run, callers must dedup keys first
  * ([[Ingest.dedupKeepFirst]]) — after that each key lives in exactly one
  * task, so concurrent partitions never race on a key (the same contract
  * the reference meets by deduping per chunk, .kt:133-141).
  */
object JdbcSink {

  /** S4 declarative path: Spark's batched JDBC writer. `batchSize` maps
    * to the driver-level `addBatch`/`executeBatch` chunking (the
    * reference's chunk(1000)); `numPartitions` caps concurrent
    * connections. Creates the table (from the frame's schema via the
    * JDBC dialect) if absent; appends otherwise. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                batchSize: Int = 1000,
                numPartitions: Option[Int] = None): Unit = {
    val base = numPartitions.map(df.coalesce).getOrElse(df)
    base.write.mode("append")
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, new java.util.Properties)
  }

  /** Spark type → java.sql.Types for null binding ([[upsertJdbc]]). */
  private def sqlType(dt: DataType): Int = dt match {
    case StringType    => java.sql.Types.VARCHAR
    case IntegerType   => java.sql.Types.INTEGER
    case LongType      => java.sql.Types.BIGINT
    case DoubleType    => java.sql.Types.DOUBLE
    case FloatType     => java.sql.Types.FLOAT
    case DateType      => java.sql.Types.DATE
    case TimestampType => java.sql.Types.TIMESTAMP
    case BooleanType   => java.sql.Types.BOOLEAN
    case _: DecimalType => java.sql.Types.DECIMAL
    case other => sys.error(s"upsertJdbc: unsupported column type $other")
  }

  /** Spark type → ANSI type name, for CASTing the VALUES parameters
    * (Derby — like DB2 — rejects untyped `?` columns in a table
    * constructor: every placeholder needs a declared type). */
  private def ansiType(dt: DataType): String = dt match {
    case StringType    => "VARCHAR(4000)"
    case IntegerType   => "INTEGER"
    case LongType      => "BIGINT"
    case DoubleType    => "DOUBLE"
    case FloatType     => "FLOAT"
    case DateType      => "DATE"
    case TimestampType => "TIMESTAMP"
    case BooleanType   => "BOOLEAN"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other => sys.error(s"upsertJdbc: unsupported column type $other")
  }

  /** A5+S4: idempotent keyed insert — `INSERT … ON CONFLICT DO NOTHING`
    * re-expressed as ANSI `INSERT … SELECT … FROM (VALUES …) WHERE NOT
    * EXISTS`, batched per partition. Null-safe key match (a NULL fips
    * matches a NULL fips — the collision the reference engineered with
    * its `-1` sentinel, .kt:133,171, without corrupting the value).
    * Re-running the same frame is a no-op; existing rows always win. */
  def upsertJdbc(df: DataFrame, url: String, table: String,
                 keys: Seq[String], batchSize: Int = 1000): Unit = {
    val schema = df.schema
    val cols = schema.fieldNames.toSeq
    require(keys.forall(cols.contains), s"keys $keys must be in $cols")
    val colList = cols.mkString(", ")
    val placeholders = schema.fields
      .map(f => s"CAST(? AS ${ansiType(f.dataType)})").mkString(", ")
    val keyMatch = keys.map(k =>
      s"(t.$k = s.$k OR (t.$k IS NULL AND s.$k IS NULL))").mkString(" AND ")
    val sql =
      s"""INSERT INTO $table ($colList)
         |SELECT $colList FROM (VALUES ($placeholders)) AS s($colList)
         |WHERE NOT EXISTS (SELECT 1 FROM $table t WHERE $keyMatch)""".stripMargin
    val types = schema.fields.map(f => sqlType(f.dataType))
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val stmt = conn.prepareStatement(sql)
          try {
            var pending = 0
            rows.foreach { r =>
              var i = 0
              while (i < types.length) {
                if (r.isNullAt(i)) stmt.setNull(i + 1, types(i))
                else stmt.setObject(i + 1, r.get(i))
                i += 1
              }
              stmt.addBatch()
              pending += 1
              if (pending >= batchSize) { stmt.executeBatch(); pending = 0 }
            }
            if (pending > 0) stmt.executeBatch()
            conn.commit()
          } catch {
            case e: Throwable => conn.rollback(); throw e
          } finally stmt.close()
        } finally conn.close()
      }
    }
  }

  /** S6 DDL surface: run schema-init statements (the reference's
    * `schema.sql` analog) over a plain JDBC connection. Statements that
    * fail because the object already exists are swallowed (Derby
    * SQLState X0Y32 / X0Y68), so init is idempotent like
    * `CREATE TABLE IF NOT EXISTS`. */
  def initSchema(url: String, statements: Seq[String]): Unit = {
    val conn: Connection = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try statements.foreach { ddl =>
        try st.executeUpdate(ddl)
        catch {
          case e: java.sql.SQLException
            if e.getSQLState == "X0Y32" || e.getSQLState == "X0Y68" => ()
        }
      } finally st.close()
    } finally conn.close()
  }
}
