package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Fx._

/** Event-time windowing surface (SURVEY.md §2.9).
  *
  * The reference has no streaming engine — it approximates incremental
  * processing with an external 15-minute cron re-run plus idempotent upsert
  * (every-15-min cron at /root/reference/deploy/deploy.sh:29;
  * ON CONFLICT DO NOTHING at NytimesBatchProcessorApplication.kt:140,177).
  * The Spark-native upgrade is first-class event-time windowing: the SAME
  * declarative transforms below run in batch (oracle-checkable against
  * DuckDB) and under Structured Streaming (`readStream` → transform →
  * `writeStream` with watermark — Spark's unified batch/stream API).
  *
  * Scale: windowed aggregation is a single hash shuffle on
  * (window, key); session windows shuffle on the session key then merge
  * locally — both spill-capable, both fine at 1000 executors. Watermarks
  * bound streaming state so it does not grow with input size.
  */
object Streaming {

  // ---- shared batch/stream transforms ---------------------------------

  /** Tumbling 10-minute windows per event_type (counts + quantized sum —
    * Fx element-wise quantization keeps the DuckDB hash-compare exact). */
  def tumblingAgg(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "600 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 10-minute windows every 5 minutes (each event in 2 windows). */
  def slidingAgg(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "600 seconds", "300 seconds"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Session windows per user with a 30-minute inactivity gap. Spark merges
    * an event into the open session iff it arrives within the gap INCLUSIVE
    * (an event at exactly last_ts + gap still merges — the per-event range
    * [ts, ts+gap] union rule); session end = last event + gap. */
  def sessionAgg(df: DataFrame): DataFrame =
    df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Streaming entry: the batch transform lifted onto an unbounded source
    * with a 1-hour watermark (late events beyond it are dropped; state for
    * closed windows is reclaimed — the bounded-state requirement at scale).
    * Works for any of the transforms above. */
  def withWatermark(stream: DataFrame)(transform: DataFrame => DataFrame)
      : DataFrame =
    transform(stream.withWatermark("ts", "1 hour"))

  /** First-class upgrade of the reference's "incremental by rerun + dedup"
    * loop (§2.9: cron at deploy.sh:29 + ON CONFLICT at .kt:140,177):
    * a checkpointed file-source stream over a CSV drop directory, with
    * `Trigger.AvailableNow` standing in for each cron firing. The
    * checkpoint makes re-runs INCREMENTAL (already-seen files are skipped
    * — what the reference re-downloads and re-inserts every 15 minutes),
    * and `foreachBatch` applies the same idempotent key-merge as the batch
    * path, so overlapping rows across files dedup exactly like ON
    * CONFLICT. Returns after the trigger drains (call once per "cron
    * firing"). At scale the sink merge is one hash shuffle on the key.
    */
  def ingestAvailableNow(spark: SparkSession, srcDir: String,
                         schema: org.apache.spark.sql.types.StructType,
                         keys: Seq[String], tiebreak: Seq[org.apache.spark.sql.Column],
                         checkpoint: String, sinkPath: String): Unit = {
    import org.apache.hadoop.fs.Path
    val q = spark.readStream
      .schema(schema)
      .option("header", "true")
      .option("dateFormat", "yyyy-MM-dd")
      // one micro-batch per firing: the sink merge below rewrites the full
      // sink, so splitting the backlog into B batches would pay that
      // rewrite B times (quadratic over the backlog)
      .option("maxFilesPerTrigger", Int.MaxValue.toString)
      .csv(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark2 = batch.sparkSession
        val conf = spark2.sparkContext.hadoopConfiguration
        val sink = new Path(sinkPath)
        val fs = sink.getFileSystem(conf) // sinkPath's OWN filesystem
        val backup = new Path(sinkPath + "__prev")
        // crash recovery: if a previous swap died between the two renames,
        // the data lives at backup and sink is absent
        if (!fs.exists(sink) && fs.exists(backup) &&
            !fs.rename(backup, sink))
          sys.error(s"cannot restore $backup to $sink")
        // absent sink (first run) → empty; any OTHER read failure
        // (corruption, permissions) must propagate, not masquerade as
        // an empty sink and truncate history
        val existing =
          if (fs.exists(sink)) spark2.read.parquet(sinkPath)
          else spark2.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), batch.schema)
        val merged = Ingest.appendIdempotent(existing, batch, keys, tiebreak)
        // write-then-swap: parquet can't overwrite its own input in place.
        // The swap is two renames with a backup in between — not atomic,
        // but every intermediate state is recoverable (see above).
        val staging = new Path(sinkPath + "__staging")
        fs.delete(staging, true)
        merged.write.mode("overwrite").parquet(staging.toString)
        fs.delete(backup, true)
        if (fs.exists(sink) && !fs.rename(sink, backup))
          sys.error(s"cannot move $sink aside to $backup")
        if (!fs.rename(staging, sink))
          sys.error(s"cannot publish $staging to $sink")
        fs.delete(backup, true)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Stream-stream inner join (§2.9): views joined to the clicks that
    * follow them within 30 minutes, per user. Both sides carry watermarks
    * and the join condition bounds event-time distance, so Spark can
    * reclaim join state for rows past the watermark — the REQUIREMENT for
    * an unbounded two-stream join to run with bounded memory. The same
    * function works on batch DataFrames (the unified API); the spec
    * cross-checks streaming output against the batch result. */
  def viewClickJoin(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val c = clicks
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    v.join(c, col("user_id") === col("c_user")
        && col("click_ts") >= col("view_ts")
        && col("click_ts") <= col("view_ts") + expr("interval 30 minutes"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Custom stateful processing (§2.9 "stateful ops"): per-user running
    * aggregates via `mapGroupsWithState` — the escape hatch when windowed
    * aggregation can't express the state machine. State is per-key and
    * partitioned by the grouping key, so it scales horizontally; pair with
    * a watermark + timeout in production so state is reclaimed. Kept
    * deliberately small: a running (count, sum) per user emitted on every
    * update. */
  def statefulUserTotals(spark: SparkSession,
                         events: org.apache.spark.sql.Dataset[
                           org.apache.spark.sql.Row],
                         idleTimeout: Option[String] = Some("1 hour"))
      : DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    // With a timeout (the default), a user idle past it has its state
    // REMOVED and a final row emitted — without one, state grows linearly
    // with distinct keys forever (unacceptable on an unbounded stream;
    // None is for deterministic batch-style tests only).
    val timeoutConf = idleTimeout.map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      // state holds (count, sum in integer cents) — the same element-wise
      // quantization as Fx.toUnits, so the running sum is independent of
      // arrival order (raw double accumulation would drift in the low
      // bits between runs)
      .mapGroupsWithState[(Long, Long), (Long, Long, Double)](timeoutConf) {
        case (userId, rows, state) =>
          if (state.hasTimedOut) {
            val (n, u) = state.get
            state.remove()
            (userId, n, u / 100.0)
          } else {
            val (prevN, prevUnits) = state.getOption.getOrElse((0L, 0L))
            var n = prevN
            var u = prevUnits
            rows.foreach { r =>
              n += 1
              u += math.floor(r._2 * 100 + 0.5).toLong
            }
            state.update((n, u))
            idleTimeout.foreach(state.setTimeoutDuration)
            (userId, n, u / 100.0)
          }
      }
      .toDF("user_id", "n_events", "sum_value")
  }

  // ---- oracle-checked batch queries ------------------------------------

  def q22Tumbling(s: SparkSession, d: String): DataFrame =
    tumblingAgg(Tables.events(s, d))
      .orderBy(col("w_start"), col("event_type"))

  // Window start alignment: Spark tumbling windows align to the epoch, so
  // start = floor(epoch_us / 600e6) * 600e6 — stated explicitly in the SQL
  // rather than relying on DuckDB time_bucket origin conventions.
  val q22Sql: String = s"""
    SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000) AS w_start,
      event_type, COUNT(*) AS n, ${sqlMoneySum("value")} AS sum_value
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2"""

  def q23Sliding(s: SparkSession, d: String): DataFrame =
    slidingAgg(Tables.events(s, d))
      .orderBy(col("w_start"), col("event_type"))

  // Sliding(duration=600s, slide=300s): event at t belongs to starts
  // {floor(t/300)*300, floor(t/300)*300 - 300} — exactly two windows.
  val q23Sql: String = """
    SELECT make_timestamp((epoch_us(ts) // 300000000) * 300000000
                          - k * 300000000) AS w_start,
      event_type, COUNT(*) AS n
    FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) shifts
    GROUP BY 1, 2 ORDER BY 1, 2"""

  def q24Session(s: SparkSession, d: String): DataFrame =
    sessionAgg(Tables.events(s, d))
      .orderBy(col("user_id"), col("session_start"))

  // Gaps-and-islands (SURVEY.md §7.3.5): new session when the gap to the
  // previous event is STRICTLY greater than 30 min (Spark merges at the
  // exactly-gap boundary); session_end = last event + gap.
  val q24Sql: String = s"""
    WITH flagged AS (
      SELECT user_id, ts, value,
        CASE WHEN LAG(ts) OVER w IS NULL
               OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
      SELECT user_id, ts, value,
        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged)
    SELECT user_id, MIN(ts) AS session_start,
      MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      COUNT(*) AS n_events, ${sqlMoneySum("value")} AS sum_value
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_tumbling_window" -> q22Tumbling _,
    "q23_sliding_window"  -> q23Sliding _,
    "q24_session_window"  -> q24Session _)

  val oracles: Map[String, String] = Map(
    "q22_tumbling_window" -> q22Sql,
    "q23_sliding_window"  -> q23Sql,
    "q24_session_window"  -> q24Sql)
}
