package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Fx._

/** SQL-entry-point queries: the same engine driven through `spark.sql`
  * over registered views (`Tables.registerAll`) — the direct analog of
  * the SQL workload the reference's Postgres tables serve (SURVEY.md §0).
  * Catalyst plans SQL text and DataFrame code identically, so these share
  * every §4 property (pushdown, broadcast, partial aggregation); what
  * they add is coverage of SQL-only surface: correlated scalar
  * subqueries, INTERSECT/EXCEPT ALL, GROUPING SETS.
  */
object SqlOps {

  private def sql(s: SparkSession, d: String, text: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(text)
  }

  // ---- q48: correlated scalar subquery (small-quantity outliers) -------
  // Lineitems below 1/5 of their part's average quantity. The threshold
  // compares in integer space (qu * 5 * n < sum_qu) — no division, no
  // float boundary — and Catalyst decorrelates the subquery into an
  // aggregate + join (§4.2), which is exactly the hand-written plan.
  private val q48Text: String = s"""
    SELECT l_partkey, l_orderkey, l_linenumber, l_quantity
    FROM lineitem o
    WHERE ${sqlUnits("l_quantity", 0)} * 5 *
        (SELECT COUNT(*) FROM lineitem i WHERE i.l_partkey = o.l_partkey)
      < (SELECT SUM(${sqlUnits("l_quantity", 0)}) FROM lineitem i
         WHERE i.l_partkey = o.l_partkey)
    ORDER BY l_partkey, l_orderkey, l_linenumber, l_quantity"""

  def q48ScalarSubquery(s: SparkSession, d: String): DataFrame =
    sql(s, d, q48Text)

  val q48Sql: String = q48Text

  // ---- q49: INTERSECT ALL / EXCEPT ALL (§2.7 multiset variants) --------
  // Multiset semantics preserve duplicate counts: a (nationkey, segment)
  // combination appearing 3× among customers and 1× among a filtered
  // subset keeps 1 copy under INTERSECT ALL, 2 under EXCEPT ALL.
  private val q49Text: String = """
    SELECT 'inter' AS op, c_nationkey, c_mktsegment FROM (
      SELECT c_nationkey, c_mktsegment FROM customer
      INTERSECT ALL
      SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 0)
    UNION ALL
    SELECT 'except' AS op, c_nationkey, c_mktsegment FROM (
      SELECT c_nationkey, c_mktsegment FROM customer
      EXCEPT ALL
      SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 0)
    ORDER BY op, c_nationkey, c_mktsegment"""

  def q49SetAll(s: SparkSession, d: String): DataFrame =
    sql(s, d, q49Text)

  val q49Sql: String = q49Text

  // ---- q50: GROUPING SETS (A3 — the general form of rollup/cube) -------
  // Two deviations from the naive `GROUP BY GROUPING SETS ((a),(b),())`,
  // both with measured reasons:
  //  1. The sets run over a checkpointed PRE-AGGREGATED (a, b) frame
  //     (the q09/q10 cascade): Spark plans grouping sets as an Expand
  //     that feeds every input row through the aggregate once per set,
  //     and a UNION's branches each rescan the corpus (measured: zero
  //     exchange reuse under AQE) — the checkpoint makes it ONE corpus
  //     scan, with the Expand and every re-aggregate running over the
  //     ~|priorities|+|statuses| cached rows. GROUPING SETS + GROUPING()
  //     still go through Catalyst, on the view.
  //  2. The () grand set rides a UNION'd global aggregate: Spark's
  //     Expand-based grouping sets emit ZERO rows on an empty source,
  //     while the SQL standard (and DuckDB's GROUPING SETS, which the
  //     oracle keeps) emits the grand row with COUNT 0 — a global
  //     aggregate restores that for free.
  private val q50Text: String = s"""
    SELECT o_orderpriority, o_orderstatus,
      CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
        AS BIGINT) AS gid,
      COUNT(*) AS n, ${sqlMoneySum("o_totalprice")} AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST"""

  def q50GroupingSets(s: SparkSession, d: String): DataFrame = {
    val g = graft.Tables.orders(s, d)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(graft.ops.Fx.toUnits(col("o_totalprice"))).as("u"))
      .localCheckpoint()
    g.createOrReplaceTempView("graft_q50_groups")
    s.sql("""
      SELECT o_orderpriority, o_orderstatus,
        CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
          AS BIGINT) AS gid,
        CAST(SUM(n) AS BIGINT) AS n,
        CAST(SUM(u) AS BIGINT) / 1e2 AS sum_price
      FROM graft_q50_groups
      GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
      UNION ALL
      SELECT NULL, NULL, CAST(3 AS BIGINT),
        COALESCE(CAST(SUM(n) AS BIGINT), 0), CAST(SUM(u) AS BIGINT) / 1e2
      FROM graft_q50_groups
      ORDER BY gid, o_orderpriority NULLS FIRST,
        o_orderstatus NULLS FIRST""")
  }

  val q50Sql: String = q50Text

  // ---- q51: pivot (wide aggregation; explicit value list so the plan
  //      needs no distinct-values pre-scan — mandatory at 100 TB) --------
  def q51Pivot(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("o_orderpriority"))
  }

  // oracle = the CASE-based pivot both engines agree on exactly
  val q51Sql: String = """
    SELECT o_orderpriority,
      COUNT(*) FILTER (o_orderstatus = 'F') AS F,
      COUNT(*) FILTER (o_orderstatus = 'O') AS O,
      COUNT(*) FILTER (o_orderstatus = 'P') AS P
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---- q52: unpivot / melt (wide → long) -------------------------------
  def q52Unpivot(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_acctbal"),
        col("c_nationkey").cast("double").as("c_nationkey"))
      .unpivot(Array(col("c_custkey")),
        Array(col("c_acctbal"), col("c_nationkey")),
        "metric", "value")
      .orderBy(col("c_custkey"), col("metric"))
  }

  val q52Sql: String = """
    SELECT c_custkey, 'c_acctbal' AS metric, c_acctbal AS value
    FROM customer
    UNION ALL
    SELECT c_custkey, 'c_nationkey', CAST(c_nationkey AS DOUBLE)
    FROM customer
    ORDER BY c_custkey, metric"""

  // ---- q53/q54: deterministic sampling (training-data subsampling) -----
  // Hash-gated bernoulli: keep a row iff H(seed:id) % 1000 < rate‰. Unlike
  // `df.sample(seed)` — whose per-partition RNG ties the sampled SET to
  // the scan's split layout (core count, file sizes) — the hash gate is a
  // pure row property: identical on any partitioning, any engine, any
  // rerun. That makes these fully oracle-checkable AND the membership
  // reproducible at 100 TB (the property that matters when a sample
  // defines a training subset). The coin flip still rides the scan: no
  // shuffle, no collect.
  def q53Sample(s: SparkSession, d: String): DataFrame = {
    graft.expressions.Hash60.register(s)
    Tables.documents(s, d)
      .filter(expr("h60(concat('smp:', cast(doc_id as string))) % 1000 < 100"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val q53Sql: String = """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE CAST('0x' || substring(md5('smp:' || CAST(doc_id AS VARCHAR)),
      1, 15) AS BIGINT) % 1000 < 100
    ORDER BY doc_id"""

  // per-stratum rates in permille (class rebalancing)
  def q54StratifiedSample(s: SparkSession, d: String): DataFrame = {
    graft.expressions.Hash60.register(s)
    val rate = expr("CASE lang WHEN 'en' THEN 500 WHEN 'zh' THEN 100 " +
      "ELSE 300 END")
    Tables.documents(s, d)
      .filter(expr("h60(concat('smp:', cast(doc_id as string))) % 1000")
        < rate)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy(col("lang"))
  }

  val q54Sql: String = """
    SELECT lang, COUNT(*) AS n_sampled
    FROM documents
    WHERE CAST('0x' || substring(md5('smp:' || CAST(doc_id AS VARCHAR)),
        1, 15) AS BIGINT) % 1000
      < CASE lang WHEN 'en' THEN 500 WHEN 'zh' THEN 100 ELSE 300 END
    GROUP BY lang ORDER BY lang"""

  // ---- q55: null semantics (P3 as a first-class query) -----------------
  // The corpus has no nulls, so NULLIF synthesizes them; the query then
  // exercises null-safe equality (<=> / IS NOT DISTINCT FROM), COALESCE,
  // and COUNT's null-skipping — the semantics knot SURVEY.md §7.3.3
  // flags (Postgres UNIQUE treats nulls as distinct; engines must agree
  // on every null-handling branch here).
  private val q55Text: String = """
    SELECT o_orderpriority,
      COUNT(st) AS n_nonnull,
      COUNT(*) - COUNT(st) AS n_null,
      CAST(SUM(CASE WHEN st IS NOT DISTINCT FROM NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe,
      COALESCE(MIN(st), '(none)') AS min_or_tag
    FROM (SELECT o_orderpriority, NULLIF(o_orderstatus, 'P') AS st
          FROM orders)
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  def q55NullSemantics(s: SparkSession, d: String): DataFrame =
    sql(s, d, q55Text)

  val q55Sql: String = q55Text

  // ---- q91: deterministic train/val/test split -------------------------
  // The dataset-versioning primitive every training run needs: a 90/5/5
  // split that is a pure function of the doc_id (salted h60 gate, the
  // q53/q54 membership machinery) — stable across reruns, partitions,
  // and cluster sizes, with no shuffle beyond the output aggregate; a
  // doc can never migrate between splits when the corpus grows (its
  // gate value never changes). Per (source, split) counts + id checksum
  // pin the exact membership, not just the sizes.
  /** THE 90/5/5 split gate as a single expression over any id column —
    * shared by q91 and the split-audit family (q162 leakage, q163
    * cluster split) so the rule cannot silently diverge between the
    * split that ships and the audits that police it. CASE-simple on
    * `g div 5` (0-17 train, 18 val, 19 test ⟺ g<90 / 90-94 / 95-99)
    * evaluates the salted hash ONCE per row; caller must have
    * registered Hash60. */
  private[ops] def splitOf(idCol: String): org.apache.spark.sql.Column =
    expr(
      s"CASE (h60(concat('split:', cast($idCol as string))) % 100) div 5" +
        " WHEN 18 THEN 'val' WHEN 19 THEN 'test' ELSE 'train' END")

  def q91Split(s: SparkSession, d: String): DataFrame = {
    graft.expressions.Hash60.register(s)
    Tables.documents(s, d)
      .withColumn("split", splitOf("doc_id"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("source"), col("split"))
  }

  val q91Sql: String = """
    SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM (
      SELECT source, doc_id,
        CASE WHEN g < 90 THEN 'train' WHEN g < 95 THEN 'val'
          ELSE 'test' END AS split
      FROM (
        SELECT source, doc_id,
          CAST('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)),
            1, 15) AS BIGINT) % 100 AS g
        FROM documents))
    GROUP BY 1, 2 ORDER BY 1, 2"""

  // ---- q192: recursive CTE — session stitching as transitive closure ---
  // The SQL-only surface Spark gained in 4.x: WITH RECURSIVE. The demo
  // is real, not a toy series: sessionization expressed as closure over
  // the predecessor graph — consecutive same-user events ≤30 min apart
  // are edges, session roots are the gap-starts, and the recursion
  // propagates each root to every event it transitively reaches. The
  // window-based q180 computes the same sessions in one pass (and is
  // the right plan for a plain gap rule); the recursive form is the
  // shape that generalizes where running-sum tricks cannot follow
  // (graph-defined sessions, org rollups, BOM explosions). Gap compare
  // in exact integer micros (unix_micros / epoch_us — no float epoch).
  //
  // Scale: recursion DEPTH is the longest session (bounded business
  // quantity), but recursion ROWS are every event the closure touches —
  // and Spark's cteRecursionRowLimit (1M default) is a corpus guard
  // that correctly refuses a corpus-sized recursion (the full sf1ish
  // drive proved it: 1M events tripped the limit). So the recursive
  // form runs on a FIXED eval cohort (user_id < 200 — the q35/q183
  // bounded-prefix discipline, ~13k events at bench SF regardless of
  // corpus size); corpus-wide sessionization is q180's single-pass
  // window, which is the plan a gap rule deserves. The level limit is
  // raised so a bot-length session fails loudly at the documented
  // bound instead of Spark's default 100.
  private def q192Text(micros: String => String): String = s"""
    WITH RECURSIVE
    ord AS (
      SELECT user_id, event_id,
        LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev_id,
        CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               IS NULL
             OR ${micros("ts")} - ${micros(
      "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)")}
               > 1800000000
          THEN 1 ELSE 0 END AS is_start
      FROM events WHERE user_id < 200),
    edges AS (
      SELECT prev_id AS src, event_id AS dst FROM ord WHERE is_start = 0),
    r(user_id, node, root) AS (
      SELECT user_id, event_id, event_id FROM ord WHERE is_start = 1
      UNION ALL
      SELECT r.user_id, e.dst, r.root FROM r JOIN edges e ON e.src = r.node),
    sess AS (
      SELECT user_id, root AS session_id, COUNT(*) AS n_events
      FROM r GROUP BY 1, 2)
    SELECT CAST(n_events AS BIGINT) AS session_len,
      CAST(COUNT(*) AS BIGINT) AS n_sessions,
      CAST(SUM(session_id) AS BIGINT) AS id_checksum
    FROM sess GROUP BY 1 ORDER BY 1"""

  def q192RecursiveSessions(s: SparkSession, d: String): DataFrame = {
    // The eval-cohort recursion legitimately needs a deeper level limit
    // than Spark's default, but the raised limit must not leak into the
    // shared session (it weakens the runaway-recursion guard for every
    // later query). Save/restore around the eager materialization; the
    // returned frame is a localCheckpoint so later re-executions of it
    // don't depend on the restored (lower) limit either.
    val key = "spark.sql.cteRecursionLevelLimit"
    val prior = s.conf.getOption(key)
    s.conf.set(key, "10000")
    try sql(s, d, q192Text(c => s"unix_micros($c)")).localCheckpoint()
    finally prior match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  val q192Sql: String = q192Text(c => s"epoch_us($c)")

  // ---- q234: Kaplan–Meier user-retention survival curve -----------------
  // The churn statistician's q63: per lifetime week, the Kaplan–Meier
  // survival estimate S(w) = Π_{w' ≤ w} (n_at_risk − churned)/n_at_risk
  // with right-censoring — users whose last event falls within 28 days
  // of the corpus max are "still alive" (censored), so they leave the
  // at-risk set without counting as churn; ignoring censoring is the
  // classic retention-curve bias. The KM product is inherently
  // sequential, so like q192 it rides WITH RECURSIVE — but over the
  // WEEK GRID, not events: depth = distinct lifetime weeks, capped at
  // 52 by the horizon clamp, far under the session's recursion limit
  // (no config raise needed). Survival propagates as staged integer
  // floor-div ppm — the per-step floor compounds identically in both
  // engines. At-risk counts come from one cumulative window; the corpus
  // collapses to the per-user (first, last) frame in one shuffle.
  private val WeekUs  = 604800000000L        // 7 d in microseconds
  private val CensorUs = 4L * WeekUs         // 28-day censoring horizon
  private def q234Text(us: String => String, fd: String): String = s"""
    WITH RECURSIVE life AS (
      SELECT user_id, MIN(${us("ts")}) AS t0, MAX(${us("ts")}) AS t1
      FROM events GROUP BY user_id),
    mx AS (SELECT MAX(t1) AS tmax FROM life),
    u AS (
      SELECT user_id,
        LEAST((t1 - t0) $fd $WeekUs, 52) AS w,
        CASE WHEN t1 >= tmax - $CensorUs THEN 1 ELSE 0 END AS censored
      FROM life CROSS JOIN mx),
    ev AS (
      SELECT w, CAST(SUM(1 - censored) AS BIGINT) AS d,
        CAST(SUM(censored) AS BIGINT) AS c
      FROM u GROUP BY w),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM u),
    grid AS (
      SELECT w, d, c,
        CAST(ROW_NUMBER() OVER (ORDER BY w) AS BIGINT) AS i,
        CAST(n0 - SUM(d + c) OVER (ORDER BY w ROWS UNBOUNDED PRECEDING)
          + d + c AS BIGINT) AS n_at_risk
      FROM ev CROSS JOIN tot),
    r(i, w, d, c, n_at_risk, surv_ppm) AS (
      SELECT i, w, d, c, n_at_risk,
        CAST((n_at_risk - d) * 1000000 $fd n_at_risk AS BIGINT)
      FROM grid WHERE i = 1
      UNION ALL
      SELECT g.i, g.w, g.d, g.c, g.n_at_risk,
        CAST(r.surv_ppm * (g.n_at_risk - g.d) $fd g.n_at_risk AS BIGINT)
      FROM r JOIN grid g ON g.i = r.i + 1)
    SELECT CAST(w AS BIGINT) AS week, n_at_risk,
      d AS n_churned, c AS n_censored, surv_ppm
    FROM r ORDER BY week"""

  def q234SurvivalCurve(s: SparkSession, d: String): DataFrame =
    sql(s, d, q234Text(c => s"unix_micros($c)", "div"))

  val q234Sql: String = q234Text(c => s"epoch_us($c)", "//")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q234_survival_curve" -> q234SurvivalCurve _,
    "q192_recursive_sessions" -> q192RecursiveSessions _,
    "q48_scalar_subquery" -> q48ScalarSubquery _,
    "q49_set_all"         -> q49SetAll _,
    "q50_grouping_sets"   -> q50GroupingSets _,
    "q51_pivot"           -> q51Pivot _,
    "q52_unpivot"         -> q52Unpivot _,
    "q53_sample"          -> q53Sample _,
    "q54_stratified_sample" -> q54StratifiedSample _,
    "q55_null_semantics"  -> q55NullSemantics _,
    "q91_split"           -> q91Split _)

  val oracles: Map[String, String] = Map(
    "q234_survival_curve" -> q234Sql,
    "q192_recursive_sessions" -> q192Sql,
    "q48_scalar_subquery" -> q48Sql,
    "q49_set_all"         -> q49Sql,
    "q50_grouping_sets"   -> q50Sql,
    "q51_pivot"           -> q51Sql,
    "q52_unpivot"         -> q52Sql,
    "q53_sample"          -> q53Sql,
    "q54_stratified_sample" -> q54Sql,
    "q55_null_semantics"  -> q55Sql,
    "q91_split"           -> q91Sql)
}
