package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import Fx._

/** Commerce / customer-behavior analytics over the orders + events tables —
  * the segmentation, association, attribution and robust-aggregation
  * surface a batch analytics engine serves on top of the reference's
  * cumulative fact tables (`NytimesBatchProcessorApplication.kt:146-188`
  * aggregates a per-key running measure; these are the downstream reads).
  *
  * Every statistic follows the repo-wide oracle-parity discipline: measures
  * quantized element-wise to exact integer units (Fx), ratios as staged
  * floor-div ppm on Decimal(38,0) ↔ DuckDB HUGEINT `//`, and any
  * double in the output produced by a single IEEE op on identical exact
  * integers in both engines. No float accumulations, no float logs.
  */
object CommerceOps {

  // ---- q195: RFM customer segmentation ---------------------------------
  // The classic recency/frequency/monetary quartile segmentation, built
  // scale-first: a global NTILE would sort every customer in ONE task
  // (the window has no partition key), so the quartile CUT POINTS come
  // from the bounded-domain histogram-percentile contract instead
  // (StatsOps.histPercentiles — the q56 machinery, exact and
  // interpolation-compatible with DuckDB quantile_cont), computed over a
  // 3-way melted (measure, value) frame so all three measures share ONE
  // scan of the per-customer aggregate. Scoring is then a map-side CASE
  // against 9 broadcast scalars and the output is the ≤4³-cell segment
  // grid — nothing after the per-customer groupBy shuffles more than
  // |customers| rows once.
  //
  // Units: recency in whole days behind the corpus max order date;
  // frequency in orders; monetary in TEN-dollar units (cents summed
  // exactly, then `div 1000`) so the histogram domain stays ≤ ~5·10⁵
  // distinct values — inside the 2^22 bounded-state contract even when
  // per-customer totals reach 10⁷ dollars (cent-granular cut points on
  // a quartile grid move no customer across a boundary worth caring
  // about; the score comparison is exact either way).
  //
  // Recency scores 4→1 with *small* (recent) best, frequency/monetary
  // 1→4 with large best — the standard RFM orientation.
  def q195RfmSegments(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("od"),
        toUnits(col("o_totalprice")).as("cents"))
      .groupBy(col("o_custkey"))
      .agg(max(col("od")).as("last_od"),
        count(lit(1)).as("f_n"),
        sum(col("cents")).as("m_cents"))
      .persist() // shared by the melt (cuts) AND the scoring pass below;
                 // caller-unpersist contract (SparkEntry scaladoc)
    val maxDate = cust.agg(max(col("last_od")).as("max_od"))
    val feats = cust.crossJoin(broadcast(maxDate))
      .withColumn("r_days", datediff(col("max_od"), col("last_od")).cast("long"))
      .withColumn("m_e1", expr("m_cents div 1000"))
    val melted = feats.select(explode(array(
      struct(lit("r").as("m"), col("r_days").as("v")),
      struct(lit("f").as("m"), col("f_n").as("v")),
      struct(lit("m").as("m"), col("m_e1").as("v")))).as("x"))
      .select(col("x.m").as("m"), col("x.v").as("v"))
    val cuts = StatsOps.histPercentiles(melted, "m", "v",
        Seq(0.25, 0.5, 0.75))
      .groupBy()
      .agg(
        max(when(col("m") === "r", element_at(col("ps"), 1))).as("r1"),
        max(when(col("m") === "r", element_at(col("ps"), 2))).as("r2"),
        max(when(col("m") === "r", element_at(col("ps"), 3))).as("r3"),
        max(when(col("m") === "f", element_at(col("ps"), 1))).as("f1"),
        max(when(col("m") === "f", element_at(col("ps"), 2))).as("f2"),
        max(when(col("m") === "f", element_at(col("ps"), 3))).as("f3"),
        max(when(col("m") === "m", element_at(col("ps"), 1))).as("m1"),
        max(when(col("m") === "m", element_at(col("ps"), 2))).as("m2"),
        max(when(col("m") === "m", element_at(col("ps"), 3))).as("m3"))
    def score(v: String, c1: String, c2: String, c3: String) =
      (lit(1) + when(col(v) > col(c1), 1).otherwise(0)
        + when(col(v) > col(c2), 1).otherwise(0)
        + when(col(v) > col(c3), 1).otherwise(0)).cast("int")
    feats.crossJoin(broadcast(cuts))
      .withColumn("r_score", (lit(5) - score("r_days", "r1", "r2", "r3")).cast("int"))
      .withColumn("f_score", score("f_n", "f1", "f2", "f3"))
      .withColumn("m_score", score("m_e1", "m1", "m2", "m3"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        (sum(col("m_cents")) / 100.0).as("sum_monetary"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  val q195Sql: String = s"""
    WITH cust AS (
      SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_od,
        CAST(COUNT(*) AS BIGINT) AS f_n,
        ${sqlUnitSum("o_totalprice")} AS m_cents
      FROM orders GROUP BY 1),
    feats AS (
      SELECT o_custkey, f_n, m_cents,
        CAST(((SELECT MAX(last_od) FROM cust) - last_od) AS BIGINT) AS r_days,
        m_cents // 1000 AS m_e1
      FROM cust),
    cuts AS (
      SELECT quantile_cont(r_days, [0.25, 0.5, 0.75]) AS rq,
        quantile_cont(f_n, [0.25, 0.5, 0.75]) AS fq,
        quantile_cont(m_e1, [0.25, 0.5, 0.75]) AS mq
      FROM feats),
    scored AS (
      SELECT
        CAST(5 - (1 + CASE WHEN r_days > rq[1] THEN 1 ELSE 0 END
                    + CASE WHEN r_days > rq[2] THEN 1 ELSE 0 END
                    + CASE WHEN r_days > rq[3] THEN 1 ELSE 0 END)
          AS INTEGER) AS r_score,
        CAST(1 + CASE WHEN f_n > fq[1] THEN 1 ELSE 0 END
               + CASE WHEN f_n > fq[2] THEN 1 ELSE 0 END
               + CASE WHEN f_n > fq[3] THEN 1 ELSE 0 END
          AS INTEGER) AS f_score,
        CAST(1 + CASE WHEN m_e1 > mq[1] THEN 1 ELSE 0 END
               + CASE WHEN m_e1 > mq[2] THEN 1 ELSE 0 END
               + CASE WHEN m_e1 > mq[3] THEN 1 ELSE 0 END
          AS INTEGER) AS m_score,
        m_cents
      FROM feats CROSS JOIN cuts)
    SELECT r_score, f_score, m_score,
      CAST(COUNT(*) AS BIGINT) AS n_customers,
      CAST(SUM(m_cents) AS BIGINT) / 100.0 AS sum_monetary
    FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  // ---- q196: market-basket pair rules (support / confidence / lift) ----
  // 2-itemset association mining over orders-as-baskets. The scalable
  // shape is NOT a lineitem self-join (a corpus-sized shuffle on BOTH
  // sides): one groupBy(orderkey) collects each basket's distinct part
  // list (baskets are small — bounded by order line count, ≤7 in TPC-H
  // shapes and capped by any real cart), pairs explode MAP-SIDE from the
  // sorted list (i<j gives each unordered pair once, canonically
  // ordered), and the pair count aggregates with map-side combine onto a
  // frame bounded by the frequent-pair space, not the corpus. Apriori
  // pruning first: an item below the item support floor cannot be in a
  // pair above it, so infrequent items leave before pair explosion —
  // on a skewed real catalog this is what bounds the blowup.
  //
  // Metrics in the q146 staged-floor-div ppm discipline on
  // Decimal(38,0): support_ppm = c_pair·10⁶ div N; confidence(a→b) =
  // c_pair·10⁶ div c_a; lift = confidence·N div c_b.
  //
  // Giant-basket cap (the q34 stop-bucket treatment, r13): the apriori
  // item floor bounds WHICH items enter a basket but not how many — one
  // clone-farm order holding hundreds of distinct high-support parts
  // grows C(n,2) (and C(n,3) in q275) in that single row, the same
  // adversarial mode the 30× clone stress exposed for q34/q154. Baskets
  // wider than the cap (distinct frequent items > PairBasketCap) are
  // DROPPED in both engines before pair enumeration — a 65+-distinct-
  // part order is a bot/reseller sweep, not co-purchase signal, and its
  // pairs would dominate every rule they touch. The dropped mass is not
  // silent: every output row carries the 1-row broadcast ledger
  // (capped_baskets, capped_item_slots). Per-basket pair mass is thus
  // bounded at C(64,2) = 2016 (C(32,3) = 4960 for q275's triples).
  private[graft] val PairMinSup = 2L
  private[graft] val PairBasketCap = 64
  private[graft] val TripleBasketCap = 32

  def q196BasketPairs(s: SparkSession, d: String): DataFrame = {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val supp = items.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("c_item"))
      .filter(col("c_item") >= PairMinSup) // apriori item floor
    val nOrders = items.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val baskets = items.join(supp, Seq("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_partkey"))).as("ps"))
      .filter(size(col("ps")) >= 2)
      .persist() // ledger + kept-basket explode both read it
    val ledger = baskets.filter(size(col("ps")) > PairBasketCap)
      .agg(count(lit(1)).as("capped_baskets"),
        coalesce(sum(size(col("ps")).cast("long")), lit(0L))
          .as("capped_item_slots"))
    val pairs = baskets.filter(size(col("ps")) <= PairBasketCap)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ps) - 2),
             i -> transform(sequence(i + 1, size(ps) - 1),
               j -> struct(ps[i] AS pa, ps[j] AS pb))))""")).as("p"))
      .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .agg(count(lit(1)).as("c_pair"))
      .filter(col("c_pair") >= PairMinSup)
    pairs
      .join(supp.select(col("l_partkey").as("pa"), col("c_item").as("c_a")),
        Seq("pa"))
      .join(supp.select(col("l_partkey").as("pb"), col("c_item").as("c_b")),
        Seq("pb"))
      .crossJoin(broadcast(nOrders))
      .crossJoin(broadcast(ledger))
      .withColumn("support_ppm",
        expr("cast(c_pair as decimal(38,0)) * 1000000 div n_orders"))
      .withColumn("conf_ppm",
        expr("cast(c_pair as decimal(38,0)) * 1000000 div c_a"))
      .withColumn("lift_ppm",
        expr("cast(cast(c_pair as decimal(38,0)) * 1000000 div c_a" +
          " as decimal(38,0)) * n_orders div c_b"))
      .select(col("pa"), col("pb"), col("c_pair"), col("c_a"), col("c_b"),
        col("support_ppm").cast("long").as("support_ppm"),
        col("conf_ppm").cast("long").as("conf_ppm"),
        col("lift_ppm").cast("long").as("lift_ppm"),
        col("capped_baskets"), col("capped_item_slots"))
      .orderBy(col("pa"), col("pb"))
  }

  val q196Sql: String = s"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    supp AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c_item
      FROM items GROUP BY 1 HAVING COUNT(*) >= $PairMinSup),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM items),
    fitems AS (
      SELECT l_orderkey, items.l_partkey AS p
      FROM items JOIN supp ON items.l_partkey = supp.l_partkey),
    widths AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS w
      FROM fitems GROUP BY 1 HAVING COUNT(*) >= 2),
    ledger AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS capped_baskets,
        CAST(COALESCE(SUM(w), 0) AS BIGINT) AS capped_item_slots
      FROM widths WHERE w > $PairBasketCap),
    kept AS (
      SELECT fitems.* FROM fitems
      JOIN widths ON widths.l_orderkey = fitems.l_orderkey
      WHERE widths.w <= $PairBasketCap),
    pairs AS (
      SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS c_pair
      FROM kept a JOIN kept b
        ON a.l_orderkey = b.l_orderkey AND a.p < b.p
      GROUP BY 1, 2 HAVING COUNT(*) >= $PairMinSup)
    SELECT pa, pb, c_pair, sa.c_item AS c_a, sb.c_item AS c_b,
      CAST(CAST(c_pair AS HUGEINT) * 1000000 // n_orders AS BIGINT)
        AS support_ppm,
      CAST(CAST(c_pair AS HUGEINT) * 1000000 // sa.c_item AS BIGINT)
        AS conf_ppm,
      CAST((CAST(c_pair AS HUGEINT) * 1000000 // sa.c_item)
        * n_orders // sb.c_item AS BIGINT) AS lift_ppm,
      capped_baskets, capped_item_slots
    FROM pairs JOIN supp sa ON sa.l_partkey = pa
      JOIN supp sb ON sb.l_partkey = pb
      CROSS JOIN n
      CROSS JOIN ledger
    ORDER BY pa, pb"""

  // ---- q198: Benford first-digit screen --------------------------------
  // The fabricated-numbers audit: leading-digit frequencies of a money
  // measure vs the Benford expectation log10(1+1/d). Organic multi-scale
  // measures follow it; synthetic/uniform generators (this fixture) and
  // hand-typed fraud do not — the statistic exists to QUANTIFY that
  // deviation, so the fixture failing the screen is the query working.
  //
  // Exactness: the digit comes from the decimal string of the exact cent
  // units (BIGINT→VARCHAR is locale-free in both engines; the measure is
  // strictly positive); the expectation is a 9-entry integer-ppm literal
  // (summing to exactly 10⁶) shared verbatim by both sides; the χ²
  // surrogate is pure Decimal(38,0)/HUGEINT arithmetic —
  // (10⁶·n_d − N·e_ppm)² div (N·e_ppm), i.e. 10⁶·χ² with floor-div —
  // no float log10, no float division anywhere.
  //
  // Scale shape: one scan → 9-row aggregate with map-side combine; the
  // 1-row total attaches by broadcast; the window runs on 9 rows.
  private val BenfordPpm = Seq(301030L, 176091L, 124939L, 96910L,
    79181L, 66947L, 57992L, 51153L, 45757L) // round(1e6·log10(1+1/d))

  def q198Benford(s: SparkSession, d: String): DataFrame = {
    val digits = Tables.lineitem(s, d)
      .select(toUnits(col("l_extendedprice")).as("u"))
      .withColumn("digit", substring(col("u").cast("string"), 1, 1)
        .cast("int"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      .persist() // ≤9 rows; total + per-digit pass share it
    val total = digits.agg(sum(col("n_obs")).as("n_total"))
    val expPpm = array(BenfordPpm.map(lit): _*)
    val perDigit = digits.crossJoin(broadcast(total))
      .withColumn("exp_ppm", element_at(expPpm, col("digit")))
      .withColumn("obs_ppm",
        expr("cast(n_obs as decimal(38,0)) * 1000000 div n_total")
          .cast("long"))
      .withColumn("x2_micro",
        expr("""cast((cast(n_obs as decimal(38,0)) * 1000000
                 - cast(n_total as decimal(38,0)) * exp_ppm) as decimal(38,0))
               * (cast(n_obs as decimal(38,0)) * 1000000
                 - cast(n_total as decimal(38,0)) * exp_ppm)
               div (cast(n_total as decimal(38,0)) * exp_ppm)""")
          .cast("long"))
    // total χ² attaches as a 1-row broadcast, not a global window (a
    // partition-less WindowExec funnels its input through one task —
    // harmless on 9 rows, but the registry bans the shape outright so a
    // misrouted corpus frame can never ride it)
    val chi2 = perDigit.agg(sum(col("x2_micro")).as("chi2_micro_total"))
    perDigit.crossJoin(broadcast(chi2))
      .select(col("digit"), col("n_obs"), col("obs_ppm"), col("exp_ppm"),
        col("x2_micro"), col("chi2_micro_total"))
      .orderBy(col("digit"))
  }

  val q198Sql: String = s"""
    WITH digits AS (
      SELECT CAST(LEFT(CAST(${sqlUnits("l_extendedprice")} AS VARCHAR), 1)
          AS INTEGER) AS digit,
        CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM lineitem GROUP BY 1),
    t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM digits),
    e AS (
      SELECT digit, n_obs, n_total,
        ([${BenfordPpm.mkString(", ")}])[digit] AS exp_ppm
      FROM digits CROSS JOIN t)
    SELECT digit, n_obs,
      CAST(CAST(n_obs AS HUGEINT) * 1000000 // n_total AS BIGINT) AS obs_ppm,
      CAST(exp_ppm AS BIGINT) AS exp_ppm,
      CAST((CAST(n_obs AS HUGEINT) * 1000000
             - CAST(n_total AS HUGEINT) * exp_ppm)
           * (CAST(n_obs AS HUGEINT) * 1000000
             - CAST(n_total AS HUGEINT) * exp_ppm)
           // (CAST(n_total AS HUGEINT) * exp_ppm) AS BIGINT) AS x2_micro,
      CAST(SUM(CAST((CAST(n_obs AS HUGEINT) * 1000000
             - CAST(n_total AS HUGEINT) * exp_ppm)
           * (CAST(n_obs AS HUGEINT) * 1000000
             - CAST(n_total AS HUGEINT) * exp_ppm)
           // (CAST(n_total AS HUGEINT) * exp_ppm) AS BIGINT)) OVER ()
        AS BIGINT) AS chi2_micro_total
    FROM e ORDER BY digit"""

  // ---- q200: multi-touch attribution (first / last / linear) -----------
  // Which touch types get credit for conversions: for every purchase,
  // the same user's touch events (view/click/signup) in the trailing
  // 7 days, credited under the three standard models at once —
  // first-touch (earliest in window), last-touch (latest), linear
  // (1/n to each, exact integer micro-credits via floor-div so the
  // per-purchase credit mass is deterministic in both engines).
  //
  // Scale shape: ONE user-keyed equi-join (touch × purchase, the
  // trailing-window predicate applied inside it — the q88 posture:
  // equi-key first, range residual second), then a purchase-keyed
  // window for first/last ranks, then a map-side-combining aggregate
  // onto the |touch types|-row frame. The joined frame is bounded by
  // touches-per-user × purchases-per-user; a bot account that breaks
  // that bound is exactly what the q173 sustained-rate screen removes
  // upstream.
  def q200Attribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val touches = ev
      .filter(col("event_type").isin("view", "click", "signup"))
      .select(col("user_id"), col("ts").as("t_ts"),
        col("event_id").as("t_id"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
    val joined = touches.join(purchases, Seq("user_id"))
      .filter(col("t_ts") < col("p_ts") &&
        col("t_ts") >= col("p_ts") - expr("INTERVAL 7 DAYS"))
    val w = Window.partitionBy(col("p_id"))
    val wAsc = w.orderBy(col("t_ts"), col("t_id"))
    val ranked = joined
      .withColumn("rn", row_number().over(wAsc))
      .withColumn("n_t", count(lit(1)).over(w))
    ranked.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("first_touch_n"),
        sum(when(col("rn") === col("n_t"), 1L).otherwise(0L))
          .as("last_touch_n"),
        sum(expr("1000000 div n_t")).as("linear_micro"))
      .orderBy(col("event_type"))
  }

  val q200Sql: String = """
    WITH touches AS (
      SELECT user_id, ts AS t_ts, event_id AS t_id, event_type
      FROM events WHERE event_type IN ('view', 'click', 'signup')),
    purchases AS (
      SELECT user_id, ts AS p_ts, event_id AS p_id
      FROM events WHERE event_type = 'purchase'),
    ranked AS (
      SELECT t.event_type,
        ROW_NUMBER() OVER (PARTITION BY p.p_id
          ORDER BY t.t_ts, t.t_id) AS rn,
        COUNT(*) OVER (PARTITION BY p.p_id) AS n_t
      FROM touches t JOIN purchases p ON t.user_id = p.user_id
      WHERE t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 7 DAY)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
      CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS first_touch_n,
      CAST(SUM(CASE WHEN rn = n_t THEN 1 ELSE 0 END) AS BIGINT)
        AS last_touch_n,
      CAST(SUM(1000000 // n_t) AS BIGINT) AS linear_micro
    FROM ranked GROUP BY 1 ORDER BY 1"""

  // ---- q201: time-weighted value averages ------------------------------
  // The dwell-weighted mean behind engagement-quality metrics: each
  // event's value weighted by how long it stayed the user's CURRENT
  // state (whole seconds to the user's next event, capped at 3600 so an
  // overnight gap doesn't own the average; a user's final event gets
  // the cap). A plain AVG overweights rapid-fire bursts; this is the
  // step-function integral a sessionized replay would compute.
  //
  // Exactness: weights are truncating-div whole seconds of nonnegative
  // epoch-micro differences (floor ≡ truncate), values exact cent
  // units, both Σ(v·w) and Σw accumulate in Decimal(38,0)/HUGEINT, and
  // the reported average is integer floor-div centi-units plus one
  // derived double from a single IEEE division of identical integers.
  //
  // Scale shape: the same single user_id shuffle as q172 for the lead
  // window, then one map-side-combining aggregate per event type.
  private[graft] val DwellCapS = 3600L

  def q201TimeWeighted(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), toUnits(col("value")).as("vu"))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .withColumn("dwell_s", least(
        coalesce(expr("(unix_micros(next_ts) - unix_micros(ts)) div 1000000"),
          lit(DwellCapS)), lit(DwellCapS)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("dwell_s")).as("w_total_s"),
        sum(expr("cast(vu as decimal(38,0)) * dwell_s")).as("wv"),
        sum(col("vu")).as("v_total"))
      .withColumn("twa_centi", expr("wv div w_total_s").cast("long"))
      .withColumn("plain_avg",
        col("v_total").cast("double") / col("n") / 100.0)
      .withColumn("twa",
        col("wv").cast("double") / col("w_total_s") / 100.0)
      .select(col("event_type"), col("n"), col("w_total_s"),
        col("twa_centi"), col("twa"), col("plain_avg"))
      .orderBy(col("event_type"))
  }

  val q201Sql: String = s"""
    WITH seq AS (
      SELECT event_type, ${sqlUnits("value")} AS vu,
        LEAST(COALESCE((epoch_us(LEAD(ts) OVER (PARTITION BY user_id
            ORDER BY ts, event_id)) - epoch_us(ts)) // 1000000,
          $DwellCapS), $DwellCapS) AS dwell_s
      FROM events)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(dwell_s) AS BIGINT) AS w_total_s,
      CAST(SUM(CAST(vu AS HUGEINT) * dwell_s) // SUM(dwell_s) AS BIGINT)
        AS twa_centi,
      CAST(SUM(CAST(vu AS HUGEINT) * dwell_s) AS DOUBLE)
        / CAST(SUM(dwell_s) AS BIGINT) / 100.0 AS twa,
      CAST(SUM(vu) AS BIGINT) / CAST(COUNT(*) AS BIGINT) / 100.0
        AS plain_avg
    FROM seq GROUP BY 1 ORDER BY 1"""

  // ---- q203: order-total reconciliation audit --------------------------
  // The cross-table financial consistency check every warehouse load
  // runs: does the order header total equal the sum of its line nets
  // (extendedprice · (1−discount) · (1+tax))? Differences are banded —
  // exact, rounding (≤100 ppm), drift (≤1%), broken, headerless
  // no_lines — and reported per order status with the absolute
  // discrepancy mass. On a synthetic fixture the interesting answer is
  // usually "drift/broken everywhere", which is the audit doing its job.
  //
  // Exactness: each line net is quantized element-wise to cents with
  // ONE fused float expression (identical IEEE op sequence in both
  // engines), summed as BIGINT; the header total quantizes the same
  // way; mismatch is integer ppm of the header. Scale shape: one
  // map-side-combining per-order aggregate of lineitem, one equi-join
  // to orders (both corpus-sized, one shuffle each), then a
  // map-side-combining aggregate onto the ≤|status|·5 band grid.
  def q203OrderReconciliation(s: SparkSession, d: String): DataFrame = {
    val lsum = Tables.lineitem(s, d)
      .select(col("l_orderkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")) * 100.0 + 0.5).cast("long").as("lu"))
      .groupBy(col("l_orderkey")).agg(sum(col("lu")).as("lsum"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        toUnits(col("o_totalprice")).as("osum"))
      .join(lsum, col("o_orderkey") === col("l_orderkey"), "left")
      .withColumn("mismatch_ppm",
        when(col("lsum").isNull, lit(null).cast("long"))
          .otherwise(expr("abs(lsum - osum) * 1000000 div osum")))
      .withColumn("band",
        when(col("lsum").isNull, "no_lines")
          .when(col("mismatch_ppm") === 0L, "exact")
          .when(col("mismatch_ppm") <= 100L, "rounding")
          .when(col("mismatch_ppm") <= 10000L, "drift")
          .otherwise("broken"))
      .groupBy(col("o_orderstatus"), col("band"))
      .agg(count(lit(1)).as("n_orders"),
        sum(abs(coalesce(col("lsum"), lit(0L)) - col("osum"))).as("abs_diff_units"),
        max(col("mismatch_ppm")).as("max_mismatch_ppm"))
      .orderBy(col("o_orderstatus"), col("band"))
  }

  val q203Sql: String = s"""
    WITH lsum AS (
      SELECT l_orderkey, CAST(SUM(CAST(FLOOR(l_extendedprice
          * (1.0 - l_discount) * (1.0 + l_tax) * 100.0 + 0.5) AS BIGINT))
        AS BIGINT) AS lsum
      FROM lineitem GROUP BY 1),
    j AS (
      SELECT o_orderstatus, lsum, ${sqlUnits("o_totalprice")} AS osum,
        CASE WHEN lsum IS NULL THEN NULL
          ELSE abs(lsum - ${sqlUnits("o_totalprice")}) * 1000000
            // ${sqlUnits("o_totalprice")} END AS mismatch_ppm
      FROM orders LEFT JOIN lsum ON o_orderkey = l_orderkey)
    SELECT o_orderstatus,
      CASE WHEN lsum IS NULL THEN 'no_lines'
        WHEN mismatch_ppm = 0 THEN 'exact'
        WHEN mismatch_ppm <= 100 THEN 'rounding'
        WHEN mismatch_ppm <= 10000 THEN 'drift'
        ELSE 'broken' END AS band,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(abs(COALESCE(lsum, 0) - osum)) AS BIGINT)
        AS abs_diff_units,
      MAX(mismatch_ppm) AS max_mismatch_ppm
    FROM j GROUP BY 1, 2 ORDER BY 1, 2"""

  // ---- q204: revenue Pareto concentration per region -------------------
  // The 80/20 ledger behind assortment and capacity decisions: per
  // region (via the supplier side), how many parts carry 80% of net
  // revenue, and how concentrated is the top. The region/nation dims
  // broadcast (q03/q04 discipline); the cumulative-share window runs on
  // the (region × part) aggregate — |parts|-bounded, the vocab-keyed
  // class, never corpus rows. Determinism: revenue ties broken by
  // partkey; all shares exact integer ppm on Decimal(38,0).
  def q204Pareto(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_partkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * 100.0 + 0.5).cast("long").as("ru"))
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("l_partkey"))
      .agg(sum(col("ru")).as("rev"))
    val w = Window.partitionBy(col("r_name"))
      .orderBy(col("rev").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("r_name"))
    rev.withColumn("cum", sum(col("rev")).over(w))
      .withColumn("total", sum(col("rev")).over(wAll))
      .withColumn("in80", ((col("cum") - col("rev")) * 5
        < col("total") * 4).cast("long"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("in80")).as("n_parts_80"),
        max(col("rev")).as("top_rev_units"),
        sum(col("rev")).as("rev_units"))
      .withColumn("top_share_ppm", expr(
        "cast(top_rev_units as decimal(38,0)) * 1000000 div rev_units")
        .cast("long"))
      .withColumn("pareto_ppm", expr(
        "cast(n_parts_80 as decimal(38,0)) * 1000000 div n_parts")
        .cast("long"))
      .select(col("r_name"), col("n_parts"), col("n_parts_80"),
        col("pareto_ppm"), col("top_share_ppm"), col("rev_units"))
      .orderBy(col("r_name"))
  }

  val q204Sql: String = """
    WITH rev AS (
      SELECT r_name, l_partkey,
        CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0
          + 0.5) AS BIGINT)) AS BIGINT) AS rev
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2),
    c AS (
      SELECT r_name, rev,
        SUM(rev) OVER (PARTITION BY r_name ORDER BY rev DESC, l_partkey
          ROWS UNBOUNDED PRECEDING) AS cum,
        SUM(rev) OVER (PARTITION BY r_name) AS total
      FROM rev)
    SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_parts,
      CAST(SUM(CASE WHEN (cum - rev) * 5 < total * 4 THEN 1 ELSE 0 END)
        AS BIGINT) AS n_parts_80,
      CAST(CAST(SUM(CASE WHEN (cum - rev) * 5 < total * 4 THEN 1 ELSE 0
          END) AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT) AS pareto_ppm,
      CAST(CAST(MAX(rev) AS HUGEINT) * 1000000 // SUM(rev) AS BIGINT)
        AS top_share_ppm,
      CAST(SUM(rev) AS BIGINT) AS rev_units
    FROM c GROUP BY 1 ORDER BY 1"""

  // ---- q205: SCD-2 state-interval build from the event log -------------
  // The slowly-changing-dimension primitive: collapse each user's event
  // stream into contiguous same-type state intervals with
  // valid_from/valid_to, the "current row is open" convention included —
  // what a warehouse dimension build or a sessionized state replay
  // materializes from a change log. Reported per state: interval count,
  // open count, and exact closed-interval duration stats.
  //
  // Scale shape: the q172 posture — ONE user-keyed shuffle feeds both
  // windows (change detection and interval chaining), then a
  // map-side-combining aggregate onto the |states|-row frame. Durations
  // are truncating-div whole seconds of nonnegative epoch-micro
  // differences; the mean is one exact integer floor-div.
  def q205Scd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val chg = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val intervals = chg.groupBy(col("user_id"), col("grp"))
      .agg(max(col("event_type")).as("state"),
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
    // grp tiebreak: valid_from alone is tie-ambiguous when a user flips
    // state twice at one timestamp (two events, same ts, different types —
    // ordered by event_id). grp is monotone in the (ts, event_id) event
    // order, so it totally orders same-valid_from intervals identically
    // in both engines.
    val wi = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from"), col("grp"))
    intervals
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wi))
      .withColumn("dur_s", expr(
        "(unix_micros(valid_to) - unix_micros(valid_from)) div 1000000"))
      .groupBy(col("state"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(when(col("valid_to").isNull, 1L).otherwise(0L)).as("n_open"),
        sum(col("n_events")).as("n_events"),
        sum(col("dur_s")).as("closed_dur_s"),
        max(col("dur_s")).as("max_dur_s"))
      .withColumn("mean_dur_s", expr(
        "closed_dur_s div (n_intervals - n_open)"))
      .orderBy(col("state"))
  }

  val q205Sql: String = """
    WITH chg AS (
      SELECT user_id, ts, event_id, event_type,
        CASE WHEN LAG(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) IS DISTINCT FROM event_type
          THEN 1 ELSE 0 END AS chg
      FROM events),
    g AS (
      SELECT user_id, event_type, ts,
        SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS grp
      FROM chg),
    intervals AS (
      SELECT user_id, grp, MAX(event_type) AS state,
        MIN(ts) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM g GROUP BY 1, 2),
    iv AS (
      SELECT state, n_events,
        (epoch_us(LEAD(valid_from) OVER (PARTITION BY user_id
          ORDER BY valid_from, grp)) - epoch_us(valid_from)) // 1000000
          AS dur_s
      FROM intervals)
    SELECT state, CAST(COUNT(*) AS BIGINT) AS n_intervals,
      CAST(SUM(CASE WHEN dur_s IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_open,
      CAST(SUM(n_events) AS BIGINT) AS n_events,
      CAST(SUM(dur_s) AS BIGINT) AS closed_dur_s,
      MAX(dur_s) AS max_dur_s,
      CAST(SUM(dur_s) AS BIGINT)
        // (COUNT(*) - SUM(CASE WHEN dur_s IS NULL THEN 1 ELSE 0 END))
        AS mean_dur_s
    FROM iv GROUP BY 1 ORDER BY 1"""

  // ---- q206: new-vs-returning daily decomposition ----------------------
  // The daily-actives split every growth dashboard opens with: per
  // activity day, how many actives are first-ever-seen vs returning.
  // The q63 cohort matrix generalizes this; the decomposition is the
  // operational daily read. Shape: one (user, day) distinct (single
  // combinable shuffle), per-user first day as an aggregate of THAT
  // frame (no second corpus scan), one equi-join back, then a
  // |days|-row aggregate.
  def q206NewReturning(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val firsts = ud.groupBy(col("user_id")).agg(min(col("day")).as("d0"))
    ud.join(firsts, Seq("user_id"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("d0"), 1L).otherwise(0L)).as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
      .withColumn("new_share_ppm",
        expr("n_new * 1000000 div n_active"))
      .orderBy(col("day"))
  }

  val q206Sql: String = """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    firsts AS (SELECT user_id, MIN(day) AS d0 FROM ud GROUP BY 1)
    SELECT day, CAST(COUNT(*) AS BIGINT) AS n_active,
      CAST(SUM(CASE WHEN day = d0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      CAST(COUNT(*) - SUM(CASE WHEN day = d0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_returning,
      CAST(SUM(CASE WHEN day = d0 THEN 1 ELSE 0 END) * 1000000
        // COUNT(*) AS BIGINT) AS new_share_ppm
    FROM ud JOIN firsts USING (user_id)
    GROUP BY day ORDER BY day"""

  // ---- q207: top event-path trigrams -----------------------------------
  // Sequence mining lite — the 3-step extension of q170's Markov
  // matrix: which concrete 3-event paths dominate user journeys. Paths
  // from two leads over the same user-keyed window (one shuffle), the
  // path count is a map-side-combining aggregate onto the ≤|types|³
  // frame, and the global top-20 (count desc, then path — fully
  // deterministic) fuses into TakeOrderedAndProject, never a global
  // sort of the corpus.
  def q207PathTrigrams(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val paths = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("t1"))
      .withColumn("t2", lead(col("t1"), 1).over(w))
      .withColumn("t3", lead(col("t1"), 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n_paths"))
      .persist() // total + top-k share one computation
    val total = paths.agg(sum(col("n_paths")).as("n_total"))
    paths.crossJoin(broadcast(total))
      .withColumn("share_ppm", expr(
        "cast(n_paths as decimal(38,0)) * 1000000 div n_total")
        .cast("long"))
      .select(col("t1"), col("t2"), col("t3"), col("n_paths"),
        col("share_ppm"))
      .orderBy(col("n_paths").desc, col("t1"), col("t2"), col("t3"))
      .limit(20)
  }

  val q207Sql: String = """
    WITH seq AS (
      SELECT event_type AS t1,
        LEAD(event_type, 1) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS t2,
        LEAD(event_type, 2) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS t3
      FROM events),
    paths AS (
      SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n_paths
      FROM seq WHERE t3 IS NOT NULL GROUP BY 1, 2, 3),
    t AS (SELECT CAST(SUM(n_paths) AS BIGINT) AS n_total FROM paths)
    SELECT t1, t2, t3, n_paths,
      CAST(CAST(n_paths AS HUGEINT) * 1000000 // n_total AS BIGINT)
        AS share_ppm
    FROM paths CROSS JOIN t
    ORDER BY n_paths DESC, t1, t2, t3 LIMIT 20"""

  // ---- q209: Gini concentration index per market segment ---------------
  // The continuous inequality complement of q204's 80/20 count: the Gini
  // coefficient of per-customer spend within each market segment,
  // computed EXACTLY from the bounded-domain value histogram — the
  // classic rank formula G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) needs a
  // global sort of customers, but over the histogram the rank sum
  // collapses per distinct value v with count c and prior cumulative
  // count F: 2·Σ i·x = Σ v·c·(2F + c + 1) — a cumulative window over the
  // ≤|value domain| histogram rows (ten-dollar units, the q195 domain
  // bound), partitioned by segment. Everything integer until the single
  // final ppm floor-div on Decimal(38,0).
  def q209Gini(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.orders(s, d)
      .select(col("o_custkey"), toUnits(col("o_totalprice")).as("cents"))
      .groupBy(col("o_custkey"))
      .agg(expr("sum(cents) div 1000").as("m_e1"))
      .join(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    val hist = cust.groupBy(col("c_mktsegment"), col("m_e1"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("m_e1"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("f_prev", col("cum") - col("c"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("c")).as("n_customers"),
        sum(expr("cast(m_e1 as decimal(38,0)) * c")).as("mass"),
        sum(expr(
          "cast(m_e1 as decimal(38,0)) * c * (2 * f_prev + c + 1)"))
          .as("rank_mass"))
      // nullif: a degenerate all-zero-spend segment grades NULL, not a
      // crash (Spark ANSI div-by-zero throws where DuckDB // 0 is NULL —
      // the q174 empty-corpus lesson)
      .withColumn("gini_ppm", expr(
        "cast((rank_mass - (n_customers + 1) * mass) * 1000000" +
          " div (cast(n_customers as decimal(38,0)) * nullif(mass, 0))" +
          " as bigint)"))
      .select(col("c_mktsegment"), col("n_customers"),
        col("mass").cast("long").as("spend_e1"), col("gini_ppm"))
      .orderBy(col("c_mktsegment"))
  }

  val q209Sql: String = s"""
    WITH cust AS (
      SELECT o_custkey, ${sqlUnitSum("o_totalprice")} // 1000 AS m_e1
      FROM orders GROUP BY 1),
    j AS (
      SELECT c_mktsegment, m_e1 FROM cust
      JOIN customer ON o_custkey = c_custkey),
    hist AS (
      SELECT c_mktsegment, m_e1, CAST(COUNT(*) AS BIGINT) AS c
      FROM j GROUP BY 1, 2),
    cum AS (
      SELECT c_mktsegment, m_e1, c,
        SUM(c) OVER (PARTITION BY c_mktsegment ORDER BY m_e1
          ROWS UNBOUNDED PRECEDING) - c AS f_prev
      FROM hist),
    agg AS (
      SELECT c_mktsegment, CAST(SUM(c) AS BIGINT) AS n_customers,
        SUM(CAST(m_e1 AS HUGEINT) * c) AS mass,
        SUM(CAST(m_e1 AS HUGEINT) * c * (2 * f_prev + c + 1))
          AS rank_mass
      FROM cum GROUP BY 1)
    SELECT c_mktsegment, n_customers, CAST(mass AS BIGINT) AS spend_e1,
      CAST((rank_mass - (n_customers + 1) * mass) * 1000000
        // (CAST(n_customers AS HUGEINT) * nullif(mass, 0)) AS BIGINT)
        AS gini_ppm
    FROM agg ORDER BY c_mktsegment"""

  // ---- q212: cohort lifetime-value curve -------------------------------
  // The finance-side complement of q63's activity retention: per
  // first-order-month cohort, cumulative spend per cohort member by
  // month offset — the LTV curve payback models read off. Months are
  // exact integer codes (year·12 + month, identical in both engines —
  // no interval arithmetic ambiguity); spend is exact cents; the
  // cumulative runs per cohort over the ≤|months|² (cohort, offset)
  // grid, never over orders.
  def q212CohortLtv(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("ym"),
        toUnits(col("o_totalprice")).as("cents"))
    val firsts = o.groupBy(col("o_custkey")).agg(min(col("ym")).as("ym0"))
    val sized = firsts.groupBy(col("ym0"))
      .agg(count(lit(1)).as("cohort_n"))
    val cells = o.join(firsts, Seq("o_custkey"))
      .groupBy(col("ym0"), (col("ym") - col("ym0")).as("m_offset"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_active"),
        sum(col("cents")).as("spend_units"))
    val w = Window.partitionBy(col("ym0")).orderBy(col("m_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.join(sized, Seq("ym0"))
      .withColumn("cum_units", sum(col("spend_units")).over(w))
      .withColumn("ltv_centi", expr("cum_units div cohort_n"))
      .select(col("ym0").as("cohort_ym"), col("m_offset"), col("cohort_n"),
        col("n_active"), col("n_orders"), col("spend_units"),
        col("cum_units"), col("ltv_centi"))
      .orderBy(col("cohort_ym"), col("m_offset"))
  }

  val q212Sql: String = s"""
    WITH o AS (
      SELECT o_custkey,
        CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym,
        ${sqlUnits("o_totalprice")} AS cents
      FROM orders),
    firsts AS (SELECT o_custkey, MIN(ym) AS ym0 FROM o GROUP BY 1),
    sized AS (SELECT ym0, CAST(COUNT(*) AS BIGINT) AS cohort_n
              FROM firsts GROUP BY 1),
    cells AS (
      SELECT ym0, ym - ym0 AS m_offset,
        CAST(COUNT(*) AS BIGINT) AS n_orders,
        CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_active,
        CAST(SUM(cents) AS BIGINT) AS spend_units
      FROM o JOIN firsts USING (o_custkey) GROUP BY 1, 2)
    SELECT ym0 AS cohort_ym, m_offset, cohort_n, n_active, n_orders,
      spend_units,
      CAST(SUM(spend_units) OVER (PARTITION BY ym0 ORDER BY m_offset
        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_units,
      CAST(SUM(spend_units) OVER (PARTITION BY ym0 ORDER BY m_offset
        ROWS UNBOUNDED PRECEDING) // cohort_n AS BIGINT) AS ltv_centi
    FROM cells JOIN sized USING (ym0)
    ORDER BY cohort_ym, m_offset"""

  // ---- q213: supplier concentration (HHI) per part type ----------------
  // The supply-chain-risk read next to q209's customer Gini: the
  // Herfindahl–Hirschman index of supply mass across suppliers within
  // each part type. HHI = Σ shareᵢ² computed exactly as
  // (Σ mᵢ²)·10⁶ div S² on Decimal(38,0) — no per-supplier float shares.
  // Shape: corpus join to the part dim on partkey, ONE (type, supplier)
  // aggregate with map-side combine, then a |types|-row aggregate.
  def q213SupplierHhi(s: SparkSession, d: String): DataFrame = {
    val mass = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"),
        toUnits(col("l_extendedprice")).as("u"))
      .join(Tables.part(s, d).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"), col("l_suppkey"))
      .agg(sum(col("u")).as("m"))
    mass.groupBy(col("p_type"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("m")).as("mass_units"),
        max(col("m")).as("top_units"),
        sum(expr("cast(m as decimal(38,0)) * m")).as("sq"))
      .withColumn("hhi_ppm", expr(
        "cast(sq * 1000000 div (cast(mass_units as decimal(38,0))" +
          " * nullif(mass_units, 0)) as bigint)"))
      .withColumn("top_share_ppm", expr(
        "cast(cast(top_units as decimal(38,0)) * 1000000" +
          " div nullif(mass_units, 0) as bigint)"))
      .select(col("p_type"), col("n_suppliers"), col("mass_units"),
        col("hhi_ppm"), col("top_share_ppm"))
      .orderBy(col("p_type"))
  }

  val q213Sql: String = s"""
    WITH mass AS (
      SELECT p_type, l_suppkey,
        CAST(SUM(${sqlUnits("l_extendedprice")}) AS BIGINT) AS m
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2)
    SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
      CAST(SUM(m) AS BIGINT) AS mass_units,
      CAST(SUM(CAST(m AS HUGEINT) * m) * 1000000
        // (CAST(SUM(m) AS HUGEINT) * nullif(CAST(SUM(m) AS BIGINT), 0))
        AS BIGINT) AS hhi_ppm,
      CAST(CAST(MAX(m) AS HUGEINT) * 1000000
        // nullif(CAST(SUM(m) AS BIGINT), 0) AS BIGINT) AS top_share_ppm
    FROM mass GROUP BY 1 ORDER BY 1"""

  // ---- q214: join-key skew audit ---------------------------------------
  // The planning input for q46's salting and AQE skew handling: per
  // declared join-key family, key cardinality, the heaviest key's row
  // count, and the max/mean skew factor in ppm — the number that says
  // whether a shuffle on this key needs salting BEFORE the job runs at
  // 100 TB, derived from a histogram the optimizer could also read as
  // column stats. The heaviest key reports deterministically (smallest
  // key among the tied-heaviest). One count aggregate per family; the
  // 1-row stats frame broadcasts back onto the |keys| frame only to
  // select the top key.
  def q214SkewAudit(s: SparkSession, d: String): DataFrame = {
    def family(name: String, df: DataFrame): DataFrame = {
      val counts = df.groupBy(col("k")).agg(count(lit(1)).as("c"))
        .persist() // stats + top-key selection share one computation
      // 1-row frames throughout (global aggregates), so an EMPTY family
      // still reports a row — matching the oracle's scalar-subquery
      // shape on the SF=0 degrade gate
      val stats = counts.agg(count(lit(1)).as("n_keys"),
        coalesce(sum(col("c")), lit(0L)).as("n_rows"),
        max(col("c")).as("max_rows"))
      val top = counts.crossJoin(broadcast(stats))
        .filter(col("c") === col("max_rows"))
        .agg(min(col("k")).as("top_key"))
      stats.crossJoin(broadcast(top))
        .select(lit(name).as("family"), col("n_keys"), col("n_rows"),
          col("max_rows"),
          expr("cast(cast(max_rows as decimal(38,0)) * n_keys * 1000000" +
            " div nullif(n_rows, 0) as bigint)").as("skew_ppm"),
          col("top_key"))
    }
    family("orders.o_custkey", Tables.orders(s, d)
        .select(col("o_custkey").cast("long").as("k")))
      .unionByName(family("lineitem.l_partkey", Tables.lineitem(s, d)
        .select(col("l_partkey").cast("long").as("k"))))
      .unionByName(family("events.user_id", Tables.events(s, d)
        .select(col("user_id").cast("long").as("k"))))
      .orderBy(col("family"))
  }

  val q214Sql: String = {
    def f(name: String, table: String, key: String) = s"""
      SELECT '$name' AS family,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM
          (SELECT $key FROM $table GROUP BY 1)) AS n_keys,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM $table) AS n_rows,
        (SELECT CAST(MAX(c) AS BIGINT) FROM
          (SELECT COUNT(*) AS c FROM $table GROUP BY $key)) AS max_rows,
        (SELECT CAST(CAST(MAX(c) AS HUGEINT)
            * (SELECT COUNT(*) FROM (SELECT $key FROM $table GROUP BY 1))
            * 1000000 // nullif((SELECT COUNT(*) FROM $table), 0)
            AS BIGINT)
         FROM (SELECT COUNT(*) AS c FROM $table GROUP BY $key))
          AS skew_ppm,
        (SELECT CAST(MIN($key) AS BIGINT) FROM
          (SELECT $key, COUNT(*) AS c FROM $table GROUP BY 1)
         WHERE c = (SELECT MAX(c) FROM
          (SELECT COUNT(*) AS c FROM $table GROUP BY $key))) AS top_key"""
    f("orders.o_custkey", "orders", "o_custkey") +
      " UNION ALL " + f("lineitem.l_partkey", "lineitem", "l_partkey") +
      " UNION ALL " + f("events.user_id", "events", "user_id") +
      " ORDER BY family"
  }

  // ---- q215: ship-lag SLA profile per order priority -------------------
  // Lead-time analytics: days from order to line shipment, per order
  // priority — median and p90 from the bounded-domain lag histogram
  // (lag spans a bounded calendar range, so ONE corpus join feeds one
  // tiny histogram and every statistic — percentiles, breach rate,
  // counts — derives from that frame; no second scan, no raw-value
  // buffering). Breach = lag beyond 90 days, exact ppm.
  private[graft] val SlaBreachDays = 90L

  def q215ShipSla(s: SparkSession, d: String): DataFrame = {
    val lag = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate").cast("date"),
          col("o_orderdate").cast("date")).cast("long").as("v"))
    val hist = lag.groupBy(col("o_orderpriority"), col("v"))
      .agg(count(lit(1)).as("c")).persist()
    val ps = StatsOps.histPercentilesFromCounts(
      hist, "o_orderpriority", Seq(0.5, 0.9))
    val breach = hist.filter(col("v") > SlaBreachDays)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("c")).as("n_breach"))
    ps.join(breach, Seq("o_orderpriority"), "left")
      .select(col("o_orderpriority"), col("n").as("n_lines"),
        element_at(col("ps"), 1).as("p50_days"),
        element_at(col("ps"), 2).as("p90_days"),
        coalesce(col("n_breach"), lit(0L)).as("n_breach"))
      .withColumn("breach_ppm", expr("n_breach * 1000000 div n_lines"))
      .orderBy(col("o_orderpriority"))
  }

  val q215Sql: String = s"""
    WITH lag AS (
      SELECT o_orderpriority,
        CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
          AS BIGINT) AS v
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
      quantile_cont(v, 0.5) AS p50_days,
      quantile_cont(v, 0.9) AS p90_days,
      CAST(SUM(CASE WHEN v > $SlaBreachDays THEN 1 ELSE 0 END) AS BIGINT)
        AS n_breach,
      CAST(SUM(CASE WHEN v > $SlaBreachDays THEN 1 ELSE 0 END) * 1000000
        // COUNT(*) AS BIGINT) AS breach_ppm
    FROM lag GROUP BY 1 ORDER BY 1"""

  // ---- q226: day-of-week seasonality decomposition ---------------------
  // The seasonality-strength read behind q218's autocorrelation and
  // q219's EWMA alarm thresholds: per ISO weekday, the mean daily
  // revenue, plus the global seasonal-strength statistic
  // 1 − Var(residual)/Var(total) in ppm — how much of day-to-day revenue
  // variance the weekly profile alone explains. Means are exact floor-div
  // cents; both variances are exact Decimal(38,0) sums of squared
  // integer deviations about floor-div means (the floor compounds
  // identically in both engines), and the strength is one staged
  // floor-div of those — never a float variance. Scale shape: the corpus
  // collapses to the |days|-row daily frame once; everything downstream
  // is ≤7-row state with 1-row broadcast attaches.
  def q226DowSeasonality(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .select(to_date(col("o_orderdate")).as("day"),
        toUnits(col("o_totalprice")).as("u"))
      .groupBy(col("day")).agg(sum(col("u")).as("cents"))
      // ISO weekday (1=Mon..7=Sun): Spark weekday() is 0-based Monday,
      // DuckDB isodow() is 1-based Monday — the +1 aligns them
      .withColumn("dow", (expr("weekday(day)") + 1).cast("int"))
      .persist() // dow stats, the global mean, and both variance scans
    val dowStats = daily.groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("cents")).as("s"))
      .withColumn("mean_cents", expr("s div n_days"))
      .select(col("dow"), col("n_days"), col("mean_cents"))
    val gl = daily.agg(count(lit(1)).as("n_all"), sum(col("cents")).as("s_all"))
      .withColumn("gmean", expr("s_all div n_all"))
      .select(col("gmean"))
    val vars = daily
      .join(broadcast(dowStats.select(col("dow"), col("mean_cents"))),
        Seq("dow"))
      .crossJoin(broadcast(gl))
      .agg(
        sum(expr("cast(cents - gmean as decimal(38,0)) * (cents - gmean)"))
          .as("vx"),
        sum(expr("cast(cents - mean_cents as decimal(38,0))" +
          " * (cents - mean_cents)")).as("ssr"))
      .withColumn("seasonal_strength_ppm",
        expr("cast(1000000 - ssr * 1000000 div nullif(vx, 0) as bigint)"))
      .select(col("seasonal_strength_ppm"))
    dowStats.crossJoin(broadcast(vars))
      .select(col("dow"), col("n_days"), col("mean_cents"),
        col("seasonal_strength_ppm"))
      .orderBy(col("dow"))
  }

  val q226Sql: String = s"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
        ${sqlUnitSum("o_totalprice")} AS cents
      FROM orders GROUP BY 1),
    dd AS (SELECT day, cents, CAST(isodow(day) AS INTEGER) AS dow
           FROM daily),
    ds AS (
      SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
        CAST(SUM(cents) // COUNT(*) AS BIGINT) AS mean_cents
      FROM dd GROUP BY 1),
    gl AS (SELECT CAST(SUM(cents) // COUNT(*) AS BIGINT) AS gmean FROM dd),
    vars AS (
      SELECT
        SUM(CAST(cents - gmean AS HUGEINT) * (cents - gmean)) AS vx,
        SUM(CAST(cents - mean_cents AS HUGEINT) * (cents - mean_cents))
          AS ssr
      FROM dd JOIN ds USING (dow) CROSS JOIN gl),
    st AS (
      SELECT CAST(1000000 - ssr * 1000000 // nullif(vx, 0) AS BIGINT)
        AS seasonal_strength_ppm
      FROM vars)
    SELECT dow, n_days, mean_cents, seasonal_strength_ppm
    FROM ds CROSS JOIN st ORDER BY dow"""

  // ---- q231: per-brand discount response --------------------------------
  // The pricing-analytics read on top of q57's global correlation: per
  // part brand, the discount→quantity response — OLS slope (centi-units
  // of quantity per basis point of discount, scaled 1e6) and the exact
  // Pearson r, from one lineitem scan with the part dim broadcast. A
  // brand whose volume doesn't move with discount is paying margin for
  // nothing. Discounts quantize to exact basis points (s=4), quantities
  // to centi-units; all co-moments are exact Decimal(38,0) ↔ HUGEINT;
  // slope is the sign-split staged floor-div; r is one fixed IEEE tree.
  // Round-12 FMA audit: r = num_d / sqrt(den_d · vy_d) over EXACT
  // integers is mul → sqrt → div with no add/sub anywhere in double
  // space — FMA contraction fuses a multiply into an add, so this tree
  // has nothing to contract; every op is individually correctly
  // rounded (IEEE 754 requires it of *, /, sqrt, and the int→double
  // casts), hence bit-identical cross-engine BY SHAPE, unlike the
  // add-bearing raw-z trees the sweep moved to staged integers.
  // Scale shape: map-side-combining aggregate onto |brands| rows.
  def q231DiscountResponse(s: SparkSession, d: String): DataFrame = {
    val rows = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        toUnits(col("l_discount"), 4).as("x"),
        toUnits(col("l_quantity")).as("y"))
    rows.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"),
        sum(expr("cast(y as decimal(38,0)) * y")).as("syy"))
      .withColumn("num",
        expr("n_lines * sxy - cast(sx as decimal(38,0)) * sy"))
      .withColumn("den",
        expr("n_lines * sxx - cast(sx as decimal(38,0)) * sx"))
      .withColumn("vy",
        expr("n_lines * syy - cast(sy as decimal(38,0)) * sy"))
      .withColumn("slope_micro", expr(
        "case when den = 0 then null" +
          " when num >= 0 then cast(num * 1000000 div den as bigint)" +
          " else -cast((-num) * 1000000 div den as bigint) end"))
      .withColumn("r",
        when(col("den") <= 0 || col("vy") <= 0, lit(null).cast("double"))
          .otherwise(col("num").cast("double") /
            sqrt(col("den").cast("double") * col("vy").cast("double"))))
      .withColumn("response_band",
        when(col("r").isNull, "degenerate")
          .when(col("r") >= 0.1, "discount_lifts_volume")
          .when(col("r") <= -0.1, "discount_suppressed")
          .otherwise("inelastic"))
      .select(col("p_brand"), col("n_lines"), col("slope_micro"), col("r"),
        col("response_band"))
      .orderBy(col("p_brand"))
  }

  val q231Sql: String = s"""
    WITH rows_ AS (
      SELECT p_brand, ${sqlUnits("l_discount", 4)} AS x,
        ${sqlUnits("l_quantity")} AS y
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    agg AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        SUM(CAST(x AS HUGEINT) * y) AS sxy,
        SUM(CAST(x AS HUGEINT) * x) AS sxx,
        SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM rows_ GROUP BY 1),
    m AS (
      SELECT p_brand, n_lines,
        n_lines * sxy - CAST(sx AS HUGEINT) * sy AS num,
        n_lines * sxx - CAST(sx AS HUGEINT) * sx AS den,
        n_lines * syy - CAST(sy AS HUGEINT) * sy AS vy
      FROM agg)
    SELECT p_brand, n_lines,
      CASE WHEN den = 0 THEN NULL
           WHEN num >= 0 THEN CAST(num * 1000000 // den AS BIGINT)
           ELSE -CAST((-num) * 1000000 // den AS BIGINT) END AS slope_micro,
      CASE WHEN den <= 0 OR vy <= 0 THEN NULL
           ELSE CAST(num AS DOUBLE)
             / sqrt(CAST(den AS DOUBLE) * CAST(vy AS DOUBLE)) END AS r,
      CASE WHEN den <= 0 OR vy <= 0 THEN 'degenerate'
           WHEN CAST(num AS DOUBLE)
               / sqrt(CAST(den AS DOUBLE) * CAST(vy AS DOUBLE)) >= 0.1
             THEN 'discount_lifts_volume'
           WHEN CAST(num AS DOUBLE)
               / sqrt(CAST(den AS DOUBLE) * CAST(vy AS DOUBLE)) <= -0.1
             THEN 'discount_suppressed'
           ELSE 'inelastic' END AS response_band
    FROM m ORDER BY p_brand"""

  // ---- q250: Wilson-bound return-rate ranking ---------------------------
  // The small-sample ranking fix every leaderboard needs: ranking brands
  // by raw return rate puts a 2-line brand with 1 return (50%!) above a
  // 10 000-line brand at 30% — the classic mistake the Wilson score
  // interval's LOWER bound corrects (rank by "the worst rate the data
  // still supports at 95%", so thin evidence sinks). Per brand: exact
  // line/return counts, the raw rate in ppm, the Wilson lower bound at
  // z = 1.96, and BOTH ranks side by side — the rank DELTA is the
  // operator's point (which brands the naive ranking wrongs).
  //
  // Exactness: counts and the ppm rate are exact integers, and — since
  // z = 1.96 is EXACTLY 49/25, z² exactly 2401/625 — the whole Wilson
  // lower bound scales to integers too:
  //   wilson_lo = (r + z²/2 − z·√(r(n−r)/n + z²/4)) / (n + z²)
  // multiplied through by 1250n gives num = 1250nr + 2401n − 49·√(nD)
  // over den = 1250n² + 4802n, with D = 2500r(n−r) + 2401n — every term
  // an exact DECIMAL(38,0)/HUGEINT. The single irrational, √(nD), is a
  // CORRECTED integer square root (floor of the double sqrt, then a ±1
  // exact-integer adjustment) of nD·10⁶, i.e. milli-precision — the
  // flooring error is ≤ 49·10³·10⁶/den ppm (3.4 ppm at n = 2, < 0.005
  // ppm by n = 100); for brands past 10⁹ lines (approaching the 38-digit
  // bound of nD·10⁶ at n ≈ 5.4e9) the CASE drops to the unscaled isqrt,
  // whose own flooring error at that n is < 1e-13 ppm. The previous
  // free-form IEEE tree multiply-added p·(1−p) + 0.9604/n — exactly the
  // FMA-contraction shape whose one-ulp cross-engine divergence moved
  // q260/q262/q265 to staged-integer z²; this form is deterministic by
  // construction in both engines. Ranks break ties by brand name.
  // Scale shape: one lineitem scan with the part dim broadcast (the
  // q231 join), collapsed map-side onto the |brands|-row frame; both
  // rank windows and the isqrt columns run on that bounded frame.
  def q250WilsonReturns(s: SparkSession, d: String): DataFrame = {
    val g = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("r"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"), sum(col("r")).as("n_returns"))
      .withColumn("rate_ppm", expr("n_returns * 1000000 div n_lines"))
      .withColumn("w_d", expr(
        "cast(2500 as decimal(38,0)) * n_returns * (n_lines - n_returns)" +
          " + cast(2401 as decimal(38,0)) * n_lines"))
      .withColumn("w_sc", expr(
        "case when n_lines <= 1000000000 then 1000 else 1 end"))
      .withColumn("w_x", expr(
        "cast(n_lines as decimal(38,0)) * w_d * w_sc * w_sc"))
      .withColumn("w_s0", expr(
        "cast(floor(sqrt(cast(w_x as double))) as decimal(38,0))"))
      .withColumn("w_s", expr(
        "case when (w_s0 + 1) * (w_s0 + 1) <= w_x then w_s0 + 1" +
          " when w_s0 * w_s0 > w_x then w_s0 - 1 else w_s0 end"))
      .withColumn("wilson_lo_ppm", expr(
        "cast(greatest(cast(0 as decimal(38,0))," +
          " (cast(1250 as decimal(38,0)) * n_lines * n_returns" +
          "  + cast(2401 as decimal(38,0)) * n_lines) * w_sc - 49 * w_s)" +
          " * 1000000 div ((cast(1250 as decimal(38,0)) * n_lines * n_lines" +
          "  + cast(4802 as decimal(38,0)) * n_lines) * w_sc) as bigint)"))
    g
      .withColumn("naive_rank", row_number().over(
        Window.orderBy(col("rate_ppm").desc, col("p_brand").asc))
        .cast("long"))
      .withColumn("wilson_rank", row_number().over(
        Window.orderBy(col("wilson_lo_ppm").desc, col("p_brand").asc))
        .cast("long"))
      .select(col("p_brand"), col("n_lines"), col("n_returns"),
        col("rate_ppm"), col("wilson_lo_ppm"), col("naive_rank"),
        col("wilson_rank"),
        (col("naive_rank") - col("wilson_rank")).as("rank_delta"))
      .orderBy(col("wilson_rank"))
  }

  val q250Sql: String = """
    WITH g AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_returns
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1),
    st AS (
      SELECT p_brand, n_lines, n_returns,
        CAST(n_returns * 1000000 // n_lines AS BIGINT) AS rate_ppm,
        CAST(2500 AS HUGEINT) * n_returns * (n_lines - n_returns)
          + CAST(2401 AS HUGEINT) * n_lines AS w_d,
        CASE WHEN n_lines <= 1000000000 THEN 1000 ELSE 1 END AS w_sc
      FROM g),
    sx AS (
      SELECT *, CAST(n_lines AS HUGEINT) * w_d * w_sc * w_sc AS w_x
      FROM st),
    s0 AS (
      SELECT *, CAST(FLOOR(SQRT(CAST(w_x AS DOUBLE))) AS HUGEINT) AS w_s0
      FROM sx),
    sq AS (
      SELECT *, CASE WHEN (w_s0 + 1) * (w_s0 + 1) <= w_x THEN w_s0 + 1
                     WHEN w_s0 * w_s0 > w_x THEN w_s0 - 1
                     ELSE w_s0 END AS w_s
      FROM s0),
    sc AS (
      SELECT p_brand, n_lines, n_returns, rate_ppm,
        CAST(GREATEST(CAST(0 AS HUGEINT),
            (CAST(1250 AS HUGEINT) * n_lines * n_returns
             + CAST(2401 AS HUGEINT) * n_lines) * w_sc - 49 * w_s)
          * 1000000 // ((CAST(1250 AS HUGEINT) * n_lines * n_lines
             + CAST(4802 AS HUGEINT) * n_lines) * w_sc) AS BIGINT)
          AS wilson_lo_ppm
      FROM sq)
    SELECT p_brand, n_lines, n_returns, rate_ppm, wilson_lo_ppm,
      ROW_NUMBER() OVER (ORDER BY rate_ppm DESC, p_brand) AS naive_rank,
      ROW_NUMBER() OVER (ORDER BY wilson_lo_ppm DESC, p_brand)
        AS wilson_rank,
      ROW_NUMBER() OVER (ORDER BY rate_ppm DESC, p_brand)
        - ROW_NUMBER() OVER (ORDER BY wilson_lo_ppm DESC, p_brand)
        AS rank_delta
    FROM sc ORDER BY wilson_rank"""

  // ---- q254: order-backlog time series (opened vs completed flows) ------
  // The operations read every fulfillment dashboard carries: per month,
  // orders OPENED (o_orderdate) vs orders COMPLETED (the month of the
  // LAST line shipment), and the running backlog their difference
  // accumulates — two event streams diffed cumulatively, the stock-flow
  // shape that also prices queue depth, unprocessed-document inventory,
  // and retry backlogs. The peak month is flagged (ties to the earliest
  // month); orders with no lineitem rows never complete and sit in the
  // closing backlog by design (they ARE the unfulfilled tail).
  //
  // Exactness: counts and one cumulative integer sum. Scale shape: the
  // orders scan collapses map-side to |months| rows; completion needs
  // ONE order-keyed aggregate over lineitem (max shipdate per order —
  // the co-partitioned join-key class) before its own |months| collapse;
  // the outer-join ledger, cumulative window, and peak pick all run on
  // the CALENDAR-bounded frame.
  def q254OrderBacklog(s: SparkSession, d: String): DataFrame = {
    val opened = Tables.orders(s, d)
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("month_id"))
      .groupBy(col("month_id")).agg(count(lit(1)).as("n_opened"))
    val completed = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("done"))
      .select((year(col("done")) * 12 + month(col("done")))
        .cast("long").as("month_id"))
      .groupBy(col("month_id")).agg(count(lit(1)).as("n_completed"))
    val wCum = Window.orderBy(col("month_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ledger = opened.join(completed, Seq("month_id"), "full_outer")
      .na.fill(0L, Seq("n_opened", "n_completed"))
      .withColumn("backlog",
        sum(col("n_opened") - col("n_completed")).over(wCum))
    ledger
      .withColumn("rk", row_number().over(
        Window.orderBy(col("backlog").desc, col("month_id").asc)))
      .select(col("month_id"), col("n_opened"), col("n_completed"),
        col("backlog"), (col("rk") === 1).as("is_peak"))
      .orderBy(col("month_id"))
  }

  val q254Sql: String = """
    WITH opened AS (
      SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
        AS month_id, CAST(COUNT(*) AS BIGINT) AS n_opened
      FROM orders GROUP BY 1),
    done AS (
      SELECT l_orderkey, MAX(l_shipdate) AS done FROM lineitem GROUP BY 1),
    completed AS (
      SELECT CAST(year(done) * 12 + month(done) AS BIGINT) AS month_id,
        CAST(COUNT(*) AS BIGINT) AS n_completed
      FROM done GROUP BY 1),
    ledger AS (
      SELECT COALESCE(o.month_id, c.month_id) AS month_id,
        COALESCE(n_opened, 0) AS n_opened,
        COALESCE(n_completed, 0) AS n_completed
      FROM opened o FULL OUTER JOIN completed c USING (month_id)),
    cum AS (
      SELECT *, CAST(SUM(n_opened - n_completed)
        OVER (ORDER BY month_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        AS backlog
      FROM ledger)
    SELECT month_id, n_opened, n_completed, backlog,
      ROW_NUMBER() OVER (ORDER BY backlog DESC, month_id) = 1 AS is_peak
    FROM cum ORDER BY month_id"""

  // ---- q257: price-volume decomposition of revenue growth ---------------
  // The FP&A question behind every revenue delta: did we sell MORE, or
  // at HIGHER prices? Per brand, revenue and quantity in the first vs
  // second half of the shipment calendar (midpoint split on the month
  // id — an exact integer both engines derive identically), decomposed
  // multiplicatively: (1+g_R) = (1+g_P)·(1+g_Q) with growth rates in
  // exact floor-div ppm — g_Q from quantities, g_P from the
  // cross-product identity R2·Q1/(R1·Q2), so the split never touches a
  // non-integer unit price. A brand absent from either half degrades to
  // NULL growths banded 'new_or_exited', not a crash.
  //
  // Exactness: revenue/quantity quantize element-wise (cents /
  // centi-units); every div has nonnegative operands on Decimal(38,0) ↔
  // HUGEINT with nullif guards. Scale shape: ONE lineitem scan with the
  // part dim broadcast and the 1-row month-bounds attach, conditional
  // aggregation into the two period columns (no self-join), |brands|-row
  // output.
  def q257PriceVolumeMix(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .cast("long").as("m"),
        toUnits(col("l_extendedprice")).as("rev"),
        toUnits(col("l_quantity")).as("qty"))
    val bounds = li.agg(min(col("m")).as("mn"), max(col("m")).as("mx"))
    li.crossJoin(broadcast(bounds))
      .withColumn("h2", col("m") >= expr("(mn + mx + 1) div 2"))
      .groupBy(col("p_brand"))
      .agg(sum(when(!col("h2"), col("rev")).otherwise(0L)).as("r1"),
        sum(when(col("h2"), col("rev")).otherwise(0L)).as("r2"),
        sum(when(!col("h2"), col("qty")).otherwise(0L)).as("q1"),
        sum(when(col("h2"), col("qty")).otherwise(0L)).as("q2"))
      .withColumn("rev_growth_ppm", expr(
        "cast(cast(r2 as decimal(38,0)) * 1000000" +
          " div nullif(r1, 0) as bigint) - 1000000"))
      .withColumn("volume_growth_ppm", expr(
        "cast(cast(q2 as decimal(38,0)) * 1000000" +
          " div nullif(q1, 0) as bigint) - 1000000"))
      .withColumn("price_growth_ppm", expr(
        "cast(cast(r2 as decimal(38,0)) * q1 * 1000000" +
          " div nullif(cast(r1 as decimal(38,0)) * q2, 0) as bigint)" +
          " - 1000000"))
      .withColumn("growth_band",
        when(col("rev_growth_ppm").isNull || col("price_growth_ppm").isNull,
          "new_or_exited")
          .when(abs(col("price_growth_ppm")) >
            abs(col("volume_growth_ppm")) * 2, "price_led")
          .when(abs(col("volume_growth_ppm")) >
            abs(col("price_growth_ppm")) * 2, "volume_led")
          .otherwise("balanced"))
      .select(col("p_brand"), col("r1"), col("r2"), col("q1"), col("q2"),
        col("rev_growth_ppm"), col("volume_growth_ppm"),
        col("price_growth_ppm"), col("growth_band"))
      .orderBy(col("p_brand"))
  }

  val q257Sql: String = s"""
    WITH li AS (
      SELECT p_brand,
        CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS m,
        ${Fx.sqlUnits("l_extendedprice")} AS rev,
        ${Fx.sqlUnits("l_quantity")} AS qty
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    bounds AS (SELECT MIN(m) AS mn, MAX(m) AS mx FROM li),
    agg AS (
      SELECT p_brand,
        CAST(SUM(CASE WHEN m < (mn + mx + 1) // 2 THEN rev ELSE 0 END)
          AS BIGINT) AS r1,
        CAST(SUM(CASE WHEN m >= (mn + mx + 1) // 2 THEN rev ELSE 0 END)
          AS BIGINT) AS r2,
        CAST(SUM(CASE WHEN m < (mn + mx + 1) // 2 THEN qty ELSE 0 END)
          AS BIGINT) AS q1,
        CAST(SUM(CASE WHEN m >= (mn + mx + 1) // 2 THEN qty ELSE 0 END)
          AS BIGINT) AS q2
      FROM li CROSS JOIN bounds GROUP BY 1),
    g AS (
      SELECT p_brand, r1, r2, q1, q2,
        CAST(CAST(r2 AS HUGEINT) * 1000000 // nullif(r1, 0) AS BIGINT)
          - 1000000 AS rev_growth_ppm,
        CAST(CAST(q2 AS HUGEINT) * 1000000 // nullif(q1, 0) AS BIGINT)
          - 1000000 AS volume_growth_ppm,
        CAST(CAST(r2 AS HUGEINT) * q1 * 1000000
          // nullif(CAST(r1 AS HUGEINT) * q2, 0) AS BIGINT)
          - 1000000 AS price_growth_ppm
      FROM agg)
    SELECT p_brand, r1, r2, q1, q2, rev_growth_ppm, volume_growth_ppm,
      price_growth_ppm,
      CASE WHEN rev_growth_ppm IS NULL OR price_growth_ppm IS NULL
             THEN 'new_or_exited'
           WHEN abs(price_growth_ppm) > abs(volume_growth_ppm) * 2
             THEN 'price_led'
           WHEN abs(volume_growth_ppm) > abs(price_growth_ppm) * 2
             THEN 'volume_led'
           ELSE 'balanced' END AS growth_band
    FROM g ORDER BY p_brand"""

  // ---- q259: empirical-Bayes shrunk return rates (James–Stein class) ----
  // q250 fixes the RANKING of small-sample rates; this fixes the
  // ESTIMATES: per-brand return rates shrunk toward the grand rate by
  // the weighted method-of-moments empirical-Bayes factor c = τ²/(τ² + v_h),
  // where τ² is the between-brand variance net of sampling noise and
  // v_h ≈ p(1−p)/n the brand's own noise. A 2-line brand reports the
  // grand rate (c ≈ 0); a 10 000-line brand keeps its own (c ≈ 1) —
  // the estimator every per-segment dashboard should publish instead
  // of raw rates.
  //
  // Exactness: the WHOLE estimator runs on integer ppm — rates floor to
  // ppm first, then moments (v_h, the between-variance, τ²) and the
  // shrink factor stay exact Decimal(38,0)/HUGEINT arithmetic, and the
  // signed shrink product travels through a sign-split floor-div. Zero
  // IEEE ops in the hash path (the q228 discipline applied to
  // empirical Bayes). Scale shape: one lineitem scan with the part dim
  // broadcast onto the |brands| ledger; two 1-row moment attaches.
  def q259ShrunkRates(s: SparkSession, d: String): DataFrame = {
    val g = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("r"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"), sum(col("r")).as("n_returns"))
      .withColumn("p_ppm", expr(
        "cast(cast(n_returns as decimal(38,0)) * 1000000" +
          " div n_lines as bigint)"))
      .withColumn("v_h", expr(
        "cast(cast(p_ppm as decimal(38,0)) * (1000000 - p_ppm)" +
          " div n_lines as bigint)"))
    val grand = g.agg(sum(col("n_lines")).as("nt"),
        sum(col("n_returns")).as("rt"))
      .withColumn("grand_ppm", expr(
        "cast(cast(rt as decimal(38,0)) * 1000000 div nullif(nt, 0)" +
          " as bigint)"))
      .select(col("grand_ppm"))
    val withGrand = g.crossJoin(broadcast(grand))
    // weighted (one-way-ANOVA) moments: an unweighted mean of v_h lets
    // one tiny group's huge sampling noise swamp the between-variance
    // and zero the shrinkage for everyone — weighting by n_lines is
    // both the standard estimator and the robust one
    val tau = withGrand.agg(
        sum(col("n_lines")).as("nt"),
        sum(expr("cast(n_lines as decimal(38,0))" +
          " * (p_ppm - grand_ppm) * (p_ppm - grand_ppm)")).as("ssb"),
        sum(expr("cast(n_lines as decimal(38,0)) * v_h")).as("sv"))
      .select(
        expr("greatest(0, cast(ssb div nt as bigint)" +
          " - cast(sv div nt as bigint))").as("tau2"))
    withGrand.crossJoin(broadcast(tau))
      .withColumn("c_ppm", coalesce(expr(
        "cast(cast(tau2 as decimal(38,0)) * 1000000" +
          " div nullif(tau2 + v_h, 0) as bigint)"), lit(0L)))
      .withColumn("shrunk_ppm", expr(
        "grand_ppm + case when p_ppm >= grand_ppm" +
          " then cast(cast(c_ppm as decimal(38,0)) * (p_ppm - grand_ppm)" +
          " div 1000000 as bigint)" +
          " else -cast(cast(c_ppm as decimal(38,0)) * (grand_ppm - p_ppm)" +
          " div 1000000 as bigint) end"))
      .withColumn("band",
        when(col("c_ppm") < 500000L, "strong_shrink")
          .otherwise("mostly_raw"))
      .select(col("p_brand"), col("n_lines"), col("n_returns"),
        col("p_ppm"), col("c_ppm"), col("shrunk_ppm"), col("band"))
      .orderBy(col("p_brand"))
  }

  val q259Sql: String = """
    WITH g AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_returns
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1),
    gp AS (
      SELECT *, CAST(CAST(n_returns AS HUGEINT) * 1000000 // n_lines
          AS BIGINT) AS p_ppm,
        CAST(CAST(CAST(n_returns AS HUGEINT) * 1000000 // n_lines
            AS HUGEINT)
          * (1000000 - CAST(n_returns AS HUGEINT) * 1000000 // n_lines)
          // n_lines AS BIGINT) AS v_h
      FROM g),
    grand AS (
      SELECT CAST(CAST(SUM(n_returns) AS HUGEINT) * 1000000
          // nullif(SUM(n_lines), 0) AS BIGINT) AS grand_ppm
      FROM gp),
    tau AS (
      SELECT greatest(0,
        CAST(SUM(CAST(n_lines AS HUGEINT) * (p_ppm - grand_ppm)
          * (p_ppm - grand_ppm)) // SUM(CAST(n_lines AS HUGEINT))
          AS BIGINT)
        - CAST(SUM(CAST(n_lines AS HUGEINT) * v_h)
          // SUM(CAST(n_lines AS HUGEINT)) AS BIGINT)) AS tau2
      FROM gp CROSS JOIN grand),
    sc AS (
      SELECT p_brand, n_lines, n_returns, p_ppm,
        COALESCE(CAST(CAST(tau2 AS HUGEINT) * 1000000
          // nullif(tau2 + v_h, 0) AS BIGINT), 0) AS c_ppm,
        grand_ppm
      FROM gp CROSS JOIN grand CROSS JOIN tau)
    SELECT p_brand, n_lines, n_returns, p_ppm, c_ppm,
      grand_ppm + CASE WHEN p_ppm >= grand_ppm
        THEN CAST(CAST(c_ppm AS HUGEINT) * (p_ppm - grand_ppm)
          // 1000000 AS BIGINT)
        ELSE -CAST(CAST(c_ppm AS HUGEINT) * (grand_ppm - p_ppm)
          // 1000000 AS BIGINT) END AS shrunk_ppm,
      CASE WHEN c_ppm < 500000 THEN 'strong_shrink'
           ELSE 'mostly_raw' END AS band
    FROM sc ORDER BY p_brand"""

  // ---- q270: month-over-month distribution stability (PSI-family) -------
  // The monitoring read a finance/data-platform team runs on every
  // landed month: did the SHAPE of the order-value distribution move,
  // not just its mean (q219 tracks the level; a mix shift at constant
  // mean is invisible there)? The industry metric family is PSI over
  // fixed quantile bins; PSI itself needs ln (cross-engine-inexact, the
  // q73 lesson), so the operator reports the total-variation distance —
  // TV = Σ_b |p_b − q_b| / 2 over the 10 global decile bins, in EXACT
  // integer ppm — which bounds PSI-style divergences and carries the
  // same signal (which months the mix moved, and by how much).
  //
  // Bins: global decile cut points from the value-histogram contract
  // (q261's rank convention — cut_i = min cents with cum·10 ≥ i·n;
  // executor state is O(|cents domain|), never corpus rows); each row
  // bins by counting cuts below it via a 9-element array HOF against
  // the broadcast cut list. Shares are floor-div ppm per (month, bin)
  // on the zero-filled month×bin spine; each month compares to the
  // PREVIOUS calendar month (mi = year·12 + month, so adjacency holds
  // across year boundaries) — a gap month reads 'no_prior', never a
  // comparison against the wrong neighbor. Scale shape: one scan for
  // the histogram, one for the binning; everything after lives on the
  // |months|×10 spine.
  private val StabilityBins = 10

  def q270DistStability(s: SparkSession, d: String): DataFrame = {
    val ms = Tables.orders(s, d)
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("mi"),
        toUnits(col("o_totalprice")).as("cents"))
    val hist = ms.groupBy(col("cents")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy()))
    val cutsArr = hist
      .crossJoin(broadcast(s.range(1, StabilityBins)
        .select(col("id").as("i"))))
      .filter(col("cum") * StabilityBins >= col("i") * col("n"))
      .groupBy(col("i")).agg(min(col("cents")).as("cut"))
      .agg(sort_array(collect_list(col("cut"))).as("cs"))
    val binned = ms.crossJoin(broadcast(cutsArr))
      .withColumn("bin",
        expr("size(filter(cs, c -> cents > c))").cast("long"))
      .groupBy(col("mi"), col("bin")).agg(count(lit(1)).as("c"))
      .persist() // month spine + both sides of the prev join read it
    val months = binned.select(col("mi")).distinct()
    val bins = s.range(0, StabilityBins).select(col("id").as("bin"))
    val grid = months.crossJoin(broadcast(bins))
      .join(binned, Seq("mi", "bin"), "left").na.fill(0L, Seq("c"))
      .withColumn("n_m", sum(col("c")).over(Window.partitionBy(col("mi"))))
      .withColumn("p_ppm", expr("c * 1000000 div nullif(n_m, 0)"))
    val prev = grid.select((col("mi") + 1).as("mi"), col("bin"),
      col("p_ppm").as("q_ppm"))
    grid.join(prev, Seq("mi", "bin"), "left")
      .groupBy(col("mi"))
      .agg(max(col("n_m")).as("n_orders"),
        // prev month present for ALL 10 bins or none (full spine), so
        // sum/max over nulls degrade the whole month, never a subset
        sum(abs(col("p_ppm") - col("q_ppm"))).as("l1"),
        max(abs(col("p_ppm") - col("q_ppm"))).as("max_bin_delta_ppm"))
      .withColumn("tv_ppm", expr("l1 div 2"))
      .withColumn("month_start", expr(
        "make_date(cast((mi - 1) div 12 as int)," +
          " cast((mi - 1) % 12 + 1 as int), 1)"))
      .withColumn("band",
        when(col("tv_ppm").isNull, "no_prior")
          .when(col("tv_ppm") >= 50000L, "shifted")
          .when(col("tv_ppm") >= 20000L, "drifting")
          .otherwise("stable"))
      .select(col("month_start"), col("n_orders"), col("tv_ppm"),
        col("max_bin_delta_ppm"), col("band"))
      .orderBy(col("month_start"))
  }

  val q270Sql: String = s"""
    WITH ms AS (
      SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
        AS mi, ${sqlUnits("o_totalprice")} AS cents
      FROM orders),
    hist AS (
      SELECT cents, CAST(COUNT(*) AS BIGINT) AS c FROM ms GROUP BY 1),
    hc AS (
      SELECT cents,
        CAST(SUM(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
          AS BIGINT) AS cum,
        CAST(SUM(c) OVER () AS BIGINT) AS n
      FROM hist),
    cuts AS (
      SELECT i, MIN(cents) AS cut
      FROM hc CROSS JOIN (SELECT CAST(unnest(range(1, $StabilityBins))
        AS BIGINT) AS i)
      WHERE cum * $StabilityBins >= i * n GROUP BY 1),
    ca AS (SELECT list_sort(list(cut)) AS cs FROM cuts),
    binned AS (
      SELECT mi, CAST(len(list_filter(cs, c -> cents > c)) AS BIGINT)
        AS bin, CAST(COUNT(*) AS BIGINT) AS c
      FROM ms CROSS JOIN ca GROUP BY 1, 2),
    grid AS (
      SELECT m.mi, b.bin, COALESCE(binned.c, 0) AS c
      FROM (SELECT DISTINCT mi FROM binned) m
      CROSS JOIN (SELECT CAST(unnest(range(0, $StabilityBins)) AS BIGINT)
        AS bin) b
      LEFT JOIN binned ON binned.mi = m.mi AND binned.bin = b.bin),
    shares AS (
      SELECT mi, bin, c,
        CAST(SUM(c) OVER (PARTITION BY mi) AS BIGINT) AS n_m
      FROM grid),
    pp AS (
      SELECT mi, bin, n_m,
        CAST(c * 1000000 // nullif(n_m, 0) AS BIGINT) AS p_ppm
      FROM shares),
    dd AS (
      SELECT a.mi, MAX(a.n_m) AS n_orders,
        CAST(SUM(abs(a.p_ppm - b.p_ppm)) // 2 AS BIGINT) AS tv_ppm,
        CAST(MAX(abs(a.p_ppm - b.p_ppm)) AS BIGINT) AS max_bin_delta_ppm
      FROM pp a LEFT JOIN pp b ON b.mi = a.mi - 1 AND b.bin = a.bin
      GROUP BY 1)
    -- (tv halving is integer // in both engines: Spark casting a double
    -- truncates while DuckDB's double->int cast rounds, so plain /2
    -- would diverge on odd L1 masses)
    SELECT make_date(CAST((mi - 1) // 12 AS INTEGER),
        CAST((mi - 1) % 12 + 1 AS INTEGER), 1) AS month_start,
      n_orders, tv_ppm, max_bin_delta_ppm,
      CASE WHEN tv_ppm IS NULL THEN 'no_prior'
           WHEN tv_ppm >= 50000 THEN 'shifted'
           WHEN tv_ppm >= 20000 THEN 'drifting'
           ELSE 'stable' END AS band
    FROM dd ORDER BY month_start"""

  // ---- q275: frequent triple rules (apriori level 3) ---------------------
  // q196 stops at pairs; the bundles a merchandiser actually ships are
  // bigger — level-3 association over the same order baskets: every
  // item triple co-bought ≥ minsup times, with support and the
  // three-way lift c·N²/(c_a·c_b·c_c) against full independence in
  // exact staged ppm. Downward closure makes the pair-level apriori
  // prune IMPLICIT in the output (a triple at support s has all three
  // sub-pairs at ≥ s), so the working prune is the item floor: baskets
  // restrict to frequent items BEFORE the C(k,3) in-basket enumeration,
  // which bounds the blowup by the frequent-item basket width exactly
  // as q196's pair enumeration does — and since r13 the width itself is
  // capped: baskets wider than TripleBasketCap frequent items are
  // dropped (q196's giant-basket treatment, one level harsher because
  // the growth here is CUBIC), with the dropped mass on the broadcast
  // ledger columns. Scale shape: one distinct collapse, one basket
  // groupBy, map-side triple explosion bounded at C(32,3) per basket,
  // one triple count — no join ever touches the corpus twice.
  def q275BasketTriples(s: SparkSession, d: String): DataFrame = {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .persist() // item supports, basket arrays and N all read it
    val supp = items.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("c_item"))
      .filter(col("c_item") >= PairMinSup)
    val nOrders = items.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val baskets = items.join(supp, Seq("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_partkey"))).as("ps"))
      .filter(size(col("ps")) >= 3)
      .persist() // ledger + kept-basket explode both read it
    val ledger = baskets.filter(size(col("ps")) > TripleBasketCap)
      .agg(count(lit(1)).as("capped_baskets"),
        coalesce(sum(size(col("ps")).cast("long")), lit(0L))
          .as("capped_item_slots"))
    baskets.filter(size(col("ps")) <= TripleBasketCap)
      .select(explode(expr(
        """flatten(flatten(transform(sequence(0, size(ps) - 3),
             i -> transform(sequence(i + 1, size(ps) - 2),
               j -> transform(sequence(j + 1, size(ps) - 1),
                 k -> struct(ps[i] AS pa, ps[j] AS pb,
                   ps[k] AS pc))))))""")).as("t"))
      .groupBy(col("t.pa").as("pa"), col("t.pb").as("pb"),
        col("t.pc").as("pc"))
      .agg(count(lit(1)).as("c_triple"))
      .filter(col("c_triple") >= PairMinSup)
      .join(supp.select(col("l_partkey").as("pa"),
        col("c_item").as("c_a")), Seq("pa"))
      .join(supp.select(col("l_partkey").as("pb"),
        col("c_item").as("c_b")), Seq("pb"))
      .join(supp.select(col("l_partkey").as("pc"),
        col("c_item").as("c_c")), Seq("pc"))
      .crossJoin(broadcast(nOrders))
      .crossJoin(broadcast(ledger))
      .withColumn("support_ppm",
        expr("cast(c_triple as decimal(38,0)) * 1000000 div n_orders"))
      // lift3 = c·N²/(c_a·c_b·c_c), staged so every intermediate is a
      // floor-div of bounded magnitude (the q196 lift shape, one level
      // deeper) — and CLAMPED at 1e15 ppm (a 1e9× lift): with the
      // minsup floors all at 2, the unclamped value reaches c·N²/8·1e6
      // ≈ 2.5e23 at 1e9 orders, past BIGINT — where Spark's final div
      // nulls while DuckDB's HUGEINT→BIGINT cast errors. The clamp is
      // applied BEFORE the overflowing quotient via the exact integer
      // equivalence floor(s2·N/c_c) > C ⇔ s2·N ≥ (C+1)·c_c (both sides
      // ≤ ~5e29 on Decimal(38,0)), and as plain LEAST on the DuckDB
      // side — bit-identical by construction, and any clamped row is
      // unambiguous: 1e15 means "off the lift scale", never a real value.
      .withColumn("s2", expr(
        "cast(cast(c_triple as decimal(38,0)) * 1000000" +
          " div c_a as decimal(38,0)) * n_orders div c_b"))
      .withColumn("lift3_ppm", expr(
        "case when cast(s2 as decimal(38,0)) * n_orders >=" +
          " cast(1000000000000001 as decimal(38,0)) * c_c" +
          " then 1000000000000000" +
          " else cast(s2 as decimal(38,0)) * n_orders div c_c end"))
      .select(col("pa"), col("pb"), col("pc"), col("c_triple"),
        col("c_a"), col("c_b"), col("c_c"),
        col("support_ppm").cast("long").as("support_ppm"),
        col("lift3_ppm").cast("long").as("lift3_ppm"),
        col("capped_baskets"), col("capped_item_slots"))
      .orderBy(col("pa"), col("pb"), col("pc"))
  }

  val q275Sql: String = s"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    supp AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c_item
      FROM items GROUP BY 1 HAVING COUNT(*) >= $PairMinSup),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM items),
    fitems AS (
      SELECT l_orderkey, items.l_partkey AS p
      FROM items JOIN supp ON items.l_partkey = supp.l_partkey),
    widths AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS w
      FROM fitems GROUP BY 1 HAVING COUNT(*) >= 3),
    ledger AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS capped_baskets,
        CAST(COALESCE(SUM(w), 0) AS BIGINT) AS capped_item_slots
      FROM widths WHERE w > $TripleBasketCap),
    kept AS (
      SELECT fitems.* FROM fitems
      JOIN widths ON widths.l_orderkey = fitems.l_orderkey
      WHERE widths.w <= $TripleBasketCap),
    trip AS (
      -- every relation pair carries an equi edge on l_orderkey: with
      -- only (a,b) and (a,c) keyed, the optimizer is free to start from
      -- the (b,c) pair whose sole predicate is the inequality — a
      -- cross product that spilled tens of GB at sf0.1
      SELECT a.p AS pa, b.p AS pb, c.p AS pc,
        CAST(COUNT(*) AS BIGINT) AS c_triple
      FROM kept a
      JOIN kept b ON a.l_orderkey = b.l_orderkey AND a.p < b.p
      JOIN kept c ON a.l_orderkey = c.l_orderkey
        AND b.l_orderkey = c.l_orderkey AND b.p < c.p
      GROUP BY 1, 2, 3 HAVING COUNT(*) >= $PairMinSup)
    SELECT trip.pa, trip.pb, trip.pc, c_triple,
      sa.c_item AS c_a, sb.c_item AS c_b, sc.c_item AS c_c,
      CAST(CAST(c_triple AS HUGEINT) * 1000000 // n_orders AS BIGINT)
        AS support_ppm,
      CAST(LEAST(CAST(c_triple AS HUGEINT) * 1000000 // sa.c_item
        * n_orders // sb.c_item
        * n_orders // sc.c_item, 1000000000000000) AS BIGINT) AS lift3_ppm,
      capped_baskets, capped_item_slots
    FROM trip
    JOIN supp sa ON sa.l_partkey = trip.pa
    JOIN supp sb ON sb.l_partkey = trip.pb
    JOIN supp sc ON sc.l_partkey = trip.pc
    CROSS JOIN n
    CROSS JOIN ledger
    ORDER BY trip.pa, trip.pb, trip.pc"""

  // ---- q277: item-item collaborative-filtering neighbors ---------------
  // The retrieval half of an item-to-item recommender (Linden et al.,
  // "Amazon.com Recommendations", IEEE Internet Computing 2003): each
  // catalog item's nearest neighbors by co-purchase COSINE
  // cos(a,b) = c_pair / √(c_a·c_b) — the angle between the two items'
  // binary order-membership vectors. Distinct from q196/q275 (support /
  // confidence / lift RULES): this ranks a per-item neighbor list, the
  // artifact a "customers also bought" serving layer ships.
  //
  // Candidate generation reuses the q196 scale discipline wholesale:
  // apriori item floor, per-basket map-side pair explosion from the
  // sorted distinct-item list (never a lineitem self-join), the
  // PairBasketCap giant-basket drop with its broadcast ledger, and a
  // pair-support floor. The report keys on the CfHeadItems highest-
  // support items (exact global top-k: support desc, partkey asc — a
  // TakeOrdered on the |catalog|-bounded support frame, never a corpus
  // sort) and keeps CfTopK neighbors per head item via a window
  // PARTITIONED by item over the head-filtered pair frame (≤ head ×
  // catalog candidate rows before ranking, head-bounded after).
  //
  // Exactness: cos_ppm = c_pair·10⁹ div isqrt(c_a·c_b·10⁶) — the
  // q250-style milli-precision corrected integer root (radicand
  // ≤ 1e24·1e6 = 1e30 at 1e12-order scale, ten decades inside the ±1
  // correction's 3.6e31 validity bound; numerator ≤ 1e21 inside
  // Decimal(38,0)). Neighbor rank ties break by (c_pair desc, partkey
  // asc) — fully ordered.
  private[graft] val CfHeadItems = 20
  private[graft] val CfTopK = 3

  def q277ItemCf(s: SparkSession, d: String): DataFrame = {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val supp = items.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("c_item"))
      .filter(col("c_item") >= PairMinSup)
      .persist() // head top-k, both neighbor-support joins, basket filter
    val baskets = items.join(supp, Seq("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_partkey"))).as("ps"))
      .filter(size(col("ps")) >= 2)
      .persist() // ledger + kept-basket explode (q196 contract)
    val ledger = baskets.filter(size(col("ps")) > PairBasketCap)
      .agg(count(lit(1)).as("capped_baskets"))
    val pairs = baskets.filter(size(col("ps")) <= PairBasketCap)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ps) - 2),
             i -> transform(sequence(i + 1, size(ps) - 1),
               j -> struct(ps[i] AS pa, ps[j] AS pb))))""")).as("p"))
      .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .agg(count(lit(1)).as("c_pair"))
      .filter(col("c_pair") >= PairMinSup)
    val head = supp.orderBy(col("c_item").desc, col("l_partkey").asc)
      .limit(CfHeadItems)
      .select(col("l_partkey").as("item"), col("c_item"))
    val nbrs = pairs
      .select(col("pa").as("item"), col("pb").as("nbr"), col("c_pair"))
      .union(pairs
        .select(col("pb").as("item"), col("pa").as("nbr"), col("c_pair")))
      .join(broadcast(head), Seq("item"))
      .join(supp.select(col("l_partkey").as("nbr"),
        col("c_item").as("c_nbr")), Seq("nbr"))
      .withColumn("cf_w2", expr(
        "cast(c_item as decimal(38,0)) * c_nbr * 1000000"))
      .withColumn("cf_s0", expr(
        "cast(floor(sqrt(cast(cf_w2 as double))) as decimal(38,0))"))
      .withColumn("cf_s", expr(
        "case when (cf_s0 + 1) * (cf_s0 + 1) <= cf_w2 then cf_s0 + 1" +
          " when cf_s0 * cf_s0 > cf_w2 then cf_s0 - 1 else cf_s0 end"))
      .withColumn("cos_ppm", expr(
        "cast(cast(c_pair as decimal(38,0)) * 1000000000" +
          " div cf_s as bigint)"))
    nbrs
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("item")).orderBy(col("cos_ppm").desc,
          col("c_pair").desc, col("nbr").asc)).cast("long"))
      .filter(col("rank") <= CfTopK)
      .crossJoin(broadcast(ledger))
      .select(col("item"), col("c_item"), col("rank"), col("nbr"),
        col("c_nbr"), col("c_pair"), col("cos_ppm"), col("capped_baskets"))
      .orderBy(col("item"), col("rank"))
  }

  val q277Sql: String = s"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    supp AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c_item
      FROM items GROUP BY 1 HAVING COUNT(*) >= $PairMinSup),
    fitems AS (
      SELECT l_orderkey, items.l_partkey AS p
      FROM items JOIN supp ON items.l_partkey = supp.l_partkey),
    widths AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS w
      FROM fitems GROUP BY 1 HAVING COUNT(*) >= 2),
    ledger AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS capped_baskets
      FROM widths WHERE w > $PairBasketCap),
    kept AS (
      SELECT fitems.* FROM fitems
      JOIN widths ON widths.l_orderkey = fitems.l_orderkey
      WHERE widths.w <= $PairBasketCap),
    pairs AS (
      SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS c_pair
      FROM kept a JOIN kept b
        ON a.l_orderkey = b.l_orderkey AND a.p < b.p
      GROUP BY 1, 2 HAVING COUNT(*) >= $PairMinSup),
    head AS (
      SELECT l_partkey AS item, c_item FROM supp
      ORDER BY c_item DESC, l_partkey LIMIT $CfHeadItems),
    nbrs AS (
      SELECT item, head.c_item, nbr, sn.c_item AS c_nbr, c_pair
      FROM (
        SELECT pa AS item, pb AS nbr, c_pair FROM pairs
        UNION ALL
        SELECT pb AS item, pa AS nbr, c_pair FROM pairs) u
      JOIN head USING (item)
      JOIN supp sn ON sn.l_partkey = u.nbr),
    cosd AS (
      SELECT *, CAST(c_item AS HUGEINT) * c_nbr * 1000000 AS cf_w2,
        CAST(FLOOR(SQRT(CAST(CAST(c_item AS HUGEINT) * c_nbr * 1000000
          AS DOUBLE))) AS HUGEINT) AS cf_s0
      FROM nbrs),
    cosx AS (
      SELECT *, CASE WHEN (cf_s0 + 1) * (cf_s0 + 1) <= cf_w2
          THEN cf_s0 + 1
        WHEN cf_s0 * cf_s0 > cf_w2 THEN cf_s0 - 1 ELSE cf_s0 END AS cf_s
      FROM cosd),
    ranked AS (
      SELECT item, c_item, nbr, c_nbr, c_pair,
        CAST(CAST(c_pair AS HUGEINT) * 1000000000 // cf_s AS BIGINT)
          AS cos_ppm
      FROM cosx),
    rr AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY item
        ORDER BY cos_ppm DESC, c_pair DESC, nbr) AS BIGINT) AS rank
      FROM ranked)
    SELECT item, c_item, rank, nbr, c_nbr, c_pair, cos_ppm, capped_baskets
    FROM rr CROSS JOIN ledger
    WHERE rank <= $CfTopK
    ORDER BY item, rank"""

  // ---- q278: Kaplan-Meier repurchase survival --------------------------
  // Right-censored survival analysis of the repurchase clock (Kaplan &
  // Meier, JASA 1958) — the one family the registry lacked. Every order
  // starts a clock: it stops at the customer's NEXT order (an observed
  // repurchase event at gap t days) or at the corpus horizon
  // max(o_orderdate) (a censored observation). The estimator
  // S(t) = Π_{t_i ≤ t} (n_i − d_i)/n_i over event days t_i, with the
  // risk set n_i = #{observations with time ≥ t_i} (censored rows leave
  // the risk set after their censor day — the standard
  // censored-after-events tie convention, mirrored verbatim in the
  // oracle). The curve answers "what fraction of purchase clocks survive
  // t days without a repurchase" — the retention statistic a
  // replenishment or win-back campaign is timed against.
  //
  // Exactness: the product is evaluated as the integer recurrence
  // s_i = s_{i-1}·(n_i − d_i) div n_i at 1e12 scale, both engines
  // flooring at every step in the same order — identical by
  // construction, not by approximation (per-step flooring loses < 1 in
  // 1e-12 units; ≤ |days| steps ≪ ppm resolution, and BOTH engines
  // lose exactly the same amount). Intermediates: s ≤ 1e12, n ≤ 1e12
  // observations at 100 TB → s·(n−d) ≤ 1e24, inside Decimal(38,0)
  // and HUGEINT.
  //
  // Scale shape: the gap scan is a per-customer window (partitioned by
  // o_custkey — scales); the corpus collapses map-side onto the
  // calendar-bounded per-day ledger (|days| ≤ a few thousand — the
  // q217/q228 bounded-frame class), the at-risk counts are a reverse
  // running sum on that bounded frame, and the sequential KM recurrence
  // runs once over the ≤|days| event rows via a single-row aggregate
  // HOF (never a driver loop, never a corpus-scale window).
  /** Right-censored repurchase event-day ledger (t, dd events, n at
    * risk) shared by q278 (Kaplan-Meier) and q284 (Nelson-Aalen):
    * every order opens a clock closed by the customer's next order
    * (event) or the corpus horizon (censored). Calendar-bounded
    * (≤ |days| rows); the at-risk counts are a reverse running sum on
    * that bounded frame. */
  private def repurchaseLedger(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"))
    val horizon = o.agg(max(col("od")).as("md"))
    val wNext = Window.partitionBy(col("o_custkey"))
      .orderBy(col("od").asc, col("o_orderkey").asc)
    val obs = o.withColumn("nxt", lead(col("od"), 1).over(wNext))
      .crossJoin(broadcast(horizon))
      .select(
        when(col("nxt").isNotNull, datediff(col("nxt"), col("od")))
          .otherwise(datediff(col("md"), col("od")))
          .cast("long").as("t"),
        col("nxt").isNotNull.as("ev"))
    val led = obs.groupBy(col("t"))
      .agg(sum(when(col("ev"), 1L).otherwise(0L)).as("dd"),
        count(lit(1)).as("m"))
    // at-risk = observations with time ≥ t: reverse running sum over the
    // calendar-bounded day ledger (unpartitioned window, ≤ |days| rows)
    val wRisk = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    led.withColumn("n", sum(col("m")).over(wRisk))
      .filter(col("dd") >= 1L)
      .select(col("t"), col("dd"), col("n"))
  }

  /** Shared oracle CTE chain ending at `ev` = (t, dd, n, i) — the
    * ranked event-day ledger twin of [[repurchaseLedger]]. */
  private val survivalLedgerSql: String = s"""o AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
        lead(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
          ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS nxt
      FROM orders),
    mx AS (SELECT MAX(od) AS md FROM o),
    obs AS (
      SELECT CAST(CASE WHEN nxt IS NOT NULL
          THEN date_diff('day', od, nxt)
          ELSE date_diff('day', od, md) END AS BIGINT) AS t,
        (nxt IS NOT NULL) AS ev
      FROM o CROSS JOIN mx),
    led AS (
      SELECT t, CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS dd,
        CAST(COUNT(*) AS BIGINT) AS m
      FROM obs GROUP BY 1),
    ev AS (
      SELECT t, dd, n,
        CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i
      FROM (SELECT t, dd,
              SUM(m) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                AND UNBOUNDED FOLLOWING) AS n
            FROM led) z
      WHERE dd >= 1)"""

  def q278KmRepurchase(s: SparkSession, d: String): DataFrame = {
    val ev = repurchaseLedger(s, d)
    ev.agg(sort_array(collect_list(struct(col("t"), col("dd"),
        col("n")))).as("steps"))
      .select(explode(expr(
        """aggregate(steps,
             struct(cast(1000000000000 as decimal(38,0)) as s,
               cast(array() as
                 array<struct<t:bigint,dd:bigint,n:bigint,s:decimal(38,0)>>)
                 as out),
             (acc, x) -> struct(
               cast(acc.s * (x.n - x.dd) div x.n as decimal(38,0)) as s,
               concat(acc.out, array(struct(x.t as t, x.dd as dd,
                 x.n as n,
                 cast(acc.s * (x.n - x.dd) div x.n as decimal(38,0))
                   as s))) as out),
             acc -> acc.out)""")).as("r"))
      .select(col("r.t").as("t_days"), col("r.n").as("n_risk"),
        col("r.dd").as("d_events"),
        expr("cast(r.s div 1000000 as bigint)").as("s_ppm"))
      .orderBy(col("t_days"))
  }

  val q278Sql: String = s"""
    WITH RECURSIVE $survivalLedgerSql,
    km AS (
      SELECT CAST(0 AS BIGINT) AS i, CAST(1000000000000 AS HUGEINT) AS s
      UNION ALL
      SELECT ev.i, (km.s * (ev.n - ev.dd)) // ev.n
      FROM km JOIN ev ON ev.i = km.i + 1)
    SELECT ev.t AS t_days, CAST(ev.n AS BIGINT) AS n_risk,
      ev.dd AS d_events, CAST(km.s // 1000000 AS BIGINT) AS s_ppm
    FROM ev JOIN km ON km.i = ev.i
    ORDER BY t_days"""

  // ---- q284: Nelson-Aalen cumulative repurchase hazard ------------------
  // The hazard-side twin of q278: H(t) = Σ_{t_i ≤ t} d_i/n_i (Nelson
  // 1972, Aalen 1978) estimates the CUMULATIVE instantaneous repurchase
  // rate — where q278's S(t) answers "what fraction survive", H(t)'s
  // increments answer "how hard does day t pull" (flat spans = dormant
  // gap lengths, steep spans = the natural reorder cycle; the spacing
  // of the jumps is what a win-back campaign calendar is tuned to).
  // Shares [[repurchaseLedger]] verbatim.
  //
  // Exactness: each increment floors once — d_i·10¹² div n_i — and the
  // curve is a plain cumulative SUM of those integers over the bounded
  // event-day frame (no recurrence; simpler than the KM product). Both
  // engines floor identical terms, so the curve is identical by
  // construction. Bounds: each term ≤ 1e12 (d ≤ n), the cumulative sum
  // ≤ |days|·1e12 ≤ ~2.5e15 — inside BIGINT with 3 decades to spare.
  def q284NelsonAalen(s: SparkSession, d: String): DataFrame = {
    val ev = repurchaseLedger(s, d)
    ev.withColumn("inc", expr(
        "cast(dd as decimal(38,0)) * 1000000000000 div n"))
      .withColumn("h_ppm", expr(
        "cast(sum(inc) over (order by t rows between unbounded preceding" +
          " and current row) div 1000000 as bigint)"))
      .select(col("t").as("t_days"), col("n").as("n_risk"),
        col("dd").as("d_events"), col("h_ppm"))
      .orderBy(col("t_days"))
  }

  val q284Sql: String = s"""
    WITH $survivalLedgerSql
    SELECT t AS t_days, CAST(n AS BIGINT) AS n_risk, dd AS d_events,
      CAST(SUM(CAST(dd AS HUGEINT) * 1000000000000 // n)
        OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) // 1000000 AS BIGINT)
        AS h_ppm
    FROM ev ORDER BY t_days"""

  // ---- q286: matched-basket price index (Laspeyres/Paasche/Fisher) ------
  // Index-number theory over the corpus' own transactions (ILO CPI
  // manual ch. 15; Fisher, "The Making of Index Numbers", 1922): how
  // much of revenue growth is PRICE vs VOLUME? For each month m vs the
  // corpus' first month 0, over the matched basket (parts traded in
  // both months): Laspeyres = Σ p_m·q_0 / Σ p_0·q_0 weights base
  // volumes (overstates — no substitution), Paasche = Σ p_m·q_m /
  // Σ p_0·q_m weights current volumes (understates), Fisher is their
  // geometric mean — the superlative index the other two bracket.
  // Complements q257's PVM bridge (which decomposes revenue deltas;
  // this prices a CONSTANT basket).
  //
  // Exactness: unit value p_m(part) = cents_m/units_m is a rational;
  // each cross term floors ONCE as cents_m·units_0 div units_m on
  // Decimal(38,0) ↔ HUGEINT (≤ 1e13·1e9 = 1e22 at 1e12-order scale),
  // the four sums are exact, the two ratios floor once into ppm, and
  // Fisher = ±1-corrected isqrt(L_ppm·P_ppm) (radicand ≤ ~1e16 — deep
  // inside the raw-seed validity bound). Zero IEEE ops anywhere.
  //
  // Scale shape: one lineitem scan collapses onto (part × month); the
  // base-month frame equi-joins back per part (shuffle on partkey);
  // the 1-row first-month scalar attaches via broadcast; output is
  // ≤ |months| rows.
  def q286PriceIndex(s: SparkSession, d: String): DataFrame = {
    val pm = Tables.lineitem(s, d)
      .select(col("l_partkey"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
          .cast("long").as("ym"),
        toUnits(col("l_quantity"), 0).as("q"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy(col("l_partkey"), col("ym"))
      .agg(sum(col("q")).as("units"), sum(col("cents")).as("cents"))
      .filter(col("units") > 0L)
      .persist() // base slice + every month read it
    val base = pm.crossJoin(broadcast(pm.agg(min(col("ym")).as("ym0"))))
      .filter(col("ym") === col("ym0"))
      .select(col("l_partkey"), col("ym0"),
        col("units").as("u0"), col("cents").as("c0"))
    val matched = pm.join(base, Seq("l_partkey"))
      .filter(col("ym") > col("ym0"))
    matched
      .withColumn("l_num", expr(
        "cast(cents as decimal(38,0)) * u0 div units"))
      .withColumn("p_den", expr(
        "cast(c0 as decimal(38,0)) * units div u0"))
      .groupBy(col("ym"))
      .agg(count(lit(1)).as("n_matched_parts"),
        sum(expr("cast(l_num as decimal(38,0))")).as("lnum"),
        sum(expr("cast(c0 as decimal(38,0))")).as("lden"),
        sum(expr("cast(cents as decimal(38,0))")).as("pnum"),
        sum(expr("cast(p_den as decimal(38,0))")).as("pden"))
      .withColumn("laspeyres_ppm", expr(
        "cast(lnum * 1000000 div nullif(lden, 0) as bigint)"))
      .withColumn("paasche_ppm", expr(
        "cast(pnum * 1000000 div nullif(pden, 0) as bigint)"))
      .withColumn("f_w2", expr(
        "cast(laspeyres_ppm as decimal(38,0)) * paasche_ppm"))
      .withColumn("f_s0", expr(
        "cast(floor(sqrt(cast(f_w2 as double))) as decimal(38,0))"))
      .withColumn("fisher_ppm", expr(
        """case when f_w2 is null then null else cast(
             case when (f_s0 + 1) * (f_s0 + 1) <= f_w2 then f_s0 + 1
               when f_s0 * f_s0 > f_w2 then f_s0 - 1 else f_s0 end
             as bigint) end"""))
      .select(col("ym"), col("n_matched_parts"), col("laspeyres_ppm"),
        col("paasche_ppm"), col("fisher_ppm"))
      .orderBy(col("ym"))
  }

  val q286Sql: String = """
    WITH pm AS (
      SELECT l_partkey,
        CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT)
          AS ym,
        CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
          AS units,
        CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0
          + 0.5) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem
      GROUP BY 1, 2 HAVING SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) > 0),
    m0 AS (SELECT MIN(ym) AS ym0 FROM pm),
    base AS (
      SELECT l_partkey, ym0, units AS u0, cents AS c0
      FROM pm CROSS JOIN m0 WHERE ym = ym0),
    matched AS (
      SELECT pm.ym, pm.units, pm.cents, b.u0, b.c0
      FROM pm JOIN base b ON b.l_partkey = pm.l_partkey
      WHERE pm.ym > b.ym0),
    agg AS (
      SELECT ym, CAST(COUNT(*) AS BIGINT) AS n_matched_parts,
        SUM(CAST(cents AS HUGEINT) * u0 // units) AS lnum,
        SUM(CAST(c0 AS HUGEINT)) AS lden,
        SUM(CAST(cents AS HUGEINT)) AS pnum,
        SUM(CAST(c0 AS HUGEINT) * units // u0) AS pden
      FROM matched GROUP BY 1),
    ratios AS (
      SELECT ym, n_matched_parts,
        CAST(lnum * 1000000 // NULLIF(lden, 0) AS BIGINT)
          AS laspeyres_ppm,
        CAST(pnum * 1000000 // NULLIF(pden, 0) AS BIGINT) AS paasche_ppm
      FROM agg),
    fis AS (
      SELECT *, CAST(laspeyres_ppm AS HUGEINT) * paasche_ppm AS f_w2,
        CAST(FLOOR(SQRT(CAST(CAST(laspeyres_ppm AS HUGEINT) * paasche_ppm
          AS DOUBLE))) AS HUGEINT) AS f_s0
      FROM ratios)
    SELECT ym, n_matched_parts, laspeyres_ppm, paasche_ppm,
      CASE WHEN f_w2 IS NULL THEN NULL ELSE CAST(
        CASE WHEN (f_s0 + 1) * (f_s0 + 1) <= f_w2 THEN f_s0 + 1
          WHEN f_s0 * f_s0 > f_w2 THEN f_s0 - 1 ELSE f_s0 END
        AS BIGINT) END AS fisher_ppm
    FROM fis ORDER BY ym"""

  // ---- q289: stockout-gap suspects (inter-sale gap audit) ---------------
  // Demand history shows stockouts as SILENCE: a part that normally
  // sells every few days going quiet for weeks is more likely
  // unavailable than unwanted (the censored-demand problem every
  // forecaster must clean before fitting — a model trained on stockout
  // zeros learns phantom seasonality). Per part: the maximal gap
  // between consecutive sale DAYS (plus the trailing gap to the corpus
  // horizon — an ongoing stockout has its longest gap still open) in
  // ratio to the expected gap horizon/n_sale_days. gap_ratio =
  // max_gap·n_days/horizon ≥ 5 with n_days ≥ 12 flags a suspect; the
  // exact global top-20 by (ratio, part) ships with the corpus suspect
  // count so quiet catalogs still return a frame.
  //
  // Exactness: gaps and counts are integers; gap_ratio_ppm =
  // max_gap·n_days·1e6 div horizon floors once (≤ 2.5e3·2.5e3·1e6 ≈
  // 6e12 — BIGINT-safe even before the Decimal staging); the flag is
  // the cross-multiplication max_gap·n_days ≥ 5·horizon.
  //
  // Scale shape: one lineitem scan collapses onto distinct (part,
  // sale-day); the gap window is PARTITIONED by part (scales); the
  // 1-row horizon attaches by broadcast; the report is an exact
  // TakeOrdered top-20.
  private[graft] val StockoutMinDays = 12L
  private[graft] val StockoutRatio = 5L

  def q289StockoutGaps(s: SparkSession, d: String): DataFrame = {
    val sales = Tables.lineitem(s, d)
      .select(col("l_partkey"),
        col("l_shipdate").cast("date").as("sd")).distinct()
    val horizon = sales.agg(min(col("sd")).as("h0"), max(col("sd")).as("h1"))
    val wPart = Window.partitionBy(col("l_partkey"))
      .orderBy(col("sd").asc)
    val gaps = sales
      .withColumn("nxt", lead(col("sd"), 1).over(wPart))
      .crossJoin(broadcast(horizon))
      .withColumn("gap",
        when(col("nxt").isNotNull, datediff(col("nxt"), col("sd")))
          .otherwise(datediff(col("h1"), col("sd"))).cast("long"))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_sale_days"), max(col("gap")).as("max_gap"),
        max(expr("datediff(h1, h0)")).cast("long").as("horizon_days"))
      .filter(col("n_sale_days") >= StockoutMinDays &&
        col("horizon_days") > 0L)
    val scored = gaps
      .withColumn("gap_ratio_ppm", expr(
        "cast(cast(max_gap as decimal(38,0)) * n_sale_days * 1000000" +
          " div horizon_days as bigint)"))
      .withColumn("is_suspect", expr(
        s"max_gap * n_sale_days >= $StockoutRatio * horizon_days"))
      .persist() // suspect count + top-20 read it
    val nSus = scored.agg(
      sum(when(col("is_suspect"), 1L).otherwise(0L)).as("n_suspects"))
    scored.orderBy(col("gap_ratio_ppm").desc, col("l_partkey").asc)
      .limit(20)
      .crossJoin(broadcast(nSus))
      .select(col("l_partkey"), col("n_sale_days"), col("max_gap"),
        col("horizon_days"), col("gap_ratio_ppm"), col("is_suspect"),
        col("n_suspects"))
      .orderBy(col("gap_ratio_ppm").desc, col("l_partkey").asc)
  }

  val q289Sql: String = s"""
    WITH sales AS (
      SELECT DISTINCT l_partkey, CAST(l_shipdate AS DATE) AS sd
      FROM lineitem),
    hz AS (SELECT MIN(sd) AS h0, MAX(sd) AS h1 FROM sales),
    gaps AS (
      SELECT l_partkey,
        CAST(COUNT(*) AS BIGINT) AS n_sale_days,
        CAST(MAX(gap) AS BIGINT) AS max_gap,
        CAST(MAX(date_diff('day', h0, h1)) AS BIGINT) AS horizon_days
      FROM (
        SELECT l_partkey, h0, h1,
          CASE WHEN nxt IS NOT NULL THEN date_diff('day', sd, nxt)
            ELSE date_diff('day', sd, h1) END AS gap
        FROM (SELECT l_partkey, sd,
                lead(sd) OVER (PARTITION BY l_partkey ORDER BY sd) AS nxt
              FROM sales) x CROSS JOIN hz) g
      GROUP BY 1
      HAVING COUNT(*) >= $StockoutMinDays
        AND MAX(date_diff('day', h0, h1)) > 0),
    scored AS (
      SELECT *, CAST(CAST(max_gap AS HUGEINT) * n_sale_days * 1000000
          // horizon_days AS BIGINT) AS gap_ratio_ppm,
        max_gap * n_sale_days >= $StockoutRatio * horizon_days
          AS is_suspect
      FROM gaps),
    ns AS (
      SELECT CAST(SUM(CASE WHEN is_suspect THEN 1 ELSE 0 END) AS BIGINT)
        AS n_suspects
      FROM scored),
    top AS (
      SELECT * FROM scored
      ORDER BY gap_ratio_ppm DESC, l_partkey LIMIT 20)
    SELECT l_partkey, n_sale_days, max_gap, horizon_days, gap_ratio_ppm,
      is_suspect, n_suspects
    FROM top CROSS JOIN ns
    ORDER BY gap_ratio_ppm DESC, l_partkey"""

  // ---- q279: ABC-XYZ inventory classification matrix -------------------
  // The two-axis assortment grid supply planning runs on: ABC splits the
  // catalog by cumulative revenue share (A carries the first 80%, B to
  // 95%, C the tail — q204's Pareto cut applied as a per-part CLASS),
  // XYZ by demand variability (coefficient of variation of MONTHLY
  // demand over the corpus horizon: X ≤ 0.25 steady, Y ≤ 0.5, Z
  // erratic). The 9-cell matrix (cell part counts, revenue share,
  // demand mass) tells a planner where forecast-driven replenishment
  // works (AX) and where it cannot (CZ).
  //
  // Exactness: monthly demand quantizes to integer units; the CV needs
  // NO per-month division — over an H-month horizon with zero-months
  // included, H²·Var = H·Σq² − (Σq)², so cv_ppm =
  // isqrt((H·Σq² − (Σq)²)·10¹²) div Σq, exact end-to-end. The radicand
  // reaches ~1.4e34 at 1e9-unit part-months over a 120-month horizon —
  // past the ±1 correction's 3.6e31 double-seed validity — so the root
  // uses the q272 posture: double seed, TWO integer Newton steps, then
  // the ±1 correction (exact for radicands ≤ 1e36). ABC cut points are
  // exact Decimal cross-multiplications against total revenue (never a
  // share division); ties in the revenue ranking break by partkey.
  //
  // Scale shape: one lineitem scan collapses onto the (part × month)
  // frame, then onto |parts|; the cumulative-revenue window runs on the
  // |parts|-row aggregate — the q204 vocab-keyed class — and the output
  // is the ≤9-row matrix.
  def q279AbcXyz(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey"),
        toUnits(col("l_quantity"), 0).as("q"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * 100.0 + 0.5).cast("long").as("ru"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
          .cast("long").as("mcode"))
    val pm = li.groupBy(col("l_partkey"), col("mcode"))
      .agg(sum(col("q")).as("mq"), sum(col("ru")).as("mru"))
      .persist() // horizon count + per-part rollup share the scan
    val horizon = pm.select(col("mcode")).distinct()
      .agg(count(lit(1)).as("h_months"))
    val parts = pm.groupBy(col("l_partkey"))
      .agg(sum(col("mq")).as("sum_q"),
        sum(expr("cast(mq as decimal(38,0)) * mq")).as("sumsq_q"),
        sum(col("mru")).as("rev"))
    val wCum = Window.orderBy(col("rev").desc, col("l_partkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val classed = parts.crossJoin(broadcast(horizon))
      .withColumn("cum", sum(col("rev")).over(wCum))
      .withColumn("total", sum(col("rev")).over(wAll))
      .withColumn("abc", expr(
        """case when (cast(cum as decimal(38,0)) - rev) * 5
                  < cast(total as decimal(38,0)) * 4 then 'A'
             when (cast(cum as decimal(38,0)) - rev) * 20
                  < cast(total as decimal(38,0)) * 19 then 'B'
             else 'C' end"""))
      .withColumn("xyz_w2", expr(
        "(cast(h_months as decimal(38,0)) * sumsq_q - cast(sum_q as" +
          " decimal(38,0)) * sum_q) * 1000000000000"))
      .withColumn("xyz_s0", expr(
        "cast(floor(sqrt(cast(xyz_w2 as double))) as decimal(38,0))"))
      .withColumn("xyz_s1", expr(
        "case when xyz_s0 <= 0 then xyz_s0 else" +
          " cast((xyz_s0 + xyz_w2 div xyz_s0) div 2 as decimal(38,0)) end"))
      .withColumn("xyz_sn", expr(
        "case when xyz_s1 <= 0 then xyz_s1 else" +
          " cast((xyz_s1 + xyz_w2 div xyz_s1) div 2 as decimal(38,0)) end"))
      .withColumn("xyz_s", expr(
        "case when (xyz_sn + 1) * (xyz_sn + 1) <= xyz_w2 then xyz_sn + 1" +
          " when xyz_sn * xyz_sn > xyz_w2 then xyz_sn - 1 else xyz_sn end"))
      .withColumn("cv_ppm", expr(
        "cast(xyz_s div nullif(sum_q, 0) as bigint)"))
      .withColumn("xyz", expr(
        """case when cv_ppm <= 250000 then 'X'
             when cv_ppm <= 500000 then 'Y' else 'Z' end"""))
    classed.groupBy(col("abc"), col("xyz"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("rev")).as("rev_cents"),
        sum(col("sum_q")).as("qty_units"))
      .withColumn("rev_share_ppm", expr(
        "cast(cast(rev_cents as decimal(38,0)) * 1000000" +
          " div nullif(sum(rev_cents) over (), 0) as bigint)"))
      .select(col("abc"), col("xyz"), col("n_parts"), col("rev_cents"),
        col("qty_units"), col("rev_share_ppm"))
      .orderBy(col("abc"), col("xyz"))
  }

  val q279Sql: String = """
    WITH li AS (
      SELECT l_partkey,
        CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS q,
        CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
          AS BIGINT) AS ru,
        CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT)
          AS mcode
      FROM lineitem),
    pm AS (
      SELECT l_partkey, mcode, CAST(SUM(q) AS BIGINT) AS mq,
        CAST(SUM(ru) AS BIGINT) AS mru
      FROM li GROUP BY 1, 2),
    h AS (SELECT CAST(COUNT(DISTINCT mcode) AS BIGINT) AS h_months FROM pm),
    parts AS (
      SELECT l_partkey, CAST(SUM(mq) AS BIGINT) AS sum_q,
        SUM(CAST(mq AS HUGEINT) * mq) AS sumsq_q,
        CAST(SUM(mru) AS BIGINT) AS rev
      FROM pm GROUP BY 1),
    cum AS (
      SELECT *, SUM(rev) OVER (ORDER BY rev DESC, l_partkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        SUM(rev) OVER () AS total
      FROM parts CROSS JOIN h),
    abc AS (
      SELECT *, CASE WHEN (CAST(cum AS HUGEINT) - rev) * 5
            < CAST(total AS HUGEINT) * 4 THEN 'A'
          WHEN (CAST(cum AS HUGEINT) - rev) * 20
            < CAST(total AS HUGEINT) * 19 THEN 'B'
          ELSE 'C' END AS abc,
        (CAST(h_months AS HUGEINT) * sumsq_q
          - CAST(sum_q AS HUGEINT) * sum_q) * 1000000000000 AS xyz_w2
      FROM cum),
    s0 AS (
      SELECT *, CAST(FLOOR(SQRT(CAST(xyz_w2 AS DOUBLE))) AS HUGEINT)
        AS xyz_s0
      FROM abc),
    s1 AS (
      SELECT *, CASE WHEN xyz_s0 <= 0 THEN xyz_s0
        ELSE (xyz_s0 + xyz_w2 // xyz_s0) // 2 END AS xyz_s1
      FROM s0),
    sn AS (
      SELECT *, CASE WHEN xyz_s1 <= 0 THEN xyz_s1
        ELSE (xyz_s1 + xyz_w2 // xyz_s1) // 2 END AS xyz_sn
      FROM s1),
    sc AS (
      SELECT *, CASE WHEN (xyz_sn + 1) * (xyz_sn + 1) <= xyz_w2
          THEN xyz_sn + 1
        WHEN xyz_sn * xyz_sn > xyz_w2 THEN xyz_sn - 1
        ELSE xyz_sn END AS xyz_s
      FROM sn),
    xyz AS (
      SELECT *, CASE WHEN cv_ppm <= 250000 THEN 'X'
          WHEN cv_ppm <= 500000 THEN 'Y' ELSE 'Z' END AS xyz
      FROM (SELECT *, CAST(xyz_s // NULLIF(sum_q, 0) AS BIGINT) AS cv_ppm
            FROM sc) t),
    cells AS (
      SELECT abc, xyz, CAST(COUNT(*) AS BIGINT) AS n_parts,
        CAST(SUM(rev) AS BIGINT) AS rev_cents,
        CAST(SUM(sum_q) AS BIGINT) AS qty_units
      FROM xyz GROUP BY 1, 2)
    SELECT abc, xyz, n_parts, rev_cents, qty_units,
      CAST(CAST(rev_cents AS HUGEINT) * 1000000
        // NULLIF(SUM(rev_cents) OVER (), 0) AS BIGINT) AS rev_share_ppm
    FROM cells ORDER BY abc, xyz"""

  // ---- q281: rolling-origin forecast backtest (seasonal-naive vs naive) -
  // The demand-planning evaluation loop: replay history day by day,
  // forecast each day from information strictly before it, and score
  // the errors — the backtest every forecasting system runs before a
  // model earns production traffic (Hyndman & Athanasopoulos, FPP,
  // "evaluating forecast accuracy"). Two standard zero-parameter
  // baselines: seasonal-naive f(t) = y(t−7) (same weekday last week)
  // and naive f(t) = y(t−1); their error RATIO is the MASE-style
  // skill score — seasonal-naive beating naive = the series has real
  // weekly structure a model could exploit; losing = it's a random
  // walk and fancier models need justification.
  //
  // Per evaluation month: SAE (sum of absolute errors) for both
  // baselines, signed bias, WAPE = SAE/Σy in ppm, and
  // mase_ppm = SAE_snaive·1e6 div SAE_naive. Day counts are exact
  // integers; the only divisions are ppm floor-divs of non-negative
  // integers (the signed bias is reported as a raw sum — never
  // divided), so both engines agree bit-for-bit.
  //
  // Scale shape: the corpus collapses map-side onto the per-day count
  // frame; the day spine is generated from the 1-row min/max aggregate
  // (calendar-bounded, gap days count 0 — a lag-7 over a frame with
  // holes would silently compare non-adjacent weeks); the lag windows
  // run on the bounded spine (q217/q228 adjudicated class) and the
  // output is ≤ |months| rows.
  def q281ForecastBacktest(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .select(datediff(col("o_orderdate").cast("date"), lit("1970-01-01"))
        .cast("long").as("di"))
      .groupBy(col("di")).agg(count(lit(1)).as("y"))
    val bounds = daily.agg(min(col("di")).as("mn"), max(col("di")).as("mx"))
    val spine = bounds
      .select(explode(expr("sequence(mn, mx)")).as("di"),
        col("mn"))
    val w = Window.orderBy(col("di"))
    val scored = spine
      .join(daily, Seq("di"), "left")
      .withColumn("y", coalesce(col("y"), lit(0L)))
      .withColumn("f_s", lag(col("y"), 7).over(w))
      .withColumn("f_1", lag(col("y"), 1).over(w))
      .filter(col("di") >= col("mn") + 7)
    scored
      .withColumn("dt", date_add(to_date(lit("1970-01-01")),
        col("di").cast("int")))
      .groupBy((year(col("dt")) * 12 + month(col("dt"))).cast("long")
        .as("ym"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("y")).as("actual_orders"),
        sum(abs(col("y") - col("f_s"))).as("sae_snaive"),
        sum(abs(col("y") - col("f_1"))).as("sae_naive"),
        sum(col("y") - col("f_s")).as("bias_snaive"))
      .withColumn("wape_ppm", expr(
        "cast(cast(sae_snaive as decimal(38,0)) * 1000000" +
          " div nullif(actual_orders, 0) as bigint)"))
      .withColumn("mase_ppm", expr(
        "cast(cast(sae_snaive as decimal(38,0)) * 1000000" +
          " div nullif(sae_naive, 0) as bigint)"))
      .select(col("ym"), col("n_days"), col("actual_orders"),
        col("sae_snaive"), col("sae_naive"), col("bias_snaive"),
        col("wape_ppm"), col("mase_ppm"))
      .orderBy(col("ym"))
  }

  val q281Sql: String = """
    WITH daily AS (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
          AS di,
        CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1),
    bounds AS (SELECT MIN(di) AS mn, MAX(di) AS mx FROM daily),
    spine AS (
      SELECT unnest(generate_series(mn, mx)) AS di, mn FROM bounds),
    filled AS (
      SELECT s.di, s.mn, COALESCE(d.y, 0) AS y
      FROM spine s LEFT JOIN daily d ON d.di = s.di),
    scored AS (
      SELECT di, mn, y,
        lag(y, 7) OVER (ORDER BY di) AS f_s,
        lag(y, 1) OVER (ORDER BY di) AS f_1
      FROM filled),
    monthly AS (
      SELECT CAST(year(dt) * 12 + month(dt) AS BIGINT) AS ym,
        CAST(COUNT(*) AS BIGINT) AS n_days,
        CAST(SUM(y) AS BIGINT) AS actual_orders,
        CAST(SUM(ABS(y - f_s)) AS BIGINT) AS sae_snaive,
        CAST(SUM(ABS(y - f_1)) AS BIGINT) AS sae_naive,
        CAST(SUM(y - f_s) AS BIGINT) AS bias_snaive
      FROM (SELECT *, DATE '1970-01-01' + CAST(di AS INTEGER) AS dt
            FROM scored WHERE di >= mn + 7) t
      GROUP BY 1)
    SELECT ym, n_days, actual_orders, sae_snaive, sae_naive, bias_snaive,
      CAST(CAST(sae_snaive AS HUGEINT) * 1000000
        // NULLIF(actual_orders, 0) AS BIGINT) AS wape_ppm,
      CAST(CAST(sae_snaive AS HUGEINT) * 1000000
        // NULLIF(sae_naive, 0) AS BIGINT) AS mase_ppm
    FROM monthly ORDER BY ym"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q281_forecast_backtest" -> q281ForecastBacktest _,
    "q284_nelson_aalen" -> q284NelsonAalen _,
    "q286_price_index" -> q286PriceIndex _,
    "q289_stockout_gaps" -> q289StockoutGaps _,
    "q277_item_cf" -> q277ItemCf _,
    "q278_km_repurchase" -> q278KmRepurchase _,
    "q279_abc_xyz" -> q279AbcXyz _,
    "q275_basket_triples" -> q275BasketTriples _,
    "q270_dist_stability" -> q270DistStability _,
    "q259_shrunk_rates" -> q259ShrunkRates _,
    "q254_order_backlog" -> q254OrderBacklog _,
    "q257_price_volume_mix" -> q257PriceVolumeMix _,
    "q250_wilson_returns" -> q250WilsonReturns _,
    "q231_discount_response" -> q231DiscountResponse _,
    "q226_dow_seasonality" -> q226DowSeasonality _,
    "q212_cohort_ltv"    -> q212CohortLtv _,
    "q213_supplier_hhi"  -> q213SupplierHhi _,
    "q214_skew_audit"    -> q214SkewAudit _,
    "q215_ship_sla"      -> q215ShipSla _,
    "q209_gini"          -> q209Gini _,
    "q203_order_reconciliation" -> q203OrderReconciliation _,
    "q204_pareto"        -> q204Pareto _,
    "q205_scd2"          -> q205Scd2 _,
    "q206_new_returning" -> q206NewReturning _,
    "q207_path_trigrams" -> q207PathTrigrams _,
    "q195_rfm_segments" -> q195RfmSegments _,
    "q196_basket_pairs" -> q196BasketPairs _,
    "q198_benford"      -> q198Benford _,
    "q200_attribution"  -> q200Attribution _,
    "q201_time_weighted" -> q201TimeWeighted _)

  val oracles: Map[String, String] = Map(
    "q281_forecast_backtest" -> q281Sql,
    "q284_nelson_aalen" -> q284Sql,
    "q286_price_index" -> q286Sql,
    "q289_stockout_gaps" -> q289Sql,
    "q277_item_cf" -> q277Sql,
    "q278_km_repurchase" -> q278Sql,
    "q279_abc_xyz" -> q279Sql,
    "q275_basket_triples" -> q275Sql,
    "q270_dist_stability" -> q270Sql,
    "q259_shrunk_rates" -> q259Sql,
    "q254_order_backlog" -> q254Sql,
    "q257_price_volume_mix" -> q257Sql,
    "q250_wilson_returns" -> q250Sql,
    "q231_discount_response" -> q231Sql,
    "q226_dow_seasonality" -> q226Sql,
    "q212_cohort_ltv"    -> q212Sql,
    "q213_supplier_hhi"  -> q213Sql,
    "q214_skew_audit"    -> q214Sql,
    "q215_ship_sla"      -> q215Sql,
    "q209_gini"          -> q209Sql,
    "q203_order_reconciliation" -> q203Sql,
    "q204_pareto"        -> q204Sql,
    "q205_scd2"          -> q205Sql,
    "q206_new_returning" -> q206Sql,
    "q207_path_trigrams" -> q207Sql,
    "q195_rfm_segments" -> q195Sql,
    "q196_basket_pairs" -> q196Sql,
    "q198_benford"      -> q198Sql,
    "q200_attribution"  -> q200Sql,
    "q201_time_weighted" -> q201Sql)
}
