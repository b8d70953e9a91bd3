package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import Fx._

/** Relational query surface (SURVEY.md §2.2–§2.8).
  *
  * Covers the reference's implied Postgres workload re-expressed Spark-first:
  * filter/project (P1–P4), aggregation A1–A4, rollup/cube A3, window W1–W4,
  * joins J1–J3, set ops §2.7, sorts/top-k §2.6, scalar functions F1–F8.
  * Reference anchors cited per query. Every query is deterministic (total
  * ordering, element-wise integer quantization of float aggregates — see
  * [[Fx]]) so the driver's DuckDB hash-compare is exact.
  *
  * Scale notes: only FIXED-cardinality dims (`nation` = 25 rows, `region`
  * = 5 rows — constants independent of scale factor) carry explicit
  * `broadcast()` hints. SF-scaling tables (`customer`, `supplier`, the
  * facts) get NO hint: AQE + `spark.sql.autoBroadcastJoinThreshold` decide
  * at runtime, so the same plan that broadcasts at sf0.1 degrades safely
  * to a shuffle join at 100× instead of OOM-ing the driver. Fact-fact
  * joins shuffle on their keys; aggregates are partial+final
  * (HashAggregate) automatically; no collect anywhere.
  */
object Relational {

  // ---- q01: flagship pricing summary (A1; reference's implied rollup
  //      workload over cumulative counters, SURVEY.md §2.4) -------------
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(toUnits(col("l_quantity"), 0)).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("sum_disc_price"),
        moneyAvg(col("l_quantity"), 0).as("avg_qty"),
        moneyAvg(col("l_extendedprice")).as("avg_price"),
        moneyAvg(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String = s"""
    SELECT l_returnflag, l_linestatus,
      ${sqlUnitSum("l_quantity", 0)} AS sum_qty,
      ${sqlMoneySum("l_extendedprice")} AS sum_base_price,
      ${sqlMoneySum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
      ${sqlMoneyAvg("l_quantity", 0)} AS avg_qty,
      ${sqlMoneyAvg("l_extendedprice")} AS avg_price,
      ${sqlMoneyAvg("l_discount", 4)} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  // ---- q02: global top-k (§2.6 — TakeOrderedAndProject fusion) --------
  def q02TopkOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  val q02Sql: String = """
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""

  // ---- q03: fact⋈fact⋈dim revenue (J1) --------------------------------
  // customer scales with SF — no broadcast hint (AQE picks BHJ while it
  // fits the threshold, shuffle join beyond; a forced hint would OOM at
  // 100×).
  def q03RevenueBySegment(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o  = Tables.orders(s, d)
    val c  = Tables.customer(s, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("c_mktsegment"))
  }

  val q03Sql: String = s"""
    SELECT c_mktsegment,
      ${sqlMoneySum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
      COUNT(DISTINCT o_orderkey) AS n_orders,
      COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  // ---- q04: full snowflake join to region, yearly revenue (J1) --------
  def q04RegionRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o  = Tables.orders(s, d)
    val c  = Tables.customer(s, d)
    val n  = Tables.nation(s, d)
    val r  = Tables.region(s, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("r_name"), col("o_year"))
  }

  val q04Sql: String = s"""
    SELECT r_name, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
      ${sqlMoneySum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY 1, 2 ORDER BY 1, 2"""

  // ---- q05: left outer join with null-producing side (J2) -------------
  def q05LeftJoin(s: SparkSession, d: String): DataFrame = {
    val o  = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("2000-01-01").cast("timestamp"))
    o.join(li, col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(col("l_orderkey")).as("n_late_lines"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("o_orderpriority"))
  }

  val q05Sql: String = """
    SELECT o_orderpriority,
      COUNT(DISTINCT o_orderkey) AS n_orders,
      COUNT(l_orderkey) AS n_late_lines,
      COUNT(*) AS n_rows
    FROM orders
    LEFT JOIN (SELECT * FROM lineitem
               WHERE l_shipdate > TIMESTAMP '2000-01-01') li
      ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---- q06: left-semi join / EXISTS (J3) ------------------------------
  def q06SemiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val bigOrders = Tables.orders(s, d)
      .filter(col("o_totalprice") > lit(300000.0))
      .select(col("o_custkey"))
    c.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  val q06Sql: String = """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  // ---- q07: left-anti join / NOT EXISTS (J3) --------------------------
  def q07AntiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_totalprice") > lit(300000.0))
      .select(col("o_custkey"))
    val n = Tables.nation(s, d)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_name"))
  }

  val q07Sql: String = """
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
    GROUP BY n_name ORDER BY n_name"""

  // ---- q08: distinct aggregation (A2) ---------------------------------
  def q08DistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        countDistinct(col("o_orderstatus")).as("n_statuses"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  val q08Sql: String = """
    SELECT o_orderpriority,
      COUNT(DISTINCT o_custkey) AS n_custs,
      COUNT(DISTINCT o_orderstatus) AS n_statuses,
      COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---- q09: rollup hierarchy totals (A3) ------------------------------
  // CASCADE form, not `.rollup`: Spark plans rollup/cube as an Expand
  // that runs every input row through the aggregate once PER LEVEL (3×
  // the hash-aggregate CPU at 100 TB); aggregating the finest level once
  // and re-aggregating that compact group frame computes identical
  // sums (count and integer-unit sums are re-aggregable; this corpus
  // has no NULL group keys to conflate with rollup's own NULLs) with
  // one full-data pass. The cascade also restores the SQL-standard
  // empty-input semantics the gate's SF=0 probe caught: a global
  // aggregate emits its grand row (n=0) on an empty source, while
  // Expand-based rollup emits nothing.
  def q09Rollup(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    // eager localCheckpoint: the union branches would otherwise each
    // recompute this aggregate from the corpus (measured: 4 scans, zero
    // exchange reuse under AQE) — the checkpoint pins the ~|segments ×
    // priorities|-row frame so the corpus is scanned ONCE and every
    // level re-aggregates the tiny cached result
    val g2 = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(toUnits(col("o_totalprice"))).as("u"))
      .localCheckpoint()
    def shape(df: DataFrame, gid: Int) = df.select(
      col("c_mktsegment"), col("o_orderpriority"),
      lit(gid).cast("long").as("gid"), col("n"),
      (col("u") / 100.0).as("sum_price"))
    val g1 = g2.groupBy(col("c_mktsegment"))
      .agg(sum(col("n")).as("n"), sum(col("u")).as("u"))
      .withColumn("o_orderpriority", lit(null).cast("string"))
    val g0 = g2.agg(coalesce(sum(col("n")), lit(0L)).as("n"),
        sum(col("u")).as("u"))
      .withColumn("c_mktsegment", lit(null).cast("string"))
      .withColumn("o_orderpriority", lit(null).cast("string"))
    shape(g2, 0).unionByName(shape(g1, 1)).unionByName(shape(g0, 3))
      .orderBy(col("gid"),
        col("c_mktsegment").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  val q09Sql: String = s"""
    SELECT c_mktsegment, o_orderpriority,
      CAST(GROUPING(c_mktsegment) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
      COUNT(*) AS n,
      ${sqlMoneySum("o_totalprice")} AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY ROLLUP (c_mktsegment, o_orderpriority)
    ORDER BY gid, c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST"""

  // ---- q10: cube (A3) -------------------------------------------------
  // Same cascade as q09, one more re-aggregate: cube's 4 levels all
  // derive from the finest (flag, status) group frame, so the full
  // corpus is aggregated ONCE instead of 4× through Expand — and the
  // grand row survives an empty source (SF=0 standard semantics).
  def q10Cube(s: SparkSession, d: String): DataFrame = {
    val g2 = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(toUnits(col("l_quantity"), 0)).as("u"),
        count(lit(1)).as("n"))
      .localCheckpoint() // one corpus scan; levels read the tiny frame
    def shape(df: DataFrame, gid: Int) = df.select(
      col("l_returnflag"), col("l_linestatus"),
      lit(gid).cast("long").as("gid"), col("u").as("sum_qty"), col("n"))
    val gFlag = g2.groupBy(col("l_returnflag"))
      .agg(sum(col("u")).as("u"), sum(col("n")).as("n"))
      .withColumn("l_linestatus", lit(null).cast("string"))
    val gStatus = g2.groupBy(col("l_linestatus"))
      .agg(sum(col("u")).as("u"), sum(col("n")).as("n"))
      .withColumn("l_returnflag", lit(null).cast("string"))
    val g0 = g2.agg(sum(col("u")).as("u"),
        coalesce(sum(col("n")), lit(0L)).as("n"))
      .withColumn("l_returnflag", lit(null).cast("string"))
      .withColumn("l_linestatus", lit(null).cast("string"))
    shape(g2, 0).unionByName(shape(gFlag, 1)).unionByName(shape(gStatus, 2))
      .unionByName(shape(g0, 3))
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  val q10Sql: String = s"""
    SELECT l_returnflag, l_linestatus,
      CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
      ${sqlUnitSum("l_quantity", 0)} AS sum_qty,
      COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""

  // ---- q11: lag / daily delta (W1 — the cumulative-counter workhorse,
  //      SURVEY.md §1.6.4) ---------------------------------------------
  // (l_orderkey, l_linenumber) is NOT unique in this corpus (118k
  // colliding pairs at sf0.1), so the window order extends to l_quantity:
  // rows still tied after that are identical in every column these
  // windows read, so any tie order yields the same lag/avg values. A
  // partial order here makes the results depend on shuffle arrival order
  // (SURVEY.md §7.3.1).
  private def supplierWindow = Window.partitionBy(col("l_suppkey"))
    .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
      col("l_quantity"))

  def q11WindowLag(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"))
      .withColumn("prev_qty", lag(col("l_quantity"), 1).over(supplierWindow))
      .withColumn("delta_qty", col("l_quantity") - col("prev_qty"))
      .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"))

  val q11Sql: String = """
    SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity,
      LAG(l_quantity, 1) OVER w AS prev_qty,
      l_quantity - LAG(l_quantity, 1) OVER w AS delta_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)
    ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber"""

  // ---- q12: 7-row moving average (W3) ---------------------------------
  def q12WindowMovavg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"))
      .withColumn("ma7",
        avg(col("l_quantity")).over(supplierWindow.rowsBetween(-6, 0)))
      .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"))

  val q12Sql: String = """
    SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity,
      AVG(l_quantity) OVER (PARTITION BY l_suppkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7
    FROM lineitem
    ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber"""

  // ---- q13: running total (W4 — cumsum-of-deltas inverse check) -------
  def q13RunningTotal(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_totalprice"))
      .withColumn("running_spend",
        sum(toUnits(col("o_totalprice"))).over(w) / 100.0)
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  val q13Sql: String = s"""
    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
      CAST(SUM(${sqlUnits("o_totalprice")}) OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 1e2
        AS running_spend
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey"""

  // ---- q14: top-k per group via row_number (A4/W2) --------------------
  def q14TopkPerGroup(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  val q14Sql: String = """
    SELECT * FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
        CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
          ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey)
    WHERE rn <= 3 ORDER BY c_mktsegment, rn"""

  // ---- q15: union all + tag (§2.7; states∪counties analog) ------------
  def q15Union(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select(lit("cust").as("src"), col("c_nationkey").as("nationkey"))
    val su = Tables.supplier(s, d)
      .select(lit("supp").as("src"), col("s_nationkey").as("nationkey"))
    c.unionByName(su)
      .groupBy(col("src"), col("nationkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("src"), col("nationkey"))
  }

  val q15Sql: String = """
    SELECT src, nationkey, COUNT(*) AS n FROM (
      SELECT 'cust' AS src, c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT 'supp' AS src, s_nationkey AS nationkey FROM supplier)
    GROUP BY src, nationkey ORDER BY src, nationkey"""

  // ---- q16: intersect / except (§2.7) ---------------------------------
  def q16IntersectExcept(s: SparkSession, d: String): DataFrame = {
    val cn = Tables.customer(s, d)
      .select(col("c_nationkey").as("nationkey")).distinct()
    val sn = Tables.supplier(s, d)
      .select(col("s_nationkey").as("nationkey")).distinct()
    val both = cn.intersect(sn).select(lit("both").as("op"), col("nationkey"))
    val custOnly =
      cn.except(sn).select(lit("cust_only").as("op"), col("nationkey"))
    both.unionByName(custOnly).orderBy(col("op"), col("nationkey"))
  }

  val q16Sql: String = """
    SELECT 'both' AS op, nationkey FROM (
      SELECT DISTINCT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'cust_only' AS op, nationkey FROM (
      SELECT DISTINCT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
    ORDER BY op, nationkey"""

  // ---- q17: date bucketing (F6) ---------------------------------------
  def q17DateBuckets(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(
        date_trunc("month", col("o_orderdate")).as("o_month"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        quarter(col("o_orderdate")).cast("long").as("o_quarter"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_month"))

  val q17Sql: String = s"""
    SELECT date_trunc('month', o_orderdate) AS o_month,
      CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
      CAST(QUARTER(o_orderdate) AS BIGINT) AS o_quarter,
      COUNT(*) AS n,
      ${sqlMoneySum("o_totalprice")} AS sum_price
    FROM orders GROUP BY 1, 2, 3 ORDER BY 1"""

  // ---- q18: JSON extraction from string column (F8) -------------------
  def q18JsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val q18Sql: String = """
    SELECT event_type, COUNT(*) AS n,
      CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
    FROM (SELECT event_type,
            TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
    GROUP BY event_type ORDER BY event_type"""

  // ---- q19: CASE / math scalar functions (F7) -------------------------
  def q19CaseMath(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("price_band",
        when(col("l_extendedprice") < 20000.0, "low")
          .when(col("l_extendedprice") < 60000.0, "mid")
          .otherwise("high"))
      .groupBy(col("price_band"))
      .agg(
        count(lit(1)).as("n"),
        moneySum(greatest(col("l_tax"), col("l_discount")), 4)
          .as("sum_max_rate"),
        moneySum(least(col("l_tax"), col("l_discount")), 4)
          .as("sum_min_rate"))
      .orderBy(col("price_band"))

  val q19Sql: String = s"""
    SELECT price_band, COUNT(*) AS n,
      ${sqlMoneySum("mx", 4)} AS sum_max_rate,
      ${sqlMoneySum("mn", 4)} AS sum_min_rate
    FROM (SELECT
            CASE WHEN l_extendedprice < 20000.0 THEN 'low'
                 WHEN l_extendedprice < 60000.0 THEN 'mid'
                 ELSE 'high' END AS price_band,
            GREATEST(l_tax, l_discount) AS mx,
            LEAST(l_tax, l_discount) AS mn
          FROM lineitem)
    GROUP BY price_band ORDER BY price_band"""

  // ---- q20: string functions (F2, F11; reference's trim/parse F1–F3) --
  def q20StringOps(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        lower(col("c_name")).as("lname"),
        substring(col("c_name"), 1, 8).as("prefix"),
        length(col("c_name")).cast("long").as("name_len"),
        concat_ws("#", col("c_mktsegment"), col("c_name")).as("tagged"),
        levenshtein(lower(col("c_name")), lit("customer")).cast("long")
          .as("lev"))
      .orderBy(col("c_custkey"))

  val q20Sql: String = """
    SELECT c_custkey, LOWER(c_name) AS lname,
      SUBSTRING(c_name, 1, 8) AS prefix,
      CAST(LENGTH(c_name) AS BIGINT) AS name_len,
      c_mktsegment || '#' || c_name AS tagged,
      CAST(LEVENSHTEIN(LOWER(c_name), 'customer') AS BIGINT) AS lev
    FROM customer ORDER BY c_custkey"""

  /** Query + oracle registries for SparkEntry. */
  // ---- q82: full outer join (§2.3 closure) -----------------------------
  // The J2 family's last member: two SPARSE per-nation aggregates (very
  // high / very low balance customers) full-outer-joined so both
  // null-extension directions are exercised — nations rich on one side
  // only surface with the other side's counts null, then COALESCE folds
  // them for the report. Same shuffle shape as any equi-join; FULL OUTER
  // merely disables the broadcast strategy (both sides must stream), so
  // its plan is the degenerate-free sort-merge join.
  def q82FullOuter(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val hi = c.filter(col("c_acctbal") > 9900)
      .groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_rich"))
    val lo = c.filter(col("c_acctbal") < -900)
      .groupBy(col("c_nationkey").as("nk2"))
      .agg(count(lit(1)).as("n_debt"))
    hi.join(lo, col("nk") === col("nk2"), "full_outer")
      .select(coalesce(col("nk"), col("nk2")).as("c_nationkey"),
        coalesce(col("n_rich"), lit(0L)).as("n_rich"),
        coalesce(col("n_debt"), lit(0L)).as("n_debt"),
        (col("n_rich").isNull || col("n_debt").isNull).as("one_sided"))
      .orderBy(col("c_nationkey"))
  }

  val q82Sql: String = """
    WITH hi AS (
      SELECT c_nationkey AS nk, COUNT(*) AS n_rich
      FROM customer WHERE c_acctbal > 9900 GROUP BY 1),
    lo AS (
      SELECT c_nationkey AS nk2, COUNT(*) AS n_debt
      FROM customer WHERE c_acctbal < -900 GROUP BY 1)
    SELECT COALESCE(nk, nk2) AS c_nationkey,
      CAST(COALESCE(n_rich, 0) AS BIGINT) AS n_rich,
      CAST(COALESCE(n_debt, 0) AS BIGINT) AS n_debt,
      (n_rich IS NULL OR n_debt IS NULL) AS one_sided
    FROM hi FULL OUTER JOIN lo ON nk = nk2
    ORDER BY c_nationkey"""

  // ---- q84: regexp capture-group extraction (F-surface closure) --------
  // Structured-identifier parsing: pull the numeric id out of the
  // 'Customer#NNNNN' name with a capture group and audit it against the
  // key column — the parse-integrity check every ingest of stringly
  // identifiers needs. Both engines return '' for a non-matching group
  // and both TRY_CAST('') to NULL, so the ok-count is parity-exact; the
  // pattern stays in the Java∩RE2 dialect.
  def q84RegexpExtract(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .withColumn("parsed_id",
        regexp_extract(col("c_name"), "Customer#([0-9]+)", 1)
          .cast("long"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("parsed_id") === col("c_custkey"), 1L).otherwise(0L))
          .as("n_parse_ok"),
        min(col("parsed_id")).as("min_id"),
        max(col("parsed_id")).as("max_id"))
      .orderBy(col("c_mktsegment"))

  val q84Sql: String = """
    SELECT c_mktsegment, COUNT(*) AS n_customers,
      CAST(SUM(CASE WHEN TRY_CAST(regexp_extract(c_name,
          'Customer#([0-9]+)', 1) AS BIGINT) = c_custkey
        THEN 1 ELSE 0 END) AS BIGINT) AS n_parse_ok,
      MIN(TRY_CAST(regexp_extract(c_name, 'Customer#([0-9]+)', 1)
        AS BIGINT)) AS min_id,
      MAX(TRY_CAST(regexp_extract(c_name, 'Customer#([0-9]+)', 1)
        AS BIGINT)) AS max_id
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  // ---- q98: ordered string aggregation (listagg surface) ---------------
  // The report/export surface SQL users expect (LISTAGG / string_agg):
  // deterministic ONLY with an explicit element order, so the Spark side
  // sorts the collected array before joining — collect_list's arrival
  // order is partition-dependent and would flake the oracle (and any
  // rerun). Lists are per-group bounded (nations per region ≤ 5);
  // unbounded-group listagg at 100 TB is an anti-pattern regardless of
  // engine — cap or switch to top-k before aggregating.
  def q98StringAgg(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .join(Tables.region(s, d),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"),
        concat_ws(",", sort_array(collect_list(col("n_name"))))
          .as("nations_csv"),
        length(concat_ws(",", sort_array(collect_list(col("n_name")))))
          .cast("long").as("csv_len"))
      .orderBy(col("r_name"))

  val q98Sql: String = """
    SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_nations,
      string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
      CAST(length(string_agg(n_name, ',' ORDER BY n_name)) AS BIGINT)
        AS csv_len
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name"""

  // ---- q99: as-of snapshot (latest record per key at a cutoff) ---------
  // The time-travel read every slowly-changing store serves: each
  // user's state as of a cutoff timestamp = the max_by(event, ts) over
  // events at-or-before the cutoff. One filter (pushed to the scan) +
  // one partial+final max_by aggregate keyed by user — no window over
  // the history, no sort; ties at the same ts break on event_id inside
  // the ordering struct, so the snapshot is deterministic.
  def q99Snapshot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("ts") <= lit("2024-01-15 00:00:00").cast("timestamp"))
      .groupBy(col("user_id"))
      .agg(max_by(
          struct(col("ts"), col("event_id"), col("event_type"),
            col("value")),
          struct(col("ts"), col("event_id"))).as("m"),
        count(lit(1)).as("n_history"))
      .select(col("user_id"), col("m.ts").as("ts"),
        col("m.event_id").as("event_id"),
        col("m.event_type").as("event_type"), col("m.value").as("value"),
        col("n_history"))
      .orderBy(col("user_id"))

  val q99Sql: String = """
    SELECT user_id, ts, event_id, event_type, value,
      CAST(n_history AS BIGINT) AS n_history
    FROM (
      SELECT user_id, ts, event_id, event_type, value,
        COUNT(*) OVER (PARTITION BY user_id) AS n_history,
        ROW_NUMBER() OVER (PARTITION BY user_id
          ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
    WHERE rn = 1 ORDER BY user_id"""

  // ---- q111: national market share (TPC-H Q8 shape; 7-table join) ------
  // The deepest join tree in the surface — lineitem ⋈ part ⋈ orders ⋈
  // customer ⋈ nation ⋈ region ⋈ supplier ⋈ nation. Join ORDER is
  // deliberate: without CBO statistics Spark executes declared inner
  // joins in written order, so the most selective reducer — the
  // p_type-filtered part table — joins the fact FIRST, cutting the
  // lineitem stream before the orders shuffle ever sees it
  // (A/B-measured 2.7 → 1.2 s at sf0.1; at 100 TB the same ordering
  // is what a CBO would pick from NDV stats). Selective filters
  // (region, p_type, the 2-year date band) sit on the scans where
  // pushdown lands them, fixed-size dims (nation ×2, region) get
  // explicit broadcast hints, and the SF-scaled sides (customer, part,
  // supplier) are UNhinted so AQE picks broadcast-vs-shuffle from
  // runtime sizes (the q03 lesson — a forced hint OOMs at 100×). Share
  // arithmetic stays exact: per-line volume quantizes to integer units,
  // the numerator is a conditional SUM over the same units, and the
  // only double is the final one-op division of two BIGINTs.
  def q111MarketShare(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate").between(
        lit("1995-01-01").cast("timestamp"),
        lit("1996-12-31").cast("timestamp")))
    val c = Tables.customer(s, d)
    val p = Tables.part(s, d).filter(col("p_type") === "ECONOMY")
    val sup = Tables.supplier(s, d)
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
    val r = Tables.region(s, d).filter(col("r_name") === "AMERICA")
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
      .withColumn("units",
        toUnits(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_7", col("units"))
          .otherwise(0L)).as("share_units"),
        sum(col("units")).as("total_units"))
      .withColumn("mkt_share",
        col("share_units").cast("double") / col("total_units"))
      .orderBy(col("o_year"))
  }

  val q111Sql: String = s"""
    WITH j AS (
      SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
        n2.n_name AS supp_nation,
        ${sqlUnits("l_extendedprice * (1 - l_discount)", 4)} AS units
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN '1995-01-01' AND '1996-12-31')
    SELECT o_year,
      CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN units ELSE 0 END)
        AS BIGINT) AS share_units,
      CAST(SUM(units) AS BIGINT) AS total_units,
      CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN units ELSE 0 END)
        AS DOUBLE) / CAST(SUM(units) AS BIGINT) AS mkt_share
    FROM j GROUP BY o_year ORDER BY o_year"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"  -> q01PricingSummary _,
    "q02_topk_orders"      -> q02TopkOrders _,
    "q03_revenue_segment"  -> q03RevenueBySegment _,
    "q04_region_revenue"   -> q04RegionRevenue _,
    "q05_left_join"        -> q05LeftJoin _,
    "q06_semi_join"        -> q06SemiJoin _,
    "q07_anti_join"        -> q07AntiJoin _,
    "q08_distinct_agg"     -> q08DistinctAgg _,
    "q09_rollup"           -> q09Rollup _,
    "q10_cube"             -> q10Cube _,
    "q11_window_lag"       -> q11WindowLag _,
    "q12_window_movavg"    -> q12WindowMovavg _,
    "q13_running_total"    -> q13RunningTotal _,
    "q14_topk_per_group"   -> q14TopkPerGroup _,
    "q15_union"            -> q15Union _,
    "q16_intersect_except" -> q16IntersectExcept _,
    "q17_date_buckets"     -> q17DateBuckets _,
    "q18_json_extract"     -> q18JsonExtract _,
    "q19_case_math"        -> q19CaseMath _,
    "q20_string_ops"       -> q20StringOps _,
    "q82_full_outer"       -> q82FullOuter _,
    "q84_regexp_extract"   -> q84RegexpExtract _,
    "q98_string_agg"       -> q98StringAgg _,
    "q99_snapshot"         -> q99Snapshot _,
    "q111_market_share"    -> q111MarketShare _)

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary"  -> q01Sql,
    "q02_topk_orders"      -> q02Sql,
    "q03_revenue_segment"  -> q03Sql,
    "q04_region_revenue"   -> q04Sql,
    "q05_left_join"        -> q05Sql,
    "q06_semi_join"        -> q06Sql,
    "q07_anti_join"        -> q07Sql,
    "q08_distinct_agg"     -> q08Sql,
    "q09_rollup"           -> q09Sql,
    "q10_cube"             -> q10Sql,
    "q11_window_lag"       -> q11Sql,
    "q12_window_movavg"    -> q12Sql,
    "q13_running_total"    -> q13Sql,
    "q14_topk_per_group"   -> q14Sql,
    "q15_union"            -> q15Sql,
    "q16_intersect_except" -> q16Sql,
    "q17_date_buckets"     -> q17Sql,
    "q18_json_extract"     -> q18Sql,
    "q19_case_math"        -> q19Sql,
    "q20_string_ops"       -> q20Sql,
    "q82_full_outer"       -> q82Sql,
    "q84_regexp_extract"   -> q84Sql,
    "q98_string_agg"       -> q98Sql,
    "q99_snapshot"         -> q99Sql,
    "q111_market_share"    -> q111Sql)
}
