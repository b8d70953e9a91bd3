package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import Fx._

/** Statistical aggregates with oracle-exact determinism.
  *
  * Built-in `corr`/`stddev` use streaming co-moment updates whose low bits
  * depend on partition order, and sketch-based percentiles differ per
  * engine — so each statistic here is REBUILT from exact integer sums
  * (element-wise quantization, BIGINT accumulation) with the final formula
  * a fixed sequence of IEEE double ops over identical integers. Same
  * distributed shape as the built-ins: one partial+final aggregation.
  */
object StatsOps {

  // ---- exact percentiles via a value HISTOGRAM -------------------------
  // Spark `percentile` and DuckDB `quantile_cont` share the same
  // definition (linear interpolation at rank p·(n−1)); feeding them
  // integer cent values makes the sort total and the interpolation inputs
  // exact, so the returned doubles agree bit-for-bit. But the built-in
  // exact percentile buffers every value through an ObjectHashAggregate —
  // O(group rows) of executor state, the one aggregate here that could
  // not survive 100 TB. This helper computes the SAME bits with bounded
  // state: histogram the measure (groupBy distinct integer units — state
  // is O(|value domain|), fixed by the money type's precision, NOT the
  // corpus), per-group cumulative ranks over the histogram (window over
  // domain-bounded rows), then each requested quantile finds its two
  // boundary ranks via a broadcast join of the G×|qs| quantile spec and
  // interpolates with Spark's own op tree
  // (v_lo·(⌈pos⌉−pos) + v_hi·(pos−⌊pos⌋), pos = q·(n−1)) so the output
  // is bit-identical to the built-in and to quantile_cont.
  /** The (group, v, c) value histogram both percentile and downstream
    * weighted passes ride. A caller that aggregates off the histogram
    * twice in one plan (q92 bins, q94 fence sums) `persist()`s it — the
    * DedupOps feature-table contract: the corpus scan runs once, both
    * branches read the cached domain-sized histogram, and the harness's
    * clearCache between queries bounds the cache lifetime. */
  private[graft] def histogram(rows: DataFrame, groupCol: String,
      vCol: String): DataFrame =
    rows.groupBy(col(groupCol), col(vCol).as("v"))
      .agg(count(lit(1)).as("c"))

  /** `degrade = false` keeps the fail-fast assert and the UNPERSISTED
    * histogram — the right trade for single-group callers (q92) whose
    * parallel independent scans beat cache serialization and whose
    * documented 100 TB posture is switching to the q62 sketch wholesale
    * rather than per-group routing. */
  private[graft] def histPercentiles(rows: DataFrame, groupCol: String,
      vCol: String, qs: Seq[Double], degrade: Boolean = true): DataFrame =
    histPercentilesFromCounts(histogram(rows, groupCol, vCol), groupCol, qs,
      sketchFallback =
        if (degrade) Some(rows.select(col(groupCol), col(vCol).as("v")))
        else None)

  /** Histogram-percentile contract bound: max distinct values per group.
    * The whole path is exact-with-bounded-state ONLY while the measure's
    * domain is bounded (integer units — cents, token counts); on a true
    * double measure the histogram degenerates to one row per value and
    * the window/cum-rank state approaches O(group rows). 2^22 clears any
    * plausible money/count domain by an order of magnitude while sitting
    * far below per-group row counts at 100 TB, so a misrouted measure
    * trips the guard instead of silently buffering. Callers that can
    * hand over the raw rows (`sketchFallback`) DEGRADE instead of die:
    * over-domain groups detach from the exact path and take the GK
    * sketch (`approx_percentile`, the q62 machinery — constant state per
    * group, published rank bound n/accuracy); in-bound groups keep the
    * bit-exact histogram answer. Callers without raw rows keep the
    * fail-fast assert (folded into the spec's `n` column — never pruned:
    * n is load-bearing in every consumer). */
  private[graft] val MaxHistDomain = 1L << 22

  private[graft] def histPercentilesFromCounts(counts: DataFrame,
      groupCol: String, qs: Seq[Double],
      maxDomain: Long = MaxHistDomain,
      sketchFallback: Option[DataFrame] = None): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // With a fallback: the routing decision is taken NOW, driver-side,
    // off the persisted domain-sized histogram (an aggregate of ≤
    // |groups| rows — the same bounded collect the IVF centroid tables
    // use), so the common no-over-domain case keeps the EXACT-ONLY plan
    // with zero extra branches: an always-on union with an (empty)
    // GK branch was A/B-measured to cost a full extra corpus scan per
    // query (q56 1.68→2.91 s at sf0.1) because the raw-rows scan under
    // the empty-side join is not eliminated. Persisting the histogram
    // also lets the cum/spec/boundary subtrees below share ONE corpus
    // scan. Over-domain groups (rare, dirty-measure territory) leave
    // the exact path entirely — their histogram rows are filtered out
    // before the cumulative window, so the bounded-state contract holds
    // for what remains — and re-aggregate from raw rows under GK.
    val (exactCounts, sketchRows) = sketchFallback match {
      case Some(rows) =>
        val cached = counts.persist()
        val wideKeys = cached.groupBy(col(groupCol))
          .agg(count(lit(1)).as("width"))
          .filter(col("width") > maxDomain)
          .select(col(groupCol)).collect().map(_.get(0)).toSeq
        if (wideKeys.isEmpty) (cached, None)
        else {
          // NULL-safe routing: `isin` over a NULL key evaluates to NULL,
          // which a plain filter drops from BOTH branches — a NULL-keyed
          // group would silently vanish from the output (this module's
          // whole posture is validating dirty data, so NULL groups are
          // in-contract). Split the wide-key list so the predicate is
          // never NULL: non-null wide keys route via coalesced isin,
          // a NULL wide key routes via isNull.
          val (nullWide, nonNullWide) = wideKeys.partition(_ == null)
          val isWide =
            (if (nonNullWide.isEmpty) lit(false)
             else coalesce(col(groupCol).isin(nonNullWide: _*), lit(false))) ||
              (col(groupCol).isNull && lit(nullWide.nonEmpty))
          (cached.filter(!isWide), Some(rows.filter(isWide)))
        }
      case None => (counts, None)
    }
    val cum = exactCounts.withColumn("hi_rank", sum(col("c")).over(w))
      .withColumn("lo_rank", col("hi_rank") - col("c") + 1)
    val spec = exactCounts.groupBy(col(groupCol))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("width"))
      .withColumn("n",
        if (sketchFallback.isDefined) col("n")
        else col("n") + coalesce(
          assert_true(col("width") <= maxDomain,
            concat(lit("histogram percentile domain exceeds "),
              lit(maxDomain), lit(" distinct values for group "),
              col(groupCol).cast("string"),
              lit(" - this measure needs the GK sketch path (q62)")))
            .cast("long"), lit(0L)))
      .select(col(groupCol), col("n"),
        posexplode(lit(qs.toArray)).as(Seq("qi", "q")))
      .withColumn("pos", (col("n") - 1).cast("double") * col("q"))
      .withColumn("lo_idx", floor(col("pos")))
      .withColumn("hi_idx", ceil(col("pos")))
    def boundary(idx: String, out: String) =
      cum.as("h").join(broadcast(spec.as("s")),
          col(s"h.$groupCol") === col(s"s.$groupCol") &&
            (col(s"s.$idx") + 1).between(col("h.lo_rank"), col("h.hi_rank")))
        .select(col(s"s.$groupCol").as(groupCol), col("s.qi").as("qi"),
          col("s.n").as("n"), col("s.pos").as("pos"),
          col("s.lo_idx").as("lo_idx"), col("s.hi_idx").as("hi_idx"),
          col("h.v").as(out))
    val lo = boundary("lo_idx", "v_lo")
    val hi = boundary("hi_idx", "v_hi")
      .select(col(groupCol).as("g2"), col("qi").as("qi2"), col("v_hi"))
    val exact = lo
      .join(hi, col(groupCol) === col("g2") && col("qi") === col("qi2"))
      .withColumn("pval",
        when(col("lo_idx") === col("hi_idx"), col("v_lo").cast("double"))
          .otherwise(
            col("v_lo").cast("double") *
              (col("hi_idx").cast("double") - col("pos")) +
            col("v_hi").cast("double") *
              (col("pos") - col("lo_idx").cast("double"))))
      .groupBy(col(groupCol), col("n"))
      .agg(sort_array(collect_list(struct(col("qi"), col("pval"))))
        .as("kv"))
      .withColumn("ps", expr("transform(kv, x -> x.pval)"))
      .drop("kv")
    sketchRows match {
      case None => exact
      case Some(rows) =>
        // GK degrade for the routed-out groups: same output contract
        // (group, n, ps) with approx values in place of interpolated
        // exact ones — rank error within n/ApproxAcc, constant state.
        val qArr = qs.map(q => s"${q}D").mkString("array(", ",", ")")
        val approx = rows.groupBy(col(groupCol))
          .agg(count(lit(1)).as("n"),
            expr(s"approx_percentile(v, $qArr, $ApproxAcc)").as("av"))
          .select(col(groupCol), col("n"),
            expr("transform(av, x -> cast(x as double))").as("ps"))
        exact.unionByName(approx)
    }
  }

  // ---- q56: exact percentiles (interpolated, over integer units) -------
  // Per-group p25/p50/p75/p90 through [[histPercentiles]]: exact, yet
  // every stage is bounded-state at 100 TB (the scale problem the
  // built-in exact percentile has and this path does not). q62 remains
  // the sketch alternative when even a domain-sized histogram is too
  // wide (true doubles, free-text lengths).
  def q56Percentiles(s: SparkSession, d: String): DataFrame =
    histPercentiles(
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), toUnits(col("l_extendedprice")).as("pu")),
      "l_returnflag", "pu", Seq(0.25, 0.5, 0.75, 0.9))
      .select(col("l_returnflag"), col("n"),
        (element_at(col("ps"), 1) / 100.0).as("p25"),
        (element_at(col("ps"), 2) / 100.0).as("p50"),
        (element_at(col("ps"), 3) / 100.0).as("p75"),
        (element_at(col("ps"), 4) / 100.0).as("p90"))
      .orderBy(col("l_returnflag"))

  val q56Sql: String = s"""
    SELECT l_returnflag, n,
      ps[1] / 100.0 AS p25, ps[2] / 100.0 AS p50,
      ps[3] / 100.0 AS p75, ps[4] / 100.0 AS p90
    FROM (SELECT l_returnflag,
            quantile_cont(${sqlUnits("l_extendedprice")},
              [0.25, 0.5, 0.75, 0.9]) AS ps,
            COUNT(*) AS n
          FROM lineitem GROUP BY l_returnflag)
    ORDER BY l_returnflag"""

  // ---- q57: Pearson correlation from exact integer sums ----------------
  // r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²tot)(n·Σy² − Σy²tot)), with
  // every Σ an exact BIGINT (x = quantity units, y = whole dollars to
  // keep Σy² inside long range) and the final formula evaluated in
  // double the same way on both engines.
  def q57Correlation(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("x", toUnits(col("l_quantity"), 0))
      // `div`, not `/`: Column./ is DOUBLE division in Spark — it would
      // silently turn y into a float and break integer-sum exactness.
      // The quantization text comes from the same Fx helper the oracle
      // uses, so the pair cannot drift apart.
      .withColumn("y", expr(s"${sqlUnits("l_extendedprice", 0)} div 100"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("corr_qty_price",
        (col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / sqrt((col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
            * (col("n").cast("double") * col("syy").cast("double")
              - col("sy").cast("double") * col("sy").cast("double"))))
      .select(col("l_returnflag"), col("n"), col("corr_qty_price"))
      .orderBy(col("l_returnflag"))

  val q57Sql: String = s"""
    SELECT l_returnflag, n,
      (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_qty_price
    FROM (SELECT l_returnflag, COUNT(*) AS n,
            CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
            CAST(SUM(x * y) AS BIGINT) AS sxy,
            CAST(SUM(x * x) AS BIGINT) AS sxx,
            CAST(SUM(y * y) AS BIGINT) AS syy
          FROM (SELECT l_returnflag,
                  ${sqlUnits("l_quantity", 0)} AS x,
                  ${sqlUnits("l_extendedprice", 0)} // 100 AS y
                FROM lineitem)
          GROUP BY l_returnflag)
    ORDER BY l_returnflag"""

  // ---- q58: histogram (fixed-width integer bucketing) ------------------
  // bucket = price // $10k — pure integer division, no width_bucket
  // float-boundary ambiguity; the shape every data-profiling pass needs.
  def q58Histogram(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("bucket",
        expr(s"${sqlUnits("l_extendedprice")} div 1000000"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("bucket"))

  val q58Sql: String = s"""
    SELECT ${sqlUnits("l_extendedprice")} // 1000000 AS bucket,
      COUNT(*) AS n, ${sqlMoneySum("l_extendedprice")} AS sum_price
    FROM lineitem GROUP BY 1 ORDER BY 1"""

  // ---- q62: approx percentile with a VERIFIED rank-error contract ------
  // The scale path q56's caveat defers to: `approx_percentile` (GK
  // sketch — constant state per group vs q56's domain-sized
  // histogram, for measures too wide to histogram). Sketch internals differ per engine, so the
  // approx VALUE can't be oracle-compared; what CAN be (the q42
  // pattern) is the exact percentile plus a boolean asserting the
  // sketch met its published guarantee — GK returns a value whose RANK
  // is within n/accuracy of the target. The rank of the returned value
  // is its [count(<)+1, count(<=)] interval (computed with one extra
  // broadcast join + aggregate); the contract holds iff that interval
  // overlaps the target window. The oracle emits the same exact
  // percentile and literal TRUE — hash-equal only if the sketch
  // actually delivered its bound.
  // The exact-side contract column rides [[histPercentilesFromCounts]]
  // (bounded, domain-sized state) rather than the buffer-all built-in
  // `percentile` — q62 exists because buffer-all does not survive 100 TB,
  // so its own verification column must not reintroduce the cliff. The
  // rank interval of the sketch's answer is likewise counted off the
  // persisted histogram (sum of counts below / at-or-below `ap`), so the
  // corpus is scanned exactly twice: once to histogram, once for the GK
  // sketch itself (whose per-group state is a constant-size quantile
  // summary, the one ObjectHashAggregate allowed in this plan).
  private val ApproxAcc = 1000 // guaranteed rank error <= n/1000
  def q62ApproxPercentile(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag"), toUnits(col("l_extendedprice")).as("pu"))
    val hist = histogram(li, "l_returnflag", "pu").persist()
    // sketchFallback: an over-domain group degrades its reference column
    // to a second GK read instead of failing the whole query — the rank
    // contract below is window-free (plain aggregates off the histogram)
    // so it survives any domain.
    val exact = histPercentilesFromCounts(hist, "l_returnflag", Seq(0.5),
      sketchFallback = Some(li.select(col("l_returnflag"), col("pu").as("v"))))
      .select(col("l_returnflag"), col("n"),
        element_at(col("ps"), 1).as("exact_units"))
    val g = exact.join(
      li.groupBy(col("l_returnflag"))
        .agg(expr(s"approx_percentile(pu, 0.5D, $ApproxAcc)").as("ap")),
      "l_returnflag")
    hist.join(broadcast(g), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(first(col("n")).as("n"), first(col("exact_units")).as("exact_units"),
        sum(when(col("v") < col("ap"), col("c")).otherwise(0L)).as("r_lt"),
        sum(when(col("v") <= col("ap"), col("c")).otherwise(0L)).as("r_le"))
      .select(col("l_returnflag"), col("n"),
        (col("exact_units") / 100.0).as("p50"),
        ((col("r_lt") + 1).cast("double") <=
          col("n").cast("double") * 0.5 + col("n").cast("double") / ApproxAcc + 1
          && col("r_le").cast("double") >=
          col("n").cast("double") * 0.5 - col("n").cast("double") / ApproxAcc - 1)
          .as("within_bound"))
      .orderBy(col("l_returnflag"))
  }

  val q62Sql: String = s"""
    SELECT l_returnflag, COUNT(*) AS n,
      quantile_cont(${sqlUnits("l_extendedprice")}, 0.5) / 100.0 AS p50,
      TRUE AS within_bound
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---- q81: mergeable HLL sketches (partial per day, union across) -----
  // THE distributed-cardinality pattern at 100 TB: one Datasketches HLL
  // sketch per (event_type, day) partial — built where the data lives —
  // then a sketch UNION per event_type instead of re-scanning raw rows.
  // The union is associative/commutative mergeable state, so daily
  // partials can be persisted and the monthly rollup never touches the
  // raw 100 TB again (q42 re-counts raw rows; this is the incremental
  // upgrade). Like q42, the sketch bytes themselves are engine-specific,
  // so the oracle checks the CONTRACT: the union estimate lands within
  // 5% of the exact distinct count (integer cross-multiply, no float
  // threshold), plus the exact count and partial count as hard values.
  def q81SketchUnion(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("user_id"))
    val daily = ev.groupBy(col("event_type"), col("day"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
    val unioned = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    unioned.join(exact, "event_type")
      .select(col("event_type"), col("n_days"), col("exact_users"),
        (abs(col("est") - col("exact_users")) * 20 <= col("exact_users"))
          .as("union_within_5pct"))
      .orderBy(col("event_type"))
  }

  val q81Sql: String = """
    SELECT event_type,
      CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      TRUE AS union_within_5pct
    FROM events GROUP BY event_type ORDER BY event_type"""

  // ---- q85: count-min heavy hitters (mergeable frequency sketch) -------
  // q81 is the distributed-cardinality sketch; this is its FREQUENCY
  // twin — the one-pass heavy-hitter pass a token-frequency / n-gram
  // audit runs at 100 TB, where an exact token groupBy is fine but a
  // sketch is mergeable state: the d×w counter grid is built with one
  // partial+final aggregate (map-side collapse to ≤ d·w rows per
  // partition regardless of input size), daily/shard partials union by
  // plain cell-wise SUM, and the grid broadcasts for estimation. Every
  // counter and hash is integer (h60-derived buckets), so unlike q81's
  // engine-specific HLL bytes the ESTIMATES themselves are oracle-exact:
  // DuckDB rebuilds the identical grid from the identical md5 buckets.
  // The exact count rides along here to pin the CMS guarantee
  // (est ≥ exact, always) as data; at 100 TB you keep only the sketch.
  private val CmDepth = 4   // independent hash rows
  private val CmWidth = 256 // counters per row; overshoot ≤ e·N/w w.h.p.

  def q85CountMin(s: SparkSession, d: String): DataFrame = {
    graft.expressions.Hash60.register(s)
    val tok = Tables.documents(s, d)
      .select(explode_outer(split(trim(lower(col("text"))),
        "[ \\t\\n\\r\\f]+")).as("token"))
      .filter(col("token") =!= "")
    def bucket(t: Column, r: Column): Column =
      expr(s"h60(concat(${t.toString}, '|cm', cast(${r.toString} as string)))")
        .%(lit(CmWidth))
    val sketch = tok
      .select(col("token"), explode_outer(
        sequence(lit(0), lit(CmDepth - 1))).as("r"))
      .groupBy(col("r"), bucket(col("token"), col("r")).as("bucket"))
      .agg(count(lit(1)).as("c"))
      .select(col("r").as("sr"), col("bucket").as("sb"), col("c"))
    val exact = tok.groupBy(col("token")).agg(count(lit(1)).as("exact"))
    exact
      .select(col("token"), col("exact"), explode_outer(
        sequence(lit(0), lit(CmDepth - 1))).as("r"))
      .join(broadcast(sketch),
        col("r") === col("sr") && bucket(col("token"), col("r")) === col("sb"))
      .groupBy(col("token"), col("exact"))
      .agg(min(col("c")).as("est"))
      .select(col("token"), col("est"), col("exact"),
        (col("est") - col("exact")).as("overshoot"))
      .orderBy(col("est").desc, col("token"))
      .limit(20)
  }

  val q85Sql: String = raw"""
    WITH t AS (
      SELECT unnest(string_split_regex(trim(lower(text)),
        '[ \t\n\r\f]+')) AS token
      FROM documents),
    tok AS (SELECT token FROM t WHERE token <> ''),
    rs AS (SELECT unnest(range(4)) AS r),
    sk AS (
      SELECT r,
        CAST('0x' || substring(md5(token || '|cm' || CAST(r AS VARCHAR)),
          1, 15) AS BIGINT) % 256 AS bucket,
        COUNT(*) AS c
      FROM tok CROSS JOIN rs GROUP BY 1, 2),
    v AS (SELECT token, COUNT(*) AS exact FROM tok GROUP BY 1),
    est AS (
      SELECT v.token, v.exact, MIN(sk.c) AS est
      FROM v CROSS JOIN rs
      JOIN sk ON sk.r = rs.r AND sk.bucket =
        CAST('0x' || substring(md5(v.token || '|cm' ||
          CAST(rs.r AS VARCHAR)), 1, 15) AS BIGINT) % 256
      GROUP BY 1, 2)
    SELECT token, est, exact, est - exact AS overshoot
    FROM est ORDER BY est DESC, token LIMIT 20"""

  // ---- q92: equi-depth quantile binning (featurization) ----------------
  // The discretization pass feature pipelines run before bucketized
  // models / monotonic binning: quartile cut points from ONE exact
  // percentile aggregate (integer cents in, interpolated doubles out —
  // the q56-proven cross-engine-exact path), broadcast to every row as
  // a 1-row cross join, binned by plain comparisons. No per-row window,
  // no ntile (which would sort the corpus through a global window);
  // the scan streams against broadcast cuts. At 100 TB swap the exact
  // percentile for approx_percentile (q62's bounded-state contract)
  // and the binning side stays identical.
  def q92QuantileBins(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(toUnits(col("l_extendedprice")).as("pu"))
    // cut points via the bounded-state histogram path (single group —
    // the per-group window degrades to one task over the DOMAIN-sized
    // histogram, a constant, not the corpus). The bin pass re-scans the
    // measure as an INDEPENDENT branch: A/B-measured, the two parallel
    // scans beat persisting the shared histogram here (cache
    // materialization serializes the branches; single-group q92 has no
    // per-group parallelism to win back — q94, per-group, takes the
    // opposite trade and persists).
    val cuts = histPercentiles(li.withColumn("g", lit(0)),
        "g", "pu", Seq(0.25, 0.5, 0.75), degrade = false)
      .select(element_at(col("ps"), 1).as("c1"),
        element_at(col("ps"), 2).as("c2"),
        element_at(col("ps"), 3).as("c3"))
    li.crossJoin(broadcast(cuts))
      .withColumn("bin", expr(
        "CASE WHEN pu <= c1 THEN 0 WHEN pu <= c2 THEN 1" +
          " WHEN pu <= c3 THEN 2 ELSE 3 END").cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("pu")).as("min_units"), max(col("pu")).as("max_units"),
        sum(col("pu")).as("sum_units"))
      .orderBy(col("bin"))
  }

  val q92Sql: String = s"""
    WITH u AS (
      SELECT ${sqlUnits("l_extendedprice")} AS pu FROM lineitem),
    cuts AS (
      SELECT quantile_cont(pu, [0.25, 0.5, 0.75]) AS cs FROM u)
    SELECT CAST(CASE WHEN pu <= cs[1] THEN 0 WHEN pu <= cs[2] THEN 1
        WHEN pu <= cs[3] THEN 2 ELSE 3 END AS BIGINT) AS bin,
      CAST(COUNT(*) AS BIGINT) AS n,
      MIN(pu) AS min_units, MAX(pu) AS max_units,
      CAST(SUM(pu) AS BIGINT) AS sum_units
    FROM u CROSS JOIN cuts
    GROUP BY 1 ORDER BY 1"""

  // ---- q94: IQR outlier detection (per-group Tukey fences) -------------
  // The anomaly gate a measure column gets before aggregation: per
  // return flag, exact quartiles from the bounded-state histogram path
  // (histPercentiles — integer cents in), Tukey fences lo/hi = Q1∓1.5·IQR
  // (1.5 is exact in binary, the fence arithmetic is the same IEEE op
  // tree on both engines), then a broadcast join back on the group key
  // flags rows outside the fences. Two passes over the measure, no
  // per-row state; the fence table is G rows and broadcasts.
  def q94IqrOutliers(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag"), toUnits(col("l_extendedprice")).as("pu"))
    val counts = histogram(li, "l_returnflag", "pu").persist()
    val fences = histPercentilesFromCounts(counts, "l_returnflag",
        Seq(0.25, 0.75))
      .select(col("l_returnflag"),
        element_at(col("ps"), 1).as("q1"), element_at(col("ps"), 2).as("q3"))
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
    // the flag pass rides the histogram too (counts weight every sum) —
    // one corpus scan for the whole query
    counts.join(broadcast(fences), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("c")).as("n"),
        sum(when(col("v") < col("lo"), col("c")).otherwise(0L)).as("n_low"),
        sum(when(col("v") > col("hi"), col("c")).otherwise(0L)).as("n_high"),
        sum(when(col("v") < col("lo") || col("v") > col("hi"),
          col("v") * col("c")).otherwise(0L)).as("outlier_units_sum"))
      .orderBy(col("l_returnflag"))
  }

  val q94Sql: String = s"""
    WITH u AS (
      SELECT l_returnflag, ${sqlUnits("l_extendedprice")} AS pu
      FROM lineitem),
    f AS (
      SELECT l_returnflag,
        qs[1] - (qs[2] - qs[1]) * 1.5 AS lo,
        qs[2] + (qs[2] - qs[1]) * 1.5 AS hi
      FROM (SELECT l_returnflag,
              quantile_cont(pu, [0.25, 0.75]) AS qs
            FROM u GROUP BY 1))
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(CASE WHEN pu < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
      CAST(SUM(CASE WHEN pu > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
      CAST(SUM(CASE WHEN pu < lo OR pu > hi THEN pu ELSE 0 END)
        AS BIGINT) AS outlier_units_sum
    FROM u JOIN f USING (l_returnflag)
    GROUP BY 1 ORDER BY 1"""

  // ---- q115: per-group OLS fit (closed-form simple regression) ---------
  // q57 measures association; q115 fits the line — per source, regress
  // token count on character count (the cheap length-model a pipeline
  // uses to budget tokenization from raw bytes). Closed form from the
  // same five exact integer sums as q57 (n, Σx, Σy, Σxy, Σx² (+Σy² for
  // r²)): slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), intercept =
  // (Σy − slope·Σx)/n, r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² −
  // (Σy)²)). Every sum is an exact BIGINT; each is cast to double
  // BEFORE combining (the q57 recipe — keeps n·Σxy out of long-overflow
  // range AND off DuckDB's HUGEINT path), so both engines run the same
  // IEEE op sequence on identical inputs.
  //
  // Scale shape: ONE groupBy(source) carrying six codegen'd integer
  // SUM/COUNT columns — partial aggregation collapses to |sources| rows
  // map-side; the closed form is per-group scalar arithmetic. This is
  // how regression fits 100 TB: sufficient statistics, never a solver
  // over rows.
  //
  // Degenerate groups (n = 1, or constant x/y) zero a denominator;
  // Spark's double division returns NaN/±Inf there while DuckDB returns
  // NULL — so every denominator is nullif-guarded IDENTICALLY on both
  // sides and a degenerate group yields NULL slope/intercept/r2 in both
  // engines (the honest answer: no line is determined).
  def q115OlsFit(s: SparkSession, d: String): DataFrame = {
    def d_(c: String): Column = col(c).cast("double")
    Tables.documents(s, d)
      .withColumn("x", col("n_chars"))
      .withColumn("y",
        size(filter(split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"),
          t => t =!= lit(""))).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("cov", d_("n") * d_("sxy") - d_("sx") * d_("sy"))
      .withColumn("dxx", d_("n") * d_("sxx") - d_("sx") * d_("sx"))
      .withColumn("dyy", d_("n") * d_("syy") - d_("sy") * d_("sy"))
      .withColumn("slope", col("cov") / nullif(col("dxx"), lit(0d)))
      .withColumn("intercept",
        (d_("sy") - col("slope") * d_("sx")) / d_("n"))
      .withColumn("r2", (col("cov") * col("cov"))
        / nullif(col("dxx") * col("dyy"), lit(0d)))
      .select(col("source"), col("n"), col("slope"), col("intercept"),
        col("r2"))
      .orderBy(col("source"))
  }

  val q115Sql: String = raw"""
    WITH sums AS (
      SELECT source, COUNT(*) AS n,
        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        CAST(SUM(x * y) AS BIGINT) AS sxy,
        CAST(SUM(x * x) AS BIGINT) AS sxx,
        CAST(SUM(y * y) AS BIGINT) AS syy
      FROM (SELECT source, n_chars AS x,
              CAST(len(list_filter(string_split_regex(trim(lower(text)),
                '[ \t\n\r\f]+'), t -> t <> '')) AS BIGINT) AS y
            FROM documents)
      GROUP BY source),
    der AS (
      SELECT source, n,
        CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
        CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dxx,
        CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS dyy,
        CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        CAST(n AS DOUBLE) AS nd
      FROM sums)
    SELECT source, n,
      cov / NULLIF(dxx, 0) AS slope,
      (syd - (cov / NULLIF(dxx, 0)) * sxd) / nd AS intercept,
      (cov * cov) / NULLIF(dxx * dyy, 0) AS r2
    FROM der ORDER BY source"""

  // ---- q118: join-size estimation via AGMS sign sketches ---------------
  // The cost-based-optimizer primitive: estimate |A ⋈ B| (and the
  // self-join size F2 = Σ_k f_k², the optimizer's skew measure) WITHOUT
  // executing the join. AGMS (Alon-Gianella-Matias-Szegedy) sketch:
  // s[j] = Σ_rows sign_j(key) with ±1 hashes; E[s_a[j]·s_b[j]] = join
  // size, E[s[j]²] = F2; averaging K=60 estimators gives relative error
  // ~sqrt(2/K) ≈ 18%. The 60 signs come from the BITS of one h60 per
  // row (one md5, not 60) — md5 bits are independent enough for the
  // estimator and keep the sketch pass scan-bound. The query emits the
  // estimate NEXT TO the exact size (the exact join is affordable at
  // verify scale; at 100 TB only the sketch side runs — two single-pass
  // aggregates of 60 integers each, no join, no shuffle beyond 1-row
  // frames).
  private val AgmsK = 60

  private def agmsSketch(df: DataFrame, key: String, p: String): DataFrame = {
    graft.expressions.Hash60.register(df.sparkSession)
    val withH = df.select(
      expr(s"h60(concat('agms:', cast($key as string)))").as("h"))
    val cols = (0 until AgmsK).map(j =>
      sum(when(expr(s"(h >> $j) & 1") === 0, 1L).otherwise(-1L))
        .as(s"$p$j"))
    withH.agg(cols.head, cols.tail: _*)
  }

  def q118JoinSizeSketch(s: SparkSession, d: String): DataFrame = {
    val sa = agmsSketch(Tables.orders(s, d), "o_custkey", "a")
    val sb = agmsSketch(Tables.customer(s, d), "c_custkey", "b")
    val dot = (0 until AgmsK).map(j => col(s"a$j") * col(s"b$j"))
      .reduce(_ + _)
    val dot2 = (0 until AgmsK).map(j => col(s"a$j") * col(s"a$j"))
      .reduce(_ + _)
    val exactJoin = Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .agg(count(lit(1)).as("ex_join"))
    val exactF2 = Tables.orders(s, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * col("n")).as("ex_f2"))
    val joined = sa.crossJoin(broadcast(sb)).crossJoin(broadcast(exactJoin))
      .crossJoin(broadcast(exactF2))
      .withColumn("est_join", dot.cast("double") / AgmsK)
      .withColumn("est_f2", dot2.cast("double") / AgmsK)
    joined.select(lit("join_orders_customer").as("metric"),
        col("ex_join").as("exact_size"), col("est_join").as("est_size"),
        (col("est_join") >= col("ex_join").cast("double") / 2 &&
          col("est_join") <= col("ex_join").cast("double") * 2)
          .as("within_2x"))
      .unionByName(joined.select(lit("selfjoin_f2_custkey").as("metric"),
        col("ex_f2").as("exact_size"), col("est_f2").as("est_size"),
        (col("est_f2") >= col("ex_f2").cast("double") / 2 &&
          col("est_f2") <= col("ex_f2").cast("double") * 2)
          .as("within_2x")))
      .orderBy(col("metric"))
  }

  val q118Sql: String = s"""
    WITH ja AS (
      SELECT j, CAST(SUM(CASE WHEN (h >> j) & 1 = 0 THEN 1 ELSE -1 END)
        AS BIGINT) AS s
      FROM (SELECT CAST('0x' || substring(md5('agms:' ||
              CAST(o_custkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
            FROM orders)
      CROSS JOIN (SELECT unnest(range(0, $AgmsK)) AS j) GROUP BY j),
    jb AS (
      SELECT j, CAST(SUM(CASE WHEN (h >> j) & 1 = 0 THEN 1 ELSE -1 END)
        AS BIGINT) AS s
      FROM (SELECT CAST('0x' || substring(md5('agms:' ||
              CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
            FROM customer)
      CROSS JOIN (SELECT unnest(range(0, $AgmsK)) AS j) GROUP BY j),
    est AS (
      SELECT CAST(SUM(ja.s * jb.s) AS BIGINT) AS dot,
        (SELECT CAST(SUM(s * s) AS BIGINT) FROM ja) AS dot2
      FROM ja JOIN jb USING (j)),
    ex1 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS ex_join
      FROM orders JOIN customer ON o_custkey = c_custkey),
    ex2 AS (
      SELECT CAST(SUM(n * n) AS BIGINT) AS ex_f2
      FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_custkey))
    SELECT metric, exact_size, est_size, within_2x FROM (
      SELECT 'join_orders_customer' AS metric, ex_join AS exact_size,
        CAST(dot AS DOUBLE) / $AgmsK AS est_size,
        CAST(dot AS DOUBLE) / $AgmsK >= CAST(ex_join AS DOUBLE) / 2 AND
        CAST(dot AS DOUBLE) / $AgmsK <= CAST(ex_join AS DOUBLE) * 2
          AS within_2x
      FROM est, ex1
      UNION ALL
      SELECT 'selfjoin_f2_custkey', ex_f2,
        CAST(dot2 AS DOUBLE) / $AgmsK,
        CAST(dot2 AS DOUBLE) / $AgmsK >= CAST(ex_f2 AS DOUBLE) / 2 AND
        CAST(dot2 AS DOUBLE) / $AgmsK <= CAST(ex_f2 AS DOUBLE) * 2
      FROM est, ex2)
    ORDER BY metric"""

  // ---- q122: weighted median per group ---------------------------------
  // Token-weighted doc-length median per source: "the length such that
  // half the TOKEN MASS sits in shorter docs" — the statistic length-
  // filter thresholds should come from (an unweighted median over-weights
  // the long tail of tiny docs). No weighted-median aggregate exists in
  // either engine, and none can partial-aggregate raw — but the MEASURE
  // is an integer char count, so the [[histogram]] discipline applies:
  // aggregate to per-(source, value) weight sums FIRST (map-side
  // combinable; the shuffle carries |sources|·|distinct n_chars| rows,
  // never the corpus), then the cumulative walk runs over the
  // domain-sized histogram. The previous shape — an ordered cumulative
  // window over EVERY doc row partitioned by a handful of sources — put
  // a whole source's slice through one task's sequential cumsum: a
  // straight scale-killer at 100 TB. Equivalence: all docs sharing a
  // value land in one histogram bucket, and the first-value-where-
  // 2·cum ≥ total test only ever fires at a bucket boundary, so the
  // per-doc tie-break order inside a bucket cannot change the answer.
  // Same [[MaxHistDomain]] guard as q56: a misrouted unbounded measure
  // trips the assert instead of silently buffering.
  def q122WeightedMedian(s: SparkSession, d: String): DataFrame =
    weightedMedianByGroup(
      s,
      Tables.documents(s, d)
        .select(col("source"), col("n_chars").as("v"),
          size(filter(split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"),
            t => t =!= lit(""))).cast("long").as("w")),
      "source")
      .orderBy(col("source"))

  /** Weighted median per group over (group, v, w) rows, output
    * (group, total_w, weighted_median_chars, n_docs). Exact for EVERY
    * group, bounded-state at any domain width:
    *
    * - In-bound groups (distinct v ≤ maxDomain — the integer-measure
    *   contract) take the direct histogram walk: one window over the
    *   domain-sized per-(group, v) weight histogram.
    * - Over-domain groups (dirty/true-double measures; the case that
    *   used to fail-fast via `assert_true`) DEGRADE in state, not in
    *   answer, through two-phase refinement: coarsen v into ≤ maxDomain
    *   equi-width buckets (per-group shift chosen driver-side off the
    *   persisted histogram — the q56/q62 probe discipline), walk the
    *   bucket histogram to find the half-mass bucket, then re-walk ONLY
    *   that bucket's values seeded with the mass below it. The crossing
    *   value is inside that bucket by construction, so the result is
    *   bit-identical to the direct walk. Window state: ≤ maxDomain rows
    *   per group in phase 1; in phase 2 the median bucket's occupancy —
    *   expected width/maxDomain, i.e. ≤ maxDomain distinct values for
    *   any measure whose domain fits in (maxDomain)² = 2^44 values; a
    *   further refinement level (not needed for integer measures) would
    *   repeat the same step inside the bucket.
    *
    * Chosen over a weighted GK sketch: Spark has no weight-aware
    * quantile sketch, and the refinement is exact where GK is not,
    * reusing the histogram machinery instead of new sketch code. */
  private[graft] def weightedMedianByGroup(s: SparkSession, rows: DataFrame,
      groupCol: String, maxDomain: Long = MaxHistDomain): DataFrame = {
    val hist = rows
      .groupBy(col(groupCol), col("v"))
      .agg(sum(col("w")).as("wc"), count(lit(1)).as("cnt"))
      // the cumulative walk AND the per-group spec both read the
      // histogram; unpersisted, each would re-run the upstream pass
      .persist()
    // routing probe: |groups| rows, driver-side (the q56/q62 pattern —
    // an always-on empty union branch was A/B-measured to cost a full
    // extra corpus scan)
    val stats = hist.groupBy(col(groupCol))
      .agg(count(lit(1)).as("width"), min(col("v")).as("vmin"),
        max(col("v")).as("vmax"), sum(col("wc")).as("tot"),
        sum(col("cnt")).as("n_docs"))
      .collect()
    val wide = stats.filter(_.getAs[Long]("width") > maxDomain)
    // NULL-safe wide-group predicate (see histPercentilesFromCounts)
    val (nullWide, nonNullWide) = wide.map(_.get(0)).toSeq.partition(_ == null)
    val isWide =
      (if (nonNullWide.isEmpty) lit(false)
       else coalesce(col(groupCol).isin(nonNullWide: _*), lit(false))) ||
        (col(groupCol).isNull && lit(nullWide.nonEmpty))
    def walk(h: DataFrame, seed: Column): DataFrame = {
      val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      h.withColumn("cum", seed + sum(col("wc")).over(wOrd))
    }
    // NULL-SAFE broadcast equi-join on the group key: a using-join
    // (`join(df, groupCol)`) never matches NULL = NULL, so a NULL-keyed
    // group would silently vanish — the q124 hazard from ADVICE r8.
    def joinOnGroup(l: DataFrame, r: DataFrame): DataFrame = {
      val rr = r.withColumnRenamed(groupCol, "__g")
      l.join(broadcast(rr), l(groupCol) <=> rr("__g")).drop("__g")
    }
    val exact = {
      val h = if (wide.isEmpty) hist else hist.filter(!isWide)
      val spec = h.groupBy(col(groupCol))
        .agg(sum(col("wc")).as("tot"), sum(col("cnt")).as("n_docs"))
      joinOnGroup(walk(h, lit(0L)), spec)
        .groupBy(col(groupCol))
        .agg(max(col("tot")).as("total_w"),
          min(when(col("cum") * 2 >= col("tot"), col("v")))
            .as("weighted_median_chars"),
          max(col("n_docs")).as("n_docs"))
    }
    if (wide.isEmpty) exact
    else {
      // per-group coarsening spec: smallest shift with ≤ maxDomain
      // buckets over [vmin, vmax] — a |wide-groups|-row broadcast
      val shifts = wide.map { r =>
        val vmin = r.getAs[Long]("vmin")
        val range = r.getAs[Long]("vmax") - vmin
        var shift = 0
        while ((range >> shift) >= maxDomain) shift += 1
        (r.get(0).asInstanceOf[Any], vmin, 1L << shift,
          r.getAs[Long]("tot"), r.getAs[Long]("n_docs"))
      }
      val shiftDf = s.createDataFrame(
          s.sparkContext.parallelize(shifts.toSeq.map(t =>
            org.apache.spark.sql.Row(t._1, t._2, t._3, t._4, t._5)), 1),
          org.apache.spark.sql.types.StructType(Seq(
            hist.schema(groupCol),
            org.apache.spark.sql.types.StructField("vmin",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("pow2",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("tot",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("n_docs",
              org.apache.spark.sql.types.LongType))))
      val wideHist = joinOnGroup(hist.filter(isWide), shiftDf)
        // integral DIV, not `/`: double division would lose exactness
        // past 2^53 on wide long domains
        .withColumn("b", expr("(v - vmin) DIV pow2"))
      // phase 1: half-mass bucket + the cumulative mass strictly below it
      val wB = Window.partitionBy(col(groupCol)).orderBy(col("b"))
      val bpick = wideHist.groupBy(col(groupCol), col("b"))
        .agg(sum(col("wc")).as("bw"), max(col("tot")).as("tot"))
        .withColumn("cumb", sum(col("bw")).over(
          wB.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cumb") * 2 >= col("tot"))
        .withColumn("rn", row_number().over(wB))
        .filter(col("rn") === 1)
        .select(col(groupCol), col("b").as("bstar"),
          (col("cumb") - col("bw")).as("cum_below"))
      // phase 2: exact walk inside the half-mass bucket only
      val refined = walk(
          joinOnGroup(wideHist, bpick)
            .filter(col("b") === col("bstar")),
          col("cum_below"))
        .groupBy(col(groupCol))
        .agg(max(col("tot")).as("total_w"),
          min(when(col("cum") * 2 >= col("tot"), col("v")))
            .as("weighted_median_chars"),
          max(col("n_docs")).as("n_docs"))
      exact.unionByName(refined)
    }
  }

  val q122Sql: String = raw"""
    WITH x AS (
      SELECT source, doc_id, n_chars AS v,
        CAST(len(list_filter(string_split_regex(trim(lower(text)),
          '[ \t\n\r\f]+'), t -> t <> '')) AS BIGINT) AS w
      FROM documents),
    c AS (
      SELECT source, v,
        CAST(SUM(w) OVER (PARTITION BY source ORDER BY v, doc_id
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        CAST(SUM(w) OVER (PARTITION BY source) AS BIGINT) AS tot
      FROM x)
    SELECT source, MAX(tot) AS total_w,
      CAST(MIN(CASE WHEN cum * 2 >= tot THEN v END) AS BIGINT)
        AS weighted_median_chars,
      COUNT(*) AS n_docs
    FROM c GROUP BY source ORDER BY source"""

  // ---- q124: per-group z-score standardization --------------------------
  // The feature-engineering normalization pass: center and scale a
  // measure within its group (doc length within source — lengths are
  // only comparable per source). Group moments come from a
  // partial-aggregatable `groupBy` (shuffle carries |sources| rows)
  // broadcast-joined back to the member rows — NOT a window over the
  // group key, which would move every row of a source to one reducer
  // (the q122 scale hazard in milder form). The variance numerator
  // n·Σx² − (Σx)² stays EXACT (Decimal(38,0) ↔ HUGEINT, ≥ 0 by
  // Cauchy-Schwarz) before ONE double cast — the round-12 sweep
  // removed the double-space a·b − c·d shape, which is FMS-contractible
  // cross-engine (the q262-measured ulp class). What remains in IEEE is
  // div / sub / sqrt / div with no multiply feeding an add: every op
  // individually correctly rounded, no fusion possible — deterministic.
  // Population variance (n divisor) on purpose — the group IS the
  // population here.
  def q124ZScore(s: SparkSession, d: String): DataFrame = {
    def d_(c: Column): Column = c.cast("double")
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars").as("v"))
    val moments = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sx"),
        sum(col("v") * col("v")).as("sxx"))
    base.join(broadcast(moments), "source")
      .withColumn("mean", d_(col("sx")) / d_(col("n")))
      .withColumn("variance",
        expr("cast(cast(n as decimal(38,0)) * sxx" +
          " - cast(sx as decimal(38,0)) * sx as double)") /
          expr("cast(cast(n as decimal(38,0)) * n as double)"))
      // constant group ⇒ variance 0 ⇒ z undefined: NULL on both engines
      // (Spark would NaN, DuckDB would NULL — nullif aligns them)
      .withColumn("z", (d_(col("v")) - col("mean"))
        / nullif(sqrt(col("variance")), lit(0d)))
      .select(col("doc_id"), col("source"), col("v"), col("mean"),
        col("z"))
      .orderBy(col("doc_id"))
  }

  val q124Sql: String = """
    SELECT doc_id, source, v, mean,
      (CAST(v AS DOUBLE) - mean) / NULLIF(sqrt(variance), 0) AS z
    FROM (
      SELECT doc_id, source, v,
        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        CAST(CAST(n AS HUGEINT) * sxx
          - CAST(sx AS HUGEINT) * sx AS DOUBLE)
          / CAST(CAST(n AS HUGEINT) * n AS DOUBLE) AS variance
      FROM (
        SELECT doc_id, source, n_chars AS v,
          COUNT(*) OVER (PARTITION BY source) AS n,
          CAST(SUM(n_chars) OVER (PARTITION BY source) AS BIGINT) AS sx,
          CAST(SUM(n_chars * n_chars) OVER (PARTITION BY source)
            AS BIGINT) AS sxx
        FROM documents))
    ORDER BY doc_id"""

  // ---- q125: per-source drift detection (Welch t vs rest-of-corpus) ----
  // The monitoring question behind source mixing: is any source's length
  // distribution drifting away from the corpus? One-vs-rest Welch t
  // from sufficient statistics only: the corpus scan produces per-source
  // (n, Σx, Σx²); the rest-of-corpus moments are EXACT integer
  // differences from the global totals (no second scan, no join) — the
  // totals ride an unpartitioned window over the |sources|-row AGGREGATE
  // (the q74 bucket-totals pattern: tiny frame, never the corpus).
  // Sample variances and t combine in the q57 double-cast order, so the
  // statistic is bit-identical across engines; |t| > 3 flags drift.
  // Round-12 FMA audit: in sxx_d − (sx_d·sx_d)/n_d the multiply feeds a
  // DIVISION, and every double add/sub here takes cast- or div-results
  // as operands — FMA contraction needs a multiply feeding an add, so
  // this tree has no fusable site; safe by shape (q231's argument).
  def q125DriftT(s: SparkSession, d: String): DataFrame = {
    def d_(c: Column): Column = c.cast("double")
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val g = Tables.documents(s, d)
      .select(col("source"), col("n_chars").as("x"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("tn", sum(col("n")).over(wAll))
      .withColumn("tsx", sum(col("sx")).over(wAll))
      .withColumn("tsxx", sum(col("sxx")).over(wAll))
      .withColumn("rn", col("tn") - col("n"))
      .withColumn("rsx", col("tsx") - col("sx"))
      .withColumn("rsxx", col("tsxx") - col("sxx"))
    // Degenerate-group guards, mirrored verbatim in the oracle: a
    // single-source corpus (rn = 0) or single-doc side (n-1 = 0) zeroes
    // a denominator — Spark NaN vs DuckDB NULL without nullif — and the
    // division inside the variance can round a true-zero variance to a
    // tiny NEGATIVE, which DuckDB's sqrt rejects outright: clamp at 0
    // through CASE (not greatest(), whose NULL handling differs between
    // engines), and NULL the t when its denominator is 0.
    def clamp0(c: Column): Column = when(c < 0d, lit(0d)).otherwise(c)
    g.withColumn("m1", d_(col("sx")) / d_(col("n")))
      .withColumn("m2", d_(col("rsx")) / nullif(d_(col("rn")), lit(0d)))
      .withColumn("v1", clamp0(
        (d_(col("sxx")) - d_(col("sx")) * d_(col("sx")) / d_(col("n")))
          / nullif(d_(col("n")) - 1, lit(0d))))
      .withColumn("v2", clamp0(
        (d_(col("rsxx")) - d_(col("rsx")) * d_(col("rsx"))
          / nullif(d_(col("rn")), lit(0d)))
          / nullif(d_(col("rn")) - 1, lit(0d))))
      .withColumn("t_stat", (col("m1") - col("m2"))
        / nullif(sqrt(col("v1") / d_(col("n")) + col("v2")
          / nullif(d_(col("rn")), lit(0d))), lit(0d)))
      .withColumn("drift", abs(col("t_stat")) > 3)
      .select(col("source"), col("n"), col("m1").as("mean_chars"),
        col("t_stat"), col("drift"))
      .orderBy(col("source"))
  }

  val q125Sql: String = """
    WITH g AS (
      SELECT source, COUNT(*) AS n,
        CAST(SUM(n_chars) AS BIGINT) AS sx,
        CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
      FROM documents GROUP BY source),
    t AS (
      SELECT source, n, sx, sxx,
        CAST(SUM(n) OVER () AS BIGINT) - n AS rn,
        CAST(SUM(sx) OVER () AS BIGINT) - sx AS rsx,
        CAST(SUM(sxx) OVER () AS BIGINT) - sxx AS rsxx
      FROM g),
    m0 AS (
      SELECT source, n,
        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
        CAST(rsx AS DOUBLE) / NULLIF(CAST(rn AS DOUBLE), 0) AS m2,
        (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
          / CAST(n AS DOUBLE))
          / NULLIF(CAST(n AS DOUBLE) - 1, 0) AS v1r,
        (CAST(rsxx AS DOUBLE) - CAST(rsx AS DOUBLE) * CAST(rsx AS DOUBLE)
          / NULLIF(CAST(rn AS DOUBLE), 0))
          / NULLIF(CAST(rn AS DOUBLE) - 1, 0) AS v2r,
        CAST(n AS DOUBLE) AS nd, CAST(rn AS DOUBLE) AS rnd
      FROM t),
    m AS (
      SELECT source, n, m1, m2, nd, rnd,
        CASE WHEN v1r < 0 THEN 0 ELSE v1r END AS v1,
        CASE WHEN v2r < 0 THEN 0 ELSE v2r END AS v2
      FROM m0)
    SELECT source, n, m1 AS mean_chars,
      (m1 - m2) / NULLIF(sqrt(v1 / nd + v2 / NULLIF(rnd, 0)), 0) AS t_stat,
      abs((m1 - m2)
        / NULLIF(sqrt(v1 / nd + v2 / NULLIF(rnd, 0)), 0)) > 3 AS drift
    FROM m ORDER BY source"""

  // ---- q152: corpus composition independence (source × lang) ----------
  // The doc-level categorical complement to q141's token drift: is the
  // language mix independent of the source, or does some source
  // over/under-represent a language? Per cell, the observed-over-
  // expected ratio O·T / (R·C) in exact integer ppm (the contingency-
  // table lift; the χ² statistic aggregates the same deviations — the
  // per-cell ratio is the actionable view, naming WHICH source×lang
  // cell skews). Staged floor-div ((O·1e6 div R)·T div C) keeps every
  // intermediate ≤ 1e6·T; past ~9e12 docs the same shape runs on
  // Decimal(38,0).
  //
  // Scale shape: one map-side-combining (source, lang) count — cell
  // count is |sources|·|langs|-bounded — margins and the total derived
  // from that tiny frame, scalar attach via broadcast. Zero corpus-
  // sized shuffles beyond the cell count.
  def q152CompositionSkew(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.documents(s, d)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .persist() // margins + total + score all derive from this frame
    val srcm = cells.groupBy(col("source")).agg(sum(col("n_docs")).as("r"))
    val langm = cells.groupBy(col("lang")).agg(sum(col("n_docs")).as("c"))
    val tot = cells.agg(sum(col("n_docs")).as("t"))
    cells.join(srcm, Seq("source")).join(langm, Seq("lang"))
      .crossJoin(broadcast(tot))
      .withColumn("ratio_ppm", expr("(n_docs * 1000000 div r) * t div c"))
      .withColumn("skew_band",
        when(col("ratio_ppm") >= 1200000L, "over")
          .when(col("ratio_ppm") <= 800000L, "under")
          .otherwise("indep"))
      .select(col("source"), col("lang"), col("n_docs"), col("ratio_ppm"),
        col("skew_band"))
      .orderBy(col("source"), col("lang"))
  }

  val q152Sql: String = raw"""
    WITH cells AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source, lang),
    r AS (SELECT source, CAST(SUM(n_docs) AS BIGINT) AS r
          FROM cells GROUP BY 1),
    c AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS c
          FROM cells GROUP BY 1),
    t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS t FROM cells)
    SELECT source, lang, n_docs,
      CAST((n_docs * 1000000 // r.r) * t.t // c.c AS BIGINT) AS ratio_ppm,
      CASE WHEN (n_docs * 1000000 // r.r) * t.t // c.c >= 1200000
             THEN 'over'
           WHEN (n_docs * 1000000 // r.r) * t.t // c.c <= 800000
             THEN 'under'
           ELSE 'indep' END AS skew_band
    FROM cells JOIN r USING (source) JOIN c USING (lang) CROSS JOIN t
    ORDER BY source, lang"""

  // ---- q158: per-source KS drift (max CDF gap over a bounded domain) ---
  // The distributional complement to q125 (mean shift) and q141 (token
  // TV distance): the two-sample Kolmogorov-Smirnov statistic between
  // each source's quality-score distribution and the corpus — D =
  // max over score levels of |CDF_source − CDF_corpus|, the standard
  // "did this source's quality profile drift" alarm, sensitive to shape
  // changes a mean test misses. Score = stopword per-mille (the q157
  // signal; BOUNDED 0..1000 domain so the CDF grid is bounded). Exact
  // integers end to end: both CDFs as floor-div ppm of nonnegative
  // cumulative counts (identical in both engines), the per-source max +
  // its argmax level packed as max(d_ppm·10⁴ + score) — deterministic
  // tie-break toward the higher score, no float compare, no arg_max.
  //
  // Scale shape: zero corpus text scans — the score derives from the
  // PINNED q25 attribute table's (n_stop, n_tokens) integers (q25's
  // tokenization: raw whitespace split of trimmed lowercase, a blank
  // doc is the single empty token at score 0), then one
  // map-side-combining groupBy onto ≤ |sources|·1001 histogram rows;
  // the evaluation grid is sources × corpus score levels (bounded,
  // broadcast); windows run over the bounded grid. Zero corpus-sized
  // shuffles beyond the histogram aggregate.
  def q158KsDrift(s: SparkSession, d: String): DataFrame = {
    val sc = TextOps.attrHeuristic(s, d)
      .withColumn("score", expr("n_stop * 1000 div n_tokens"))
      .select(col("source"), col("score"))
    val sh = sc.groupBy(col("source"), col("score"))
      .agg(count(lit(1)).as("cnt"))
      .persist() // source totals, corpus histogram, and the grid all
                 // derive from this bounded integer frame
    val st = sh.groupBy(col("source")).agg(sum(col("cnt")).as("n_s"))
    val chist = sh.groupBy(col("score")).agg(sum(col("cnt")).as("c_cnt"))
    val ctot = chist.agg(sum(col("c_cnt")).as("n_c"))
    // corpus CDF over its own (bounded) level set
    val ccum = chist
      .withColumn("cum_c", sum(col("c_cnt")).over(Window.orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("score"), col("cum_c"))
    // evaluation grid: every source × every corpus score level — the KS
    // sup is attained at a jump point of either CDF, and every source
    // level is a corpus level by construction
    val grid = sh.select(col("source")).distinct()
      .crossJoin(broadcast(chist.select(col("score"))))
      .join(sh, Seq("source", "score"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("cum_s",
        sum(col("cnt")).over(Window.partitionBy(col("source"))
          .orderBy(col("score"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    grid.join(broadcast(ccum), Seq("score"))
      .join(broadcast(st), Seq("source"))
      .crossJoin(broadcast(ctot))
      .withColumn("d_ppm", abs(
        expr("cum_s * 1000000 div n_s") - expr("cum_c * 1000000 div n_c")))
      .groupBy(col("source"), col("n_s"))
      .agg(max(col("d_ppm") * 10000L + col("score")).as("pk"))
      .select(col("source"), col("n_s").as("n_docs"),
        expr("pk div 10000").as("ks_ppm"),
        expr("pk % 10000").as("worst_score"))
      .withColumn("drift_band",
        when(col("ks_ppm") >= 200000L, "shifted")
          .when(col("ks_ppm") >= 50000L, "drifted")
          .otherwise("aligned"))
      .orderBy(col("source"))
  }

  val q158Sql: String = raw"""
    WITH sc AS (
      SELECT source,
        CAST(len(list_filter(t, x -> list_contains(
          ['the','a','of','and','to','in','is','it'], x))) AS BIGINT)
          * 1000 // CAST(len(t) AS BIGINT) AS score
      FROM (SELECT source, string_split_regex(
              trim(lower(text)), '[ \t\n\r\f]+') AS t
            FROM documents)),
    sh AS (
      SELECT source, score, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM sc GROUP BY 1, 2),
    st AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_s
           FROM sh GROUP BY 1),
    chist AS (SELECT score, CAST(SUM(cnt) AS BIGINT) AS c_cnt
              FROM sh GROUP BY 1),
    ctot AS (SELECT CAST(SUM(c_cnt) AS BIGINT) AS n_c FROM chist),
    ccum AS (
      SELECT score, CAST(SUM(c_cnt) OVER (ORDER BY score
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS cum_c
      FROM chist),
    grid AS (
      SELECT s.source, g.score, COALESCE(sh.cnt, 0) AS cnt
      FROM (SELECT DISTINCT source FROM sh) s
      CROSS JOIN (SELECT score FROM chist) g
      LEFT JOIN sh ON sh.source = s.source AND sh.score = g.score),
    cum AS (
      SELECT source, score, CAST(SUM(cnt) OVER (PARTITION BY source
        ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        AS BIGINT) AS cum_s
      FROM grid),
    dv AS (
      SELECT cum.source, st.n_s,
        abs(cum_s * 1000000 // n_s - cum_c * 1000000 // n_c) AS d_ppm,
        cum.score
      FROM cum JOIN ccum USING (score) JOIN st USING (source)
      CROSS JOIN ctot)
    SELECT source, n_s AS n_docs,
      CAST(MAX(d_ppm * 10000 + score) // 10000 AS BIGINT) AS ks_ppm,
      CAST(MAX(d_ppm * 10000 + score) % 10000 AS BIGINT) AS worst_score,
      CASE WHEN MAX(d_ppm * 10000 + score) // 10000 >= 200000
             THEN 'shifted'
           WHEN MAX(d_ppm * 10000 + score) // 10000 >= 50000
             THEN 'drifted'
           ELSE 'aligned' END AS drift_band
    FROM dv GROUP BY source, n_s ORDER BY source"""

  // ---- q186: effective sample size under importance weights ------------
  // The audit that closes q101's importance-sampling loop: Kish's
  // ESS = (Σw)² / Σw² per source, for exactly q101's weight design
  // (w = min(n_chars, 512)). Relative ESS (ppm of n) is the number a
  // mixture designer actually reads — 1e6 means the weighting is a
  // no-op, a low value means a few long docs dominate the drawn sample
  // and the source's nominal document count overstates its statistical
  // contribution (variance ∝ 1/ESS). Run BEFORE committing a sampling
  // design: a source with ess_ppm ≪ 1e6 needs weight clipping (lower
  // cap) or stratification, not more draws.
  //
  // Exact-integer discipline: w ≤ 512 so Σw ≤ 512n and (Σw)²·1e6 ≤
  // 2.7e37 < 1e38 for n up to 1e13 docs — Decimal(38,0) carries the
  // numerator exactly (the documented q146/q151 large-scale pattern),
  // matching DuckDB's HUGEINT. One map-side-combining aggregate onto
  // |sources| rows; zero text scans (n_chars is a footer column).
  def q186EffectiveSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("w", least(col("n_chars"), lit(512L)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).as("sum_w"),
        sum(col("w") * col("w")).as("sum_w2"))
      .withColumn("ess_docs",
        expr("cast(sum_w as decimal(38,0)) * sum_w div sum_w2"))
      .withColumn("ess_ppm",
        // the DENOMINATOR must widen too: n_docs * sum_w2 in Long wraps
        // (or throws under ANSI) past ~6e6 capped docs per source, far
        // below the numerator's 1e13 envelope
        expr("cast(sum_w as decimal(38,0)) * sum_w * 1000000" +
          " div (cast(n_docs as decimal(38,0)) * sum_w2)"))
      .withColumn("ess_band",
        when(col("ess_ppm") >= 900000L, "uniform")
          .when(col("ess_ppm") >= 600000L, "mild_skew")
          .otherwise("concentrated"))
      .select(col("source"), col("n_docs"), col("sum_w"), col("sum_w2"),
        col("ess_docs"), col("ess_ppm"), col("ess_band"))
      .orderBy(col("source"))

  val q186Sql: String = """
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(w) AS BIGINT) AS sum_w,
      CAST(SUM(w * w) AS BIGINT) AS sum_w2,
      CAST(CAST(SUM(w) AS HUGEINT) * SUM(w) // SUM(w * w) AS BIGINT)
        AS ess_docs,
      CAST(CAST(SUM(w) AS HUGEINT) * SUM(w) * 1000000
        // (COUNT(*) * SUM(w * w)) AS BIGINT) AS ess_ppm,
      CASE WHEN CAST(SUM(w) AS HUGEINT) * SUM(w) * 1000000
               // (COUNT(*) * SUM(w * w)) >= 900000 THEN 'uniform'
           WHEN CAST(SUM(w) AS HUGEINT) * SUM(w) * 1000000
               // (COUNT(*) * SUM(w * w)) >= 600000 THEN 'mild_skew'
           ELSE 'concentrated' END AS ess_band
    FROM (SELECT source, LEAST(n_chars, 512) AS w FROM documents)
    GROUP BY source ORDER BY source"""

  // ---- q202: winsorized + trimmed robust means -------------------------
  // The outlier-robust location estimates a metrics pipeline serves when
  // a mean is wanted but single fat-fingered / bot rows must not own it:
  // per event type, the p05/p95 band from the bounded-state histogram
  // contract (same machinery as q56 — exact, quantile_cont-compatible
  // interpolation), then the winsorized mean (tails CLAMPED to the band
  // edges) and the trimmed mean (tails DROPPED) side by side. Band edges
  // are rounded to integer cent units (floor(x+0.5) on the identical
  // interpolated double in both engines) so the clamp, the sums, and the
  // divisions all stay in the exact-integer discipline; each reported
  // mean is one IEEE division of identical integers.
  //
  // Scale shape: the q56 two-scan posture — one bounded-domain histogram
  // aggregate for the cuts, one clamp+aggregate scan with the ≤|types|-row
  // cut table broadcast onto it. No per-group value buffering anywhere.
  def q202Winsorized(s: SparkSession, d: String): DataFrame = {
    val rows = Tables.events(s, d)
      .select(col("event_type"), toUnits(col("value")).as("u"))
    val cuts = StatsOps.histPercentiles(rows, "event_type", "u",
        Seq(0.05, 0.95))
      .select(col("event_type"),
        floor(element_at(col("ps"), 1) + 0.5).cast("long").as("lo"),
        floor(element_at(col("ps"), 2) + 0.5).cast("long").as("hi"))
    rows.join(broadcast(cuts), Seq("event_type"))
      .withColumn("cu", least(greatest(col("u"), col("lo")), col("hi")))
      .withColumn("inb",
        col("u") >= col("lo") && col("u") <= col("hi"))
      .groupBy(col("event_type"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"),
        sum(col("cu")).as("wsum"),
        sum(when(col("inb"), col("u"))).as("tsum"),
        sum(when(col("inb"), 1L).otherwise(0L)).as("trimmed_n"))
      .withColumn("winsor_mean",
        col("wsum").cast("double") / col("n") / 100.0)
      .withColumn("trimmed_mean",
        col("tsum").cast("double") / col("trimmed_n") / 100.0)
      .select(col("event_type"), col("n"), col("lo"), col("hi"),
        col("winsor_mean"), col("trimmed_n"), col("trimmed_mean"))
      .orderBy(col("event_type"))
  }

  val q202Sql: String = s"""
    WITH cuts AS (
      SELECT event_type,
        CAST(FLOOR(q[1] + 0.5) AS BIGINT) AS lo,
        CAST(FLOOR(q[2] + 0.5) AS BIGINT) AS hi
      FROM (SELECT event_type,
              quantile_cont(${sqlUnits("value")}, [0.05, 0.95]) AS q
            FROM events GROUP BY 1)),
    rows_ AS (
      SELECT e.event_type, ${sqlUnits("value")} AS u, c.lo, c.hi
      FROM events e JOIN cuts c USING (event_type))
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, lo, hi,
      CAST(SUM(LEAST(GREATEST(u, lo), hi)) AS BIGINT)
        / CAST(COUNT(*) AS BIGINT) / 100.0 AS winsor_mean,
      CAST(SUM(CASE WHEN u BETWEEN lo AND hi THEN 1 ELSE 0 END) AS BIGINT)
        AS trimmed_n,
      CAST(SUM(CASE WHEN u BETWEEN lo AND hi THEN u END) AS BIGINT)
        / CAST(SUM(CASE WHEN u BETWEEN lo AND hi THEN 1 ELSE 0 END)
            AS BIGINT) / 100.0 AS trimmed_mean
    FROM rows_ GROUP BY event_type, lo, hi ORDER BY event_type"""

  // ---- q216: k-anonymity audit -----------------------------------------
  // The privacy gate a training-data release runs before shipping any
  // per-user table: group the corpus by its quasi-identifier tuple
  // (nation × market segment × $100 account-balance band — the kind of
  // coarse public attributes that re-identify when combined) and report
  // how much of the population sits in groups of size k < 2 / 5 / 10.
  // A row in a k=1 group is uniquely re-identifiable from the quasi-ids
  // alone; the k-band row shares are the numbers an anonymization review
  // reads. Scale shape: ONE groupBy onto the quasi-id grid (bounded by
  // |nations|·|segments|·|bands| — domain-bounded state, never per-row),
  // then a ≤4-row band rollup; the population total is a 1-row broadcast.
  def q216KAnonymity(s: SparkSession, d: String): DataFrame = {
    val qid = Tables.customer(s, d)
      .select(col("c_nationkey"), col("c_mktsegment"),
        // floor(x/100) is one IEEE divide + floor on the same double in
        // both engines — exact band parity without negative-div hazards
        floor(col("c_acctbal") / 100.0).cast("long").as("bal_band"))
    val groups = qid
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
      .agg(count(lit(1)).as("k"))
    val total = qid.agg(count(lit(1)).as("n_total"))
    groups
      .withColumn("k_band",
        when(col("k") === 1L, "k1")
          .when(col("k") <= 4L, "k2_4")
          .when(col("k") <= 9L, "k5_9")
          .otherwise("k10plus"))
      .groupBy(col("k_band"))
      .agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_rows"))
      .crossJoin(broadcast(total))
      .withColumn("row_share_ppm", expr("n_rows * 1000000 div n_total"))
      .select(col("k_band"), col("n_groups"), col("n_rows"),
        col("row_share_ppm"))
      .orderBy(col("k_band"))
  }

  val q216Sql: String = """
    WITH qid AS (
      SELECT c_nationkey, c_mktsegment,
        CAST(FLOOR(c_acctbal / 100.0) AS BIGINT) AS bal_band
      FROM customer),
    g AS (
      SELECT c_nationkey, c_mktsegment, bal_band,
        CAST(COUNT(*) AS BIGINT) AS k
      FROM qid GROUP BY 1, 2, 3),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM qid)
    SELECT CASE WHEN k = 1 THEN 'k1' WHEN k <= 4 THEN 'k2_4'
                WHEN k <= 9 THEN 'k5_9' ELSE 'k10plus' END AS k_band,
      CAST(COUNT(*) AS BIGINT) AS n_groups,
      CAST(SUM(k) AS BIGINT) AS n_rows,
      CAST(SUM(k) * 1000000 // n_total AS BIGINT) AS row_share_ppm
    FROM g CROSS JOIN t
    GROUP BY 1, n_total ORDER BY 1"""

  // ---- q217: Mann–Whitney rank test per source -------------------------
  // The nonparametric complement of q125's t-drift and q158's KS: per
  // source, the rank-sum (Mann–Whitney U) test of its n_chars
  // distribution against the REST of the corpus, with full tie
  // correction — the standard "did this source's length profile shift"
  // monitor when normality can't be assumed. Also reports the
  // rank-biserial AUC (U / n_a·n_b — P(source doc longer than corpus
  // doc)), the effect size reviewers act on.
  //
  // Scale shape: everything derives from the (source, n_chars) histogram
  // — domain-bounded state (n_chars is a footer column; zero text
  // scans). Ranks come from the corpus-level cumulative over the value
  // level set (the q158 grid trick): the tied-block average rank ×2 is
  // the exact integer 2·prev + c_cnt + 1, so R, U, the tie term and the
  // variance numerator are all exact Decimal(38,0) ↔ HUGEINT, and z is
  // a fixed IEEE op sequence (3 casts, mul, div, sqrt, mul, div) on
  // identical integers. Headroom: N ≤ 1e11 docs keeps N³ ≈ 1e33 and
  // n_a·n_b ≤ 1e22 inside 38 digits; the z factors multiply as doubles.
  def q217RankTest(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(s, d)
      .select(col("source"), col("n_chars").as("v"))
      .groupBy(col("source"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .persist() // corpus hist, tie term, per-source rank sums all derive
    val chist = sh.groupBy(col("v")).agg(sum(col("cnt")).as("c_cnt"))
    val ccum = chist
      .withColumn("prev",
        sum(col("c_cnt")).over(Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("c_cnt"))
      .select(col("v"), col("prev"), col("c_cnt"))
    val tot = chist.agg(
      sum(col("c_cnt")).as("n_all"),
      sum(expr("cast(c_cnt as decimal(38,0)) * c_cnt * c_cnt - c_cnt"))
        .as("ties"))
    val per = sh.join(broadcast(ccum), Seq("v"))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_a"),
        sum(expr("cast(cnt as decimal(38,0)) * (2 * prev + c_cnt + 1)"))
          .as("r2")) // = 2·(rank sum of the source in the pooled corpus)
    per.crossJoin(broadcast(tot))
      .withColumn("n_b", col("n_all") - col("n_a"))
      .withColumn("u2",
        expr("r2 - cast(n_a as decimal(38,0)) * (n_a + 1)")) // = 2U
      .withColumn("p1", expr("cast(n_a as decimal(38,0)) * n_b"))
      .withColumn("p2", expr(
        "cast(n_all as decimal(38,0)) * n_all * n_all - n_all - ties"))
      .withColumn("den",
        expr("12 * cast(n_all as decimal(38,0)) * (n_all - 1)"))
      .withColumn("auc_ppm",
        expr("cast(u2 * 1000000 div (2 * nullif(p1, 0)) as bigint)"))
      .withColumn("z",
        when(col("p1") === 0 || col("p2") <= 0, lit(null).cast("double"))
          .otherwise((col("u2") - col("p1")).cast("double") /
            (lit(2.0) * sqrt(col("p1").cast("double") *
              col("p2").cast("double") / col("den").cast("double")))))
      .withColumn("shift_band",
        when(col("z").isNull, "degenerate")
          .when(abs(col("z")) >= 3.29, "strong_shift")
          .when(abs(col("z")) >= 1.96, "shift")
          .otherwise("aligned"))
      .select(col("source"), col("n_a").as("n_docs"),
        col("n_b").cast("long").as("n_rest"), col("auc_ppm"), col("z"),
        col("shift_band"))
      .orderBy(col("source"))
  }

  val q217Sql: String = """
    WITH sh AS (
      SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents GROUP BY 1, 2),
    chist AS (SELECT v, CAST(SUM(cnt) AS BIGINT) AS c_cnt
              FROM sh GROUP BY 1),
    ccum AS (
      SELECT v, c_cnt,
        CAST(SUM(c_cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS BIGINT) - c_cnt AS prev
      FROM chist),
    tot AS (
      SELECT CAST(SUM(c_cnt) AS BIGINT) AS n_all,
        SUM(CAST(c_cnt AS HUGEINT) * c_cnt * c_cnt - c_cnt) AS ties
      FROM chist),
    per AS (
      SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_a,
        SUM(CAST(cnt AS HUGEINT) * (2 * prev + c_cnt + 1)) AS r2
      FROM sh JOIN ccum USING (v) GROUP BY 1),
    m AS (
      SELECT source, n_a, n_all - n_a AS n_b,
        r2 - CAST(n_a AS HUGEINT) * (n_a + 1) AS u2,
        CAST(n_a AS HUGEINT) * (n_all - n_a) AS p1,
        CAST(n_all AS HUGEINT) * n_all * n_all - n_all - ties AS p2,
        12 * CAST(n_all AS HUGEINT) * (n_all - 1) AS den
      FROM per CROSS JOIN tot),
    zz AS (
      SELECT source, n_a, n_b, u2, p1, p2,
        CASE WHEN p1 = 0 OR p2 <= 0 THEN NULL
             ELSE CAST(u2 - p1 AS DOUBLE)
               / (2 * sqrt(CAST(p1 AS DOUBLE) * CAST(p2 AS DOUBLE)
                   / CAST(den AS DOUBLE))) END AS z
      FROM m)
    SELECT source, n_a AS n_docs, CAST(n_b AS BIGINT) AS n_rest,
      CAST(u2 * 1000000 // (2 * nullif(p1, 0)) AS BIGINT) AS auc_ppm, z,
      CASE WHEN z IS NULL THEN 'degenerate'
           WHEN abs(z) >= 3.29 THEN 'strong_shift'
           WHEN abs(z) >= 1.96 THEN 'shift'
           ELSE 'aligned' END AS shift_band
    FROM zz ORDER BY source"""

  // ---- q218: autocorrelation of the daily event series -----------------
  // The seasonality probe behind capacity planning and anomaly baselines:
  // Pearson autocorrelation of the daily event-count series at lags
  // 1..7 (a weekly cycle shows as a spike at lag 7). Calendar-true: the
  // pair (t, t−k) exists only when BOTH days have events (an equi-join
  // on the day index, not a row-offset lag — missing days don't smear
  // the lag). Scale shape: the corpus collapses to the |days|-row daily
  // frame in one map-side-combining aggregate; the 7 lag joins run on
  // that bounded frame (≤7·|days| rows) with the lag list broadcast.
  // All co-moments are exact Decimal(38,0) ↔ HUGEINT (daily counts ≤
  // ~3e8 at 100 TB keep n·Σxy ≤ ~1e24 — inside 38 digits); r is a fixed
  // IEEE sequence on identical integers — and FMA-safe by shape
  // (round-12 audit): num_d / sqrt(vx_d · vy_d) is mul → sqrt → div
  // with no double-space add to contract into, so each op's single
  // IEEE rounding is the whole story in both engines (q231's argument).
  def q218Autocorr(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(datediff(to_date(col("ts")), lit("1970-01-01"))
        .cast("long").as("di"))
      .groupBy(col("di")).agg(count(lit(1)).as("x"))
      .persist() // both sides of every lag join read this |days|-row frame
    val lags = s.range(1, 8).select(col("id").as("lag"))
    val prior = daily.select(col("di").as("dj"), col("x").as("y"))
    daily.crossJoin(broadcast(lags))
      .withColumn("dj", col("di") - col("lag"))
      .join(prior, Seq("dj"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"),
        sum(expr("cast(y as decimal(38,0)) * y")).as("syy"))
      .withColumn("num",
        expr("n_pairs * sxy - cast(sx as decimal(38,0)) * sy"))
      .withColumn("vx",
        expr("n_pairs * sxx - cast(sx as decimal(38,0)) * sx"))
      .withColumn("vy",
        expr("n_pairs * syy - cast(sy as decimal(38,0)) * sy"))
      .withColumn("r",
        when(col("vx") <= 0 || col("vy") <= 0, lit(null).cast("double"))
          .otherwise(col("num").cast("double") /
            sqrt(col("vx").cast("double") * col("vy").cast("double"))))
      .select(col("lag"), col("n_pairs"), col("r"))
      .orderBy(col("lag"))
  }

  val q218Sql: String = """
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
        CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    pairs AS (
      SELECT l.lag, a.x, b.x AS y
      FROM daily a
      CROSS JOIN (SELECT CAST(unnest(generate_series(1, 7)) AS BIGINT)
                    AS lag) l
      JOIN daily b ON b.di = a.di - l.lag),
    agg AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        SUM(CAST(x AS HUGEINT) * y) AS sxy,
        SUM(CAST(x AS HUGEINT) * x) AS sxx,
        SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM pairs GROUP BY 1),
    m AS (
      SELECT lag, n_pairs,
        n_pairs * sxy - CAST(sx AS HUGEINT) * sy AS num,
        n_pairs * sxx - CAST(sx AS HUGEINT) * sx AS vx,
        n_pairs * syy - CAST(sy AS HUGEINT) * sy AS vy
      FROM agg)
    SELECT lag, n_pairs,
      CASE WHEN vx <= 0 OR vy <= 0 THEN NULL
           ELSE CAST(num AS DOUBLE)
             / sqrt(CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)) END AS r
    FROM m ORDER BY lag"""

  // ---- q219: EWMA control chart on daily regional revenue --------------
  // The drift monitor a finance dashboard runs nightly: per region, each
  // day's revenue against the exponentially-weighted moving average of
  // its trailing 7 days (α = ½ → integer weights 2^(7−j), exact in both
  // engines), flagging days that deviate ≥40% from their own trend.
  // A TRUNCATED-horizon EWMA by design: the closed-form infinite EWMA
  // needs pow(1−α, −i) factors that overflow doubles past a few hundred
  // days, and a recursive form (q192's territory) shuffles per step —
  // the 7-day window keeps every weight an exact small integer and the
  // whole chart two bounded-frame passes. Calendar-true via the day
  // index (missing days shrink the weight mass — the denominator sums
  // only PRESENT priors). Scale shape: the corpus collapses onto the
  // |regions|·|days| daily frame once; the trailing window is a 7-way
  // exploded equi-join of that bounded frame with itself (lag list
  // broadcast), never a corpus shuffle. First days degrade to 'warmup'
  // (NULL ewma), not a crash.
  def q219EwmaChart(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), to_date(col("o_orderdate")).as("day"),
        toUnits(col("o_totalprice")).as("u"))
      .groupBy(col("r_name"), col("day"))
      .agg(sum(col("u")).as("cents"))
      .withColumn("di", datediff(col("day"), lit("1970-01-01")).cast("long"))
      .persist() // the series joins itself over the 7-day trailing frame
    val lags = s.range(1, 8).select(col("id").as("lag"))
    val pri = rev
      .crossJoin(broadcast(lags))
      .select(col("r_name"), (col("di") + col("lag")).as("di"),
        (expr("cast(pow(2, 7 - lag) as bigint)") * col("cents")).as("wc"),
        expr("cast(pow(2, 7 - lag) as bigint)").as("w"))
      .groupBy(col("r_name"), col("di"))
      .agg(sum(col("wc")).as("num"), sum(col("w")).as("den"))
    rev.join(pri, Seq("r_name", "di"), "left")
      .withColumn("ewma_cents", expr("num div den"))
      .withColumn("dev_ppm",
        when(col("ewma_cents").isNull || col("ewma_cents") === 0L,
          lit(null).cast("long"))
          // abs() keeps the staged floor-div on NON-NEGATIVE ints — Spark
          // div truncates toward zero where DuckDB // floors, so a signed
          // numerator would diverge; the sign ships separately as `dir`
          .otherwise(expr("cast(cast(abs(cents - ewma_cents) as" +
            " decimal(38,0)) * 1000000 div ewma_cents as bigint)")))
      .withColumn("dir",
        when(col("ewma_cents").isNull, lit(null).cast("int"))
          .otherwise(signum(col("cents") - col("ewma_cents")).cast("int")))
      .withColumn("alarm",
        when(col("dev_ppm").isNull, "warmup")
          .when(col("dev_ppm") >= 400000L, "breach")
          .otherwise("ok"))
      .select(col("r_name"), col("day"), col("cents").as("rev_cents"),
        col("ewma_cents"), col("dir"), col("dev_ppm"), col("alarm"))
      .orderBy(col("r_name"), col("day"))
  }

  val q219Sql: String = s"""
    WITH rev AS (
      SELECT r_name, CAST(o_orderdate AS DATE) AS day,
        ${sqlUnitSum("o_totalprice")} AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2),
    se AS (
      SELECT r_name, day, CAST(day - DATE '1970-01-01' AS BIGINT) AS di,
        cents
      FROM rev),
    pri AS (
      SELECT r_name, di + lag AS di,
        CAST(SUM(CAST(POWER(2, 7 - lag) AS BIGINT) * cents) AS BIGINT)
          AS num,
        CAST(SUM(CAST(POWER(2, 7 - lag) AS BIGINT)) AS BIGINT) AS den
      FROM se CROSS JOIN (SELECT CAST(unnest(generate_series(1, 7))
                            AS BIGINT) AS lag) l
      GROUP BY 1, 2),
    j AS (
      SELECT se.r_name, se.day, se.cents, p.num // p.den AS ewma_cents
      FROM se LEFT JOIN pri p ON p.r_name = se.r_name AND p.di = se.di)
    SELECT r_name, day, cents AS rev_cents, ewma_cents,
      CASE WHEN ewma_cents IS NULL THEN NULL
           ELSE CAST(sign(cents - ewma_cents) AS INTEGER) END AS dir,
      CASE WHEN ewma_cents IS NULL OR ewma_cents = 0 THEN NULL
           ELSE CAST(CAST(abs(cents - ewma_cents) AS HUGEINT) * 1000000
             // ewma_cents AS BIGINT) END AS dev_ppm,
      CASE WHEN ewma_cents IS NULL OR ewma_cents = 0 THEN 'warmup'
           WHEN CAST(abs(cents - ewma_cents) AS HUGEINT) * 1000000
             // ewma_cents >= 400000 THEN 'breach'
           ELSE 'ok' END AS alarm
    FROM j ORDER BY r_name, day"""

  // ---- q224: l-diversity audit -----------------------------------------
  // q216's sibling: k-anonymity alone doesn't stop attribute disclosure —
  // a k=50 group whose members all share one market segment still leaks
  // the segment for anyone placed in the group. Per quasi-identifier
  // group (nation × $100 balance band — note the SENSITIVE attribute is
  // excluded from the quasi-id here, unlike q216), l = the number of
  // distinct sensitive values (c_mktsegment); report the l-band ledger a
  // release review reads (l=1 means the group is fully disclosing).
  // Scale shape: one groupBy onto the quasi-id grid with a bounded
  // count-distinct (the sensitive domain is |segments|), then a ≤3-row
  // band rollup; the population total is a 1-row broadcast.
  def q224LDiversity(s: SparkSession, d: String): DataFrame = {
    val qid = Tables.customer(s, d)
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / 100.0).cast("long").as("bal_band"),
        col("c_mktsegment"))
    val groups = qid
      .groupBy(col("c_nationkey"), col("bal_band"))
      .agg(count(lit(1)).as("k"),
        countDistinct(col("c_mktsegment")).as("l"))
    val total = qid.agg(count(lit(1)).as("n_total"))
    groups
      .withColumn("l_band",
        when(col("l") === 1L, "l1_disclosing")
          .when(col("l") === 2L, "l2")
          .otherwise("l3plus"))
      .groupBy(col("l_band"))
      .agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_rows"),
        min(col("l")).as("min_l"))
      .crossJoin(broadcast(total))
      .withColumn("row_share_ppm", expr("n_rows * 1000000 div n_total"))
      .select(col("l_band"), col("n_groups"), col("n_rows"),
        col("min_l"), col("row_share_ppm"))
      .orderBy(col("l_band"))
  }

  val q224Sql: String = """
    WITH qid AS (
      SELECT c_nationkey,
        CAST(FLOOR(c_acctbal / 100.0) AS BIGINT) AS bal_band,
        c_mktsegment
      FROM customer),
    g AS (
      SELECT c_nationkey, bal_band, CAST(COUNT(*) AS BIGINT) AS k,
        CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l
      FROM qid GROUP BY 1, 2),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM qid)
    SELECT CASE WHEN l = 1 THEN 'l1_disclosing' WHEN l = 2 THEN 'l2'
                ELSE 'l3plus' END AS l_band,
      CAST(COUNT(*) AS BIGINT) AS n_groups,
      CAST(SUM(k) AS BIGINT) AS n_rows,
      CAST(MIN(l) AS BIGINT) AS min_l,
      CAST(SUM(k) * 1000000 // n_total AS BIGINT) AS row_share_ppm
    FROM g CROSS JOIN t
    GROUP BY 1, n_total ORDER BY 1"""

  // ---- q228: Siegel repeated-median robust trend of daily revenue ------
  // The outlier-robust slope estimator next to q115's OLS — the Siegel
  // repeated median (the Theil–Sen family member with the 50% breakdown
  // point): slope = median over days i of ( median over j≠i of the
  // pairwise slope (i,j) ), with the OLS slope alongside and an integer
  // agreement verdict — the robust/classical split is exactly how a
  // metrics pipeline detects "the trend is three fat-fingered days"
  // (q202's winsorized-mean lesson, applied to regression).
  //
  // The repeated median is also the SCALE-CORRECT family member: plain
  // Theil–Sen needs the median of all O(|days|²) pair slopes, which are
  // near-unique reals (measured 2.89M distinct of 2.89M pairs at sf0.1)
  // — a global median over an incompressible set, i.e. one sorting task.
  // The repeated median's inner medians partition BY DAY (≤|days|−1
  // values per group, fully parallel windows) and its outer median runs
  // over only |days| values. Measured 13.6 s → ~1 s at sf0.1. Slopes
  // quantize to exact signed ppm via sign-split floor-div (Spark div
  // truncates where DuckDB // floors — magnitude and sign travel
  // separately); each median is quantile_cont-compatible interpolation
  // whose result is floored to integer ppm before re-entering exact
  // arithmetic. The pair frame itself is CALENDAR-bounded — it grows
  // with the time range, not data volume.
  def q228TheilSen(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .select(to_date(col("o_orderdate")).as("day"),
        toUnits(col("o_totalprice")).as("u"))
      .groupBy(col("day")).agg(sum(col("u")).as("cents"))
      .select(datediff(col("day"), lit("1970-01-01")).cast("long").as("di"),
        col("cents"))
      .persist() // pair frame, OLS co-moments, and the residual median
    val a = daily.select(col("di").as("x1"), col("cents").as("y1"))
    val b = daily.select(col("di").as("x2"), col("cents").as("y2"))
    // calendar-bounded both sides — the broadcast theta join is the
    // intended O(|days|²) pair generator, never a corpus cartesian
    val pairs = a.join(broadcast(b), col("x2") =!= col("x1"))
      .select(col("x1"),
        expr("case when (x2 > x1) = (y2 >= y1)" +
          " then cast(cast(abs(y2 - y1) as decimal(38,0)) * 1000000" +
          " div abs(x2 - x1) as bigint)" +
          " else -cast(cast(abs(y2 - y1) as decimal(38,0)) * 1000000" +
          " div abs(x2 - x1) as bigint) end").as("v"))
    // Medians by FIXED-RANK picks, not histograms: every day pairs with
    // every other, so the inner group size is exactly n_days−1 and the
    // outer set is exactly n_days — the interpolation ranks are known up
    // front, and each median is one partition-parallel rank window plus
    // a filter (slopes are near-unique reals, so a value histogram would
    // compress nothing and only add a 5.8M-row shuffle+persist — the
    // measured 14.8 s → ~4 s difference at sf0.1). Medians travel ×2
    // (dm2 = v_lo + v_hi, or 2v when the group size is odd) then ×2
    // again (o4), so everything stays exact integers until the single
    // o4/4.0 IEEE divide at the end.
    val nd = daily.agg(count(lit(1)).as("n_days"))
    val wIn = Window.partitionBy(col("x1")).orderBy(col("v"))
    val dm = pairs.withColumn("rn", row_number().over(wIn))
      .crossJoin(broadcast(nd))
      .filter(col("rn") === expr("n_days div 2") ||
        col("rn") === expr("(n_days + 1) div 2"))
      .groupBy(col("x1"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("k"))
      .select(col("x1"),
        expr("case when k = 2 then s else s * 2 end").as("dm2"))
    val slopeMed = dm
      .withColumn("rn", row_number().over(Window.orderBy(col("dm2"))))
      .crossJoin(broadcast(nd))
      .filter(col("rn") === expr("(n_days + 1) div 2") ||
        col("rn") === expr("(n_days + 2) div 2"))
      .groupBy(col("n_days"))
      .agg(sum(col("dm2")).as("s"), count(lit(1)).as("k"))
      .select(lit("all").as("g"),
        floor(expr("case when k = 2 then s else s * 2 end") / 4.0 + 0.5)
          .cast("long").as("theil_ppm"),
        expr("n_days * (n_days - 1) div 2").as("n_pairs"))
      .persist() // 1 row, 3 consumers (residual median, final join) —
                 // without the pin the 5.8M-row pair window re-runs per
                 // consumer (measured 6.7 s → 3.6 s at sf0.1)
    val resid = daily.crossJoin(broadcast(slopeMed))
      .select(col("g"), expr("cast(cast(cents as decimal(38,0)) * 1000000" +
        " - cast(theil_ppm as decimal(38,0)) * di as bigint)").as("v"))
    val intercept = histPercentiles(resid, "g", "v", Seq(0.5),
        degrade = false)
      .select(col("g"),
        floor(element_at(col("ps"), 1) + 0.5).cast("long")
          .as("intercept_ppm"))
    val ols = daily.select(lit("all").as("g"), col("di"), col("cents"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("di")).as("sx"), sum(col("cents")).as("sy"),
        sum(expr("cast(di as decimal(38,0)) * cents")).as("sxy"),
        sum(expr("cast(di as decimal(38,0)) * di")).as("sxx"))
      .withColumn("num",
        expr("n_days * sxy - cast(sx as decimal(38,0)) * sy"))
      .withColumn("den",
        expr("n_days * sxx - cast(sx as decimal(38,0)) * sx"))
      .withColumn("ols_ppm", expr(
        "case when den = 0 then null" +
          " when num >= 0 then cast(num * 1000000 div den as bigint)" +
          " else cast(-((-num) * 1000000 div den) as bigint) end"))
      .select(col("g"), col("n_days"), col("ols_ppm"))
    slopeMed.join(broadcast(intercept), Seq("g"))
      .join(broadcast(ols), Seq("g"))
      .withColumn("trend_band",
        when(col("ols_ppm").isNull, "degenerate")
          .when(abs(col("theil_ppm") - col("ols_ppm")) * 10
            <= abs(col("ols_ppm")), "agrees")
          .otherwise("outlier_influenced"))
      .select(col("n_days"), col("n_pairs"), col("theil_ppm"),
        col("intercept_ppm"), col("ols_ppm"), col("trend_band"))
  }

  val q228Sql: String = s"""
    WITH daily AS (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        AS di, ${sqlUnitSum("o_totalprice")} AS cents
      FROM orders GROUP BY CAST(o_orderdate AS DATE)),
    pairs AS (
      SELECT a.di AS x1,
        CASE WHEN (b.di > a.di) = (b.cents >= a.cents)
        THEN CAST(CAST(abs(b.cents - a.cents) AS HUGEINT) * 1000000
          // abs(b.di - a.di) AS BIGINT)
        ELSE -CAST(CAST(abs(b.cents - a.cents) AS HUGEINT) * 1000000
          // abs(b.di - a.di) AS BIGINT) END AS v
      FROM daily a JOIN daily b ON b.di <> a.di),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
    rk AS (
      SELECT x1, v, ROW_NUMBER() OVER (PARTITION BY x1 ORDER BY v) AS rn
      FROM pairs),
    dm AS (
      SELECT x1,
        CASE WHEN COUNT(*) = 2 THEN CAST(SUM(v) AS BIGINT)
             ELSE CAST(SUM(v) * 2 AS BIGINT) END AS dm2
      FROM rk CROSS JOIN nd
      WHERE rn = n_days // 2 OR rn = (n_days + 1) // 2
      GROUP BY x1),
    rk2 AS (SELECT dm2, ROW_NUMBER() OVER (ORDER BY dm2) AS rn FROM dm),
    sm AS (
      SELECT
        CAST(FLOOR(CASE WHEN COUNT(*) = 2 THEN CAST(SUM(dm2) AS BIGINT)
            ELSE CAST(SUM(dm2) * 2 AS BIGINT) END / 4.0 + 0.5) AS BIGINT)
          AS theil_ppm,
        CAST(n_days * (n_days - 1) // 2 AS BIGINT) AS n_pairs
      FROM rk2 CROSS JOIN nd
      WHERE rn = (n_days + 1) // 2 OR rn = (n_days + 2) // 2
      GROUP BY n_days),
    ic AS (
      SELECT CAST(FLOOR(quantile_cont(CAST(CAST(cents AS HUGEINT) * 1000000
          - CAST(theil_ppm AS HUGEINT) * di AS BIGINT), 0.5) + 0.5)
          AS BIGINT) AS intercept_ppm
      FROM daily CROSS JOIN sm GROUP BY theil_ppm),
    ols AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        COUNT(*) * SUM(CAST(di AS HUGEINT) * cents)
          - CAST(SUM(di) AS HUGEINT) * SUM(cents) AS num,
        COUNT(*) * SUM(CAST(di AS HUGEINT) * di)
          - CAST(SUM(di) AS HUGEINT) * SUM(di) AS den
      FROM (SELECT 'all' AS g, di, cents FROM daily) GROUP BY g),
    om AS (
      SELECT n_days,
        CASE WHEN den = 0 THEN NULL
             WHEN num >= 0 THEN CAST(num * 1000000 // den AS BIGINT)
             ELSE CAST(-((-num) * 1000000 // den) AS BIGINT) END AS ols_ppm
      FROM ols)
    SELECT n_days, n_pairs, theil_ppm, intercept_ppm, ols_ppm,
      CASE WHEN ols_ppm IS NULL THEN 'degenerate'
           WHEN abs(theil_ppm - ols_ppm) * 10 <= abs(ols_ppm)
             THEN 'agrees'
           ELSE 'outlier_influenced' END AS trend_band
    FROM sm CROSS JOIN ic CROSS JOIN om"""

  // ---- q232: Poisson-bootstrap confidence interval ----------------------
  // The large-scale bootstrap (Poisson resampling — the variant that
  // actually runs on clusters, since true multinomial resampling needs
  // global coordination): each row enters resample b with weight
  // w ~ Poisson(1), drawn DETERMINISTICALLY by inverting the Poisson CDF
  // on a 60-bit md5 uniform of (b, orderkey) — the h60 convention both
  // engines already share — against fixed ppm thresholds precomputed
  // here once (no engine exp() at query time). B=32 resample means of
  // the order-value distribution, then the 2.5/97.5 percentile CI via
  // fixed-rank interpolation (B is a constant, so the quantile ranks and
  // fractions are literals). All sums exact Decimal(38,0) ↔ HUGEINT;
  // every output double is the same IEEE expression over identical
  // exact integers.
  //
  // Scale shape: ONE corpus scan exploded ×B map-side (no shuffle
  // growth: the aggregate combines onto B rows); the CI math runs on a
  // 32-row frame.
  private[graft] val BootB = 32
  /** Cumulative Poisson(1) CDF in ppm: P(W ≤ k)·1e6 floored, k = 0..7;
    * draws above the last threshold clamp to w = 8. */
  private[graft] val PoisCdfPpm: Seq[Long] = {
    val pdf = Iterator.iterate(math.exp(-1.0), 8)(identity).toSeq
      .zipWithIndex.map { case (e, k) =>
        e / (1 to k).map(_.toDouble).product }
    pdf.scanLeft(0.0)(_ + _).tail.map(c => math.floor(c * 1e6).toLong)
  }
  private def poisCaseSql(u: String): String =
    PoisCdfPpm.zipWithIndex
      .map { case (t, k) => s"WHEN $u < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 8 END")

  def q232BootstrapCi(s: SparkSession, d: String): DataFrame = {
    graft.expressions.Hash60.register(s)
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey"), toUnits(col("o_totalprice")).as("cents"))
      .select(col("o_orderkey"), col("cents"),
        explode(sequence(lit(0), lit(BootB - 1))).as("b"))
      .withColumn("u", expr("h60(concat('bs:', cast(b as string), ':'," +
        " cast(o_orderkey as string))) % 1000000"))
      .withColumn("w", expr(poisCaseSql("u")))
    val means = rows.groupBy(col("b"))
      .agg(sum(expr("cast(w as decimal(38,0)) * cents")).as("swc"),
        sum(col("w")).as("sw"))
      .filter(col("sw") > 0)
      .select(col("b"), expr("cast(swc * 1000 div sw as bigint)").as("m"))
    // fixed-rank CI picks: t_lo = 0.025·(B−1) = 0.775 → ranks 1,2;
    // t_hi = 0.975·(B−1) = 30.225 → ranks 31,32 (B = 32 constant).
    // The interpolation weights are exact rationals (0.775 = 31/40,
    // 0.225 = 9/40), so the bounds stay BIGINT milli via floor-div —
    // the round-12 sweep removed the m1 + 0.775·(m2−m1) double tree,
    // a mul-feeds-add shape in the FMA-contractible class the q262
    // gate measured diverging one ulp cross-engine. The ≤ 1-milli
    // flooring (a thousandth of a cent) is far inside bootstrap noise.
    val picks = means
      .withColumn("rn", row_number().over(Window.orderBy(col("m"))))
      .filter(col("rn").isin(1, 2, BootB - 1, BootB))
      .groupBy(lit(1).as("g"))
      .agg(sum(when(col("rn") === 1, col("m"))).as("m1"),
        sum(when(col("rn") === 2, col("m"))).as("m2"),
        sum(when(col("rn") === BootB - 1, col("m"))).as("m31"),
        sum(when(col("rn") === BootB, col("m"))).as("m32"),
        count(lit(1)).as("kk"))
      .filter(col("kk") === 4)
    val point = Tables.orders(s, d)
      .select(toUnits(col("o_totalprice")).as("cents"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(cents as decimal(38,0))")).as("sc"))
      .select(col("n_orders"),
        expr("cast(sc * 1000 div nullif(n_orders, 0) as bigint)")
          .as("mean_milli"))
    picks.crossJoin(broadcast(point))
      .select(col("n_orders"), col("mean_milli"),
        expr("m1 + 31 * (m2 - m1) div 40").as("ci_lo_milli"),
        expr("m31 + 9 * (m32 - m31) div 40").as("ci_hi_milli"))
  }

  val q232Sql: String = {
    val b = BootB
    s"""
    WITH rows_ AS (
      SELECT o_orderkey, ${sqlUnits("o_totalprice")} AS cents,
        unnest(generate_series(0, ${b - 1})) AS b
      FROM orders),
    ws AS (
      SELECT b, cents,
        ${poisCaseSql(s"(CAST('0x' || substring(md5('bs:' ||" +
        s" CAST(b AS VARCHAR) || ':' || CAST(o_orderkey AS VARCHAR))," +
        s" 1, 15) AS BIGINT) % 1000000)")} AS w
      FROM rows_),
    means AS (
      SELECT b, CAST(SUM(CAST(w AS HUGEINT) * cents) * 1000 // SUM(w)
        AS BIGINT) AS m
      FROM ws GROUP BY b HAVING SUM(w) > 0),
    rk AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rn FROM means),
    picks AS (
      SELECT CAST(SUM(CASE WHEN rn = 1 THEN m END) AS BIGINT) AS m1,
        CAST(SUM(CASE WHEN rn = 2 THEN m END) AS BIGINT) AS m2,
        CAST(SUM(CASE WHEN rn = ${b - 1} THEN m END) AS BIGINT) AS m31,
        CAST(SUM(CASE WHEN rn = $b THEN m END) AS BIGINT) AS m32,
        COUNT(*) AS kk
      FROM (SELECT 1 AS g, m, rn FROM rk
            WHERE rn IN (1, 2, ${b - 1}, $b)) GROUP BY g),
    point AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
        CAST(SUM(CAST(${sqlUnits("o_totalprice")} AS HUGEINT)) * 1000
          // nullif(COUNT(*), 0) AS BIGINT) AS mean_milli
      FROM orders)
    SELECT n_orders, mean_milli,
      CAST(m1 + 31 * (m2 - m1) // 40 AS BIGINT) AS ci_lo_milli,
      CAST(m31 + 9 * (m32 - m31) // 40 AS BIGINT) AS ci_hi_milli
    FROM picks CROSS JOIN point WHERE kk = 4"""
  }

  // ---- q249: CUSUM changepoint on the daily event series ---------------
  // WHERE did the level shift? q219's EWMA chart flags drift as it
  // happens and q218's ACF reads periodicity; the retrospective question
  // — "pick the single day the mean changed" — is the CUSUM statistic:
  // S_k = Σ_{i≤k} (x_i − mean), maximized in |S| at the maximum-
  // likelihood single changepoint of a mean-shift model. Computed
  // division-free: S_k = Σ_{i≤k} (D·c_i − T) with D = |days|, T = total
  // events (D·mean scaling keeps every term an exact integer — the
  // q243 identity trick applied to a running sum). Reported per day
  // with the normalized magnitude 1e6·|S_k|/(D·T) and the argmax day
  // flagged (ties break to the earliest day).
  //
  // Exactness: all terms are integers on Decimal(38,0) ↔ HUGEINT; the
  // one div has nonnegative operands (|S|, D·T > 0 on any non-empty
  // series). Scale shape: the corpus collapses to the |days|-row daily
  // frame in one map-side-combining aggregate; the running sum and the
  // argmax pick are single-partition windows over that CALENDAR-bounded
  // frame (the q228 defense: grows with the time range, not data).
  def q249CusumChangepoint(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(datediff(to_date(col("ts")), lit("1970-01-01"))
        .cast("long").as("di"))
      .groupBy(col("di")).agg(count(lit(1)).as("n_events"))
    val tot = daily.agg(sum(col("n_events")).as("t"),
      count(lit(1)).as("n_days"))
    val wCum = Window.orderBy(col("di"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPick = Window.orderBy(abs(col("cusum")).desc, col("di").asc)
    daily.crossJoin(broadcast(tot))
      .withColumn("dev", expr(
        "cast(n_days as decimal(38,0)) * n_events - t"))
      .withColumn("cusum", sum(col("dev")).over(wCum))
      .withColumn("rk", row_number().over(wPick))
      .withColumn("mag_ppm", expr(
        "cast(abs(cusum) * 1000000" +
          " div nullif(cast(t as decimal(38,0)) * n_days, 0) as bigint)"))
      .select(col("di"), col("n_events"),
        col("cusum").cast("long").as("cusum"), col("mag_ppm"),
        (col("rk") === 1).as("is_change"))
      .orderBy(col("di"))
  }

  val q249Sql: String = raw"""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
        CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS t,
      CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
    cs AS (
      SELECT di, n_events,
        SUM(CAST(n_days AS HUGEINT) * n_events - t)
          OVER (ORDER BY di ROWS UNBOUNDED PRECEDING) AS cusum,
        t, n_days
      FROM daily CROSS JOIN tot),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY abs(cusum) DESC, di) AS rk
      FROM cs)
    SELECT di, n_events, CAST(cusum AS BIGINT) AS cusum,
      CAST(abs(cusum) * 1000000
        // nullif(CAST(t AS HUGEINT) * n_days, 0) AS BIGINT) AS mag_ppm,
      rk = 1 AS is_change
    FROM rk ORDER BY di"""

  // ---- q255: cross-correlation lead/lag (views vs purchases) -----------
  // q218 asks "does the series repeat itself?"; the cross-series
  // question a growth team asks is "does BROWSING LEAD BUYING?" — the
  // cross-correlation function between the daily view-count and daily
  // purchase-count series at lags −7..+7. r(k) pairs (views on day d,
  // purchases on day d+k); the max-|r| lag is flagged, and its sign
  // read as the lead/lag verdict (k>0: views lead purchases by k days —
  // the forecasting handle; k<0: purchases lead views). Both series
  // come off ONE events scan (conditional aggregation — the fixture's
  // orders calendar is disjoint from events, so a cross-TABLE ccf
  // would be vacuous here; the machinery is series-agnostic).
  // Calendar-true like q218: pairs exist only where BOTH days have
  // data for their respective series.
  //
  // Exactness: co-moments on Decimal(38,0) ↔ HUGEINT; each r is one
  // fixed IEEE tree on identical integers — FMA-safe by shape
  // (round-12 audit: num_d / sqrt(ve_d · vo_d) has no double-space
  // add for contraction to fuse into; q231's argument) — so the
  // argmax pick ranks bit-identical doubles in both engines (NULLs
  // last, ties to the smallest lag). Lags whose day overlap is under 8 points degrade to
  // NULL — a 2-point overlap is ALWAYS |r| = 1, and letting arithmetic
  // artifacts win the argmax is exactly the trap this guard closes.
  // Scale shape: both corpora collapse map-side to
  // |days|-row frames; the 15-lag spine broadcasts onto the event
  // frame before ONE day-keyed equi-join; everything after is a 15-row
  // ledger.
  def q255CcfLeadLag(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(datediff(to_date(col("ts")), lit("1970-01-01"))
        .cast("long").as("di"), col("event_type"))
      .groupBy(col("di"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("e"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("o"))
      .persist() // both sides of the 15-lag join read this |days| frame
    val ev = daily.filter(col("e") > 0L).select(col("di"), col("e"))
    val ord = daily.filter(col("o") > 0L)
      .select(col("di").as("dj"), col("o"))
    val lags = s.range(-7, 8).select(col("id").as("lag"))
    val m = ev.crossJoin(broadcast(lags))
      .withColumn("dj", col("di") + col("lag"))
      .join(ord, Seq("dj"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("e")).as("se"), sum(col("o")).as("so"),
        sum(expr("cast(e as decimal(38,0)) * o")).as("seo"),
        sum(expr("cast(e as decimal(38,0)) * e")).as("see"),
        sum(expr("cast(o as decimal(38,0)) * o")).as("soo"))
      .withColumn("num",
        expr("n_days * seo - cast(se as decimal(38,0)) * so"))
      .withColumn("ve",
        expr("n_days * see - cast(se as decimal(38,0)) * se"))
      .withColumn("vo",
        expr("n_days * soo - cast(so as decimal(38,0)) * so"))
      // n_days >= 8: a 2-point overlap is ALWAYS |r| = 1 — short lag
      // windows would win the argmax on arithmetic, not signal
      .withColumn("r",
        when(col("n_days") < 8 || col("ve") <= 0 || col("vo") <= 0,
          lit(null).cast("double"))
          .otherwise(col("num").cast("double") /
            sqrt(col("ve").cast("double") * col("vo").cast("double"))))
    m.withColumn("rk", row_number().over(
        Window.orderBy(abs(col("r")).desc_nulls_last, col("lag").asc)))
      .withColumn("is_best", col("rk") === 1)
      .withColumn("verdict",
        when(!col("is_best"), "candidate")
          .when(col("r").isNull, "degenerate")
          .when(col("lag") > 0, "views_lead")
          .when(col("lag") < 0, "purchases_lead")
          .otherwise("coincident"))
      .select(col("lag"), col("n_days"), col("r"), col("is_best"),
        col("verdict"))
      .orderBy(col("lag"))
  }

  val q255Sql: String = """
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
          AS BIGINT) AS e,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          AS BIGINT) AS o
      FROM events GROUP BY 1),
    ev AS (SELECT di, e FROM daily WHERE e > 0),
    ord AS (SELECT di AS dj, o FROM daily WHERE o > 0),
    lags AS (SELECT CAST(unnest(range(-7, 8)) AS BIGINT) AS lag),
    agg AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_days,
        CAST(SUM(e) AS BIGINT) AS se, CAST(SUM(o) AS BIGINT) AS so,
        SUM(CAST(e AS HUGEINT) * o) AS seo,
        SUM(CAST(e AS HUGEINT) * e) AS see,
        SUM(CAST(o AS HUGEINT) * o) AS soo
      FROM ev CROSS JOIN lags JOIN ord ON ord.dj = ev.di + lag
      GROUP BY 1),
    m AS (
      SELECT lag, n_days,
        n_days * seo - CAST(se AS HUGEINT) * so AS num,
        n_days * see - CAST(se AS HUGEINT) * se AS ve,
        n_days * soo - CAST(so AS HUGEINT) * so AS vo
      FROM agg),
    r AS (
      SELECT lag, n_days,
        CASE WHEN n_days < 8 OR ve <= 0 OR vo <= 0 THEN NULL
             ELSE CAST(num AS DOUBLE)
               / sqrt(CAST(ve AS DOUBLE) * CAST(vo AS DOUBLE)) END AS r
      FROM m),
    rk AS (
      SELECT *, ROW_NUMBER()
        OVER (ORDER BY abs(r) DESC NULLS LAST, lag) AS rk
      FROM r)
    SELECT lag, n_days, r, rk = 1 AS is_best,
      CASE WHEN rk <> 1 THEN 'candidate'
           WHEN r IS NULL THEN 'degenerate'
           WHEN lag > 0 THEN 'views_lead'
           WHEN lag < 0 THEN 'purchases_lead'
           ELSE 'coincident' END AS verdict
    FROM rk ORDER BY lag"""

  // ---- q261: distribution-free median CI via order statistics ----------
  // The CI q232's bootstrap approximates, computed EXACTLY: for the
  // per-priority median order value, the binomial order-statistic
  // interval — ranks l = ⌊(n − 1.96√n)/2⌋ and u = ⌈1 + (n + 1.96√n)/2⌉
  // (clamped to [1, n]) bracket the true median at ~95% with NO
  // distributional assumption and NO resampling. The ranks are EXACT
  // integers (round-12 sweep: the original 1.96·√n IEEE tree fed a
  // floor/ceil, where a one-ulp cross-engine divergence flips a whole
  // rank — the q237-class hazard): 1.96√n = √(2401n)/25 with 2401n
  // inside BIGINT (2⁶³ ≈ 9.2e18) for n ≤ 3.8e15, and t = isqrt(2401n)
  // is exact because the ±1 correction repairs the double seed for any
  // radicand ≪ ~3.6e31 — 2401n ≤ 9.1e18 is ten decades inside that, so
  // the seed is already within one of the true floor. (2⁵³ is NOT the
  // operative bound here: 2401n exceeds it from n ≈ 3.75e12, yet the
  // correction keeps the result exact all the way to the BIGINT edge.)
  // l = ⌊(25n − t)/50⌋ (minus 1 on the exact-boundary
  // case 50 | 25n−t when 2401n is not a perfect square — √ irrational
  // means the true value sits strictly below the boundary) and
  // u = 1 + ⌈(25n + t)/50⌉ follow by the one-integer-in-a-unit-interval
  // argument; the VALUES at those ranks — and the
  // lower median itself — resolve through the value-histogram contract
  // (cumulative counts over the bounded cents domain), so executor
  // state stays O(|value domain|), never O(group rows).
  //
  // Scale shape: one orders scan → (priority, cents) histogram →
  // domain-bounded cumulative window → the 3-rank pick is a filter +
  // min per (group, rank kind). Output is |priorities| rows.
  def q261MedianCi(s: SparkSession, d: String): DataFrame = {
    val hist = Tables.orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        toUnits(col("o_totalprice")).as("cents"))
      .groupBy(col("grp"), col("cents")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("grp")).orderBy(col("cents"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("grp"))))
      .persist() // three rank picks read it
    val ranks = hist.select(col("grp"), col("n")).distinct()
      .withColumn("med_rank", expr("(n + 1) div 2"))
      .withColumn("t0", expr(
        "cast(floor(sqrt(cast(2401 * n as double))) as bigint)"))
      .withColumn("tq", expr(
        "case when (t0 + 1) * (t0 + 1) <= 2401 * n then t0 + 1" +
          " when t0 * t0 > 2401 * n then t0 - 1 else t0 end"))
      .withColumn("lo_m", expr("greatest(cast(0 as bigint), 25 * n - tq)"))
      .withColumn("lo_rank", expr(
        "greatest(cast(1 as bigint), lo_m div 50" +
          " - (case when lo_m % 50 = 0 and tq * tq <> 2401 * n" +
          " then 1 else 0 end))"))
      .withColumn("hi_rank", expr(
        "least(n, 1 + case when tq * tq = 2401 * n" +
          " then (25 * n + tq + 49) div 50" +
          " else (25 * n + tq) div 50 + 1 end)"))
      .drop("t0", "tq", "lo_m")
    def pick(rankCol: String, out: String) =
      hist.join(broadcast(ranks.select(col("grp"),
          col(rankCol).as("rk"))), Seq("grp"))
        .filter(col("cum") >= col("rk"))
        .groupBy(col("grp")).agg(min(col("cents")).as(out))
    ranks
      .join(pick("med_rank", "median_cents"), Seq("grp"))
      .join(pick("lo_rank", "ci_lo_cents"), Seq("grp"))
      .join(pick("hi_rank", "ci_hi_cents"), Seq("grp"))
      .withColumn("width_ppm", expr(
        "cast(cast(ci_hi_cents - ci_lo_cents as decimal(38,0)) * 1000000" +
          " div nullif(median_cents, 0) as bigint)"))
      .select(col("grp"), col("n"), col("median_cents"),
        col("ci_lo_cents"), col("ci_hi_cents"), col("width_ppm"))
      .orderBy(col("grp"))
  }

  val q261Sql: String = s"""
    WITH hist AS (
      SELECT o_orderpriority AS grp, ${Fx.sqlUnits("o_totalprice")}
        AS cents, CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1, 2),
    cum AS (
      SELECT *, CAST(SUM(c) OVER (PARTITION BY grp ORDER BY cents
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        CAST(SUM(c) OVER (PARTITION BY grp) AS BIGINT) AS n
      FROM hist),
    tq0 AS (
      SELECT grp, n,
        CAST(floor(sqrt(CAST(2401 * n AS DOUBLE))) AS BIGINT) AS t0
      FROM (SELECT DISTINCT grp, n FROM cum)),
    tq AS (
      SELECT grp, n,
        CASE WHEN (t0 + 1) * (t0 + 1) <= 2401 * n THEN t0 + 1
             WHEN t0 * t0 > 2401 * n THEN t0 - 1 ELSE t0 END AS t
      FROM tq0),
    ranks AS (
      SELECT grp, n, (n + 1) // 2 AS med_rank,
        greatest(1, greatest(0, 25 * n - t) // 50
          - (CASE WHEN greatest(0, 25 * n - t) % 50 = 0
                   AND t * t <> 2401 * n THEN 1 ELSE 0 END)) AS lo_rank,
        least(n, 1 + CASE WHEN t * t = 2401 * n
          THEN (25 * n + t + 49) // 50
          ELSE (25 * n + t) // 50 + 1 END) AS hi_rank
      FROM tq),
    med AS (
      SELECT cum.grp, MIN(cents) AS median_cents
      FROM cum JOIN ranks ON ranks.grp = cum.grp
      WHERE cum >= med_rank GROUP BY 1),
    lo AS (
      SELECT cum.grp, MIN(cents) AS ci_lo_cents
      FROM cum JOIN ranks ON ranks.grp = cum.grp
      WHERE cum >= lo_rank GROUP BY 1),
    hi AS (
      SELECT cum.grp, MIN(cents) AS ci_hi_cents
      FROM cum JOIN ranks ON ranks.grp = cum.grp
      WHERE cum >= hi_rank GROUP BY 1)
    SELECT ranks.grp, n, median_cents, ci_lo_cents, ci_hi_cents,
      CAST(CAST(ci_hi_cents - ci_lo_cents AS HUGEINT) * 1000000
        // nullif(median_cents, 0) AS BIGINT) AS width_ppm
    FROM ranks JOIN med ON med.grp = ranks.grp
    JOIN lo ON lo.grp = ranks.grp JOIN hi ON hi.grp = ranks.grp
    ORDER BY ranks.grp"""

  // ---- q273: Kendall tau-b rank correlation (views vs purchases) -------
  // The nonparametric complement to q255's Pearson-family CCF: does the
  // day-RANKING of browsing co-move with the day-ranking of buying,
  // robust to outlier days and any monotone rescaling? Kendall's τ-b
  // counts concordant vs discordant day pairs with the standard tie
  // corrections — the estimator of choice when the series are heavy-
  // tailed (traffic is) and Pearson r is hostage to the biggest day.
  //
  // Exactness: C, D and the three tie classes are exact integer pair
  // counts; τ-b = (C−D)/√((C+D+Ty)·(C+D+Tx)) resolves through the
  // q250-style ±1-corrected integer sqrt with the sign split out —
  // zero doubles in the hash path. Scale shape: the corpus collapses
  // map-side to the |days|-row daily frame; the pair generator is the
  // calendar-bounded |days|² self-join (q228's adjudicated class —
  // grows with the time range, not the data), then ONE 1-row rollup.
  def q273KendallTau(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(datediff(to_date(col("ts")), lit("1970-01-01"))
        .cast("long").as("di"), col("event_type"))
      .groupBy(col("di"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("e"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("o"))
      .persist() // both sides of the bounded pair self-join read it
    val b = daily.select(col("di").as("dj"), col("e").as("e2"),
      col("o").as("o2"))
    daily.join(broadcast(b), col("di") < col("dj"))
      .select(
        when(col("e") === col("e2") && col("o") === col("o2"), 1L)
          .otherwise(0L).as("t_xy"),
        when(col("e") === col("e2") && col("o") =!= col("o2"), 1L)
          .otherwise(0L).as("t_x"),
        when(col("o") === col("o2") && col("e") =!= col("e2"), 1L)
          .otherwise(0L).as("t_y"),
        when((col("e") < col("e2") && col("o") < col("o2")) ||
          (col("e") > col("e2") && col("o") > col("o2")), 1L)
          .otherwise(0L).as("cc"),
        when((col("e") < col("e2") && col("o") > col("o2")) ||
          (col("e") > col("e2") && col("o") < col("o2")), 1L)
          .otherwise(0L).as("dd"))
      .agg(sum(col("cc")).as("concordant"),
        sum(col("dd")).as("discordant"),
        sum(col("t_x")).as("ties_x"), sum(col("t_y")).as("ties_y"),
        sum(col("t_xy")).as("ties_xy"))
      .crossJoin(broadcast(daily.agg(count(lit(1)).as("n_days"))))
      .withColumn("den2", expr(
        "cast(concordant + discordant + ties_y as decimal(38,0))" +
          " * (concordant + discordant + ties_x)"))
      .withColumn("s0", expr(
        "cast(floor(sqrt(cast(den2 as double))) as decimal(38,0))"))
      .withColumn("sq", expr(
        "case when (s0 + 1) * (s0 + 1) <= den2 then s0 + 1" +
          " when s0 * s0 > den2 then s0 - 1 else s0 end"))
      .withColumn("tau_b_ppm", expr(
        "case when sq is null or sq = 0 then null" +
          " when concordant >= discordant then" +
          " cast(cast(concordant - discordant as decimal(38,0))" +
          " * 1000000 div sq as bigint)" +
          " else -cast(cast(discordant - concordant as decimal(38,0))" +
          " * 1000000 div sq as bigint) end"))
      .withColumn("band",
        when(col("tau_b_ppm").isNull, "degenerate")
          .when(col("tau_b_ppm") >= 300000L, "strong_comove")
          .when(col("tau_b_ppm") <= -300000L, "strong_inverse")
          .otherwise("weak"))
      .select(col("n_days"), col("concordant"), col("discordant"),
        col("ties_x"), col("ties_y"), col("ties_xy"),
        col("tau_b_ppm"), col("band"))
  }

  val q273Sql: String = """
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
          AS BIGINT) AS e,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          AS BIGINT) AS o
      FROM events GROUP BY 1),
    pairs AS (
      SELECT
        CASE WHEN a.e = b.e AND a.o = b.o THEN 1 ELSE 0 END AS t_xy,
        CASE WHEN a.e = b.e AND a.o <> b.o THEN 1 ELSE 0 END AS t_x,
        CASE WHEN a.o = b.o AND a.e <> b.e THEN 1 ELSE 0 END AS t_y,
        CASE WHEN (a.e < b.e AND a.o < b.o)
               OR (a.e > b.e AND a.o > b.o) THEN 1 ELSE 0 END AS cc,
        CASE WHEN (a.e < b.e AND a.o > b.o)
               OR (a.e > b.e AND a.o < b.o) THEN 1 ELSE 0 END AS dd
      FROM daily a JOIN daily b ON a.di < b.di),
    agg AS (
      SELECT CAST(SUM(cc) AS BIGINT) AS concordant,
        CAST(SUM(dd) AS BIGINT) AS discordant,
        CAST(SUM(t_x) AS BIGINT) AS ties_x,
        CAST(SUM(t_y) AS BIGINT) AS ties_y,
        CAST(SUM(t_xy) AS BIGINT) AS ties_xy
      FROM pairs),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
    den AS (
      SELECT *, CAST(concordant + discordant + ties_y AS HUGEINT)
        * (concordant + discordant + ties_x) AS den2
      FROM agg CROSS JOIN nd),
    s0 AS (
      SELECT *, CAST(FLOOR(SQRT(CAST(den2 AS DOUBLE))) AS HUGEINT) AS s0
      FROM den),
    sq AS (
      SELECT *, CASE WHEN (s0 + 1) * (s0 + 1) <= den2 THEN s0 + 1
                     WHEN s0 * s0 > den2 THEN s0 - 1 ELSE s0 END AS sq
      FROM s0),
    t AS (
      SELECT *,
        CASE WHEN sq IS NULL OR sq = 0 THEN NULL
             WHEN concordant >= discordant THEN
               CAST(CAST(concordant - discordant AS HUGEINT)
                 * 1000000 // sq AS BIGINT)
             ELSE -CAST(CAST(discordant - concordant AS HUGEINT)
                 * 1000000 // sq AS BIGINT) END AS tau_b_ppm
      FROM sq)
    SELECT n_days, concordant, discordant, ties_x, ties_y, ties_xy,
      tau_b_ppm,
      CASE WHEN tau_b_ppm IS NULL THEN 'degenerate'
           WHEN tau_b_ppm >= 300000 THEN 'strong_comove'
           WHEN tau_b_ppm <= -300000 THEN 'strong_inverse'
           ELSE 'weak' END AS band
    FROM t"""

  // ---- q276: Simpson's-paradox reversal audit --------------------------
  // The aggregation-reversal trap every pooled dashboard metric carries:
  // a treatment (here: deep-discount lines, quantized discount ≥ 5%) can
  // show a HIGHER pooled return rate than shallow-discount lines while
  // showing a lower rate inside every ship-year stratum — because the
  // treatment mix shifted across strata (Simpson, 1951). The audit emits
  // one row per stratum with both groups' exact counts and rate ppms,
  // the stratum's direction, and a broadcast 1-row ledger: the pooled
  // direction, how many contrast strata (both groups non-empty) agree /
  // oppose it, and the reversal flag — pooled direction non-zero, at
  // least one stratum opposing, and NO stratum agreeing.
  //
  // Determinism: no division decides anything — every direction is an
  // exact cross-multiplication sign (r_hi·n_lo vs r_lo·n_hi) on
  // Decimal(38,0) ↔ HUGEINT (counts reach 1e12 at the 100 TB bound, so
  // the product needs 24+ digits — BIGINT would overflow); rate ppms
  // are display-only exact floor-divs. Discount quantizes element-wise
  // to whole percents (floor(d·100 + 0.5), the Fx idiom) so group
  // membership is an integer comparison in both engines.
  //
  // Scale shape: one lineitem scan collapses map-side onto the
  // |ship-years|-row stratum frame; the pooled row and the ledger are
  // aggregates OF that bounded frame, attached by broadcast — nothing
  // after the first groupBy shuffles more than |years| rows.
  private def dirSql(rh: String, nh: String, rl: String, nl: String): String =
    s"""case when cast($rh as decimal(38,0)) * $nl
              > cast($rl as decimal(38,0)) * $nh then 1
         when cast($rh as decimal(38,0)) * $nl
              < cast($rl as decimal(38,0)) * $nh then -1
         else 0 end"""

  def q276SimpsonReversal(s: SparkSession, d: String): DataFrame = {
    val st = Tables.lineitem(s, d)
      .select(year(col("l_shipdate")).cast("long").as("ship_year"),
        (floor(col("l_discount") * 100 + lit(0.5)) >= 5.0).as("hi"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("r"))
      .groupBy(col("ship_year"))
      .agg(sum(when(col("hi"), 1L).otherwise(0L)).as("n_hi"),
        sum(when(col("hi"), col("r")).otherwise(0L)).as("r_hi"),
        sum(when(!col("hi"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(!col("hi"), col("r")).otherwise(0L)).as("r_lo"))
      .withColumn("dir",
        expr(dirSql("r_hi", "n_hi", "r_lo", "n_lo")).cast("long"))
      .withColumn("contrast",
        (col("n_hi") > 0L && col("n_lo") > 0L).cast("long"))
      .persist() // stratum rows, the pooled 1-row, and the ledger all read it
    val pooled = st.agg(sum(col("n_hi")).as("pn_hi"),
        sum(col("r_hi")).as("pr_hi"),
        sum(col("n_lo")).as("pn_lo"), sum(col("r_lo")).as("pr_lo"))
      .withColumn("pooled_dir",
        expr(dirSql("pr_hi", "pn_hi", "pr_lo", "pn_lo")).cast("long"))
    val ledger = st.crossJoin(broadcast(pooled))
      .agg(sum(col("contrast")).as("n_contrast"),
        sum(when(col("contrast") === 1L && col("dir") =!= 0L
          && col("dir") === col("pooled_dir"), 1L).otherwise(0L))
          .as("n_agree"),
        sum(when(col("contrast") === 1L && col("dir") =!= 0L
          && col("dir") === -col("pooled_dir"), 1L).otherwise(0L))
          .as("n_oppose"))
    st.crossJoin(broadcast(pooled)).crossJoin(broadcast(ledger))
      .withColumn("simpson_reversal",
        (col("pooled_dir") =!= 0L && col("n_oppose") > 0L
          && col("n_agree") === 0L).cast("long"))
      .select(col("ship_year"), col("n_hi"), col("r_hi"), col("n_lo"),
        col("r_lo"),
        expr("cast(r_hi * 1000000 div nullif(n_hi, 0) as bigint)")
          .as("rate_hi_ppm"),
        expr("cast(r_lo * 1000000 div nullif(n_lo, 0) as bigint)")
          .as("rate_lo_ppm"),
        col("dir"), col("pooled_dir"), col("n_contrast"), col("n_agree"),
        col("n_oppose"), col("simpson_reversal"))
      .orderBy(col("ship_year"))
  }

  val q276Sql: String = s"""
    WITH st AS (
      SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
        CAST(SUM(CASE WHEN FLOOR(l_discount * 100 + 0.5) >= 5.0
          THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
        CAST(SUM(CASE WHEN FLOOR(l_discount * 100 + 0.5) >= 5.0
          AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r_hi,
        CAST(SUM(CASE WHEN FLOOR(l_discount * 100 + 0.5) < 5.0
          THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
        CAST(SUM(CASE WHEN FLOOR(l_discount * 100 + 0.5) < 5.0
          AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r_lo
      FROM lineitem GROUP BY 1),
    sd AS (
      SELECT *, CAST(${dirSql("r_hi", "n_hi", "r_lo", "n_lo")} AS BIGINT)
          AS dir,
        CASE WHEN n_hi > 0 AND n_lo > 0 THEN 1 ELSE 0 END AS contrast
      FROM st),
    pooled AS (
      SELECT CAST(${dirSql("SUM(r_hi)", "SUM(n_hi)", "SUM(r_lo)",
        "SUM(n_lo)")} AS BIGINT) AS pooled_dir
      FROM sd),
    ledger AS (
      SELECT CAST(SUM(contrast) AS BIGINT) AS n_contrast,
        CAST(SUM(CASE WHEN contrast = 1 AND dir <> 0
          AND dir = pooled_dir THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
        CAST(SUM(CASE WHEN contrast = 1 AND dir <> 0
          AND dir = -pooled_dir THEN 1 ELSE 0 END) AS BIGINT) AS n_oppose
      FROM sd, pooled)
    SELECT ship_year, n_hi, r_hi, n_lo, r_lo,
      CAST(r_hi * 1000000 // NULLIF(n_hi, 0) AS BIGINT) AS rate_hi_ppm,
      CAST(r_lo * 1000000 // NULLIF(n_lo, 0) AS BIGINT) AS rate_lo_ppm,
      dir, pooled_dir, n_contrast, n_agree, n_oppose,
      CAST(CASE WHEN pooled_dir <> 0 AND n_oppose > 0 AND n_agree = 0
        THEN 1 ELSE 0 END AS BIGINT) AS simpson_reversal
    FROM sd, pooled, ledger ORDER BY ship_year"""

  // ---- q283: Spearman rank correlation (price vs demand) ---------------
  // The monotone-association complement to q273's Kendall τ: does
  // catalog PRICE rank-order against SOLD VOLUME rank-order (and which
  // way)? Spearman's ρ is Pearson on ranks — robust to the heavy tails
  // that make raw-price/raw-volume Pearson meaningless, and the
  // standard first screen before fitting any price-elasticity model
  // (q231 fits the parametric response; this certifies the monotone
  // premise non-parametrically).
  //
  // Rank discipline at scale: a global rank window over |parts| rows is
  // the q195-adjudicated anti-pattern (one task sorts the catalog), so
  // ranks come from the bounded VALUE-histogram instead: x = retail
  // price in whole dollars, y = lifetime sold units in ten-unit bins —
  // both domains ≤ ~1e5 distinct values (the q56 bounded-state
  // contract). A part's average tie-rank depends only on its value's
  // histogram position: 2·R(v) = 2·cum(<v) + cnt(v) + 1, kept DOUBLED
  // so tie-averages stay integer. ρ is then Pearson on the doubled
  // ranks via exact moments.
  //
  // Exactness: with u,v ≤ 2n, the variance factors nΣu²−(Σu)² stay
  // ≤ 4n³ ≤ 4e36 at a billion parts — inside Decimal(38,0)/HUGEINT but
  // past the raw double seed's 3.6e31 validity, so the isqrt uses the
  // q272 posture (seed + two integer Newton steps + ±1 correction).
  // The final quotient uses the zSq exact two-stage staging and the
  // q273 sign split — both engines divide only non-negative integers.
  // Because both floor-roots UNDERestimate, the quotient can only
  // overshoot |true ρ|; since |ρ| ≤ 1 by definition the result is
  // clamped at ±1e6 ppm (visible only at toy n where 1/√va is not
  // negligible), mirrored as LEAST in the oracle.
  //
  // Scale shape: one lineitem scan collapses onto |parts|; two bounded
  // histograms (broadcast back); one moment rollup; 1 output row.
  def q283Spearman(s: SparkSession, d: String): DataFrame = {
    val perPart = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(sum(toUnits(col("l_quantity"), 0)).as("units"))
      .join(Tables.part(s, d).select(col("p_partkey").as("l_partkey"),
        toUnits(col("p_retailprice"), 2).cast("long").as("cents")),
        Seq("l_partkey"))
      .select(col("l_partkey"), expr("cents div 100").as("xd"),
        expr("units div 10").as("yb"))
      .persist() // both histograms + the moment pass read it
    def doubledRanks(c: String): DataFrame = {
      val wc = Window.orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perPart.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(wc))
        .select(col(c), (lit(2L) * (col("cum") - col("cnt"))
          + col("cnt") + 1L).as(s"r_$c"))
    }
    val ranked = perPart
      .join(broadcast(doubledRanks("xd")), Seq("xd"))
      .join(broadcast(doubledRanks("yb")), Seq("yb"))
      .select(col("r_xd").as("u"), col("r_yb").as("v"))
    val moments = ranked.agg(count(lit(1)).as("n"),
      sum(expr("cast(u as decimal(38,0))")).as("su"),
      sum(expr("cast(v as decimal(38,0))")).as("sv"),
      sum(expr("cast(u as decimal(38,0)) * v")).as("suv"),
      sum(expr("cast(u as decimal(38,0)) * u")).as("suu"),
      sum(expr("cast(v as decimal(38,0)) * v")).as("svv"))
    val staged = moments
      .withColumn("num", expr("cast(n as decimal(38,0)) * suv - su * sv"))
      .withColumn("va", expr("cast(n as decimal(38,0)) * suu - su * su"))
      .withColumn("vb", expr("cast(n as decimal(38,0)) * svv - sv * sv"))
    val withRoots = Seq("va" -> "sa", "vb" -> "sb")
      .foldLeft(staged) { case (df, (w2, p)) =>
        df.withColumn(s"${p}_s0", expr(
            s"cast(floor(sqrt(cast($w2 as double))) as decimal(38,0))"))
          .withColumn(s"${p}_s1", expr(
            s"case when ${p}_s0 <= 0 then ${p}_s0 else" +
              s" cast(($w2 div ${p}_s0 + ${p}_s0) div 2 as decimal(38,0))" +
              " end"))
          .withColumn(s"${p}_s2", expr(
            s"case when ${p}_s1 <= 0 then ${p}_s1 else" +
              s" cast(($w2 div ${p}_s1 + ${p}_s1) div 2 as decimal(38,0))" +
              " end"))
          .withColumn(p, expr(
            s"case when (${p}_s2 + 1) * (${p}_s2 + 1) <= $w2" +
              s" then ${p}_s2 + 1 when ${p}_s2 * ${p}_s2 > $w2" +
              s" then ${p}_s2 - 1 else ${p}_s2 end"))
      }
    withRoots
      .withColumn("rho_ppm", expr(
        """case when sa is null or sb is null or sa = 0 or sb = 0 then null
             when num >= 0 then
               least(1000000L, cast((cast(num div sa as decimal(38,0))
                 * 1000000 + (num % sa) * 1000000 div sa) div sb
                 as bigint))
             else
               -least(1000000L, cast((cast((-num) div sa as decimal(38,0))
                 * 1000000 + ((-num) % sa) * 1000000 div sa) div sb
                 as bigint))
           end"""))
      .withColumn("band",
        when(col("rho_ppm").isNull, "degenerate")
          .when(col("rho_ppm") >= 300000L, "monotone_up")
          .when(col("rho_ppm") <= -300000L, "monotone_down")
          .otherwise("weak"))
      .select(col("n").as("n_parts"),
        expr("cast(num as decimal(38,0))").as("cov_num"),
        col("rho_ppm"), col("band"))
  }

  val q283Sql: String = """
    WITH pp AS (
      SELECT l.l_partkey, CAST(FLOOR(p.p_retailprice * 100 + 0.5)
          AS BIGINT) // 100 AS xd,
        CAST(SUM(CAST(FLOOR(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT)
          // 10 AS yb
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2),
    hx AS (
      SELECT xd, CAST(COUNT(*) AS BIGINT) AS cnt,
        CAST(SUM(COUNT(*)) OVER (ORDER BY xd
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM pp GROUP BY 1),
    hy AS (
      SELECT yb, CAST(COUNT(*) AS BIGINT) AS cnt,
        CAST(SUM(COUNT(*)) OVER (ORDER BY yb
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM pp GROUP BY 1),
    ranked AS (
      SELECT 2 * (hx.cum - hx.cnt) + hx.cnt + 1 AS u,
        2 * (hy.cum - hy.cnt) + hy.cnt + 1 AS v
      FROM pp JOIN hx ON hx.xd = pp.xd JOIN hy ON hy.yb = pp.yb),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        SUM(CAST(u AS HUGEINT)) AS su, SUM(CAST(v AS HUGEINT)) AS sv,
        SUM(CAST(u AS HUGEINT) * v) AS suv,
        SUM(CAST(u AS HUGEINT) * u) AS suu,
        SUM(CAST(v AS HUGEINT) * v) AS svv
      FROM ranked),
    base AS (
      SELECT *, CAST(n AS HUGEINT) * suv - su * sv AS num,
        CAST(n AS HUGEINT) * suu - su * su AS va,
        CAST(n AS HUGEINT) * svv - sv * sv AS vb
      FROM mom),
    sa0 AS (SELECT *, CAST(FLOOR(SQRT(CAST(va AS DOUBLE))) AS HUGEINT)
        AS sa_s0 FROM base),
    sa1 AS (SELECT *, CASE WHEN sa_s0 <= 0 THEN sa_s0
        ELSE (va // sa_s0 + sa_s0) // 2 END AS sa_s1 FROM sa0),
    sa2 AS (SELECT *, CASE WHEN sa_s1 <= 0 THEN sa_s1
        ELSE (va // sa_s1 + sa_s1) // 2 END AS sa_s2 FROM sa1),
    wa AS (SELECT *, CASE WHEN (sa_s2 + 1) * (sa_s2 + 1) <= va
          THEN sa_s2 + 1
        WHEN sa_s2 * sa_s2 > va THEN sa_s2 - 1 ELSE sa_s2 END AS sa
      FROM sa2),
    sb0 AS (SELECT *, CAST(FLOOR(SQRT(CAST(vb AS DOUBLE))) AS HUGEINT)
        AS sb_s0 FROM wa),
    sb1 AS (SELECT *, CASE WHEN sb_s0 <= 0 THEN sb_s0
        ELSE (vb // sb_s0 + sb_s0) // 2 END AS sb_s1 FROM sb0),
    sb2 AS (SELECT *, CASE WHEN sb_s1 <= 0 THEN sb_s1
        ELSE (vb // sb_s1 + sb_s1) // 2 END AS sb_s2 FROM sb1),
    wb AS (SELECT *, CASE WHEN (sb_s2 + 1) * (sb_s2 + 1) <= vb
          THEN sb_s2 + 1
        WHEN sb_s2 * sb_s2 > vb THEN sb_s2 - 1 ELSE sb_s2 END AS sb
      FROM sb2),
    fin AS (
      SELECT n, num, CASE
          WHEN sa IS NULL OR sb IS NULL OR sa = 0 OR sb = 0 THEN NULL
          WHEN num >= 0 THEN
            LEAST(1000000, CAST(((num // sa) * 1000000
              + (num % sa) * 1000000 // sa) // sb AS BIGINT))
          ELSE
            -LEAST(1000000, CAST((((-num) // sa) * 1000000
              + ((-num) % sa) * 1000000 // sa) // sb AS BIGINT))
        END AS rho_ppm
      FROM wb)
    SELECT n AS n_parts, CAST(num AS DECIMAL(38,0)) AS cov_num, rho_ppm,
      CASE WHEN rho_ppm IS NULL THEN 'degenerate'
        WHEN rho_ppm >= 300000 THEN 'monotone_up'
        WHEN rho_ppm <= -300000 THEN 'monotone_down'
        ELSE 'weak' END AS band
    FROM fin"""

  // ---- q285: Mann-Kendall trend test (daily order volume) --------------
  // The non-parametric "is this series trending?" test (Mann 1945,
  // Kendall 1975) — the monitoring-side complement to q249's CUSUM
  // (which locates a LEVEL SHIFT; MK detects a monotone DRIFT with no
  // distributional assumption and no model fit). S = Σ_{i<j}
  // sgn(y_j − y_i) over day pairs; Var(S)·18 = n(n−1)(2n+5) −
  // Σ_g t_g(t_g−1)(2t_g+5) over tie groups; significance via the
  // z² convention shared with q233/q237 (z² in ppm against
  // 1.96² = 3 841 600): z² = 18·(|S|−1)²/V18 with the continuity
  // correction, direction reported separately as sgn(S) so no signed
  // division ever runs.
  //
  // Exactness: S, the tie term and V18 are exact integer counts;
  // the single quotient is 18·(|S|−1)²·1e6 div V18 on Decimal(38,0) ↔
  // HUGEINT (n ≤ ~2500 days → (|S|−1)² ≤ 1e13, ×18e6 ≈ 2e20 — well
  // inside). Scale shape: the corpus collapses map-side onto the
  // |days|-row daily frame; the pair generator is the calendar-bounded
  // |days|² broadcast self-join (q228/q273's adjudicated class) and
  // the tie groups come from the bounded value histogram; 1 output row.
  def q285MannKendall(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .select(datediff(col("o_orderdate").cast("date"), lit("1970-01-01"))
        .cast("long").as("di"))
      .groupBy(col("di")).agg(count(lit(1)).as("y"))
      .persist() // pair join reads both sides; ties + n read it again
    val b = daily.select(col("di").as("dj"), col("y").as("y2"))
    val sStat = daily.join(broadcast(b), col("di") < col("dj"))
      .agg(sum(when(col("y2") > col("y"), 1L)
        .when(col("y2") < col("y"), -1L).otherwise(0L)).as("s_stat"))
    val ties = daily.groupBy(col("y")).agg(count(lit(1)).as("tg"))
      .agg(coalesce(sum(expr(
        "case when tg > 1 then tg * (tg - 1) * (2 * tg + 5)" +
          " else 0 end")), lit(0L)).as("tie_term"),
        count(lit(1)).as("n_levels"))
    val n = daily.agg(count(lit(1)).as("n_days"))
    sStat.crossJoin(broadcast(ties)).crossJoin(broadcast(n))
      .withColumn("var18", expr(
        "n_days * (n_days - 1) * (2 * n_days + 5) - tie_term"))
      .withColumn("z_sq_ppm", expr(
        """case when var18 <= 0 or abs(s_stat) <= 1 then 0
           else cast(cast(18 as decimal(38,0)) * (abs(s_stat) - 1)
             * (abs(s_stat) - 1) * 1000000 div var18 as bigint) end"""))
      .withColumn("trend_dir", signum(col("s_stat")).cast("long"))
      .withColumn("band", expr(
        """case when z_sq_ppm < 3841600 then 'flat'
             when s_stat > 0 then 'rising' else 'falling' end"""))
      .select(col("n_days"), col("s_stat"), col("tie_term"),
        col("var18"), col("trend_dir"), col("z_sq_ppm"), col("band"))
  }

  val q285Sql: String = """
    WITH daily AS (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
          AS di,
        CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1),
    sstat AS (
      SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1
        WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
      FROM daily a JOIN daily b ON a.di < b.di),
    ties AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN tg > 1
          THEN tg * (tg - 1) * (2 * tg + 5) ELSE 0 END), 0) AS BIGINT)
          AS tie_term
      FROM (SELECT y, CAST(COUNT(*) AS BIGINT) AS tg
            FROM daily GROUP BY 1) g),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
    base AS (
      SELECT s_stat, tie_term, n_days,
        n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS var18
      FROM sstat CROSS JOIN ties CROSS JOIN nn),
    fin AS (
      SELECT *, CASE WHEN var18 <= 0 OR ABS(s_stat) <= 1 THEN 0
        ELSE CAST(CAST(18 AS HUGEINT) * (ABS(s_stat) - 1)
          * (ABS(s_stat) - 1) * 1000000 // var18 AS BIGINT) END
          AS z_sq_ppm
      FROM base)
    SELECT n_days, s_stat, tie_term, var18,
      CAST(SIGN(s_stat) AS BIGINT) AS trend_dir, z_sq_ppm,
      CASE WHEN z_sq_ppm < 3841600 THEN 'flat'
        WHEN s_stat > 0 THEN 'rising' ELSE 'falling' END AS band
    FROM fin"""

  // ---- q287: Wald-Wolfowitz runs test (daily demand randomness) --------
  // The third leg of the series-audit tripod: q249 locates a level
  // shift, q285 detects monotone drift, and the runs test (Wald &
  // Wolfowitz, AMS 1940) asks whether the SEQUENCE of above/below-
  // median days is random at all — too FEW runs means regime
  // clustering (demand sticks high or low for stretches: batching,
  // promotions, weekly cycles), too MANY means oscillation
  // (overdispersed day-to-day alternation).
  //
  // Median split: the exact lower median of the daily counts from the
  // bounded value histogram (rank (n+1) div 2 — no sort of the
  // corpus, only of the ≤|days| distinct values); days with y > med
  // are 'up' (n1), y ≤ med 'down' (n2) — the tie convention stated
  // and mirrored. R = number of maximal same-sign runs via one lag
  // on the bounded day frame.
  //
  // Exactness: with A = 2·n1·n2, E[R] = 1 + A/n and Var(R) =
  // A(A−n)/(n²(n−1)) give z² = (Rn − n − A)²·(n−1)/(A·(A−n)) — every
  // factor integer, ONE flooring into ppm. Bounds: n ≤ ~2500 days →
  // (Rn−n−A)² ≤ ~1.5e13, ×(n−1)×1e6 ≈ 4e22 — inside Decimal(38,0)/
  // HUGEINT. Degenerate guard: A ≤ n (one side nearly empty) → NULL.
  //
  // Scale shape: map-side collapse to the |days| frame, bounded
  // histogram median, one bounded lag window, 1 output row.
  def q287RunsTest(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .select(datediff(col("o_orderdate").cast("date"), lit("1970-01-01"))
        .cast("long").as("di"))
      .groupBy(col("di")).agg(count(lit(1)).as("y"))
      .persist() // median histogram + the run scan read it
    val n1row = daily.agg(count(lit(1)).as("n_days"))
    val wCum = Window.orderBy(col("y"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = daily.groupBy(col("y")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .crossJoin(broadcast(n1row))
      .filter(expr("cum >= (n_days + 1) div 2"))
      .agg(min(col("y")).as("med"))
    val signed = daily.crossJoin(broadcast(med))
      .withColumn("up", (col("y") > col("med")).cast("long"))
    val wLag = Window.orderBy(col("di"))
    val runs = signed
      .withColumn("prev", lag(col("up"), 1).over(wLag))
      .agg(sum(when(col("prev").isNull || col("prev") =!= col("up"), 1L)
          .otherwise(0L)).as("r_runs"),
        sum(col("up")).as("n1"),
        sum(lit(1L) - col("up")).as("n2"),
        count(lit(1)).as("n_days"),
        max(col("med")).as("median_daily"))
    runs
      .withColumn("aa", lit(2L) * col("n1") * col("n2"))
      .withColumn("dev", expr("r_runs * n_days - n_days - aa"))
      .withColumn("z_sq_ppm", expr(
        """case when aa <= n_days or n_days < 2 then null
           else cast(cast(dev as decimal(38,0)) * dev * (n_days - 1)
             * 1000000 div (cast(aa as decimal(38,0)) * (aa - n_days))
             as bigint) end"""))
      .withColumn("band", expr(
        """case when z_sq_ppm is null then 'degenerate'
             when z_sq_ppm < 3841600 then 'random'
             when dev < 0 then 'clustered' else 'oscillating' end"""))
      .select(col("n_days"), col("median_daily"), col("n1"), col("n2"),
        col("r_runs"), col("z_sq_ppm"), col("band"))
  }

  val q287Sql: String = """
    WITH daily AS (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
          AS di,
        CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
    hist AS (
      SELECT y, CAST(SUM(COUNT(*)) OVER (ORDER BY y
        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM daily GROUP BY y),
    med AS (
      SELECT MIN(y) AS med FROM hist CROSS JOIN nn
      WHERE cum >= (n_days + 1) // 2),
    signed AS (
      SELECT di, CASE WHEN y > med THEN 1 ELSE 0 END AS up
      FROM daily CROSS JOIN med),
    runs AS (
      SELECT CAST(SUM(CASE WHEN prev IS NULL OR prev <> up THEN 1
          ELSE 0 END) AS BIGINT) AS r_runs,
        CAST(SUM(up) AS BIGINT) AS n1,
        CAST(SUM(1 - up) AS BIGINT) AS n2,
        CAST(COUNT(*) AS BIGINT) AS n_days
      FROM (SELECT up, lag(up) OVER (ORDER BY di) AS prev FROM signed) t),
    base AS (
      SELECT runs.*, med.med AS median_daily, 2 * n1 * n2 AS aa,
        r_runs * n_days - n_days - 2 * n1 * n2 AS dev
      FROM runs CROSS JOIN med),
    fin AS (
      SELECT *, CASE WHEN aa <= n_days OR n_days < 2 THEN NULL
        ELSE CAST(CAST(dev AS HUGEINT) * dev * (n_days - 1) * 1000000
          // (CAST(aa AS HUGEINT) * (aa - n_days)) AS BIGINT) END
          AS z_sq_ppm
      FROM base)
    SELECT n_days, median_daily, n1, n2, r_runs, z_sq_ppm,
      CASE WHEN z_sq_ppm IS NULL THEN 'degenerate'
        WHEN z_sq_ppm < 3841600 THEN 'random'
        WHEN dev < 0 THEN 'clustered' ELSE 'oscillating' END AS band
    FROM fin"""

  // ---- q288: MAD robust anomaly days (modified z-score) ----------------
  // The outlier-day detector that survives its own outliers: mean/σ
  // rules (q219's EWMA limits) are dragged by the very spikes they
  // hunt; the Iglewicz-Hoaglin modified z-score M = 0.6745·(y−med)/MAD
  // (NIST/SEMATECH e-handbook §1.3.5.17) uses the median and the
  // median absolute deviation — 50% breakdown point — and flags
  // |M| ≥ 3.5. Zero-order days are REAL candidate anomalies, so the
  // series is the gap-filled daily spine (the q281 lesson).
  //
  // Exactness: med and MAD are exact lower medians from two bounded
  // value histograms (rank (n+1) div 2 — never a corpus sort); the
  // flag is the integer cross-multiplication 6745·d·2 ≥ 7·10⁴·MAD
  // (⟺ 0.6745·d/MAD ≥ 3.5), and mz_ppm = 674500·d div MAD floors
  // once. MAD = 0 (over half the days identical) degrades loudly:
  // mz NULL, any deviating day flagged. Output is the exact top-10
  // by (deviation, day) with an is_anomaly verdict and the corpus
  // anomaly count attached — never just the flagged subset, so the
  // frame is non-empty on quiet corpora too.
  def q288MadAnomalies(s: SparkSession, d: String): DataFrame = {
    val daily0 = Tables.orders(s, d)
      .select(datediff(col("o_orderdate").cast("date"), lit("1970-01-01"))
        .cast("long").as("di"))
      .groupBy(col("di")).agg(count(lit(1)).as("y"))
    val bounds = daily0.agg(min(col("di")).as("mn"), max(col("di")).as("mx"))
    val daily = bounds.select(explode(expr("sequence(mn, mx)")).as("di"))
      .join(daily0, Seq("di"), "left")
      .withColumn("y", coalesce(col("y"), lit(0L)))
      .persist() // two medians + the flag scan read it
    def lowerMedian(src: DataFrame, c: String, out: String): DataFrame = {
      val wc = Window.orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      src.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(wc))
        .crossJoin(broadcast(src.agg(count(lit(1)).as("n_all"))))
        .filter(expr("cum >= (n_all + 1) div 2"))
        .agg(min(col(c)).as(out))
    }
    val med = lowerMedian(daily, "y", "med")
    val devs = daily.crossJoin(broadcast(med))
      .withColumn("dev", abs(col("y") - col("med")))
      .persist() // MAD histogram + the scored scan read it
    val mad = lowerMedian(devs, "dev", "mad")
    val scored = devs.crossJoin(broadcast(mad))
      .withColumn("mz_ppm", expr(
        "cast(cast(674500 as decimal(38,0)) * dev div nullif(mad, 0)" +
          " as bigint)"))
      .withColumn("is_anomaly",
        expr("case when mad = 0 then dev > 0" +
          " else 13490 * dev >= 70000 * mad end"))
    val nAnom = scored.agg(
      sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("n_anomalies"))
    scored.orderBy(col("dev").desc, col("di").asc).limit(10)
      .crossJoin(broadcast(nAnom))
      .select(
        date_add(to_date(lit("1970-01-01")), col("di").cast("int"))
          .as("day"),
        col("y"), col("med"), col("mad"), col("dev"), col("mz_ppm"),
        col("is_anomaly"), col("n_anomalies"))
      .orderBy(col("dev").desc, col("day").asc)
  }

  val q288Sql: String = """
    WITH daily0 AS (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
          AS di,
        CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1),
    bounds AS (SELECT MIN(di) AS mn, MAX(di) AS mx FROM daily0),
    daily AS (
      SELECT s.di, COALESCE(d.y, 0) AS y
      FROM (SELECT unnest(generate_series(mn, mx)) AS di FROM bounds) s
      LEFT JOIN daily0 d ON d.di = s.di),
    nall AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM daily),
    med AS (
      SELECT MIN(y) AS med FROM (
        SELECT y, CAST(SUM(COUNT(*)) OVER (ORDER BY y
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM daily GROUP BY y) h CROSS JOIN nall
      WHERE cum >= (n_all + 1) // 2),
    devs AS (
      SELECT di, y, med, ABS(y - med) AS dev
      FROM daily CROSS JOIN med),
    mad AS (
      SELECT MIN(dev) AS mad FROM (
        SELECT dev, CAST(SUM(COUNT(*)) OVER (ORDER BY dev
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM devs GROUP BY dev) h CROSS JOIN nall
      WHERE cum >= (n_all + 1) // 2),
    scored AS (
      SELECT di, y, med, mad.mad, dev,
        CAST(CAST(674500 AS HUGEINT) * dev // NULLIF(mad.mad, 0)
          AS BIGINT) AS mz_ppm,
        CASE WHEN mad.mad = 0 THEN dev > 0
          ELSE 13490 * dev >= 70000 * mad.mad END AS is_anomaly
      FROM devs CROSS JOIN mad),
    na AS (
      SELECT CAST(SUM(CASE WHEN is_anomaly THEN 1 ELSE 0 END) AS BIGINT)
        AS n_anomalies
      FROM scored),
    top AS (
      SELECT * FROM scored ORDER BY dev DESC, di LIMIT 10)
    SELECT DATE '1970-01-01' + CAST(di AS INTEGER) AS day, y, med,
      mad, dev, mz_ppm, is_anomaly, n_anomalies
    FROM top CROSS JOIN na
    ORDER BY dev DESC, day"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q288_mad_anomalies" -> q288MadAnomalies _,
    "q287_runs_test" -> q287RunsTest _,
    "q285_mann_kendall" -> q285MannKendall _,
    "q283_spearman" -> q283Spearman _,
    "q276_simpson_reversal" -> q276SimpsonReversal _,
    "q273_kendall_tau" -> q273KendallTau _,
    "q261_median_ci" -> q261MedianCi _,
    "q255_ccf_lead_lag" -> q255CcfLeadLag _,
    "q249_cusum_changepoint" -> q249CusumChangepoint _,
    "q232_bootstrap_ci" -> q232BootstrapCi _,
    "q228_theil_sen" -> q228TheilSen _,
    "q224_l_diversity" -> q224LDiversity _,
    "q216_k_anonymity" -> q216KAnonymity _,
    "q217_rank_test" -> q217RankTest _,
    "q218_autocorr" -> q218Autocorr _,
    "q219_ewma_chart" -> q219EwmaChart _,
    "q202_winsorized" -> q202Winsorized _,
    "q186_effective_sample" -> q186EffectiveSample _,
    "q158_ks_drift" -> q158KsDrift _,
    "q152_composition_skew" -> q152CompositionSkew _,
    "q56_percentiles" -> q56Percentiles _,
    "q57_correlation" -> q57Correlation _,
    "q58_histogram"   -> q58Histogram _,
    "q62_approx_percentile" -> q62ApproxPercentile _,
    "q81_sketch_union" -> q81SketchUnion _,
    "q85_countmin_topk" -> q85CountMin _,
    "q92_quantile_bins" -> q92QuantileBins _,
    "q94_iqr_outliers"  -> q94IqrOutliers _,
    "q115_ols_fit"      -> q115OlsFit _,
    "q118_join_size_sketch" -> q118JoinSizeSketch _,
    "q122_weighted_median" -> q122WeightedMedian _,
    "q124_zscore"       -> q124ZScore _,
    "q125_drift_t"      -> q125DriftT _)

  val oracles: Map[String, String] = Map(
    "q287_runs_test" -> q287Sql,
    "q288_mad_anomalies" -> q288Sql,
    "q285_mann_kendall" -> q285Sql,
    "q283_spearman" -> q283Sql,
    "q276_simpson_reversal" -> q276Sql,
    "q273_kendall_tau" -> q273Sql,
    "q261_median_ci" -> q261Sql,
    "q255_ccf_lead_lag" -> q255Sql,
    "q249_cusum_changepoint" -> q249Sql,
    "q232_bootstrap_ci" -> q232Sql,
    "q228_theil_sen" -> q228Sql,
    "q224_l_diversity" -> q224Sql,
    "q216_k_anonymity" -> q216Sql,
    "q217_rank_test" -> q217Sql,
    "q218_autocorr" -> q218Sql,
    "q219_ewma_chart" -> q219Sql,
    "q202_winsorized" -> q202Sql,
    "q186_effective_sample" -> q186Sql,
    "q158_ks_drift" -> q158Sql,
    "q152_composition_skew" -> q152Sql,
    "q56_percentiles" -> q56Sql,
    "q57_correlation" -> q57Sql,
    "q58_histogram"   -> q58Sql,
    "q62_approx_percentile" -> q62Sql,
    "q81_sketch_union" -> q81Sql,
    "q85_countmin_topk" -> q85Sql,
    "q92_quantile_bins" -> q92Sql,
    "q94_iqr_outliers"  -> q94Sql,
    "q115_ols_fit"      -> q115Sql,
    "q118_join_size_sketch" -> q118Sql,
    "q122_weighted_median" -> q122Sql,
    "q124_zscore"       -> q124Sql,
    "q125_drift_t"      -> q125Sql)
}
