package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import ops.CommerceOps

class CommerceOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Deterministic raw-Gen sampling (the PropertySpec pattern — the
    * scalatest<->scalacheck bridge artifact is not in the offline cache). */
  private def forAll[A](g: Gen[A], n: Int = 40)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  test("q195 scores stay in 1..4 and customer counts add up") {
    val rows = CommerceOps.q195RfmSegments(spark, sf).collect()
    assert(rows.nonEmpty)
    for (c <- Seq("r_score", "f_score", "m_score"))
      assert(rows.forall(x => (1 to 4).contains(x.getAs[Int](c))), c)
    val total = rows.map(_.getAs[Long]("n_customers")).sum
    val distinctCust = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(total == distinctCust,
      s"segment cells cover $total of $distinctCust customers")
    spark.catalog.clearCache()
  }

  test("q196 pair support never exceeds either item's support, pairs are canonical") {
    val rows = CommerceOps.q196BasketPairs(spark, sf).collect()
    // fixture may or may not produce frequent pairs at this SF; the
    // invariants must hold for whatever comes back
    rows.foreach { x =>
      val (cp, ca, cb) = (x.getAs[Long]("c_pair"), x.getAs[Long]("c_a"),
        x.getAs[Long]("c_b"))
      assert(cp <= ca && cp <= cb, s"pair support exceeds item support: $x")
      assert(x.getAs[Long]("pa") < x.getAs[Long]("pb"), s"pair unordered: $x")
      assert(x.getAs[Long]("conf_ppm") <= 1000000L, s"confidence > 1: $x")
    }
  }

  test("q196/q275 giant baskets are capped and ledgered, organic ones kept") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("giantbask").toString
    // TWO clone-farm orders holding the same 70 distinct parts (every
    // part frequent at support ≥ 2, so the apriori item floor does NOT
    // prune them — only the WIDTH cap can stop the C(70,2)/C(70,3)
    // blowup) plus three organic 3-item baskets over parts 1..3.
    // Expected: both farm baskets are dropped from enumeration in both
    // shapes, their mass lands on the ledger, and the organic
    // pair/triple counts exclude them (support 3, organic only).
    val farm = (1 to 70).flatMap(p =>
      Seq((1000L, p.toLong), (1001L, p.toLong)))
    val organic = (1 to 3).flatMap(o => (1 to 3).map(p => (o.toLong, p.toLong)))
    (farm ++ organic).toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val pairs = CommerceOps.q196BasketPairs(spark, dir).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { x =>
      assert(x.getAs[Long]("capped_baskets") == 2L, x.toString)
      assert(x.getAs[Long]("capped_item_slots") == 140L, x.toString)
      assert(x.getAs[Long]("c_pair") == 3L, x.toString) // organic only
    }
    assert(pairs.map(x => (x.getAs[Long]("pa"), x.getAs[Long]("pb")))
      .toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val trips = CommerceOps.q275BasketTriples(spark, dir).collect()
    assert(trips.map(x => (x.getAs[Long]("pa"), x.getAs[Long]("pb"),
      x.getAs[Long]("pc"))).toSet == Set((1L, 2L, 3L)))
    assert(trips.head.getAs[Long]("c_triple") == 3L)
    assert(trips.head.getAs[Long]("capped_baskets") == 2L)
    assert(trips.head.getAs[Long]("capped_item_slots") == 140L)
    spark.catalog.clearCache()
  }

  test("q275 lift3 clamps at the 1e15-ppm ceiling instead of overflowing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("liftclamp").toString
    // two orders share the rare triple {1,2,3} (all supports at the
    // minsup floor of 2); 70,000 single-item filler orders inflate
    // n_orders to 70,002, pushing the unclamped lift3
    // ((2e6 div 2)·N div 2)·N div 2 ≈ 1.225e15 past the 1e15 ceiling —
    // the clamp must fire via the pre-division integer condition, not
    // an overflowing quotient
    val triple = Seq(1L, 2L).flatMap(o => Seq(1L, 2L, 3L).map(p => (o, p)))
    val fillers = (1 to 70000).map(i => (100L + i, 1000000L + i))
    (triple ++ fillers).toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = CommerceOps.q275BasketTriples(spark, dir).collect()
    assert(r.map(x => (x.getAs[Long]("pa"), x.getAs[Long]("pb"),
      x.getAs[Long]("pc"))).toSet == Set((1L, 2L, 3L)))
    assert(r.head.getAs[Long]("lift3_ppm") == 1000000000000000L)
    assert(r.head.getAs[Long]("c_triple") == 2L)
    spark.catalog.clearCache()
  }

  test("q198 Benford expectation table sums to exactly one million ppm") {
    // the per-digit expectation literals must partition probability
    // mass exactly, or the χ² surrogate drifts from both engines' view
    val r = CommerceOps.q198Benford(spark, sf).collect()
    assert(r.map(_.getAs[Long]("exp_ppm")).sum == 1000000L)
    assert(r.map(_.getAs[Int]("digit")).toSet.subsetOf((1 to 9).toSet))
    // observed floor-div shares undershoot 1e6 by at most 8 ppm total
    val obs = r.map(_.getAs[Long]("obs_ppm")).sum
    assert(obs <= 1000000L && obs >= 1000000L - 8, s"obs_ppm sum $obs")
    spark.catalog.clearCache()
  }

  test("q200 linear credit mass per purchase is conserved up to floor loss") {
    val r = CommerceOps.q200Attribution(spark, sf).collect()
    assert(r.nonEmpty)
    // every attributed purchase contributes exactly one first and one
    // last touch, and ~1e6 micro of linear credit (floor-div loses < n_t
    // micro per purchase)
    val firsts = r.map(_.getAs[Long]("first_touch_n")).sum
    val lasts = r.map(_.getAs[Long]("last_touch_n")).sum
    assert(firsts == lasts, s"first/last totals differ: $firsts vs $lasts")
    val linear = r.map(_.getAs[Long]("linear_micro")).sum
    assert(linear <= firsts * 1000000L &&
      linear > firsts * 1000000L - r.map(_.getAs[Long]("n_touches")).sum,
      s"linear mass $linear outside conservation band")
  }

  test("q201 time-weighted average sits inside the value range and dwell cap binds") {
    val r = CommerceOps.q201TimeWeighted(spark, sf)
    assert(r.filter(col("twa") < 0.0 || col("twa") > 1000.0).count() == 0)
    // Σw ≤ n · cap by construction
    assert(r.filter(col("w_total_s") >
      col("n") * CommerceOps.DwellCapS).count() == 0)
  }

  test("q203 bands partition the order set; q204 Pareto counts are bounded") {
    val r203 = CommerceOps.q203OrderReconciliation(spark, sf).collect()
    val nOrders = Tables.orders(spark, sf).count()
    assert(r203.map(_.getAs[Long]("n_orders")).sum == nOrders,
      "reconciliation bands do not partition the orders")
    val r204 = CommerceOps.q204Pareto(spark, sf).collect()
    assert(r204.nonEmpty)
    r204.foreach { x =>
      assert(x.getAs[Long]("n_parts_80") <= x.getAs[Long]("n_parts"), s"$x")
      assert(x.getAs[Long]("top_share_ppm") <= 1000000L, s"$x")
    }
  }

  test("q209 Gini stays in [0, 1) and covers every customer") {
    val r = CommerceOps.q209Gini(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val g = x.getAs[Long]("gini_ppm")
      assert(g >= 0L && g < 1000000L, s"gini out of range: $x")
    }
    val covered = r.map(_.getAs[Long]("n_customers")).sum
    assert(covered == Tables.orders(spark, sf)
      .select("o_custkey").distinct().count(),
      "Gini segments do not cover the purchasing customers")
  }

  test("q212 LTV curves are monotone and cohort-bounded") {
    val r = CommerceOps.q212CohortLtv(spark, sf).collect()
    assert(r.nonEmpty)
    r.groupBy(_.getAs[Long]("cohort_ym")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("m_offset"))
      val cums = sorted.map(_.getAs[Long]("cum_units"))
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b },
        "cumulative spend must be monotone within a cohort")
      sorted.foreach(x => assert(
        x.getAs[Long]("n_active") <= x.getAs[Long]("cohort_n"), s"$x"))
    }
  }

  test("q213 HHI sits between top-share^2 and 1e6; q215 breach rate is bounded") {
    CommerceOps.q213SupplierHhi(spark, sf).collect().foreach { x =>
      val (hhi, top) = (x.getAs[Long]("hhi_ppm"),
        x.getAs[Long]("top_share_ppm"))
      assert(hhi <= 1000000L && hhi >= top * top / 1000000L,
        s"HHI outside [top^2, 1]: $x")
    }
    CommerceOps.q215ShipSla(spark, sf).collect().foreach { x =>
      assert(x.getAs[Long]("n_breach") <= x.getAs[Long]("n_lines"))
      assert(x.getAs[Double]("p50_days") <= x.getAs[Double]("p90_days"))
    }
    spark.catalog.clearCache()
  }

  test("q214 reports every declared family with max >= mean") {
    val r = CommerceOps.q214SkewAudit(spark, sf).collect()
    assert(r.map(_.getAs[String]("family")).toSet == Set(
      "orders.o_custkey", "lineitem.l_partkey", "events.user_id"))
    r.foreach { x =>
      // max/mean ratio in ppm is >= 1e6 by definition of max
      assert(x.getAs[Long]("skew_ppm") >= 1000000L, s"$x")
      assert(x.getAs[Long]("max_rows") <= x.getAs[Long]("n_rows"), s"$x")
    }
    spark.catalog.clearCache()
  }

  test("q205 intervals conserve events and leave one open interval per user") {
    val r = CommerceOps.q205Scd2(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    assert(r.map(_.getAs[Long]("n_events")).sum == ev.count(),
      "interval build lost or duplicated events")
    assert(r.map(_.getAs[Long]("n_open")).sum ==
      ev.select("user_id").distinct().count(),
      "every user must have exactly one open (current) interval")
  }

  test("q205 interval chaining is deterministic on simultaneous state flips") {
    // A user flipping state twice at one timestamp produces two intervals
    // with the SAME valid_from; ordering the chaining window by valid_from
    // alone leaves lead() tie-ambiguous. The grp tiebreak (monotone in the
    // (ts, event_id) event order) must pin: view[t0] → click[t0] → view
    // [t0+10s, open), so the first view closes at duration 0 and the click
    // closes at duration 10 — never the other way round.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scd2flip").toString
    val t0 = new java.sql.Timestamp(1700000000000L)
    val t1 = new java.sql.Timestamp(1700000010000L) // t0 + 10 s
    Seq((1L, t0, 1L, "view", 1.0, "{}"), (2L, t0, 1L, "click", 1.0, "{}"),
      (3L, t1, 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val m = CommerceOps.q205Scd2(spark, dir).collect()
      .map(r => r.getAs[String]("state") ->
        (r.getAs[Long]("n_intervals"), r.getAs[Long]("n_open"),
          r.getAs[Long]("closed_dur_s"))).toMap
    assert(m == Map("view" -> ((2L, 1L, 0L)), "click" -> ((1L, 0L, 10L))),
      s"tie-broken interval chain drifted: $m")
  }

  test("q206 new users sum to the user population; q207 shares are a bounded partition") {
    val r206 = CommerceOps.q206NewReturning(spark, sf).collect()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(r206.map(_.getAs[Long]("n_new")).sum == users,
      "each user must be new on exactly one day")
    assert(r206.forall(x =>
      x.getAs[Long]("n_new") + x.getAs[Long]("n_returning") ==
        x.getAs[Long]("n_active")))
    val r207 = CommerceOps.q207PathTrigrams(spark, sf).collect()
    assert(r207.length <= 20 && r207.nonEmpty)
    assert(r207.map(_.getAs[Long]("share_ppm")).sum <= 1000000L)
    spark.catalog.clearCache()
  }

  test("prefix-filter candidate generation is complete for Jaccard >= 0.8 (q199 math)") {
    // pure-math property behind q199: under ANY total token order, two
    // sets with J >= 4/5 must share a token inside both length-derived
    // prefixes (p = n - ceil(0.8 n) + 1). A counterexample here means
    // the equi-join loses a qualifying pair at any scale.
    def prefixLen(n: Int): Int = n - ((4 * n + 4) / 5) + 1
    val genPair: Gen[(Set[Int], Set[Int])] = for {
      base <- Gen.chooseNum(5, 40)
      a <- Gen.pick(base, 0 until 60)
      drop <- Gen.chooseNum(0, base / 5)
      add <- Gen.pick(drop, (0 until 60).filterNot(a.contains))
    } yield (a.toSet, a.toSet.toVector.sorted.drop(drop).toSet ++ add)
    forAll(genPair, n = 200) { case (a, b) =>
      val inter = (a & b).size
      val uni = (a | b).size
      if (uni > 0 && inter * 5 >= uni * 4) {
        // canonical order = natural int order here (any total order works)
        val pa = a.toVector.sorted.take(prefixLen(a.size)).toSet
        val pb = b.toVector.sorted.take(prefixLen(b.size)).toSet
        assert((pa & pb).nonEmpty,
          s"J>=0.8 pair with disjoint prefixes: a=$a b=$b")
      }
    }
  }

  test("q199 agrees with a driver-side brute-force Jaccard join on the fixture") {
    val fast = SparkEntry.queries("q199_allpairs_join")(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), filter(
        split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"),
        x => x =!= lit("")).as("t"))
      .filter(size(col("t")) >= 3)
      .collect().map { r =>
        val t = r.getSeq[String](1)
        (r.getLong(0), t.sliding(3).map(_.mkString(" ")).toSet)
      }
    val brute = (for {
      (ida, ta) <- docs; (idb, tb) <- docs if ida < idb
      inter = (ta & tb).size; uni = (ta | tb).size
      if uni > 0 && inter * 5 >= uni * 4
    } yield (ida, idb)).toSet
    assert(fast == brute,
      s"missing=${(brute -- fast).take(5)} extra=${(fast -- brute).take(5)}")
    spark.catalog.clearCache()
  }

  test("q231 slope and r match a BigInt brute recount per brand") {
    import org.apache.spark.sql.functions.col
    val li = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select("p_brand", "l_discount", "l_quantity").collect()
      .map(x => (x.getAs[String]("p_brand"),
        math.floor(x.getAs[Double]("l_discount") * 1e4 + 0.5).toLong,
        math.floor(x.getAs[Double]("l_quantity") * 1e2 + 0.5).toLong))
    val r = ops.CommerceOps.q231DiscountResponse(spark, sf).collect()
      .map(x => x.getAs[String]("p_brand") -> x).toMap
    li.groupBy(_._1).foreach { case (brand, rows) =>
      val n = BigInt(rows.length)
      val (sx, sy) = (BigInt(rows.map(_._2).sum), BigInt(rows.map(_._3).sum))
      val sxy = rows.map(t => BigInt(t._2) * t._3).sum
      val sxx = rows.map(t => BigInt(t._2) * t._2).sum
      val syy = rows.map(t => BigInt(t._3) * t._3).sum
      val (num, den, vy) = (n * sxy - sx * sy, n * sxx - sx * sx,
        n * syy - sy * sy)
      val row = r(brand)
      assert(row.getAs[Long]("n_lines") == rows.length.toLong)
      if (den == 0) assert(row.isNullAt(row.fieldIndex("slope_micro")))
      else {
        val slope = if (num >= 0) num * 1000000 / den
                    else -((-num) * 1000000 / den)
        assert(BigInt(row.getAs[Long]("slope_micro")) == slope, brand)
      }
      if (den > 0 && vy > 0) {
        val rb = num.toDouble / math.sqrt(den.toDouble * vy.toDouble)
        assert(math.abs(row.getAs[Double]("r") - rb) < 1e-12, brand)
      }
    }
  }

  test("q226 recovers a planted pure weekly profile with strength 1e6") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dow").toString
    // 2024-05-06 is a Monday; two full weeks where every Monday is $200
    // and every other day $100 — the weekly profile explains ALL variance
    val orders = (0 until 14).map { i =>
      val day = java.time.LocalDate.of(2024, 5, 6).plusDays(i.toLong)
      val price = if (day.getDayOfWeek.getValue == 1) 200.0 else 100.0
      (i.toLong, 1L, java.sql.Timestamp.valueOf(day.atStartOfDay()), price)
    }
    orders.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val r = ops.CommerceOps.q226DowSeasonality(spark, dir).collect()
    assert(r.length == 7)
    assert(r.map(_.getAs[Int]("dow")).toSeq == (1 to 7))
    r.foreach { x =>
      val expected = if (x.getAs[Int]("dow") == 1) 20000L else 10000L
      assert(x.getAs[Long]("mean_cents") == expected, x.toString)
      assert(x.getAs[Long]("n_days") == 2L)
      assert(x.getAs[Long]("seasonal_strength_ppm") == 1000000L)
    }
  }

  test("q250 Wilson bound sinks the thin-evidence brand the naive rank tops") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wilson").toString
    // TINY: 2 lines, 1 return (50% raw — naive #1);
    // BIG: 100 lines, 30 returns (30% raw, far tighter evidence).
    val li = (1 to 100).map(i =>
      (1L, if (i <= 30) "R" else "N")) ++ Seq((2L, "R"), (2L, "N"))
    li.toDF("l_partkey", "l_returnflag")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, "BIG"), (2L, "TINY")).toDF("p_partkey", "p_brand")
      .write.parquet(s"$dir/part.parquet")
    val r = CommerceOps.q250WilsonReturns(spark, dir).collect()
      .map(x => x.getAs[String]("p_brand") -> x).toMap
    assert(r("TINY").getAs[Long]("rate_ppm") == 500000L)
    assert(r("BIG").getAs[Long]("rate_ppm") == 300000L)
    assert(r("TINY").getAs[Long]("naive_rank") == 1L)
    assert(r("BIG").getAs[Long]("wilson_rank") == 1L)
    assert(r("TINY").getAs[Long]("rank_delta") == -1L)
    // exact-integer recount of the staged Wilson form (z = 49/25 exactly):
    // num = (1250nr + 2401n)·S − 49·isqrt(nD·S²), den = (1250n² + 4802n)·S,
    // D = 2500r(n−r) + 2401n, S = 1000 — BigInt isqrt here, so this also
    // proves the engine's floor(sqrt(double))±1 correction is the true
    // integer square root in the exact-double range
    def isqrt(x: BigInt): BigInt = {
      var s = BigInt(math.sqrt(x.toDouble).toLong)
      while (s * s > x) s -= 1
      while ((s + 1) * (s + 1) <= x) s += 1
      s
    }
    def wilsonPpm(ret: Long, n: Long): Long = {
      val d = BigInt(2500) * ret * (n - ret) + BigInt(2401) * n
      val s = isqrt(BigInt(n) * d * 1000000L)
      val num = ((BigInt(1250) * n * ret + BigInt(2401) * n) * 1000 -
        49 * s).max(BigInt(0))
      val den = (BigInt(1250) * n * n + BigInt(4802) * n) * 1000
      (num * 1000000 / den).toLong
    }
    assert(r("BIG").getAs[Long]("wilson_lo_ppm") == wilsonPpm(30L, 100L))
    assert(r("TINY").getAs[Long]("wilson_lo_ppm") == wilsonPpm(1L, 2L))
    assert(r("BIG").getAs[Long]("wilson_lo_ppm") >
      r("TINY").getAs[Long]("wilson_lo_ppm"))
    // and the staged-integer bound stays within its documented flooring
    // error of the real-number Wilson value (3.4 ppm at n = 2)
    def wilsonReal(ret: Long, n: Long): Double = {
      val p = ret.toDouble / n; val nd = n.toDouble
      (p + 1.9208 / nd - 1.96 * math.sqrt((p * (1.0 - p) + 0.9604 / nd)
        / nd)) / (1.0 + 3.8416 / nd)
    }
    assert(math.abs(r("TINY").getAs[Long]("wilson_lo_ppm") -
      wilsonReal(1L, 2L) * 1e6) <= 4.0)
    assert(math.abs(r("BIG").getAs[Long]("wilson_lo_ppm") -
      wilsonReal(30L, 100L) * 1e6) <= 1.0)
  }

  test("q254 backlog ledger accumulates opened minus completed and flags the peak") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("backlog").toString
    def ts(m: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2020, m, 15).atStartOfDay())
    // month 1: open 3; month 2: open 2, complete 1; month 3: complete 3;
    // order 5 never ships → closing backlog 1. Backlog: 3, 4, 1.
    Seq((1L, ts(1)), (2L, ts(1)), (3L, ts(1)), (4L, ts(2)), (5L, ts(2)))
      .toDF("o_orderkey", "o_orderdate")
      .write.parquet(s"$dir/orders.parquet")
    // order 1 ships across months 1-2 (completion = max = month 2)
    Seq((1L, ts(1)), (1L, ts(2)), (2L, ts(3)), (3L, ts(3)), (4L, ts(3)))
      .toDF("l_orderkey", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = CommerceOps.q254OrderBacklog(spark, dir).collect()
    assert(r.length == 3)
    val m = r.map(x => x.getAs[Long]("month_id") - (2020L * 12 + 1) -> x)
      .toMap
    assert(m(0L).getAs[Long]("n_opened") == 3L)
    assert(m(0L).getAs[Long]("n_completed") == 0L)
    assert(m(0L).getAs[Long]("backlog") == 3L)
    assert(m(1L).getAs[Long]("backlog") == 4L)
    assert(m(1L).getAs[Boolean]("is_peak"))
    assert(m(2L).getAs[Long]("n_completed") == 3L)
    assert(m(2L).getAs[Long]("backlog") == 1L) // the never-shipped tail
    assert(r.count(_.getAs[Boolean]("is_peak")) == 1)
  }

  test("q257 decomposition growths satisfy the multiplicative identity exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pvm").toString
    def ts(m: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2020, m, 15).atStartOfDay())
    // brand A: price doubles at constant volume (h1: 10 units @ $1;
    // h2: 10 units @ $2). brand B: volume doubles at constant price.
    // brand C: h2 only → new_or_exited.
    val li = Seq(
      (1L, ts(1), 1.00, 10.0), (1L, ts(6), 2.00, 10.0),
      (2L, ts(1), 3.00, 5.0), (2L, ts(6), 3.00, 10.0),
      (3L, ts(6), 4.00, 2.0))
      .toDF("l_partkey", "l_shipdate", "l_extendedprice", "l_quantity")
    li.write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("p_partkey", "p_brand")
      .write.parquet(s"$dir/part.parquet")
    val r = CommerceOps.q257PriceVolumeMix(spark, dir).collect()
      .map(x => x.getAs[String]("p_brand") -> x).toMap
    assert(r("A").getAs[Long]("rev_growth_ppm") == 1000000L)
    assert(r("A").getAs[Long]("volume_growth_ppm") == 0L)
    assert(r("A").getAs[Long]("price_growth_ppm") == 1000000L)
    assert(r("A").getAs[String]("growth_band") == "price_led")
    assert(r("B").getAs[Long]("rev_growth_ppm") == 0L)
    assert(r("B").getAs[Long]("volume_growth_ppm") == 1000000L)
    assert(r("B").getAs[Long]("price_growth_ppm") == -500000L)
    assert(r("C").getAs[String]("growth_band") == "new_or_exited")
    assert(r("C").isNullAt(r("C").fieldIndex("rev_growth_ppm")))
    // BigInt floor-div recount of every growth, and the multiplicative
    // identity (1+g_R)·1e12 = (1+g_P)(1+g_Q) exact on the rationals:
    // r2/r1 = (r2·q1)/(r1·q2) · (q2/q1) — cross-multiplied, no division
    for (b <- Seq("A", "B")) {
      val x = r(b)
      val (r1, r2) = (BigInt(x.getAs[Long]("r1")), BigInt(x.getAs[Long]("r2")))
      val (q1, q2) = (BigInt(x.getAs[Long]("q1")), BigInt(x.getAs[Long]("q2")))
      assert(x.getAs[Long]("rev_growth_ppm") ==
        (r2 * 1000000 / r1 - 1000000).toLong, b)
      assert(x.getAs[Long]("volume_growth_ppm") ==
        (q2 * 1000000 / q1 - 1000000).toLong, b)
      assert(x.getAs[Long]("price_growth_ppm") ==
        (r2 * q1 * 1000000 / (r1 * q2) - 1000000).toLong, b)
    }
  }

  test("q259 shrinks the thin brand toward grand and keeps the fat ones") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("eb").toString
    // Three fat brands with genuinely different rates (10/30/50% over
    // 10000 lines — real between-brand variance) plus THIN (2 lines at
    // 50%): the weighted moments keep c ≈ 1 for the fat brands and
    // shrink THIN hard toward the grand rate.
    val groups = Seq(
      (1L, 10000L, 1000L), (2L, 10000L, 3000L), (3L, 10000L, 5000L),
      (4L, 2L, 1L))
    val li = groups.flatMap { case (pk, n, rr) =>
      (1L to n).map(i => (pk, if (i <= rr) "R" else "N")) }
    li.toDF("l_partkey", "l_returnflag")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, "FAT10"), (2L, "FAT30"), (3L, "FAT50"), (4L, "THIN"))
      .toDF("p_partkey", "p_brand")
      .write.parquet(s"$dir/part.parquet")
    val r = CommerceOps.q259ShrunkRates(spark, dir).collect()
      .map(x => x.getAs[String]("p_brand") -> x).toMap
    // BigInt recount of the full weighted integer-EB pipeline
    val pp = groups.map { case (_, n, rr) => BigInt(rr) * 1000000 / n }
    val vh = groups.zip(pp).map { case ((_, n, _), p) =>
      p * (1000000 - p) / n }
    val nTot = BigInt(groups.map(_._2).sum)
    val grand = BigInt(groups.map(_._3).sum) * 1000000 / nTot
    val ssb = groups.zip(pp)
      .map { case ((_, n, _), p) => BigInt(n) * (p - grand) * (p - grand) }
      .sum
    val sv = groups.zip(vh)
      .map { case ((_, n, _), v) => BigInt(n) * v }.sum
    val tau2 = ((ssb / nTot) - (sv / nTot)).max(BigInt(0))
    assert(tau2 > 0, "fixture must carry real between-brand variance")
    def shrunk(i: Int): Long = {
      val c = tau2 * 1000000 / (tau2 + vh(i))
      (grand + (if (pp(i) >= grand) c * (pp(i) - grand) / 1000000
                else -(c * (grand - pp(i)) / 1000000))).toLong
    }
    val names = Seq("FAT10", "FAT30", "FAT50", "THIN")
    names.zipWithIndex.foreach { case (b, i) =>
      assert(r(b).getAs[Long]("p_ppm") == pp(i).toLong, b)
      assert(r(b).getAs[Long]("shrunk_ppm") == shrunk(i), b)
    }
    // directional reads: THIN travels most of the way to grand, the
    // fat brands keep (nearly) their own rates
    val g = grand.toLong
    assert(math.abs(r("THIN").getAs[Long]("shrunk_ppm") - g) <
      math.abs(500000L - g) / 4, "THIN did not shrink")
    assert(math.abs(r("FAT10").getAs[Long]("shrunk_ppm") - 100000L) <
      math.abs(100000L - g) / 10, "FAT10 over-shrunk")
    assert(r("THIN").getAs[String]("band") == "strong_shrink")
    assert(r("FAT10").getAs[String]("band") == "mostly_raw")
  }

  test("q275 triple rules match a hand-counted basket fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("triples").toString
    // baskets: o1{1,2,3} o2{1,2,3} o3{1,2,4} o4{5} o5{1,2,3,4} —
    // item 5 is infrequent (support 1); surviving triples at minsup 2:
    // (1,2,3) support 3 and (1,2,4) support 2
    val items = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L), (3L, 4L),
      (4L, 5L),
      (5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L))
    items.toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = ops.CommerceOps.q275BasketTriples(spark, dir).collect()
      .map(x => (x.getAs[Long]("pa"), x.getAs[Long]("pb"),
        x.getAs[Long]("pc")) -> x).toMap
    assert(r.keySet == Set((1L, 2L, 3L), (1L, 2L, 4L)))
    assert(r((1L, 2L, 3L)).getAs[Long]("c_triple") == 3L)
    assert(r((1L, 2L, 3L)).getAs[Long]("support_ppm") == 600000L)
    // lift3 = ((3e6 div 4)·5 div 4)·5 div 3 = 1562500
    assert(r((1L, 2L, 3L)).getAs[Long]("lift3_ppm") == 1562500L)
    assert(r((1L, 2L, 4L)).getAs[Long]("c_triple") == 2L)
    assert(r((1L, 2L, 4L)).getAs[Long]("lift3_ppm") == 1562500L)
    spark.catalog.clearCache()
  }

  test("q270 stability flags the planted month-three mix shift") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("psistab").toString
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-0$m%01d-15 00:00:00")
    // months 1+2: prices 1..20 dollars each (identical distributions);
    // month 3: twenty orders all at 20 dollars — the whole mass lands in
    // one bin. Global histogram (n=60, cents 100..2000 + 20×2000):
    // decile cuts [300,600,900,1200,1500,1800,2000,2000,2000] → months
    // 1-2 fill bins 0-5 with 3/20 and bin 6 with 2/20; month 3 is all
    // bin 6 → TV = (900000 + 6·150000)/2 = 900000 ppm
    val rows =
      (1 to 20).flatMap(i => Seq((i.toLong, i.toDouble, ts(1)),
        (100L + i, i.toDouble, ts(2)))) ++
        (1 to 20).map(i => (200L + i, 20.0, ts(3)))
    rows.toDF("o_orderkey", "o_totalprice", "o_orderdate")
      .write.parquet(s"$dir/orders.parquet")
    val r = ops.CommerceOps.q270DistStability(spark, dir).collect()
      .map(x => x.getAs[java.sql.Date]("month_start").toString -> x).toMap
    assert(r.keySet == Set("2024-01-01", "2024-02-01", "2024-03-01"))
    assert(r("2024-01-01").getAs[String]("band") == "no_prior")
    assert(r("2024-01-01").isNullAt(
      r("2024-01-01").fieldIndex("tv_ppm")))
    assert(r("2024-02-01").getAs[Long]("tv_ppm") == 0L)
    assert(r("2024-02-01").getAs[String]("band") == "stable")
    assert(r("2024-03-01").getAs[Long]("tv_ppm") == 900000L)
    assert(r("2024-03-01").getAs[Long]("max_bin_delta_ppm") == 900000L)
    assert(r("2024-03-01").getAs[String]("band") == "shifted")
    assert(r.values.forall(_.getAs[Long]("n_orders") == 20L))
    spark.catalog.clearCache()
  }

  test("q277 item-CF neighbors match a hand-computed cosine fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("itemcf").toString
    // baskets: o1{1,2} o2{1,2} o3{1,3} o4{2,3} o5{1,2,3}
    // c1=4 c2=4 c3=3; pairs (1,2)=3 (1,3)=2 (2,3)=2
    // cos(1,2) = 3/√16 = 0.75 exactly → 750000
    // cos(1,3) = cos(2,3) = 2/√12 → 2e9 div isqrt(12e6 = 3464²+704) =
    //   2e9 div 3464 = 577367
    Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 3L),
      (4L, 2L), (4L, 3L), (5L, 1L), (5L, 2L), (5L, 3L))
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = ops.CommerceOps.q277ItemCf(spark, dir).collect()
      .map(x => (x.getAs[Long]("item"), x.getAs[Long]("rank")) -> x).toMap
    assert(r.size == 6) // 3 head items × 2 neighbors each
    assert(r((1L, 1L)).getAs[Long]("nbr") == 2L)
    assert(r((1L, 1L)).getAs[Long]("cos_ppm") == 750000L)
    assert(r((1L, 2L)).getAs[Long]("nbr") == 3L)
    assert(r((1L, 2L)).getAs[Long]("cos_ppm") == 577367L)
    assert(r((2L, 1L)).getAs[Long]("nbr") == 1L)
    assert(r((2L, 1L)).getAs[Long]("cos_ppm") == 750000L)
    // item 3's two neighbors tie on cos AND c_pair → nbr asc decides
    assert(r((3L, 1L)).getAs[Long]("nbr") == 1L)
    assert(r((3L, 2L)).getAs[Long]("nbr") == 2L)
    assert(r.values.forall(_.getAs[Long]("cos_ppm") <= 1000000L))
    spark.catalog.clearCache()
  }

  test("q277 cosine never exceeds 1e6 ppm and neighbor lists are bounded on the fixture") {
    val rows = ops.CommerceOps.q277ItemCf(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("cos_ppm") <= 1000000L))
    assert(rows.forall(_.getAs[Long]("rank") <= ops.CommerceOps.CfTopK))
    val perItem = rows.groupBy(_.getAs[Long]("item"))
    assert(perItem.size <= ops.CommerceOps.CfHeadItems)
    perItem.values.foreach { ns =>
      // ranks are 1..k dense and cosine is non-increasing in rank
      val sorted = ns.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length).toSeq)
      val cs = sorted.map(_.getAs[Long]("cos_ppm"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    spark.catalog.clearCache()
  }

  test("q279 classes match a planted steady-A / erratic-B fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("abcxyz").toString
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-0$m%01d-15 00:00:00")
    // horizon = 4 months. part 1: qty 10 every month (cv = 0 → X) and
    // 90% of revenue (→ A). part 2: qty 40 in month 1 only (zeros
    // elsewhere → cv = √(4·1600 − 1600)/40 = √4800/40 ≈ 1.73 → Z) and
    // 10% of revenue (cum−rev = 90% ≥ 80%, < 95% → B).
    val rows =
      (1 to 4).map(m => (1L, 10.0, 2250.0, 0.0, ts(m))) ++
        Seq((2L, 40.0, 1000.0, 0.0, ts(1)))
    rows.toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount",
      "l_shipdate").write.parquet(s"$dir/lineitem.parquet")
    val r = ops.CommerceOps.q279AbcXyz(spark, dir).collect()
      .map(x => (x.getAs[String]("abc"), x.getAs[String]("xyz")) -> x).toMap
    assert(r.keySet == Set(("A", "X"), ("B", "Z")))
    assert(r(("A", "X")).getAs[Long]("n_parts") == 1L)
    assert(r(("A", "X")).getAs[Long]("rev_cents") == 900000L)
    assert(r(("A", "X")).getAs[Long]("rev_share_ppm") == 900000L)
    assert(r(("B", "Z")).getAs[Long]("qty_units") == 40L)
    spark.catalog.clearCache()
  }

  test("q279 cells partition the sold catalog and shares sum to ~1e6") {
    val rows = ops.CommerceOps.q279AbcXyz(spark, sf).collect()
    assert(rows.nonEmpty)
    val nParts = rows.map(_.getAs[Long]("n_parts")).sum
    val sold = Tables.lineitem(spark, sf)
      .select("l_partkey").distinct().count()
    assert(nParts == sold, s"matrix covers $nParts of $sold sold parts")
    val share = rows.map(_.getAs[Long]("rev_share_ppm")).sum
    assert(share >= 1000000L - rows.length && share <= 1000000L)
    spark.catalog.clearCache()
  }

  test("q281 backtest scores a perfectly weekly series as zero snaive error") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("backtest").toString
    // 4 exact weeks of the pattern [5,2,0,3,1,1,1] (day 2 has ZERO
    // orders — exercises the gap-filled spine; a holey frame would
    // lag-7 across non-adjacent weeks). Eval days 7..27 (21 days):
    // snaive is exact (sae 0, bias 0, wape 0, mase 0); naive pays the
    // within-week jumps |5-1|+|2-5|+|0-2|+|3-0|+|1-3| = 14 per week x3.
    val pattern = Seq(5, 2, 0, 3, 1, 1, 1)
    val rows = for {
      day <- 0 until 28
      k <- 0 until pattern(day % 7)
    } yield (day.toLong * 100 + k, java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(day.toLong)
        .atStartOfDay()))
    rows.toDF("o_orderkey", "o_orderdate")
      .write.parquet(s"$dir/orders.parquet")
    val r = ops.CommerceOps.q281ForecastBacktest(spark, dir).collect()
    assert(r.length == 1)
    val m = r.head
    assert(m.getAs[Long]("ym") == 2024L * 12 + 1)
    assert(m.getAs[Long]("n_days") == 21L)
    assert(m.getAs[Long]("actual_orders") == 39L)
    assert(m.getAs[Long]("sae_snaive") == 0L)
    assert(m.getAs[Long]("sae_naive") == 42L)
    assert(m.getAs[Long]("bias_snaive") == 0L)
    assert(m.getAs[Long]("wape_ppm") == 0L)
    assert(m.getAs[Long]("mase_ppm") == 0L)
    spark.catalog.clearCache()
  }

  test("q281 smoke: months cover the horizon and ratios recount") {
    val rows = ops.CommerceOps.q281ForecastBacktest(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { m =>
      val (saeS, saeN, act) = (m.getAs[Long]("sae_snaive"),
        m.getAs[Long]("sae_naive"), m.getAs[Long]("actual_orders"))
      if (act > 0)
        assert(m.getAs[Long]("wape_ppm") ==
          (BigInt(saeS) * 1000000 / BigInt(act)).toLong)
      if (saeN > 0)
        assert(m.getAs[Long]("mase_ppm") ==
          (BigInt(saeS) * 1000000 / BigInt(saeN)).toLong)
      assert(m.getAs[Long]("bias_snaive").abs <= saeS)
    }
    spark.catalog.clearCache()
  }

  test("q286 price index pins a planted 50% uniform price rise") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pidx").toString
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-0$m%01d-15 00:00:00")
    // base month: p1 10u @ $10/u, p2 5u @ $10/u; Feb: both at $15/u
    // with shifted volumes (p1 20u, p2 2u) → L = 22500/15000 = 1.5,
    // P = 33000/22000 = 1.5, Fisher = 1.5 exactly
    val rows = Seq(
      (1L, 10.0, 100.0, ts(1)), (2L, 5.0, 50.0, ts(1)),
      (1L, 20.0, 300.0, ts(2)), (2L, 2.0, 30.0, ts(2)))
    rows.toDF("l_partkey", "l_quantity", "l_extendedprice", "l_shipdate")
      .withColumn("l_discount", lit(0.0))
      .write.parquet(s"$dir/lineitem.parquet")
    val r = ops.CommerceOps.q286PriceIndex(spark, dir).collect()
    assert(r.length == 1)
    val m = r.head
    assert(m.getAs[Long]("ym") == 2024L * 12 + 1)
    assert(m.getAs[Long]("n_matched_parts") == 2L)
    assert(m.getAs[Long]("laspeyres_ppm") == 1500000L)
    assert(m.getAs[Long]("paasche_ppm") == 1500000L)
    assert(m.getAs[Long]("fisher_ppm") == 1500000L)
    spark.catalog.clearCache()
  }

  test("q286 Fisher sits between Paasche and Laspeyres at the smoke SF") {
    val rows = ops.CommerceOps.q286PriceIndex(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { m =>
      val (l, p, f) = (m.getAs[Long]("laspeyres_ppm"),
        m.getAs[Long]("paasche_ppm"), m.getAs[Long]("fisher_ppm"))
      assert(f >= math.min(l, p) - 1 && f <= math.max(l, p) + 1,
        s"fisher $f outside [$p, $l]")
      // fisher² brackets the product to the isqrt correction
      assert((BigInt(f) * f - BigInt(l) * p).abs <= 2 * BigInt(f) + 1)
    }
    spark.catalog.clearCache()
  }

  test("q289 flags a planted mid-horizon silence as a stockout suspect") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stockout").toString
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(day.toLong)
        .atStartOfDay())
    // horizon = days 0..29 (29 horizon days). part 1 sells daily
    // (max_gap 1, 1·30 < 5·29 → clean); part 2 sells days 0..11 then
    // goes silent (trailing gap 18, 18·12 = 216 ≥ 145 → suspect);
    // part 3 has only 5 sale days → below the n≥12 floor, dropped
    val rows =
      (0 until 30).map(i => (1L, ts(i))) ++
        (0 until 12).map(i => (2L, ts(i))) ++
        (0 until 5).map(i => (3L, ts(i * 7)))
    rows.toDF("l_partkey", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = ops.CommerceOps.q289StockoutGaps(spark, dir).collect()
    assert(r.map(_.getAs[Long]("l_partkey")).toSeq == Seq(2L, 1L))
    val p2 = r.head
    assert(p2.getAs[Long]("n_sale_days") == 12L)
    assert(p2.getAs[Long]("max_gap") == 18L)
    assert(p2.getAs[Long]("horizon_days") == 29L)
    assert(p2.getAs[Long]("gap_ratio_ppm") ==
      (BigInt(18) * 12 * 1000000 / 29).toLong)
    assert(p2.getAs[Boolean]("is_suspect"))
    val p1 = r(1)
    assert(p1.getAs[Long]("max_gap") == 1L)
    assert(!p1.getAs[Boolean]("is_suspect"))
    assert(r.forall(_.getAs[Long]("n_suspects") == 1L))
    spark.catalog.clearCache()
  }

  test("q278 KM curve matches a hand-computed censored fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("km").toString
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(day.toLong)
        .atStartOfDay())
    // horizon md = day 30 (c2's last order). Observations:
    //   c1: orders at 0, 10, 30 → events t=10, t=20; censored t=0
    //   c2: order at 0          → censored t=30
    // event day 10: at risk {10,20,30} n=3, d=1 → s = 1e12·2 div 3
    // event day 20: at risk {20,30}    n=2, d=1 → s = s·1 div 2
    val rows = Seq((1L, 10L, ts(0)), (2L, 10L, ts(10)), (3L, 10L, ts(30)),
      (4L, 20L, ts(0)))
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.parquet(s"$dir/orders.parquet")
    val r = ops.CommerceOps.q278KmRepurchase(spark, dir).collect()
    assert(r.map(_.getAs[Long]("t_days")).toSeq == Seq(10L, 20L))
    val byT = r.map(x => x.getAs[Long]("t_days") -> x).toMap
    assert(byT(10L).getAs[Long]("n_risk") == 3L)
    assert(byT(10L).getAs[Long]("d_events") == 1L)
    // 1e12·2 div 3 = 666666666666 → ppm 666666
    assert(byT(10L).getAs[Long]("s_ppm") == 666666L)
    assert(byT(20L).getAs[Long]("n_risk") == 2L)
    // 666666666666·1 div 2 = 333333333333 → ppm 333333
    assert(byT(20L).getAs[Long]("s_ppm") == 333333L)
    spark.catalog.clearCache()
  }

  test("q284 Nelson-Aalen hazard matches the q278 fixture by hand") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("na").toString
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(day.toLong)
        .atStartOfDay())
    // same observations as the q278 fixture: events t=10 (n=3) and
    // t=20 (n=2) → increments 1e12 div 3 and 1e12 div 2; cumulative
    // 333333333333 → 333333 ppm, then 833333333333 → 833333 ppm
    val rows = Seq((1L, 10L, ts(0)), (2L, 10L, ts(10)), (3L, 10L, ts(30)),
      (4L, 20L, ts(0)))
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.parquet(s"$dir/orders.parquet")
    val r = ops.CommerceOps.q284NelsonAalen(spark, dir).collect()
    assert(r.map(_.getAs[Long]("t_days")).toSeq == Seq(10L, 20L))
    val byT = r.map(x => x.getAs[Long]("t_days") -> x).toMap
    assert(byT(10L).getAs[Long]("h_ppm") == 333333L)
    assert(byT(20L).getAs[Long]("h_ppm") == 833333L)
    spark.catalog.clearCache()
  }

  test("q284 hazard is non-decreasing and dominates -ln(KM) pointwise at the smoke SF") {
    val km = ops.CommerceOps.q278KmRepurchase(spark, sf).collect()
      .map(x => x.getAs[Long]("t_days") -> x.getAs[Long]("s_ppm")).toMap
    val na = ops.CommerceOps.q284NelsonAalen(spark, sf).collect()
    assert(na.nonEmpty)
    val hs = na.map(_.getAs[Long]("h_ppm"))
    assert(hs.zip(hs.tail).forall { case (a, b) => a <= b })
    // Nelson-Aalen ≤ −ln(KM) always (AM-GM on the increments); with
    // integer flooring allow 1 ppm slack per step
    na.foreach { x =>
      val t = x.getAs[Long]("t_days")
      val s = km(t)
      if (s > 0) {
        val negLn = -math.log(s.toDouble / 1000000.0) * 1000000.0
        assert(x.getAs[Long]("h_ppm") <= negLn + na.length + 1,
          s"t=$t h=${x.getAs[Long]("h_ppm")} -ln(km)=$negLn")
      }
    }
    spark.catalog.clearCache()
  }

  test("q278 survival is monotone non-increasing from 1e6 and BigInt-exact at the smoke SF") {
    val rows = ops.CommerceOps.q278KmRepurchase(spark, sf).collect()
    assert(rows.nonEmpty)
    val sPpm = rows.map(_.getAs[Long]("s_ppm"))
    assert(sPpm.head <= 1000000L)
    assert(sPpm.zip(sPpm.tail).forall { case (a, b) => a >= b })
    // n_risk strictly decreasing in t; d_events ≤ n_risk
    val ns = rows.map(_.getAs[Long]("n_risk"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a > b })
    assert(rows.forall(x =>
      x.getAs[Long]("d_events") >= 1L &&
        x.getAs[Long]("d_events") <= x.getAs[Long]("n_risk")))
    // recount the floored recurrence in BigInt from (n, d) alone
    var s = BigInt("1000000000000")
    rows.foreach { x =>
      s = s * BigInt(x.getAs[Long]("n_risk") - x.getAs[Long]("d_events")) /
        BigInt(x.getAs[Long]("n_risk"))
      assert(BigInt(x.getAs[Long]("s_ppm")) == s / BigInt(1000000),
        s"t=${x.getAs[Long]("t_days")}")
    }
    spark.catalog.clearCache()
  }
}
