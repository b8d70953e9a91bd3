package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import ops.ExtOps

class ExtOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("as-of join: one row per purchase; quote never after the purchase") {
    val a = ExtOps.q41AsofJoin(spark, sf)
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(a.count() == purchases)
    assert(a.filter(col("quote_ts") > col("ts")).count() == 0)
    // a purchase with any prior click must have a non-null quote
    assert(a.filter(col("quote_ts").isNull).count() < purchases)
  }

  test("approx distinct: query contract column is all-true and the raw " +
      "sketch sits within ~2 rsd of exact") {
    val r = ExtOps.q42ApproxDistinct(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getAs[Boolean]("approx_within_5pct"),
      s"HLL drifted past 5% for ${row.getAs[String]("event_type")}"))
    // the ±2% rsd claim on the raw estimate (the query only exposes the
    // 5% contract boolean; this pins the tighter bound on the sketch)
    val raw = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("a"),
        countDistinct(col("user_id")).as("e"))
      .collect()
    raw.foreach { row =>
      val (a, e) = (row.getAs[Long]("a").toDouble, row.getAs[Long]("e").toDouble)
      assert(math.abs(a - e) / e <= 0.04, s"approx $a vs exact $e")
    }
  }

  test("map explode totals match the scalar json extraction (q18 cross-check)") {
    val m = ExtOps.q43MapExplode(spark, sf)
    val viaMap = m.agg(sum("n")).head().getLong(0)
    assert(viaMap == Tables.events(spark, sf).count())
  }

  test("range window >= row window equivalent only when one order per day") {
    val r = ExtOps.q44RangeWindow(spark, sf)
    // trailing30 must be at least the order's own contribution
    val bad = r.filter(col("trailing30") <
      ops.Fx.toUnits(col("o_totalprice")) / 100.0 - 1e-9)
    assert(bad.count() == 0)
  }

  test("custom weighted-avg aggregator lies within min/max price per group") {
    val w = ExtOps.q45WeightedAvg(spark, sf)
    val bounds = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
    val bad = w.join(bounds, "l_returnflag")
      .filter(col("wavg_price") < col("lo") - 1 ||
        col("wavg_price") > col("hi") + 1)
    assert(bad.count() == 0)
  }

  test("q106 heap aggregate returns exactly q14's window top-k") {
    // two implementations of one semantic: the mergeable-heap aggregate
    // must reproduce the window idiom's (segment, rank, orderkey) rows
    val heap = ExtOps.q106TopkHeap(spark, sf)
      .select(col("c_mktsegment"), col("rank"), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val window = ops.Relational.q14TopkPerGroup(spark, sf)
      .select(col("c_mktsegment"), col("rn"), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(heap.sameElements(window),
      s"heap=${heap.toSeq} window=${window.toSeq}")
  }

  test("q121 rolling WAU equals a per-day driver recount; bounds hold") {
    val r = ExtOps.q121RollingWau(spark, sf).collect()
      .map(row => row.getDate(0).toLocalDate -> row.getLong(1)).toMap
    val pairs = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().collect()
      .map(row => (row.getLong(0), row.getDate(1).toLocalDate))
    val days = pairs.map(_._2).distinct
    assert(r.keySet == days.toSet)
    days.foreach { d =>
      val expect = pairs.collect {
        case (u, day) if !day.isAfter(d) &&
          !day.isBefore(d.minusDays(6)) => u
      }.distinct.length.toLong
      assert(r(d) == expect, s"day $d: ${r(d)} vs $expect")
      // WAU dominates DAU and never exceeds the global distinct count
      val dau = pairs.collect { case (u, day) if day == d => u }
        .distinct.length
      assert(r(d) >= dau)
    }
    assert(r.values.max <= pairs.map(_._1).distinct.length)
  }

  test("q119 heap sample equals a window-route md5 recount") {
    val r = ExtOps.q119ReservoirSample(spark, sf)
    // dense ranks, never more than 3 per stratum
    val perSrc = r.groupBy(col("source"))
      .agg(count(lit(1)).as("k"), max(col("rank")).as("maxrk"))
    assert(perSrc.filter(col("k") =!= col("maxrk") || col("k") > 3)
      .count() == 0)
    // independent recount: md5/conv builtins + a row_number window —
    // neither the Hash60 expression nor the heap aggregate
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("eh"), col("doc_id"))
    val expect = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        conv(substring(md5(concat(lit("rs:"), col("doc_id").cast("string"))),
          1, 15), 16, 10).cast("long").as("eh"))
      .withColumn("erk", row_number().over(w).cast("long"))
      .filter(col("erk") <= 3)
    val bad = r.join(expect, Seq("source", "doc_id"), "full")
      .filter(col("rank") =!= col("erk") || col("h") =!= col("eh") ||
        col("rank").isNull || col("erk").isNull)
    assert(bad.count() == 0)
  }

  test("q168 burst detect: brute hourly trailing-window recount") {
    val evts = Tables.events(spark, sf).select("event_type", "ts")
      .collect().map { r =>
        (r.getString(0),
          Math.floorDiv(r.getTimestamp(1).getTime / 1000L, 3600L))
      }
    val hourly = evts.groupBy(identity).map { case ((t, h), xs) =>
      (t, h) -> xs.length.toLong
    }
    val rows = ExtOps.q168BurstDetect(spark, sf).collect()
    assert(rows.length == hourly.size)
    val firstHn = evts.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map(_._2).min
    }
    rows.foreach { r =>
      val (t, hn) = (r.getAs[String]("event_type"), r.getAs[Long]("hn"))
      val trail = (hn - 24 to hn - 1)
        .map(h => hourly.getOrElse((t, h), 0L)).sum
      assert(r.getAs[Long]("n_events") == hourly((t, hn)), s"$t/$hn")
      assert(r.getAs[Long]("trailing_24h") == trail, s"$t/$hn")
      if (trail > 0)
        assert(r.getAs[Long]("ratio_ppm") ==
          hourly((t, hn)) * 24L * 1000000L / trail, s"$t/$hn")
      else assert(r.isNullAt(r.fieldIndex("ratio_ppm")), s"$t/$hn")
      val band =
        if (hn - firstHn(t) < 24) "warmup"
        else if (trail == 0) "cold_start"
        else {
          val ppm = hourly((t, hn)) * 24L * 1000000L / trail
          if (ppm >= 3000000L) "burst"
          else if (ppm >= 1500000L) "elevated" else "normal"
        }
      assert(r.getAs[String]("band") == band, s"$t/$hn")
    }
    // the fixture spans 30 days: warmup covers only the first day
    assert(rows.count(_.getAs[String]("band") == "warmup") < rows.length / 4)
  }

  test("q170 transition matrix: brute recount from per-user ordered streams") {
    val evts = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    val trans = evts.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ordered = xs.sortBy(x => (x._2, x._3)).map(_._4).toSeq
      ("<start>" +: ordered.dropRight(1)).zip(ordered)
    }
    val counts = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rowTotals = trans.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val rows = ExtOps.q170EventTransitions(spark, sf).collect()
    assert(rows.length == counts.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("prev_type"), r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_trans") == counts(k), s"$k")
      val ppm = (BigInt(counts(k)) * 1000000 / BigInt(rowTotals(k._1))).toLong
      assert(r.getAs[Long]("p_next_ppm") == ppm, s"$k")
    }
    // the <start> row total IS the user count (one stream entry each)
    assert(rowTotals("<start>") == evts.map(_._1).distinct.length)
    // each matrix row's floor-div probabilities sum to ≤ 1e6 and within
    // |row| of it (the floor property)
    rows.groupBy(_.getAs[String]("prev_type")).foreach { case (pt, rs) =>
      val s = rs.map(_.getAs[Long]("p_next_ppm")).sum
      assert(s <= 1000000L && s > 1000000L - rs.length, s"$pt sums to $s")
    }
  }

  test("q170 tie-breaks simultaneous events by event_id in both engines' order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("trans").toString
    val t0 = new java.sql.Timestamp(1700000000000L)
    val t1 = new java.sql.Timestamp(1700000001000L)
    // user 1: click(id=2) and view(id=1) share t0, then purchase at t1
    //   → <start>→view, view→click, click→purchase
    // user 2: a single view → <start>→view only
    Seq((2L, t0, 1L, "click", 1.0, "{}"), (1L, t0, 1L, "view", 1.0, "{}"),
      (3L, t1, 1L, "purchase", 1.0, "{}"), (4L, t0, 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val m = ExtOps.q170EventTransitions(spark, dir).collect()
      .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("event_type"))
        -> r.getAs[Long]("n_trans")).toMap
    assert(m == Map(("<start>", "view") -> 2L, ("view", "click") -> 1L,
      ("click", "purchase") -> 1L))
  }

  test("q172 gap spectrum: brute recount of per-user arrival gaps") {
    def micros(t: java.sql.Timestamp) = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val evts = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), micros(r.getTimestamp(1)), r.getLong(2),
        r.getString(3)))
    val gaps = evts.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ordered = xs.sortBy(x => (x._2, x._3))
      ordered.sliding(2).collect { case Array(a, b) =>
        (b._4, (b._2 - a._2) / 1000000L)
      }
    }
    val byCell = gaps.groupBy { case (t, g) =>
      (t, if (g == 0L) -1 else g.toString.length - 1)
    }
    val byType = gaps.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val rows = ExtOps.q172GapSpectrum(spark, sf).collect()
    assert(rows.length == byCell.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[Int]("band"))
      val cell = byCell(k).map(_._2)
      assert(r.getAs[Long]("n_gaps") == cell.length.toLong, s"$k")
      assert(r.getAs[Long]("min_gap_s") == cell.min, s"$k")
      assert(r.getAs[Long]("max_gap_s") == cell.max, s"$k")
      assert(r.getAs[Long]("gap_ppm") ==
        (BigInt(cell.length) * 1000000 / byType(k._1)).toLong, s"$k")
      assert(r.getAs[Long]("band_lo") ==
        (if (k._2 == -1) 0L else math.pow(10, k._2).toLong), s"$k")
    }
  }

  test("q172 routes a simultaneous burst to band -1, not the 1-9s decade") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gaps").toString
    def t(us: Long) = {
      val ts = new java.sql.Timestamp(us / 1000L)
      ts.setNanos((us % 1000000L).toInt * 1000)
      ts
    }
    val base = 1700000000000000L // epoch micros
    // user 1: double-fire at base (gap 0), then +5 s (band 0), +500 s
    // (band 2); the 999999-us gap truncates to 0 s → band -1 too
    Seq((1L, t(base), 1L, "click", 1.0, "{}"),
      (2L, t(base), 1L, "click", 1.0, "{}"),
      (3L, t(base + 999999L), 1L, "click", 1.0, "{}"),
      (4L, t(base + 5999999L), 1L, "click", 1.0, "{}"),
      (5L, t(base + 505999999L), 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val m = ExtOps.q172GapSpectrum(spark, dir).collect()
      .map(r => r.getAs[Int]("band") ->
        (r.getAs[Long]("n_gaps"), r.getAs[Long]("band_lo"))).toMap
    assert(m == Map(-1 -> (2L, 0L), 0 -> (1L, 1L), 2 -> (1L, 100L)))
  }

  test("q173 user rates: brute recount of per-user mean-gap bands") {
    def micros(t: java.sql.Timestamp) = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val users = Tables.events(spark, sf).select("user_id", "ts").collect()
      .map(r => (r.getLong(0), micros(r.getTimestamp(1))))
      .groupBy(_._1).toSeq.map { case (_, xs) =>
        // .toSeq BEFORE the map: mapping the Map to (n, gap) tuples
        // would rebuild a Map keyed by n and collapse same-count users
        val ts = xs.map(_._2)
        val n = ts.length.toLong
        val gap = if (n == 1) None
          else Some(((ts.max - ts.min) / 1000000L) / (n - 1))
        (n, gap)
      }
    val byBand = users.groupBy { case (_, gap) => gap match {
      case None => -2
      case Some(0L) => -1
      case Some(g) => g.toString.length - 1
    }}
    val nTotal = users.length.toLong
    val rows = ExtOps.q173UserRates(spark, sf).collect()
    assert(rows.length == byBand.size)
    rows.foreach { r =>
      val b = r.getAs[Int]("band")
      val cell = byBand(b)
      assert(r.getAs[Long]("n_users") == cell.length.toLong, s"band $b")
      assert(r.getAs[Long]("n_events") == cell.map(_._1).sum, s"band $b")
      assert(r.getAs[Long]("user_ppm") ==
        (BigInt(cell.length) * 1000000 / nTotal).toLong, s"band $b")
      if (b == -2) assert(r.isNullAt(r.fieldIndex("min_gap_s")), s"band $b")
      else {
        assert(r.getAs[Long]("min_gap_s") == cell.flatMap(_._2).min, s"band $b")
        assert(r.getAs[Long]("max_gap_s") == cell.flatMap(_._2).max, s"band $b")
      }
    }
  }

  test("q173 separates single-event, scripted-burst, and organic users") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rates").toString
    val t0 = 1700000000000000L // epoch micros
    def t(us: Long) = {
      val ts = new java.sql.Timestamp(us / 1000L)
      ts.setNanos((us % 1000000L).toInt * 1000)
      ts
    }
    // user 1: one event → band -2; user 2: 3 events in one second →
    // band -1; user 3: mean gap 5 s → band 0 (superhuman); user 4:
    // mean gap 300 s → band 2 (organic)
    val evts =
      Seq((1L, 1L, t0)) ++
      (0 until 3).map(i => (10L + i, 2L, t0 + i * 300000L)) ++
      (0 until 5).map(i => (20L + i, 3L, t0 + i * 5000000L)) ++
      (0 until 4).map(i => (30L + i, 4L, t0 + i * 300000000L))
    evts.map { case (eid, uid, us) => (eid, t(us), uid, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val m = ExtOps.q173UserRates(spark, dir).collect()
      .map(r => r.getAs[Int]("band") ->
        (r.getAs[Long]("n_users"), r.getAs[String]("screen"))).toMap
    assert(m == Map(-2 -> (1L, "single_event"), -1 -> (1L, "superhuman"),
      0 -> (1L, "superhuman"), 2 -> (1L, "organic")))
  }

  test("q176 diurnal heatmap: brute recount of UTC dow/hour cells and peaks") {
    val evts = Tables.events(spark, sf).select("event_type", "ts").collect()
      .map { r =>
        val z = r.getTimestamp(1).toInstant
          .atZone(java.time.ZoneOffset.UTC)
        // Spark dayofweek is 1-based Sunday; java DayOfWeek 1=Mon..7=Sun
        (r.getString(0), z.getDayOfWeek.getValue % 7, z.getHour)
      }
    val cells = evts.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val byType = evts.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val rows = ExtOps.q176DiurnalProfile(spark, sf).collect()
    assert(rows.length == cells.size)
    val peaks = cells.groupBy(_._1._1).map { case (t, cs) =>
      val mx = cs.values.max
      // tie-break: earliest packed (dow, hour) among max cells
      t -> cs.collect { case ((_, d, h), n) if n == mx => d * 24 + h }.min
    }
    rows.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[Int]("dow"),
        r.getAs[Int]("hod"))
      assert(r.getAs[Long]("n_events") == cells(k), s"$k")
      assert(r.getAs[Long]("share_ppm") ==
        (BigInt(cells(k)) * 1000000 / byType(k._1)).toLong, s"$k")
      assert(r.getAs[Boolean]("is_peak") ==
        (k._2 * 24 + k._3 == peaks(k._1)), s"$k")
    }
    // exactly one peak per type
    assert(rows.count(_.getAs[Boolean]("is_peak")) == byType.size)
  }

  test("q180 session stats: brute 30-min-gap sessionization recount") {
    def micros(t: java.sql.Timestamp) = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val sessions = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), micros(r.getTimestamp(1)), r.getLong(2),
        r.getString(3)))
      .groupBy(_._1).toSeq.flatMap { case (_, xs) =>
        val ordered = xs.sortBy(x => (x._2, x._3))
        val sess = scala.collection.mutable.ArrayBuffer
          .empty[scala.collection.mutable.ArrayBuffer[(Long, String)]]
        var prev = Long.MinValue
        ordered.foreach { e =>
          if (prev == Long.MinValue || (e._2 - prev) / 1000000L >= 1800L)
            sess += scala.collection.mutable.ArrayBuffer.empty
          sess.last += ((e._2, e._4))
          prev = e._2
        }
        sess.map(es => (es.head._2, es.length.toLong,
          (es.last._1 - es.head._1) / 1000000L))
      }
    val cells = sessions.groupBy { case (t, n, _) =>
      (t, n.toString.length - 1) }
    val byType = sessions.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val rows = ExtOps.q180SessionStats(spark, sf).collect()
    assert(rows.length == cells.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("entry_type"), r.getAs[Int]("band"))
      val cell = cells(k)
      assert(r.getAs[Long]("n_sessions") == cell.size.toLong, s"$k")
      assert(r.getAs[Long]("event_mass") == cell.map(_._2).sum, s"$k")
      assert(r.getAs[Long]("min_duration_s") == cell.map(_._3).min, s"$k")
      assert(r.getAs[Long]("max_duration_s") == cell.map(_._3).max, s"$k")
      assert(r.getAs[Long]("session_ppm") ==
        (BigInt(cell.size) * 1000000 / byType(k._1)).toLong, s"$k")
    }
    // sessions partition the event stream
    assert(rows.map(_.getAs[Long]("event_mass")).sum ==
      Tables.events(spark, sf).count())
  }

  test("q180 splits sessions exactly at the 30-minute boundary, not before") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sess").toString
    val t0 = 1700000000000000L
    def t(us: Long) = {
      val ts = new java.sql.Timestamp(us / 1000L)
      ts.setNanos((us % 1000000L).toInt * 1000)
      ts
    }
    // user 1: entry view, +1799s click (same session), +1800s purchase
    // (NEW session) → sessions (view, 2 events) and (purchase, 1 event)
    Seq((1L, t(t0), 1L, "view", 1.0, "{}"),
      (2L, t(t0 + 1799L * 1000000L), 1L, "click", 1.0, "{}"),
      (3L, t(t0 + 3599L * 1000000L), 1L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val m = ExtOps.q180SessionStats(spark, dir).collect()
      .map(r => r.getAs[String]("entry_type") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("event_mass"),
          r.getAs[Long]("max_duration_s"))).toMap
    assert(m == Map("view" -> (1L, 2L, 1799L), "purchase" -> (1L, 1L, 0L)))
  }

  test("q181 conversion lag: brute recount off the as-of result") {
    def micros(t: java.sql.Timestamp) = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val lags = ExtOps.q41AsofJoin(spark, sf)
      .select("ts", "quote_ts").collect()
      .map { r =>
        if (r.isNullAt(1)) None
        else Some((micros(r.getTimestamp(0)) - micros(r.getTimestamp(1)))
          / 1000000L)
      }
    val byBand = lags.groupBy {
      case None => -2
      case Some(0L) => -1
      case Some(g) => g.toString.length - 1
    }
    val total = lags.length.toLong
    val rows = ExtOps.q181ConversionLag(spark, sf).collect()
    assert(rows.length == byBand.size)
    rows.foreach { r =>
      val b = r.getAs[Int]("band")
      val cell = byBand(b)
      assert(r.getAs[Long]("n_purchases") == cell.length.toLong, s"band $b")
      assert(r.getAs[Long]("purchase_ppm") ==
        (BigInt(cell.length) * 1000000 / total).toLong, s"band $b")
      if (b == -2) assert(r.isNullAt(r.fieldIndex("min_lag_s")), s"band $b")
      else {
        assert(r.getAs[Long]("min_lag_s") == cell.flatten.min, s"band $b")
        assert(r.getAs[Long]("max_lag_s") == cell.flatten.max, s"band $b")
      }
      val attr = if (b == -2) "no_click" else if (b <= 2) "prompt"
        else "delayed"
      assert(r.getAs[String]("attribution") == attr, s"band $b")
    }
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == total)
  }

  test("q168 flags a planted 10x error spike after a flat baseline") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("burst").toString
    val h0 = 500000L // an arbitrary epoch hour
    def tsAt(hn: Long, i: Int) =
      new java.sql.Timestamp(hn * 3600L * 1000L + i * 1000L)
    // 30 flat hours at 10 events/h, then hour 30 spikes to 100
    val flat = for (h <- 0L until 30L; i <- 0 until 10)
      yield (h * 100 + i, tsAt(h0 + h, i), 1L, "error", 1.0, "{}")
    val spike = (0 until 100)
      .map(i => (9000L + i, tsAt(h0 + 30, i), 1L, "error", 1.0, "{}"))
    (flat ++ spike)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = ExtOps.q168BurstDetect(spark, dir).collect()
      .map(x => x.getAs[Long]("hn") -> x).toMap
    assert(r(h0 + 29).getAs[String]("band") == "normal")
    assert(r(h0 + 30).getAs[String]("band") == "burst")
    assert(r(h0 + 30).getAs[Long]("ratio_ppm") == 10000000L) // exactly 10x
    assert(r(h0).getAs[String]("band") == "warmup")
  }

  test("q208 sketch WAU matches q121's exact answer and stays in bound") {
    val sk = ops.ExtOps.q208SketchWau(spark, sf).collect()
    val exact = ops.ExtOps.q121RollingWau(spark, sf).collect()
      .map(x => x.getAs[java.sql.Date]("t_day") -> x.getAs[Long]("wau"))
      .toMap
    assert(sk.nonEmpty && sk.length == exact.size)
    sk.foreach { x =>
      assert(x.getAs[Long]("wau") ==
        exact(x.getAs[java.sql.Date]("t_day")), s"$x")
      assert(x.getAs[Boolean]("est_within_5pct"), s"sketch out of bound: $x")
    }
    spark.catalog.clearCache()
  }

  test("q210's windowed funnel is monotone and never exceeds q65's unbounded one") {
    val r = ops.ExtOps.q210WindowedFunnel(spark, sf).head()
    val (nv, nc, np) = (r.getAs[Long]("n_view"),
      r.getAs[Long]("n_click_1d"), r.getAs[Long]("n_purchase_7d"))
    assert(nv >= nc && nc >= np, s"funnel not monotone: $nv $nc $np")
    // the time bounds can only LOSE conversions vs the unbounded chain
    val u = ops.ExtOps.q65Funnel(spark, sf).collect()
      .map(x => x.getAs[String]("stage") -> x.getAs[Long]("n_users")).toMap
    assert(nv == u("view"), "stage-1 population must agree with q65")
    assert(nc <= u("click") && np <= u("purchase"),
      s"windowed funnel exceeds the unbounded one: $r vs $u")
  }

  test("q235 retention matrix is exact on planted cohorts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("retmx").toString
    // week arithmetic on epoch weeks: 1970-01-01 is a Thursday; pick
    // day offsets inside one epoch week (di div 7) to keep cohorts clean
    def ev(id: Long, u: Long, epochDay: Long) =
      (id, new java.sql.Timestamp(epochDay * 86400000L), u, "view", 1.0,
        "{}")
    // cohort week 2860: users 1-4 active; users 1,2 also active in week
    // 2861. cohort week 2862: users 10,11.
    val rows = Seq(
      ev(1, 1, 2860 * 7), ev(2, 2, 2860 * 7 + 1), ev(3, 3, 2860 * 7 + 2),
      ev(4, 4, 2860 * 7 + 3), ev(5, 1, 2861 * 7), ev(6, 2, 2861 * 7 + 4),
      ev(7, 10, 2862 * 7), ev(8, 11, 2862 * 7 + 6))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = ExtOps.q235RetentionMatrix(spark, dir).collect()
      .map(x => (x.getAs[Long]("cohort_week"),
        x.getAs[Long]("offset_w")) -> x).toMap
    assert(r.keySet == Set((2860L, 0L), (2860L, 1L), (2862L, 0L)))
    assert(r((2860L, 0L)).getAs[Long]("retention_ppm") == 1000000L)
    assert(r((2860L, 1L)).getAs[Long]("n_active") == 2L)
    assert(r((2860L, 1L)).getAs[Long]("retention_ppm") == 500000L)
    assert(r((2862L, 0L)).getAs[Long]("cohort_users") == 2L)
  }

  test("q236 stickiness warms up then reads the planted ratio exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stick").toString
    def ev(id: Long, u: Long, epochDay: Long) =
      (id, new java.sql.Timestamp(epochDay * 86400000L), u, "view", 1.0,
        "{}")
    // u1 active every day 20000..20034; u2 active only on day 20000
    val rows = (0 to 34).map(i => ev(i.toLong, 1L, 20000L + i)) :+
      ev(100L, 2L, 20000L)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = ExtOps.q236Stickiness(spark, dir).collect()
      .map(x => x.getAs[java.sql.Date]("day").toLocalDate.toEpochDay -> x)
      .toMap
    assert(r.size == 35)
    // day 20026 is inside the warmup window; day 20027 is the first full
    // 28-day window and still sees u2 (active on day 20000) in its MAU
    assert(r(20026L).getAs[String]("band") == "warmup")
    assert(r(20027L).getAs[Long]("dau") == 1L)
    assert(r(20027L).getAs[Long]("mau") == 2L)
    assert(r(20027L).getAs[Long]("stickiness_ppm") == 500000L)
    // day 20028: u2 has aged out of the trailing window
    assert(r(20028L).getAs[Long]("mau") == 1L)
    assert(r(20028L).getAs[Long]("stickiness_ppm") == 1000000L)
    assert(r(20028L).getAs[String]("band") == "daily_habit")
    // day 20000: both users active → dau 2, mau 2
    assert(r(20000L).getAs[Long]("dau") == 2L)
    assert(r(20000L).getAs[Long]("mau") == 2L)
  }

  test("q237 MDE matches the textbook formula on the realized split") {
    val r = ExtOps.q237PowerMde(spark, sf).head()
    val (nc, nt) = (r.getAs[Long]("n_c"), r.getAs[Long]("n_t"))
    if (r.isNullAt(r.fieldIndex("mde_ppm"))) {
      assert(r.getAs[String]("power_band") == "degenerate")
    } else {
      // recompute with the exact pooled rate, not the ppm-rounded one
      val users = Tables.events(spark, sf)
        .select("user_id", "event_type").collect()
        .map(x => (x.getAs[Long]("user_id"), x.getAs[String]("event_type")))
        .groupBy(_._1).toSeq
      val conv = users.count(_._2.exists(_._2 == "purchase")).toLong
      // exact recount of the staged-integer MDE in BigInt
      val nTot = nc + nt
      val g = if (nTot <= 1000000000L) BigInt(1000) else BigInt(1)
      val x = BigInt("7848878512225") * conv * (nTot - conv) * 4 * g * g /
        (BigInt(nTot) * nc * nt)
      def isqrt(v: BigInt): BigInt =
        if (v <= 1) v
        else {
          var s = BigInt(math.sqrt(v.toDouble).toLong)
          while (s * s > v) s -= 1
          while ((s + 1) * (s + 1) <= v) s += 1
          s
        }
      val mde = ((g + isqrt(x)) / (2 * g)).toLong
      assert(r.getAs[Long]("mde_ppm") == mde, r.toString)
      // and the integer form stays within 1 ppm of the textbook tree
      val pExact = conv.toDouble / (nc + nt)
      val mdeText = (1.959964 + 0.841621) *
        math.sqrt(pExact * (1 - pExact) * (1.0 / nc + 1.0 / nt)) * 1e6
      assert(math.abs(mde - mdeText) <= 1.0, s"$mde vs $mdeText")
      val band = if (r.getAs[Long]("lift_abs_ppm") >= mde) "detectable"
                 else "underpowered"
      assert(r.getAs[String]("power_band") == band)
    }
  }

  test("q233 readout matches a brute recount of the hash split") {
    val users = Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[String]("event_type")))
      .groupBy(_._1).toSeq.map { case (u, es) =>
        (ops.DedupOps.h60(s"ab:$u") % 2,
          if (es.exists(_._2 == "purchase")) 1L else 0L)
      }
    val (nc, nt) = (users.count(_._1 == 0).toLong,
      users.count(_._1 == 1).toLong)
    val cc = users.filter(_._1 == 0).map(_._2).sum
    val ct = users.filter(_._1 == 1).map(_._2).sum
    val r = ops.ExtOps.q233AbReadout(spark, sf).head()
    assert(r.getAs[Long]("n_c") == nc && r.getAs[Long]("n_t") == nt)
    assert(r.getAs[Long]("conv_c") == cc && r.getAs[Long]("conv_t") == ct)
    assert(r.getAs[Long]("lift_ppm") ==
      ct * 1000000L / nt - cc * 1000000L / nc)
    if (cc + ct > 0 && cc + ct < nc + nt) {
      // the r13 staged z² is EXACT — recount via the mathematical
      // definition (single BigInt floor-div), not the engine's staging
      val diff = BigInt(ct) * nc - BigInt(cc) * nt
      val z2 = diff * diff * (nc + nt) * 1000000 /
        (BigInt(nc) * nt * (cc + ct) * (nc + nt - cc - ct))
      assert(r.getAs[Long]("z2_ppm") == z2.toLong, r.toString)
      val dir = if (diff > 0) "t_up" else if (diff < 0) "t_down" else "flat"
      assert(r.getAs[String]("direction") == dir)
      // the staged form tracks the textbook z² within flooring slop
      val p = (cc + ct).toDouble / (nc + nt)
      val zb = (ct.toDouble / nt - cc.toDouble / nc) /
        math.sqrt(p * (1 - p) * (1.0 / nc + 1.0 / nt))
      assert(math.abs(z2.toDouble - zb * zb * 1e6) <=
        1e-3 * math.abs(zb * zb * 1e6) + 2.0, s"$z2 vs ${zb * zb * 1e6}")
    } else {
      // all-or-none conversion: pooled variance is 0 — z² must degrade
      // to NULL, never to a NaN/Inf
      assert(r.isNullAt(r.fieldIndex("z2_ppm")), r.toString)
      assert(r.getAs[String]("direction") == "degenerate")
    }
    assert(r.getAs[Long]("srm_ppm") ==
      math.abs(nc - nt) * 1000000L / (nc + nt))
  }

  test("q225 propagation matches a brute integer recount on a planted chain") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("markov").toString
    // u1: A A B · u2: A B B · u3: B A A — mixed starts and transitions
    val seqs = Seq(1L -> Seq("A", "A", "B"), 2L -> Seq("A", "B", "B"),
      3L -> Seq("B", "A", "A"))
    val rows = seqs.flatMap { case (u, ts) =>
      ts.zipWithIndex.map { case (t, i) =>
        (u * 100 + i, java.sql.Timestamp.valueOf(f"2024-05-01 0$i%01d:00:00"),
          u, t, 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    // brute recount with the SAME staged integer floor-divs
    val trans = seqs.flatMap(_._2.sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowTot = trans.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val firsts = seqs.map(_._2.head)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val types = Seq("A", "B")
    val pi0 = types.map(t =>
      t -> firsts.getOrElse(t, 0L) * 1000000L / seqs.length).toMap
    def prop(pi: Map[String, Long]): Map[String, Long] =
      types.map { t =>
        t -> types.map { st =>
          val n = trans.getOrElse((st, t), 0L)
          if (n == 0) 0L else pi(st) * n / rowTot(st)
        }.sum
      }.toMap
    val (pi1, pi2) = { val p1 = prop(pi0); (p1, prop(p1)) }
    val all = seqs.flatMap(_._2)
    val emp = types.map(t =>
      t -> all.count(_ == t).toLong * 1000000L / all.length).toMap
    val r = ops.ExtOps.q225MarkovMixing(spark, dir).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    types.foreach { t =>
      assert(r(t).getAs[Long]("emp_ppm") == emp(t), s"emp $t")
      assert(r(t).getAs[Long]("pi0_ppm") == pi0(t), s"pi0 $t")
      assert(r(t).getAs[Long]("pi1_ppm") == pi1(t), s"pi1 $t")
      assert(r(t).getAs[Long]("pi2_ppm") == pi2(t), s"pi2 $t")
      val band = if (math.abs(pi2(t) - emp(t)) <= math.abs(pi0(t) - emp(t)))
        "mixing" else "diverging"
      assert(r(t).getAs[String]("mixing_band") == band, s"band $t")
    }
  }

  test("q248 session lift and jaccard are exact on planted sessions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lift").toString
    val t0 = 1700000000000L
    def ts(offS: Long) = new java.sql.Timestamp(t0 + offS * 1000L)
    // user 1: {click, purchase} in one session, then {view} after a
    // 10000 s gap (new session); user 2: {click} only
    // sessions N=3; marginals: click 2, purchase 1, view 1
    // pair (click, purchase): c_ab=1, lift = 3·1/(2·1) → 1500000 ppm,
    // jaccard = 1/(2+1−1) → 500000 ppm
    Seq((1L, ts(0), 1L, "click", 1.0, "{}"),
        (2L, ts(60), 1L, "purchase", 1.0, "{}"),
        (3L, ts(10060), 1L, "view", 1.0, "{}"),
        (4L, ts(0), 2L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = ExtOps.q248EventLift(spark, dir).collect()
    assert(r.length == 1)
    val x = r.head
    assert(x.getAs[String]("type_a") == "click")
    assert(x.getAs[String]("type_b") == "purchase")
    assert(x.getAs[Long]("c_ab") == 1L)
    assert(x.getAs[Long]("c_a") == 2L)
    assert(x.getAs[Long]("c_b") == 1L)
    assert(x.getAs[Long]("lift_ppm") == 1500000L)
    assert(x.getAs[Long]("jaccard_ppm") == 500000L)
    spark.catalog.clearCache()
  }

  test("q248 pair support never exceeds either marginal on the fixture") {
    val r = ExtOps.q248EventLift(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Long]("c_ab") <= x.getAs[Long]("c_a"))
      assert(x.getAs[Long]("c_ab") <= x.getAs[Long]("c_b"))
      assert(x.getAs[Long]("jaccard_ppm") <= 1000000L)
    }
    spark.catalog.clearCache()
  }

  test("q251 CUPED readout matches a BigInt brute recount of the planted users") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cuped").toString
    // every user gets one pre event (t0) and one post event (t1):
    // cut = midpoint lands strictly between, so x = pre value, y = post.
    val t0 = new java.sql.Timestamp(1700000000000L)
    val t1 = new java.sql.Timestamp(1700000200000L)
    val rows = (1 to 12).flatMap { u =>
      val x = u.toDouble          // covariate: u dollars pre
      val y = 2.0 * u + (u % 3)   // metric correlated with x
      Seq((u * 2L - 1, t0, u.toLong, "view", x, "{}"),
        (u * 2L, t1, u.toLong, "purchase", y, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = ExtOps.q251CupedReadout(spark, dir).collect().head
    // brute recount: same arms via the registered h60, exact BigInt moments
    graft.expressions.Hash60.register(spark)
    val users = (1 to 12).map { u =>
      val arm = spark.sql(
        s"select h60(concat('ab:', cast(${u}L as string))) % 2")
        .head().getLong(0)
      (arm, BigInt(u * 100), BigInt((2 * u + (u % 3)) * 100))
    }
    val n = BigInt(users.length)
    val (sx, sy) = (users.map(_._2).sum, users.map(_._3).sum)
    val sxy = users.map(t => t._2 * t._3).sum
    val sxx = users.map(t => t._2 * t._2).sum
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    assert(r.getAs[Long]("n_c") + r.getAs[Long]("n_t") == 12L)
    val expTheta =
      if (num >= 0) (num * 1000000 / den).toLong
      else -((-num) * 1000000 / den).toLong
    assert(r.getAs[Long]("theta_micro") == expTheta)
    val c = users.filter(_._1 == 0); val t = users.filter(_._1 == 1)
    val rawLift = t.map(_._3).sum.toDouble / t.length -
      c.map(_._3).sum.toDouble / c.length
    assert(r.getAs[Double]("raw_lift_cents") == rawLift)
    val adj = rawLift - (num.toDouble / den.toDouble) *
      (t.map(_._2).sum.toDouble / t.length -
        c.map(_._2).sum.toDouble / c.length)
    assert(math.abs(r.getAs[Double]("adj_lift_cents") - adj) < 1e-9)
    // x strongly drives y → the covariate must read as useful or better
    assert(Set("useful_covariate", "strong_covariate")
      .contains(r.getAs[String]("covariate_band")))
  }

  test("q251 degrades to NULL theta on a constant covariate, never NaN") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cupedc").toString
    val t0 = new java.sql.Timestamp(1700000000000L)
    val t1 = new java.sql.Timestamp(1700000200000L)
    val rows = (1 to 4).flatMap { u =>
      Seq((u * 2L - 1, t0, u.toLong, "view", 7.0, "{}"),
        (u * 2L, t1, u.toLong, "purchase", u.toDouble, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = ExtOps.q251CupedReadout(spark, dir).collect().head
    assert(r.isNullAt(r.fieldIndex("theta_micro")))
    assert(r.isNullAt(r.fieldIndex("adj_lift_cents")))
    assert(r.isNullAt(r.fieldIndex("var_reduction")))
    assert(r.getAs[String]("covariate_band") == "degenerate")
  }

  test("q260 A/A sweep matches a per-salt brute recount and flags consistently") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("aacal").toString
    val t0 = new java.sql.Timestamp(1700000000000L)
    val rows = (1 to 40).map { u =>
      val typ = if (u % 5 == 0) "purchase" else "view"
      (u.toLong, t0, u.toLong, typ, 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = ExtOps.q260AaCalibration(spark, dir).collect()
    assert(r.length == 16)
    assert(r.map(_.getAs[Long]("salt")).toSeq == (0L to 15L))
    r.foreach { x =>
      assert(x.getAs[Long]("n_c") + x.getAs[Long]("n_t") == 40L)
      val fp = x.getAs[Boolean]("false_positive")
      if (x.isNullAt(x.fieldIndex("z2_ppm"))) assert(!fp)
      else {
        val z2 = x.getAs[Long]("z2_ppm")
        assert(fp == (z2 >= 3841600L))
        // the r13 staged form is EXACT, so the recount is the
        // mathematical definition itself — one BigInt floor-div,
        // independent of the engine's overflow-safe staging
        val (nc, nt) = (BigInt(x.getAs[Long]("n_c")),
          BigInt(x.getAs[Long]("n_t")))
        val (cc, ct) = (BigInt(x.getAs[Long]("conv_c")),
          BigInt(x.getAs[Long]("conv_t")))
        val diff = ct * nc - cc * nt
        val conv = cc + ct
        val exp = diff * diff * (nc + nt) * 1000000 /
          (nc * nt * conv * (nc + nt - conv))
        assert(z2 == exp.toLong)
      }
    }
    // brute recount of salt 7 through the same registered hash
    graft.expressions.Hash60.register(spark)
    val armed = spark.sql(
      "select id + 1 as u, h60(concat('aa7:', cast(id + 1 as string)))" +
        " % 2 as arm from range(40)").collect()
      .map(x => x.getAs[Long]("u") -> x.getAs[Long]("arm")).toMap
    val x7 = r.find(_.getAs[Long]("salt") == 7L).get
    val nT = (1 to 40).count(u => armed(u.toLong) == 1)
    val convT = (1 to 40).count(u => u % 5 == 0 && armed(u.toLong) == 1)
    assert(x7.getAs[Long]("n_t") == nT.toLong)
    assert(x7.getAs[Long]("conv_t") == convT.toLong)
  }

  test("q262 peeking replay matches a brute daily recount and flags early crossings") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("peek").toString
    val d0 = java.time.LocalDate.parse("2024-05-01")
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      d0.plusDays(day.toLong).atStartOfDay())
    // 30 users enter on day u % 3; every second user converts the day
    // after entry — conversions land on days 1..3, entries on 0..2
    var eid = 0L
    val rows = (1 to 30).flatMap { u =>
      eid += 2
      val entry = Seq((eid - 1, ts(u % 3), u.toLong, "view", 1.0, "{}"))
      val conv = if (u % 2 == 0)
        Seq((eid, ts(u % 3 + 1), u.toLong, "purchase", 1.0, "{}"))
      else Nil
      entry ++ conv
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = ExtOps.q262PeekingAudit(spark, dir).collect()
    // brute recount: arms via the registered hash, then per-day cumsums
    graft.expressions.Hash60.register(spark)
    val arm = spark.sql(
      "select id + 1 as u, h60(concat('ab:', cast(id + 1 as string)))" +
        " % 2 as arm from range(30)").collect()
      .map(x => x.getAs[Long]("u") -> x.getAs[Long]("arm")).toMap
    val users = (1 to 30).map { u =>
      (arm(u.toLong), (u % 3).toLong,
        if (u % 2 == 0) Some((u % 3 + 1).toLong) else None)
    }
    val dis = r.map(_.getAs[Long]("di")).sorted
    assert(dis.last == dis.head + 3) // entry days 0-2, conversions to day 3
    r.foreach { x =>
      val d = x.getAs[Long]("di") - d0.toEpochDay
      def cnt(a: Long) = users.count(t => t._1 == a && t._2 <= d).toLong
      def cvt(a: Long) =
        users.count(t => t._1 == a && t._3.exists(_ <= d)).toLong
      assert(x.getAs[Long]("n_c") == cnt(0), s"day $d")
      assert(x.getAs[Long]("n_t") == cnt(1), s"day $d")
      assert(x.getAs[Long]("conv_c") == cvt(0), s"day $d")
      assert(x.getAs[Long]("conv_t") == cvt(1), s"day $d")
      if (x.getAs[Boolean]("is_final"))
        assert(!x.getAs[Boolean]("crossed_early"))
    }
    assert(r.count(_.getAs[Boolean]("is_final")) == 1)
    spark.catalog.clearCache()
  }

  test("q264 separates clumped, uniform, and rare event types exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vmr").toString
    val t0 = new java.sql.Timestamp(1700000000000L)
    var id = 0L
    // 10 users total. 'burst': user 1 fires 20 times (clumped);
    // 'steady': every user fires exactly twice (underdispersed);
    // 'rare': user 2 fires once (9 of 10 users at zero).
    val rows =
      (1 to 20).map { _ => id += 1; (id, t0, 1L, "burst", 1.0, "{}") } ++
      (1 to 10).flatMap { u => (1 to 2).map { _ =>
        id += 1; (id, t0, u.toLong, "steady", 1.0, "{}") } } ++
      Seq { id += 1; (id, t0, 2L, "rare", 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = ExtOps.q264Overdispersion(spark, dir).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    def vmr(counts: Seq[Long]): Long = {
      val u = BigInt(10); val e = BigInt(counts.sum)
      val q2 = counts.map(c => BigInt(c) * c).sum
      ((u * q2 - e * e) * 1000000 / (u * e)).toLong
    }
    assert(r("burst").getAs[Long]("vmr_ppm") == vmr(Seq(20L)))
    assert(r("burst").getAs[String]("band") == "overdispersed")
    assert(r("steady").getAs[Long]("vmr_ppm") ==
      vmr(Seq.fill(10)(2L)))
    assert(r("steady").getAs[String]("band") == "underdispersed")
    assert(r("rare").getAs[Long]("zero_user_ppm") == 900000L)
    assert(r("steady").getAs[Long]("zero_user_ppm") == 0L)
    assert(r("burst").getAs[Long]("mean_milli") == 2000L)
  }

  test("q266 FD audit confirms the key FD and recounts a planted g3 exactly") {
    // invariants on the real fixtures: the key pair is a true FD, and
    // counting identities hold on every declared pair
    val r = ExtOps.q266FdAudit(spark, sf).collect()
      .map(x => x.getAs[String]("fd") -> x).toMap
    assert(r("nation.n_nationkey->n_regionkey").getAs[Boolean]("fd_holds"))
    assert(r("nation.n_nationkey->n_regionkey")
      .getAs[Long]("violation_ppm") == 0L)
    r.values.foreach { x =>
      assert(x.getAs[Long]("n_pairs") >= x.getAs[Long]("n_det"), x.toString)
      assert(x.getAs[Long]("violation_ppm") < 1000000L, x.toString)
    }
    // planted exact g3: region 1 maps to two names (one row must go),
    // region 2 to one — violation = 1 of 3 rows = 333333 ppm
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fdaudit").toString
    Seq((1L, "ALPHA", 1L), (2L, "BETA", 1L), (3L, "GAMMA", 2L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$dir/nation.parquet")
    Seq((1L, "x", 1L, 1.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment").write.parquet(s"$dir/customer.parquet")
    Seq((1L, 1L, "O", 1.0, java.sql.Date.valueOf("2024-01-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority").write.parquet(s"$dir/orders.parquet")
    Seq((1L, "p", "Brand#11", "TYPE A", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice").write.parquet(s"$dir/part.parquet")
    val p = ExtOps.q266FdAudit(spark, dir).collect()
      .map(x => x.getAs[String]("fd") -> x).toMap
    val rn = p("nation.n_regionkey->n_name")
    assert(rn.getAs[Long]("n_rows") == 3L)
    assert(rn.getAs[Long]("n_det") == 2L)
    assert(rn.getAs[Long]("n_pairs") == 3L)
    assert(rn.getAs[Long]("violation_ppm") == 333333L)
    assert(!rn.getAs[Boolean]("fd_holds"))
    assert(p("nation.n_nationkey->n_regionkey").getAs[Boolean]("fd_holds"))
  }

  test("q267 sweep line counts overlap and carries midnight continuations") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("conc").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: one session 10:00–10:10; user 2: point session at 10:05
    //   → day-1 peak 2 at minute 600..605 window; earliest peak = 605
    //     (cum reaches 2 only once user 2 starts)
    // user 3: 23:50 + next-day 00:10 (20-min gap, ONE session) → a
    //   segment on each day; day-2 peak 1 at minute 0 (continuation)
    val rows = Seq(
      (1L, ts("2024-03-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-03-01 10:10:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-03-01 10:05:00"), 2L, "view", 1.0, "{}"),
      (4L, ts("2024-03-01 23:50:00"), 3L, "view", 1.0, "{}"),
      (5L, ts("2024-03-02 00:10:00"), 3L, "view", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = ExtOps.q267PeakConcurrency(spark, dir).collect()
      .map(x => (x.getAs[java.sql.Date]("day").toString,
        x.getAs[Long]("n_segments"), x.getAs[Long]("peak_concurrent"),
        x.getAs[Long]("peak_minute")))
    assert(r.toSeq == Seq(
      ("2024-03-01", 3L, 2L, 605L),
      ("2024-03-02", 1L, 1L, 0L)), r.mkString("; "))
  }
}
