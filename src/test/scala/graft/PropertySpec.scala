package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import ops.Ingest

/** Property-based invariants (SURVEY.md §5.2.3) over generated inputs:
  *  - dedup idempotence f(f(x)) == f(x) — the ON-CONFLICT rerun semantics
  *    of the reference (§3.3);
  *  - cumsum ∘ lag-delta == identity (W4 vs W1);
  *  - rollup level-0 totals == grand total (A3).
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Deterministic stand-in for scalatestplus forAll: fixed-seed samples
    * (the scalatest<->scalacheck bridge artifact is not in the offline
    * cache; raw Gen + explicit seeds keeps runs reproducible anyway). */
  private def forAll[A](g: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val rowGen = for {
    day <- Gen.choose(1, 28)
    state <- Gen.oneOf("WA", "NY", "CA", "TX")
    fips <- Gen.option(Gen.choose(1, 5))
    cases <- Gen.choose(0L, 100000L)
  } yield (Date.valueOf(f"2020-03-$day%02d"), state, fips, cases)

  private val tableGen = Gen.listOfN(60, rowGen)

  test("property: key-dedup is idempotent and keeps one row per key") {
    forAll(tableGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("date", "state", "fips", "cases")
        val keys = Seq("date", "state", "fips")
        val tiebreak = Seq(col("cases").asc)
        val once = Ingest.dedupKeepFirst(df, keys, tiebreak)
        val twice = Ingest.dedupKeepFirst(once, keys, tiebreak)
        assert(once.collect().sortBy(_.toString)
          .sameElements(twice.collect().sortBy(_.toString)))
        // exactly one row per distinct key (nulls collide like the
        // reference's sentinel, SURVEY.md §1.6.3)
        val nKeys = df.select("date", "state", "fips").distinct().count()
        assert(once.count() == nKeys)
      }
    }
  }

  test("property: re-ingest of any subset is a no-op (ON CONFLICT rerun)") {
    forAll(tableGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("date", "state", "fips", "cases")
        val keys = Seq("date", "state", "fips")
        val tiebreak = Seq(col("cases").asc)
        val base = Ingest.dedupKeepFirst(df, keys, tiebreak)
        val again = Ingest.appendIdempotent(base,
          df.limit(rows.length / 2), keys, tiebreak)
        assert(again.count() == base.count())
        assert(again.collect().sortBy(_.toString)
          .sameElements(base.collect().sortBy(_.toString)))
      }
    }
  }

  test("property: running total of lag-deltas reconstructs the cumulative series") {
    val seriesGen = Gen.listOfN(30, Gen.choose(0L, 1000L))
    forAll(seriesGen) { vals =>
      whenever(vals.nonEmpty) {
        val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("t", "cum")
        val w = org.apache.spark.sql.expressions.Window.orderBy("t")
        val deltas = df.withColumn("delta",
          col("cum") - coalesce(lag(col("cum"), 1).over(w), lit(0L)))
        val rebuilt = deltas.withColumn("rebuilt",
          sum(col("delta")).over(w.rowsBetween(Long.MinValue, 0)))
        assert(rebuilt.filter(col("rebuilt") =!= col("cum")).count() == 0)
      }
    }
  }

  test("property: rollup grand total equals direct aggregate") {
    forAll(tableGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("date", "state", "fips", "cases")
        val r = df.rollup(col("state"), col("fips"))
          .agg(sum(col("cases")).as("s"),
            (grouping(col("state")) * 2 + grouping(col("fips"))).as("gid"))
        val grand = r.filter(col("gid") === 3).head().getAs[Long]("s")
        val direct = df.agg(sum(col("cases"))).head().getAs[Long](0)
        assert(grand == direct)
        // level-1 subtotals also sum to the grand total
        val perState = r.filter(col("gid") === 1)
          .agg(sum(col("s"))).head().getAs[Long](0)
        assert(perState == direct)
      }
    }
  }

  private val docGen = for {
    id <- Gen.choose(0L, 5000L)
    nWords <- Gen.choose(1, 40)
    words <- Gen.listOfN(nWords,
      Gen.oneOf("spark", "data", "query", "fast", "table", "join"))
  } yield (id, words.mkString(" "))

  private val corpusGen = Gen.listOfN(50, docGen)
    .map(_.distinctBy(_._1)) // doc_id is a key

  test("property: chunk assignment conserves tokens and preserves doc order") {
    forAll(corpusGen, n = 6) { docs =>
      whenever(docs.nonEmpty) {
        val df = docs.toDF("doc_id", "text")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
        val assigned = ops.CurationOps.assignChunks(df, chunkTok = 16)
          .select("doc_id", "n_tok", "start", "chunk_id")
          .collect().sortBy(_.getAs[Long]("doc_id"))
        // starts are the exclusive prefix sum in doc_id order
        var expectStart = 0L
        assigned.foreach { r =>
          assert(r.getAs[Long]("start") == expectStart,
            s"doc ${r.getAs[Long]("doc_id")} start drifted")
          assert(r.getAs[Long]("chunk_id") == expectStart / 16)
          expectStart += r.getAs[Long]("n_tok")
        }
        // conservation: chunks partition the concatenation
        assert(expectStart == docs.map(_._2.split(" ").length.toLong).sum)
      }
    }
  }

  test("property: source-mixing targets never exceed availability and track weights") {
    forAll(Gen.listOfN(10, Gen.choose(5L, 60L)), n = 6) { counts =>
      // synthetic per-source counts -> the integer sizing formula must
      // keep every target within availability and within one floor step
      // of the exact proportional target
      val weights = Seq(4, 6, 8, 10, 12, 10, 10, 14, 14, 12)
      val k = counts.zip(weights).map { case (n, w) => n * 10000 / w }.min
      counts.zip(weights).foreach { case (n, w) =>
        val target = w * k / 10000
        assert(target <= n, "target exceeds availability")
        // within-one-floor-step of the exact rational w * min(n_s/w_s)
        val exact = w.toDouble * counts.zip(weights)
          .map { case (n2, w2) => n2.toDouble / w2 }.min
        assert(target <= exact + 1e-9 && target >= exact - 2,
          s"target $target drifted from exact $exact")
      }
    }
  }

  private val measureGen = for {
    nGroups <- Gen.choose(1, 4)
    rows <- Gen.listOfN(40, for {
      g <- Gen.choose(0, nGroups - 1)
      // narrow value range on purpose: heavy ties + all-equal groups
      v <- Gen.choose(0L, 12L)
    } yield (s"g$g", v))
  } yield rows

  test("property: histogram percentiles == built-in percentile on arbitrary data") {
    // the q56 drop-in contract under shapes lineitem never exercises:
    // singleton groups, all-equal values, group sizes where q·(n−1) has
    // an inexact fractional part — exact double equality required
    forAll(measureGen, n = 6) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("g", "v")
        val qs = Seq(0.25, 0.5, 0.75, 0.9)
        val hist = ops.StatsOps.histPercentiles(df, "g", "v", qs)
          .select(col("g"), col("ps")).collect()
          .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
        val builtin = df.groupBy(col("g"))
          .agg(expr("percentile(v, array(0.25D, 0.5D, 0.75D, 0.9D))")
            .as("ps"))
          .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
        assert(hist == builtin, s"diverged on ${rows.take(10)}…")
      }
    }
  }

  private val posGen = for {
    k <- Gen.choose(2, 9)
    docs <- Gen.listOfN(4, Gen.choose(1L, 3L))
    n <- Gen.choose(1, 40)
    ps <- Gen.listOfN(n, for {
      d <- Gen.oneOf(docs)
      i <- Gen.choose(1L, 60L)
    } yield (d, i))
  } yield (k, ps.distinct)

  test("property: span island-merge == brute-force interval merge") {
    // the q107 kernel on arbitrary position sets (duplicate docs, dense
    // runs, singletons) vs a driver-side reference: sort each doc's
    // coverage intervals [i, i+k-1] and merge overlapping-or-adjacent
    forAll(posGen, n = 8) { case (k, ps) =>
      whenever(ps.nonEmpty) {
        val got = ops.CurationOps
          .mergeSpans(ps.toDF("doc_id", "i"), k)
          .collect()
          .map(r => (r.getLong(0), r.getAs[Long]("span_start"),
            r.getAs[Long]("span_end"), r.getAs[Long]("span_len")))
          .sortBy(t => (t._1, t._2))
        val want = ps.groupBy(_._1).toSeq.flatMap { case (d, dps) =>
          val ivs = dps.map(_._2).sorted.map(i => (i, i + k - 1))
          val merged = ivs.tail.foldLeft(List(ivs.head)) {
            case (acc @ ((s0, e0) :: rest), (s1, e1)) =>
              if (s1 <= e0 + 1) (s0, math.max(e0, e1)) :: rest
              else (s1, e1) :: acc
            case (Nil, iv) => List(iv)
          }.reverse
          merged.map { case (s0, e0) => (d, s0, e0, e0 - s0 + 1) }
        }.sortBy(t => (t._1, t._2))
        assert(got.toSeq == want, s"k=$k ps=${ps.take(12)}…")
      }
    }
  }

  private val essCorpusGen = Gen.listOfN(40, for {
    src <- Gen.oneOf("a", "b", "c")
    chars <- Gen.oneOf(Gen.choose(1L, 80L), Gen.choose(400L, 2000L))
  } yield (src, chars))

  test("property: q186 ESS is in [1, n] and hits 1e6 ppm iff weights are uniform") {
    forAll(essCorpusGen, n = 4) { rows =>
      whenever(rows.nonEmpty) {
        val dir = java.nio.file.Files.createTempDirectory("ess-prop").toString
        rows.zipWithIndex
          .map { case ((s0, c), i) => (i.toLong, "x", "en", s0, c) }
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .write.parquet(s"$dir/documents.parquet")
        val r = ops.StatsOps.q186EffectiveSample(spark, dir).collect()
        val bySrc = rows.groupBy(_._1)
        r.foreach { row =>
          val ws = bySrc(row.getAs[String]("source"))
            .map(x => BigInt(math.min(x._2, 512L)))
          val n = ws.length.toLong
          val (sw, sw2) = (ws.sum, ws.map(w => w * w).sum)
          assert(row.getAs[Long]("ess_docs") >= 1L)
          assert(row.getAs[Long]("ess_docs") <= n)
          assert(BigInt(row.getAs[Long]("ess_ppm")) ==
            sw * sw * 1000000 / (sw2 * n))
          val uniform = ws.distinct.size == 1
          assert((row.getAs[Long]("ess_ppm") == 1000000L) == uniform,
            s"${row.getAs[String]("source")}: $ws")
        }
      }
    }
  }

  private val sweepCorpusGen = Gen.listOfN(25, for {
    src <- Gen.oneOf("train1", "train2", "src9") // src9 = eval
    toks <- Gen.listOfN(18, Gen.oneOf("w0", "w1", "w2", "w3"))
  } yield (src, toks.mkString(" ")))

  test("property: q194 hits/eligibility are non-increasing in n; n=8 matches q71's rule") {
    // tiny vocabulary forces real cross-source gram collisions
    forAll(sweepCorpusGen, n = 4) { rows =>
      whenever(rows.exists(_._1 == "src9") && rows.exists(_._1 != "src9")) {
        val dir = java.nio.file.Files.createTempDirectory("sweep-prop").toString
        rows.zipWithIndex
          .map { case ((s0, t), i) => (i.toLong, t, "en", s0) }
          .toDF("doc_id", "text", "lang", "source")
          .withColumn("n_chars", length(col("text")).cast("long"))
          .write.parquet(s"$dir/documents.parquet")
        val sweep = ops.CurationOps.q194ContaminationSweep(spark, dir)
          .collect().map(r => r.getAs[Long]("n") -> r).toMap
        // any shared n-gram contains shared (n-1)-grams: monotone
        assert(sweep(4L).getAs[Long]("docs_with_hits") >=
          sweep(8L).getAs[Long]("docs_with_hits"))
        assert(sweep(8L).getAs[Long]("docs_with_hits") >=
          sweep(13L).getAs[Long]("docs_with_hits"))
        assert(sweep(4L).getAs[Long]("eligible") >=
          sweep(8L).getAs[Long]("eligible"))
        assert(sweep(8L).getAs[Long]("eligible") >=
          sweep(13L).getAs[Long]("eligible"))
        val q71 = ops.CurationOps.q71Contamination(spark, dir).collect()
        assert(sweep(8L).getAs[Long]("contaminated_docs") ==
          q71.count(_.getAs[Boolean]("contaminated")).toLong)
      }
    }
  }

  private val docLenGen = for {
    nA <- Gen.choose(2, 12)
    nB <- Gen.choose(2, 12)
    lensA <- Gen.listOfN(nA, Gen.choose(1L, 40L))
    lensB <- Gen.listOfN(nB, Gen.choose(1L, 40L))
  } yield (lensA, lensB)

  test("property: q217 AUC is complementary across the two sources and " +
      "z is antisymmetric") {
    forAll(docLenGen, n = 6) { case (lensA, lensB) =>
      val dir = java.nio.file.Files.createTempDirectory("mwu-prop").toString
      val rows = lensA.zipWithIndex.map { case (n, i) =>
        (i.toLong, "x", "en", "srcA", n) } ++
        lensB.zipWithIndex.map { case (n, i) =>
          (100L + i, "x", "en", "srcB", n) }
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val r = ops.StatsOps.q217RankTest(spark, dir).collect()
        .map(x => x.getAs[String]("source") -> x).toMap
      // with exactly two sources, "A vs rest" and "B vs rest" are the
      // same comparison mirrored: AUCs sum to 1e6 (±1 floor-div), z
      // flips sign exactly (same variance, negated numerator)
      val (a, b) = (r("srcA"), r("srcB"))
      assert(math.abs(a.getAs[Long]("auc_ppm") +
        b.getAs[Long]("auc_ppm") - 1000000L) <= 1L, s"$a | $b")
      if (!a.isNullAt(a.fieldIndex("z"))) {
        assert(a.getAs[Double]("z") == -b.getAs[Double]("z"), s"$a | $b")
      }
    }
  }

  private val seriesGen = for {
    n <- Gen.choose(5, 20)
    slope <- Gen.choose(1L, 50L)       // cents/day
    base <- Gen.choose(100L, 5000L)    // cents at day 0
  } yield (n, slope, base)

  test("property: q228 recovers any noiseless linear trend exactly") {
    forAll(seriesGen, n = 6) { case (nDays, slope, base) =>
      val dir = java.nio.file.Files.createTempDirectory("ts-prop").toString
      val d0 = java.time.LocalDate.of(2024, 2, 1)
      (0 until nDays).map { i =>
        (i.toLong, 1L,
          java.sql.Timestamp.valueOf(d0.plusDays(i.toLong).atStartOfDay()),
          (base + slope * i) / 100.0)
      }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .write.parquet(s"$dir/orders.parquet")
      val r = ops.StatsOps.q228TheilSen(spark, dir).head()
      assert(r.getAs[Long]("theil_ppm") == slope * 1000000L, r.toString)
      assert(r.getAs[Long]("ols_ppm") == slope * 1000000L, r.toString)
      assert(r.getAs[Long]("intercept_ppm") ==
        (base - slope * d0.toEpochDay) * 1000000L, r.toString)
      assert(r.getAs[String]("trend_band") == "agrees")
    }
  }
}
