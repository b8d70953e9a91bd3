package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import ops.{DedupOps, SimOps}

/** Guards for the corpus-size-derived blocking parameters (VERDICT r1 #1):
  * the LSH plane count and IVF cell count must GROW with the corpus so
  * candidate generation stays ~linear — a fixed bucket count is O(n²/2^P)
  * and silently degrades at 100×. These tests pin
  *   (a) the integer-exact parameter formulas and their SQL twins,
  *   (b) the bounded-candidates property the formulas exist to provide,
  *   (c) refinement monotonicity (more planes never add candidates),
  *   (d) the pigeonhole-losslessness of the parameterized simhash chunks.
  */
class ScaleParamSpec extends AnyFunSuite {
  import SparkTestSession._

  test("planesFor grows with corpus size and clamps to [4, 24]") {
    assert(SimOps.planesFor(0) == 4)
    assert(SimOps.planesFor(1) == 4)
    assert(SimOps.planesFor(500) == 4)    // sf0.001/sf0.01 corpus
    assert(SimOps.planesFor(512) == 4)
    assert(SimOps.planesFor(513) == 5)
    assert(SimOps.planesFor(2000) == 6)   // sf0.1 corpus
    assert(SimOps.planesFor(16416) == 10)
    assert(SimOps.planesFor(1000000000L) == 24)
    // occupancy contract: 2^P buckets suffice for mean occupancy <= 32
    // (until the clamp kicks in)
    for (n <- Seq(100L, 1000L, 50000L, 3000000L)) {
      val p = SimOps.planesFor(n)
      assert((1L << p) * SimOps.TargetBucketRows >= n,
        s"n=$n planes=$p breaks the occupancy bound")
    }
  }

  test("planesFor matches its SQL twin formula (bit-length of ceil(n/32)-1)") {
    // Spark's bin()/div have the same integer semantics as DuckDB's
    // bin()/'//' for non-negative inputs, so evaluating the twin here
    // pins the formula the oracle runs.
    for (n <- Seq(1L, 31L, 32L, 33L, 500L, 512L, 513L, 2000L, 16416L,
        1000000L, 1000000000L)) {
      val twin = spark.sql(
        s"SELECT least(24, greatest(4, length(bin(($n + 31) div 32 - 1))))")
        .head().getInt(0)
      assert(twin == SimOps.planesFor(n), s"n=$n")
    }
  }

  test("cellsFor is ceil(sqrt(n)) clamped to [16, 2^16], matching its SQL twin") {
    assert(SimOps.cellsFor(0) == 16)
    assert(SimOps.cellsFor(400) == 20)
    assert(SimOps.cellsFor(500) == 23)
    assert(SimOps.cellsFor(2000) == 45)
    assert(SimOps.cellsFor(1000000L) == 1000)
    // the cap binds exactly where sqrt(n) crosses 2^16 — the driver
    // collect and the per-row argmax stay bounded at ANY corpus size
    assert(SimOps.cellsFor(1L << 32) == SimOps.MaxIvfCells)
    assert(SimOps.cellsFor((1L << 32) - (1L << 17)) == 65535L)
    assert(SimOps.cellsFor(100000000000L) == SimOps.MaxIvfCells)
    assert(SimOps.cellsFor(Long.MaxValue) == SimOps.MaxIvfCells)
    for (n <- Seq(1L, 256L, 400L, 500L, 2000L, 999999L, 1000000L,
        (1L << 32) - (1L << 17), 1L << 32, 100000000000L)) {
      val twin = spark.sql(
        s"SELECT least(${SimOps.MaxIvfCells}, " +
          s"greatest(16, cast(ceil(sqrt($n)) as bigint)))")
        .head().getLong(0)
      assert(twin == SimOps.cellsFor(n), s"n=$n")
    }
  }

  test("chunksFor walks the divisor ladder of 60 and matches its SQL twin") {
    // ladder: occupancy target 32 rows/bucket; wider chunks (fewer of
    // them) as the corpus grows, tightening the hd contract by pigeonhole
    assert(DedupOps.chunksFor(0) == 6)
    assert(DedupOps.chunksFor(500) == 6)      // sf0.001/sf0.01 corpus
    assert(DedupOps.chunksFor(5000) == 6)     // sf0.1 corpus
    assert(DedupOps.chunksFor(32L << 10) == 6)      // last 6-chunk n
    assert(DedupOps.chunksFor((32L << 10) + 1) == 5)
    assert(DedupOps.chunksFor(32L << 12) == 5)
    assert(DedupOps.chunksFor((32L << 12) + 1) == 4)
    assert(DedupOps.chunksFor(32L << 15) == 4)
    assert(DedupOps.chunksFor((32L << 15) + 1) == 3)
    assert(DedupOps.chunksFor(32L << 20) == 3)
    assert(DedupOps.chunksFor((32L << 20) + 1) == 2)
    assert(DedupOps.chunksFor(100000000000L) == 2)
    // every rung divides 60, so chunk widths are exact
    for (n <- Seq(0L, 1L, 500L, 40000L, 200000L, 2000000L, 50000000L,
        100000000000L))
      assert(60 % DedupOps.chunksFor(n) == 0)
    // SQL twin (the oracle's params CTE) picks the same rung
    for (n <- Seq(1L, 500L, 5000L, 32L << 10, (32L << 10) + 1,
        32L << 12, (32L << 12) + 1, 32L << 15, (32L << 15) + 1,
        32L << 20, (32L << 20) + 1, 100000000000L)) {
      val twin = spark.sql(
        s"""SELECT CASE WHEN bl <= 10 THEN 6 WHEN bl <= 12 THEN 5
                        WHEN bl <= 15 THEN 4 WHEN bl <= 20 THEN 3 ELSE 2 END
            FROM (SELECT length(bin(($n + 31) div 32 - 1)) AS bl)""")
        .head().getInt(0)
      assert(twin == DedupOps.chunksFor(n), s"n=$n")
    }
  }

  test("LSH candidate pairs stay O(n) at the derived plane count and " +
      "never grow when planes increase") {
    val base = Tables.embeddings(spark, sf)
    val n = base.count()
    val qa = expr(
      "transform(embedding, x -> cast(floor(cast(x as double) * 1e6 + 0.5) as bigint))")
    def candidatePairs(planes: Int): Long =
      base.withColumn("qa", qa)
        .withColumn("bucket", SimOps.bucketExpr(planes))
        .groupBy("bucket").count()
        .agg(sum(col("count") * (col("count") - 1)))
        .head().getLong(0) / 2
    val p = SimOps.planesFor(n)
    val atP = candidatePairs(p)
    assert(atP <= 40 * n,
      s"candidates $atP exceed 40·n (n=$n, planes=$p) — blocking too coarse")
    // bucket(P+2) refines bucket(P): shared prefix bits ⇒ candidate subset
    assert(candidatePairs(p + 2) <= atP)
  }

  test("parameterized simhash chunks keep the pigeonhole contract: " +
      "4 wide chunks find exactly the hd<=3 subset of the 6-chunk pairs") {
    val feat = DedupOps.withSimhash(Tables.documents(spark, sf))
    val six = DedupOps.simhashChunkPairs(feat, nChunks = 6)
      .filter(col("hd") <= 3).collect().map(r => (r.getLong(0), r.getLong(1)))
    val four = DedupOps.simhashChunkPairs(feat, nChunks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(four.toSet == six.toSet,
      "4-chunk blocking missed or invented hd<=3 pairs")
  }

  test("IVF-PQ seed ranges stay disjoint and inside the corpus at every scale") {
    // q80 seeds coarse cells from [0, C) and the residual codebook from
    // [C, C+K): the ranges are disjoint by construction, but both must
    // fit in the corpus — C(n) + K <= n. With C = max(16, ceil(sqrt(n)))
    // this holds for every n >= 33; the fixtures' smallest corpus is 500.
    (Seq(33L, 100L, 500L, 2000L, 1000000L, 10000000000L)).foreach { n =>
      val c = SimOps.cellsFor(n)
      assert(c + SimOps.PqK <= n,
        s"codebook seeds overflow the corpus at n=$n (C=$c)")
      assert(SimOps.PqNq <= c, "queries must be coarse seeds for q79's " +
        "self-retrieval contract")
    }
    // sub-space geometry: the M sub-slices tile the embedding exactly
    assert(SimOps.PqM * SimOps.PqDs == 64)
  }
}
