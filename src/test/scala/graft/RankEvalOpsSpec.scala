package graft

import org.scalatest.funsuite.AnyFunSuite

import ops.RankEvalOps

class RankEvalOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  /** A 64-dim unit basis vector as float array. */
  private def basis(axis: Int, n: Int = 64): Array[Float] =
    Array.tabulate(n)(i => if (i == axis) 1.0f else 0.0f)

  test("q220 fused scores recompute exactly from the component ranks") {
    val rows = RankEvalOps.q220RrfFusion(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rs = if (r.isNullAt(r.fieldIndex("r_sparse"))) 0L
               else 1000000000L / (60L + r.getAs[Long]("r_sparse"))
      val rd = if (r.isNullAt(r.fieldIndex("r_dense"))) 0L
               else 1000000000L / (60L + r.getAs[Long]("r_dense"))
      assert(r.getAs[Long]("rrf_units") == rs + rd, r.toString)
    }
    // per query: at most 10 fused rows, ranks contiguous from 1, units
    // non-increasing in rank
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Long]("fused_rank"))
      assert(sorted.map(_.getAs[Long]("fused_rank")).toSeq ==
        (1L to sorted.length).toSeq)
      assert(sorted.length <= 10)
      val units = sorted.map(_.getAs[Long]("rrf_units"))
      assert(units.zip(units.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q221 nDCG is perfect on a perfectly clustered corpus and degrades to no_relevant") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ndcg").toString
    // label 0: 3 identical e0 vectors; label 1: 10 identical e1 vectors
    // (orthogonal to e0); label 9: one singleton on e2
    val rows =
      (0 to 2).map(i => (i.toLong, basis(0), 0)) ++
      (3 to 12).map(i => (i.toLong, basis(1), 1)) ++
      Seq((13L, basis(2), 9))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val r = RankEvalOps.q221Ndcg(spark, dir).collect()
      .map(x => x.getAs[Long]("q_id") -> x).toMap
    assert(r.size == 14) // every planted vector is an eval query
    // label-0 query: both same-label docs retrieved at ranks 1..2 → nDCG 1
    assert(r(0L).getAs[Long]("n_hits") == 2L)
    assert(r(0L).getAs[Long]("ndcg_ppm") == 1000000L)
    assert(r(0L).getAs[String]("quality_band") == "strong")
    // label-1 query: 9 same-label docs, all retrievable → nDCG 1
    assert(r(3L).getAs[Long]("n_hits") == 9L)
    assert(r(3L).getAs[Long]("ndcg_ppm") == 1000000L)
    // singleton label: no relevant doc exists → NULL nDCG, labeled band
    assert(r(13L).isNullAt(r(13L).fieldIndex("ndcg_ppm")))
    assert(r(13L).getAs[String]("quality_band") == "no_relevant")
  }

  test("q222 hit rates and MRR are exact on the planted cohorts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hitrate").toString
    val rows =
      (0 to 2).map(i => (i.toLong, basis(0), 0)) ++
      (3 to 12).map(i => (i.toLong, basis(1), 1)) ++
      Seq((13L, basis(2), 9))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val r = RankEvalOps.q222HitRates(spark, dir).collect()
      .map(x => x.getAs[Int]("q_label") -> x).toMap
    // clustered cohorts: every query's rank-1 neighbor shares its label
    for (l <- Seq(0, 1)) {
      assert(r(l).getAs[Long]("hit1_ppm") == 1000000L, s"label $l")
      assert(r(l).getAs[Long]("mrr_ppm") == 1000000L, s"label $l")
    }
    assert(r(0).getAs[Long]("n_queries") == 3L)
    assert(r(1).getAs[Long]("n_queries") == 10L)
    // the singleton cohort can never hit
    assert(r(9).getAs[Long]("hit10_ppm") == 0L)
    assert(r(9).getAs[Long]("mrr_ppm") == 0L)
  }

  test("q223 flags an all-duplicate result list and an orthogonal one") {
    import spark.implicits._
    val dupDir = java.nio.file.Files.createTempDirectory("ild-dup").toString
    // 10 identical vectors: every query's 9 results are clones of each
    // other → 36 pairs, every pairwise cosine exactly 1
    (0 to 9).map(i => (i.toLong, basis(0), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dupDir/embeddings.parquet")
    val dup = RankEvalOps.q223ListDiversity(spark, dupDir).collect()
    assert(dup.length == 10)
    dup.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == 36L)
      assert(r.getAs[Long]("mean_pair_cos_units") == 1000000L)
      assert(r.getAs[String]("redundancy_band") == "near_duplicate")
    }
    val ortDir = java.nio.file.Files.createTempDirectory("ild-ort").toString
    // 4 mutually orthogonal vectors: every pairwise cosine exactly 0
    (0 to 3).map(i => (i.toLong, basis(i), i))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$ortDir/embeddings.parquet")
    val ort = RankEvalOps.q223ListDiversity(spark, ortDir).collect()
    ort.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == 3L)
      assert(r.getAs[Long]("mean_pair_cos_units") == 0L)
      assert(r.getAs[String]("redundancy_band") == "diverse")
    }
  }

  test("q263 exposure ledger: fixed slot totals, monotone coverage, exact HHI") {
    val r = ops.RankEvalOps.q263ExposureBias(spark, sf).collect()
      .map(x => x.getAs[Long]("k") -> x).toMap
    assert(r.keySet == Set(1L, 5L, 10L))
    // 100 eval queries × k slots, always fully filled on this corpus
    Seq(1L, 5L, 10L).foreach { k =>
      assert(r(k).getAs[Long]("total_slots") == 100L * k, s"k=$k")
      assert(r(k).getAs[Long]("coverage_ppm") <= 1000000L)
      // HHI is bounded below by the uniform distribution over exposed docs
      assert(r(k).getAs[Long]("hhi_ppm") >=
        1000000L / r(k).getAs[Long]("n_exposed") - 1, s"k=$k")
      assert(r(k).getAs[Long]("top_doc_share_ppm") >=
        1000000L / r(k).getAs[Long]("total_slots") - 1, s"k=$k")
    }
    assert(r(1L).getAs[Long]("n_exposed") <= r(5L).getAs[Long]("n_exposed"))
    assert(r(5L).getAs[Long]("n_exposed") <= r(10L).getAs[Long]("n_exposed"))
    spark.catalog.clearCache()
  }

}
