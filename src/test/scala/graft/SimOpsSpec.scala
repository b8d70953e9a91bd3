package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import ops.SimOps

class SimOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("brute-force knn: 3 ranked neighbors per query, cosine in [-1,1], descending") {
    val knn = SimOps.q35KnnBrute(spark, sf).collect()
    assert(knn.length == 30) // 10 queries x 3
    assert(knn.forall(r => math.abs(r.getAs[Double]("cosine")) <= 1.0 + 1e-9))
    knn.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ANN top-1 cosine never exceeds the brute-force top-1 (approx bound)") {
    val brute = SimOps.q35KnnBrute(spark, sf)
      .filter(col("rank") === 1)
      .select(col("q_id").as("vec_id"), col("cosine").as("best_cos"))
    val ann = SimOps.q36AnnLsh(spark, sf)
      .select(col("vec_id"), col("cosine").as("ann_cos"))
    val bad = brute.join(ann, "vec_id")
      .filter(col("ann_cos") > col("best_cos") + 1e-12)
    assert(bad.count() == 0)
  }

  test("cosine near-dup pairs are ordered, above threshold, bucket-consistent") {
    val p = SimOps.q37CosineNeardup(spark, sf)
    assert(p.filter(col("id1") >= col("id2")).count() == 0)
    assert(p.filter(col("cosine") < 0.3).count() == 0)
  }

  test("IVF ANN: every vector assigned a cell; cosine bounded by brute-force top-1") {
    val ivf = SimOps.q47IvfAnn(spark, sf)
    assert(ivf.count() == Tables.embeddings(spark, sf).count())
    val nCells = SimOps.cellsFor(Tables.embeddings(spark, sf).count())
    assert(ivf.filter(col("cell") < 0 || col("cell") >= nCells).count() == 0)
    val brute = SimOps.q35KnnBrute(spark, sf)
      .filter(col("rank") === 1)
      .select(col("q_id").as("vec_id"), col("cosine").as("best_cos"))
    val bad = brute.join(ivf.select(col("vec_id"),
        col("cosine").as("ivf_cos")), "vec_id")
      .filter(col("ivf_cos") > col("best_cos") + 1e-12)
    assert(bad.count() == 0)
  }

  test("label centroids cover all (label, dim) cells; counts sum to corpus size") {
    val c = SimOps.q38LabelCentroids(spark, sf)
    val nLabels = Tables.embeddings(spark, sf)
      .select("label").distinct().count()
    assert(c.count() == nLabels * 64)
    val perLabel = c.filter(col("dim") === 0)
      .agg(sum("n_vecs")).head().getLong(0)
    assert(perLabel == Tables.embeddings(spark, sf).count())
  }

  test("multi-probe ANN dominates single-probe: superset coverage, never-worse neighbors") {
    val single = SimOps.q36AnnLsh(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val multi = SimOps.q68MultiprobeAnn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every vector with a single-probe neighbor keeps one under multi-probe
    assert(single.keySet.subsetOf(multi.keySet),
      s"multi-probe lost coverage: ${single.keySet.diff(multi.keySet)}")
    // and its best candidate can only improve (probe set is a superset)
    single.foreach { case (id, cos) =>
      assert(multi(id) >= cos - 1e-12, s"vec $id: multi ${multi(id)} < single $cos")
    }
  }

  test("Lloyd refinement assigns every vector and does not worsen mean cosine") {
    val n = Tables.embeddings(spark, sf).count()
    def meanCos(iters: Int): Double = {
      val df = SimOps.kmeansCells(spark, sf, iters)
      assert(df.count() == n)                       // total assignment
      assert(df.select("vec_id").distinct().count() == n) // one cell each
      val m = df.agg(avg("cosine")).head().getDouble(0)
      spark.catalog.clearCache()
      m
    }
    val untrained = meanCos(0) // q47's seeded coarse quantizer
    val trained = meanCos(SimOps.KmeansIters)
    assert(trained >= untrained - 1e-9,
      s"training worsened the quantizer: $trained < $untrained")
    // determinism: identical trajectory run-to-run
    val a = SimOps.q61KmeansCells(spark, sf).collect()
    spark.catalog.clearCache()
    val b = SimOps.q61KmeansCells(spark, sf).collect()
    spark.catalog.clearCache()
    assert(a.sameElements(b))
  }

  test("q79 PQ: queries retrieve themselves at distance 0, ADC ranks monotone") {
    val r = SimOps.q79ProductQuantization(spark, sf).collect()
    val byQ = r.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 8)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rk"))
      // queries are seed vectors: their codes are their own cells, so
      // ADC(q, q) is exactly 0 and must rank first
      assert(sorted.head.getAs[Long]("vec_id") == q, s"query $q lost itself")
      assert(sorted.head.getAs[Long]("adc_d2") == 0L)
      val ds = sorted.map(_.getAs[Long]("adc_d2"))
      assert(ds.zip(ds.tail).forall { case (x, y) => x <= y },
        s"ADC distances not monotone for query $q")
    }
  }

  test("q80 IVF-PQ: results come from at most 2 probed cells, ranks dense") {
    val r = SimOps.q80IvfPq(spark, sf).collect()
    spark.catalog.clearCache()
    val byQ = r.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 8)
    byQ.foreach { case (q, rows) =>
      // candidate set is restricted to the probe list
      assert(rows.map(_.getAs[Long]("cell")).distinct.length <= 2,
        s"query $q drew candidates from more than its probed cells")
      val rks = rows.map(_.getAs[Long]("rk")).sorted
      assert(rks.toSeq == (1L to rks.length).toSeq,
        s"ranks not dense for query $q")
      val ds = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("adc_d2"))
      assert(ds.zip(ds.tail).forall { case (x, y) => x <= y })
    }
    // determinism across runs (seeded codebook, total-order ties)
    val b = SimOps.q80IvfPq(spark, sf).collect()
    spark.catalog.clearCache()
    assert(r.sameElements(b))
  }

  test("NearestCell expressions break exact ties to the lowest cell id") {
    import spark.implicits._
    // two IDENTICAL centroids under different ids: every vector ties on
    // distance/cosine, so the winner must always be the LOWER id — the
    // contract the former row_number()/min_by ordering guaranteed and
    // the corpus (distinct centroids) never exercises
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.5f, 0.5f)),
      (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
      .withColumn("nq", expr("aggregate(embedding, 0L, (a, x) -> a +" +
        " cast(floor(cast(x as double) * cast(x as double) * 1e9 + 0.5)" +
        " as bigint))"))
    val cos = vecs.withColumn("m",
      graft.expressions.NearestCellCos.column(col("embedding"), col("nq"),
        Array(7L, 3L), // deliberately unsorted: iteration order ≠ id order
        Array(Array(0.6, 0.6), Array(0.6, 0.6)),
        Array(720000000L, 720000000L)))
      .select(col("vec_id"), col("m.cell")).as[(Long, Long)].collect()
    assert(cos.forall(_._2 == 3L), cos.mkString(","))
    val qa = Seq((1L, Array(1000000L, 0L)), (2L, Array(0L, 1000000L)))
      .toDF("vec_id", "qa")
    val l2 = qa.withColumn("cell",
      graft.expressions.NearestCellL2.column(col("qa"),
        Array(9L, 4L),
        Array(Array(500000L, 500000L), Array(500000L, 500000L))))
      .select(col("vec_id"), col("cell")).as[(Long, Long)].collect()
    assert(l2.forall(_._2 == 4L), l2.mkString(","))
  }

  test("q104: multi-probe dominates single-probe on every recall column") {
    // multi-probe's candidate set is a strict superset (own bucket +
    // hamming-1 probes), so its answered count and its argmax cosine per
    // query can only improve — recall columns must dominate.
    val r = SimOps.q104AnnRecall(spark, sf).collect()
      .map(row => row.getAs[String]("method") -> row).toMap
    val single = r("lsh_single_probe"); val multi = r("lsh_multi_probe")
    assert(multi.getAs[Long]("n_answered") >= single.getAs[Long]("n_answered"))
    assert(multi.getAs[Long]("top1_hits") >= single.getAs[Long]("top1_hits"))
    assert(multi.getAs[Long]("top3_hits") >= single.getAs[Long]("top3_hits"))
    // hits are bounded by answers, answers by the eval-set size — for
    // every index family the harness watches, including IVF
    val ivf = r("ivf_cell")
    Seq(single, multi, ivf).foreach { m =>
      assert(m.getAs[Long]("top3_hits") >= m.getAs[Long]("top1_hits"))
      assert(m.getAs[Long]("n_answered") <= m.getAs[Long]("n_queries"))
    }
    // IVF assigns every vector a cell, so any query sharing its cell
    // with >= 1 other vector answers; with sqrt(n) cells over the eval
    // range that is effectively all of them — pin a non-trivial floor
    assert(ivf.getAs[Long]("n_answered") > 0)
    // the compressed-code families report under the same ground truth:
    // all 5 index families in one harness, PQ answering its 8 ADC
    // queries (each query has >= 1 non-self candidate by construction)
    assert(r.size == 5, s"expected 5 method rows, got ${r.keys.toSeq}")
    val pq = r("pq_adc"); val ivfpq = r("ivf_pq")
    assert(pq.getAs[Long]("n_answered") == 8L)
    Seq(pq, ivfpq).foreach { m =>
      assert(m.getAs[Long]("top3_hits") >= m.getAs[Long]("top1_hits"))
      assert(m.getAs[Long]("n_answered") <= 8L)
      assert(m.getAs[Long]("n_answered") > 0L)
    }
  }

  test("q108: removal set matches an all-builtin recount; anchors survive") {
    val r = SimOps.q108SemDedup(spark, sf)
    assert(r.count() == Tables.embeddings(spark, sf).count())
    // the per-cell (ccos, vec_id)-minimum can never be removed: removers
    // must rank strictly lower, and nothing ranks below the minimum
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))
      .orderBy(col("ccos").asc, col("vec_id").asc)
    assert(r.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1 && !col("keep")).count() == 0)
    // recount removals through built-in HOFs (zip_with/aggregate), not
    // the QuantizedDot codegen expression the query used
    val nqE = "aggregate(embedding, 0L, (acc, x) -> acc +" +
      " cast(floor(cast(x as double) * cast(x as double) * 1e9 + 0.5) as bigint))"
    val emb = Tables.embeddings(spark, sf)
      .withColumn("nq", expr(nqE))
      .select(col("vec_id"), col("embedding"), col("nq"))
    val ass = r.join(emb, "vec_id")
    val a = ass.select(col("cell"), col("vec_id").as("a_id"),
      col("embedding").as("a_emb"), col("nq").as("a_nq"),
      col("ccos").as("a_ccos"))
    val b = ass.select(col("cell"), col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("nq").as("b_nq"),
      col("ccos").as("b_ccos"))
    val removedE = a.join(b, Seq("cell"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("dq", expr("aggregate(zip_with(a_emb, b_emb," +
        " (x, y) -> cast(floor(cast(x as double) * cast(y as double)" +
        " * 1e9 + 0.5) as bigint)), 0L, (acc, t) -> acc + t)"))
      .withColumn("cos",
        col("dq").cast("double") /
          sqrt((col("a_nq") * col("b_nq")).cast("double")))
      .filter(col("cos") >= 0.3 &&
        (col("a_ccos") < col("b_ccos") ||
          (col("a_ccos") === col("b_ccos") && col("a_id") < col("b_id"))))
      .select(col("b_id").as("vec_id")).distinct()
      .withColumn("e_removed", lit(true))
    // keep must be the exact negation of membership in the recount set
    val bad = r.join(removedE, Seq("vec_id"), "left")
      .withColumn("e_rm", coalesce(col("e_removed"), lit(false)))
      .filter(col("keep") === col("e_rm"))
    assert(bad.count() == 0)
  }

  test("q132: fixed-point PR recomputes exactly from the q130 edge dump") {
    val g = SimOps.q130KnnGraph(spark, sf)
      .select(col("vec_id"), col("nbr_id")).persist()
    val r = SimOps.q132GraphRank(spark, sf).persist()
    // teleport floor: no rank ever below 0.15 (fixed point 150000)
    assert(r.filter(col("pr1") < 150000L || col("pr2") < 150000L ||
      col("pr3") < 150000L).count() == 0)
    // independent recount of iteration 1 off the q130 dump
    val deg = g.groupBy("vec_id").agg(count(lit(1)).as("e_out"))
    val inflow = g.join(deg, "vec_id")
      .withColumn("contrib", expr("1000000 div e_out"))
      .groupBy(col("nbr_id").as("vec_id")).agg(sum("contrib").as("inflow"))
    val bad = r.join(inflow, Seq("vec_id"), "left")
      .withColumn("e_pr1",
        lit(150000L) + expr("(coalesce(inflow, 0L) * 85) div 100"))
      .filter(col("pr1") =!= col("e_pr1"))
    assert(bad.count() == 0)
    // out-degree column matches the dump's
    assert(r.join(deg, Seq("vec_id"), "left")
      .filter(col("n_out") =!= coalesce(col("e_out"), lit(0L)))
      .count() == 0)
    g.unpersist(); r.unpersist()
  }

  test("q142: codes saturate at the absmax coordinate; error bounded by am/2") {
    val r = SimOps.q142Int8Quant(spark, sf)
    assert(r.count() == Tables.embeddings(spark, sf).count())
    // int8 range respected
    assert(r.filter(col("code_min") < -127 || col("code_max") > 127)
      .count() == 0)
    // the absmax coordinate maps exactly onto ±127 (symmetric scaling)
    assert(r.filter(col("amax") > 0 &&
      col("code_max") =!= 127 && col("code_min") =!= -127).count() == 0)
    // round-half-up bound: |qa·127 − c·am| ≤ am/2 (am = max(amax, 1))
    assert(r.filter(col("err_max") * 2 > greatest(col("amax"), lit(1L)))
      .count() == 0)
  }

  test("q134: every train vector verdicted; hits are theta-bounded evals") {
    val r = SimOps.q134SemanticDecontam(spark, sf).persist()
    val emb = Tables.embeddings(spark, sf)
    // exactly the non-heldout vectors appear, each once
    assert(r.count() == emb.filter(col("label") =!= 9).count())
    assert(r.select("vec_id").distinct().count() == r.count())
    // flag is exactly nearest-eval presence; cosine clears the gate
    assert(r.filter(col("contaminated") =!= col("near_eval").isNotNull)
      .count() == 0)
    assert(r.filter(col("near_cos").isNotNull && col("near_cos") < 0.3)
      .count() == 0)
    // every reported neighbor really is a held-out (label 9) vector
    val evalIds = emb.filter(col("label") === 9)
      .select(col("vec_id").as("near_eval"))
    assert(r.filter(col("near_eval").isNotNull)
      .join(evalIds, Seq("near_eval"), "left_anti").count() == 0)
    r.unpersist()
  }

  test("q151 flags exactly the planted pathologies: zero vec, ragged dim, norm outliers") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("edge-emb").toString
    val ok = (0 until 20).map(i =>
      (i.toLong, Array.fill(8)(0.5f), 0))           // nq = 8·0.25e9 = 2e9
    val planted = Seq(
      (100L, Array.fill(8)(0.0f), 1),               // zero vector
      (101L, Array.fill(4)(0.5f), 1),               // ragged dim
      (102L, Array.fill(8)(5.0f), 1),               // hi outlier (nq 2e11)
      (103L, Array.fill(8)(0.5f), 1))               // normal companion
    (ok ++ planted).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val r = ops.SimOps.q151EmbeddingHygiene(spark, d).collect()
    val l0 = r.find(_.getAs[Long]("label") == 0L).get
    assert(l0.getAs[Long]("n_zero") == 0L &&
      l0.getAs[Long]("n_hi_outlier") == 0L &&
      l0.getAs[Long]("n_lo_outlier") == 0L &&
      l0.getAs[Long]("dim_min") == 8L && l0.getAs[Long]("dim_max") == 8L)
    val l1 = r.find(_.getAs[Long]("label") == 1L).get
    assert(l1.getAs[Long]("n_zero") == 1L, l1.toString)
    assert(l1.getAs[Long]("dim_min") == 4L && l1.getAs[Long]("dim_max") == 8L)
    // the 5x-norm vector dominates the label mean; it is the only hi
    // outlier and drags everything else under half the mean. The zero
    // vector is NOT among the lo outliers — categories are disjoint
    // (n_zero only), so the two non-zero companions are the lo set.
    assert(l1.getAs[Long]("n_hi_outlier") == 1L, l1.toString)
    assert(l1.getAs[Long]("n_lo_outlier") == 2L, l1.toString)
  }

  test("q130 kNN graph: dense ranks, bounded cos, mutual iff reversed edge") {
    val g = SimOps.q130KnnGraph(spark, sf).persist()
    // ranks are dense 1..deg per vector (deg <= K, short only in small cells)
    val deg = g.groupBy("vec_id")
      .agg(count(lit(1)).as("deg"), max("rank").as("mx"), min("rank").as("mn"))
    assert(deg.filter(col("mx") =!= col("deg") || col("mn") =!= 1L ||
      col("deg") > 5).count() == 0)
    // cosine of unit-ish embeddings stays in [-1 - eps, 1 + eps]
    assert(g.filter(col("cos") < -1.000001 || col("cos") > 1.000001)
      .count() == 0)
    // mutual is exactly "the reversed (nbr -> vec) edge exists"
    val rev = g.select(col("nbr_id").as("vec_id"), col("vec_id").as("nbr_id"))
      .withColumn("e", lit(true))
    val bad = g.join(rev, Seq("vec_id", "nbr_id"), "left")
      .filter(col("mutual") =!= coalesce(col("e"), lit(false)))
    assert(bad.count() == 0)
    g.unpersist()
  }
  test("q171 hubness: brute in-degree recount off the q130 edge dump") {
    val edges = SimOps.q130KnnGraph(spark, sf)
      .select("vec_id", "nbr_id").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id")))
    val nodes = Tables.embeddings(spark, sf).select("vec_id").collect()
      .map(_.getLong(0))
    val inDeg = edges.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val dist = nodes.map(v => inDeg.getOrElse(v, 0L))
      .groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val nTotal = nodes.length.toLong
    val nEdges = edges.length.toLong
    val rows = SimOps.q171Hubness(spark, sf).collect()
    assert(rows.length == dist.size)
    rows.foreach { r =>
      val d = r.getAs[Long]("in_deg")
      assert(r.getAs[Long]("n_vecs") == dist(d), s"in_deg $d")
      assert(r.getAs[Long]("vec_ppm") ==
        (BigInt(dist(d)) * 1000000 / nTotal).toLong, s"in_deg $d")
      assert(r.getAs[Long]("edge_ppm") ==
        (BigInt(d * dist(d)) * 1000000 / nEdges).toLong, s"in_deg $d")
      val band = if (d == 0L) "antihub" else if (d >= 10L) "hub"
        else "balanced"
      assert(r.getAs[String]("band") == band, s"in_deg $d")
    }
    // vector shares partition the node set; edge shares the edge set
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == nTotal)
    assert(rows.map(r => r.getAs[Long]("in_deg") *
      r.getAs[Long]("n_vecs")).sum == nEdges)
  }

  test("q151 hygiene: brute recount of norms, zeros, and outliers per label") {
    val r = SimOps.q151EmbeddingHygiene(spark, sf).collect()
    val vecs = Tables.embeddings(spark, sf)
      .select("label", "embedding").collect()
      .map(x => (x.getInt(0).toLong,
        x.getSeq[Float](1).map(_.toDouble).toArray))
    val byLabel = vecs.groupBy(_._1)
    assert(r.length == byLabel.size)
    r.foreach { row =>
      val lbl = row.getAs[Long]("label")
      val nqs = byLabel(lbl).map { case (_, e) =>
        e.map(x => math.floor(x * x * 1e9 + 0.5).toLong).sum
      }
      val n = nqs.length.toLong
      assert(row.getAs[Long]("n_vecs") == n)
      assert(row.getAs[Long]("dim_min") == 64L)
      assert(row.getAs[Long]("dim_max") == 64L)
      assert(row.getAs[Long]("nq_min") == nqs.min)
      assert(row.getAs[Long]("nq_max") == nqs.max)
      assert(row.getAs[Double]("mean_nq") ==
        nqs.sum.toDouble / n.toDouble)
      assert(row.getAs[Long]("n_zero") == nqs.count(_ == 0L).toLong)
      assert(row.getAs[Long]("n_hi_outlier") ==
        nqs.count(q => q * n > nqs.sum * 2).toLong)
      assert(row.getAs[Long]("n_lo_outlier") ==
        nqs.count(q => q > 0L && q * n * 2 < nqs.sum).toLong)
    }
  }

  test("q165 class separation: brute BigInt Fisher-moment recount") {
    val raw = Tables.embeddings(spark, sf).select("label", "embedding")
      .collect().map { r =>
        val qa = r.getSeq[Float](1)
          .map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray
        (r.getAs[Int]("label").toLong, qa)
      }
    val dim = raw.head._2.length
    val byLab = raw.groupBy(_._1)
    val nTot = BigInt(raw.length)
    val sGlob = Array.tabulate(dim)(d => BigInt(raw.map(_._2(d)).sum))
    val rows = ops.SimOps.q165ClassSeparation(spark, sf).collect()
    spark.catalog.clearCache()
    assert(rows.length == byLab.size)
    rows.foreach { row =>
      val lab = row.getAs[Long]("label")
      val xs = byLab(lab).map(_._2)
      val nL = BigInt(xs.length)
      val sL = Array.tabulate(dim)(d => BigInt(xs.map(_(d)).sum))
      val q2 = xs.map(v => v.map(x => BigInt(x) * x).sum).sum
      val ss2 = sL.map(s => s * s).sum
      val w = nL * q2 - ss2
      val bsc = (0 until dim).map { d =>
        val t = nTot * sL(d) - nL * sGlob(d); t * t
      }.sum
      assert(BigInt(row.getAs[Long]("n_vecs")) == nL, lab.toString)
      assert(BigInt(row.getAs[Long]("within_q2")) == w / (nL * nL))
      assert(BigInt(row.getAs[Long]("between_q2")) ==
        bsc / (nL * nL * nTot * nTot))
      assert(w > 0) // fixture labels are non-degenerate
      val ppm = bsc * 1000000 / (nTot * nTot * w)
      assert(BigInt(row.getAs[Long]("sep_ppm")) == ppm, lab.toString)
      val band = if (ppm >= 1000000) "separated"
        else if (ppm >= 200000) "partial" else "blended"
      assert(row.getAs[String]("sep_band") == band, lab.toString)
    }
  }

  test("q179 confusion: brute nearest-centroid recount with the quantized discipline") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).toArray))
    val cents = vecs.groupBy(_._2).map { case (l, xs) =>
      val sums = Array.tabulate(64)(i => xs.map(v =>
        math.floor(v._3(i).toDouble * 1e6 + 0.5).toLong).sum)
      val cent = sums.map(s => s.toDouble / 1e6 / xs.length)
      val cnq = cent.map(x => math.floor(x * x * 1e9 + 0.5).toLong).sum
      l -> (cent, cnq)
    }
    val conf = vecs.map { case (_, l, e) =>
      val nq = e.map(x =>
        math.floor(x.toDouble * x.toDouble * 1e9 + 0.5).toLong).sum
      var bestCell = Long.MaxValue
      var bestCos = Double.NegativeInfinity
      for ((c, (cent, cnq)) <- cents.toSeq.sortBy(_._1)) {
        val dot = (0 until 64).map(i =>
          math.floor(e(i).toDouble * cent(i) * 1e9 + 0.5).toLong).sum
        val cos = dot.toDouble / math.sqrt((nq * cnq).toDouble)
        if (cos > bestCos || (cos == bestCos && c < bestCell)) {
          bestCos = cos; bestCell = c
        }
      }
      (l, bestCell)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val trueTotals = conf.toSeq.groupBy(_._1._1)
      .map { case (l, xs) => l -> xs.map(_._2).sum }
    val rows = SimOps.q179CentroidConfusion(spark, sf).collect()
    assert(rows.length == conf.size)
    rows.foreach { r =>
      val k = (r.getAs[Long]("label_true"), r.getAs[Long]("label_pred"))
      assert(r.getAs[Long]("n_vecs") == conf(k), s"$k")
      assert(r.getAs[Long]("share_ppm") ==
        (BigInt(conf(k)) * 1000000 / trueTotals(k._1)).toLong, s"$k")
      assert(r.getAs[Boolean]("is_diag") == (k._1 == k._2), s"$k")
    }
  }

  test("q179 planted separated clusters classify perfectly diagonal") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("centroid-conf").toString
    def vec(base: Double, dim: Int): Seq[Float] =
      Seq.tabulate(64)(i => if (i == dim) base.toFloat else 0.0f)
    // labels 0/1 live on orthogonal axes → zero cross-cosine, perfect
    // nearest-centroid recovery
    val rows =
      (1 to 8).map(i => (i.toLong, vec(1.0 + 0.01 * i, 0), 0)) ++
      (1 to 8).map(i => (100L + i, vec(1.0 + 0.01 * i, 7), 1))
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int"))
      .write.parquet(s"$dir/embeddings.parquet")
    val r = SimOps.q179CentroidConfusion(spark, dir).collect()
    spark.catalog.clearCache()
    assert(r.length == 2)
    assert(r.forall(_.getAs[Boolean]("is_diag")))
    assert(r.forall(_.getAs[Long]("share_ppm") == 1000000L))
  }

  test("q182 cell balance: brute recount off the pinned IVF assignment") {
    val occ = SimOps.ivfAssignment(spark, sf).select("cell").collect()
      .map(_.getLong(0))
      .groupBy(identity).map { case (_, v) => v.length.toLong }.toSeq
    val bands = occ.groupBy(c => c.toString.length - 1)
    val cellsTotal = occ.length.toLong
    val nVecs = occ.sum
    val occMax = occ.max
    val rows = SimOps.q182CellBalance(spark, sf).collect()
    assert(rows.length == bands.size)
    rows.foreach { r =>
      val b = r.getAs[Int]("band")
      val cs = bands(b)
      assert(r.getAs[Long]("n_cells") == cs.length.toLong, s"band $b")
      assert(r.getAs[Long]("vec_mass") == cs.sum, s"band $b")
      assert(r.getAs[Long]("min_occ") == cs.min, s"band $b")
      assert(r.getAs[Long]("max_occ") == cs.max, s"band $b")
      assert(r.getAs[Long]("cell_ppm") ==
        (BigInt(cs.length) * 1000000 / cellsTotal).toLong, s"band $b")
      assert(r.getAs[Long]("vec_ppm") ==
        (BigInt(cs.sum) * 1000000 / nVecs).toLong, s"band $b")
      assert(r.getAs[Long]("skew_x100") ==
        (BigInt(occMax) * 100 * cellsTotal / nVecs).toLong, s"band $b")
    }
  }

  test("q182 exposes a planted mega-cell as occupancy skew") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("cell-balance").toString
    def axis(dim: Int, mag: Float): Seq[Float] =
      Seq.tabulate(64)(i => if (i == dim) mag else 0.0f)
    // 20 vectors → 16 seed centroids (vec_id < 16). ids 0-14 all on
    // axis 0: identical cosine to every axis-0 seed → ties collapse to
    // cell 0 (a planted mega-cell). ids 15-19 on axis 7 → cell 15.
    val rows = (0 to 14).map(i => (i.toLong, axis(0, 1.0f + 0.0f * i), 1)) ++
      (15 to 19).map(i => (i.toLong, axis(7, 1.0f), 2))
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int"))
      .write.parquet(s"$dir/embeddings.parquet")
    val r = SimOps.q182CellBalance(spark, dir).collect()
      .map(x => x.getAs[Int]("band") -> x).toMap
    spark.catalog.clearCache()
    // band 1: the 15-vector mega-cell; band 0: the 5-vector cell
    assert(r.keySet == Set(0, 1))
    assert(r(1).getAs[Long]("n_cells") == 1L)
    assert(r(1).getAs[Long]("vec_mass") == 15L)
    assert(r(0).getAs[Long]("vec_mass") == 5L)
    // skew x100 = 15 * 100 * 2 cells / 20 vecs = 150 (max 1.5x mean)
    assert(r(1).getAs[Long]("skew_x100") == 150L)
  }

  test("q165 flags planted separated vs blended classes") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("class-sep").toString
    // q165 carries q38's fixed-dim contract (D = 64): pad to fixture dim
    def vec(base: Double, jitter: Double*): Seq[Float] =
      (Seq(base) ++ jitter ++ Seq.fill(64)(0.0)).take(64).map(_.toFloat)
    // labels 0/1: tight clusters at +/-10 on dim 0 → separated.
    // labels 2/3: wide spread sampled off the SAME zero-mean grids
    // (identical per-dim means by construction) → blended.
    def grid(k: Long): Double = k * 0.3 - 0.6
    val rows =
      (1 to 10).map(i => (i.toLong, vec(10.0, 0.001 * i), 0)) ++
      (1 to 10).map(i => (100L + i, vec(-10.0, 0.001 * i), 1)) ++
      (1 to 10).map(i => (200L + i,
        vec(grid(i % 5), grid((2 * i) % 5)), 2)) ++
      (1 to 10).map(i => (300L + i,
        vec(grid((i + 1) % 5), grid((2 * i + 3) % 5)), 3))
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int"))
      .write.parquet(s"$dir/embeddings.parquet")
    val r = ops.SimOps.q165ClassSeparation(spark, dir).collect()
      .map(x => x.getAs[Long]("label") -> x.getAs[String]("sep_band")).toMap
    spark.catalog.clearCache()
    assert(r(0L) == "separated", r.toString)
    assert(r(1L) == "separated", r.toString)
    assert(r(2L) == "blended", r.toString)
    assert(r(3L) == "blended", r.toString)
  }

  test("q188 agreement ledger matches a brute recount off the q130 edges") {
    val edges = ops.SimOps.q130KnnGraph(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id")))
    val labels = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label").toLong)
      .toMap
    val perVec = edges.groupBy(_._1).toSeq.map { case (v, es) =>
      val agree = es.count(e => labels(e._2) == labels(v)).toLong
      val pct = agree * 100 / es.length
      val band = if (pct >= 80) "consistent"
        else if (pct >= 50) "mixed" else "suspect"
      (labels(v), band, agree, es.length.toLong)
    }
    val cells = perVec.groupBy(t => (t._1, t._2)).map { case (k, xs) =>
      k -> ((xs.size.toLong, xs.map(_._3).sum, xs.map(_._4).sum))
    }
    val labelTotals = perVec.groupBy(_._1)
      .map { case (l, xs) => l -> xs.size.toLong }
    val r = ops.SimOps.q188LabelAgreement(spark, sf).collect()
    assert(r.map(x =>
      (x.getAs[Long]("label"), x.getAs[String]("agree_band"))).toSet ==
      cells.keySet)
    r.foreach { row =>
      val key = (row.getAs[Long]("label"), row.getAs[String]("agree_band"))
      val (nv, ae, te) = cells(key)
      assert(row.getAs[Long]("n_vecs") == nv, key.toString)
      assert(row.getAs[Long]("agree_edges") == ae, key.toString)
      assert(row.getAs[Long]("total_edges") == te, key.toString)
      assert(row.getAs[Long]("label_vecs") == labelTotals(key._1))
      assert(row.getAs[Long]("vec_ppm") ==
        nv * 1000000L / labelTotals(key._1))
    }
  }

  test("q187 margins match a brute top-2 recount with identical quantization") {
    val vecs = Tables.embeddings(spark, sf).collect().map { r =>
      (r.getAs[Long]("vec_id"),
        r.getAs[Seq[Float]]("embedding").toArray)
    }
    def dotq(a: Array[Float], b: Array[Float]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) {
        s += math.floor(a(i).toDouble * b(i).toDouble * 1e9 + 0.5).toLong
        i += 1
      }
      s
    }
    def nq(a: Array[Float]): Long = dotq(a, a)
    val norms = vecs.map { case (id, v) => id -> nq(v) }.toMap
    val r = ops.SimOps.q187MarginAudit(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val qId = row.getAs[Long]("q_id")
      val qv = vecs.find(_._1 == qId).get._2
      val top2 = vecs.filter(_._1 != qId).map { case (cId, cv) =>
        val cos = dotq(qv, cv).toDouble /
          math.sqrt((norms(qId) * norms(cId)).toDouble)
        (cId, cos)
      }.sortBy { case (cId, cos) => (-cos, cId) }.take(2)
      assert(row.getAs[Long]("nn1_id") == top2(0)._1, s"q=$qId")
      assert(row.getAs[Long]("nn2_id") == top2(1)._1, s"q=$qId")
      // exact double equality: both sides are the same IEEE expression
      // over the same integers
      assert(row.getAs[Double]("margin") == top2(0)._2 - top2(1)._2)
      val m = top2(0)._2 - top2(1)._2
      val band = if (m >= 0.05) "separable"
        else if (m >= 0.01) "close" else "ambiguous"
      assert(row.getAs[String]("margin_band") == band, s"q=$qId")
    }
  }

  test("q227 assortativity is a bounded correlation and degrades on a uniform clique") {
    import org.apache.spark.sql.functions.col
    val r = ops.SimOps.q227Assortativity(spark, sf).head()
    // r is a Pearson correlation over edges — bounded, and consistent
    // with its own band thresholds
    val rv = r.getAs[Double]("r")
    assert(rv >= -1.0 && rv <= 1.0, rv)
    val band = if (rv >= 0.1) "assortative"
      else if (rv <= -0.1) "disassortative" else "neutral"
    assert(r.getAs[String]("mix_band") == band)
    // the edge count matches the pinned kNN stage it rides
    val (_, edges) = ops.SimOps.knnEdges(spark, sf)
    assert(r.getAs[Long]("n_edges") == edges.count())
    spark.catalog.clearCache()

    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("assort").toString
    // 10 identical vectors: one cell, all-pairs candidates, ties broken
    // by id — the resulting degree skew (low ids absorb in-degree) is
    // fully deterministic, so r must match a brute recount exactly
    (0 to 9).map(i => (i.toLong,
        Array.tabulate(64)(j => if (j == 0) 1.0f else 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val u = ops.SimOps.q227Assortativity(spark, dir).head()
    val es = ops.SimOps.knnEdges(spark, dir)._2
      .select("vec_id", "nbr_id").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val indeg = es.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val xs = es.map(e => indeg.getOrElse(e._1, 0L))
    val ys = es.map(e => indeg.getOrElse(e._2, 0L))
    val n = es.length.toDouble
    val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
    val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum
    val sxx = xs.map(a => BigInt(a) * a).sum
    val syy = ys.map(a => BigInt(a) * a).sum
    val rb = (n * sxy.toDouble - sx * sy) /
      math.sqrt((n * sxx.toDouble - sx * sx) * (n * syy.toDouble - sy * sy))
    assert(u.getAs[Long]("n_edges") == es.length.toLong)
    assert(math.abs(u.getAs[Double]("r") - rb) < 1e-12, s"$u vs $rb")
    spark.catalog.clearCache()
  }

  test("q243 dim-energy spectrum is exact on planted axis vectors") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dimen").toString
    def vec(d1: Float): Seq[Float] =
      Seq.tabulate(64)(i => if (i == 0) d1 else if (i == 1) 1.0f else 0.0f)
    // dim 1: ±1 (zero mean, full spread); dim 2: constant 1 across every
    // vector (zero variance despite nonzero mass); all other dims zero
    Seq((1L, vec(1.0f), 0), (2L, vec(-1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val r = ops.SimOps.q243DimEnergy(spark, dir).collect()
    assert(r.length == 64)
    assert(r.forall(_.getAs[Long]("n_vecs") == 2L))
    val byDim = r.map(x => x.getAs[Long]("dim") -> x).toMap
    // dim 1: energy = 2·(2·1e12) − 0 = 4e12 → var 4e12/4 = 1e12, share 4/4
    assert(byDim(1L).getAs[Long]("var_q2") == 1000000000000L)
    assert(byDim(1L).getAs[Long]("share_ppm") == 1000000L)
    // dim 2: energy = 2·2e12 − (2e6)² = 0 — a constant dim carries none
    assert(byDim(2L).getAs[Long]("var_q2") == 0L)
    assert(byDim(2L).getAs[Long]("share_ppm") == 0L)
    assert((3L to 64L).forall(i => byDim(i).getAs[Long]("var_q2") == 0L))
  }

  test("q290 drift monitor pins stable prefixes and a planted octile shift") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("edrift").toString
    // 80 vectors (8 exact octiles of 10 by vec_id span): slices 0..6
    // all along e1, slice 7 along e2 — orthogonal. Six adjacent pairs
    // read cos = 1 (clamped ppm) 'stable'; the 6→7 pair reads 0 →
    // 'shifted'
    def vec(dim: Int, x: Float): Seq[Float] =
      Seq.tabulate(64)(i => if (i == dim) x else 0.0f)
    val rows = (0L until 70L).map(i => (i, vec(0, 1.0f), 0)) ++
      (70L until 80L).map(i => (i, vec(1, 1.0f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val r = ops.SimOps.q290EmbeddingDrift(spark, dir).collect()
    assert(r.map(_.getAs[Long]("from_slice")).toSeq == (0L to 6L).toSeq)
    assert(r.forall(x => x.getAs[Long]("n_prev") == 10L &&
      x.getAs[Long]("n_cur") == 10L))
    r.take(6).foreach { x =>
      assert(x.getAs[Long]("cos_ppm") == 1000000L)
      assert(x.getAs[String]("band") == "stable")
    }
    assert(r.last.getAs[Long]("cos_ppm") == 0L)
    assert(r.last.getAs[String]("band") == "shifted")
    spark.catalog.clearCache()
  }

  test("q290 a flipped-sign octile reads cos = -1e6") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("edriftneg").toString
    def vec(x: Float): Seq[Float] =
      Seq.tabulate(64)(i => if (i == 0) x else 0.0f)
    val rows = (0L until 70L).map(i => (i, vec(1.0f), 0)) ++
      (70L until 80L).map(i => (i, vec(-1.0f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val r = ops.SimOps.q290EmbeddingDrift(spark, dir).collect()
    assert(r.last.getAs[Long]("cos_ppm") == -1000000L)
    assert(r.last.getAs[String]("band") == "shifted")
    spark.catalog.clearCache()
  }

  test("q274 power iteration recovers the planted dominant axis exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("powit").toString
    // 10 vectors along e1, 5 half-scale along e2: A = diag(1e13, 1.25e12)
    // in qa² units — e1 dominates and the e2 component decays by a
    // factor 0.125 per round from the all-ones start
    def vec(dim: Int, x: Float): Seq[Float] =
      Seq.tabulate(64)(i => if (i == dim) x else 0.0f)
    val rows = (1L to 10L).map(i => (i, vec(0, 1.0f), 0)) ++
      (11L to 15L).map(i => (i, vec(1, 0.5f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    // exact BigInt recount of the same fixed-round iteration
    val qa = rows.map(_._2.map(x => BigInt(math.floor(x * 1e6 + 0.5).toLong)))
    var v = Array.fill(64)(BigInt(1000000))
    var prev = v
    var mx = BigInt(0)
    for (_ <- 1 to 6) {
      val dots = qa.map(q => q.zip(v).map { case (a, b) => a * b }.sum)
      val w = (0 until 64).map(j =>
        qa.zip(dots).map { case (q, dt) => dt * q(j) }.sum)
      mx = w.map(_.abs).max
      prev = v
      if (mx > 0)
        v = w.map(x => BigInt(x.signum) * (x.abs * 1000000 / mx)).toArray
    }
    val r = ops.SimOps.q274PowerIteration(spark, dir).collect()
      .map(x => x.getAs[Long]("dim") -> x).toMap
    assert(r.size == 64)
    (1 to 64).foreach { j =>
      assert(r(j.toLong).getAs[Long]("v_ppm") == v(j - 1).toLong, s"dim $j")
    }
    assert(r(1L).getAs[Long]("v_ppm") == 1000000L)
    assert((3L to 64L).forall(j => r(j).getAs[Long]("v_ppm") == 0L))
    val drift = v.zip(prev).map { case (a, b) => (a - b).abs }.sum
    assert(r(1L).getAs[Long]("drift_ppm") == drift.toLong)
    assert(r(1L).getAs[Long]("lambda_est") ==
      (mx / BigInt("1000000000000")).toLong)
    assert(r(1L).getAs[Long]("n_vecs") == 15L)
    spark.catalog.clearCache()
  }
}
