package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.expressions.QuantizedDot

/** Retrieval-quality evaluation — the ranking-eval surface a RAG / search
  * pipeline runs over its retrievers before trusting them in production:
  * hybrid sparse+dense fusion (RRF), graded-relevance ranking quality
  * (nDCG@10), hit-rate/MRR cohorts, and result-list redundancy (intra-list
  * similarity). The reference serves ranked reads off its cumulative
  * tables (`NytimesBatchProcessorApplication.kt:146-188` builds the
  * per-key ordered measures); these operators are the evaluation loop the
  * implied retrieval stack (q90 BM25, q35/q36 ANN) needs on top.
  *
  * Scale posture (the adjudicated q35/q104 eval-set discipline): every
  * operator scores a FIXED bounded query prefix broadcast against ONE
  * corpus scan; all downstream state is |queries|·k rows. Rank math is
  * exact-integer (reciprocal ranks and log-discounts quantized to fixed
  * integer units via literals shared verbatim with the oracle), so sums
  * are order-independent BIGINTs and every output double is one IEEE op
  * on identical integers in both engines.
  */
object RankEvalOps {

  /** RRF smoothing constant (Cormack et al.'s k=60 default). */
  private val RrfK = 60L

  /** nDCG@10 discount table: floor(1e6 / log2(r+1) + 0.5) for r = 1..10,
    * precomputed ONCE here and embedded as integer literals in BOTH
    * engines' queries — engine log2 implementations are not guaranteed
    * to round identically in the last ulp, so the log never runs at
    * query time. */
  private[graft] val NdcgDisc: Seq[Long] = (1 to 10).map { r =>
    math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0)) + 0.5).toLong
  }

  /** Dense top-k per eval query (vec_id < nQueries): the q35 brute-cosine
    * shape — corpus × broadcast(query prefix), per-query rank window. */
  private def denseTopK(s: SparkSession, d: String, nQueries: Int,
                        k: Int): DataFrame = {
    QuantizedDot.register(s)
    val emb = Tables.embeddings(s, d).withColumn("nq", SimOps.normQ)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"), col("nq").as("q_nq"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id").asc)
    emb.select(col("vec_id").as("c_id"), col("label").as("c_label"),
        col("embedding").as("c_emb"), col("nq").as("c_nq"))
      .crossJoin(broadcast(q))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("cosine",
        SimOps.cosine(SimOps.dotQ("q_emb", "c_emb"),
          col("q_nq"), col("c_nq")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Shared dense-top-k CTE text (ending in `d10`), parameterized on the
    * eval prefix — the oracle twin of [[denseTopK]]. */
  private def denseCtesSql(nQueries: Int, k: Int): String = s"""
    e AS (SELECT vec_id, label, embedding, ${SimOps.sqlNormQ} AS nq
          FROM embeddings),
    qv AS (SELECT vec_id AS q_id, label AS q_label, embedding AS q_emb,
             nq AS q_nq
           FROM e WHERE vec_id < $nQueries),
    dscored AS (
      SELECT q_id, q_label, e.vec_id AS c_id, e.label AS c_label,
        e.embedding AS c_emb, e.nq AS c_nq,
        CAST(${SimOps.sqlDotQ("q_emb", "e.embedding")} AS DOUBLE)
          / sqrt(CAST(CAST(q_nq AS HUGEINT) * e.nq AS DOUBLE)) AS cosine
      FROM qv JOIN e ON e.vec_id <> q_id),
    d10 AS (
      SELECT * FROM (
        SELECT q_id, q_label, c_id, c_label, c_emb, c_nq, cosine,
          CAST(ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, c_id) AS BIGINT) AS rank
        FROM dscored)
      WHERE rank <= $k)"""

  // ---- q220: reciprocal-rank fusion of BM25 and dense retrieval --------
  // The hybrid-retrieval operator every production RAG stack runs: fuse
  // the sparse (BM25, q90's ranker verbatim) and dense (brute-cosine)
  // top-10 lists per query with RRF — score(d) = Σ 1/(60 + rank_i(d)) —
  // robust to the two rankers' incomparable score scales because only
  // RANKS enter. Query ids are q90's bm25Queries ids {0,1,2}; the dense
  // side retrieves for the SAME ids' embedding vectors (doc_id ≡ vec_id
  // in the corpus contract), so the fused list is over one id space.
  // Reciprocals are exact integers (1e9 div (60+rank) — integer floor
  // div in both engines), so fusion sums are order-independent.
  // Scale shape: two eval-bounded rankers (posting-list-bounded BM25 +
  // one corpus scan), then a ≤20-rows-per-query full-outer merge.
  def q220RrfFusion(s: SparkSession, d: String): DataFrame = {
    val nq = TextOps.bm25Queries.length // = 3 eval queries
    val sparse = TextOps.q90Bm25(s, d)
      .select(col("query_id"), col("doc_id").as("id"),
        col("rank").as("r_sparse"))
    val dense = denseTopK(s, d, nq, 10)
      .select(col("q_id").as("query_id"), col("c_id").as("id"),
        col("rank").as("r_dense"))
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_units").desc, col("id").asc)
    sparse.join(dense, Seq("query_id", "id"), "full_outer")
      .withColumn("rrf_units",
        coalesce(expr(s"1000000000 div ($RrfK + r_sparse)"), lit(0L)) +
          coalesce(expr(s"1000000000 div ($RrfK + r_dense)"), lit(0L)))
      .withColumn("fused_rank", row_number().over(wf).cast("long"))
      .filter(col("fused_rank") <= 10)
      .select(col("query_id"), col("fused_rank"), col("id").as("doc_id"),
        col("rrf_units"), col("r_sparse"), col("r_dense"))
      .orderBy(col("query_id"), col("fused_rank"))
  }

  val q220Sql: String = {
    val nq = TextOps.bm25Queries.length
    s"""
    WITH ${TextOps.bm25CtesSql},
    spr AS (
      SELECT query_id, doc_id AS id, rank AS r_sparse
      FROM bm25ranked WHERE rank <= 10),
    ${denseCtesSql(nq, 10)},
    den AS (SELECT q_id AS query_id, c_id AS id, rank AS r_dense FROM d10),
    fused AS (
      SELECT COALESCE(s.query_id, dn.query_id) AS query_id,
        COALESCE(s.id, dn.id) AS id, s.r_sparse, dn.r_dense,
        COALESCE(1000000000 // ($RrfK + s.r_sparse), 0)
          + COALESCE(1000000000 // ($RrfK + dn.r_dense), 0) AS rrf_units
      FROM spr s FULL OUTER JOIN den dn
        ON s.query_id = dn.query_id AND s.id = dn.id)
    SELECT query_id, fused_rank, id AS doc_id, rrf_units,
      r_sparse, r_dense
    FROM (
      SELECT query_id, id, rrf_units, r_sparse, r_dense,
        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY rrf_units DESC, id) AS BIGINT) AS fused_rank
      FROM fused)
    WHERE fused_rank <= 10 ORDER BY query_id, fused_rank"""
  }

  // ---- q221: nDCG@10 of dense retrieval under same-label relevance -----
  // The graded ranking-quality metric: per eval query (vec_id < 50),
  // DCG@10 with binary same-label relevance over the fixed integer
  // discount table, normalized by the ideal DCG for that query's label
  // (min(10, n_label − 1) relevant docs available). A query whose label
  // has no other member degrades to NULL nDCG ('no_relevant'), not a
  // div-by-zero. Scale shape: one eval-bounded corpus scan for the
  // top-10, plus a |labels|-row count frame for the ideal — the discount
  // table is a 10-row broadcast literal.
  def q221Ndcg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val discDf = NdcgDisc.zipWithIndex
      .map { case (u, i) => (i + 1L, u) }.toDF("rank", "disc")
    val top = denseTopK(s, d, 50, 10)
      .join(broadcast(discDf), Seq("rank"))
    val dcg = top
      .groupBy(col("q_id"), col("q_label"))
      .agg(sum(when(col("c_label") === col("q_label"), col("disc"))
          .otherwise(0L)).as("dcg_units"),
        sum(when(col("c_label") === col("q_label"), 1L).otherwise(0L))
          .as("n_hits"))
    val idcg = Tables.embeddings(s, d)
      .groupBy(col("label")).agg(count(lit(1)).as("n_label"))
      .crossJoin(broadcast(discDf))
      .filter(col("rank") <= least(lit(10L), col("n_label") - 1L))
      .groupBy(col("label")).agg(sum(col("disc")).as("idcg_units"))
    dcg.join(broadcast(idcg), col("q_label") === col("label"), "left")
      .withColumn("ndcg_ppm",
        expr("dcg_units * 1000000 div nullif(idcg_units, 0)"))
      .withColumn("quality_band",
        when(col("ndcg_ppm").isNull, "no_relevant")
          .when(col("ndcg_ppm") >= 700000L, "strong")
          .when(col("ndcg_ppm") >= 300000L, "fair")
          .otherwise("weak"))
      .select(col("q_id"), col("q_label"), col("n_hits"),
        col("dcg_units"), coalesce(col("idcg_units"), lit(0L))
          .as("idcg_units"), col("ndcg_ppm"), col("quality_band"))
      .orderBy(col("q_id"))
  }

  val q221Sql: String = {
    val discVals = NdcgDisc.zipWithIndex
      .map { case (u, i) => s"(${i + 1}, $u)" }.mkString(", ")
    s"""
    WITH ${denseCtesSql(50, 10)},
    disc(rank, disc) AS (VALUES $discVals),
    dcg AS (
      SELECT q_id, q_label,
        CAST(SUM(CASE WHEN c_label = q_label THEN dc.disc ELSE 0 END)
          AS BIGINT) AS dcg_units,
        CAST(SUM(CASE WHEN c_label = q_label THEN 1 ELSE 0 END)
          AS BIGINT) AS n_hits
      FROM d10 JOIN disc dc USING (rank)
      GROUP BY 1, 2),
    lc AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_label
           FROM embeddings GROUP BY 1),
    idcg AS (
      SELECT label, CAST(SUM(dc.disc) AS BIGINT) AS idcg_units
      FROM lc CROSS JOIN disc dc
      WHERE dc.rank <= LEAST(10, n_label - 1)
      GROUP BY 1)
    SELECT q_id, q_label, n_hits, dcg_units,
      COALESCE(idcg_units, 0) AS idcg_units,
      CAST(dcg_units * 1000000 // nullif(idcg_units, 0) AS BIGINT)
        AS ndcg_ppm,
      CASE WHEN idcg_units IS NULL OR idcg_units = 0 THEN 'no_relevant'
           WHEN dcg_units * 1000000 // idcg_units >= 700000 THEN 'strong'
           WHEN dcg_units * 1000000 // idcg_units >= 300000 THEN 'fair'
           ELSE 'weak' END AS quality_band
    FROM dcg LEFT JOIN idcg ON q_label = label
    ORDER BY q_id"""
  }

  // ---- q222: hit-rate@k and MRR cohorts per label -----------------------
  // The leaderboard row per label cohort: of the eval queries carrying
  // each label (vec_id < 50), what fraction find a same-label doc in the
  // dense top-1 / top-5 / top-10 (hit@k), and the mean reciprocal rank
  // of the first hit. Reciprocal ranks are exact ppm integers (1e6 div
  // rank); cohort means are floor-div ppm over the cohort count — all
  // order-independent. Scale shape: the same eval-bounded scan, then a
  // |labels|-row rollup.
  def q222HitRates(s: SparkSession, d: String): DataFrame = {
    val firstHit = denseTopK(s, d, 50, 10)
      .groupBy(col("q_id"), col("q_label"))
      .agg(min(when(col("c_label") === col("q_label"), col("rank")))
        .as("first_rank"))
    firstHit.groupBy(col("q_label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("first_rank") === 1L, 1L).otherwise(0L)).as("h1"),
        sum(when(col("first_rank") <= 5L, 1L).otherwise(0L)).as("h5"),
        sum(when(col("first_rank") <= 10L, 1L).otherwise(0L)).as("h10"),
        sum(coalesce(expr("1000000 div first_rank"), lit(0L))).as("rrs"))
      .select(col("q_label"), col("n_queries"),
        expr("h1 * 1000000 div n_queries").as("hit1_ppm"),
        expr("h5 * 1000000 div n_queries").as("hit5_ppm"),
        expr("h10 * 1000000 div n_queries").as("hit10_ppm"),
        expr("rrs div n_queries").as("mrr_ppm"))
      .orderBy(col("q_label"))
  }

  val q222Sql: String = s"""
    WITH ${denseCtesSql(50, 10)},
    fh AS (
      SELECT q_id, q_label,
        MIN(CASE WHEN c_label = q_label THEN rank END) AS first_rank
      FROM d10 GROUP BY 1, 2)
    SELECT q_label, CAST(COUNT(*) AS BIGINT) AS n_queries,
      CAST(SUM(CASE WHEN first_rank = 1 THEN 1 ELSE 0 END) * 1000000
        // COUNT(*) AS BIGINT) AS hit1_ppm,
      CAST(SUM(CASE WHEN first_rank <= 5 THEN 1 ELSE 0 END) * 1000000
        // COUNT(*) AS BIGINT) AS hit5_ppm,
      CAST(SUM(CASE WHEN first_rank <= 10 THEN 1 ELSE 0 END) * 1000000
        // COUNT(*) AS BIGINT) AS hit10_ppm,
      CAST(SUM(COALESCE(1000000 // first_rank, 0)) // COUNT(*) AS BIGINT)
        AS mrr_ppm
    FROM fh GROUP BY 1 ORDER BY 1"""

  // ---- q223: intra-list similarity (result redundancy) ------------------
  // The diversity audit on a retriever's output: per eval query
  // (vec_id < 20), the mean pairwise cosine among its own top-10 results
  // — a list whose members all look like each other wastes its context
  // budget on near-duplicates (the retrieval-side cousin of q108's
  // semantic dedup). Each pairwise cosine quantizes to exact integer
  // micro-units per pair (identical IEEE expression both engines), so
  // the 45-pair mean is a floor-div of exact integers. Scale shape: one
  // eval-bounded scan, then a ≤C(k,2)·|queries|-row self-join of the
  // top-k frame with itself on (q_id, rank<rank).
  def q223ListDiversity(s: SparkSession, d: String): DataFrame = {
    val top = denseTopK(s, d, 20, 10)
      .select(col("q_id"), col("rank"), col("c_emb"), col("c_nq"))
      .persist() // both sides of the 45-pair self-join
    val a = top.select(col("q_id"), col("rank").as("ra"),
      col("c_emb").as("ea"), col("c_nq").as("na"))
    val b = top.select(col("q_id"), col("rank").as("rb"),
      col("c_emb").as("eb"), col("c_nq").as("nb"))
    a.join(b, Seq("q_id")).filter(col("ra") < col("rb"))
      .withColumn("cos_units",
        floor(SimOps.cosine(SimOps.dotQ("ea", "eb"),
          col("na"), col("nb")) * 1e6 + 0.5).cast("long"))
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("cos_units")).as("sum_cos_units"))
      .withColumn("mean_pair_cos_units",
        // signed sum: floor-div diverges from Spark's truncating div on
        // negatives, so the mean splits into magnitude (on abs) + sign
        when(col("sum_cos_units") >= 0,
          expr("sum_cos_units div n_pairs"))
          .otherwise(-expr("(-sum_cos_units) div n_pairs")))
      .withColumn("redundancy_band",
        when(col("mean_pair_cos_units") >= 900000L, "near_duplicate")
          .when(col("mean_pair_cos_units") >= 500000L, "redundant")
          .otherwise("diverse"))
      .select(col("q_id"), col("n_pairs"), col("sum_cos_units"),
        col("mean_pair_cos_units"), col("redundancy_band"))
      .orderBy(col("q_id"))
  }

  val q223Sql: String = s"""
    WITH ${denseCtesSql(20, 10)},
    p AS (
      SELECT a.q_id,
        CAST(FLOOR(CAST(${SimOps.sqlDotQ("a.c_emb", "b.c_emb")} AS DOUBLE)
          / sqrt(CAST(CAST(a.c_nq AS HUGEINT) * b.c_nq AS DOUBLE))
          * 1e6 + 0.5) AS BIGINT) AS cos_units
      FROM d10 a JOIN d10 b ON a.q_id = b.q_id AND a.rank < b.rank),
    g AS (
      SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(SUM(cos_units) AS BIGINT) AS sum_cos_units
      FROM p GROUP BY 1),
    m AS (
      SELECT q_id, n_pairs, sum_cos_units,
        CASE WHEN sum_cos_units >= 0 THEN sum_cos_units // n_pairs
             ELSE -((-sum_cos_units) // n_pairs) END
          AS mean_pair_cos_units
      FROM g)
    SELECT q_id, n_pairs, sum_cos_units, mean_pair_cos_units,
      CASE WHEN mean_pair_cos_units >= 900000 THEN 'near_duplicate'
           WHEN mean_pair_cos_units >= 500000 THEN 'redundant'
           ELSE 'diverse' END AS redundancy_band
    FROM m ORDER BY q_id"""

  // ---- q263: retrieval exposure-bias / catalog-coverage audit ----------
  // The rec-sys fairness read on the dense retriever: over a 100-query
  // eval sweep, which documents actually GET retrieved? Per cutoff k ∈
  // {1, 5, 10}: catalog coverage (distinct docs in any top-k vs the
  // corpus), the HHI concentration of exposure slots (Σe²/E² in exact
  // ppm — a retriever whose exposure mass piles onto a few hub docs
  // starves the rest of the catalog; q171's hubness measured from the
  // SERVING side), and the single most-exposed doc's slot share. Total
  // slots E = 100·k is fixed by construction, so the three ratios are
  // directly comparable across corpora.
  //
  // Exactness: counts + three nonnegative floor-divs on Decimal(38,0) ↔
  // HUGEINT. Scale shape: ONE q35-shape eval sweep (corpus × broadcast
  // 100-query prefix, per-query rank window), then the 3-cutoff spine
  // broadcasts onto the ≤100·10-row result frame — all rollups are
  // |exposed-docs|-bounded.
  def q263ExposureBias(s: SparkSession, d: String): DataFrame = {
    val top = denseTopK(s, d, 100, 10).select(col("c_id"), col("rank"))
    val n = Tables.embeddings(s, d).agg(count(lit(1)).as("n_vecs"))
    val ks = s.range(0, 3).select(element_at(
      array(lit(1L), lit(5L), lit(10L)), col("id").cast("int") + 1)
      .as("k"))
    top.crossJoin(broadcast(ks))
      .filter(col("rank") <= col("k"))
      .groupBy(col("k"), col("c_id")).agg(count(lit(1)).as("e"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_exposed"),
        sum(col("e")).as("total_slots"),
        sum(expr("cast(e as decimal(38,0)) * e")).as("e2"),
        max(col("e")).as("max_e"))
      .crossJoin(broadcast(n))
      .withColumn("coverage_ppm", expr(
        "cast(cast(n_exposed as decimal(38,0)) * 1000000" +
          " div nullif(n_vecs, 0) as bigint)"))
      .withColumn("hhi_ppm", expr(
        "cast(e2 * 1000000 div nullif(cast(total_slots as decimal(38,0))" +
          " * total_slots, 0) as bigint)"))
      .withColumn("top_doc_share_ppm", expr(
        "cast(cast(max_e as decimal(38,0)) * 1000000" +
          " div nullif(total_slots, 0) as bigint)"))
      .select(col("k"), col("n_exposed"), col("total_slots"),
        col("coverage_ppm"), col("hhi_ppm"), col("top_doc_share_ppm"))
      .orderBy(col("k"))
  }

  val q263Sql: String = s"""
    WITH ${denseCtesSql(100, 10)},
    ks AS (SELECT CAST(unnest([1, 5, 10]) AS BIGINT) AS k),
    expo AS (
      SELECT k, c_id, CAST(COUNT(*) AS BIGINT) AS e
      FROM d10 CROSS JOIN ks WHERE rank <= k GROUP BY 1, 2),
    agg AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_exposed,
        CAST(SUM(e) AS BIGINT) AS total_slots,
        SUM(CAST(e AS HUGEINT) * e) AS e2,
        CAST(MAX(e) AS BIGINT) AS max_e
      FROM expo GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs FROM embeddings)
    SELECT k, n_exposed, total_slots,
      CAST(CAST(n_exposed AS HUGEINT) * 1000000 // nullif(n_vecs, 0)
        AS BIGINT) AS coverage_ppm,
      CAST(e2 * 1000000 // nullif(CAST(total_slots AS HUGEINT)
        * total_slots, 0) AS BIGINT) AS hhi_ppm,
      CAST(CAST(max_e AS HUGEINT) * 1000000 // nullif(total_slots, 0)
        AS BIGINT) AS top_doc_share_ppm
    FROM agg CROSS JOIN n ORDER BY k"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q263_exposure_bias" -> q263ExposureBias _,
    "q220_rrf_fusion" -> q220RrfFusion _,
    "q221_ndcg" -> q221Ndcg _,
    "q222_hit_rates" -> q222HitRates _,
    "q223_list_diversity" -> q223ListDiversity _)

  val oracles: Map[String, String] = Map(
    "q263_exposure_bias" -> q263Sql,
    "q220_rrf_fusion" -> q220Sql,
    "q221_ndcg" -> q221Sql,
    "q222_hit_rates" -> q222Sql,
    "q223_list_diversity" -> q223Sql)
}
