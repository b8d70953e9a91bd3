package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication surface for a training-data pipeline (SURVEY.md §2.12 [N]):
  * exact (hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard with
  * prefix filtering — the standard near-dup toolkit at pretraining scale.
  *
  * Design for 100 TB: NOTHING here is O(n²) over the corpus. Every pairwise
  * op goes through an LSH/blocking equi-join (band bucket, simhash chunk,
  * or 1-seed minhash prefix filter) so the shuffle key bounds candidate
  * generation; the exact verification (Jaccard / Hamming) runs only inside
  * buckets. All hashing is md5-based (not Spark's murmur/xxhash) so the
  * DuckDB oracle can reproduce every bit: H(x) = first 60 bits of md5(x)
  * as a bigint — portable across engines, stable across versions.
  *
  * The per-row feature extraction (tokens → shingles → hashes) is pure
  * higher-order array expressions — no UDFs, no shuffle until the bucket
  * join itself.
  */
object DedupOps {

  /** Portable 60-bit hash: Spark side — the custom codegen expression
    * [[graft.expressions.Hash60]] (digest-bytes-direct; no hex-string
    * round trip). DuckDB side:
    * CAST('0x' || substring(md5(x), 1, 15) AS BIGINT). */
  private def hashOf(x: String): String = s"h60($x)"

  /** Driver-side twin of [[hashOf]] — used to precompute seed/plane
    * constants as literals instead of re-hashing per row (the md5 call in
    * the hot path was 8× the per-shingle cost before this). */
  private[graft] def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map(b => f"${b & 0xff}%02x").mkString.substring(0, 15), 16)
  }

  /** Per-seed xor constants: seeded minhash k is min over shingles of
    * H(x) XOR R_k — ONE md5 per shingle total, then k cheap integer xors
    * (a standard one-hash minhash family; each R_k re-orders the hash
    * space deterministically). SQL twin computes R_k with the same md5
    * formula, so both engines see identical values. */
  private[ops] def seedR(k: Int): Long = h60(s"seed:$k")

  /** doc_id + distinct word-3-gram shingle set (docs with >= 3 tokens)
    * and the per-shingle 60-bit hash array `hv`. */
  private def withShingles(df: DataFrame): DataFrame = {
    graft.expressions.Hash60.register(df.sparkSession)
    df.withColumn("tokens", split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"))
      .filter(size(col("tokens")) >= 3)
      .withColumn("shingles", expr(
        "array_distinct(transform(sequence(1, size(tokens) - 2)," +
          " i -> array_join(slice(tokens, i, 3), ' ')))"))
      .withColumn("hv", expr(s"transform(shingles, x -> ${hashOf("x")})"))
  }

  private val sqlShingles: String = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '[ \t\n\r\f]+') AS t
      FROM documents),
    sh0 AS (
      SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
               i -> array_to_string(t[i:i+2], ' '))) AS shingles
      FROM toks WHERE len(t) >= 3),
    sh AS (
      SELECT doc_id, shingles, list_transform(shingles, x ->
        CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)) AS hv
      FROM sh0)"""

  /** Shared oracle CTE block: the banding candidate generation every
    * near-dup oracle re-derives (minhash minima + band-keyed pair
    * join). ONE definition so a banding-scheme change cannot silently
    * desynchronize one of its five consuming oracles
    * (q31/q162/q174/q183/sqlDupPairs).  */
  // lazy: sqlSeeds is declared later in the file — a strict val here
  // would interpolate null at object init (the SimOps q182Sql lesson)
  private lazy val sqlMhCand: String = s"""
    mh AS (
      SELECT doc_id, k,
        list_min(list_transform(hv, h -> xor(h, rk))) AS mhv
      FROM sh CROSS JOIN $sqlSeeds),
    cand AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2
      FROM mh a JOIN mh b
        ON a.k = b.k AND a.mhv = b.mhv AND a.doc_id < b.doc_id
      GROUP BY 1, 2)"""

  /** Shared verified-Jaccard CTE over the candidates (inter/uni). */
  private val sqlJac: String = """
    jac AS (
      SELECT id1, id2,
        CAST(len(list_intersect(sa.hv, sb.hv)) AS BIGINT) AS inter,
        CAST(len(sa.hv) + len(sb.hv)
          - len(list_intersect(sa.hv, sb.hv)) AS BIGINT) AS uni
      FROM cand
      JOIN sh sa ON sa.doc_id = id1
      JOIN sh sb ON sb.doc_id = id2)"""

  // ---- q29: exact dedup (hash-groupBy; A5 at corpus scale) -------------
  // One shuffle on the content hash; keep-min-id is the deterministic
  // ON-CONFLICT analog (Ingest.dedupKeepFirst collapsed into an agg).
  def q29ExactDedup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("content_md5", md5(col("text")))
      .groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("content_md5"), col("n_copies"))
      .orderBy(col("doc_id"))

  val q29Sql: String = """
    SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, md5(text) AS content_md5,
      COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text) ORDER BY doc_id"""

  /** Incremental exact dedup against a persisted fingerprint store — the
    * O(batch) form of q29 for a standing ingest (the reference's
    * every-15-min rerun, `deploy/deploy.sh:29`, generalized to content
    * identity): dedup the incoming batch WITHIN itself (keep min doc_id
    * per content hash), anti-join it against the fingerprints of
    * everything ever accepted, append only the novel fingerprints, and
    * return the novel docs. Per firing this reads the store but never
    * rewrites it — appends are new parquet files committed atomically by
    * Spark's output committer, and re-running the same batch appends
    * nothing (its hashes are already present), so the store never
    * accumulates duplicates.
    *
    * Scale: both sides shuffle on content_md5 — uniformly distributed by
    * construction, no skew. At 100 TB the store side dominates; since it
    * is append-only and keyed by the join column, bucketing it by
    * content_md5 (or relying on DPP over a hash-prefix partition column)
    * removes the store's shuffle entirely — the batch side is the small
    * one and shuffles O(batch) regardless.
    *
    * The returned frame is pinned via eager localCheckpoint BEFORE the
    * store append: persist() alone is not enough — appending to storeDir
    * triggers CacheManager.recacheByPath on every cached plan that reads
    * that path, which would re-execute the anti-join against the
    * now-grown store and return empty. Checkpointing truncates the plan
    * so the result no longer references the path at all. Unpersist via
    * the returned frame when done. */
  def incrementalDedup(batch: DataFrame, storeDir: String): DataFrame = {
    val staged = incrementalDedupStaged(batch, storeDir)
    staged.commit()
    staged.novel
  }

  /** A dedup firing whose store append is DEFERRED: [[novel]] is the
    * pinned (eagerly checkpointed) novel set, usable immediately;
    * [[commit]] performs the store append and must run only AFTER the
    * caller has durably written the firing's output. Rationale: if the
    * store grows before the output commits and the job crashes between
    * the two, the rerun self-matches every doc and ships an EMPTY firing
    * — the batch is recorded as shipped but never ships (silent loss).
    * Deferring flips the failure mode to at-least-once: a crash between
    * output write and commit() reships the batch on rerun, which the
    * downstream can see and reconcile, instead of silently dropping it. */
  final case class StagedDedup(novel: DataFrame, commit: () => Unit)

  /** [[incrementalDedup]] with the store append staged behind
    * [[StagedDedup.commit]]. */

  /** Store existence through the SAME filesystem abstraction the
    * read/write path uses — `java.io.File` silently answers false for
    * hdfs://, s3a://, etc., which would skip the anti-join and admit
    * every duplicate as novel on a cluster store. */
  private def storeExists(s: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  def incrementalDedupStaged(batch: DataFrame, storeDir: String)
      : StagedDedup = {
    val s = batch.sparkSession
    val hashed = batch.withColumn("content_md5", md5(col("text")))
    val inBatch = hashed
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("content_md5")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("rn")
    val novel =
      if (storeExists(s, storeDir))
        inBatch.join(s.read.parquet(storeDir), Seq("content_md5"),
          "left_anti")
      else inBatch
    val pinned = novel.localCheckpoint(true)
    StagedDedup(pinned, () =>
      pinned.select(col("content_md5"))
        .write.mode("append").parquet(storeDir))
  }

  /** MinHash OR-band count — the RECALL knob, not a bucket-occupancy
    * knob: candidates are pairs sharing any of the B per-seed minima, so
    * recall at Jaccard j is 1-(1-j)^B (0.996 at j=0.5, B=8) and more
    * bands only add candidates. Bucket occupancy is governed by the
    * 60-bit minhash VALUE space (buckets = distinct minima, which grows
    * with the corpus), so unlike a fixed-plane LSH this blocking does not
    * degrade toward n² as n grows — B stays a quality constant at any
    * scale. */
  private[graft] val MinhashBands = 8

  // ---- q30: MinHash signatures (MinhashBands seeds, long format) -------
  private def minhashCol(k: Int): Column = expr(
    s"array_min(transform(hv, h -> h ^ ${seedR(k)}L))")

  // Shape: explode the shingle hashes once, take the B per-seed minima as
  // codegen'd MIN aggregates (partial+final), then unpivot with stack —
  // the all-HOF formulation interprets B×|shingles| lambdas per row.
  //
  // explode_OUTER on purpose: plain explode makes InferFiltersFromGenerate
  // add `size(hv) > 0 AND isnotnull(hv)` below the projection, which
  // re-inlines the ENTIRE tokenize→shingle→md5 tree into a Filter evaluated
  // per scan row — tripling the dominant cost (measured 3.2 s → 1.2 s at
  // sf0.1). hv is provably non-empty here (size(tokens) >= 3 upstream), so
  // the inferred filter is pure waste and outer-explode semantics are
  // identical.
  def q30MinhashSig(s: SparkSession, d: String): DataFrame = {
    val exploded = withShingles(Tables.documents(s, d))
      .select(col("doc_id"), explode_outer(col("hv")).as("h"))
    val mins = (0 until MinhashBands).map(k =>
      min(expr(s"h ^ ${seedR(k)}L")).as(s"mh$k"))
    exploded.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), expr(s"stack($MinhashBands, " +
        (0 until MinhashBands).map(k => s"${k}L, mh$k").mkString(", ") +
        ") as (seed, minhash)"))
      .orderBy(col("doc_id"), col("seed"))
  }

  private val sqlSeeds: String = s"""
      (SELECT k, CAST('0x' || substring(md5('seed:' || CAST(k AS VARCHAR)),
         1, 15) AS BIGINT) AS rk
       FROM (SELECT unnest(range(0, $MinhashBands)) AS k)) seeds"""

  val q30Sql: String = sqlShingles + s"""
    SELECT doc_id, CAST(k AS BIGINT) AS seed,
      list_min(list_transform(hv, h -> xor(h, rk))) AS minhash
    FROM sh CROSS JOIN $sqlSeeds
    ORDER BY doc_id, seed"""

  // ---- Shared near-dup pipeline stage (q31/q60/q102/q116/q123) ---------
  // Five queries consume the SAME shingle→minhash→band-join→intersect
  // derivation; standalone they executed it five times (13% of the r5
  // bench). The production posture (`CurationJob`) materializes derived
  // stages once and fans out; the query registry now does the same: the
  // banded-candidate table (id1, id2, inter, n1, n2 — sizes + exact
  // intersection over the 60-bit shingle hashes, BEFORE any threshold) is
  // computed once per (session, dataset) and pinned via eager
  // localCheckpoint. RDD-level checkpoint blocks are NOT CacheManager
  // entries, so the harness's `spark.catalog.clearCache()` between
  // queries leaves them alive — lifetime is the (session, dataset
  // version) via the unified [[StageCache]] (mtime-keyed, so a
  // regenerated fixture under the same path can never serve stale
  // candidates). At cluster scale the same stage would be a temp
  // parquet/Delta table (the incrementalDedup store pattern); in-session
  // block pinning is the single-app equivalent. Candidate rows are 5
  // longs each and bounded by band-bucket occupancy, so the pinned
  // footprint is tiny relative to the corpus.
  //
  // Every oracle stays standalone (full CTE chain from raw text), so the
  // correctness gate still verifies the WHOLE derivation per query.
  private def cachedStage(s: SparkSession, d: String, stage: String)
      (compute: => DataFrame): DataFrame =
    StageCache.getOrCompute(s, d, stage)(compute)

  /** Drop all pinned shared stages (tests / long-lived sessions that
    * mutate the underlying documents table between runs). */
  def clearStageCache(): Unit = StageCache.clearAll()

  /** Banded candidate pairs with exact hash-set intersection — the shared
    * expensive stage. Two deliberate hot-path choices carried over from
    * the original q31:
    *  * the feature table (shingle hashes + signatures) is persisted, so
    *    the self-join's two branches share ONE computation instead of
    *    each re-deriving shingles+md5 from the raw text;
    *  * intersection is computed over the 60-bit hash arrays (`hv`), not
    *    the string shingle arrays — set-intersection on longs is several
    *    times cheaper than on strings, and both engines hash identically
    *    so the result only changes if md5 itself collides (~2^-30 here).
    * The hv arrays are dropped at the checkpoint boundary: downstream
    * consumers only need (inter, n1, n2), so the pinned blocks carry 5
    * longs per candidate instead of two shingle-hash arrays. */
  private def buildBandCandidates(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val base = withShingles(Tables.documents(s, d))
      .select(col("doc_id"), col("hv"), array(
        (0 until MinhashBands).map(k =>
          struct(lit(k).as("k"), minhashCol(k).as("mhv"))): _*
      ).as("bands"))
      .persist()
    // The band self-join ships ONLY (id, k, mhv) — three longs per
    // exploded row. The previous shape carried each side's full shingle
    // hash array through the 8-way band explosion, so the join shuffled
    // ~16× the corpus's hv payload (8 copies per doc per side) plus the
    // pair-dedup exchange; the arrays re-join AFTER the dedup instead,
    // one corpus-sized hv pass per side. Locally the stage is
    // scan/CPU-bound so the win is modest (7.3 → 6.8 s at sf0.1,
    // BASELINE.md §stage A/B r8), but the shuffled-bytes reduction is
    // the property that matters on a real cluster where the exchange,
    // not the scan, is the bottleneck.
    def side(p: String): DataFrame =
      base.select(col("doc_id").as(s"${p}_id"),
          // outer: the 8-element bands array is never empty; plain explode
          // would re-inline its 8 array_min trees into a filter (q30 note)
          explode_outer(col("bands")).as("b"))
        .select(col(s"${p}_id"),
          col("b.k").as(s"${p}_k"), col("b.mhv").as(s"${p}_mhv"))
    val pairs = side("a").join(side("b"),
        col("a_k") === col("b_k") && col("a_mhv") === col("b_mhv")
          && col("a_id") < col("b_id"))
      .select(col("a_id").as("id1"), col("b_id").as("id2"))
      .dropDuplicates("id1", "id2")
    val cand = pairs
      .join(base.select(col("doc_id").as("id1"), col("hv").as("hv1")), "id1")
      .join(base.select(col("doc_id").as("id2"), col("hv").as("hv2")), "id2")
      .select(col("id1"), col("id2"),
        size(array_intersect(col("hv1"), col("hv2"))).cast("long")
          .as("inter"),
        size(col("hv1")).cast("long").as("n1"),
        size(col("hv2")).cast("long").as("n2"))
    (base, cand)
  }

  /** The UNMATERIALIZED candidate plan — for plan-shape guards
    * (`PlanSpec`): the checkpointed [[bandCandidates]] plan roots at an
    * RDD scan, hiding the band equi-join this stage exists to pin. */
  private[graft] def bandCandidatesPlan(s: SparkSession, d: String): DataFrame = {
    val (base, cand) = buildBandCandidates(s, d)
    // plan-guard-only variant: release the builder's pinned base NOW
    // (nothing materialized yet — the guard reads the plan, not data),
    // so repeated calls don't accumulate corpus-derived cache entries
    base.unpersist()
    cand
  }

  private[graft] def bandCandidates(s: SparkSession, d: String): DataFrame =
    cachedStage(s, d, "band_candidates") {
      val (base, cand) = buildBandCandidates(s, d)
      val pinned = cand.localCheckpoint(true) // eager, while base is pinned
      base.unpersist()
      pinned
    }

  /** Verified near-dup edge list (Jaccard >= 0.5) — a cheap filter over
    * the pinned candidates; the graph input for q60/q102/q116. */
  private[graft] def dupPairs(s: SparkSession, d: String): DataFrame =
    bandCandidates(s, d)
      // j >= 0.5 ⟺ 3·|A∩B| >= |A|+|B| — exact-integer predicate
      .filter(col("inter") * 3 >= col("n1") + col("n2"))
      .select(col("id1"), col("id2"))

  /** Connected-component labels over [[dupPairs]], shared by q60 and
    * q102 (both need the same clustering; the CC fixpoint loop is the
    * second-most expensive part of the family after candidate
    * generation). Pinned like the candidates. */
  private[graft] def ccLabels(s: SparkSession, d: String): DataFrame =
    cachedStage(s, d, "cc_labels") {
      connectedComponents(dupPairs(s, d)).localCheckpoint(true)
    }

  // ---- q31: MinHash-LSH near-dup pairs (band join + Jaccard verify) ----
  // 8 single-row bands: candidates share ANY of the 8 minhashes (recall
  // 1-(1-j)^8 — 0.996 at j=0.5); then exact Jaccard, threshold 0.5. The
  // corpus has ~5% planted near-dups at j >= 0.5 with background pairs
  // below 0.2, so the threshold is not boundary-sensitive.
  def q31MinhashPairs(s: SparkSession, d: String): DataFrame =
    bandCandidates(s, d)
      .filter(col("inter") * 3 >= col("n1") + col("n2"))
      .withColumn("uni", col("n1") + col("n2") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .select(col("id1"), col("id2"), col("inter"), col("uni"), col("jaccard"))
      .orderBy(col("id1"), col("id2"))

  val q31Sql: String = sqlShingles + s""",
$sqlMhCand,
$sqlJac
    SELECT id1, id2, inter, uni,
      CAST(inter AS DOUBLE) / uni AS jaccard
    FROM jac WHERE inter * 2 >= uni
    ORDER BY id1, id2"""

  // ---- q174: dedup threshold sensitivity sweep -------------------------
  // The tuning curve behind the q31 pipeline's one magic number: for each
  // candidate Jaccard threshold 50..95%, how many verified pairs survive
  // and how many documents get touched (exact ppm of the corpus). A steep
  // cliff between adjacent thresholds means the dedup decision is
  // boundary-sensitive and the threshold deserves a re-audit; a plateau
  // means the planted-dup mass is well-separated from background.
  //
  // Exactness: a pair passes threshold t iff inter·100 ≥ t·uni — all
  // integers, so the per-pair MAX passing threshold is (inter·100) div
  // uni and "passes t" ⟺ tmax ≥ t. Doc counts fold the same way through
  // each doc's max pair band. doc_ppm is the Decimal(38,0) div
  // convention.
  //
  // Scale shape: rides the pinned band-candidate stage; the pair set
  // collapses map-side onto the ≤101-row tmax histogram (and, for docs,
  // through a doc-keyed max aggregate first — the explode is 2 rows per
  // pair, not a corpus blow-up). The threshold sweep itself is a
  // broadcast theta join between the 10-row threshold frame and those
  // bounded histograms — never against the pair set.
  def q174ThresholdSweep(s: SparkSession, d: String): DataFrame = {
    val pairs = bandCandidates(s, d)
      .withColumn("uni", col("n1") + col("n2") - col("inter"))
      .withColumn("tmax", expr("(inter * 100) div uni"))
    val pairHist = pairs.groupBy(col("tmax"))
      .agg(count(lit(1)).as("n_pairs_at"))
    val docHist = pairs
      .select(explode(array(col("id1"), col("id2"))).as("doc_id"),
        col("tmax"))
      .groupBy(col("doc_id")).agg(max(col("tmax")).as("tmax"))
      .groupBy(col("tmax")).agg(count(lit(1)).as("n_docs_at"))
    val th = s.range(10)
      .select((lit(50) + col("id") * 5).cast("int").as("threshold_pct"))
    val nPairs = th
      .join(broadcast(pairHist), col("tmax") >= col("threshold_pct"), "left")
      .groupBy(col("threshold_pct"))
      .agg(coalesce(sum(col("n_pairs_at")), lit(0L)).as("n_pairs"))
    val nDocs = th
      .join(broadcast(docHist), col("tmax") >= col("threshold_pct"), "left")
      .groupBy(col("threshold_pct"))
      .agg(coalesce(sum(col("n_docs_at")), lit(0L)).as("n_docs"))
    val tot = Tables.documents(s, d).agg(count(lit(1)).as("n_corpus"))
    nPairs.join(nDocs, "threshold_pct")
      .crossJoin(broadcast(tot))
      // NULL on an empty corpus, matching DuckDB's `// 0` (degrade,
      // don't die: ANSI div would throw on the 0-doc source)
      .withColumn("doc_ppm",
        when(col("n_corpus") > 0,
          expr("cast(n_docs as decimal(38,0)) * 1000000 div n_corpus")))
      .select(col("threshold_pct"), col("n_pairs"), col("n_docs"),
        col("doc_ppm"))
      .orderBy(col("threshold_pct"))
  }

  val q174Sql: String = sqlShingles + s""",
$sqlMhCand,
$sqlJac,
    th AS (SELECT UNNEST([50, 55, 60, 65, 70, 75, 80, 85, 90, 95])
      AS threshold_pct),
    p AS (
      SELECT threshold_pct, CAST(COUNT(j.id1) AS BIGINT) AS n_pairs
      FROM th LEFT JOIN jac j ON j.inter * 100 >= threshold_pct * j.uni
      GROUP BY 1),
    ends AS (
      SELECT id1 AS doc_id, inter, uni FROM jac
      UNION ALL SELECT id2, inter, uni FROM jac),
    dd AS (
      SELECT threshold_pct,
        CAST(COUNT(DISTINCT e.doc_id) AS BIGINT) AS n_docs
      FROM th LEFT JOIN ends e ON e.inter * 100 >= threshold_pct * e.uni
      GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM documents)
    SELECT p.threshold_pct, n_pairs, n_docs,
      CAST(CAST(n_docs AS HUGEINT) * 1000000 // n_corpus AS BIGINT)
        AS doc_ppm
    FROM p JOIN dd ON p.threshold_pct = dd.threshold_pct
    CROSS JOIN tot
    ORDER BY p.threshold_pct"""

  // ---- q183: dedup recall harness ----------------------------------------
  // q104's posture applied to the dedup family: LSH banding is the one
  // APPROXIMATE step in the near-dup pipeline (1−(1−j)^8 recall — it can
  // MISS true pairs), and nothing measured that miss rate until now.
  // Ground truth = exact all-pairs Jaccard over a bounded eval prefix
  // (doc_id < 256 — the q104 eval-set pattern); the harness reports the
  // band stage's measured recall (true pairs found / true pairs) and
  // candidate precision (verified-true candidates / candidates) in
  // exact ppm. Verified candidates are PROVABLY a subset of the truth
  // (the verify filter is exact Jaccard), but the harness measures the
  // containment via a semi join instead of assuming it.
  //
  // Scale shape: the ground truth is an eval-bounded broadcast cross
  // (≤256² pairs — never corpus all-pairs); the candidate side rides
  // the pinned band stage with an id-prefix filter; five 1-row
  // aggregates combine via broadcast crosses (the q118 frame pattern).
  private[graft] val DedupEvalN = 256L

  def q183DedupRecall(s: SparkSession, d: String): DataFrame = {
    val evalSh = withShingles(
        Tables.documents(s, d).filter(col("doc_id") < DedupEvalN))
      .select(col("doc_id"), col("hv"))
    val a = evalSh.select(col("doc_id").as("id1"), col("hv").as("hv1"))
    val b = evalSh.select(col("doc_id").as("id2"), col("hv").as("hv2"))
    val truth = a.crossJoin(broadcast(b))
      .filter(col("id1") < col("id2"))
      .withColumn("inter",
        size(array_intersect(col("hv1"), col("hv2"))).cast("long"))
      .withColumn("n1", size(col("hv1")).cast("long"))
      .withColumn("n2", size(col("hv2")).cast("long"))
      .filter(col("inter") * 3 >= col("n1") + col("n2"))
      .select(col("id1"), col("id2"))
    val cand = bandCandidates(s, d)
      .filter(col("id1") < DedupEvalN && col("id2") < DedupEvalN)
    val candTrue = cand
      .filter(col("inter") * 3 >= col("n1") + col("n2"))
      .select(col("id1"), col("id2"))
    val nEval = Tables.documents(s, d)
      .filter(col("doc_id") < DedupEvalN)
      .agg(count(lit(1)).as("n_eval_docs"))
    val tTruth = truth.agg(count(lit(1)).as("n_true_pairs"))
    val tCand = cand.agg(count(lit(1)).as("n_candidates"))
    val tCandTrue = candTrue.agg(count(lit(1)).as("n_cand_true"))
    val tFound = truth.join(candTrue, Seq("id1", "id2"), "left_semi")
      .agg(count(lit(1)).as("n_found"))
    nEval.crossJoin(broadcast(tTruth)).crossJoin(broadcast(tCand))
      .crossJoin(broadcast(tCandTrue)).crossJoin(broadcast(tFound))
      .withColumn("recall_ppm", when(col("n_true_pairs") > 0L,
        expr("cast(n_found as decimal(38,0)) * 1000000 div n_true_pairs")))
      .withColumn("precision_ppm", when(col("n_candidates") > 0L,
        expr("cast(n_cand_true as decimal(38,0)) * 1000000" +
          " div n_candidates")))
      .select(col("n_eval_docs"), col("n_true_pairs"), col("n_candidates"),
        col("n_cand_true"), col("n_found"), col("recall_ppm"),
        col("precision_ppm"))
  }

  val q183Sql: String = sqlShingles + s""",
$sqlMhCand,
    jac AS (
      SELECT id1, id2,
        CAST(len(list_intersect(sa.hv, sb.hv)) AS BIGINT) AS inter,
        CAST(len(sa.hv) AS BIGINT) AS n1, CAST(len(sb.hv) AS BIGINT) AS n2
      FROM cand
      JOIN sh sa ON sa.doc_id = id1
      JOIN sh sb ON sb.doc_id = id2
      WHERE id1 < $DedupEvalN AND id2 < $DedupEvalN),
    truth AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2
      FROM (SELECT doc_id, hv FROM sh WHERE doc_id < $DedupEvalN) a
      JOIN (SELECT doc_id, hv FROM sh WHERE doc_id < $DedupEvalN) b
        ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.hv, b.hv)) AS BIGINT) * 3
        >= len(a.hv) + len(b.hv)),
    candt AS (
      SELECT id1, id2 FROM jac WHERE inter * 3 >= n1 + n2),
    f AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_found
      FROM truth t WHERE EXISTS (SELECT 1 FROM candt c
        WHERE c.id1 = t.id1 AND c.id2 = t.id2)),
    frames AS (
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
          WHERE doc_id < $DedupEvalN) AS n_eval_docs,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true_pairs,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM jac) AS n_candidates,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM candt) AS n_cand_true,
        (SELECT n_found FROM f) AS n_found)
    SELECT n_eval_docs, n_true_pairs, n_candidates, n_cand_true, n_found,
      CAST(CASE WHEN n_true_pairs > 0 THEN
        CAST(n_found AS HUGEINT) * 1000000 // n_true_pairs END AS BIGINT)
        AS recall_ppm,
      CAST(CASE WHEN n_candidates > 0 THEN
        CAST(n_cand_true AS HUGEINT) * 1000000 // n_candidates
        END AS BIGINT) AS precision_ppm
    FROM frames"""

  // ---- q32: SimHash fingerprints (60-bit, over shingle hashes) ---------
  // bit b of simhash = sign of sum over shingles of (+1/-1 by hash bit b),
  // equivalently 2·popcount_b > n. Shape: explode the per-shingle hashes
  // and aggregate SWAR-packed bit counters — each of 15 packed longs holds
  // four 16-bit counters (bits 4j..4j+3 of the hash), spread via the
  // multiply-by-(1+2^15+2^30+2^45) trick, so one codegen'd HashAggregate
  // carries 15 SUM columns instead of 60 (and 4 integer ops per group per
  // row instead of 15). Counter capacity: the top slot lives at bit
  // offset 48 and may not touch the sign bit, so counts must stay below
  // 32768 — shingle input is capped at 32767 per doc IDENTICALLY on both
  // engines (a doc that long gets its simhash from the first 32767
  // distinct shingles; a 5-bit/13-slot packing that looked denser
  // overflowed the sign bit at popcount 2048 and silently corrupted every
  // fifth hash bit). The aggregation distributes (shuffle key = doc_id);
  // the DuckDB oracle keeps the direct per-bit formulation over the same
  // capped input — same integers, same signs.
  private[graft] val MaxSimhashShingles = 32767
  private[graft] def withSimhash(df: DataFrame): DataFrame = {
    val spreadC = (0 to 3).map(m => 1L << (15 * m)).sum // 4 copies of x
    val slotM = (0 to 3).map(m => 1L << (16 * m)).sum   // keep bit m at 16m
    val exploded = withShingles(df)
      .select(col("doc_id"), // outer: skip the inferred-filter re-inline (q30 note)
        explode_outer(expr(s"slice(hv, 1, $MaxSimhashShingles)")).as("h"))
    val packedSums = (0 until 15).map(j =>
      sum(expr(s"((shiftright(h, ${4 * j}) & 15) * ${spreadC}L) & ${slotM}L"))
        .as(s"p$j"))
    val simhash = (0 until 60).map { b =>
      val j = b / 4
      val m = b % 4
      expr(s"case when ((shiftrightunsigned(p$j, ${16 * m}) & 65535) * 2) > n " +
        s"then ${1L << b}L else 0L end")
    }.reduce(_ + _)
    exploded.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), packedSums: _*)
      .select(col("doc_id"), simhash.as("simhash"))
  }

  def q32Simhash(s: SparkSession, d: String): DataFrame =
    withSimhash(Tables.documents(s, d))
      .orderBy(col("doc_id"))

  // hv capped to the same 32767-shingle budget as the Spark side
  private val sqlSimhash: String = sqlShingles + s""",
    hs AS (SELECT doc_id, hv[1:$MaxSimhashShingles] AS hv FROM sh),
    sim AS (
      SELECT doc_id,
        list_reduce(list_concat([CAST(0 AS BIGINT)],
          list_transform(range(0, 60), b ->
            CASE WHEN list_reduce(list_transform(hv,
                   h -> ((h >> b) % 2) * 2 - 1), (a, c) -> a + c) > 0
                 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)),
          (a, c) -> a + c) AS simhash
      FROM hs)"""

  val q32Sql: String = sqlSimhash + """
    SELECT doc_id, simhash FROM sim ORDER BY doc_id"""

  // ---- q33: SimHash near-dup pairs (chunk-LSH + Hamming verify) --------
  // nChunks chunks of (60/nChunks) bits: by pigeonhole, ANY pair at
  // Hamming distance <= nChunks-1 shares at least one untouched chunk —
  // the blocking is lossless for the hd <= nChunks-1 contract.
  //
  // nChunks is the SCALE knob, with an explicit semantics tradeoff: each
  // chunk has 2^(60/nChunks) bucket values, so expected occupancy is
  // n / 2^width. q33's 6×10-bit split (1,024 values/chunk) is right for
  // ~10^4–10^5 docs; at 10^8+ docs use 4×15 (32,768 values) or 3×20
  // (1M values), accepting the tighter hd <= 3 / hd <= 2 contract —
  // or move to a wider fingerprint (2×64-bit simhash limbs) if the
  // hd-budget must stay. Unlike hyperplane LSH there is no free
  // constant-occupancy scaling here: the pigeonhole guarantee ties
  // bucket width to the hamming budget; that caveat is inherent to
  // simhash chunk blocking, and the parameter makes the choice explicit.
  /** Corpus-size-derived chunk count — the q33 scale knob, selected the
    * same way [[SimOps.planesFor]] picks hyperplanes: find the bucket
    * bit-width that keeps expected chunk-bucket occupancy at or under
    * [[TargetChunkRows]] (needed = bit-length of ceil(n/32) - 1), then
    * take the SMALLEST chunk width in the divisor ladder of 60
    * {10, 12, 15, 20, 30} that covers it. Fewer, wider chunks mean a
    * tighter verified-pair contract (hd <= nChunks - 1 by pigeonhole):
    *   n <= ~32·2^10 (3e4 docs) → 6×10-bit, hd <= 5
    *   n <= ~32·2^12 (1e5)      → 5×12-bit, hd <= 4
    *   n <= ~32·2^15 (1e6)      → 4×15-bit, hd <= 3
    *   n <= ~32·2^20 (3e7)      → 3×20-bit, hd <= 2
    *   beyond                   → 2×30-bit, hd <= 1
    * That tightening is inherent to simhash chunk blocking (the
    * pigeonhole guarantee ties bucket width to the hamming budget); a
    * corpus needing hd <= 5 at 10^8+ docs should move to a wider
    * fingerprint (2×64-bit limbs). Integer-exact like planesFor — the
    * oracle twin derives the same count from the same COUNT(*) via
    * bit-length-of-bin, so both engines pick the same ladder rung. */
  private[graft] val TargetChunkRows = 32L
  private[graft] def chunksFor(n: Long): Int = {
    val m = (n + TargetChunkRows - 1) / TargetChunkRows // ceil(n/32)
    val needed = if (m <= 1L) 0
                 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    if (needed <= 10) 6 else if (needed <= 12) 5
    else if (needed <= 15) 4 else if (needed <= 20) 3 else 2
  }
  private[graft] val sqlChunks: String =
    s"""CASE WHEN bl <= 10 THEN 6 WHEN bl <= 12 THEN 5
             WHEN bl <= 15 THEN 4 WHEN bl <= 20 THEN 3 ELSE 2 END"""

  private[graft] def simhashChunkPairs(feat: DataFrame, nChunks: Int)
      : DataFrame = {
    require(60 % nChunks == 0, s"chunk count $nChunks must divide 60")
    val width = 60 / nChunks
    val modV = 1L << width
    def chunks(alias: String): DataFrame =
      feat
        .select(col("doc_id").as(s"${alias}_id"),
          col("simhash").as(s"${alias}_sim"),
          explode(expr(s"transform(sequence(0, ${nChunks - 1}), c -> " +
            s"named_struct('c', c, 'v', shiftright(simhash, $width * c)" +
            s" % ${modV}L))")).as("ch"))
        .select(col(s"${alias}_id"), col(s"${alias}_sim"),
          col("ch.c").as(s"${alias}_c"), col("ch.v").as(s"${alias}_v"))
    val a = chunks("a")
    val b = chunks("b")
    a.join(b, col("a_c") === col("b_c") && col("a_v") === col("b_v")
        && col("a_id") < col("b_id"))
      .select(col("a_id").as("id1"), col("b_id").as("id2"),
        col("a_sim").as("sim1"), col("b_sim").as("sim2"))
      .dropDuplicates("id1", "id2")
      .withColumn("hd", expr("bit_count(sim1 ^ sim2)").cast("long"))
      .filter(col("hd") <= nChunks - 1)
      .select(col("id1"), col("id2"), col("hd"))
      .orderBy(col("id1"), col("id2"))
  }

  def q33SimhashPairs(s: SparkSession, d: String): DataFrame = {
    // persisted fingerprint table: both self-join branches read the same
    // computed simhashes instead of re-running shingling + 60-bit agg
    val feat = withSimhash(Tables.documents(s, d)).persist()
    // chunk count from corpus size (shared session count memo — at 100 TB
    // a catalog-stats lookup), mirroring the oracle's params CTE
    simhashChunkPairs(feat, chunksFor(Tables.rowCount(s, d, "documents")))
  }

  // params CTE derives the chunk count from the same COUNT(*) the Spark
  // side uses (bit-length of ceil(n/32)-1 → ladder CASE — integer-exact
  // on both engines); chunk extraction and the hd bound then read nc
  // instead of the old hard-coded 6×10-bit split.
  val q33Sql: String = sqlSimhash + s""",
    params AS (
      SELECT $sqlChunks AS nc
      FROM (SELECT length(bin((count(*) + ${TargetChunkRows - 1})
                   // $TargetChunkRows - 1)) AS bl FROM documents)),
    ch AS (
      SELECT doc_id, simhash, c,
        (simhash >> ((60 // nc) * c)) % (CAST(1 AS BIGINT) << (60 // nc)) AS v
      FROM sim CROSS JOIN params
      CROSS JOIN (SELECT unnest(range(0, 6)) AS c) cs
      WHERE c < nc),
    cand AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2,
        ANY_VALUE(a.simhash) AS sim1, ANY_VALUE(b.simhash) AS sim2
      FROM ch a JOIN ch b
        ON a.c = b.c AND a.v = b.v AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id1, id2, CAST(bit_count(xor(sim1, sim2)) AS BIGINT) AS hd
    FROM cand CROSS JOIN params
    WHERE bit_count(xor(sim1, sim2)) <= nc - 1
    ORDER BY id1, id2"""

  // ---- q34: char-4-gram Jaccard with minhash band blocking -------------
  // Verification feature: DISTINCT char-4-grams (catches edits word
  // shingles miss). Blocking key: a TWO-seed AND-band of word-shingle
  // minhashes (seeds 'pf:0'/'pf:1', disjoint from q31's) — char-4-gram
  // sets overlap too much across this shared-vocab corpus to block on (a
  // min-4-gram bucket degenerates toward a cross join), while the 2-seed
  // band collides with probability j² (planted near-dups at word-j ~0.97
  // → 0.94 recall; background j ~0.02 → ~0 false candidates — the
  // precision-blocking complement to q31's recall-oriented OR-of-8).
  // Verified at char-gram j >= 0.5: background tops out at ~0.42 on this
  // corpus, planted pairs sit at ~0.9.
  //
  // Grams are carried as longs, not strings (the q31 trick): the per-pair
  // array_intersect inside buckets compares longs instead of 4-char
  // strings, and the persisted feature table shrinks ~4×. Since r3 the
  // long is the [[graft.expressions.CharGram4]] INJECTIVE packing (4 ×
  // 16-bit code units), not an md5 prefix: zero collisions, and ONE
  // rolling codegen pass per row instead of one md5 per character
  // position (this was the dominant cost — ~n_chars md5 calls per doc).
  //
  // Stop-bucket cap (the q154 treatment, r12): a clone-heavy corpus puts
  // every copy of a template into ONE (b1,b2) bucket, and the bucket
  // join's true pair mass grows C(n,2) — the one adversarial growth mode
  // the 30× stress drives measured (q34 was the last candidate generator
  // without a cap). Buckets with more than StopBucketDocs postings are
  // dropped in BOTH engines before the pair join, bounding per-bucket
  // mass at C(25,2). The threshold sits BELOW q154's StopFpDocs = 50 on
  // purpose: a winnowing fingerprint marks one shared substring (common,
  // benign), while a full 2-seed AND-band bucket marks whole-document
  // near-identity — 25+ docs agreeing on BOTH min-signatures is a
  // template/clone farm, not a pairwise-verification workload. Recall
  // effect, documented: pairs inside a dropped bucket are NOT emitted —
  // those families are what the pipeline's exact/keyed dedup stages
  // (q29/q102) collapse FIRST at a fraction of the cost, and q31's
  // OR-of-8 banding still surfaces them for clustering; the verification
  // joiner is the wrong tool for them, same argument as q154's stop
  // fingerprints and q31's band bound.
  private val StopBucketDocs = 25L

  def q34NgramJaccard(s: SparkSession, d: String): DataFrame = {
    graft.expressions.CharGram4.register(s)
    val base = withShingles(Tables.documents(s, d))
      .withColumn("txt", trim(lower(col("text"))))
      .filter(length(col("txt")) >= 4)
      .withColumn("grams", expr("array_distinct(char_gram4(txt))"))
      .withColumn("b1", expr(s"array_min(transform(hv, h -> h ^ ${h60("pf:0")}L))"))
      .withColumn("b2", expr(s"array_min(transform(hv, h -> h ^ ${h60("pf:1")}L))"))
      .select(col("doc_id"), col("grams"), col("b1"), col("b2"))
      .persist()
    // hot-bucket postings drop — the |hot| frame is tiny (clone families
    // only), so the anti-join broadcasts
    val hot = base.groupBy(col("b1"), col("b2"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > StopBucketDocs)
      .select(col("b1"), col("b2"))
    val kept = base.join(broadcast(hot), Seq("b1", "b2"), "left_anti")
    def side(p: String): DataFrame =
      kept.select(col("doc_id").as(s"${p}_id"), col("grams").as(s"${p}_g"),
        col("b1").as(s"${p}_b1"), col("b2").as(s"${p}_b2"))
    val a = side("a")
    val b = side("b")
    a.join(b, col("a_b1") === col("b_b1") && col("a_b2") === col("b_b2")
        && col("a_id") < col("b_id"))
      // single-intersect threshold form — see q31 note
      .filter(size(array_intersect(col("a_g"), col("b_g"))) * 3 >=
        size(col("a_g")) + size(col("b_g")))
      .withColumn("inter",
        size(array_intersect(col("a_g"), col("b_g"))).cast("long"))
      .withColumn("uni",
        (size(col("a_g")) + size(col("b_g"))).cast("long") - col("inter"))
      .select(col("a_id").as("id1"), col("b_id").as("id2"),
        col("inter"), col("uni"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  val q34Sql: String = sqlShingles + s""",
    gm AS (
      SELECT sh.doc_id,
        list_distinct(list_transform(range(1, length(d.txt) - 2),
          i -> (CAST(ord(d.txt[i:i]) AS BIGINT) << 48)
             | (CAST(ord(d.txt[i+1:i+1]) AS BIGINT) << 32)
             | (CAST(ord(d.txt[i+2:i+2]) AS BIGINT) << 16)
             |  CAST(ord(d.txt[i+3:i+3]) AS BIGINT)))
          AS grams,
        list_min(list_transform(sh.hv, h -> xor(h,
          CAST('0x' || substring(md5('pf:0'), 1, 15) AS BIGINT)))) AS b1,
        list_min(list_transform(sh.hv, h -> xor(h,
          CAST('0x' || substring(md5('pf:1'), 1, 15) AS BIGINT)))) AS b2
      FROM sh JOIN (SELECT doc_id, trim(lower(text)) AS txt
                    FROM documents) d ON d.doc_id = sh.doc_id
      WHERE length(d.txt) >= 4),
    hot AS (
      SELECT b1, b2 FROM gm GROUP BY b1, b2
      HAVING COUNT(*) > $StopBucketDocs),
    keep AS (
      SELECT g.* FROM gm g WHERE NOT EXISTS
        (SELECT 1 FROM hot h WHERE h.b1 = g.b1 AND h.b2 = g.b2))
    SELECT a.doc_id AS id1, b.doc_id AS id2,
      CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT) AS inter,
      CAST(len(a.grams) + len(b.grams)
        - len(list_intersect(a.grams, b.grams)) AS BIGINT) AS uni,
      CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
        AS jaccard
    FROM keep a JOIN keep b
      ON a.b1 = b.b1 AND a.b2 = b.b2 AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.grams, b.grams)) * 2 >=
      len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))
    ORDER BY id1, id2"""

  // ---- q60: duplicate clusters via connected components ----------------
  // The near-dup pipeline's FINAL step: verified pairs are edges; the doc
  // to KEEP per cluster is the minimum doc_id of its connected component
  // (pairs alone under-delete: {A~B, B~C} must collapse to one canonical
  // doc even when A~C was never emitted by the LSH).

  /** Min-label propagation to fixpoint — each node's label converges to
    * the smallest doc_id reachable through dup edges. Per iteration: one
    * shuffle join (neighbor-label lookup) + one aggregate; the driver
    * loop runs until an iteration changes nothing. Iteration count is the
    * cluster DIAMETER, not corpus size — near-dup components are
    * clique-ish (every pair the verifier emitted is an edge), so real
    * corpora converge in a handful of rounds regardless of n. At larger
    * diameters switch to large-star/small-star (halves distances per
    * round).
    *
    * Lineage: every `ckptEvery` iterations the label frame is
    * localCheckpoint'ed (eagerly, so the plan roots at the materialized
    * blocks) — without this, a diameter-d component builds a d-deep
    * join lineage that Catalyst re-analyzes each round and that would
    * have to replay from scratch on block loss. localCheckpoint trades
    * executor-loss fault tolerance for speed (the standard iterative-
    * algorithm posture, same as GraphX periodic checkpointing); a
    * cluster deployment that needs recovery sets a reliable checkpoint
    * dir instead. Non-convergence inside `maxIter` is an ERROR —
    * silently returning half-propagated labels would merge clusters
    * wrongly. */
  private[graft] val CcCkptEvery = 5

  private[graft] def connectedComponents(pairs: DataFrame, maxIter: Int = 25,
      ckptEvery: Int = CcCkptEvery): DataFrame = {
    val edges = pairs.select(col("id1").as("u"), col("id2").as("v"))
      .union(pairs.select(col("id2").as("u"), col("id1").as("v")))
      .persist()
    // `cached` is always the handle persist() was called on — unpersist
    // must target that exact plan, not a derived select over it
    var cached = edges.groupBy(col("u").as("id"))
      .agg(min(col("v")).as("nmin"))
      .select(col("id"), least(col("id"), col("nmin")).as("lbl"))
      .persist()
    var labels = cached
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val cand = edges
        .join(labels.select(col("id").as("v"), col("lbl").as("vlbl")), "v")
        .groupBy(col("u").as("id")).agg(min(col("vlbl")).as("cand"))
      // carry the previous label alongside the new one so the convergence
      // check is a filter on `next` itself, not a second join against the
      // old labels frame (halves the per-iteration join count)
      val step = labels
        .join(cand, Seq("id"), "left")
        .select(col("id"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("cand"), col("lbl"))).as("lbl"))
      // periodic lineage cut; eager so downstream plans root at blocks
      val next =
        if (iter % ckptEvery == ckptEvery - 1) step.localCheckpoint(true)
        else step.persist()
      // count(), not isEmpty: isEmpty short-circuits after one changed
      // row, leaving `next` only PARTIALLY materialized — the following
      // unpersist of its parent would then force the uncached partitions
      // to recompute through ckptEvery iterations of dead lineage. The
      // count fully populates the persist before the parent is released.
      converged = next.filter(col("lbl") =!= col("old")).count() == 0L
      cached.unpersist()
      cached = next
      labels = next.select(col("id"), col("lbl"))
      iter += 1
    }
    edges.unpersist()
    if (!converged)
      sys.error(s"connectedComponents: no fixpoint after $maxIter iterations")
    labels.select(col("id").as("doc_id"), col("lbl").as("canon_id"))
  }

  /** Connected components via alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the DEEP-DIAMETER scale path. Min-label propagation
    * ([[connectedComponents]]) needs diameter-many rounds: right for
    * near-dup graphs, whose components are clique-ish (diameter ≈ 2),
    * wrong for chain-shaped link graphs. The star operations rewire
    * every node toward its neighborhood minimum:
    *
    *   large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u
    *   small-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u) ∪ {u},
    *                  v ≤ u, v ≠ m
    *
    * which roughly HALVES component "height" per round — convergence in
    * O(log d) alternations (a diameter-80 chain converges in ~7, spec-
    * pinned) — while each round stays the same two shuffles as one
    * label-prop iteration (a per-node min aggregate + an edge rewrite
    * join). Same lineage posture as connectedComponents: every round
    * localCheckpoints eagerly (the convergence check needs an action
    * anyway), so the plan never deepens. Fixpoint = the small-star edge
    * set is unchanged (count + per-edge hash sum, one action); the final
    * graph is a star forest, labels read off its edges. */
  private[graft] def connectedComponentsStar(pairs: DataFrame,
      maxIter: Int = 30): DataFrame = {
    def sym(e: DataFrame): DataFrame =
      e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
    // (a, b) = canonical undirected edge, a > b (self-loops dropped)
    def canon(e: DataFrame): DataFrame =
      e.filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("a"),
          least(col("u"), col("v")).as("b"))
        .distinct()
    def star(e: DataFrame, large: Boolean): DataFrame = {
      val adj = sym(e)
      val m = adj.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val rewired = adj.join(m, "u")
        .filter(if (large) col("v") > col("u") else col("v") <= col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      val withSelf = if (large) rewired
                     else rewired.union(m.select(col("u"), col("m").as("v")))
      canon(withSelf)
    }
    def sig(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), sum(hash(col("a"), col("b"))
        .cast("long"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var edges = canon(pairs
      .select(col("id1").as("u"), col("id2").as("v"))).localCheckpoint(true)
    var iter = 0
    var converged = false
    var s0 = sig(edges)
    while (!converged && iter < maxIter) {
      val next = star(star(edges, large = true), large = false)
        .localCheckpoint(true)
      val s1 = sig(next)
      converged = s1 == s0
      s0 = s1
      edges.unpersist()
      edges = next
      iter += 1
    }
    if (!converged)
      sys.error(s"connectedComponentsStar: no fixpoint after $maxIter rounds")
    // star forest: every edge is (member, root); roots label themselves
    edges.select(col("a").as("doc_id"), col("b").as("canon_id"))
      .union(edges.select(col("b").as("doc_id"), col("b").as("canon_id"))
        .distinct())
      .distinct()
  }

  def q60DedupGroups(s: SparkSession, d: String): DataFrame = {
    val cc = ccLabels(s, d)
    val sizes = cc.groupBy(col("canon_id"))
      .agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "canon_id")
      .select(col("doc_id"), col("canon_id"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  // Oracle: exact min-reachable label via a recursive transitive closure
  // (fine at oracle SF; the Spark side is the scale path). Reuses the
  // full q31 pair derivation as the edge set. The CTE chain through `cc`
  // is shared with q102, which layers canonical-selection on top.
  /** CTE prefix ending at the verified near-dup edge list `dup_pairs` —
    * shared by the transitive-closure oracle (sqlCc) and the q116 triad
    * census (which needs the edges but not the closure). The RECURSIVE
    * keyword is only exercised by sqlCc's `reach`; DuckDB accepts it
    * unused. */
  private val sqlDupPairs: String = (sqlShingles + s""",
$sqlMhCand,
$sqlJac,
    dup_pairs AS (
      SELECT id1, id2 FROM jac WHERE inter * 2 >= uni)""")
    .replaceFirst("WITH toks", "WITH RECURSIVE toks")

  private val sqlCc: String = {
    sqlDupPairs + """,
    nodes AS (
      SELECT DISTINCT id FROM (
        SELECT id1 AS id FROM dup_pairs
        UNION ALL SELECT id2 FROM dup_pairs)),
    edges AS (
      SELECT id1 AS u, id2 AS v FROM dup_pairs
      UNION ALL SELECT id2, id1 FROM dup_pairs),
    reach(src, node) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.node),
    cc AS (
      SELECT src AS doc_id, MIN(node) AS canon_id FROM reach GROUP BY src)"""
  }

  val q60Sql: String = sqlCc + """,
    sizes AS (
      SELECT canon_id, COUNT(*) AS cluster_size FROM cc GROUP BY canon_id)
    SELECT cc.doc_id, cc.canon_id, sizes.cluster_size
    FROM cc JOIN sizes USING (canon_id)
    ORDER BY cc.doc_id"""

  // ---- q102: canonical selection per dup cluster (keep-best) -----------
  // q60 labels clusters; the curation decision a pipeline actually ships
  // is WHICH copy to keep. Convention here: keep the LONGEST member
  // (token count — near-dups often differ by truncation, and the longest
  // copy preserves the most content), tie-broken to the smallest doc_id.
  // Scale shape: canonical selection adds ONE equi-join (labels ⋈ token
  // counts, keyed by doc_id) and ONE aggregate to the q60 plan. The
  // argmax is max(struct(n_tokens, -doc_id)) — an ordinary partial-
  // aggregatable MAX that collapses map-side, NOT a per-cluster
  // row_number window (no sort of n rows; the same min_by/max_by shape
  // that replaced the IVF assign window in round 5).
  /** THE keep-best survivor rule per dup cluster — longest member,
    * tie-broken to the smallest doc_id, as one partial-aggregatable
    * argmax. Shared by q102 (the report), q164 (shrinkage accounting)
    * and q166 (flow attribution) so a tie-break change can never
    * silently diverge their removed sets. */
  private[graft] def clusterKeepers(s: SparkSession, d: String): DataFrame =
    ccLabels(s, d)
      .join(Tables.documents(s, d).select(col("doc_id"),
        size(split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"))
          .cast("long").as("n_tokens")), "doc_id")
      .groupBy(col("canon_id"))
      .agg(
        max(struct(col("n_tokens").as("nt"),
          (-col("doc_id")).as("nid"))).as("best"),
        count(lit(1)).as("cluster_size"),
        sum(col("n_tokens")).as("cluster_tokens"))
      .select(col("canon_id"), (-col("best.nid")).as("kept_doc_id"),
        col("best.nt").as("kept_tokens"),
        col("cluster_size"), col("cluster_tokens"))

  def q102ClusterCanonical(s: SparkSession, d: String): DataFrame =
    clusterKeepers(s, d).orderBy(col("canon_id"))

  val q102Sql: String = sqlCc + """,
    tok AS (
      SELECT doc_id,
        CAST(len(string_split_regex(trim(lower(text)), '[ \t\n\r\f]+'))
          AS BIGINT) AS n_tokens
      FROM documents),
    j AS (
      SELECT cc.canon_id, cc.doc_id, tok.n_tokens
      FROM cc JOIN tok USING (doc_id)),
    best AS (
      SELECT canon_id, doc_id AS kept_doc_id, n_tokens AS kept_tokens,
        row_number() OVER (PARTITION BY canon_id
          ORDER BY n_tokens DESC, doc_id) AS rk
      FROM j),
    agg AS (
      SELECT canon_id, CAST(COUNT(*) AS BIGINT) AS cluster_size,
        CAST(SUM(n_tokens) AS BIGINT) AS cluster_tokens
      FROM j GROUP BY canon_id)
    SELECT b.canon_id, b.kept_doc_id, b.kept_tokens,
      a.cluster_size, a.cluster_tokens
    FROM best b JOIN agg a USING (canon_id)
    WHERE b.rk = 1 ORDER BY b.canon_id"""

  /** Verified-near-dup predicate over two 60-bit shingle-hash arrays:
    * j >= 0.5 ⟺ 3·|A∩B| >= |A|+|B|, single array_intersect (q31 note). */
  private def jaccardPass: Column =
    size(array_intersect(col("hv1"), col("hv2"))) * 3 >=
      size(col("hv1")) + size(col("hv2"))

  /** Incremental MinHash near-dup against a persisted signature store —
    * [[incrementalDedup]]'s contract extended from exact content identity
    * to q31's verified near-dup semantics, for a standing ingest where
    * each firing must reject paraphrases of anything EVER accepted
    * without rescanning the corpus.
    *
    * Store layout under `storeDir`: `bands/` (doc_id, k, mhv — the 8
    * per-seed minima, the blocking key) and `features/` (doc_id, hv —
    * the shingle hash set, the verification payload). Per firing:
    * within-batch near-dups drop first (band self-join + Jaccard >= 0.5,
    * drop any doc pairing with a smaller id — the same pairwise-local
    * keep rule as q108, no transitive closure); survivors block against
    * the stored bands on (k, mhv), verify against the stored hv, and
    * only the still-novel docs append their bands + features. Rerunning
    * a firing is a no-op: every doc self-matches at j = 1.0.
    *
    * Scale: the batch side is O(batch) everywhere; the store side
    * shuffles on the band key unless the store is bucketed by (k, mhv)
    * — the same posture as incrementalDedup's content_md5 store, with
    * ~8 rows per accepted doc. Docs too short to shingle (< 3 tokens)
    * have no near-dup basis: they pass through every firing unstored —
    * route them through incrementalDedup for exact identity instead.
    * The returned frame is pinned via eager localCheckpoint BEFORE the
    * store appends (the CacheManager.recacheByPath lesson, see
    * [[incrementalDedup]]). */
  def incrementalNearDup(batch: DataFrame, storeDir: String): DataFrame = {
    val staged = incrementalNearDupStaged(batch, storeDir)
    staged.commit()
    staged.novel
  }

  /** [[incrementalNearDup]] with the store appends staged behind
    * [[StagedDedup.commit]] (see there for the crash-ordering
    * rationale). Within the commit, `features/` writes BEFORE `bands/`:
    * the candidate verify join is band→feature inner, so an orphan
    * FEATURE row (crash between the two appends) is unreachable dead
    * data, while an orphan BAND row would silently drop every candidate
    * it blocks in later firings. */
  def incrementalNearDupStaged(batch: DataFrame, storeDir: String)
      : StagedDedup = {
    val s = batch.sparkSession
    val bandsDir = s"$storeDir/bands"
    val featDir = s"$storeDir/features"
    val feat = withShingles(batch)
      .select(col("doc_id"), col("hv"), array(
        (0 until MinhashBands).map(k =>
          struct(lit(k).as("k"), minhashCol(k).as("mhv"))): _*).as("bands"))
      .persist()
    def bandRows(df: DataFrame): DataFrame =
      df.select(col("doc_id"), explode_outer(col("bands")).as("b"))
        .select(col("doc_id"), col("b.k").as("k"), col("b.mhv").as("mhv"))
    val br = bandRows(feat)
    val wCand = br.select(col("doc_id").as("id1"), col("k"), col("mhv"))
      .join(br.select(col("doc_id").as("id2"), col("k"), col("mhv")),
        Seq("k", "mhv"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
    val withinDrop = wCand
      .join(feat.select(col("doc_id").as("id1"), col("hv").as("hv1")), "id1")
      .join(feat.select(col("doc_id").as("id2"), col("hv").as("hv2")), "id2")
      .filter(jaccardPass)
      .select(col("id2").as("doc_id")).distinct()
    val alive = feat.join(withinDrop, Seq("doc_id"), "left_anti")
    val crossDrop =
      if (storeExists(s, bandsDir)) {
        val sb = s.read.parquet(bandsDir)
          .select(col("doc_id").as("s_id"), col("k"), col("mhv"))
        val sf = s.read.parquet(featDir)
          .select(col("doc_id").as("s_id"), col("hv").as("hv2"))
        bandRows(alive).join(sb, Seq("k", "mhv"))
          .select(col("doc_id"), col("s_id")).distinct()
          .join(alive.select(col("doc_id"), col("hv").as("hv1")), "doc_id")
          .join(sf, "s_id")
          .filter(jaccardPass)
          .select(col("doc_id")).distinct()
      } else feat.select(col("doc_id")).limit(0)
    val novelFeat = alive.join(crossDrop, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val novel = batch
      .join(withinDrop.union(crossDrop), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    feat.unpersist()
    StagedDedup(novel, () => {
      novelFeat.select(col("doc_id"), col("hv"))
        .write.mode("append").parquet(featDir)
      bandRows(novelFeat).write.mode("append").parquet(bandsDir)
    })
  }

  // ---- q110: inter-source corpus overlap (MinHash sketch Jaccard) ------
  // The mixing-decision input a pipeline computes before q75/q86: HOW
  // MUCH does source A's content overlap source B's? Exact shingle-set
  // Jaccard between two 10-TB sources is an n×n intersection; the sketch
  // answer is one bottom-sketch per source (per seed k, the min over ALL
  // the source's shingle hashes of H(x)^R_k — the same one-hash family
  // as q30, min-merged across the whole source instead of per doc) and
  // then a seeds-match count per source pair: P(min_a = min_b) = J(A,B),
  // so n_match/K estimates the Jaccard with K=16 seeds (±1/16 lattice).
  //
  // Scale shape: ONE aggregate over the exploded shingle hashes,
  // groupBy(source) with K codegen'd MINs — partial aggregation
  // collapses every partition to |sources| rows map-side, so the shuffle
  // is |sources|×K values no matter how big the corpus. The pair join is
  // sketch×sketch (|sources|² rows) — driver-trivial forever. Estimates
  // are integer-exact (minima + equality counts), so oracle parity is
  // bit-for-bit; only est_jaccard divides, by 2^4, which IEEE represents
  // exactly.
  private[graft] val OverlapSeeds = 16

  def q110CorpusOverlap(s: SparkSession, d: String): DataFrame = {
    val ex = withShingles(Tables.documents(s, d))
      .select(col("source"), explode_outer(col("hv")).as("h"))
    val mins = (0 until OverlapSeeds).map(k =>
      min(expr(s"h ^ ${seedR(k)}L")).as(s"m$k"))
    val sk = ex.groupBy(col("source")).agg(mins.head, mins.tail: _*)
      .select(col("source"), expr(s"stack($OverlapSeeds, " +
        (0 until OverlapSeeds).map(k => s"${k}L, m$k").mkString(", ") +
        ") as (k, m)"))
    val a = sk.select(col("source").as("src_a"), col("k"),
      col("m").as("ma"))
    val b = sk.select(col("source").as("src_b"), col("k"),
      col("m").as("mb"))
    a.join(b, Seq("k")).filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(sum(when(col("ma") === col("mb"), 1L).otherwise(0L))
        .as("n_match"))
      .withColumn("est_jaccard",
        col("n_match").cast("double") / OverlapSeeds)
      .orderBy(col("src_a"), col("src_b"))
  }

  val q110Sql: String = sqlShingles + s""",
    ds AS (
      SELECT d.source, unnest(sh.hv) AS h
      FROM sh JOIN documents d USING (doc_id)),
    mh AS (
      SELECT source, k, MIN(xor(h, rk)) AS m
      FROM ds CROSS JOIN
        (SELECT k, CAST('0x' || substring(md5('seed:' || CAST(k AS VARCHAR)),
           1, 15) AS BIGINT) AS rk
         FROM (SELECT unnest(range(0, $OverlapSeeds)) AS k)) seeds
      GROUP BY source, k),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
        CAST(SUM(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS BIGINT)
          AS n_match
      FROM mh a JOIN mh b ON a.k = b.k AND a.source < b.source
      GROUP BY 1, 2)
    SELECT src_a, src_b, n_match,
      CAST(n_match AS DOUBLE) / $OverlapSeeds AS est_jaccard
    FROM pairs ORDER BY src_a, src_b"""

  // ---- q123: containment pairs (asymmetric overlap / quote detection) --
  // Jaccard misses the "B is INSIDE A" case: a tweet quoted whole in a
  // news page has tiny symmetric similarity but containment(B→A) ≈ 1.
  // Over the SAME banded candidates as q31 (one band join — no new
  // blocking pass), report both directed containments c1 = |∩|/|A|,
  // c2 = |∩|/|B| and keep pairs where either side is >= 60% contained.
  // Honest recall caveat (documented, inherent): band-candidate recall
  // is driven by JACCARD (P[shared minhash] = j), so a tiny doc inside
  // a huge one can evade the bands even at containment 1.0 — the scale
  // fix is more bands or a size-stratified index, the same knob as
  // MinhashBands; the threshold here keeps the contract honest for the
  // pairs the bands do surface.
  def q123ContainmentPairs(s: SparkSession, d: String): DataFrame =
    bandCandidates(s, d)
      // c >= 0.6 as exact integers: 5·inter >= 3·n
      .filter(col("inter") * 5 >= col("n1") * 3 ||
        col("inter") * 5 >= col("n2") * 3)
      .withColumn("c1", col("inter").cast("double") / col("n1"))
      .withColumn("c2", col("inter").cast("double") / col("n2"))
      .select(col("id1"), col("id2"), col("inter"), col("n1"), col("n2"),
        col("c1"), col("c2"))
      .orderBy(col("id1"), col("id2"))

  val q123Sql: String = sqlShingles + s""",
$sqlMhCand,
    m AS (
      SELECT id1, id2,
        CAST(len(list_intersect(sa.hv, sb.hv)) AS BIGINT) AS inter,
        CAST(len(sa.hv) AS BIGINT) AS n1,
        CAST(len(sb.hv) AS BIGINT) AS n2
      FROM cand
      JOIN sh sa ON sa.doc_id = id1
      JOIN sh sb ON sb.doc_id = id2)
    SELECT id1, id2, inter, n1, n2,
      CAST(inter AS DOUBLE) / n1 AS c1,
      CAST(inter AS DOUBLE) / n2 AS c2
    FROM m WHERE inter * 5 >= n1 * 3 OR inter * 5 >= n2 * 3
    ORDER BY id1, id2"""

  // ---- q116: triad census of the near-dup graph -------------------------
  // Structural validation of the dedup pipeline's core assumption: q60's
  // min-label CC is the right algorithm only while near-dup components
  // are CLIQUE-ish (diameter ≈ 2); chain-shaped graphs need the star
  // variant. The census quantifies that: wedges = Σ_v C(deg v, 2),
  // triangles by ordered-edge enumeration (a<b<c — each triangle counted
  // once, no orientation pass needed because the pair list is already
  // canonical), global clustering = 3·T / wedges. All integers until the
  // single final division.
  //
  // Scale shape: degrees are one groupBy over edge endpoints (map-side
  // partials); the triangle join is edges⋈edges on the shared vertex
  // then a closing-edge equi-join — work bounded by Σ deg², i.e. by the
  // dup-cluster size distribution, which curation keeps small (a
  // mega-cluster means the corpus has a bigger problem than this query).
  // The three scalar aggregates attach via 1-row broadcast cross joins.
  def q116TriadCensus(s: SparkSession, d: String): DataFrame = {
    val e = dupPairs(s, d)
      .select(col("id1").as("a"), col("id2").as("b")).persist()
    val nodesEdges = e.select(col("a").as("v")).union(
      e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .agg(count(lit(1)).as("n_triangles"))
    nodesEdges.crossJoin(broadcast(edges)).crossJoin(broadcast(tri))
      .withColumn("clustering",
        (col("n_triangles") * 3).cast("double") / col("n_wedges"))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"), col("clustering"))
  }

  val q116Sql: String = sqlDupPairs + """,
    deg AS (
      SELECT v, COUNT(*) AS deg FROM (
        SELECT id1 AS v FROM dup_pairs
        UNION ALL SELECT id2 FROM dup_pairs)
      GROUP BY v),
    ne AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
        CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
      FROM deg),
    ec AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM dup_pairs),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM dup_pairs e1
      JOIN dup_pairs e2 ON e1.id2 = e2.id1
      JOIN dup_pairs e3 ON e3.id1 = e1.id1 AND e3.id2 = e2.id2)
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
      CAST(n_triangles * 3 AS DOUBLE) / n_wedges AS clustering
    FROM ne CROSS JOIN ec CROSS JOIN tri"""

  // ---- q154: winnowing fingerprints (MOSS-style robust minimizers) -----
  // Schleimer/Wilkerson/Aiken (SIGMOD 2003) winnowing, the MOSS
  // plagiarism-detector kernel and the third fingerprinting family next
  // to minhash (q31, set-similarity) and simhash (q33, bit-similarity):
  // hash every word K-gram, slide a window of W consecutive gram hashes,
  // keep each window's MINIMUM — the kept values are the document's
  // fingerprints. Guarantee: any shared token run of length >= W + K - 1
  // tokens shares at least one fingerprint, while only ~2/(W+1) of the
  // grams are stored — position-robust partial-overlap detection (a
  // paragraph pasted into a different document still collides), which
  // whole-set minhash dilutes and simhash averages away.
  //
  // Candidate generation is the standard index shape: explode distinct
  // fingerprints, drop "stop fingerprints" shared by > StopFpDocs docs
  // (boilerplate — the exploding-bucket guard, same role as q31's band
  // bound), then a fingerprint equi-join (id1 < id2) counting shared
  // fingerprints per pair; containment vs the SMALLER doc's fingerprint
  // count, in exact ppm.
  //
  // Scale shape: per-row array HOFs (gram hash, window min) until the
  // fingerprint explode; one groupBy(fp) for document frequency; one
  // fp-keyed equi-join bounded by StopFpDocs per bucket — never
  // all-pairs. At 100 TB this is the Dolma/MOSS span-index build: the
  // fingerprint postings list IS the shuffle, capped per key.
  private[graft] val WinnowK = 4 // gram width (tokens)
  private[graft] val WinnowW = 4 // window (grams per window)
  private val StopFpDocs = 50L

  def q154Winnowing(s: SparkSession, d: String): DataFrame = {
    graft.expressions.Hash60.register(s)
    val (k, w) = (WinnowK, WinnowW)
    // The gram-hash frame is PINNED before the window-min pass: without
    // the barrier, projection collapse re-inlines the O(len) md5 gram
    // expression into the window lambda (subexpression elimination does
    // not reach through lambda scopes — the q26 lesson), making each doc
    // O(len²) md5 calls: measured 223 s vs ~2 s at sf0.1. Compact
    // integer arrays (~8·len bytes/doc), the q107 persist rule.
    val gh = Tables.documents(s, d)
      .withColumn("t",
        filter(split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"),
          x => x =!= lit("")))
      .filter(size(col("t")) >= k + w - 1)
      .withColumn("gh", expr(
        s"transform(sequence(1, size(t) - ${k - 1})," +
          s" i -> h60(concat_ws(' ', slice(t, i, $k))))"))
      .select(col("doc_id"), col("gh"))
      .persist()
    val fps = gh
      .withColumn("fp", expr(
        s"array_distinct(transform(sequence(1, size(gh) - ${w - 1})," +
          s" i -> array_min(slice(gh, i, $w))))"))
      .withColumn("n_fp", size(col("fp")).cast("long"))
      .select(col("doc_id"), col("n_fp"), explode(col("fp")).as("fp"))
      .persist() // df pass + pair join share the fingerprint postings
    val hot = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > StopFpDocs)
      .select(col("fp"))
    val clean = fps.join(hot, Seq("fp"), "left_anti")
    clean.select(col("fp"), col("doc_id").as("id1"),
        col("n_fp").as("n_fp1"))
      .join(clean.select(col("fp"), col("doc_id").as("id2"),
        col("n_fp").as("n_fp2")), Seq("fp"))
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"), col("n_fp1"), col("n_fp2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .withColumn("contain_ppm",
        expr("n_shared * 1000000 div least(n_fp1, n_fp2)"))
      .select(col("id1"), col("id2"), col("n_fp1"), col("n_fp2"),
        col("n_shared"), col("contain_ppm"))
      .orderBy(col("id1"), col("id2"))
  }

  val q154Sql: String = {
    val (k, w) = (WinnowK, WinnowW)
    raw"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(trim(lower(text)),
        '[ \t\n\r\f]+'), x -> x <> '') AS t
      FROM documents),
    gh AS (
      SELECT doc_id,
        list_transform(range(1, len(t) - ${k - 2}), i ->
          CAST('0x' || substring(md5(array_to_string(t[i:i+${k - 1}], ' ')),
            1, 15) AS BIGINT)) AS gh
      FROM toks WHERE len(t) >= ${k + w - 1}),
    fpx AS (
      SELECT doc_id, CAST(len(fpl) AS BIGINT) AS n_fp, unnest(fpl) AS fp
      FROM (SELECT doc_id,
              list_distinct(list_transform(range(1, len(gh) - ${w - 2}),
                i -> list_min(gh[i:i+${w - 1}]))) AS fpl
            FROM gh)),
    hot AS (SELECT fp FROM fpx GROUP BY fp HAVING COUNT(*) > $StopFpDocs),
    clean AS (SELECT * FROM fpx WHERE fp NOT IN (SELECT fp FROM hot))
    SELECT a.doc_id AS id1, b.doc_id AS id2,
      a.n_fp AS n_fp1, b.n_fp AS n_fp2,
      CAST(COUNT(*) AS BIGINT) AS n_shared,
      CAST(COUNT(*) * 1000000 // LEAST(a.n_fp, b.n_fp) AS BIGINT)
        AS contain_ppm
    FROM clean a JOIN clean b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id, a.n_fp, b.n_fp
    HAVING COUNT(*) >= 2
    ORDER BY id1, id2"""
  }

  // ---- q156: dup-cluster tightness audit --------------------------------
  // The quality gate ON the dedup pipeline itself: q60's min-label CC is
  // only the right clustering while components are clique-ish, and a
  // "cluster" glued together by one weak chain edge deletes documents
  // that are NOT near-dups of the kept canonical. Per cluster: member
  // count, verified-edge count, edge coverage vs the C(n,2) clique bound
  // (exact ppm), and the min/sum of the member-pair Jaccards — clusters
  // band as clique (every pair verified), dense (>= half), or chained
  // (the transitive-glue risk class a curation run should re-verify
  // before deleting).
  //
  // Scale shape: rides the pinned band-candidate and cc-label stages
  // (zero new corpus scans); one edge->label equi-join keyed by doc_id,
  // two bounded aggregates (clusters, not docs). The same monitor
  // family as q116's triad census, resolved per cluster instead of
  // globally.
  def q156ClusterTightness(s: SparkSession, d: String): DataFrame = {
    val edges = bandCandidates(s, d)
      .filter(col("inter") * 3 >= col("n1") + col("n2"))
      .withColumn("uni", col("n1") + col("n2") - col("inter"))
      .withColumn("j_ppm", expr("inter * 1000000 div uni"))
      .select(col("id1"), col("id2"), col("j_ppm"))
    val cc = ccLabels(s, d)
    val members = cc.groupBy(col("canon_id"))
      .agg(count(lit(1)).as("n_members"))
    val perCluster = edges
      .join(cc.withColumnRenamed("doc_id", "id1"), "id1")
      .groupBy(col("canon_id"))
      .agg(count(lit(1)).as("n_edges"),
        min(col("j_ppm")).as("min_j_ppm"),
        sum(col("j_ppm")).as("sum_j_ppm"))
    members.join(perCluster, Seq("canon_id"))
      .filter(col("n_members") >= 2)
      .withColumn("edge_cov_ppm", expr(
        "n_edges * 1000000 div (n_members * (n_members - 1) div 2)"))
      .withColumn("tightness_band",
        when(col("edge_cov_ppm") === 1000000L, "clique")
          .when(col("edge_cov_ppm") * 2L >= 1000000L, "dense")
          .otherwise("chained"))
      .select(col("canon_id"), col("n_members"), col("n_edges"),
        col("edge_cov_ppm"), col("min_j_ppm"), col("sum_j_ppm"),
        col("tightness_band"))
      .orderBy(col("canon_id"))
  }

  val q156Sql: String = sqlCc + """,
    ep AS (
      SELECT id1, id2, CAST(inter * 1000000 // uni AS BIGINT) AS j_ppm
      FROM jac WHERE inter * 2 >= uni),
    mem AS (
      SELECT canon_id, CAST(COUNT(*) AS BIGINT) AS n_members
      FROM cc GROUP BY 1),
    ea AS (
      SELECT cc.canon_id, CAST(COUNT(*) AS BIGINT) AS n_edges,
        CAST(MIN(j_ppm) AS BIGINT) AS min_j_ppm,
        CAST(SUM(j_ppm) AS BIGINT) AS sum_j_ppm
      FROM ep JOIN cc ON cc.doc_id = ep.id1 GROUP BY 1)
    SELECT canon_id, n_members, n_edges,
      CAST(n_edges * 1000000 // (n_members * (n_members - 1) // 2)
        AS BIGINT) AS edge_cov_ppm,
      min_j_ppm, sum_j_ppm,
      CASE WHEN n_edges * 1000000 // (n_members * (n_members - 1) // 2)
             = 1000000 THEN 'clique'
           WHEN (n_edges * 1000000 // (n_members * (n_members - 1) // 2))
             * 2 >= 1000000 THEN 'dense'
           ELSE 'chained' END AS tightness_band
    FROM mem JOIN ea USING (canon_id)
    WHERE n_members >= 2
    ORDER BY canon_id"""

  // ---- q162: train/val/test split leakage via near-dup pairs -----------
  // The "dedup before split" audit: a near-duplicate pair that straddles
  // q91's deterministic train/val/test split is eval contamination —
  // the model sees (a paraphrase of) the test doc in training. Takes
  // q31's verified pair set (Jaccard ≥ 1/2 off the pinned band-candidate
  // stage), labels BOTH endpoints with q91's exact split rule as a
  // per-row hash expression (no join — the split is a pure function of
  // doc_id), normalizes each pair to an unordered (split_a ≤ split_b)
  // cell, and reports the 6-cell leakage ledger with exact ppm shares.
  // Any is_leak row with n_pairs > 0 means the split was cut before
  // dedup — the fix is re-splitting on dup-cluster canon_id, not doc_id.
  //
  // Scale shape: rides the pinned bucket-equi-join candidate stage
  // (never all-pairs), per-row split hashing, one map-side-combining
  // groupBy onto ≤6 cells, 1-row broadcast total.
  def q162SplitLeakage(s: SparkSession, d: String): DataFrame = {
    graft.expressions.Hash60.register(s)
    val cells = bandCandidates(s, d)
      .filter(col("inter") * 3 >= col("n1") + col("n2"))
      .withColumn("s1", SqlOps.splitOf("id1"))
      .withColumn("s2", SqlOps.splitOf("id2"))
      .groupBy(least(col("s1"), col("s2")).as("split_a"),
        greatest(col("s1"), col("s2")).as("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
    val tot = cells.agg(sum(col("n_pairs")).as("t"))
    cells.crossJoin(broadcast(tot))
      // pair counts grow quadratically in clone-heavy corpora:
      // n_pairs·10⁶ on Decimal(38,0) so the share stays exact past the
      // ~9e12-pair Long wrap (the q153 convention)
      .withColumn("share_ppm",
        expr("cast(n_pairs as decimal(38,0)) * 1000000 div t"))
      .withColumn("is_leak", col("split_a") =!= col("split_b"))
      .select(col("split_a"), col("split_b"), col("n_pairs"),
        col("share_ppm"), col("is_leak"))
      .orderBy(col("split_a"), col("split_b"))
  }

  val q162Sql: String = sqlShingles + s""",
$sqlMhCand,
$sqlJac,
    lab AS (
      SELECT
        CASE WHEN CAST('0x' || substring(md5('split:' ||
            CAST(id1 AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 90
          THEN 'train'
          WHEN CAST('0x' || substring(md5('split:' ||
            CAST(id1 AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 95
          THEN 'val' ELSE 'test' END AS s1,
        CASE WHEN CAST('0x' || substring(md5('split:' ||
            CAST(id2 AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 90
          THEN 'train'
          WHEN CAST('0x' || substring(md5('split:' ||
            CAST(id2 AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 95
          THEN 'val' ELSE 'test' END AS s2
      FROM jac WHERE inter * 2 >= uni),
    cells AS (
      SELECT least(s1, s2) AS split_a, greatest(s1, s2) AS split_b,
        CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM lab GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS t FROM cells)
    SELECT split_a, split_b, n_pairs,
      CAST(n_pairs * 1000000 // t AS BIGINT) AS share_ppm,
      split_a <> split_b AS is_leak
    FROM cells CROSS JOIN tot ORDER BY split_a, split_b"""

  // ---- q163: cluster-aware split accounting (q162's documented fix) ----
  // Splitting on doc_id leaks near-dups across train/val/test (q162
  // measures it); the fix is to split on the dup-cluster CANONICAL id,
  // so whole clusters land in one split — by construction zero verified
  // pairs straddle splits (every q31 pair is an edge inside one
  // component; spec-pinned invariant). This op reports what that costs:
  // per split, the doc and cluster mass under canon-keyed hashing vs the
  // 90/5/5 target — cluster-splitting moves docs in whole-cluster units,
  // so realized shares drift from the per-doc target by the cluster-size
  // distribution.
  //
  // Scale shape: one corpus id scan LEFT-joined to the pinned cc-label
  // stage (doc-keyed attribute join; unlabeled docs are their own
  // canon), per-row split hashing, one partial-aggregating groupBy onto
  // 3 cells (COUNT + partial-merged COUNT DISTINCT canon), 1-row
  // broadcast total.
  def q163ClusterSplit(s: SparkSession, d: String): DataFrame = {
    graft.expressions.Hash60.register(s)
    val cells = Tables.documents(s, d).select(col("doc_id"))
      .join(ccLabels(s, d), Seq("doc_id"), "left")
      .withColumn("canon", coalesce(col("canon_id"), col("doc_id")))
      .withColumn("split", SqlOps.splitOf("canon"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canon")).as("n_clusters"))
    val tot = cells.agg(sum(col("n_docs")).as("t"))
    cells.crossJoin(broadcast(tot))
      .withColumn("doc_ppm", expr("n_docs * 1000000 div t"))
      .withColumn("target_ppm",
        when(col("split") === "train", 900000L).otherwise(50000L))
      .withColumn("dev_ppm", abs(col("doc_ppm") - col("target_ppm")))
      .withColumn("size_band",
        when(col("dev_ppm") <= 20000L, "on_target").otherwise("shifted"))
      .select(col("split"), col("n_docs"), col("n_clusters"),
        col("doc_ppm"), col("target_ppm"), col("dev_ppm"),
        col("size_band"))
      .orderBy(col("split"))
  }

  val q163Sql: String = sqlCc + """,
    base AS (
      SELECT d.doc_id, COALESCE(cc.canon_id, d.doc_id) AS canon
      FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id),
    labeled AS (
      SELECT canon,
        CASE WHEN CAST('0x' || substring(md5('split:' ||
            CAST(canon AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 90
          THEN 'train'
          WHEN CAST('0x' || substring(md5('split:' ||
            CAST(canon AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 95
          THEN 'val' ELSE 'test' END AS split
      FROM base),
    cells AS (
      SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_clusters
      FROM labeled GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS t FROM cells)
    SELECT split, n_docs, n_clusters,
      CAST(n_docs * 1000000 // t AS BIGINT) AS doc_ppm,
      CAST(CASE WHEN split = 'train' THEN 900000 ELSE 50000 END
        AS BIGINT) AS target_ppm,
      CAST(abs(n_docs * 1000000 // t
        - CASE WHEN split = 'train' THEN 900000 ELSE 50000 END)
        AS BIGINT) AS dev_ppm,
      CASE WHEN abs(n_docs * 1000000 // t
          - CASE WHEN split = 'train' THEN 900000 ELSE 50000 END)
          <= 20000 THEN 'on_target'
        ELSE 'shifted' END AS size_band
    FROM cells CROSS JOIN tot ORDER BY split"""

  // ---- q164: per-source dedup shrinkage report -------------------------
  // What near-dup removal actually COSTS each source: with q102's
  // keep-best rule (longest member, tie-min id), how many docs and how
  // much token mass does each source lose? The capacity-planning twin of
  // q60/q102 — the pipeline's "dedup took 12% of src07" report, and the
  // input a mixing stage (q75/q140) needs to re-weight AFTER dedup. All
  // ratios exact ppm.
  //
  // Scale shape: corpus scan aggregated per source (map-side combine) +
  // the CLUSTERED SUBSET only (inner join with the pinned cc labels,
  // then the cluster-keyed keeper join) aggregated per source, stitched
  // with a |sources|-row left join. The removed-flag join never runs
  // corpus-wide on a mostly-null canon key — null-keyed rows would all
  // hash to one partition at 100 TB; the inner-join-then-stitch shape
  // keeps every shuffle key dense.
  def q164SourceShrinkage(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
      size(split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"))
        .cast("long").as("n_tokens"))
    val keepers = clusterKeepers(s, d)
      .select(col("canon_id"), col("kept_doc_id"))
    val cl = docs.join(ccLabels(s, d), "doc_id")
      .join(keepers, "canon_id")
      .withColumn("removed", col("doc_id") =!= col("kept_doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_clustered"),
        sum(when(col("removed"), 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("removed"), col("n_tokens")).otherwise(0L))
          .as("tok_removed"))
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok_total"))
      .join(cl, Seq("source"), "left")
      .na.fill(0L, Seq("n_clustered", "n_removed", "tok_removed"))
      // ppm numerators on Decimal(38,0): tok_removed·10⁶ wraps a Long
      // at ~9e12 tokens (≈36 TB of text) while the oracle's SUM is
      // HUGEINT — the q153 large-scale convention
      .withColumn("shrink_ppm",
        expr("cast(n_removed as decimal(38,0)) * 1000000 div n_docs"))
      .withColumn("tok_shrink_ppm",
        expr("cast(tok_removed as decimal(38,0)) * 1000000 div tok_total"))
      .withColumn("shrink_band",
        when(col("shrink_ppm") >= 100000L, "heavy")
          .when(col("shrink_ppm") >= 20000L, "moderate")
          .otherwise("light"))
      .select(col("source"), col("n_docs"), col("n_clustered"),
        col("n_removed"), col("shrink_ppm"), col("tok_shrink_ppm"),
        col("shrink_band"))
      .orderBy(col("source"))
  }

  val q164Sql: String = sqlCc + """,
    tok AS (
      SELECT doc_id, source,
        CAST(len(string_split_regex(trim(lower(text)), '[ \t\n\r\f]+'))
          AS BIGINT) AS n_tokens
      FROM documents),
    ranked AS (
      SELECT cc.canon_id, cc.doc_id,
        row_number() OVER (PARTITION BY cc.canon_id
          ORDER BY tok.n_tokens DESC, cc.doc_id) AS rk
      FROM cc JOIN tok USING (doc_id)),
    best AS (
      SELECT canon_id, doc_id AS kept_doc_id FROM ranked WHERE rk = 1),
    cl AS (
      SELECT tok.source,
        CAST(COUNT(*) AS BIGINT) AS n_clustered,
        CAST(SUM(CASE WHEN tok.doc_id <> best.kept_doc_id
          THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        CAST(SUM(CASE WHEN tok.doc_id <> best.kept_doc_id
          THEN tok.n_tokens ELSE 0 END) AS BIGINT) AS tok_removed
      FROM cc JOIN tok USING (doc_id) JOIN best USING (canon_id)
      GROUP BY 1),
    tot AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS tok_total
      FROM tok GROUP BY 1)
    SELECT tot.source, n_docs,
      COALESCE(n_clustered, 0) AS n_clustered,
      COALESCE(n_removed, 0) AS n_removed,
      CAST(COALESCE(n_removed, 0) * 1000000 // n_docs AS BIGINT)
        AS shrink_ppm,
      CAST(COALESCE(tok_removed, 0) * 1000000 // tok_total AS BIGINT)
        AS tok_shrink_ppm,
      CASE WHEN COALESCE(n_removed, 0) * 1000000 // n_docs >= 100000
             THEN 'heavy'
           WHEN COALESCE(n_removed, 0) * 1000000 // n_docs >= 20000
             THEN 'moderate'
           ELSE 'light' END AS shrink_band
    FROM tot LEFT JOIN cl USING (source) ORDER BY source"""

  // ---- q166: cross-source duplication flow matrix ----------------------
  // q164 totals what each source LOSES; this shows WHERE the kept copy
  // lives: for every removed near-dup, the (keeper's source → removed
  // doc's source) cell — 'self' cells are intra-source boilerplate,
  // 'cross' cells are mirroring/syndication (one source republishing
  // another's content), the signal that decides which source to
  // de-prioritize at crawl time rather than paying dedup for it. Exact
  // ppm shares of all removals; q110's sketch estimates the overlap,
  // this is the exact decision ledger over the verified clusters.
  //
  // Scale shape: the clustered subset only (pinned cc labels + the
  // cluster-keyed keeper argmax), two doc-keyed equi-joins to a 2-column
  // source projection, one map-side-combining groupBy onto ≤|sources|²
  // cells, 1-row broadcast total.
  def q166DupFlow(s: SparkSession, d: String): DataFrame = {
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val keepers = clusterKeepers(s, d)
      .select(col("canon_id"), col("kept_doc_id"))
    val cells = ccLabels(s, d)
      .join(keepers, "canon_id")
      .filter(col("doc_id") =!= col("kept_doc_id"))
      .join(src, "doc_id")
      .withColumnRenamed("source", "src_removed")
      .join(src.select(col("doc_id").as("kept_doc_id"),
        col("source").as("src_kept")), "kept_doc_id")
      .groupBy(col("src_kept"), col("src_removed"))
      .agg(count(lit(1)).as("n_removed"))
    val tot = cells.agg(sum(col("n_removed")).as("t"))
    cells.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("n_removed * 1000000 div t"))
      .withColumn("flow", when(col("src_kept") === col("src_removed"),
        "self").otherwise("cross"))
      .select(col("src_kept"), col("src_removed"), col("n_removed"),
        col("share_ppm"), col("flow"))
      .orderBy(col("src_kept"), col("src_removed"))
  }

  val q166Sql: String = sqlCc + """,
    tok AS (
      SELECT doc_id, source,
        CAST(len(string_split_regex(trim(lower(text)), '[ \t\n\r\f]+'))
          AS BIGINT) AS n_tokens
      FROM documents),
    ranked AS (
      SELECT cc.canon_id, cc.doc_id,
        row_number() OVER (PARTITION BY cc.canon_id
          ORDER BY tok.n_tokens DESC, cc.doc_id) AS rk
      FROM cc JOIN tok USING (doc_id)),
    best AS (
      SELECT canon_id, doc_id AS kept_doc_id FROM ranked WHERE rk = 1),
    flows AS (
      SELECT k.source AS src_kept, r.source AS src_removed,
        CAST(COUNT(*) AS BIGINT) AS n_removed
      FROM cc
      JOIN best USING (canon_id)
      JOIN tok r ON r.doc_id = cc.doc_id
      JOIN tok k ON k.doc_id = best.kept_doc_id
      WHERE cc.doc_id <> best.kept_doc_id
      GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(n_removed) AS BIGINT) AS t FROM flows)
    SELECT src_kept, src_removed, n_removed,
      CAST(n_removed * 1000000 // t AS BIGINT) AS share_ppm,
      CASE WHEN src_kept = src_removed THEN 'self' ELSE 'cross' END
        AS flow
    FROM flows CROSS JOIN tot ORDER BY src_kept, src_removed"""

  // ---- q167: template-skeleton dedup groups ----------------------------
  // The STRUCTURAL dedup axis word-level Jaccard misses: collapse every
  // letter-run to 'w' and digit-run to 'n' (whitespace normalized), so
  // two form/template pages with entirely different content words but
  // the same punctuation/layout skeleton collide — the template-farm
  // page class C4-style boilerplate filters target. Groups of ≥2 docs
  // per skeleton md5, with doc/source counts, char mass, and the
  // lexicographic-min member as the inspectable example.
  //
  // Scale shape: per-row regex collapse at the scan, one md5-keyed
  // groupBy (the q29 exact-dedup shuffle class — map-side combined,
  // key cardinality ≤ distinct skeletons), output ∝ groups not corpus.
  def q167TemplateSkeleton(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("sk_md5", md5(
        regexp_replace(regexp_replace(regexp_replace(lower(col("text")),
          "[a-z]+", "w"), "[0-9]+", "n"), "[ \\t\\n\\r\\f]+", " ")))
      .groupBy(col("sk_md5"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("char_mass"),
        min(col("doc_id")).as("example_doc"))
      .filter(col("n_docs") >= 2L)
      .withColumn("band",
        when(col("n_docs") >= 10L, "template_farm")
          .otherwise("repeated_form"))
      .select(col("sk_md5"), col("n_docs"), col("n_sources"),
        col("char_mass"), col("example_doc"), col("band"))
      .orderBy(col("sk_md5"))

  val q167Sql: String = raw"""
    WITH sk AS (
      SELECT doc_id, source, n_chars,
        md5(regexp_replace(regexp_replace(regexp_replace(lower(text),
          '[a-z]+', 'w', 'g'), '[0-9]+', 'n', 'g'),
          '[ \t\n\r\f]+', ' ', 'g')) AS sk_md5
      FROM documents)
    SELECT sk_md5, CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
      CAST(SUM(n_chars) AS BIGINT) AS char_mass,
      CAST(MIN(doc_id) AS BIGINT) AS example_doc,
      CASE WHEN COUNT(*) >= 10 THEN 'template_farm'
        ELSE 'repeated_form' END AS band
    FROM sk GROUP BY sk_md5 HAVING COUNT(*) >= 2
    ORDER BY sk_md5"""

  // ---- q199: all-pairs set-similarity join via prefix filtering --------
  // The EXACT-recall complement of the LSH candidate generators (q31/q33/
  // q34 trade recall for bucket-bounded candidates; their measured recall
  // is q183's whole job): the SSJoin/All-Pairs prefix filter generates a
  // PROVABLY COMPLETE candidate set for shingle-set Jaccard ≥ θ with no
  // all-pairs comparison. Canonical order = ascending global document
  // frequency (rarest first, ties by word — a total order shared by every
  // doc); a doc of n tokens exposes only its first n − ceil(θn) + 1
  // tokens: any qualifying pair must share overlap ≥ ceil(θ·n) under
  // J ≥ θ, and the smallest common token in the canonical order provably
  // sits inside BOTH prefixes, so the prefix-token equi-join loses
  // nothing. θ = 4/5 exactly, so ceil(θn) = (4n+4) div 5 and the
  // J ≥ θ test is integer: floor(inter·10⁶/uni) ≥ 800000 ⟺ J ≥ 0.8.
  // The length filter (4·n_a ≤ 5·n_b and symmetric — implied by J ≥ θ)
  // prunes inside the join condition. Because generation is complete and
  // verification exact, the ORACLE IS GROUND TRUTH (a plain all-common-
  // token pair count), not an algorithm twin — the strongest check a
  // similarity join here has.
  //
  // Scale shape: one vocab-keyed df join + one doc-keyed groupBy to build
  // ordered sets; candidates come from an equi-join keyed on PREFIX
  // tokens only — rare tokens by construction, so bucket sizes are the
  // smallest of any key choice; verification touches candidate pairs
  // only. Pair-family growth on clone corpora is the q154/q194
  // adjudicated class (shared-mass, sub-quadratic).
  private[graft] val AllPairsThetaPpm = 800000L // θ = 4/5 exactly

  def q199AllPairsJoin(s: SparkSession, d: String): DataFrame = {
    // Set domain = word 3-gram shingles, not unigram tokens: long docs
    // drawn from one topical vocabulary saturate unigram-SET Jaccard
    // (measured on this corpus: 24% of ALL doc pairs ≥ 0.8 on unigram
    // sets — a quadratic output with no dedup meaning — vs clone pairs
    // only on 3-gram shingles, matching the q31/q34 families' notion of
    // near-duplication). Word order re-enters through the shingle, which
    // is exactly what separates paraphrase-level overlap from clones.
    // Shingles are HASHED with the portable h60 (q154's gram convention)
    // so the corpus-sized explode/joins below carry 8-byte longs, not
    // ~40-char strings: the string-shingle variant spent ~10 s/scan
    // materializing and shuffling shingle text at sf0.1. The hash frame
    // is pinned — the df pass and the ordered build both consume it
    // (q154's projection-collapse lesson).
    graft.expressions.Hash60.register(s)
    val docs = Tables.documents(s, d)
      .withColumn("t",
        filter(TextOps.toks(col("text")), x => x =!= lit("")))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(1, size(t) - 2)," +
          " i -> h60(concat_ws(' ', slice(t, i, 3))))")).as("ts"))
      .persist()
    val ex = docs.select(col("doc_id"), explode(col("ts")).as("w"))
    val dfreq = ex.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val ordered = ex.join(dfreq, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("w")))).as("sw"))
      .withColumn("tokens", expr("transform(sw, x -> x.w)"))
      .withColumn("n", size(col("tokens")).cast("long"))
      .withColumn("pfx", expr(
        "slice(tokens, 1, cast(n - ((4 * n + 4) div 5) + 1 as int))"))
      .select(col("doc_id"), col("tokens"), col("n"), col("pfx"))
      .persist() // probe sides + verification share it (caller contract)
    // PPJoin positional filter: a candidate row matched on a prefix
    // token at (1-based) positions (pa, pb) can only realize overlap
    // ≤ min(n_a − pa, n_b − pb) + 1 when that token is the pair's FIRST
    // common token — and for a qualifying pair the first-common-token
    // row always satisfies the α = ceil(4(n_a+n_b)/9) overlap bound
    // (θ/(1+θ) with θ = 4/5), so pruning every row by its own positional
    // bound keeps completeness. A/B on the clone-clique fixture: parity
    // (8.9 s both ways at sf0.1) — there nearly every candidate IS a
    // true pair, so the cost is the 2.9M-pair verification/output mass
    // itself, which no candidate filter can shrink. Kept anyway: it is
    // free inside the join condition and prunes the standard SSJoin
    // adversary — low-similarity sets whose only shared prefix tokens
    // sit deep, where the residual-overlap bound cannot reach α.
    // 9·bound ≥ 4·(n_a+n_b) avoids the ceil.
    val probes = ordered.select(col("doc_id"), col("n"),
      posexplode(col("pfx")).as(Seq("p0", "w")))
      .withColumn("p1", col("p0") + 1).drop("p0")
    val cand = probes.as("a").join(probes.as("b"),
        col("a.w") === col("b.w") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * 4 <= col("b.n") * 5 &&
          col("b.n") * 4 <= col("a.n") * 5 &&
          (least(col("a.n") - col("a.p1"), col("b.n") - col("b.p1"))
            + 1) * 9 >= (col("a.n") + col("b.n")) * 4)
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    cand
      .join(ordered.select(col("doc_id").as("da"), col("tokens").as("ta"),
        col("n").as("n_a")), Seq("da"))
      .join(ordered.select(col("doc_id").as("db"), col("tokens").as("tb"),
        col("n").as("n_b")), Seq("db"))
      .withColumn("inter",
        size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .withColumn("jacc_ppm", expr("inter * 1000000 div uni"))
      .filter(col("jacc_ppm") >= AllPairsThetaPpm)
      .select(col("da").as("doc_a"), col("db").as("doc_b"), col("n_a"),
        col("n_b"), col("inter"), col("uni"), col("jacc_ppm"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val q199Sql: String = raw"""
    WITH tk AS (
      SELECT doc_id, list_filter(string_split_regex(
        trim(lower(text)), '[ \t\n\r\f]+'), x -> x <> '') AS t
      FROM documents),
    t AS (
      SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        i -> CAST('0x' || substring(md5(array_to_string(t[i:i+2], ' ')),
          1, 15) AS BIGINT))) AS ts
      FROM tk WHERE len(t) >= 3),
    tt AS (SELECT doc_id, ts, len(ts) AS n FROM t WHERE len(ts) >= 1),
    ex AS (SELECT doc_id, unnest(ts) AS w FROM tt),
    pairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db, CAST(COUNT(*) AS BIGINT) AS inter
      FROM ex a JOIN ex b ON a.w = b.w AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT p.da AS doc_a, p.db AS doc_b,
      CAST(x.n AS BIGINT) AS n_a, CAST(y.n AS BIGINT) AS n_b, p.inter,
      CAST(x.n + y.n - p.inter AS BIGINT) AS uni,
      CAST(p.inter * 1000000 // (x.n + y.n - p.inter) AS BIGINT)
        AS jacc_ppm
    FROM pairs p JOIN tt x ON x.doc_id = p.da JOIN tt y ON y.doc_id = p.db
    WHERE p.inter * 1000000 // (x.n + y.n - p.inter) >= $AllPairsThetaPpm
    ORDER BY 1, 2"""

  /** Caller contract: q31/q33/q34 (and q60, via q31), q154 (gram-hash
    * + fingerprint-postings frames) and q199 (ordered prefix-set frame)
    * `persist()` their feature table so
    * the self-join's branches share one computation — a lazily returned
    * DataFrame cannot unpersist behind its own action, so the CACHE
    * LIFETIME IS THE CALLER'S. The driver harness (Verify/Bench/specs)
    * runs `spark.catalog.clearCache()` between queries; any other caller
    * must do the same or accept the cached blocks until session end. */
  // ---- q230: dedup quality uplift --------------------------------------
  // The audit that closes q102's keep-best loop: among docs INSIDE
  // near-dup clusters, does the longest-doc keeper rule actually retain
  // the better-quality members? Per source, the mean heuristic quality
  // (q158's stopword-rate milli score, off the pinned attribute stage)
  // of kept vs removed docs and the uplift between them — a source
  // where removal DEGRADES mean quality means its duplicates are its
  // best docs and the keeper rule needs a quality term, not length.
  // Scale shape: rides the pinned cc/attr stages (narrow integer
  // frames); the keeper list is |clusters| rows broadcast; the ledger is
  // |sources| rows. Zero new corpus text scans.
  def q230DedupQualityUplift(s: SparkSession, d: String): DataFrame = {
    val cc = ccLabels(s, d)
    val kept = clusterKeepers(s, d)
      .select(col("kept_doc_id"), lit(true).as("is_kept"))
    val score = TextOps.attrHeuristic(s, d)
      .select(col("doc_id"), col("source"),
        expr("n_stop * 1000 div n_tokens").as("score_milli"))
    cc.join(score, Seq("doc_id"))
      .join(broadcast(kept), col("doc_id") === col("kept_doc_id"), "left")
      .withColumn("kept", coalesce(col("is_kept"), lit(false)))
      .groupBy(col("source"))
      .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("kept"), col("score_milli"))).as("ks"),
        sum(when(!col("kept"), col("score_milli"))).as("rs"))
      .withColumn("kept_mean_milli", expr("ks div nullif(n_kept, 0)"))
      .withColumn("removed_mean_milli",
        expr("rs div nullif(n_removed, 0)"))
      .withColumn("uplift_milli",
        col("kept_mean_milli") - col("removed_mean_milli"))
      .withColumn("uplift_band",
        when(col("uplift_milli").isNull, "one_sided")
          .when(col("uplift_milli") >= 10L, "improves")
          .when(col("uplift_milli") <= -10L, "degrades")
          .otherwise("neutral"))
      .select(col("source"), col("n_kept"), col("n_removed"),
        col("kept_mean_milli"), col("removed_mean_milli"),
        col("uplift_milli"), col("uplift_band"))
      .orderBy(col("source"))
  }

  val q230Sql: String = sqlCc + raw""",
    tok AS (
      SELECT doc_id,
        CAST(len(string_split_regex(trim(lower(text)), '[ \t\n\r\f]+'))
          AS BIGINT) AS n_tokens
      FROM documents),
    j AS (
      SELECT cc.canon_id, cc.doc_id, tok.n_tokens
      FROM cc JOIN tok USING (doc_id)),
    best AS (
      SELECT canon_id, doc_id AS kept_doc_id,
        row_number() OVER (PARTITION BY canon_id
          ORDER BY n_tokens DESC, doc_id) AS rk
      FROM j),
    sc AS (
      SELECT doc_id, source,
        CAST(len(list_filter(t, x -> list_contains(
          ['the','a','of','and','to','in','is','it'], x))) AS BIGINT)
          * 1000 // CAST(len(t) AS BIGINT) AS score_milli
      FROM (SELECT doc_id, source, string_split_regex(
              trim(lower(text)), '[ \t\n\r\f]+') AS t
            FROM documents)),
    led AS (
      SELECT source,
        CAST(SUM(CASE WHEN k.kept_doc_id IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_kept,
        CAST(SUM(CASE WHEN k.kept_doc_id IS NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_removed,
        CAST(SUM(CASE WHEN k.kept_doc_id IS NOT NULL THEN score_milli END)
          AS BIGINT) AS ks,
        CAST(SUM(CASE WHEN k.kept_doc_id IS NULL THEN score_milli END)
          AS BIGINT) AS rs
      FROM cc
      JOIN sc USING (doc_id)
      LEFT JOIN (SELECT kept_doc_id FROM best WHERE rk = 1) k
        ON cc.doc_id = k.kept_doc_id
      GROUP BY source),
    m AS (
      SELECT source, n_kept, n_removed,
        ks // nullif(n_kept, 0) AS kept_mean_milli,
        rs // nullif(n_removed, 0) AS removed_mean_milli
      FROM led)
    SELECT source, n_kept, n_removed,
      CAST(kept_mean_milli AS BIGINT) AS kept_mean_milli,
      CAST(removed_mean_milli AS BIGINT) AS removed_mean_milli,
      CAST(kept_mean_milli - removed_mean_milli AS BIGINT) AS uplift_milli,
      CASE WHEN kept_mean_milli IS NULL OR removed_mean_milli IS NULL
             THEN 'one_sided'
           WHEN kept_mean_milli - removed_mean_milli >= 10 THEN 'improves'
           WHEN kept_mean_milli - removed_mean_milli <= -10 THEN 'degrades'
           ELSE 'neutral' END AS uplift_band
    FROM m ORDER BY source"""

  // ---- q256: sorted-neighborhood dedup (blocked SNM candidates) ---------
  // The OTHER classic candidate-generation paradigm next to LSH banding
  // (q31/q33) and prefix-filtered all-pairs (q199): Sorted Neighborhood
  // — sort records by a key, compare only rows within a window of w
  // positions. The blocked variant here (block on the first-2-token
  // key, sort by the 8-token prefix inside each block, window w=3)
  // keeps the rank window PARTITIONED — no global sort, no
  // single-partition window; at cluster scale the cost profile is one
  // hash shuffle + per-block sorts where LSH pays k band shuffles,
  // which is exactly why real pipelines keep both in the toolbox.
  // Reported per window distance δ: candidates generated, candidates
  // that verify at word-3-gram Jaccard ≥ 0.5 (the q31 threshold), and
  // the precision in ppm — the δ-decay tells you what window width the
  // corpus actually needs.
  //
  // Exactness: counts + one nonnegative floor-div; the verify predicate
  // is the exact-integer single-intersect form (2·inter ≥ uni). Scale
  // shape: one tokenize scan → per-block rank windows → the neighbor
  // join is a (block, rank+δ) EQUI-join with the 3-row δ spine
  // broadcast (the q218 lag trick on ranks); shingle arrays ride the
  // join only for candidate rows.
  def q256SortedNeighborhood(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        filter(split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"),
          t => t =!= lit("")).as("t"))
      .filter(size(col("t")) >= 3)
      .withColumn("block", expr("concat_ws(' ', t[0], t[1])"))
      .withColumn("sortkey", expr("concat_ws(' ', slice(t, 1, 8))"))
      .withColumn("grams", expr(
        "array_distinct(transform(sequence(0, size(t) - 3)," +
          " i -> concat_ws(' ', t[i], t[i + 1], t[i + 2])))"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("block"))
          .orderBy(col("sortkey"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("block"), col("rnk"), col("grams"))
    val deltas = s.range(1, 4).select(col("id").as("delta"))
    val left = docs.crossJoin(broadcast(deltas))
      .select(col("block"), (col("rnk") + col("delta")).as("rnk2"),
        col("delta"), col("doc_id").as("id1"), col("grams").as("g1"))
    val cand = left.join(
      docs.select(col("block"), col("rnk").as("rnk2"),
        col("doc_id").as("id2"), col("grams").as("g2")),
      Seq("block", "rnk2"))
    cand
      .withColumn("inter",
        size(array_intersect(col("g1"), col("g2"))).cast("long"))
      .withColumn("uni",
        (size(col("g1")) + size(col("g2"))).cast("long") - col("inter"))
      .groupBy(col("delta"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("inter") * 2 >= col("uni"), 1L).otherwise(0L))
          .as("n_verified"))
      .withColumn("precision_ppm", expr(
        "cast(cast(n_verified as decimal(38,0)) * 1000000" +
          " div nullif(n_candidates, 0) as bigint)"))
      .select(col("delta"), col("n_candidates"), col("n_verified"),
        col("precision_ppm"))
      .orderBy(col("delta"))
  }

  val q256Sql: String = raw"""
    WITH docs0 AS (
      SELECT doc_id, list_filter(string_split_regex(trim(lower(text)),
        '[ \t\n\r\f]+'), x -> x <> '') AS t
      FROM documents),
    docs AS (
      SELECT doc_id,
        array_to_string(t[1:2], ' ') AS block,
        array_to_string(t[1:8], ' ') AS sortkey,
        list_distinct(list_transform(range(1, len(t) - 1),
          i -> array_to_string(t[i:i+2], ' '))) AS grams
      FROM docs0 WHERE len(t) >= 3),
    rk AS (
      SELECT doc_id, block, grams,
        CAST(ROW_NUMBER() OVER (PARTITION BY block
          ORDER BY sortkey, doc_id) AS BIGINT) AS rnk
      FROM docs),
    deltas AS (SELECT CAST(unnest(range(1, 4)) AS BIGINT) AS delta),
    cand AS (
      SELECT d.delta,
        CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT) AS inter,
        CAST(len(a.grams) + len(b.grams)
          - len(list_intersect(a.grams, b.grams)) AS BIGINT) AS uni
      FROM rk a CROSS JOIN deltas d
      JOIN rk b ON b.block = a.block AND b.rnk = a.rnk + d.delta)
    SELECT delta, CAST(COUNT(*) AS BIGINT) AS n_candidates,
      CAST(SUM(CASE WHEN inter * 2 >= uni THEN 1 ELSE 0 END) AS BIGINT)
        AS n_verified,
      CAST(CAST(SUM(CASE WHEN inter * 2 >= uni THEN 1 ELSE 0 END)
        AS HUGEINT) * 1000000 // nullif(COUNT(*), 0) AS BIGINT)
        AS precision_ppm
    FROM cand GROUP BY 1 ORDER BY 1"""

  // ---- q258: in-batch negative collision audit ---------------------------
  // The contrastive-training read of the dup-cluster structure: training
  // with in-batch negatives silently treats every other batch member as
  // a negative — if two near-duplicates land in one batch, the model is
  // PENALIZED for scoring them similar (a false negative). From the
  // pinned cc stage: p_same = Σ s(s−1) / (N(N−1)) — the probability a
  // random ordered doc pair is near-dup — and per candidate batch size
  // B, the expected false negatives PER ANCHOR, (B−1)·p_same, in exact
  // milli. The band is the go/no-go a pretraining plan reads: past
  // ~0.1 expected collisions per anchor, dedup-before-batching stops
  // being optional. Zero new corpus text scans — cluster sizes off the
  // pinned cc labels, N one column-pruned count.
  def q258InbatchCollisions(s: SparkSession, d: String): DataFrame = {
    val mass = ccLabels(s, d)
      .groupBy(col("canon_id")).agg(count(lit(1)).as("sz"))
      .agg(coalesce(sum(expr("cast(sz as decimal(38,0)) * (sz - 1)")),
        lit(0L).cast("decimal(38,0)")).as("pairs2"))
    val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    import s.implicits._
    Seq(256L, 1024L, 4096L, 16384L).toDF("batch_size")
      .crossJoin(broadcast(mass))
      .crossJoin(broadcast(n))
      .withColumn("p_same_ppm", expr(
        "cast(pairs2 * 1000000" +
          " div nullif(cast(n_docs as decimal(38,0)) * (n_docs - 1), 0)" +
          " as bigint)"))
      .withColumn("exp_collisions_milli", expr(
        "cast((batch_size - 1) * pairs2 * 1000" +
          " div nullif(cast(n_docs as decimal(38,0)) * (n_docs - 1), 0)" +
          " as bigint)"))
      .withColumn("band",
        when(col("exp_collisions_milli").isNull, "degenerate")
          .when(col("exp_collisions_milli") < 10L, "negligible")
          .when(col("exp_collisions_milli") < 100L, "measurable")
          .when(col("exp_collisions_milli") < 1000L, "material")
          .otherwise("toxic"))
      .select(col("batch_size"), col("n_docs"), col("p_same_ppm"),
        col("exp_collisions_milli"), col("band"))
      .orderBy(col("batch_size"))
  }

  val q258Sql: String = sqlCc + """,
    sizes AS (
      SELECT canon_id, CAST(COUNT(*) AS BIGINT) AS sz
      FROM cc GROUP BY canon_id),
    mass AS (
      SELECT COALESCE(SUM(CAST(sz AS HUGEINT) * (sz - 1)),
        CAST(0 AS HUGEINT)) AS pairs2 FROM sizes),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    bs AS (SELECT CAST(unnest([256, 1024, 4096, 16384]) AS BIGINT)
      AS batch_size)
    SELECT batch_size, n_docs,
      CAST(pairs2 * 1000000
        // nullif(CAST(n_docs AS HUGEINT) * (n_docs - 1), 0) AS BIGINT)
        AS p_same_ppm,
      CAST((batch_size - 1) * pairs2 * 1000
        // nullif(CAST(n_docs AS HUGEINT) * (n_docs - 1), 0) AS BIGINT)
        AS exp_collisions_milli,
      CASE WHEN CAST((batch_size - 1) * pairs2 * 1000
             // nullif(CAST(n_docs AS HUGEINT) * (n_docs - 1), 0)
             AS BIGINT) IS NULL THEN 'degenerate'
           WHEN (batch_size - 1) * pairs2 * 1000
             // nullif(CAST(n_docs AS HUGEINT) * (n_docs - 1), 0) < 10
             THEN 'negligible'
           WHEN (batch_size - 1) * pairs2 * 1000
             // nullif(CAST(n_docs AS HUGEINT) * (n_docs - 1), 0) < 100
             THEN 'measurable'
           WHEN (batch_size - 1) * pairs2 * 1000
             // nullif(CAST(n_docs AS HUGEINT) * (n_docs - 1), 0) < 1000
             THEN 'material'
           ELSE 'toxic' END AS band
    FROM bs CROSS JOIN mass CROSS JOIN nd
    ORDER BY batch_size"""

  // ---- q269: k-core decomposition of the near-dup graph -----------------
  // The graph-density audit between q60's components and q116's triads:
  // which duplication structures are DENSE (template farms, mirror
  // rings) versus merely CONNECTED (chains of pairwise near-dups)? The
  // k-core — the maximal subgraph where every node keeps degree ≥ k —
  // answers it: a 4-core survivor sits in a tightly cross-linked clone
  // mass no chain can fake, and core membership is the standard
  // prioritization key for manual dedup review (densest first).
  //
  // Contract: an R-round peel (R = 8, fixed in BOTH engines) of the
  // verified near-dup edge list [[dupPairs]] for k = 2, 3, 4 — each
  // round drops nodes whose degree within the survivors is < k. The
  // R-round residual is a superset of the true k-core, EXACT when
  // `converged` is true (survivor sets only shrink, so equal counts in
  // rounds R−1 and R pin the fixpoint); real dup graphs peel in 1–3
  // rounds because near-dup families are clique-like, and a caller at
  // scale raises R. The fixed R keeps the operator a deterministic
  // function of the corpus — no data-dependent iteration count to
  // diverge between engine and oracle on an unconverged graph.
  //
  // Scale shape: the peel runs ENTIRELY on the pinned candidate-pair
  // frame (bounded by band-bucket occupancy, never corpus rows); each
  // round is two semi-joins + one map-side-combining degree count on
  // that frame, and the 3 k-levels × 8 rounds are independent bounded
  // plans. The final ledger is 3 rows.
  private val KCoreRounds = 8

  def q269KCore(s: SparkSession, d: String): DataFrame = {
    val und = dupPairs(s, d)
    // every peel round references the survivor set TWICE (the u and v
    // semi-joins); without a per-round lineage cut each round re-executes
    // its whole predecessor chain ~2^R times — the engine-side twin of
    // the oracle's MATERIALIZED lesson (measured: 826 s at 30x for what
    // is a few seconds of real work). Eager localCheckpoint per round,
    // CC-loop style; intermediates unpersist as soon as the next round
    // is materialized.
    val edges = und.select(col("id1").as("u"), col("id2").as("v"))
      .unionByName(und.select(col("id2").as("u"), col("id1").as("v")))
      .persist() // 24 peel rounds + 3 edge counts read it
    val nodes = edges.select(col("u").as("id")).distinct()
      .persist() // the 3 k-levels each start from it
    def peelOnce(k: Int, sNodes: DataFrame): DataFrame =
      edges
        .join(sNodes.select(col("id").as("u")), Seq("u"))
        .join(sNodes.select(col("id").as("v")), Seq("v"))
        .groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("u").as("id"))
    val perK = Seq(2, 3, 4).map { k =>
      var cur = nodes
      var curOwned = false
      for (_ <- 1 until KCoreRounds) {
        val nxt = peelOnce(k, cur).localCheckpoint(true)
        if (curOwned) cur.unpersist(): Unit
        cur = nxt; curOwned = true
      }
      val sPrev = cur
      val sLast = peelOnce(k, sPrev).localCheckpoint(true)
      val coreEdges = und
        .join(sLast.select(col("id").as("id1")), Seq("id1"))
        .join(sLast.select(col("id").as("id2")), Seq("id2"))
      sLast.agg(count(lit(1)).as("n_core_nodes"))
        .crossJoin(broadcast(sPrev.agg(count(lit(1)).as("n_prev"))))
        .crossJoin(broadcast(coreEdges.agg(count(lit(1)).as("n_core_edges"))))
        .select(lit(k.toLong).as("k"), col("n_core_nodes"),
          col("n_core_edges"),
          (col("n_core_nodes") === col("n_prev")).as("converged"))
    }
    perK.reduce(_.unionByName(_)).orderBy(col("k"))
  }

  val q269Sql: String = {
    // every peel level references its predecessor TWICE (the u and v
    // semi-joins) and DuckDB inlines plain CTEs — 8 unrolled levels
    // would expand to 2^8 copies of the whole shingle→minhash→jaccard
    // chain (measured: fd exhaustion re-opening documents.parquet).
    // MATERIALIZED pins each level (and the shared edge list) to one
    // evaluation — the oracle-side analog of the engine's bounded
    // per-round frames.
    def coreCtes(k: Int): String = {
      val head = s"s${k}_0 AS MATERIALIZED (SELECT id FROM knodes)"
      val steps = (1 to KCoreRounds).map { i =>
        s"""s${k}_$i AS MATERIALIZED (
      SELECT id FROM (
        SELECT u AS id, COUNT(*) AS deg
        FROM kedges
        JOIN s${k}_${i - 1} a ON a.id = u
        JOIN s${k}_${i - 1} b ON b.id = v
        GROUP BY u)
      WHERE deg >= $k)"""
      }
      (head +: steps).mkString(",\n    ")
    }
    def row(k: Int): String =
      s"""SELECT CAST($k AS BIGINT) AS k,
      (SELECT COUNT(*) FROM s${k}_$KCoreRounds) AS n_core_nodes,
      (SELECT COUNT(*) FROM pinned_pairs p
         JOIN s${k}_$KCoreRounds a ON a.id = p.id1
         JOIN s${k}_$KCoreRounds b ON b.id = p.id2) AS n_core_edges,
      (SELECT COUNT(*) FROM s${k}_$KCoreRounds)
        = (SELECT COUNT(*) FROM s${k}_${KCoreRounds - 1}) AS converged"""
    sqlDupPairs + s""",
    pinned_pairs AS MATERIALIZED (SELECT id1, id2 FROM dup_pairs),
    kedges AS MATERIALIZED (
      SELECT id1 AS u, id2 AS v FROM pinned_pairs
      UNION ALL SELECT id2, id1 FROM pinned_pairs),
    knodes AS MATERIALIZED (SELECT DISTINCT u AS id FROM kedges),
    ${coreCtes(2)},
    ${coreCtes(3)},
    ${coreCtes(4)}
    ${row(2)} UNION ALL ${row(3)} UNION ALL ${row(4)} ORDER BY k"""
  }

  // ---- q280: PageRank authority over the near-dup graph -----------------
  // Which documents sit at the CENTER of duplication mass? Connected
  // components (q60) say "same family", k-core (q269) says "dense", but
  // neither ranks individual nodes: PageRank (Brin & Page, WWW 1998,
  // d = 0.85) over the verified near-dup edge list scores each document
  // by how much duplication flow converges on it — the canonical-pick
  // prior a dedup reviewer wants sorted descending (the most-linked
  // template hub first). On an undirected graph PageRank correlates
  // with degree but is NOT degree: flow through a low-degree bridge
  // node that connects two clone farms outranks a leaf of one farm.
  //
  // Contract: R = 8 fixed iterations (q269's fixed-round posture — a
  // deterministic function of the corpus, no data-dependent stopping)
  // of r' = 0.15 + 0.85·Σ_in r_j/deg_j in integer NANO units
  // (SCALE = 1e9 per unit of average rank). Every step is a per-term
  // floor division — both engines floor the same terms in the same
  // places, so the result is identical by construction. Bounds: total
  // mass ≤ |nodes|·1e9 ≤ 1e18 at a billion graph nodes, inside BIGINT
  // for every per-node rank and inside Decimal(38,0)/HUGEINT for the
  // sums; per-term flooring loses < 1e-9 average-rank per in-edge,
  // invisible at the micro-unit reporting scale.
  //
  // Scale shape: the walk runs entirely on the pinned candidate-pair
  // stage (band-bucket bounded, never corpus rows); each iteration is
  // one equi-join + one map-side-combining sum, lineage cut per round
  // (q269's localCheckpoint lesson), and the output is the exact
  // global top-20 by (rank desc, id asc) — a TakeOrdered, never a
  // corpus sort.
  private val PageRankRounds = 8
  private val PageRankTopK = 20

  def q280Pagerank(s: SparkSession, d: String): DataFrame = {
    val und = dupPairs(s, d)
    val edges = und.select(col("id1").as("u"), col("id2").as("v"))
      .unionByName(und.select(col("id2").as("u"), col("id1").as("v")))
      .persist() // degree count + 8 contribution joins read it
    val degs = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val srcs = edges.join(degs, Seq("u"))
      .select(col("u"), col("v"), col("deg"))
      .persist() // the 8 iteration joins read (u, v, deg) together
    var ranks = degs.select(col("u").as("id"),
      lit(1000000000L).cast("decimal(38,0)").as("r"))
      .localCheckpoint(true)
    for (_ <- 1 to PageRankRounds) {
      val nxt = srcs
        .join(ranks.select(col("id").as("u"), col("r")), Seq("u"))
        .groupBy(col("v").as("id"))
        .agg(sum(expr("cast(r div deg as decimal(38,0))")).as("inflow"))
        .select(col("id"), expr(
          "cast(150000000 + (cast(85 as decimal(38,0)) * inflow) div 100" +
            " as decimal(38,0))").as("r"))
        .localCheckpoint(true)
      ranks.unpersist()
      ranks = nxt
    }
    val n = degs.agg(count(lit(1)).as("n_nodes"))
    val top = ranks
      .select(col("id"), expr("cast(r div 1000 as bigint)").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("id").asc)
      .limit(PageRankTopK)
    top.withColumn("pos", row_number().over(
        Window.orderBy(col("rank_micro").desc, col("id").asc)).cast("long"))
      .crossJoin(broadcast(n))
      .select(col("pos"), col("id"), col("rank_micro"), col("n_nodes"))
      .orderBy(col("pos"))
  }

  val q280Sql: String = {
    // MATERIALIZED per iteration — same DuckDB CTE-inlining hazard as
    // q269 (each level is referenced by the next; unpinned, the chain
    // re-derives the shingle stage per level).
    val iters = (1 to PageRankRounds).map { i =>
      s"""pr_$i AS MATERIALIZED (
      SELECT prs.v AS id,
        CAST(150000000 + (85 * SUM(p.r // prs.deg)) // 100 AS HUGEINT)
          AS r
      FROM prsrc prs JOIN pr_${i - 1} p ON p.id = prs.u
      GROUP BY prs.v)"""
    }.mkString(",\n    ")
    sqlDupPairs + s""",
    predges AS MATERIALIZED (
      SELECT id1 AS u, id2 AS v FROM dup_pairs
      UNION ALL SELECT id2, id1 FROM dup_pairs),
    prdeg AS MATERIALIZED (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM predges GROUP BY 1),
    prsrc AS MATERIALIZED (
      SELECT e.u, e.v, d.deg FROM predges e JOIN prdeg d ON d.u = e.u),
    pr_0 AS MATERIALIZED (
      SELECT u AS id, CAST(1000000000 AS HUGEINT) AS r FROM prdeg),
    $iters,
    prn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM prdeg),
    ranked AS (
      SELECT id, CAST(r // 1000 AS BIGINT) AS rank_micro,
        CAST(row_number() OVER (ORDER BY r // 1000 DESC, id) AS BIGINT)
          AS pos
      FROM pr_$PageRankRounds)
    SELECT pos, id, rank_micro, n_nodes
    FROM ranked CROSS JOIN prn
    WHERE pos <= $PageRankTopK
    ORDER BY pos"""
  }

  // ---- q282: degree assortativity of the near-dup graph ------------------
  // Do heavily-duplicated documents link to OTHER heavily-duplicated
  // documents (assortative, r > 0 — clone farms cross-linking into
  // template meshes) or to leaves (disassortative, r < 0 — hub-and-
  // spoke mirror trees)? Newman's degree assortativity (PRL 2002):
  // Pearson correlation of the endpoint degrees (deg u, deg v) over
  // every DIRECTED edge (each undirected edge counted both ways — the
  // standard symmetrization, shared with q269/q280's edge frame). The
  // sign separates the two dedup topologies; |r| sizes how strongly
  // the canonical-pick strategy can rely on degree alone.
  //
  // Exactness: all five moment sums are exact integer aggregates on
  // BIGINT degrees; r = (nΣxy − ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²))
  // resolves through one ±1-corrected isqrt per factor and the zSq
  // exact two-stage quotient (q233's posture: q·1e6 + (rem·1e6 div sA),
  // then div sB — no flooring amplification), with the q273 sign
  // split so both engines only ever divide non-negative integers.
  // Both floor-roots UNDERestimate, so the quotient can only overshoot
  // |true r|; since |r| ≤ 1 it is clamped at ±1e6 ppm (toy-n effect
  // only), mirrored as LEAST in the oracle.
  // Bounds: n ≤ 2|E|, deg ≤ bucket-capped candidate degree; with
  // |E| ≤ 1e12 and deg ≤ 1e6, nΣx² ≤ 2e12·2e12·1e12 → the factors
  // stay ≤ ~4e36, inside Decimal(38,0)/HUGEINT with the q272
  // Newton-refined seed (the raw double seed is only valid to 3.6e31).
  //
  // Scale shape: one pass over the pinned pair frame joined twice
  // against the |nodes|-row degree frame, collapsing map-side onto a
  // single moment row; output is 1 row.
  def q282Assortativity(s: SparkSession, d: String): DataFrame = {
    val und = dupPairs(s, d)
    val edges = und.select(col("id1").as("u"), col("id2").as("v"))
      .unionByName(und.select(col("id2").as("u"), col("id1").as("v")))
      .persist() // degree count + the moment pass read it
    val degs = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val moments = edges
      .join(degs.select(col("u"), col("deg").as("x")), Seq("u"))
      .join(degs.select(col("u").as("v"), col("deg").as("y")), Seq("v"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"),
        sum(expr("cast(y as decimal(38,0)) * y")).as("syy"))
    def isqrtCols(w2: String, p: String) = Seq(
      (s"${p}_s0", s"cast(floor(sqrt(cast($w2 as double))) as decimal(38,0))"),
      (s"${p}_s1", s"case when ${p}_s0 <= 0 then ${p}_s0 else" +
        s" cast(($w2 div ${p}_s0 + ${p}_s0) div 2 as decimal(38,0)) end"),
      (s"${p}_s2", s"case when ${p}_s1 <= 0 then ${p}_s1 else" +
        s" cast(($w2 div ${p}_s1 + ${p}_s1) div 2 as decimal(38,0)) end"),
      (s"$p", s"case when (${p}_s2 + 1) * (${p}_s2 + 1) <= $w2" +
        s" then ${p}_s2 + 1 when ${p}_s2 * ${p}_s2 > $w2" +
        s" then ${p}_s2 - 1 else ${p}_s2 end"))
    val withRoots = (isqrtCols("va", "sa") ++ isqrtCols("vb", "sb"))
      .foldLeft(moments
        .withColumn("num", expr(
          "cast(n as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy"))
        .withColumn("va", expr(
          "cast(n as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx"))
        .withColumn("vb", expr(
          "cast(n as decimal(38,0)) * syy - cast(sy as decimal(38,0)) * sy"))
      ) { case (df, (c, e)) => df.withColumn(c, expr(e)) }
    withRoots
      .withColumn("r_ppm", expr(
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
        when(col("r_ppm").isNull, "degenerate")
          .when(col("r_ppm") >= 200000L, "assortative")
          .when(col("r_ppm") <= -200000L, "disassortative")
          .otherwise("neutral"))
      .select(col("n").as("n_directed_edges"), col("sx").as("sum_deg"),
        expr("cast(num as decimal(38,0))").as("cov_num"),
        col("r_ppm"), col("band"))
  }

  val q282Sql: String = {
    def isqrtCtes(w2: String, p: String, from: String, next: String) =
      s"""${p}0 AS (
      SELECT *, CAST(FLOOR(SQRT(CAST($w2 AS DOUBLE))) AS HUGEINT)
        AS ${p}_s0 FROM $from),
    ${p}1 AS (
      SELECT *, CASE WHEN ${p}_s0 <= 0 THEN ${p}_s0
        ELSE ($w2 // ${p}_s0 + ${p}_s0) // 2 END AS ${p}_s1 FROM ${p}0),
    ${p}2 AS (
      SELECT *, CASE WHEN ${p}_s1 <= 0 THEN ${p}_s1
        ELSE ($w2 // ${p}_s1 + ${p}_s1) // 2 END AS ${p}_s2 FROM ${p}1),
    $next AS (
      SELECT *, CASE WHEN (${p}_s2 + 1) * (${p}_s2 + 1) <= $w2
          THEN ${p}_s2 + 1
        WHEN ${p}_s2 * ${p}_s2 > $w2 THEN ${p}_s2 - 1
        ELSE ${p}_s2 END AS $p FROM ${p}2)"""
    sqlDupPairs + s""",
    asedges AS MATERIALIZED (
      SELECT id1 AS u, id2 AS v FROM dup_pairs
      UNION ALL SELECT id2, id1 FROM dup_pairs),
    asdeg AS MATERIALIZED (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM asedges GROUP BY 1),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(dx.deg) AS BIGINT) AS sx,
        CAST(SUM(dy.deg) AS BIGINT) AS sy,
        SUM(CAST(dx.deg AS HUGEINT) * dy.deg) AS sxy,
        SUM(CAST(dx.deg AS HUGEINT) * dx.deg) AS sxx,
        SUM(CAST(dy.deg AS HUGEINT) * dy.deg) AS syy
      FROM asedges e
      JOIN asdeg dx ON dx.u = e.u
      JOIN asdeg dy ON dy.u = e.v),
    base AS (
      SELECT *,
        CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
        CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS va,
        CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS vb
      FROM mom),
    ${isqrtCtes("va", "sa", "base", "wa")},
    ${isqrtCtes("vb", "sb", "wa", "wb")},
    fin AS (
      SELECT *, CASE
          WHEN sa IS NULL OR sb IS NULL OR sa = 0 OR sb = 0 THEN NULL
          WHEN num >= 0 THEN
            LEAST(1000000, CAST(((num // sa) * 1000000
              + (num % sa) * 1000000 // sa) // sb AS BIGINT))
          ELSE
            -LEAST(1000000, CAST((((-num) // sa) * 1000000
              + ((-num) % sa) * 1000000 // sa) // sb AS BIGINT))
        END AS r_ppm
      FROM wb)
    SELECT n AS n_directed_edges, sx AS sum_deg,
      CAST(num AS DECIMAL(38,0)) AS cov_num, r_ppm,
      CASE WHEN r_ppm IS NULL THEN 'degenerate'
        WHEN r_ppm >= 200000 THEN 'assortative'
        WHEN r_ppm <= -200000 THEN 'disassortative'
        ELSE 'neutral' END AS band
    FROM fin"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q280_pagerank" -> q280Pagerank _,
    "q282_assortativity" -> q282Assortativity _,
    "q269_kcore" -> q269KCore _,
    "q256_sorted_neighborhood" -> q256SortedNeighborhood _,
    "q258_inbatch_collisions" -> q258InbatchCollisions _,
    "q230_dedup_quality_uplift" -> q230DedupQualityUplift _,
    "q199_allpairs_join" -> q199AllPairsJoin _,
    "q29_exact_dedup"   -> q29ExactDedup _,
    "q30_minhash_sig"   -> q30MinhashSig _,
    "q31_minhash_pairs" -> q31MinhashPairs _,
    "q32_simhash"       -> q32Simhash _,
    "q33_simhash_pairs" -> q33SimhashPairs _,
    "q34_ngram_jaccard" -> q34NgramJaccard _,
    "q60_dedup_groups"  -> q60DedupGroups _,
    "q102_cluster_canonical" -> q102ClusterCanonical _,
    "q110_corpus_overlap" -> q110CorpusOverlap _,
    "q116_triad_census" -> q116TriadCensus _,
    "q123_containment"  -> q123ContainmentPairs _,
    "q154_winnowing"    -> q154Winnowing _,
    "q156_cluster_tightness" -> q156ClusterTightness _,
    "q162_split_leakage" -> q162SplitLeakage _,
    "q163_cluster_split" -> q163ClusterSplit _,
    "q164_source_shrinkage" -> q164SourceShrinkage _,
    "q166_dup_flow" -> q166DupFlow _,
    "q167_template_skeleton" -> q167TemplateSkeleton _,
    "q174_threshold_sweep" -> q174ThresholdSweep _,
    "q183_dedup_recall" -> q183DedupRecall _)

  val oracles: Map[String, String] = Map(
    "q280_pagerank" -> q280Sql,
    "q282_assortativity" -> q282Sql,
    "q269_kcore" -> q269Sql,
    "q256_sorted_neighborhood" -> q256Sql,
    "q258_inbatch_collisions" -> q258Sql,
    "q230_dedup_quality_uplift" -> q230Sql,
    "q29_exact_dedup"   -> q29Sql,
    "q30_minhash_sig"   -> q30Sql,
    "q31_minhash_pairs" -> q31Sql,
    "q32_simhash"       -> q32Sql,
    "q33_simhash_pairs" -> q33Sql,
    "q199_allpairs_join" -> q199Sql,
    "q34_ngram_jaccard" -> q34Sql,
    "q60_dedup_groups"  -> q60Sql,
    "q102_cluster_canonical" -> q102Sql,
    "q110_corpus_overlap" -> q110Sql,
    "q116_triad_census" -> q116Sql,
    "q123_containment"  -> q123Sql,
    "q154_winnowing"    -> q154Sql,
    "q156_cluster_tightness" -> q156Sql,
    "q162_split_leakage" -> q162Sql,
    "q163_cluster_split" -> q163Sql,
    "q164_source_shrinkage" -> q164Sql,
    "q166_dup_flow" -> q166Sql,
    "q167_template_skeleton" -> q167Sql,
    "q174_threshold_sweep" -> q174Sql,
    "q183_dedup_recall" -> q183Sql)
}
