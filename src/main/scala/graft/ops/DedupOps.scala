package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Portable 60-bit hash: Spark side. DuckDB side:
    * CAST('0x' || substring(md5(x), 1, 15) AS BIGINT). */
  private def hashOf(x: String): String =
    s"cast(conv(substring(md5($x), 1, 15), 16, 10) as bigint)"

  /** doc_id + distinct word-3-gram shingle set (docs with >= 3 tokens). */
  private def withShingles(df: DataFrame): DataFrame =
    df.withColumn("tokens", split(trim(lower(col("text"))), "\\s+"))
      .filter(size(col("tokens")) >= 3)
      .withColumn("shingles", expr(
        "array_distinct(transform(sequence(1, size(tokens) - 2)," +
          " i -> array_join(slice(tokens, i, 3), ' ')))"))

  private val sqlShingles: String = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents),
    sh AS (
      SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
               i -> array_to_string(t[i:i+2], ' '))) AS shingles
      FROM toks WHERE len(t) >= 3)"""

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

  // ---- q30: MinHash signatures (K=8 seeds, long format) ----------------
  private def minhashCol(k: Int): Column = expr(
    s"array_min(transform(shingles, x -> ${hashOf(s"concat('$k', ':', x)")}))")

  def q30MinhashSig(s: SparkSession, d: String): DataFrame = {
    val base = withShingles(Tables.documents(s, d))
    val sig = (0 until 8).foldLeft(base) { (df, k) =>
      df.withColumn(s"mh$k", minhashCol(k))
    }
    sig.select(col("doc_id"), explode(expr(
      "arrays_zip(sequence(0, 7), array(" +
        (0 until 8).map(k => s"mh$k").mkString(", ") + "))")).as("z"))
      .select(col("doc_id"), col("z.0").cast("long").as("seed"),
        col("z.1").as("minhash"))
      .orderBy(col("doc_id"), col("seed"))
  }

  val q30Sql: String = sqlShingles + """
    SELECT doc_id, CAST(k AS BIGINT) AS seed,
      list_min(list_transform(shingles, x ->
        CAST('0x' || substring(md5(CAST(k AS VARCHAR) || ':' || x), 1, 15)
          AS BIGINT))) AS minhash
    FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS k) seeds
    ORDER BY doc_id, seed"""

  // ---- q31: MinHash-LSH near-dup pairs (band join + Jaccard verify) ----
  // 8 single-row bands: candidates share ANY of the 8 minhashes (recall
  // 1-(1-j)^8 — 0.996 at j=0.5); then exact Jaccard over shingle sets,
  // threshold 0.5. The corpus has ~5% planted near-dups at j >= 0.5 with
  // background pairs below 0.2, so the threshold is not boundary-sensitive.
  def q31MinhashPairs(s: SparkSession, d: String): DataFrame = {
    def sigLong(alias: String): DataFrame = {
      val base = (0 until 8).foldLeft(withShingles(Tables.documents(s, d))) {
        (df, k) => df.withColumn(s"mh$k", minhashCol(k))
      }
      base.select(col("doc_id"), col("shingles"), explode(array(
        (0 until 8).map(k => struct(lit(k).as("k"), col(s"mh$k").as("mhv"))): _*
      )).as("b"))
        .select(col("doc_id").as(s"${alias}_id"),
          col("shingles").as(s"${alias}_sh"),
          col("b.k").as(s"${alias}_k"), col("b.mhv").as(s"${alias}_mhv"))
    }
    val a = sigLong("a")
    val b = sigLong("b")
    a.join(b, col("a_k") === col("b_k") && col("a_mhv") === col("b_mhv")
        && col("a_id") < col("b_id"))
      .select(col("a_id").as("id1"), col("b_id").as("id2"),
        col("a_sh").as("sh1"), col("b_sh").as("sh2"))
      .dropDuplicates("id1", "id2")
      .withColumn("inter",
        size(array_intersect(col("sh1"), col("sh2"))).cast("long"))
      .withColumn("uni",
        (size(col("sh1")) + size(col("sh2"))).cast("long") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("inter") * 2 >= col("uni")) // j >= 0.5 in integer space
      .select(col("id1"), col("id2"), col("inter"), col("uni"), col("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  val q31Sql: String = sqlShingles + """,
    mh AS (
      SELECT doc_id, k,
        list_min(list_transform(shingles, x ->
          CAST('0x' || substring(md5(CAST(k AS VARCHAR) || ':' || x), 1, 15)
            AS BIGINT))) AS mhv
      FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS k) seeds),
    cand AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2
      FROM mh a JOIN mh b
        ON a.k = b.k AND a.mhv = b.mhv AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    jac AS (
      SELECT id1, id2,
        CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS inter,
        CAST(len(sa.shingles) + len(sb.shingles)
          - len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS uni
      FROM cand
      JOIN sh sa ON sa.doc_id = id1
      JOIN sh sb ON sb.doc_id = id2)
    SELECT id1, id2, inter, uni,
      CAST(inter AS DOUBLE) / uni AS jaccard
    FROM jac WHERE inter * 2 >= uni
    ORDER BY id1, id2"""

  // ---- q32: SimHash fingerprints (60-bit, over shingle hashes) ---------
  // bit b of simhash = sign of sum over shingles of (+1/-1 by hash bit b).
  private val simhashExpr: Column = expr(
    "aggregate(sequence(0, 59), 0L, (acc, b) -> acc +" +
      " CASE WHEN aggregate(hv, 0L," +
      "   (a, h) -> a + ((shiftright(h, b) % 2) * 2 - 1)) > 0" +
      " THEN shiftleft(cast(1 as bigint), b) ELSE 0L END)")

  private def withSimhash(df: DataFrame): DataFrame =
    withShingles(df)
      .withColumn("hv", expr(s"transform(shingles, x -> ${hashOf("x")})"))
      .withColumn("simhash", simhashExpr)

  def q32Simhash(s: SparkSession, d: String): DataFrame =
    withSimhash(Tables.documents(s, d))
      .select(col("doc_id"), col("simhash"))
      .orderBy(col("doc_id"))

  private val sqlSimhash: String = sqlShingles + """,
    hs AS (
      SELECT doc_id, list_transform(shingles, x ->
        CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)) AS hv
      FROM sh),
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
  // 6 chunks of 10 bits: by pigeonhole, ANY pair at Hamming distance <= 5
  // shares at least one untouched chunk — the blocking is lossless for the
  // hd <= 5 contract, and candidate buckets stay tiny (2^10 values/chunk).
  def q33SimhashPairs(s: SparkSession, d: String): DataFrame = {
    def chunks(alias: String): DataFrame =
      withSimhash(Tables.documents(s, d))
        .select(col("doc_id").as(s"${alias}_id"),
          col("simhash").as(s"${alias}_sim"),
          explode(expr("transform(sequence(0, 5), c -> named_struct(" +
            "'c', c, 'v', shiftright(simhash, 10 * c) % 1024))")).as("ch"))
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
      .filter(col("hd") <= 5)
      .select(col("id1"), col("id2"), col("hd"))
      .orderBy(col("id1"), col("id2"))
  }

  val q33Sql: String = sqlSimhash + """,
    ch AS (
      SELECT doc_id, simhash, c, (simhash >> (10 * c)) % 1024 AS v
      FROM sim CROSS JOIN (SELECT unnest(range(0, 6)) AS c) cs),
    cand AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2,
        ANY_VALUE(a.simhash) AS sim1, ANY_VALUE(b.simhash) AS sim2
      FROM ch a JOIN ch b
        ON a.c = b.c AND a.v = b.v AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id1, id2, CAST(bit_count(xor(sim1, sim2)) AS BIGINT) AS hd
    FROM cand WHERE bit_count(xor(sim1, sim2)) <= 5
    ORDER BY id1, id2"""

  // ---- q34: char-4-gram Jaccard with minhash prefix filter -------------
  // Verification feature: DISTINCT char-4-grams (catches edits word
  // shingles miss). Blocking key: a 1-seed minhash over WORD shingles
  // (seed 'p', disjoint from q31's seeds) — char-4-gram sets overlap too
  // much across this shared-vocab corpus to block on (a min-4-gram bucket
  // degenerates toward a cross join), while word-shingle minhash buckets
  // stay tiny (collision prob = word Jaccard: ~0.02 background vs ~0.97
  // for planted near-dups). Verified at char-gram j >= 0.5: background
  // tops out at ~0.42 on this corpus, planted pairs sit at ~0.9.
  def q34NgramJaccard(s: SparkSession, d: String): DataFrame = {
    def grams(alias: String): DataFrame =
      withShingles(Tables.documents(s, d))
        .withColumn("txt", trim(lower(col("text"))))
        .filter(length(col("txt")) >= 4)
        .withColumn("grams", expr(
          "array_distinct(transform(sequence(1, length(txt) - 3)," +
            " i -> substring(txt, i, 4)))"))
        .withColumn("blockh",
          expr(s"array_min(transform(shingles, x -> ${hashOf("concat('p:', x)")}))"))
        .select(col("doc_id").as(s"${alias}_id"),
          col("grams").as(s"${alias}_g"), col("blockh").as(s"${alias}_m"))
    val a = grams("a")
    val b = grams("b")
    a.join(b, col("a_m") === col("b_m") && col("a_id") < col("b_id"))
      .withColumn("inter",
        size(array_intersect(col("a_g"), col("b_g"))).cast("long"))
      .withColumn("uni",
        (size(col("a_g")) + size(col("b_g"))).cast("long") - col("inter"))
      .filter(col("inter") * 2 >= col("uni")) // j >= 0.5 in integer space
      .select(col("a_id").as("id1"), col("b_id").as("id2"),
        col("inter"), col("uni"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  val q34Sql: String = sqlShingles + """,
    gm AS (
      SELECT sh.doc_id,
        list_distinct(list_transform(range(1, length(d.txt) - 2),
          i -> d.txt[i:i+3])) AS grams,
        list_min(list_transform(sh.shingles, x ->
          CAST('0x' || substring(md5('p:' || x), 1, 15) AS BIGINT))) AS blockh
      FROM sh JOIN (SELECT doc_id, trim(lower(text)) AS txt
                    FROM documents) d ON d.doc_id = sh.doc_id
      WHERE length(d.txt) >= 4)
    SELECT a.doc_id AS id1, b.doc_id AS id2,
      CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT) AS inter,
      CAST(len(a.grams) + len(b.grams)
        - len(list_intersect(a.grams, b.grams)) AS BIGINT) AS uni,
      CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
        AS jaccard
    FROM gm a JOIN gm b ON a.blockh = b.blockh AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.grams, b.grams)) * 2 >=
      len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))
    ORDER BY id1, id2"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_exact_dedup"   -> q29ExactDedup _,
    "q30_minhash_sig"   -> q30MinhashSig _,
    "q31_minhash_pairs" -> q31MinhashPairs _,
    "q32_simhash"       -> q32Simhash _,
    "q33_simhash_pairs" -> q33SimhashPairs _,
    "q34_ngram_jaccard" -> q34NgramJaccard _)

  val oracles: Map[String, String] = Map(
    "q29_exact_dedup"   -> q29Sql,
    "q30_minhash_sig"   -> q30Sql,
    "q31_minhash_pairs" -> q31Sql,
    "q32_simhash"       -> q32Sql,
    "q33_simhash_pairs" -> q33Sql,
    "q34_ngram_jaccard" -> q34Sql)
}
