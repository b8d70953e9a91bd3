package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** End-to-end training-data prep as ONE declarative query (SURVEY.md
  * §2.12 [N] — the composition the individual operators exist for):
  *
  *   documents → quality gate → exact-dedup (keep canonical copy) →
  *   deterministic subsample → training manifest
  *
  * Each stage is the library operator the standalone queries verify
  * (q25's stopword band, q29's md5 keep-min-id dedup, q53's hash-gated
  * bernoulli), composed as plain DataFrame transforms into a single
  * Catalyst plan — filters fuse with the scan, the only shuffle is the
  * dedup's hash aggregate, and the sample gate is a pure row property
  * that rides the scan. At 100 TB the whole prep is one job whose
  * shuffle volume is the post-filter survivor set, not the corpus.
  */
object Pipeline {

  private val Stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  // q66: the composed prep manifest.
  def q66PrepPipeline(s: SparkSession, d: String): DataFrame = {
    graft.expressions.Hash60.register(s)
    // stage 1 — quality gate (q25's "good" band: length + stopword ratio)
    val quality = Tables.documents(s, d)
      .withColumn("tokens", split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
      .withColumn("n_stop",
        size(filter(col("tokens"), t => t.isInCollection(Stops))).cast("long"))
      .filter(col("n_tokens") >= 20 && col("n_stop") * 20 >= col("n_tokens")
        && col("n_stop") * 2 <= col("n_tokens"))
      .withColumn("content_md5", md5(col("text")))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("content_md5"))
    // stage 2 — exact dedup among survivors: keep the min-doc_id copy
    // (q29's ON-CONFLICT-at-corpus-scale shape; one hash shuffle)
    val canon = quality.groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("canon_id"))
    // stage 3 — deterministic 50% subsample (q53's hash gate: membership
    // is a row property — same set on any partitioning, any rerun)
    quality.join(canon, "content_md5")
      .filter(col("doc_id") === col("canon_id"))
      .filter(expr(
        "h60(concat('prep:', cast(doc_id as string))) % 1000 < 500"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("content_md5"))
      .orderBy(col("doc_id"))
  }

  val q66Sql: String = """
    WITH quality AS (
      SELECT doc_id, lang, CAST(length(toks) AS BIGINT) AS n_tokens,
        CAST(length(list_filter(toks, t ->
          list_contains(['the','a','of','and','to','in','is','it'], t)))
          AS BIGINT) AS n_stop,
        md5(text) AS content_md5
      FROM (SELECT doc_id, lang, text,
              string_split_regex(trim(lower(text)), '[ \t\n\r\f]+') AS toks
            FROM documents)),
    gated AS (
      SELECT doc_id, lang, n_tokens, content_md5 FROM quality
      WHERE n_tokens >= 20 AND n_stop * 20 >= n_tokens
        AND n_stop * 2 <= n_tokens),
    canon AS (
      SELECT content_md5, MIN(doc_id) AS canon_id
      FROM gated GROUP BY content_md5)
    SELECT g.doc_id, g.lang, g.n_tokens, g.content_md5
    FROM gated g JOIN canon c USING (content_md5)
    WHERE g.doc_id = c.canon_id
      AND CAST('0x' || substring(md5('prep:' || CAST(g.doc_id AS VARCHAR)),
        1, 15) AS BIGINT) % 1000 < 500
    ORDER BY g.doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_prep_pipeline" -> q66PrepPipeline _)

  val oracles: Map[String, String] = Map(
    "q66_prep_pipeline" -> q66Sql)
}
