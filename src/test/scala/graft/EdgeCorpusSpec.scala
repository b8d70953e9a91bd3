package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-corpus guards for the cross-engine edges the dense, clean
  * driver fixtures cannot exercise: zero-token documents sitting exactly
  * on chunk boundaries (where Spark's truncating `div` + descending
  * `sequence` used to diverge from DuckDB's flooring `//` + empty
  * `generate_series`), and gapped/offset doc_id spaces (where q137's old
  * id-value checkpoint formula degenerated). The matching DuckDB-side
  * parity was driven end-to-end via Verify + check.py on this same
  * corpus shape (round 9); these tests pin the Spark-side semantics.
  */
class EdgeCorpusSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val dir = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("edge-docs").toString
    def words(n: Int, tag: String) =
      (0 until n).map(i => s"${tag}w$i").mkString(" ")
    val rows = Seq(
      (0L, "   \t\n ", "en", "src0"),            // 0 tokens at start = 0
      (1L, words(128, "a1"), "en", "src1"),
      (2L, words(128, "a2"), "en", "src1"),
      (3L, words(128, "a3"), "en", "src1"),
      (4L, words(128, "a4"), "en", "src1"),
      (5L, " \f\r ", "de", "src2"),              // 0 tokens at start = 512
      (6L, words(77, "b"), "es", "src3"),
      (999L, words(300, "c"), "en", "src4"),     // gapped id
      (10000000L, words(40, "r0"), "fr", "src5"), // offset replicas
      (10000001L, words(41, "r1"), "fr", "src5"),
      (10000002L, words(42, "r2"), "fr", "src5"),
      (10000003L, words(43, "r3"), "fr", "src5"),
      (10000004L, words(44, "r4"), "fr", "src5"))
    rows.map { case (i, t, l, s0) => (i, t, l, s0, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("q83/q93: a zero-token doc emits exactly one zero-length span at its position") {
    val spans = ops.CurationOps.q83PackSpans(spark, dir)
    val z = spans.filter(col("doc_id").isin(0L, 5L)).collect()
    assert(z.length == 2, s"expected one span per zero-token doc: ${z.toSeq}")
    assert(z.forall(_.getAs[Long]("span_len") == 0L))
    // doc5 sits exactly at token offset 512 = chunk 1 (the old
    // descending-sequence site emitted chunks 1 AND 0 here)
    assert(z.find(_.getAs[Long]("doc_id") == 5L).get
      .getAs[Long]("chunk_id") == 1L)
    val w = ops.CurationOps.q93SlidingSpans(spark, dir)
      .filter(col("doc_id").isin(0L, 5L))
    assert(w.filter(col("span_len") =!= 0L).count() == 0)
  }

  test("q74/q128: zero-token docs are never boundary docs") {
    val packed = ops.CurationOps.q74SeqPacking(spark, dir).collect()
    // chunk 1 starts exactly at doc5's position: doc5 must count as a
    // member but not as a boundary crossing
    val c1 = packed.find(_.getAs[Long]("chunk_id") == 1L).get
    assert(c1.getAs[Long]("first_doc") == 5L)
    val total = packed.map(_.getAs[Long]("n_tokens")).sum
    assert(total == 1099L) // corpus token mass conserved
  }

  test("q146/q148/q149/q150 survive zero-token docs and gapped ids") {
    // q149: zero-token docs used to throw (sequence(1, 0) counts DOWN in
    // Spark, then t[0] on the empty array errors); now they contribute
    // no hits — and this corpus has no blocklist words at all
    assert(ops.TextOps.q149KwicContexts(spark, dir).count() == 0)
    // q148: the two zero-token docs drop out (both engines filter
    // len >= 1); every tagged word is unique per doc, so TTR is exactly
    // 1e6 and concentration is minimal (sum c^2 = n)
    val div = ops.TextOps.q148LexicalDiversity(spark, dir).collect()
    assert(div.length == 11)
    assert(div.forall(_.getAs[Long]("ttr_ppm") == 1000000L))
    div.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("simpson_ppm") == n * 1000000L / (n * n))
      assert(r.getAs[String]("diversity_band") == "diverse")
    }
    // q146: all-unique words per doc -> every adjacent bigram is
    // distinct, one row each: sum(max(len - 1, 0))
    assert(ops.TextOps.q146PmiAssoc(spark, dir).count() ==
      (4 * 127 + 76 + 299 + 39 + 40 + 41 + 42 + 43).toLong)
    spark.catalog.clearCache() // q146 persists its pair frame
    // q150: zero-token docs pad their whole window; identities hold
    val pw = ops.TextOps.q150PaddingWaste(spark, dir).collect()
    val totTok = 1099L
    pw.foreach { r =>
      val l = r.getAs[Long]("ctx_len")
      assert(r.getAs[Long]("n_docs") == 13L)
      assert(r.getAs[Long]("kept_tokens") +
        r.getAs[Long]("padded_tokens") == 13L * l)
      assert(r.getAs[Long]("kept_tokens") +
        r.getAs[Long]("truncated_tokens") == totTok)
    }
  }

  test("q137 checkpoints follow doc order, not id values, on gapped/offset ids") {
    val r = ops.TextOps.q137VocabGrowth(spark, dir).collect()
    assert(r.length == 10, s"expected 10 checkpoints: ${r.toSeq}")
    assert(r.map(_.getAs[Long]("checkpoint")).toSeq == (1L to 10L))
    // cumulative docs end at the corpus size and grow monotonically
    val docs = r.map(_.getAs[Long]("docs_cum")).toSeq
    assert(docs.last == 13L && docs == docs.sorted)
    spark.catalog.clearCache() // q137 persists its token frame
  }

  test("q155 drops blank docs entirely (oracle parity: no one-token 'unknown' rows)") {
    val r = ops.TextOps.q155LangConsistency(spark, dir).collect()
    // docs 0 and 5 are whitespace-only: raw split would read them as a
    // single empty token and chunk them; the oracle (and now the Spark
    // side) drops them before the gate
    assert(!r.exists(x => Set(0L, 5L)(x.getAs[Long]("doc_id"))))
    assert(r.length == 11)
  }

  test("q169/q175/q177/q178 survive blank docs, gapped ids, and a stopword-free corpus") {
    // q169: blank docs contribute zero tokens; decades still partition
    // the whole token mass
    val nTok = Tables.documents(spark, dir)
      .select(explode(split(trim(lower(col("text"))),
        "[ \\t\\n\\r\\f]+")).as("t"))
      .filter(col("t") =!= "").count()
    val spec = ops.TextOps.q169FreqSpectrum(spark, dir).collect()
    assert(spec.nonEmpty)
    assert(spec.map(_.getAs[Long]("token_mass")).sum == nTok)
    // q175: whitespace-only docs have positive char mass (prose band,
    // not 'empty'); every doc lands in exactly one (source, screen) cell
    val cc = ops.TextOps.q175CharClassProfile(spark, dir).collect()
    assert(cc.map(_.getAs[Long]("n_docs")).sum == 13L)
    assert(!cc.exists(_.getAs[String]("screen") == "empty"))
    // q177: every tag-word is unique to its source → full exclusivity;
    // blank-only sources (src0/src2) contribute no vocabulary at all
    val ex = ops.TextOps.q177VocabExclusivity(spark, dir).collect()
    assert(ex.nonEmpty)
    assert(ex.forall(_.getAs[Long]("excl_type_ppm") == 1000000L))
    assert(!ex.exists(r => Set("src0", "src2")(r.getAs[String]("source"))))
    // q178: the tag vocabulary contains no stopwords at all — every
    // source (including the blank-only ones) must report no_signal with
    // NULL deviations, and the corpus-mass divisions must not throw
    val sd = ops.TextOps.q178StopwordDrift(spark, dir).collect()
    assert(sd.length == 6)
    assert(sd.forall(_.getAs[String]("band") == "no_signal"))
    assert(sd.forall(r => r.isNullAt(r.fieldIndex("l1_dev_ppm"))))
  }

  test("q170/q172/q173/q176 survive a single-user single-event stream") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("edge-events").toString
    Seq((1L, new java.sql.Timestamp(1700000000000L), 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    // q170: the lone event is an entry transition
    val tr = ops.ExtOps.q170EventTransitions(spark, d).collect()
    assert(tr.length == 1 && tr.head.getAs[String]("prev_type") == "<start>"
      && tr.head.getAs[Long]("p_next_ppm") == 1000000L)
    // q172: no gaps exist — EMPTY output, not a crash
    assert(ops.ExtOps.q172GapSpectrum(spark, d).collect().isEmpty)
    // q173: one single-event user
    val ur = ops.ExtOps.q173UserRates(spark, d).collect()
    assert(ur.length == 1 && ur.head.getAs[Int]("band") == -2
      && ur.head.getAs[String]("screen") == "single_event"
      && ur.head.getAs[Long]("user_ppm") == 1000000L)
    // q176: one cell, trivially the peak
    val dp = ops.ExtOps.q176DiurnalProfile(spark, d).collect()
    assert(dp.length == 1 && dp.head.getAs[Boolean]("is_peak")
      && dp.head.getAs[Long]("share_ppm") == 1000000L)
  }

  test("q185/q186/q189 survive zero-token docs and gapped/offset ids") {
    // q185: the two zero-token docs drop (n_tokens >= 1 gate) but the
    // bucketed join must still carry every tokenized doc — including
    // the gapped id 999 and the 1e7-offset replicas
    val bj = ops.Skew.q185BucketJoin(spark, dir).collect()
    assert(bj.map(_.getAs[Long]("n_docs")).sum == 11L, bj.mkString(";"))
    assert(!bj.map(_.getAs[String]("source")).contains("src0"))
    // q186: zero-token docs still carry n_chars weight (w = min(chars,
    // 512)) — ESS is a LENGTH audit, not a token audit; every source
    // present, all integers exact on the tiny corpus
    val ess = ops.StatsOps.q186EffectiveSample(spark, dir).collect()
    assert(ess.length == 6)
    ess.foreach(r => assert(r.getAs[Long]("ess_docs") >= 1L, r.toString))
    // q189: whitespace-only text (doc0/doc5) must survive the CSV hop
    // byte-for-byte — exactly the writer-trim trap the option disables
    val rt = ops.Ingest.q189CsvRoundtrip(spark, dir).collect()
    val direct = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        sum(col("n_chars")).as("char_sum"),
        md5(concat_ws("", sort_array(collect_list(md5(col("text"))))))
          .as("content_md5"))
      .orderBy(col("source")).collect()
    assert(rt.sameElements(direct),
      rt.mkString(";") + " vs " + direct.mkString(";"))
  }

  test("q190/q191 survive a single-day event stream (window degenerates to one day)") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("edge-ev-oneday").toString
    // 1970-01-05 was a Monday (epoch day 4): q191's dow filter keeps it
    val ts0 = java.sql.Timestamp.valueOf("1970-01-05 10:00:00")
    Seq((1L, ts0, 7L, "view", 1.0, "{}"),
      (2L, ts0, 8L, "click", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val pp = ops.Ingest.q190PartitionPruning(spark, d).collect()
    assert(pp.length == 2 && pp.forall(_.getAs[Long]("n") == 1L))
    val dyn = ops.Ingest.q191DynamicPruning(spark, d).collect()
    assert(dyn.length == 2, dyn.mkString(";"))
  }

  test("q229/q238/q217 degrade on zero-token and gapped-id documents") {
    // q229: whitespace-only docs still count a nonempty-filtered 0 and
    // must not zero-divide — the all-zero language grades 'degenerate'
    val fert = ops.TextOps.q229TokenFertility(spark, dir).collect()
      .map(x => x.getAs[String]("lang") -> x).toMap
    // 'de' has only doc 5 (whitespace-only: 0 tokens)
    assert(fert("de").getAs[Long]("n_tokens") == 0L)
    assert(fert("de").isNullAt(fert("de").fieldIndex(
      "chars_per_token_milli")))
    assert(fert("de").getAs[String]("fertility_band") == "degenerate")
    // q238: zero-token docs are excluded from the packing budget — the
    // doc count is the 11 token-bearing docs, not 13
    val bud = ops.CurationOps.q238ContextBudget(spark, dir).collect()
    assert(bud.forall(_.getAs[Long]("n_docs") == 11L), bud.mkString(";"))
    spark.catalog.clearCache()
    // q217: runs crash-free on the gapped corpus; AUC stays in [0, 1e6]
    // and single-doc sources grade without dividing by zero
    val rt = ops.StatsOps.q217RankTest(spark, dir).collect()
    assert(rt.length == 6) // six sources
    rt.foreach { x =>
      val auc = x.getAs[Long]("auc_ppm")
      assert(auc >= 0L && auc <= 1000000L, x.toString)
    }
    spark.catalog.clearCache()
  }
}
