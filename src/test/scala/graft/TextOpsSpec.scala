package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import ops.TextOps

class TextOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("fingerprint is content-determined: same text same fp, distinct texts distinct fp") {
    val fp = TextOps.q28Fingerprint(spark, sf)
    val docs = Tables.documents(spark, sf)
    // all texts in the corpus are distinct → fps must be (mod-collisions
    // aside, none at this size)
    assert(fp.select("fp").distinct().count() == docs.count())
    // duplicating the input duplicates the fingerprint
    val doubled = docs.unionByName(docs)
    val fp2 = doubled.withColumn("fp", expr(
      "aggregate(split(text, ''), 0L," +
        " (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)"))
    assert(fp2.groupBy("fp").count().filter(col("count") =!= 2).count() == 0)
  }

  test("quality bands partition the corpus and ratios are in [0,1]") {
    val q = TextOps.q25TextQuality(spark, sf)
    assert(q.count() == Tables.documents(spark, sf).count())
    assert(q.filter(col("stop_ratio") < 0 || col("stop_ratio") > 1).count() == 0)
    assert(q.filter(!col("quality_band").isin("good", "fair", "low")).count() == 0)
  }

  test("lang-id confusion matrix covers every document exactly once") {
    val m = TextOps.q26LangId(spark, sf)
    val total = m.agg(sum("n")).head().getLong(0)
    assert(total == Tables.documents(spark, sf).count())
  }

  test("BPE-ish token count >= whitespace token count") {
    val t = TextOps.q27TokenCounts(spark, sf)
    assert(t.filter(col("sum_bpe_tokens") < col("sum_ws_tokens")).count() == 0)
  }

  test("q103 pair counts are rank-ordered and match a posexplode recount") {
    val top = TextOps.q103BpePairs(spark, sf).collect()
    val counts = top.map(_.getAs[Long]("n"))
    assert(counts.sameElements(counts.sorted.reverse))
    // independent recount of the #1 pair through a positional self-join
    // (a mechanism q103 never uses: posexplode + pos+1 equi-join)
    val Array(w1, w2) = top.head.getAs[String]("pair").split(" ", 2)
    val pos = Tables.documents(spark, sf)
      .select(col("doc_id"), posexplode(
        split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"))
        .as(Seq("p", "tok")))
    val n = pos.filter(col("tok") === w1).as("a")
      .join(pos.filter(col("tok") === w2).as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.p") === col("a.p") + 1)
      .count()
    assert(n == top.head.getAs[Long]("n"))
  }

  test("q126 applies merges greedily left-to-right with chaining") {
    val enc = TextOps.q126BpeEncode(spark, sf).collect()
      .map(r => r.getAs[String]("word") ->
        (r.getAs[Long]("n_sub"), r.getAs[String]("ids"))).toMap
    // "the": t+h -> th, then th+e -> the (chained merges) — one symbol
    assert(enc.get("the").forall(_._1 == 1L),
      s"'the' should collapse to one symbol: ${enc.get("the")}")
    // "fast": only s+t fires -> [f, a, st]
    assert(enc.get("fast").forall(_._1 == 3L), s"${enc.get("fast")}")
    // "scan": only a+n fires -> [s, c, an]
    assert(enc.get("scan").forall(_._1 == 3L), s"${enc.get("scan")}")
    // ids are dense ranks over the emergent vocab: every id re-occurs
    // consistently — same word twice through the encoder is identical
    val again = TextOps.q126BpeEncode(spark, sf).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[String]("ids")).toMap
    enc.foreach { case (w, (_, ids)) => assert(again(w) == ids) }
  }

  test("q127 gradient is the exact signed occurrence count per bucket") {
    val g = TextOps.q127LogisticFit(spark, sf).collect()
    // per bucket: grad = n_pos - (n_occ - n_pos), and the clamp holds
    g.foreach { r =>
      val (occ, pos, grad, w) = (r.getAs[Long]("n_occ"),
        r.getAs[Long]("n_pos"), r.getAs[Long]("grad"),
        r.getAs[Long]("w_fitted"))
      assert(grad == pos - (occ - pos), s"bucket ${r.get(0)}")
      assert(w == math.max(-1000L, math.min(1000L, grad)))
    }
    // totals recount: sum of grads = signed token mass of the corpus
    val expect = Tables.documents(spark, sf)
      .select(when(col("lang") === "en", 1L).otherwise(-1L).as("y2"),
        size(filter(split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"),
          t => t =!= lit(""))).cast("long").as("n"))
      .agg(sum(col("y2") * col("n"))).head().getLong(0)
    assert(g.map(_.getAs[Long]("grad")).sum == expect)
  }

  test("q109: logit matches an md5-route recount; gate is logit > 0") {
    val r = TextOps.q109QualityModel(spark, sf)
    assert(r.count() == Tables.documents(spark, sf).count())
    assert(r.filter(col("pass") =!= (col("logit") > 0)).count() == 0)
    // weights live in [-1000, 1000], so |logit| <= 1000 * n_tokens
    assert(r.filter(abs(col("logit")) > col("n_tokens") * 1000).count() == 0)
    // rebuild the hashed-bag dot product through Spark's md5/conv
    // built-ins (NOT the Hash60 expression): bucket = first-60-md5-bits
    // mod 64, weight = first-60-md5-bits of 'qw:<bucket>' mod 2001 - 1000
    val expect = Tables.documents(spark, sf)
      .withColumn("tok", explode(split(trim(lower(col("text"))),
        "[ \\t\\n\\r\\f]+")))
      .filter(col("tok") =!= "")
      .withColumn("bucket",
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long") % 64)
      .withColumn("w",
        conv(substring(md5(concat(lit("qw:"), col("bucket").cast("string"))),
          1, 15), 16, 10).cast("long") % 2001 - 1000)
      .groupBy(col("doc_id"))
      .agg(sum(col("w")).as("e_logit"), count(lit(1)).as("e_n"))
    val bad = r.join(expect, Seq("doc_id"), "left")
      .filter(coalesce(col("e_logit"), lit(0L)) =!= col("logit") ||
        coalesce(col("e_n"), lit(0L)) =!= col("n_tokens"))
    assert(bad.count() == 0)
  }

  test("q131 round 2: gradient bounded by occurrence mass, step descends") {
    val r = TextOps.q131SgdRound2(spark, sf).collect()
    r.foreach { row =>
      val (occ, g, w1, w2) = (row.getAs[Long]("n_occ"),
        row.getAs[Long]("g_num"), row.getAs[Long]("w_round1"),
        row.getAs[Long]("w_round2"))
      // |Σ(y·L − p_num)| <= n_occ · L — each term is a probability gap
      assert(math.abs(g) <= occ * (1L << 20), s"bucket ${row.get(0)}")
      // the update is w1 + floor(2·g/L) clamped — recompute exactly
      val step = Math.floorDiv(2 * g, 1L << 20)
      val expect = math.max(-1000L, math.min(1000L, w1 + step))
      assert(w2 == expect, s"bucket ${row.get(0)}: $w2 != $expect")
    }
    // round-1 weights must agree with q127's fitted weights per bucket
    val w127 = TextOps.q127LogisticFit(spark, sf).collect()
      .map(x => x.getAs[Long]("bucket") -> x.getAs[Long]("w_fitted")).toMap
    r.foreach { row =>
      assert(row.getAs[Long]("w_round1") ==
        w127(row.getAs[Long]("bucket")))
    }
  }

  test("q133 ensemble: verdict is the stated priority over the signals") {
    val r = TextOps.q133FilterEnsemble(spark, sf)
    assert(r.count() == Tables.documents(spark, sf).count())
    // replay the mixer rule from the signal columns — must reproduce it
    val bad = r.withColumn("e_verdict",
      when(col("quality_band") === "low", "drop:heuristic")
        .when(!col("model_pass"), "drop:model")
        .when(col("fluency_band") === "low", "drop:fluency")
        .otherwise("keep"))
      .filter(col("verdict") =!= col("e_verdict"))
    assert(bad.count() == 0)
    // attribution partitions: every doc has exactly one verdict value
    assert(r.filter(!col("verdict").isin(
      "drop:heuristic", "drop:model", "drop:fluency", "keep")).count() == 0)
  }

  test("q137 growth curve: monotone, ends at exact corpus totals") {
    val r = TextOps.q137VocabGrowth(spark, sf).collect()
      .sortBy(_.getAs[Long]("checkpoint"))
    assert(r.length == 10)
    // all three cumulative series are non-decreasing
    r.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("docs_cum") <= b.getAs[Long]("docs_cum"))
      assert(a.getAs[Long]("tokens_cum") <= b.getAs[Long]("tokens_cum"))
      assert(a.getAs[Long]("vocab_cum") <= b.getAs[Long]("vocab_cum"))
    }
    // checkpoint 10 = the whole corpus, recounted independently
    val docs = Tables.documents(spark, sf)
      .withColumn("t", filter(split(trim(lower(col("text"))),
        "[ \\t\\n\\r\\f]+"), x => x =!= lit("")))
    val last = r.last
    assert(last.getAs[Long]("docs_cum") == docs.count())
    assert(last.getAs[Long]("tokens_cum") ==
      docs.agg(sum(size(col("t")).cast("long"))).head().getLong(0))
    assert(last.getAs[Long]("vocab_cum") ==
      docs.select(explode(col("t")).as("w")).distinct().count())
  }

  test("q138 Gopher rules: n_failed reconciles, verdict matches, battery discriminates") {
    val r = TextOps.q138GopherRules(spark, sf)
    val rules = Seq("r_count", "r_meanlen", "r_ttr", "r_single", "r_stop")
    // n_failed is exactly the count of false rules, keep iff none failed
    val recount = rules.map(c => when(col(c), 0L).otherwise(1L)).reduce(_ + _)
    assert(r.filter(col("n_failed") =!= recount).count() == 0)
    assert(r.filter(col("gopher_keep") =!= (col("n_failed") === 0)).count() == 0)
    // the battery discriminates on this corpus: both verdicts occur, and
    // every rule individually fails somewhere (no vacuous rule shipped)
    assert(r.filter(col("gopher_keep")).count() > 0)
    assert(r.filter(!col("gopher_keep")).count() > 0)
    rules.foreach { c =>
      assert(r.filter(!col(c)).count() > 0, s"rule $c never fires")
    }
    // spot-recompute one rule from raw text: token-count floor
    val n = Tables.documents(spark, sf)
      .withColumn("n", size(filter(split(trim(lower(col("text"))),
        "[ \\t\\n\\r\\f]+"), x => x =!= lit(""))).cast("long"))
    val joined = r.join(n, "doc_id")
    assert(joined.filter(col("r_count") =!= (col("n") >= 40)).count() == 0)
  }

  test("q141 TV drift: bounded, zero iff identical, brute-force parity on one source") {
    val r = TextOps.q141TokenDrift(spark, sf)
    // TV distance lives in [0, 1e6] ppm
    assert(r.filter(col("tv_ppm") < 0 || col("tv_ppm") > 1000000L)
      .count() == 0)
    // the reported top gap is a real gap: positive and <= 1e6
    assert(r.filter(col("top_gap_ppm") <= 0 ||
      col("top_gap_ppm") > 1000000L).count() == 0)
    // brute-force recompute for one source: full-vocab sum of |r_s - r_c|
    // over an outer join (the absent-word shortcut must equal this)
    val src = r.head().getAs[String]("source")
    val words = Tables.documents(spark, sf)
      .select(col("source"), explode(filter(split(trim(lower(col("text"))),
        "[ \\t\\n\\r\\f]+"), x => x =!= lit(""))).as("word"))
    val nAll = words.count()
    val nS = words.filter(col("source") === src).count()
    val corpus = words.groupBy("word").agg(count(lit(1)).as("o_w"))
      .withColumn("r_c", expr(s"o_w * 1000000 div $nAll"))
    val mine = words.filter(col("source") === src)
      .groupBy("word").agg(count(lit(1)).as("o_sw"))
      .withColumn("r_s", expr(s"o_sw * 1000000 div $nS"))
    val brute = corpus.join(mine, Seq("word"), "full_outer")
      .withColumn("gap", abs(coalesce(col("r_s"), lit(0L)) -
        coalesce(col("r_c"), lit(0L))))
      .agg((sum(col("gap")) / 2).cast("long")).head().getLong(0)
    assert(r.filter(col("source") === src).head()
      .getAs[Long]("tv_ppm") == brute)
  }

  test("q136 BPE training: true argmax, merge consumes its pair, n2 <= n1") {
    val r = TextOps.q136BpeTrain(spark, sf).collect().sortBy(_.getLong(0))
    assert(r.length == 2)
    val (p1, n1) = (r(0).getAs[String]("pair"), r(0).getAs[Long]("n"))
    val (p2, n2) = (r(1).getAs[String]("pair"), r(1).getAs[Long]("n"))
    // the merged pair cannot survive its own replacement → next argmax
    // is a different pair, and no new pair can out-count the old max
    assert(p1 != p2)
    assert(n2 <= n1)
    // iteration 1's argmax recounted independently via q103's machinery
    // weighted by word frequency (char-level: expand each word)
    val wc = Tables.documents(spark, sf)
      .select(explode(split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"))
        .as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("w"))
      .withColumn("cs", split(expr("regexp_replace(word, '(.)', '$1 ')"),
        " ").as("cs"))
    val top = wc.select(col("w"), explode(expr(
      """zip_with(slice(cs, 1, size(cs) - 2),
                  slice(cs, 2, size(cs) - 2),
                  (a, b) -> concat(a, ' ', b))""")).as("pair"))
      .groupBy("pair").agg(sum("w").as("n"))
      .orderBy(col("n").desc, col("pair")).limit(1).collect()(0)
    assert(top.getAs[String]("pair") == p1 && top.getAs[Long]("n") == n1)
  }

  test("bpeTrain generalizes to K merges: 8 distinct merges, prefix-stable") {
    val r8 = TextOps.bpeTrain(spark, sf, merges = 8)
      .collect().sortBy(_.getLong(0))
    assert(r8.length == 8, s"expected 8 merges, got ${r8.length}")
    assert(r8.map(_.getLong(0)).toSeq == (1L to 8L),
      "iterations must be consecutive from 1")
    // each merge consumes its pair; a learned pair never recurs
    val pairs = r8.map(_.getAs[String]("pair"))
    assert(pairs.distinct.length == 8, s"repeated merge: ${pairs.toSeq}")
    // greedy training: the argmax count is non-increasing across steps
    val ns = r8.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a },
      s"argmax counts must be non-increasing: ${ns.toSeq}")
    // K=2 is exactly the first two steps of K=8 (prefix property of the
    // greedy loop — also ties the looped path to the oracle'd q136)
    val r2 = TextOps.q136BpeTrain(spark, sf).collect().sortBy(_.getLong(0))
    assert(r2.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      r8.take(2).map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq)
  }

  test("q144 vocab coverage: ppm bounded, one source recounted independently") {
    val r = TextOps.q144VocabCoverage(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val oov = row.getAs[Long]("oov_ppm")
      assert(oov >= 0L && oov <= 1000000L, row.toString)
      assert(row.getAs[Long]("in_vocab_tok") <= row.getAs[Long]("n_tok"))
      assert(row.getAs[Long]("in_vocab_types") <=
        math.min(row.getAs[Long]("n_types"), 1000L))
    }
    // brute recount for the first source: top-1000 corpus words via the
    // same (count desc, word) order, then token-mass coverage off raw text
    val words = Tables.documents(spark, sf)
      .select(col("source"),
        explode(split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"))
          .as("word"))
      .filter(col("word") =!= "")
    val vocabSet = words.groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(1000)
      .select("word").collect().map(_.getString(0)).toSet
    val src = r.head.getAs[String]("source")
    val toks = words.filter(col("source") === src)
      .select("word").collect().map(_.getString(0))
    val inVocab = toks.count(vocabSet.contains)
    assert(r.head.getAs[Long]("n_tok") == toks.length.toLong)
    assert(r.head.getAs[Long]("in_vocab_tok") == inVocab.toLong)
    assert(r.head.getAs[Long]("oov_ppm") ==
      (toks.length.toLong - inVocab) * 1000000L / toks.length)
  }

  test("q146 PMI assoc: brute bigram recount reproduces lift and bands") {
    val r = TextOps.q146PmiAssoc(spark, sf).collect()
    assert(r.nonEmpty)
    // driver-side recount from raw text
    val texts = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
    val bigrams = texts.flatMap { t =>
      val w = t.trim.toLowerCase.split("[ \\t\\n\\r\\f]+").filter(_.nonEmpty)
      w.zip(w.drop(1))
    }
    val cBi = bigrams.groupBy(identity).map { case (k, v) =>
      (k, v.length.toLong)
    }
    val cL = cBi.groupBy(_._1._1).map { case (w, m) => (w, m.values.sum) }
    val cR = cBi.groupBy(_._1._2).map { case (w, m) => (w, m.values.sum) }
    val n = cBi.values.sum
    assert(r.length == cBi.size, "one row per distinct bigram")
    r.foreach { row =>
      val k = (row.getAs[String]("w1"), row.getAs[String]("w2"))
      assert(row.getAs[Long]("c_bi") == cBi(k), s"count mismatch at $k")
      val lift = (cBi(k) * 1000000L / cL(k._1)) * n / cR(k._2)
      assert(row.getAs[Long]("lift_ppm") == lift, s"lift mismatch at $k")
      val band = if (lift >= 1200000L) "assoc"
        else if (lift <= 800000L) "repel" else "indep"
      assert(row.getAs[String]("assoc_band") == band, s"band at $k")
    }
    // the corpus must actually exercise more than one band
    assert(r.map(_.getAs[String]("assoc_band")).distinct.length >= 2)
  }

  test("q148 lexical diversity: brute per-doc recount matches every row") {
    val r = TextOps.q148LexicalDiversity(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getString(1))).toMap
    assert(r.length == docs.size, "all docs have >=1 token at this SF")
    r.foreach { row =>
      val t = docs(row.getAs[Long]("doc_id")).trim.toLowerCase
        .split("[ \\t\\n\\r\\f]+").filter(_.nonEmpty)
      val n = t.length.toLong
      val counts = t.groupBy(identity).map(_._2.length.toLong)
      val c2 = counts.map(c => c * c).sum
      assert(row.getAs[Long]("n_tokens") == n)
      assert(row.getAs[Long]("n_types") == counts.size.toLong)
      assert(row.getAs[Long]("ttr_ppm") == counts.size * 1000000L / n)
      assert(row.getAs[Long]("simpson_ppm") == c2 * 1000000L / (n * n))
      val band = if (c2 * 25L >= n * n * 2L) "concentrated"
        else if (c2 * 20L >= n * n) "mid" else "diverse"
      assert(row.getAs[String]("diversity_band") == band)
    }
  }

  test("q148 degrade route: an over-bound doc gets identical TTR/Simpson via explode+groupBy") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lexdiv-long").toString
    // an adversarially long doc (> LexDivTokenBound tokens) with a
    // mid-diversity profile, plus an in-bound control with the SAME
    // token multiset — the two routes must agree exactly
    val rnd = new scala.util.Random(42)
    val longToks = (0 until 12000).map(_ => s"w${rnd.nextInt(3000)}")
    val shortToks = (0 until 200).map(_ => s"w${rnd.nextInt(60)}")
    Seq((1L, longToks.mkString(" "), "en", "srcL"),
        (2L, shortToks.mkString(" "), "en", "srcL"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions
        .length(org.apache.spark.sql.functions.col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    assert(longToks.length > ops.TextOps.LexDivTokenBound)
    val r = TextOps.q148LexicalDiversity(spark, dir).collect()
    assert(r.length == 2)
    Seq(1L -> longToks, 2L -> shortToks).foreach { case (id, toks) =>
      val row = r.find(_.getAs[Long]("doc_id") == id).get
      val n = toks.length.toLong
      val counts = toks.groupBy(identity).map(_._2.length.toLong)
      val c2 = counts.map(c => c * c).sum
      assert(row.getAs[Long]("n_tokens") == n)
      assert(row.getAs[Long]("n_types") == counts.size.toLong)
      assert(row.getAs[Long]("ttr_ppm") == counts.size * 1000000L / n)
      assert(row.getAs[Long]("simpson_ppm") == c2 * 1000000L / (n * n))
    }
  }

  test("q155 lang consistency: brute per-chunk vote recount matches every doc") {
    val r = TextOps.q155LangConsistency(spark, sf).collect()
    val markers = Map(
      "en" -> Set("the", "is", "and"), "de" -> Set("der", "und", "die"),
      "es" -> Set("el", "los", "que"), "fr" -> Set("le", "les", "est"))
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getString(1)))
      .filter { case (_, text) =>
        text.trim.toLowerCase.split("[ \\t\\n\\r\\f]+")
          .count(_.nonEmpty) >= 1
      }
    assert(r.length == docs.length)
    val byId = r.map(x => x.getAs[Long]("doc_id") -> x).toMap
    docs.foreach { case (id, text) =>
      val t = text.trim.toLowerCase.split("[ \\t\\n\\r\\f]+")
        .filter(_.nonEmpty)
      val preds = t.grouped(50).map { ch =>
        val v = Seq("en", "de", "es", "fr")
          .map(l => l -> ch.count(markers(l))).toMap
        if (v.values.sum == 0) "unknown"
        else if (v("en") >= v("de") && v("en") >= v("es") &&
          v("en") >= v("fr")) "en"
        else if (v("de") >= v("es") && v("de") >= v("fr")) "de"
        else if (v("es") >= v("fr")) "es"
        else "fr"
      }.toSeq
      val row = byId(id)
      val counts = Seq("en", "de", "es", "fr", "unknown")
        .map(l => l -> preds.count(_ == l).toLong).toMap
      assert(row.getAs[Long]("n_chunks") == preds.length.toLong)
      assert(row.getAs[Long]("c_en") == counts("en"))
      assert(row.getAs[Long]("c_de") == counts("de"))
      assert(row.getAs[Long]("c_es") == counts("es"))
      assert(row.getAs[Long]("c_fr") == counts("fr"))
      assert(row.getAs[Long]("c_unk") == counts("unknown"))
      val major =
        if (counts("en") >= counts("de") && counts("en") >= counts("es")
          && counts("en") >= counts("fr")
          && counts("en") >= counts("unknown")) "en"
        else if (counts("de") >= counts("es") && counts("de") >= counts("fr")
          && counts("de") >= counts("unknown")) "de"
        else if (counts("es") >= counts("fr")
          && counts("es") >= counts("unknown")) "es"
        else if (counts("fr") >= counts("unknown")) "fr"
        else "unknown"
      assert(row.getAs[String]("lang_major") == major)
      val nMaj = counts.values.max
      val band = if (nMaj == preds.length.toLong) "uniform"
        else if (nMaj * 4 >= preds.length.toLong * 3) "minor_mix"
        else "code_switched"
      assert(row.getAs[String]("consistency_band") == band)
    }
  }

  test("q155 flags a planted bilingual document as code_switched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("langmix").toString
    val en = (1 to 60).map(i => s"the cat is w$i and").mkString(" ")
    val de = (1 to 60).map(i => s"der hund und w$i die").mkString(" ")
    Seq((1L, s"$en $de", "en", "srcM"), (2L, en, "en", "srcM"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions
        .length(org.apache.spark.sql.functions.col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val r = TextOps.q155LangConsistency(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[String]("consistency_band") == "code_switched",
      r(1L).toString)
    assert(r(1L).getAs[Long]("c_en") >= 1L && r(1L).getAs[Long]("c_de") >= 1L)
    assert(r(2L).getAs[String]("consistency_band") == "uniform")
    assert(r(2L).getAs[String]("lang_major") == "en")
  }

  test("q149 KWIC: every blocklist hit appears once with a clamped context") {
    val r = TextOps.q149KwicContexts(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getString(1)))
    val block = Set("slow", "big")
    val expected = docs.flatMap { case (id, text) =>
      val t = text.trim.toLowerCase.split("[ \\t\\n\\r\\f]+")
        .filter(_.nonEmpty)
      t.zipWithIndex.collect { case (w, i) if block(w) =>
        val lo = math.max(0, i - 2)
        val hi = math.min(t.length - 1, i + 2)
        (id, (i + 1).toLong, w, t.slice(lo, hi + 1).mkString(" "))
      }
    }.sortBy(x => (x._1, x._2))
    assert(r.length == expected.length)
    r.zip(expected).foreach { case (row, e) =>
      assert((row.getAs[Long]("doc_id"), row.getAs[Long]("pos"),
        row.getAs[String]("term"), row.getAs[String]("context")) == e)
    }
    // edge clamp is actually exercised: some hit sits within 2 tokens of
    // a doc boundary (context shorter than 5 tokens)
    assert(r.exists(_.getAs[String]("context")
      .split(" ").length < 5))
  }

  test("q150 padding waste: conservation identities per context length") {
    val r = TextOps.q150PaddingWaste(spark, sf).collect()
    assert(r.length == 3)
    val texts = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
    val nDocs = texts.length.toLong
    val totTok = texts.map(_.trim.toLowerCase
      .split("[ \\t\\n\\r\\f]+").count(_.nonEmpty).toLong).sum
    r.foreach { row =>
      val l = row.getAs[Long]("ctx_len")
      assert(row.getAs[Long]("n_docs") == nDocs)
      // slot conservation: kept + padded = every doc's full window
      assert(row.getAs[Long]("kept_tokens") +
        row.getAs[Long]("padded_tokens") == nDocs * l)
      // mass conservation: kept + truncated = corpus token mass
      assert(row.getAs[Long]("kept_tokens") +
        row.getAs[Long]("truncated_tokens") == totTok)
      assert(row.getAs[Long]("util_ppm") ==
        row.getAs[Long]("kept_tokens") * 1000000L / (nDocs * l))
    }
    // longer context ⇒ monotonically more kept mass, never more waste-
    // free: utilization must strictly fall once everything fits
    val byLen = r.sortBy(_.getAs[Long]("ctx_len"))
    val kept = byLen.map(_.getAs[Long]("kept_tokens"))
    assert(kept.zip(kept.tail).forall { case (a, b) => b >= a })
  }

  test("q135 DSIR: target slice scores above the rest; gate is the mean") {
    val r = TextOps.q135DsirScore(spark, sf).persist()
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    // the en slice trained the target LM — its mean score must exceed
    // the non-target mean (the selection direction DSIR promises)
    val m = r.join(docs, "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(col("score").cast("double")).as("a"))
      .collect().map(x => x.getBoolean(0) -> x.getDouble(1)).toMap
    assert(m(true) > m(false), s"en ${m(true)} !> rest ${m(false)}")
    // selected is exactly the above-mean set (integer cross-mult replay)
    val tot = r.agg(count(lit(1)).cast("long").as("n"),
      sum("score").as("s")).collect()(0)
    val (n, sTot) = (tot.getLong(0), tot.getLong(1))
    assert(r.filter(col("selected") =!=
      (col("score") * n > sTot)).count() == 0)
    // a non-degenerate split: both sides populated
    assert(r.filter(col("selected")).count() > 0)
    assert(r.filter(!col("selected")).count() > 0)
    r.unpersist()
  }

  test("q129 bigram-LM: probability mass and bigram counts reconcile") {
    val r = TextOps.q129BigramLm(spark, sf)
    // per-doc bigram count recount: n_bigrams = n_tokens - 1 (docs with
    // >= 2 tokens; shorter docs are excluded on both engines)
    val expect = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"),
          t => t =!= lit(""))).cast("long").as("n"))
      .filter(col("n") >= 2)
    assert(r.count() == expect.count())
    val bad = r.join(expect, "doc_id")
      .filter(col("n_bigrams") =!= col("n") - 1)
    assert(bad.count() == 0)
    // each smoothed conditional is a probability: 0 < ppm term, and the
    // per-doc mean stays under 1e6 (floor division can't reach 1.0 when
    // the denominator strictly exceeds the numerator: V > c_bi+1-c_ctx)
    assert(r.filter(col("sum_ppm") <= 0 ||
      col("sum_ppm") >= col("n_bigrams") * 1000000L).count() == 0)
    // band gate is the integer cross-multiplication it claims to be
    assert(r.filter(col("fluency_band") === "high" &&
      col("sum_ppm") < col("n_bigrams") * 35000L).count() == 0)
    assert(r.filter(col("fluency_band") === "low" &&
      col("sum_ppm") >= col("n_bigrams") * 33500L).count() == 0)
  }

  test("q135 null-propagates when the corpus has no target-language slice") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("no-en-docs").toString
    Seq(
      (1L, "der hund und die katze", "de", "src0", 22L),
      (2L, "el gato que come pescado", "es", "src0", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // with zero 'en' bigrams the target LM is undefined: score and the
    // keep gate must be NULL (DuckDB's empty-aggregate SUM), never
    // values fabricated from an all-zero-count LM
    val r = TextOps.q135DsirScore(spark, dir)
    assert(r.count() == 2)
    assert(r.filter(col("score").isNotNull ||
      col("selected").isNotNull).count() == 0)
    assert(r.filter(col("n_bigrams").isNull).count() == 0)
    spark.catalog.clearCache() // q135 persists occ + scored
  }

  test("q159 calibration: brute band recount off the model's own logits") {
    val logits = TextOps.q109QualityModel(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("logit")).toMap
    val langs = Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getString(1)).toMap
    val banded = logits.toSeq.map { case (id, lg) =>
      val band = (math.max(-4000L, math.min(4000L, lg)) + 4000L) / 500L
      (band, if (langs(id) == "en") 1L else 0L)
    }
    val hist = banded.groupBy(_._1).map { case (b, xs) =>
      b -> (xs.size.toLong, xs.map(_._2).sum)
    }
    val r = TextOps.q159Calibration(spark, sf).collect()
    assert(r.length == hist.size)
    var prev = Option.empty[Long]
    r.foreach { row =>
      val b = row.getAs[Long]("band")
      val (nd, ne) = hist(b)
      val ppm = ne * 1000000L / nd
      assert(row.getAs[Long]("n_docs") == nd, s"band $b")
      assert(row.getAs[Long]("n_en") == ne, s"band $b")
      assert(row.getAs[Long]("en_ppm") == ppm, s"band $b")
      assert(row.getAs[Long]("gap_ppm") == ppm - prev.getOrElse(ppm))
      assert(row.getAs[Boolean]("mono_ok") == (ppm >= prev.getOrElse(ppm)))
      prev = Some(ppm)
    }
  }

  test("q160 kappa: brute 2x2 recount, and perfect raters score kappa=1") {
    val hp = TextOps.q25TextQuality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("quality_band") == "good")).toMap
    val mp = TextOps.q109QualityModel(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("pass")).toMap
    val a = hp.count { case (id, h) => h && mp(id) }.toLong
    val b = hp.count { case (id, h) => h && !mp(id) }.toLong
    val c = hp.count { case (id, h) => !h && mp(id) }.toLong
    val dd = hp.count { case (id, h) => !h && !mp(id) }.toLong
    val n = a + b + c + dd
    val ee = BigInt(a + b) * BigInt(a + c) + BigInt(c + dd) * BigInt(b + dd)
    val num = BigInt(n) * BigInt(a + dd) - ee
    val den = BigInt(n) * BigInt(n) - ee
    val kappa = (num.signum) * (num.abs * 1000000 / den)
    val row = TextOps.q160RaterAgreement(spark, sf).collect().head
    assert(row.getAs[Long]("n_both") == a)
    assert(row.getAs[Long]("n_heur_only") == b)
    assert(row.getAs[Long]("n_model_only") == c)
    assert(row.getAs[Long]("n_neither") == dd)
    assert(row.getAs[Long]("po_ppm") == (a + dd) * 1000000L / n)
    assert(BigInt(row.getAs[Long]("pe_ppm")) == ee * 1000000 / (BigInt(n) * n))
    assert(BigInt(row.getAs[Long]("kappa_ppm")) == kappa)
    // self-agreement sanity: the same gate twice is kappa = 1 exactly —
    // po = 1 and the formula must not degenerate (den > 0 as long as
    // both marginals are mixed)
    assert(den > 0)
  }

  test("q161 AUC: brute Mann-Whitney recount; all-one-class source is null-banded") {
    val logits = TextOps.q109QualityModel(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("logit")).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "lang")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getString(1),
        r.getString(2)))
    val bySrc = docs.groupBy(_._2)
    val r = TextOps.q161SourceAuc(spark, sf).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r.size == bySrc.size)
    bySrc.foreach { case (src, xs) =>
      val lv = xs.map { case (id, _, lang) =>
        (math.max(-4000L, math.min(4000L, logits(id))), lang == "en") }
      val pos = lv.filter(_._2).map(_._1)
      val neg = lv.filterNot(_._2).map(_._1)
      val row = r(src)
      assert(row.getAs[Long]("n_pos") == pos.length.toLong, src)
      assert(row.getAs[Long]("n_neg") == neg.length.toLong, src)
      if (pos.nonEmpty && neg.nonEmpty) {
        // u2 = 2*U with half-credit ties, brute over all pos×neg pairs
        val u2 = (for (p <- pos; q <- neg) yield
          if (p > q) 2L else if (p == q) 1L else 0L).sum
        val expect = BigInt(u2) * 1000000 /
          (2 * BigInt(pos.length) * neg.length)
        assert(BigInt(row.getAs[Long]("auc_ppm")) == expect, src)
      } else {
        assert(row.isNullAt(row.fieldIndex("auc_ppm")), src)
        assert(row.getAs[String]("rank_band") == "one_class", src)
      }
    }
  }

  test("q161 one_class: a source with a single label gets no AUC") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("auc-one-class").toString
    Seq(
      (1L, "the cat sat", "en", "pure", 11L),
      (2L, "the dog ran", "en", "pure", 11L),
      (3L, "the fox hid", "en", "mixed", 11L),
      (4L, "der hund und", "de", "mixed", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = ops.TextOps.q161SourceAuc(spark, dir).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r("pure").isNullAt(r("pure").fieldIndex("auc_ppm")))
    assert(r("pure").getAs[String]("rank_band") == "one_class")
    assert(!r("mixed").isNullAt(r("mixed").fieldIndex("auc_ppm")))
    spark.catalog.clearCache() // attr stages pin per dataset dir
  }

  test("q175 char classes: brute recount of masses and screens per source") {
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map { r =>
        val t = r.getString(1)
        val total = t.length.toLong
        val alpha = t.count(c => (c >= 'A' && c <= 'Z')
          || (c >= 'a' && c <= 'z')).toLong
        val digit = t.count(c => c >= '0' && c <= '9').toLong
        val space = t.count(" \t\n\r\f".contains(_)).toLong
        val symbol = total - alpha - digit - space
        val screen = if (total == 0) "empty"
          else if (symbol * 100 >= total * 8) "code"
          else if (digit * 100 >= total * 30) "tabular" else "prose"
        (r.getString(0), screen, total, alpha, digit, symbol)
      }
    val cells = docs.groupBy(x => (x._1, x._2))
    val rows = ops.TextOps.q175CharClassProfile(spark, sf).collect()
    assert(rows.length == cells.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[String]("screen"))
      val cell = cells(k)
      val mass = cell.map(_._3).sum
      assert(r.getAs[Long]("n_docs") == cell.length.toLong, s"$k")
      assert(r.getAs[Long]("char_mass") == mass, s"$k")
      def ppm(n: Long) =
        if (mass == 0) null else (BigInt(n) * 1000000 / mass).toLong
      assert(Option(r.getAs[Any]("alpha_ppm")).map(_ == ppm(cell.map(_._4).sum))
        .getOrElse(mass == 0L), s"$k")
      assert(Option(r.getAs[Any]("digit_ppm")).map(_ == ppm(cell.map(_._5).sum))
        .getOrElse(mass == 0L), s"$k")
      assert(Option(r.getAs[Any]("symbol_ppm")).map(_ == ppm(cell.map(_._6).sum))
        .getOrElse(mass == 0L), s"$k")
    }
  }

  test("q175 screens planted code, tabular, prose, and empty docs apart") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("charclass").toString
    Seq(
      (1L, "def f(x): return {x: [1, 2]} if x else (0,)", "en", "s", 43L),
      (2L, "1999 2024 7031 8842 0001 5 55 915 23 4", "en", "s", 38L),
      (3L, "plain readable prose with ordinary words only", "en", "s", 45L),
      (4L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val m = ops.TextOps.q175CharClassProfile(spark, dir).collect()
      .map(r => r.getAs[String]("screen") -> r.getAs[Long]("n_docs")).toMap
    assert(m == Map("code" -> 1L, "tabular" -> 1L, "prose" -> 1L,
      "empty" -> 1L))
  }

  test("q177 vocab exclusivity: brute recount of per-source unique types") {
    val toks = Tables.documents(spark, sf).select("source", "text").collect()
      .flatMap(r => r.getString(1).trim.toLowerCase
        .split("[ \t\n\r\f]+").filter(_.nonEmpty).map((r.getString(0), _)))
    val st = toks.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val tokSrcs = st.keys.toSeq.groupBy(_._2).map { case (t, xs) => t -> xs.size }
    val bySrc = st.toSeq.groupBy(_._1._1)
    val rows = ops.TextOps.q177VocabExclusivity(spark, sf).collect()
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val cell = bySrc(src)
      val excl = cell.filter { case ((_, t), _) => tokSrcs(t) == 1 }
      assert(r.getAs[Long]("n_types") == cell.length.toLong, src)
      assert(r.getAs[Long]("token_mass") == cell.map(_._2).sum, src)
      assert(r.getAs[Long]("n_excl_types") == excl.length.toLong, src)
      assert(r.getAs[Long]("excl_mass") == excl.map(_._2).sum, src)
      assert(r.getAs[Long]("excl_type_ppm") ==
        (BigInt(excl.length) * 1000000 / cell.length).toLong, src)
      assert(r.getAs[Long]("excl_mass_ppm") ==
        (BigInt(excl.map(_._2).sum) * 1000000 / cell.map(_._2).sum).toLong,
        src)
    }
  }

  test("q178 stopword drift: brute recount; zero-stopword source is no_signal") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stylometry").toString
    Seq(
      // corpus-typical register
      (1L, "the cat sat in the hat and the dog is in it", "en", "base", 44L),
      (2L, "a fish of a kind is in a pond and it is fine", "en", "base", 45L),
      // drifted register: only 'a'
      (3L, "a a a a a a a a", "en", "astream", 15L),
      // no stopwords at all
      (4L, "purely content words everywhere here", "en", "nostop", 37L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    val toks = Seq(
      ("base", "the cat sat in the hat and the dog is in it"),
      ("base", "a fish of a kind is in a pond and it is fine"),
      ("astream", "a a a a a a a a"))
      .flatMap { case (s0, t) => t.split(" ").filter(stops.contains)
        .map((s0, _)) }
    val corp = toks.groupBy(_._2).map { case (t, v) => t -> v.size.toLong }
    val corpMass = toks.size.toLong
    val r = ops.TextOps.q178StopwordDrift(spark, dir).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r.keySet == Set("base", "astream", "nostop"))
    assert(r("nostop").getAs[String]("band") == "no_signal")
    assert(r("nostop").getAs[Long]("stop_mass") == 0L)
    assert(r("nostop").isNullAt(r("nostop").fieldIndex("l1_dev_ppm")))
    // brute L1 for each signal source
    for (src <- Seq("base", "astream")) {
      val mine = toks.filter(_._1 == src)
      val m = mine.groupBy(_._2).map { case (t, v) => t -> v.size.toLong }
      val mass = mine.size.toLong
      val l1 = stops.map { w =>
        val ps = BigInt(m.getOrElse(w, 0L)) * 1000000 / mass
        val pc = BigInt(corp.getOrElse(w, 0L)) * 1000000 / corpMass
        (ps - pc).abs.toLong
      }.sum
      assert(r(src).getAs[Long]("l1_dev_ppm") == l1, src)
      assert(r(src).getAs[Long]("stop_mass") == mass, src)
    }
    // the all-'a' stream is maximally drifted, the base register is not
    assert(r("astream").getAs[String]("band") == "drifted")
    assert(r("astream").getAs[String]("max_dev_token") == "a")
    spark.catalog.clearCache()
  }

  test("q184 readability: brute recount of words, sentence runs, vowel runs") {
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .flatMap { r =>
        val t = r.getString(1)
        val words = t.trim.toLowerCase.split("[ \t\n\r\f]+")
          .count(_.nonEmpty).toLong
        if (words == 0) None
        else {
          val sents = math.max(1L,
            "[.!?]+".r.findAllIn(t).length.toLong)
          val syll = "[aeiouy]+".r.findAllIn(t.toLowerCase).length.toLong
          Some((r.getString(0), words, sents, syll))
        }
      }
    val bySrc = docs.groupBy(_._1)
    val rows = ops.TextOps.q184Readability(spark, sf).collect()
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val cell = bySrc(src)
      val (w, s0, y) = (cell.map(_._2).sum, cell.map(_._3).sum,
        cell.map(_._4).sum)
      assert(r.getAs[Long]("n_docs") == cell.length.toLong, src)
      assert(r.getAs[Long]("word_mass") == w, src)
      assert(r.getAs[Long]("sent_mass") == s0, src)
      assert(r.getAs[Long]("syll_mass") == y, src)
      val wps = (BigInt(w) * 1000 / s0).toLong
      val spw = (BigInt(y) * 1000 / w).toLong
      assert(r.getAs[Long]("wps_milli") == wps, src)
      assert(r.getAs[Long]("spw_milli") == spw, src)
      val band = if (spw <= 1300 && wps <= 15000) "easy"
        else if (spw >= 1700 || wps >= 25000) "difficult" else "standard"
      assert(r.getAs[String]("band") == band, src)
    }
  }

  test("q184 separates planted legalese from plain prose") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("readability").toString
    Seq(
      (1L, "The cat sat. The dog ran. A kid had fun. It was a big day.",
        "en", "plain", 58L),
      (2L, "Notwithstanding heretofore enumerated considerations " +
        "regarding aforementioned contractual obligations necessitating " +
        "comprehensive documentation deliverables incorporating " +
        "supplementary administrative prerequisites", "en", "legal", 200L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val m = ops.TextOps.q184Readability(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[String]("band")).toMap
    assert(m("plain") == "easy", m.toString)
    assert(m("legal") == "difficult", m.toString)
  }

  test("q169 frequency spectrum: brute recount of decades, mass, and hapax") {
    val counts = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("[ \t\n\r\f]+"))
      .filter(_.nonEmpty)
      .groupBy(identity).map { case (_, v) => v.length.toLong }.toSeq
    val bands = counts.groupBy(c => c.toString.length - 1)
    val total = counts.sum
    val vocab = counts.length.toLong
    val hapax = counts.count(_ == 1L).toLong
    val rows = ops.TextOps.q169FreqSpectrum(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("band")).toSeq == bands.keys.toSeq.sorted)
    var cum = 0L
    rows.foreach { r =>
      val b = r.getAs[Int]("band")
      val cs = bands(b)
      cum += cs.sum
      assert(r.getAs[Long]("band_lo") == math.pow(10, b).toLong, s"band $b")
      assert(r.getAs[Long]("n_types") == cs.length.toLong, s"band $b")
      assert(r.getAs[Long]("token_mass") == cs.sum, s"band $b")
      def ppm(n: BigInt, d: Long) = (n * 1000000 / d).toLong
      assert(r.getAs[Long]("mass_ppm") == ppm(cs.sum, total), s"band $b")
      assert(r.getAs[Long]("cum_mass_ppm") == ppm(cum, total), s"band $b")
      assert(r.getAs[Long]("types_ppm") == ppm(cs.length, vocab), s"band $b")
      assert(r.getAs[Long]("gt_unseen_ppm") == ppm(hapax, total), s"band $b")
    }
    assert(cum == total) // decades partition the whole token mass
  }

  test("q229 fertility ratios are exact on planted languages") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fert").toString
    // en: 2 tokens / 9 chars -> 4500 milli (fine_grained boundary);
    // xx: 1 token / 8 chars -> 8000 milli (verbose boundary)
    Seq((1L, "abcd efgh", "en", "s", 9L), (2L, "abcd efgh", "en", "s", 9L),
        (3L, "abcdefgh", "xx", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = ops.TextOps.q229TokenFertility(spark, dir).collect()
      .map(x => x.getAs[String]("lang") -> x).toMap
    assert(r("en").getAs[Long]("n_docs") == 2L)
    assert(r("en").getAs[Long]("n_tokens") == 4L)
    assert(r("en").getAs[Long]("chars_per_token_milli") == 4500L)
    assert(r("en").getAs[String]("fertility_band") == "fine_grained")
    assert(r("xx").getAs[Long]("chars_per_token_milli") == 8000L)
    assert(r("xx").getAs[String]("fertility_band") == "verbose_tokens")
    assert(r("en").getAs[Long]("tokens_per_doc") == 2L)
  }

  test("q239 precision/recall/F1 are exact on a planted confusion") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("langf1").toString
    // 3 labeled-en docs with English function words (pred en: tp_en = 3);
    // 1 labeled-de doc with English words (pred en: fp_en, fn_de);
    // 1 labeled-de doc with German words (tp_de)
    val rows = Seq(
      (1L, "the is and", "en"), (2L, "the is and", "en"),
      (3L, "the is and", "en"), (4L, "the is and", "de"),
      (5L, "der und die", "de"))
      .map { case (i, t, l) => (i, t, l, "s", t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = ops.TextOps.q239LangidMetrics(spark, dir).collect()
      .map(x => x.getAs[String]("class") -> x).toMap
    assert(r("en").getAs[Long]("tp") == 3L)
    assert(r("en").getAs[Long]("fp") == 1L)
    assert(r("en").getAs[Long]("fn") == 0L)
    assert(r("en").getAs[Long]("precision_ppm") == 750000L)
    assert(r("en").getAs[Long]("recall_ppm") == 1000000L)
    // F1(en) = 2·3/(2·3+1+0) = 6/7
    assert(r("en").getAs[Long]("f1_ppm") == 6000000L / 7L)
    assert(r("de").getAs[Long]("tp") == 1L)
    assert(r("de").getAs[Long]("fn") == 1L)
    assert(r("de").getAs[Long]("recall_ppm") == 500000L)
    spark.catalog.clearCache()
  }

  test("q240 joint ledger conserves the corpus and agrees with q133 keeps") {
    val r = ops.TextOps.q240VerdictJoint(spark, sf).collect()
    assert(r.length <= 8)
    val docs = Tables.documents(spark, sf).count()
    assert(r.map(_.getAs[Long]("n_docs")).sum == docs)
    assert(r.map(_.getAs[Long]("doc_share_ppm")).sum <= 1000000L)
    val keptDocs = r.filter(_.getAs[Boolean]("kept"))
      .map(_.getAs[Long]("n_docs")).sum
    val q133Keeps = ops.TextOps.q133FilterEnsemble(spark, sf)
      .filter(org.apache.spark.sql.functions.col("verdict") === "keep")
      .count()
    assert(keptDocs == q133Keeps,
      s"joint-ledger keeps $keptDocs vs q133 $q133Keeps")
    spark.catalog.clearCache()
  }

  test("q241 prefix-sharing ledger is exact on planted templates") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prefix").toString
    val shared16 = (1 to 16).map(i => s"p$i").mkString(" ")
    val rows = Seq(
      (1L, shared16 + " a1 a2 a3 a4", "en", "s"),          // 20 tokens
      (2L, shared16 + " b1 b2", "en", "s"),                // 18 tokens
      (3L, shared16 + " " + (1 to 9).map("c" + _).mkString(" "),
        "en", "s"),                                         // 25 tokens
      (4L, "a b c d", "en", "s"), (5L, "a b c d", "en", "s"), // 4 + 4
      (6L, "u1 u2 u3 u4 u5", "en", "s"))                   // unique, 5
      .map { case (i, t, l, s0) => (i, t, l, s0, t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = ops.TextOps.q241PrefixSharing(spark, dir).collect()
    assert(r.length == 1 && r.head.getAs[String]("band") == "shared_2_9")
    val x = r.head
    assert(x.getAs[Long]("n_groups") == 2L)           // template + short dup
    assert(x.getAs[Long]("n_docs_sharing") == 5L)
    // (3−1)·16 from the template group + (2−1)·4 from the short dup
    assert(x.getAs[Long]("reclaimable_tokens") == 36L)
    // corpus tokens = 20 + 18 + 25 + 4 + 4 + 5 = 76
    assert(x.getAs[Long]("savings_ppm") == 36L * 1000000L / 76L)
    spark.catalog.clearCache()
  }

  test("q242 zipf ledger is exact on a planted geometric corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zipf").toString
    // freqs: a=8, b=4, c=2, d=1 → ranks 1..4
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") ++ Seq("d")).mkString(" ")
    Seq((1L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = ops.TextOps.q242ZipfLedger(spark, dir).collect()
    // ledger ranks present: 1, 2, 4 (8+ beyond vocab)
    assert(r.map(_.getAs[Long]("rnk")).toSeq == Seq(1L, 2L, 4L))
    val byRank = r.map(x => x.getAs[Long]("rnk") -> x).toMap
    assert(byRank(1L).getAs[String]("token") == "a")
    assert(byRank(1L).getAs[Long]("freq") == 8L)
    assert(byRank(1L).getAs[Long]("freq_2r") == 4L)   // rank 2 = b
    assert(byRank(1L).getAs[Long]("decay_ppm") == 500000L)
    assert(byRank(2L).getAs[Long]("freq_2r") == 1L)   // rank 4 = d
    assert(byRank(2L).getAs[Long]("decay_ppm") == 250000L)
    // rank 8 absent → null tail
    assert(byRank(4L).isNullAt(byRank(4L).fieldIndex("freq_2r")))
    assert(byRank(4L).isNullAt(byRank(4L).fieldIndex("decay_ppm")))
    spark.catalog.clearCache()
  }

  test("q244 chao1 and coverage are exact on a planted spectrum") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("chao1").toString
    // lang xx: counts a=1 b=1 c=1 d=2 → V=4, N=5, f1=3, f2=1
    Seq((1L, "a b c d d", "xx", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = ops.TextOps.q244Chao1(spark, dir).collect()
    assert(r.length == 1)
    val x = r.head
    assert(x.getAs[Long]("n_tokens") == 5L)
    assert(x.getAs[Long]("vocab") == 4L)
    assert(x.getAs[Long]("f1") == 3L)
    assert(x.getAs[Long]("f2") == 1L)
    // chao1 = 4 + ⌊3·2 / (2·(1+1))⌋ = 4 + 1
    assert(x.getAs[Long]("chao1") == 5L)
    // coverage = 1e6 − ⌊3e6/5⌋
    assert(x.getAs[Long]("coverage_ppm") == 400000L)
  }

  test("q245 burstiness separates a clumped token from a uniform one") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("burst").toString
    // x: 4 occurrences all in doc 1 → VMR = (3·16−16)/(3·4) → 2666666 ppm
    // y: 1 occurrence in each of 3 docs → VMR = 0
    Seq((1L, "x x x x y", "en", "s", 9L),
        (2L, "y", "en", "s", 1L),
        (3L, "y", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = ops.TextOps.q245Burstiness(spark, dir).collect()
    assert(r.map(_.getAs[String]("token")).toSeq == Seq("x", "y"))
    val x = r.head
    assert(x.getAs[Long]("doc_freq") == 1L)
    assert(x.getAs[Long]("n_occurrences") == 4L)
    assert(x.getAs[Long]("vmr_ppm") == 32L * 1000000L / 12L)
    assert(r(1).getAs[Long]("vmr_ppm") == 0L)
  }

  test("q247 histogram intersection is exact on planted distributions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("srcsim").toString
    // srcA: a=2/3, b=1/3; srcB: a=1/4, b=3/4
    // sim = min(666666, 250000) + min(333333, 750000) = 583333
    Seq((1L, "a a b", "en", "srcA", 5L),
        (2L, "a b b b", "en", "srcB", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = ops.TextOps.q247SourceSimilarity(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("src_a") == "srcA")
    assert(r.head.getAs[String]("src_b") == "srcB")
    assert(r.head.getAs[Long]("n_shared_tokens") == 2L)
    assert(r.head.getAs[Long]("sim_ppm") == 250000L + 333333L)
    spark.catalog.clearCache()
  }

  test("q247 similarity is bounded by 1e6 and symmetric-free on the fixture") {
    val r = ops.TextOps.q247SourceSimilarity(spark, sf).collect()
    assert(r.nonEmpty)
    assert(r.forall(x => x.getAs[Long]("sim_ppm") <= 1000000L))
    // src_a < src_b by construction: no duplicate unordered pairs
    assert(r.forall(x =>
      x.getAs[String]("src_a") < x.getAs[String]("src_b")))
    spark.catalog.clearCache()
  }

  test("q252 window pairs stop at distance 3 and lift matches the staged recount") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("skipgram").toString
    // template 1 "a b c d": window-3 pairs = all 6 ordered pairs;
    // template 2 "x p1 p2 p3 y": (x,y) sits at distance 4 → must NOT pair.
    val rows = (1 to 5).flatMap(i => Seq(
      (i.toLong, "a b c d", "en", "s"),
      (100L + i, "x p1 p2 p3 y", "en", "s")))
      .map { case (i, t, l, s0) => (i, t, l, s0, t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = ops.TextOps.q252SkipgramCooc(spark, dir).collect()
    // 6 pairs from template 1 + 9 from template 2, all with support 5
    assert(r.length == 15)
    val pairs = r.map(x =>
      (x.getAs[String]("a"), x.getAs[String]("b"))).toSet
    assert(!pairs.contains(("x", "y")), "distance-4 pair leaked in")
    assert(pairs.contains(("a", "d")) && pairs.contains(("x", "p3")))
    // staged-floor-div recount for (a, b): B=75 total pairs,
    // c_ab=5, c_left(a)=15, c_right(b)=5
    val ab = r.find(x => x.getAs[String]("a") == "a" &&
      x.getAs[String]("b") == "b").get
    assert(ab.getAs[Long]("c_ab") == 5L)
    assert(ab.getAs[Long]("c_left") == 15L)
    assert(ab.getAs[Long]("c_right") == 5L)
    assert(ab.getAs[Long]("lift_ppm") == (5L * 1000000L / 15L) * 75L / 5L)
    spark.catalog.clearCache()
  }

  test("q253 bands planted docs by hapax mass with zero-token docs in 'empty'") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hapax").toString
    val w20 = Seq.fill(20)("w").mkString(" ")
    val w199 = Seq.fill(199)("w").mkString(" ")
    val rows = Seq(
      (1L, "u1 u2 u3 u4", "en", "t"),   // 4/4 hapax → extreme
      (2L, "w w w w", "en", "s"),       // 0 hapax → none
      (3L, "w h1", "en", "s"),          // 1/2 → 500000 → extreme
      (4L, "", "en", "s"),              // no tokens → empty
      (5L, s"x1 $w20", "en", "s"),      // 1/21 → 47619 → mid
      (6L, s"y1 $w199", "en", "s"))     // 1/200 → 5000 → low
      .map { case (i, t, l, s0) => (i, t, l, s0, t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = ops.TextOps.q253RareTokenMass(spark, dir).collect()
      .map(x => (x.getAs[String]("source"), x.getAs[String]("band")) -> x)
      .toMap
    assert(r.keySet == Set(("t", "extreme"), ("s", "none"),
      ("s", "extreme"), ("s", "empty"), ("s", "mid"), ("s", "low")))
    assert(r(("t", "extreme")).getAs[Long]("n_hapax") == 4L)
    assert(r(("s", "extreme")).getAs[Long]("n_docs") == 1L)
    assert(r(("s", "empty")).getAs[Long]("n_tokens") == 0L)
    assert(r(("s", "low")).getAs[Long]("n_tokens") == 200L)
    assert(r(("s", "none")).getAs[Long]("n_hapax") == 0L)
    // conservation: banded doc counts cover the corpus exactly once
    assert(r.values.map(_.getAs[Long]("n_docs")).sum == 6L)
  }

  test("q265 length-bias r2 matches a BigInt recount off the model attributes") {
    val r = ops.TextOps.q265LengthBias(spark, sf).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    // recount from the same pinned attribute table + documents
    val m = ops.TextOps.attrModel(spark, sf)
      .select("doc_id", "logit").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "n_chars").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    docs.groupBy(_._2).foreach { case (src, rows) =>
      val xs = rows.map(t => BigInt(m(t._1)))
      val ys = rows.map(t => BigInt(t._3))
      val n = BigInt(rows.length)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val num = n * sxy - sx * sy
      val vx = n * xs.map(x => x * x).sum - sx * sx
      val vy = n * ys.map(y => y * y).sum - sy * sy
      val x = r(src)
      if (vx <= 0 || vy <= 0) assert(x.getAs[String]("band") == "degenerate")
      else {
        val exp = (num.abs * 1000000 / vx * num.abs / vy).toLong
        assert(x.getAs[Long]("r2_ppm") == exp, src)
        assert(x.getAs[Long]("r2_ppm") <= 1000000L, src)
        val dir0 = if (num > 0) "longer_scores_higher"
          else if (num < 0) "longer_scores_lower" else "uncorrelated"
        assert(x.getAs[String]("direction") == dir0, src)
      }
    }
    spark.catalog.clearCache()
  }

  test("q268 novelty: first decile is all-novel and a planted curve recounts") {
    // the earliest non-empty decile can only contain first-seen bigrams
    val r = TextOps.q268NgramNovelty(spark, sf).collect()
    assert(r.nonEmpty)
    assert(r.head.getAs[Long]("novel_occ_ppm") == 1000000L)
    assert(r.head.getAs[Long]("new_unique_ppm") == 1000000L)
    r.foreach { x =>
      assert(x.getAs[Long]("novel_occ") <= x.getAs[Long]("n_occ"))
      assert(x.getAs[Long]("new_unique") <= x.getAs[Long]("n_unique"))
    }
    spark.catalog.clearCache()
    // planted: doc 1 (decile 0) "a b a b" → bigrams ab, ba, ab;
    // doc 2 (decile 5) "a b c" → ab (seen), bc (novel) → 50% novelty
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("novelty").toString
    Seq((1L, "a b a b", "en", "s", 7L), (2L, "a b c", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val p = TextOps.q268NgramNovelty(spark, dir).collect()
      .map(x => x.getAs[Long]("decile") ->
        (x.getAs[Long]("n_occ"), x.getAs[Long]("n_unique"),
          x.getAs[Long]("novel_occ_ppm"), x.getAs[Long]("new_unique_ppm")))
      .toMap
    assert(p == Map(
      0L -> ((3L, 2L, 1000000L, 1000000L)),
      5L -> ((2L, 2L, 500000L, 500000L))), p.toString)
    spark.catalog.clearCache()
  }
}
