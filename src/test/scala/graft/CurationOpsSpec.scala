package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import ops.CurationOps

class CurationOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q70: planted PII is fully counted and fully scrubbed") {
    val r = CurationOps.q70PiiRedaction(spark, sf)
    // every doc gets exactly one planted phone + ip; a second email on
    // doc_id % 3 == 0
    assert(r.filter(col("n_phone") =!= 1 || col("n_ip") =!= 1).count() == 0)
    assert(r.filter(col("n_email") =!=
      when(col("doc_id") % 3 === 0, 2).otherwise(1)).count() == 0)
    assert(r.count() == Tables.documents(spark, sf).count())
  }

  test("q71: contamination flags only non-eval docs with bounded eval hits") {
    val r = CurationOps.q71Contamination(spark, sf).collect()
    val evalIds = Tables.documents(spark, sf)
      .filter(col("source") === "src9").count()
    r.foreach { row =>
      assert(row.getAs[Long]("n_shared_grams") >= 1)
      val hits = row.getAs[Long]("n_eval_docs")
      assert(hits >= 1 && hits <= evalIds)
    }
  }

  test("q72: dup segments bounded by total; clean docs keep their text") {
    val r = CurationOps.q72SegmentDedup(spark, sf)
    assert(r.filter(col("n_dup_segs") > col("n_segs")).count() == 0)
    // independently rebuild the expected clean_md5 for docs with no
    // boilerplate: it is just the first n_segs*10 tokens re-joined
    val docs = Tables.documents(spark, sf)
      .withColumn("t", split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"))
      .withColumn("nseg", (size(col("t")) / 10).cast("int"))
      .filter(col("nseg") >= 1)
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(col("t"), lit(1), col("nseg") * 10)))
          .as("expect_md5"))
    val mismatches = r.filter(col("n_dup_segs") === 0)
      .join(docs, "doc_id")
      .filter(col("clean_md5") =!= col("expect_md5"))
    assert(mismatches.count() == 0)
  }

  test("q73: exactly min(3, distinct terms) ranks per doc, score consistent") {
    val r = CurationOps.q73Tfidf(spark, sf)
    assert(r.filter(col("rk") < 1 || col("rk") > 3).count() == 0)
    assert(r.filter(
      abs(col("score") - col("tf").cast("double") / col("df")) > 0).count() == 0)
    // rank sequences are dense per doc: a doc with k rows has ranks 1..k
    val perDoc = r.groupBy("doc_id")
      .agg(count(lit(1)).as("k"), max("rk").as("maxrk"))
    assert(perDoc.filter(col("k") =!= col("maxrk")).count() == 0)
  }

  test("q74: bucketed two-level prefix sum equals the naive global window") {
    val r = CurationOps.q74SeqPacking(spark, sf)
    // independent naive plan: one unpartitioned window (fine at test SF)
    val naive = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"),
          x => x =!= "")).cast("long").as("n_tok"))
      .withColumn("start", coalesce(sum(col("n_tok")).over(
        Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("chunk_id", expr("start div 512"))
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"),
        sum(when(expr("start div 512") =!=
          expr("(start + n_tok - 1) div 512"), 1L).otherwise(0L))
          .as("n_boundary_docs"))
    assert(r.exceptAll(naive).count() == 0 && naive.exceptAll(r).count() == 0)
    // token conservation: chunks partition the concatenated corpus
    val total = r.agg(sum("n_tokens")).head().getLong(0)
    val expect = naive.agg(sum("n_tokens")).head().getLong(0)
    assert(total == expect)
  }

  test("assignChunks three-level prefix sum is exact across super-buckets") {
    import spark.implicits._
    // width=4 forces ~25 level-1 buckets and ~7 level-2 super-buckets on
    // 100 docs, so every level of the cumsum (intra-bucket, bucket-in-
    // super-bucket, super-bucket-global) carries real offsets — at the
    // production width the test corpus fits one bucket and the upper
    // levels would be degenerate. Sparse doc_ids included.
    val docs = (0L until 100L).filter(i => i % 7 != 3)
      .map(i => (i, 1L + (i * 31 % 23))).toDF("doc_id", "n_tok")
    val got = CurationOps.assignChunks(docs, chunkTok = 16, width = 4)
      .select("doc_id", "start").as[(Long, Long)].collect().toMap
    val rows = docs.as[(Long, Long)].collect().sortBy(_._1)
    val expect = rows.map(_._1)
      .zip(rows.map(_._2).scanLeft(0L)(_ + _)).toMap
    assert(got == expect)
  }

  test("q75: every source downsamples to its integer target, never above") {
    val r = CurationOps.q75SourceMixing(spark, sf).collect()
    assert(r.length == 10)
    r.foreach { row =>
      assert(row.getAs[Long]("n_kept") == row.getAs[Long]("n_target"))
      assert(row.getAs[Long]("n_target") <= row.getAs[Long]("n_orig"))
    }
  }

  test("q83: spans tile every chunk exactly and reassemble every doc") {
    val spans = CurationOps.q83PackSpans(spark, sf)
    // every chunk except the last carries exactly 512 span tokens
    val perChunk = spans.groupBy("chunk_id")
      .agg(sum("span_len").as("tok")).collect()
    val lastChunk = perChunk.map(_.getAs[Long]("chunk_id")).max
    perChunk.filter(_.getAs[Long]("chunk_id") != lastChunk).foreach { r =>
      assert(r.getAs[Long]("tok") == 512L,
        s"chunk ${r.getAs[Long]("chunk_id")} carries ${r.getAs[Long]("tok")}")
    }
    // per doc, spans are contiguous from offset 0 and sum to its tokens
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"),
          x => x =!= "")).cast("long").as("n_tok"))
    val rebuilt = spans.groupBy("doc_id")
      .agg(sum("span_len").as("tok"), min("doc_offset").as("off0"))
    val bad = rebuilt.join(docs, "doc_id")
      .filter(col("tok") =!= col("n_tok") || col("off0") =!= 0L)
    assert(bad.count() == 0)
  }

  test("q86: every source emits exactly its target; scarce sources upsample") {
    val r = CurationOps.q86UpsampleMix(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_emitted") == row.getAs[Long]("n_target"),
        s"${row.getAs[String]("source")} missed its target")
    }
    // with epochFactor=2 the mean source doubles; at least one source
    // must repeat docs (max_copies > 1) — the upsample path is exercised
    assert(r.exists(_.getAs[Long]("max_copies") > 1L))
  }

  test("q93: every full sliding window carries exactly W span tokens; coverage is W/S-fold") {
    val spans = CurationOps.q93SlidingSpans(spark, sf)
    val perWin = spans.groupBy(col("window_id"))
      .agg(sum(col("span_len")).as("tok")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val lastW = perWin.keys.max
    // windows fully inside the token stream carry exactly 512 tokens
    // (the last ~W/S windows taper); stride-256 overlap means total
    // span tokens ≈ 2× corpus tokens
    perWin.filter(_._1 < lastW - 1).values
      .foreach(t => assert(t == 512L, s"full window carried $t tokens"))
    val totalTok = Tables.documents(spark, sf)
      .select(size(filter(split(trim(lower(col("text"))),
        "[ \\t\\n\\r\\f]+"), x => x =!= "")).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    val totalSpan = perWin.values.sum
    // every token is in 2 windows except the first/last stride's worth
    assert(totalSpan >= 2 * totalTok - 2 * 512 && totalSpan <= 2 * totalTok,
      s"coverage $totalSpan vs 2×$totalTok")
  }

  test("q101: membership matches an independent md5-route recount") {
    // The query gates on the Hash60 codegen expression; rebuild the same
    // gate from Spark's md5/conv built-ins (the h60 = first-60-md5-bits
    // contract) and require per-source kept counts + id checksums agree.
    val r = CurationOps.q101WeightedSample(spark, sf)
    val expect = Tables.documents(spark, sf)
      .withColumn("w", least(col("n_chars"), lit(512L)))
      .withColumn("keep",
        conv(substring(md5(concat(lit("iw:"), col("doc_id").cast("string"))),
          1, 15), 16, 10).cast("long") % 512 < col("w"))
      .groupBy(col("source"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("e_kept"),
        sum(when(col("keep"), col("doc_id")).otherwise(0L)).as("e_id_sum"))
    val bad = r.join(expect, "source")
      .filter(col("n_kept") =!= col("e_kept") ||
        col("kept_id_sum") =!= col("e_id_sum"))
    assert(bad.count() == 0)
    // intake accounting: kept never exceeds corpus, weights bounded
    assert(r.filter(col("n_kept") > col("n_docs")).count() == 0)
    assert(r.filter(col("kept_w") > col("n_kept") * 512).count() == 0)
  }

  test("q107: spans are maximal, in-bounds, and cover exact-dup docs fully") {
    val r = CurationOps.q107DupSpans(spark, sf)
    // every span covers at least one whole 8-gram and is internally sane
    assert(r.filter(col("span_len") < 8).count() == 0)
    assert(r.filter(col("span_end") =!=
      col("span_start") + col("span_len") - 1).count() == 0)
    // maximality: consecutive spans in a doc can never touch — adjacent
    // or overlapping gram coverage would have merged into one island
    val w = Window.partitionBy(col("doc_id")).orderBy(col("span_start"))
    val prevEnd = lag(col("span_end"), 1).over(w)
    assert(r.withColumn("pe", prevEnd)
      .filter(col("pe").isNotNull && col("span_start") <= col("pe") + 1)
      .count() == 0)
    // bounds: spans live inside the doc's token range
    val docs = Tables.documents(spark, sf)
      .withColumn("n_tok",
        size(split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+")).cast("long"))
      .select(col("doc_id"), col("n_tok"))
    assert(r.join(docs, "doc_id")
      .filter(col("span_start") < 1 || col("span_end") > col("n_tok"))
      .count() == 0)
    // a doc whose FULL TEXT occurs >=2 times in the corpus is one
    // wall-to-wall span: every gram in it is duplicated by its twin
    val dupDocs = Tables.documents(spark, sf)
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"), collect_list(col("doc_id")).as("ids"))
      .filter(col("n") >= 2)
      .select(explode(col("ids")).as("doc_id"))
      .join(docs, "doc_id").filter(col("n_tok") >= 8)
    val full = r.join(dupDocs, "doc_id")
      .groupBy(col("doc_id"), col("n_tok"))
      .agg(count(lit(1)).as("n_spans"),
        min(col("span_start")).as("s"), max(col("span_end")).as("e"))
    assert(full.count() == dupDocs.count())
    assert(full.filter(col("n_spans") =!= 1 || col("s") =!= 1 ||
      col("e") =!= col("n_tok")).count() == 0)
  }

  test("q113: epochs repartition the same corpus; permutations differ") {
    val r = CurationOps.q113EpochShuffle(spark, sf).collect()
    val docs = Tables.documents(spark, sf).count()
    val byEpoch = r.groupBy(_.getAs[Long]("epoch"))
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    // every epoch shards the FULL corpus with identical token mass
    val totals = byEpoch.view.mapValues(rows =>
      (rows.map(_.getAs[Long]("n_docs")).sum,
        rows.map(_.getAs[Long]("tok_sum")).sum)).toMap
    assert(totals.values.forall(_._1 == docs), totals.toString)
    assert(totals.values.map(_._2).toSet.size == 1, totals.toString)
    // the reshuffle is real: epoch orderings produce different
    // position-weighted signatures (identical permutations could only
    // yield identical signature vectors)
    val sigs = byEpoch.view.mapValues(rows =>
      rows.sortBy(_.getAs[Long]("shard"))
        .map(_.getAs[Long]("perm_sig")).toSeq).toMap
    assert(sigs(0L) != sigs(1L) && sigs(1L) != sigs(2L))
    // re-run is byte-stable (resume contract)
    val again = CurationOps.q113EpochShuffle(spark, sf).collect()
    assert(r.sameElements(again))
  }

  test("q139: stages partition the corpus; per-(stage,shard) positions are dense") {
    val r = CurationOps.q139Curriculum(spark, sf)
    val docs = Tables.documents(spark, sf).count()
    assert(r.count() == docs)
    // every stage occurs (thresholds discriminate on this corpus)
    assert(r.select("stage").distinct().count() == 4)
    // positions within each (stage, shard) are exactly 1..n — dense,
    // no gaps, no duplicates (the seekable-order contract)
    val slots = r.groupBy(col("stage"), col("shard"))
      .agg(count(lit(1)).as("n"), min(col("pos")).as("lo"),
        max(col("pos")).as("hi"),
        countDistinct(col("pos")).as("nd"))
    assert(slots.filter(col("lo") =!= 1 || col("hi") =!= col("n") ||
      col("nd") =!= col("n")).count() == 0)
    // stage is a pure function of difficulty
    assert(r.filter(
      (col("difficulty") < 4400 && col("stage") =!= 1) ||
      (col("difficulty") >= 4400 && col("difficulty") < 4510 &&
        col("stage") =!= 2) ||
      (col("difficulty") >= 4620 && col("stage") =!= 4)).count() == 0)
  }

  test("q140: quotas spend the budget exactly; isqrt weights are exact") {
    val r = CurationOps.q140TemperatureMix(spark, sf)
    val rows = r.collect()
    // largest-remainder allocation sums to the budget, exactly
    assert(rows.map(_.getAs[Long]("quota")).sum == 1000L)
    // w is the true integer sqrt of the token count
    rows.foreach { row =>
      val (n, w) = (row.getAs[Long]("n_tok"), row.getAs[Long]("w"))
      assert(w * w <= n && (w + 1) * (w + 1) > n, s"isqrt broken: n=$n w=$w")
    }
    // temperature flattens: quota spread is strictly narrower than the
    // raw token-mass spread (the point of T = 2 sampling)
    val toks = rows.map(_.getAs[Long]("n_tok")).map(_.toDouble)
    val quotas = rows.map(_.getAs[Long]("quota")).map(_.toDouble)
    assert(toks.max / toks.min > quotas.max / quotas.min)
  }

  test("q114: novelty attribution is exhaustive; near-dup copies lose score") {
    val r = CurationOps.q114Novelty(spark, sf)
    // ratio consistency and bounds
    assert(r.filter(col("n_first") < 0 || col("n_first") > col("n_grams"))
      .count() == 0)
    assert(r.filter(col("novelty") =!=
      col("n_first").cast("double") / col("n_grams")).count() == 0)
    // the first doc (min doc_id with >= 8 tokens) owns everything it says
    val firstId = r.agg(min(col("doc_id"))).head().getLong(0)
    assert(r.filter(col("doc_id") === firstId)
      .head().getAs[Double]("novelty") == 1.0)
    // attribution is exhaustive: total owned grams = total distinct grams
    val totalFirst = r.agg(sum(col("n_first"))).head().getLong(0)
    val distinctGrams = Tables.documents(spark, sf)
      .withColumn("t", split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"))
      .filter(size(col("t")) >= 8)
      .select(explode(expr("array_distinct(transform(" +
        "sequence(1, size(t) - 7), i -> concat_ws(' ', slice(t, i, 8))))"))
        .as("gs"))
      .distinct().count()
    assert(totalFirst == distinctGrams, s"$totalFirst vs $distinctGrams")
    // the corpus plants NEAR-dups (small edits), never byte-identical
    // copies — the later member of every verified near-dup pair shares
    // 8-gram runs with its earlier twin, so its novelty must drop below 1
    val laterNearDups = ops.DedupOps.q31MinhashPairs(spark, sf)
      .select(col("id2").as("doc_id")).distinct()
    assert(laterNearDups.count() > 0) // planted pairs exist at every SF
    assert(r.join(laterNearDups, "doc_id")
      .filter(col("novelty") >= 1.0).count() == 0)
    spark.catalog.clearCache() // q31 persists its feature table
  }

  test("q145: chunk lattice covers every token; stride/overlap invariants hold") {
    val r = CurationOps.q145DocChunks(spark, sf).persist()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(trim(col("text")), "[ \\t\\n\\r\\f]+")).cast("long").as("n"))
    assert(r.select("doc_id").distinct().count() == docs.count())
    assert(r.filter(col("start_tok") =!= col("chunk_idx") * 24).count() == 0)
    assert(r.filter(col("n_toks") < 1 || col("n_toks") > 32).count() == 0)
    // the last chunk ends exactly at the doc's token count and every
    // start lies inside the doc
    val ends = r.groupBy("doc_id").agg(
      max(col("start_tok") + col("n_toks")).as("end"),
      max("start_tok").as("last_start"))
    assert(ends.join(docs, "doc_id")
      .filter(col("end") =!= col("n") || col("last_start") > col("n") - 1)
      .count() == 0)
    // consecutive chunks overlap by width - stride = 8 tokens: a full
    // chunk's 8-token suffix is its successor's 8-token prefix
    val w = Window.partitionBy("doc_id").orderBy("chunk_idx")
    val bad = r.withColumn("next_text", lead(col("chunk_text"), 1).over(w))
      .filter(col("n_toks") === 32 && col("next_text").isNotNull)
      .withColumn("suffix",
        concat_ws(" ", slice(split(col("chunk_text"), " "), 25, 8)))
      .withColumn("prefix",
        concat_ws(" ", slice(split(col("next_text"), " "), 1, 8)))
      .filter(col("suffix") =!= col("prefix"))
    assert(bad.count() == 0)
    r.unpersist()
  }

  test("q147 domain cap: histogram accounting equals brute top-K selection") {
    val r = CurationOps.q147DomainCap(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val bySource = docs.groupBy(_._1)
    assert(r.length == bySource.size, "one row per source")
    r.foreach { row =>
      val src = row.getAs[String]("source")
      val ds = bySource(src)
      // brute selection: sort by the cap's priority order, keep first 15
      val kept = ds.sortBy { case (_, id, nc) => (-nc, id) }.take(15)
      assert(row.getAs[Long]("n_docs") == ds.length.toLong)
      assert(row.getAs[Long]("kept_docs") == kept.length.toLong)
      assert(row.getAs[Long]("dropped_docs") ==
        (ds.length - kept.length).toLong)
      assert(row.getAs[Long]("kept_chars") == kept.map(_._3).sum)
      assert(row.getAs[Long]("dropped_chars") ==
        ds.map(_._3).sum - kept.map(_._3).sum)
    }
    // accounting identities hold globally
    assert(r.map(_.getAs[Long]("kept_docs")).forall(_ <= 15L))
  }

  test("q153 mixing: adjacency recount from the q113 order; rate sits at expectation") {
    val r = CurationOps.q153ShuffleMixing(spark, sf).collect()
    assert(r.length == 3) // one row per epoch
    // brute recount for epoch 0 using the same salted-hash order
    graft.expressions.Hash60.register(spark)
    val ordered = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"))
      .withColumn("h", expr("h60(concat('ep:0:', cast(doc_id as string)))"))
      .collect()
      .map(x => (x.getAs[Long]("h") % 8L, x.getAs[Long]("h"),
        x.getAs[Long]("doc_id"), x.getAs[String]("source")))
    val pairs = ordered.groupBy(_._1).values.flatMap { shard =>
      val s0 = shard.sortBy(x => (x._2, x._3)).map(_._4)
      s0.zip(s0.drop(1))
    }.toSeq
    val e0 = r.find(_.getAs[Long]("epoch") == 0L).get
    assert(e0.getAs[Long]("n_adj") == pairs.length.toLong)
    assert(e0.getAs[Long]("n_same") ==
      pairs.count { case (a, b) => a == b }.toLong)
    // a salted-hash permutation must read healthy, every epoch
    assert(r.forall(_.getAs[String]("mixing_band") == "mixed"))
  }

  test("curation queries are deterministic across runs") {
    CurationOps.queries.foreach { case (name, fn) =>
      val a = fn(spark, sf).collect()
      // evict persisted subtrees (q73's tf frame) so run b re-executes
      // the whole derivation instead of reading run a's cache — without
      // this the test compares cached data against itself
      spark.catalog.clearCache()
      val b = fn(spark, sf).collect()
      spark.catalog.clearCache()
      assert(a.sameElements(b), s"$name not deterministic across runs")
    }
  }

  test("q157 budget admission: brute histogram recount + conservation") {
    val r = CurationOps.q157BudgetAdmission(spark, sf).collect()
    val stops = Set("the", "a", "of", "and", "to", "in", "is", "it")
    // q25-attribute tokenization: raw split, a blank doc is the single
    // empty token (n_tokens >= 1 always)
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).trim.toLowerCase.split("[ \\t\\n\\r\\f]+"))
      .map(t => (t.count(stops).toLong * 1000L / t.length, t.length.toLong))
    val budget = docs.map(_._2).sum / 4L
    val hist = docs.groupBy(_._1).map { case (s, xs) =>
      s -> (xs.size.toLong, xs.map(_._2).sum)
    }
    assert(r.length == hist.size)
    // rows arrive score-descending; replay the greedy admission
    var cum = 0L
    r.foreach { row =>
      val s = row.getAs[Long]("score")
      val (nd, mass) = hist(s)
      val admit = math.max(0L, math.min(mass, budget - cum))
      assert(row.getAs[Long]("n_docs") == nd)
      assert(row.getAs[Long]("tok_mass") == mass)
      assert(row.getAs[Long]("cum_above") == cum, s"score $s")
      assert(row.getAs[Long]("admitted_here") == admit)
      val status = if (admit == mass) "full"
        else if (admit > 0) "partial" else "dropped"
      assert(row.getAs[String]("band_status") == status)
      cum += mass
    }
    // conservation: admitted mass = the budget exactly (corpus exceeds
    // the budget at this SF), and exactly one band is partial
    assert(r.map(_.getAs[Long]("admitted_here")).sum == budget)
    assert(r.count(_.getAs[String]("band_status") == "partial") <= 1)
    // the ledger exercises all three states
    assert(r.exists(_.getAs[String]("band_status") == "full"))
    assert(r.exists(_.getAs[String]("band_status") == "dropped"))
  }

  test("q194 sweep: the n=8 row reconciles with q71, monotone in n, brute ppm") {
    val sweep = CurationOps.q194ContaminationSweep(spark, sf).collect()
      .map(r => r.getAs[Long]("n") -> r).toMap
    assert(sweep.keySet == Set(4L, 8L, 13L))
    // the n=8 cell IS q71's verdict, re-derived independently
    val q71 = CurationOps.q71Contamination(spark, sf).collect()
    assert(sweep(8L).getAs[Long]("docs_with_hits") == q71.length.toLong)
    assert(sweep(8L).getAs[Long]("contaminated_docs") ==
      q71.count(_.getAs[Boolean]("contaminated")).toLong)
    assert(sweep(8L).getAs[Long]("shared_gram_mass") ==
      q71.map(_.getAs[Long]("n_shared_grams")).sum)
    // longer grams can only lose hits: docs_with_hits monotone non-inc
    assert(sweep(4L).getAs[Long]("docs_with_hits") >=
      sweep(8L).getAs[Long]("docs_with_hits"))
    assert(sweep(8L).getAs[Long]("docs_with_hits") >=
      sweep(13L).getAs[Long]("docs_with_hits"))
    // eligibility monotone non-increasing in n; ppm recomputes exactly
    assert(sweep(4L).getAs[Long]("eligible") >=
      sweep(13L).getAs[Long]("eligible"))
    sweep.values.foreach { row =>
      assert(row.getAs[Long]("contaminated_ppm") ==
        row.getAs[Long]("contaminated_docs") * 1000000L /
          row.getAs[Long]("eligible"))
    }
  }

  test("q238 budget sweep is exact on planted token counts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ctxbud").toString
    // two docs: 600 and 100 whitespace tokens
    Seq((1L, ("w " * 600).trim, "en", "s", 1200L),
        (2L, ("w " * 100).trim, "en", "s", 200L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = ops.CurationOps.q238ContextBudget(spark, dir).collect()
      .map(x => x.getAs[Long]("ctx_len") -> x).toMap
    assert(r.keySet == Set(512L, 2048L, 8192L))
    def waste(seqs: Long, l: Long) =
      (seqs * l - 700L) * 1000000L / (seqs * l)
    assert(r(512L).getAs[Long]("n_seqs_packed") == 3L)   // 2 + 1
    assert(r(512L).getAs[Long]("n_seqs_chopped") == 2L)  // ceil(700/512)
    assert(r(512L).getAs[Long]("pad_waste_ppm") == waste(3, 512))
    assert(r(2048L).getAs[Long]("n_seqs_packed") == 2L)
    assert(r(2048L).getAs[Long]("n_seqs_chopped") == 1L)
    assert(r(2048L).getAs[Long]("pad_waste_ppm") == waste(2, 2048))
    assert(r(8192L).getAs[Long]("n_seqs_packed") == 2L)
    assert(r(8192L).getAs[Long]("pad_waste_ppm") == waste(2, 8192))
    r.values.foreach(x => assert(x.getAs[Long]("n_tokens") == 700L))
  }

  test("q246 largest-remainder apportionment is exact and sums to the budget") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("apport").toString
    // masses 5/3/1 of 9: floors 55555/33333/11111 leave ONE slot, which
    // goes to srcA (largest remainder 5 vs 3 vs 1)
    Seq((1L, "t t t t t", "en", "srcA", 9L),
        (2L, "t t t", "en", "srcB", 5L),
        (3L, "t", "en", "srcC", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = ops.CurationOps.q246Apportionment(spark, dir).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r("srcA").getAs[Long]("floor_alloc") == 55555L)
    assert(r("srcA").getAs[Long]("extra") == 1L)
    assert(r("srcA").getAs[Long]("alloc") == 55556L)
    assert(r("srcB").getAs[Long]("alloc") == 33333L)
    assert(r("srcC").getAs[Long]("alloc") == 11111L)
    assert(r.values.map(_.getAs[Long]("alloc")).sum == 100000L)
  }

  test("q246 allocation sums to the budget on the fixture corpus") {
    val r = ops.CurationOps.q246Apportionment(spark, sf).collect()
    assert(r.map(_.getAs[Long]("alloc")).sum == 100000L)
    assert(r.forall(x => x.getAs[Long]("extra") == 0L ||
      x.getAs[Long]("extra") == 1L))
  }

  test("q272 Neyman allocation starves constant strata, exact recount") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("neyman").toString
    // a: lengths (10,10,10) → N·Σx²−(Σx)² = 0 → weight 0;
    // b: (5,15) → 2·250−400 = 100 → w = 10;
    // c: (8,12,16) → 3·464−36² = 96 → isqrt = 9. W = 19:
    // floors 5263 (rem 3) and 4736 (rem 16) → c takes the leftover slot
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L),
      (4L, "b", 5L), (5L, "b", 15L),
      (6L, "c", 8L), (7L, "c", 12L), (8L, "c", 16L))
    docs.map { case (i, s, n) => (i, "x", "en", s, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = ops.CurationOps.q272NeymanAlloc(spark, dir).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r("a").getAs[Long]("w_sigma_n") == 0L)
    assert(r("b").getAs[Long]("w_sigma_n") == 10L)
    assert(r("c").getAs[Long]("w_sigma_n") == 9L)
    assert(r("a").getAs[Long]("alloc") == 0L)
    assert(r("b").getAs[Long]("alloc") == 5263L)
    assert(r("c").getAs[Long]("alloc") == 4737L)
    assert(r.values.map(_.getAs[Long]("alloc")).sum == 10000L)
  }

  test("q272 isqrt is exact at radicands where the double seed drifts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("neymanbig").toString
    // w2 for a stratum {0, K} is exactly K² (2(0+K²)−K² = K²), and for
    // {0, 0, K} exactly 2K² — at K = 3e17 the radicands sit near 1e35,
    // where floor(sqrt(double)) alone is off by tens (ulp(9e34) ≈ 1e19
    // → seed error ~±17), far past what the ±1 correction repairs. The
    // two integer Newton steps must land the exact floor anyway.
    val k = 300000000000000000L // 3e17
    val docs = Seq(
      (1L, "sq", 0L), (2L, "sq", k),
      (3L, "ir", 0L), (4L, "ir", 0L), (5L, "ir", k))
    docs.map { case (i, s, n) => (i, "x", "en", s, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    def isqrt(v: BigInt): BigInt = {
      var s = BigInt(math.sqrt(v.toDouble).toLong)
      s = (s + v / s) / 2; s = (s + v / s) / 2
      while (s * s > v) s -= 1
      while ((s + 1) * (s + 1) <= v) s += 1
      s
    }
    val r = ops.CurationOps.q272NeymanAlloc(spark, dir).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r("sq").getAs[Long]("w_sigma_n") == k) // perfect square: √(K²)=K
    assert(r("ir").getAs[Long]("w_sigma_n") ==
      isqrt(BigInt(k) * k * 2).toLong) // irrational √(2K²) = ⌊K√2⌋
    assert(r.values.map(_.getAs[Long]("alloc")).sum == 10000L)
  }

  test("q272 falls back to proportional allocation on an all-constant corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("neyman0").toString
    val docs = Seq((1L, "a", 10L), (2L, "a", 10L),
      (3L, "b", 7L), (4L, "b", 7L), (5L, "b", 7L))
    docs.map { case (i, s, n) => (i, "x", "en", s, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = ops.CurationOps.q272NeymanAlloc(spark, dir).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r.values.forall(_.getAs[Long]("w_sigma_n") == 0L))
    assert(r("a").getAs[Long]("alloc") == 4000L)
    assert(r("b").getAs[Long]("alloc") == 6000L)
  }
}
