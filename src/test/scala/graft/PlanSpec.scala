package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan guards (SURVEY.md §4): these assertions pin the
  * scale-critical plan shapes so a refactor that silently loses predicate
  * pushdown, broadcast selection, top-k fusion, or LSH-bounded joins fails
  * CI rather than surfacing as a 100× regression on a real cluster.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q01 pushes the shipdate filter and prunes columns at the scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters:") && p.contains("LessThanOrEqual(l_shipdate"), p)
    assert(p.contains("ReadSchema") && !p.contains("l_comment"))
    // only the 6 needed columns reach the reader
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey"), readSchema)
  }

  test("q02 fuses global sort+limit into TakeOrderedAndProject") {
    assert(plan("q02_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("dimension joins broadcast (q03, q04, q07, q88)") {
    // q88: the bin-blocked interval join must broadcast the audit-day
    // side so the corpus side streams without shuffling
    Seq("q03_revenue_segment", "q04_region_revenue", "q07_anti_join",
      "q88_range_join")
      .foreach { q =>
        val p = plan(q)
        assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast:\n$p")
      }
  }

  test("no unbounded cartesian product anywhere in the query surface") {
    SparkEntry.queries.keys.foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q plans an unbounded cartesian product")
    }
  }

  test("nested-loop joins appear only where a broadcast-bounded cross join is intended") {
    // small side broadcast: q35 queries, q47/q61 centroids; q75's
    // single-row global-limit scalar attaches via a 1-row broadcast NLJ
    // q75/q86/q90/q92: a single-row scalar (corpus total / avgdl /
    // quantile cuts) attaches via a 1-row broadcast NLJ
    // q104: recall ground truth = corpus × broadcast(32-vector eval set),
    // plus the 1-row n_queries scalar attach
    // q116: three 1-row census aggregates (nodes/edges/triangles) attach
    // via broadcast cross joins
    // q118: four 1-row frames (two sketches, two exact counts) combine
    // via broadcast cross joins
    // q120: each integrity check attaches its 1-row violation aggregate
    // to the 1-row n_checked count the same way
    // q129 (and q133, which composes it): the 1-row vocab-size scalar
    // attaches to the smoothing denominator via a 1-row broadcast NLJ
    // q135: the 1-row LM-mass totals and the 1-row corpus-mean frame
    // attach the same way
    // q136: the learned 1-row merge (a, b) reaches the corpus-wide
    // replace() via a 1-row broadcast cross join
    // q137: the 1-row corpus-size scalar feeds the checkpoint formula
    // q140: the 1-row Σw and deficit scalars attach to the |sources| table
    // q146: the 1-row Σc_bi bigram total attaches to the vocab²-row
    // association frame via a 1-row broadcast cross join
    // q152: the 1-row corpus total attaches to the |sources|·|langs|
    // contingency cells the same way
    // q153: the 1-row corpus mixing expectation attaches to the
    // |epochs|-row adjacency frame the same way
    // q157: the 1-row token-budget scalar attaches to the ≤1001-row
    // score histogram the same way
    // q158: the KS evaluation grid is sources × broadcast(corpus score
    // levels) — bounded both sides — plus the 1-row corpus-total scalar
    // q162: the 1-row total-pairs scalar attaches to the ≤6-cell split
    // ledger the same way
    // q169: the 1-row corpus totals (tokens / hapax / vocab) attach to
    // the ≤13-row frequency-decade frame the same way
    // q171: the 1-row node/edge totals attach to the occupancy-bounded
    // in-degree distribution the same way
    // q173: the 1-row user total attaches to the ≤14-row mean-gap band
    // histogram the same way
    // q174: the 10-row threshold frame theta-joins the ≤101-row tmax
    // histograms (bounded both sides, the q158 grid shape), plus the
    // 1-row corpus-count attach
    // q178: the 8-word stopword frame crosses the |sources| frame and
    // the 1-row corpus mass attaches — all bounded broadcasts
    // q181/q182: 1-row totals attach to ≤14-decade frames the same way
    // q183: eval-bounded ground-truth cross (the q104 pattern) + five
    // 1-row count frames combining via broadcast crosses
    // q187: corpus × broadcast(100-query eval prefix) — the q35 shape
    // q195: the 1-row corpus-max-date and 1-row quartile-cut frames
    // attach to the per-customer frame via 1-row broadcast crosses
    // q196: the 1-row basket-count scalar AND the 1-row giant-basket
    // ledger attach to the frequent-pair frame the same way
    // q197: the 1-row corpus token total attaches to the vocab-keyed
    // keyness frame the same way
    // q198: the 1-row digit total and 1-row χ² total attach to the
    // 9-row digit frame the same way
    // q207: the 1-row path total attaches to the ≤|types|³ path frame
    // the same way
    // q210: the three 1-row stage counts combine via broadcast crosses
    // (the q118 shape)
    // q211: the 1-row global decile-cut array attaches to the attribute
    // frame the same way
    // q214: per key family, the 1-row stats frame broadcasts onto the
    // |keys| count frame (top-key pick) and the two 1-row frames combine
    // q216: the 1-row population total attaches to the ≤4-row k-band frame
    // q217: the 1-row corpus total/tie-term frame attaches to the
    // |sources| rank frame the same way
    // q218/q219: the 7-row lag list crosses the |days|-bounded daily
    // series via an explicit broadcast before the self equi-join
    // q220-q223: the q35 eval-set shape — corpus × broadcast(bounded
    // query prefix) — plus q220's composed q90 scalar attaches and
    // q221's 10-row discount-table broadcasts
    // q224/q225/q226: 1-row population/user/variance totals attach to
    // ≤|types|-row frames via explicit broadcasts (the q216 shape)
    // q228: the calendar-bounded |days|² pair generator is an intended
    // broadcast theta join, plus 1-row slope/intercept/OLS attaches
    // q245: the 1-row corpus doc-count scalar attaches to the token
    // burstiness frame the same way
    // q248: the 1-row session total attaches to the ≤|types|²-row pair
    // frame the same way
    // q249: the 1-row (total, n_days) frame crosses the |days|-bounded
    // daily series before the calendar-bounded windows
    // q251: the 1-row min/max cutoff attaches to the events scan and the
    // 1-row readout derives from one user-keyed aggregate
    // q252: the 1-row pair total attaches to the pair-vocab frame (the
    // q146 shape with the window-pair generator)
    // q255: the 15-row lag spine broadcasts onto the |days|-bounded
    // daily frame (the q218 shape, cross-series)
    // q256: the 3-row δ spine broadcasts onto the ranked doc frame
    // before the (block, rank+δ) equi-join
    // q257: the 1-row month-bounds frame attaches to the lineitem scan
    // q258: the 1-row pair-mass and doc-count frames attach to the
    // 4-row batch spine
    // q259: two 1-row moment frames attach to the |brands| ledger
    // q260/q262: the salt/arm spines broadcast onto the user/day frames
    // q268: the 1-row doc_id-span frame (min_id, width) attaches to the
    // documents scan before the decile bucketing — the q257 shape
    // q269: per k-level, three 1-row count aggregates (core nodes /
    // prev-round nodes / core edges) combine via explicit broadcast
    // crosses — the q118 shape
    // q273: the calendar-bounded |days|² pair generator is an intended
    // broadcast theta join (the q228 shape) plus the 1-row n_days attach
    // q275: the 1-row basket-count scalar and giant-basket ledger attach
    // to the frequent-triple frame — the q196 shape one level deeper
    // q270: the 1-row global decile-cut array attaches to the orders
    // scan (the q211 shape) and the 10-row bin spine broadcasts onto
    // the |months| frame
    // q276: the 1-row pooled-rate frame and 1-row contrast ledger attach
    // to the ≤|years|-row stratum frame — the q198 shape
    // q277: the 1-row giant-basket ledger attaches to the head-bounded
    // neighbor frame — the q196 shape
    // q278/q284: the 1-row corpus-horizon date attaches to the orders
    // scan before the censoring split (the q195 max-date shape); q278
    // additionally collapses the bounded event ledger to ONE row for
    // the KM recurrence HOF
    // q279: the 1-row horizon month-count attaches to the |parts| frame
    // q280: the 1-row node-count frame attaches to the 20-row top-k
    // q285: the calendar-bounded |days|² pair generator is an intended
    // broadcast theta join (the q273/q228 shape) plus the 1-row
    // tie-term and n_days attaches
    // q286: the 1-row first-month scalar attaches to the (part × month)
    // frame before the matched-basket equi-join — the q257 shape
    // q287: the 1-row day-count, exact-median and run-ledger frames
    // attach via broadcast crosses — the q249 daily-series shape
    // q288: the 1-row median/MAD/anomaly-count scalars attach to the
    // gap-filled daily spine the same way
    // q289: the 1-row sale-horizon and suspect-count frames attach to
    // the per-part gap frame — the q195 max-date shape
    // q290: the 1-row vec_id-span frame attaches to the embeddings scan
    // before the octile bucketing — the q268 shape
    val allowed = Set(
      "q288_mad_anomalies", "q289_stockout_gaps", "q290_embedding_drift",
      "q276_simpson_reversal", "q277_item_cf", "q278_km_repurchase",
      "q279_abc_xyz", "q280_pagerank", "q284_nelson_aalen",
      "q285_mann_kendall", "q286_price_index", "q287_runs_test",
      "q269_kcore", "q270_dist_stability",
      "q273_kendall_tau", "q275_basket_triples",
      "q268_ngram_novelty",
      "q249_cusum_changepoint", "q251_cuped_readout",
      "q252_skipgram_cooc", "q255_ccf_lead_lag",
      "q256_sorted_neighborhood", "q257_price_volume_mix",
      "q258_inbatch_collisions", "q259_shrunk_rates",
      "q260_aa_calibration", "q262_peeking_audit",
      "q263_exposure_bias", "q264_overdispersion",
      "q245_burstiness", "q248_event_lift",
      "q216_k_anonymity", "q217_rank_test", "q218_autocorr",
      "q219_ewma_chart", "q220_rrf_fusion", "q221_ndcg",
      "q222_hit_rates", "q223_list_diversity", "q224_l_diversity",
      "q225_markov_mixing", "q226_dow_seasonality", "q228_theil_sen",
      "q232_bootstrap_ci", "q234_survival_curve",
      "q235_retention_matrix", "q236_stickiness",
      "q238_context_budget", "q240_verdict_joint",
      "q241_prefix_sharing","q183_dedup_recall","q35_knn_brute", "q47_ivf_ann", "q61_kmeans_cells",
      "q195_rfm_segments", "q196_basket_pairs", "q197_keyness",
      "q198_benford", "q207_path_trigrams", "q210_windowed_funnel",
      "q211_score_deciles", "q214_skew_audit",
      "q187_margin_audit",
      "q169_freq_spectrum", "q171_hubness", "q173_user_rates",
      "q174_threshold_sweep", "q178_stopword_drift",
      "q181_conversion_lag", "q182_cell_balance",
      "q157_budget_admission", "q158_ks_drift", "q162_split_leakage",
      "q163_cluster_split", "q165_class_separation", "q166_dup_flow",
      "q146_pmi_assoc", "q152_composition_skew", "q153_shuffle_mixing",
      "q75_source_mixing", "q80_ivfpq_ann", "q86_upsample_mix",
      "q90_bm25", "q92_quantile_bins", "q104_ann_recall",
      "q116_triad_census", "q118_join_size_sketch",
      "q120_referential_integrity", "q129_bigram_lm",
      "q133_filter_ensemble", "q135_dsir_score", "q136_bpe_train",
      "q137_vocab_growth", "q140_temperature_mix", "q141_token_drift")
    SparkEntry.queries.keys.filterNot(allowed).foreach { q =>
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q fell back to a nested-loop join:\n$p")
    }
  }

  test("1-row scalar attaches carry an explicit broadcast, never a cartesian") {
    // These four previously relied on AQE's runtime stats to pick the
    // broadcast side of their 1-row crossJoins; the explicit broadcast()
    // makes the plan stats-independent — a misestimate can no longer
    // plan a real cartesian product.
    Seq("q75_source_mixing", "q86_upsample_mix",
      "q116_triad_census", "q118_join_size_sketch").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastNestedLoopJoin"),
        s"$q lost its broadcast scalar attach:\n$p")
      assert(!p.contains("CartesianProduct"), q)
    }
  }

  test("LSH pair queries are equi-joins (hash or sort-merge), never theta") {
    Seq("q33_simhash_pairs", "q34_ngram_jaccard",
      "q36_ann_lsh", "q37_cosine_neardup", "q78_fuzzy_match",
      "q87_sparse_cosine").foreach { q =>
      val p = plan(q)
      assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
        s"$q is not an equi-join:\n$p")
    }
    // q31 (and q123/q60/q102/q116 behind it) consumes the shared
    // band-candidate stage, whose materialized form roots at an RDD scan;
    // guard the stage's OWN plan, where the band join lives
    val p31 = ops.DedupOps.bandCandidatesPlan(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p31.contains("HashJoin") || p31.contains("SortMergeJoin"),
      s"band-candidate stage is not an equi-join:\n$p31")
    assert(!p31.contains("CartesianProduct"), p31)
  }

  test("q154's pair generation is an fp-keyed equi-join over the stop-filtered postings") {
    val p = plan("q154_winnowing")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"q154 pair join is not an equi-join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q154 fell back to an unbounded join:\n$p")
  }

  test("q156 roots at the pinned band/cc stages, not fresh corpus scans") {
    // both inputs are localCheckpoint'ed stage artifacts: the plan must
    // read RDD scan roots, never re-derive shingles from documents
    ops.DedupOps.bandCandidates(spark, sf)
    ops.DedupOps.ccLabels(spark, sf)
    val p = plan("q156_cluster_tightness")
    assert(!p.contains("documents.parquet"),
      s"q156 re-scans the corpus instead of riding its stages:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"q156 lost its stage roots:\n$p")
  }

  test("q162 rides the pinned band stage and labels splits without a join") {
    // the verified-pair set must come from the localCheckpoint'ed band
    // artifact, and both endpoint splits are per-row hash CASEs — the
    // plan carries NO documents re-scan and no extra join for q91's rule
    ops.DedupOps.bandCandidates(spark, sf)
    val p = plan("q162_split_leakage")
    assert(!p.contains("documents.parquet"),
      s"q162 re-derives candidates from the corpus:\n$p")
    assert(p.contains("Scan ExistingRDD"), s"q162 lost its stage root:\n$p")
  }

  test("q269 peels the pinned candidate stage; q271 profiles without a window") {
    // q269's 8-round peel must run on the checkpointed band-candidate
    // frame — a re-derivation would re-run the shingle→minhash chain
    // 3 k-levels × 8 rounds times
    ops.DedupOps.bandCandidates(spark, sf)
    val p269 = plan("q269_kcore")
    assert(p269.contains("Scan ExistingRDD"),
      s"q269 lost its candidate-stage root:\n$p269")
    assert(!p269.contains("minhash") && !p269.contains("shingle"),
      s"q269 re-derives the dup graph:\n$p269")
    // q271's modal value comes from a max-count aggregate join-back —
    // a window over the per-(column, value) frame would drag a whole
    // key column's values through one task (the q122 hazard)
    val p271 = plan("q271_col_profile")
    assert(!p271.contains("Window"),
      s"q271 reintroduced a window over the value frame:\n$p271")
  }

  test("q163/q164/q166 read cc labels from the pinned stage, never re-deriving") {
    // each may scan documents (id/source/token projections) but must
    // take the CLUSTER STRUCTURE from the checkpointed cc artifact: a
    // re-derivation would re-run band candidates + the CC loop per query
    ops.DedupOps.bandCandidates(spark, sf)
    ops.DedupOps.ccLabels(spark, sf)
    for (q <- Seq("q163_cluster_split", "q164_source_shrinkage",
        "q166_dup_flow")) {
      val p = plan(q)
      assert(p.contains("Scan ExistingRDD"), s"$q lost its cc-stage root:\n$p")
      assert(!p.contains("minhash") && !p.contains("shingle"),
        s"$q re-derives the dup graph:\n$p")
    }
  }

  test("q199's candidate generation is a prefix-token equi-join, never all-pairs") {
    val p = plan("q199_allpairs_join")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"q199 candidate join is not an equi-join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q199 fell back to an unbounded join:\n$p")
  }

  test("q195's quartiles come from the histogram contract, its windows stay partitioned") {
    // the classic RFM implementation is a partition-less NTILE — a
    // single-task global sort of every customer; the only windows in
    // this plan must be the histogram contract's cumulative ranks,
    // partitioned by the melted measure key
    val p = plan("q195_rfm_segments")
    val windows = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.forall(_.contains("m#")),
      s"q195 has a window not partitioned by the measure key:\n$p")
  }

  test("q200/q201/q202 windows are purchase-/user-keyed, never global") {
    for (q <- Seq("q200_attribution", "q201_time_weighted")) {
      val p = plan(q)
      val windows = p.linesIterator
        .filter(_.contains("windowspecdefinition")).toSeq
      assert(windows.nonEmpty && windows.forall(w =>
        w.contains("p_id") || w.contains("user_id")),
        s"$q has an unpartitioned window:\n$p")
    }
    // q202's only windows are the histogram contract's event_type ranks
    val p = plan("q202_winsorized")
    val windows = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.forall(_.contains("event_type")),
      s"q202 has a window not partitioned by event_type:\n$p")
  }

  test("q203/q204 broadcast their dimension joins; q207 fuses its top-20") {
    val p204 = plan("q204_pareto")
    assert(p204.contains("BroadcastHashJoin"),
      s"q204 lost its dimension broadcasts:\n$p204")
    val windows = p204.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("r_name")),
      s"q204 has a window not partitioned by region:\n$p204")
    assert(plan("q207_path_trigrams").contains("TakeOrderedAndProject"),
      "q207 lost its top-k fusion")
    for (q <- Seq("q205_scd2", "q206_new_returning")) {
      val p = plan(q)
      val ws = p.linesIterator
        .filter(_.contains("windowspecdefinition")).toSeq
      assert(ws.forall(_.contains("user_id")),
        s"$q has a window not partitioned by user_id:\n$p")
    }
  }

  test("q208/q209 windows and sketch merges stay calendar-/segment-bounded") {
    // q209's cumulative rank window must partition by segment (the
    // histogram rows are domain-bounded, never corpus rows)
    val p209 = plan("q209_gini")
    val ws = p209.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(ws.nonEmpty && ws.forall(_.contains("c_mktsegment")),
      s"q209 has a window not partitioned by segment:\n$p209")
    // q208's union pass must aggregate day sketches, not re-expand the
    // (user, day) pair set a second time: exactly two distinct-ish
    // aggregations over the pinned frame, no cartesian anywhere
    val p208 = plan("q208_sketch_wau")
    assert(!p208.contains("CartesianProduct"), p208)
    assert(p208.contains("hll_union_agg") || p208.contains("HllUnionAgg"),
      s"q208 lost its sketch merge:\n$p208")
  }

  test("q168's trailing window is partitioned by event_type") {
    val p = plan("q168_burst_detect")
    val windows = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("event_type")),
      s"q168 window lost its type partitioning:\n$p")
  }

  test("q170's windows are partitioned (per-user lag, per-prev-type total)") {
    val p = plan("q170_event_transitions")
    val windows = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(w =>
      w.contains("user_id") || w.contains("prev_type")),
      s"q170 has an unpartitioned window:\n$p")
  }

  test("q169 reads only the text column; its window runs post-aggregate") {
    val p = plan("q169_freq_spectrum")
    val readSchema = p.linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(readSchema.contains("text") && !readSchema.contains("doc_id"),
      s"q169 reads more than the text column:\n$readSchema")
    // the one unpartitioned window (cumulative mass) is legal only
    // because it runs over the ≤13-row decade frame: the plan must show
    // the token aggregate BELOW the window, i.e. no window directly over
    // a file scan
    val lines = p.linesIterator.toSeq
    val winIdx = lines.indexWhere(_.contains("Window"))
    val aggIdx = lines.lastIndexWhere(_.contains("HashAggregate"))
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"q169 window is not above the band aggregate:\n$p")
  }

  test("q171 rides the pinned knn stage and reads only node ids from parquet") {
    ops.SimOps.knnEdges(spark, sf)
    val p = plan("q171_hubness")
    assert(p.contains("Scan ExistingRDD"),
      s"q171 lost its pinned knn-edge root:\n$p")
    assert(!p.contains("nearest_cell_cos"),
      s"q171 re-derives the cell assignment:\n$p")
    // the only parquet touch is the vec_id node projection ("embedding"
    // alone would also match the embeddings.parquet path in Location)
    val readSchema = p.linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(readSchema.contains("struct<vec_id:bigint>") &&
      !readSchema.contains("embedding:"),
      s"q171 reads embedding vectors it never uses:\n$readSchema")
  }

  test("q172's windows are partitioned (per-user lag, per-type total)") {
    val p = plan("q172_gap_spectrum")
    val windows = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(w =>
      w.contains("user_id") || w.contains("event_type")),
      s"q172 has an unpartitioned window:\n$p")
  }

  test("q173 is window-free: per-user stats come from one hash aggregate") {
    val p = plan("q173_user_rates")
    assert(!p.contains("windowspecdefinition"),
      s"q173 grew a window it doesn't need:\n$p")
    assert(!p.contains("SortAggregate"),
      s"q173 lost its hash-aggregate shape:\n$p")
  }

  test("q174 rides the pinned band stage; the sweep never joins the pair set") {
    ops.DedupOps.bandCandidates(spark, sf)
    val p = plan("q174_threshold_sweep")
    assert(p.contains("Scan ExistingRDD"),
      s"q174 lost its band-stage root:\n$p")
    assert(!p.contains("minhash") && !p.contains("shingle"),
      s"q174 re-derives candidates from the corpus:\n$p")
  }

  test("q175 is scan-local: no window, one aggregate, 2-column read") {
    val p = plan("q175_char_classes")
    assert(!p.contains("windowspecdefinition"),
      s"q175 grew a window it doesn't need:\n$p")
    val readSchema = p.linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(readSchema.contains("source") && readSchema.contains("text") &&
      !readSchema.contains("doc_id"),
      s"q175 reads more than (source, text):\n$readSchema")
  }

  test("q176's share/peak windows are partitioned by event_type") {
    val p = plan("q176_diurnal_profile")
    val windows = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("event_type")),
      s"q176 has an unpartitioned window:\n$p")
  }

  test("q177 is window-free: exclusivity folds through keyed aggregates") {
    val p = plan("q177_vocab_exclusivity")
    assert(!p.contains("windowspecdefinition"),
      s"q177 grew a window it doesn't need:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q177's token join fell off the equi-join path:\n$p")
  }

  test("q179's assignment is the codegen argmax; windows stay label-partitioned") {
    val p = plan("q179_centroid_confusion")
    assert(p.contains("nearest_cell_cos"),
      s"q179 lost the codegen assignment expression:\n$p")
    val windows = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.forall(_.contains("label_true")),
      s"q179 windows beyond the confusion frame:\n$p")
  }

  test("q180's windows are partitioned (per-user lag+numbering, per-type share)") {
    val p = plan("q180_session_stats")
    val windows = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(w =>
      w.contains("user_id") || w.contains("entry_type")),
      s"q180 has an unpartitioned window:\n$p")
  }

  test("q182 rides the pinned IVF assignment, never re-deriving it") {
    ops.SimOps.ivfAssignment(spark, sf)
    val p = plan("q182_cell_balance")
    assert(p.contains("Scan ExistingRDD"),
      s"q182 lost its pinned assignment root:\n$p")
    assert(!p.contains("nearest_cell_cos"),
      s"q182 re-runs the coarse quantizer:\n$p")
  }

  test("q62's only unbounded-looking aggregate is the GK sketch itself") {
    // The exact contract column must come from the domain-sized histogram
    // path, never the buffer-all built-in `percentile` (O(group rows)
    // executor state). approx_percentile legitimately remains — its
    // ObjectHashAggregate state is a constant-size quantile summary.
    val p = plan("q62_approx_percentile")
    assert(!p.replace("approx_percentile", "").contains("percentile("),
      s"q62 reintroduced the buffer-all percentile:\n$p")
  }

  test("q59 reads JSON through an explicit schema (no inference pass)") {
    val p = plan("q59_json_scan")
    assert(p.contains("FileScan json"), p)
    // the declared 4-column schema reaches the reader
    assert(p.contains("day") && p.contains("event_type"), p)
  }

  test("q61/q47 assign is the NearestCellCos expression — no centroid join at all") {
    // the argmax runs inside the scan's codegen pipeline over the
    // driver-collected centroid matrix: the plan must show the custom
    // expression and NO join/cross product for the assignment. q47 now
    // consumes the PINNED assignment artifact, so the codegen shape is
    // guarded on its un-pinned twin (the bandCandidatesPlan pattern) and
    // q47's own plan must root at the pinned scan.
    val pAssign = ops.SimOps.ivfAssignmentPlan(spark, sf)
      .queryExecution.executedPlan.toString
    assert(pAssign.contains("nearest_cell_cos"),
      s"IVF assignment stage lost the codegen expression:\n$pAssign")
    assert(!pAssign.contains("CartesianProduct"), pAssign)
    val p61 = plan("q61_kmeans_cells")
    assert(p61.contains("nearest_cell_cos"),
      s"q61 assign lost the codegen expression:\n$p61")
    assert(!p61.contains("CartesianProduct"), p61)
    // q61's final plan (post-assign) must not join at all
    assert(!p61.contains("Join"), s"q61 still joins:\n$p61")
    val p47 = plan("q47_ivf_ann")
    assert(p47.contains("ExistingRDD") || p47.contains("Scan ExistingRDD"),
      s"q47 no longer roots at the pinned assignment artifact:\n$p47")
    assert(!p47.contains("CartesianProduct"), p47)
  }

  test("q60's component join and q63's cohort join stay equi-joins") {
    Seq("q60_dedup_groups", "q63_retention").foreach { q =>
      val p = plan(q)
      assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
        s"$q is not an equi-join:\n$p")
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("q74's prefix sum never plans a single-partition window") {
    // the whole point of the two-level bucketed cumsum: the global
    // running sum must not serialize the corpus through one task (the
    // only SinglePartition exchange allowed is the final tiny
    // cross-bucket offset window over n/1024 rows, which Catalyst plans
    // over the bucket-totals aggregate, not the corpus)
    val df = SparkEntry.queries("q74_seq_packing")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // every window over corpus-sized input is partitioned by bucket
    val corpusWindows = p.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .filter(_.contains("doc_id")).toSeq
    assert(corpusWindows.forall(_.contains("bucket")),
      s"corpus-sized window lost its bucket partitioning:\n$p")
  }

  test("q71's contamination join and q72's boilerplate join are equi-joins") {
    Seq("q71_contamination", "q72_segment_dedup").foreach { q =>
      val p = plan(q)
      assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
        s"$q is not an equi-join:\n$p")
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("IVF assign never windows over the n×C candidate expansion") {
    // cosine sites (q47/q61) assign via the NearestCellCos expression —
    // no expansion exists at all; the IVF-PQ coarse/code assigns
    // collapse via min_by partial aggregation inside the join stage
    // (guarded on the un-pinned code-stage twin — q80's own plan roots
    // at the pinned artifact). Either way, a corpus-side argmax window
    // (partitioned by vec_id) is the regression this guard catches.
    val pCodes = ops.SimOps.ivfPqCodesPlan(spark, sf)
      .queryExecution.executedPlan.toString
    assert(pCodes.contains("min_by"),
      s"IVF-PQ code stage lost its map-side min_by aggregate:\n$pCodes")
    assert(!pCodes.contains("windowspecdefinition(vec_id"),
      s"IVF-PQ code assign went through a Window over candidates:\n$pCodes")
    val pPq = ops.SimOps.pqCodesPlan(spark, sf)
      .queryExecution.executedPlan.toString
    assert(pPq.contains("min_by"),
      s"PQ code stage lost its map-side min_by aggregate:\n$pPq")
    Seq("q47_ivf_ann", "q61_kmeans_cells", "q80_ivfpq_ann").foreach { q =>
      val p = plan(q)
      assert(!p.contains("windowspecdefinition(vec_id"),
        s"$q argmax went through a Window over centroid candidates:\n$p")
    }
    assert(plan("q80_ivfpq_ann").contains("ExistingRDD"),
      "q80 no longer roots at the pinned code artifact")
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // at 100 TB a fact⋈selective-dim join that is too big to broadcast
    // still should not shuffle the whole fact side: Catalyst's runtime
    // bloom filter (injected from the dim side's filtered keys) drops
    // non-matching fact rows BEFORE the exchange. The production-default
    // thresholds (10 GB application side) are right for real scale and
    // unreachable in a test corpus, so the test lowers them to prove the
    // rewrite fires for this engine's join shapes.
    import org.apache.spark.sql.functions.{col, sum}
    val c = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    val saved = keys.map(k => k -> c.getOption(k)).toMap
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold", "0")
      c.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "100MB")
      val li = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") || p.contains("bloom_filter"),
        s"no runtime bloom filter injected:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None)    => c.unset(k)
    }
  }

  test("q102's canonical argmax is a partial aggregate, not a window") {
    // keep-best selection must collapse map-side via max(struct(...)):
    // a per-cluster row_number window would sort every labeled doc
    val p = plan("q102_cluster_canonical")
    assert(!p.contains("windowspecdefinition(canon_id"),
      s"q102 canonical selection went through a Window:\n$p")
    assert(p.contains("max(") && p.contains("partial"),
      s"q102 lost its partial aggregation:\n$p")
  }

  test("q103's top-k is TakeOrderedAndProject over a hash aggregate") {
    // pair counting must not globally sort the pair vocabulary: the
    // limit rides per-partition heaps
    val p = plan("q103_bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"),
      s"q103 lost its top-k fusion:\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  test("q104's ground truth broadcasts the eval set; ANN sides stay equi-joins") {
    val p = plan("q104_ann_recall")
    // exact GT: corpus × broadcast(32 queries) — the bounded NLJ shape
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"q104 ground truth lost its broadcast:\n$p")
    // no unbounded cartesian anywhere
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q106's per-group top-k is a partial-merge aggregate, not a window") {
    // the mergeable-heap contract: no per-partition sort of the fact
    // table, k-bounded buffers combine map-side before the shuffle
    val p = plan("q106_topk_heap")
    assert(!p.contains("windowspecdefinition"),
      s"q106 fell back to a window sort:\n$p")
    assert(p.contains("partial_top3q"),
      s"q106 lost its map-side partial aggregation:\n$p")
  }

  test("q94 scans the corpus once: both passes read the cached histogram") {
    // the quartile/fence pass and the weighted outlier pass aggregate off
    // the same persisted (group, v, c) histogram — the flag branch must
    // read the in-memory relation, not re-scan lineitem (q92, single-
    // group, takes the opposite A/B-measured trade: two parallel scans)
    val df = SparkEntry.queries("q94_iqr_outliers")(spark, sf)
    df.write.mode("overwrite").format("noop").save()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan"), s"q94 rebuilt its histogram:\n$p")
    spark.catalog.clearCache()
  }

  test("q70's scrub is scan-projected per-row work (no shuffle before sort)") {
    val p = plan("q70_pii_redaction")
    // exactly one exchange: the final rangepartitioning for ORDER BY
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"q70 shuffles beyond its output sort:\n$p")
    // reads only the two needed columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      readSchema)
  }

  test("q190 prunes partitions statically: the date bound reaches PartitionFilters") {
    val p = plan("q190_partition_pruning")
    // the literal trailing-7-day bound must land in the scan's
    // PARTITION filters (directory-level pruning), not just DataFilters
    assert(p.contains("PartitionFilters: ["), p)
    val pf = p.linesIterator.filter(_.contains("PartitionFilters:"))
      .mkString("\n")
    assert(pf.contains("event_date") && pf.contains(">="),
      s"date bound missing from partition filters:\n$pf")
  }

  test("q191 injects a dynamic pruning expression into the fact scan") {
    val p = plan("q191_dynamic_pruning")
    // plan toString ellipsizes long filter lists — match the stem, which
    // also covers the SubqueryAdaptiveBroadcast dynamicpruning#N node
    assert(p.contains("dynamicpruning"),
      s"DPP did not fire on the partitioned fact scan:\n$p")
  }

  test("q145 chunking is scan-local: no join, no aggregate, one sort exchange") {
    val p = plan("q145_doc_chunks")
    assert(!p.contains("Join"), s"q145 planned a join:\n$p")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"q145 shuffles beyond its output sort:\n$p")
    // reads only the three needed columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("source") && !readSchema.contains("n_chars"),
      readSchema)
  }

  test("q107's island merge windows per doc, never over the whole corpus") {
    val p = plan("q107_dup_spans")
    // duplicated-gram detection is an equi-join on the 60-bit hash
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"q107 gram join is not an equi-join:\n$p")
    // both windows (lag + running island sum) stay partitioned by doc_id
    val windows = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("doc_id")),
      s"q107 window lost its per-doc partitioning:\n$p")
  }

  test("q108's assign is the codegen argmax; pair search stays an equi-join") {
    val p = plan("q108_semdedup")
    assert(p.contains("nearest_cell_cos"),
      s"q108 assign lost the codegen expression:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"q108 in-cell pair search is not an equi-join:\n$p")
    // the keep decision is pairwise-local: no window, no iteration
    assert(!p.contains("windowspecdefinition"),
      s"q108 planned a window it does not need:\n$p")
  }

  test("q109 inference is one scan: no join, no aggregate-shuffle") {
    // the derivation is guarded on the un-pinned attribute-stage twin
    // (q109 itself now serves from the pinned attr_model table)
    val p = ops.TextOps.attrModelPlan(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"attr_model joined for its weights:\n$p")
    // no exchange at all pre-sort: per-row scoring is scan-local
    assert(!p.contains("Exchange"),
      s"attr_model shuffles for per-row work:\n$p")
    // reads only doc_id + text
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      readSchema)
    val pQ = plan("q109_quality_model")
    assert(pQ.contains("ExistingRDD"),
      s"q109 no longer roots at the pinned attribute table:\n$pQ")
  }

  test("q110's sketch collapses map-side: partial_min before the exchange") {
    val p = plan("q110_corpus_overlap")
    // the per-source minima must partial-aggregate (shuffle carries
    // |sources| rows, not the exploded shingle stream)
    assert(p.contains("partial_min") || p.contains("partial min"),
      s"q110 lost map-side partial aggregation:\n$p")
  }

  test("q129's LM scoring joins are equi-joins over the bigram key") {
    // guarded on the un-pinned attribute-stage twin (q129 itself now
    // serves from the pinned attr_fluency table)
    val p = ops.TextOps.attrFluencyPlan(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"attr_fluency lost its equi-joins:\n$p")
    // the only NLJ is the 1-row vocab scalar attach
    val nljs = p.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin")).size
    assert(nljs <= 1, s"attr_fluency plans $nljs nested-loop joins:\n$p")
    assert(plan("q129_bigram_lm").contains("ExistingRDD"),
      "q129 no longer roots at the pinned attribute table")
  }

  test("q130/q132/q134 candidate joins stay cell/key equi-joins") {
    Seq("q130_knn_graph", "q132_graph_rank", "q134_sem_decontam")
      .foreach { q =>
        val p = plan(q)
        assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
          s"$q is not an equi-join:\n$p")
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$q fell back to a nested-loop join:\n$p")
      }
    // q134 assigns inline: the codegen argmax must survive in its final
    // plan (never a centroid join)
    assert(plan("q134_sem_decontam").contains("nearest_cell_cos"),
      "q134 assign lost the codegen expression")
    // q130/q132 consume the PINNED knn-edge stage, which roots their
    // final plans at a checkpointed RDD scan — so the cell-join shape is
    // guarded on the un-pinned twin (the bandCandidatesPlan pattern; the
    // codegen-argmax assignment now lives in the shared ann_ivf_assign
    // stage, guarded by the q47 test above), and the pinned path is
    // asserted to actually root at the materialized blocks.
    val edgePlan = ops.SimOps.knnEdgesPlan(spark, sf)
      .queryExecution.executedPlan.toString
    assert(edgePlan.contains("HashJoin") || edgePlan.contains("SortMergeJoin"),
      s"knn edge derivation is not a cell equi-join:\n$edgePlan")
    assert(!edgePlan.contains("CartesianProduct"),
      s"knn edge derivation fell back to a cartesian product:\n$edgePlan")
    Seq("q130_knn_graph", "q132_graph_rank").foreach { q =>
      val p = plan(q)
      assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
        s"$q no longer roots at the pinned (checkpointed) edge stage:\n$p")
    }
  }

  test("q135's scoring join broadcasts the 4096-row LM table") {
    val p = plan("q135_dsir_score")
    assert(p.contains("BroadcastHashJoin"),
      s"q135 shuffles the corpus against a 4096-row table:\n$p")
  }

  test("q122/q124 group moments never ride full-row windows") {
    // q122: the cumulative-median walk must run over the per-(source,
    // value) HISTOGRAM (a window above a hash aggregate), with the
    // per-source spec broadcast back — the r7 shape (ordered cumsum over
    // every doc row of a source in one task) is the banned scale-killer
    val p122 = plan("q122_weighted_median")
    assert(p122.contains("Window"), s"q122 lost its domain cumulative:\n$p122")
    assert(p122.contains("BroadcastHashJoin"),
      s"q122 stopped broadcasting the per-source spec:\n$p122")
    // q124: moments come from a groupBy broadcast-joined back — no
    // window may appear anywhere in the plan
    val p124 = plan("q124_zscore")
    assert(!p124.contains("Window"),
      s"q124 reintroduced a full-row window over the source key:\n$p124")
    assert(p124.contains("BroadcastHashJoin"),
      s"q124 stopped broadcasting the group moments:\n$p124")
  }

  test("q147's cap resolves on the histogram: window partitioned by source above an aggregate") {
    // the banned shape is a corpus row_number per domain (one task per
    // skewed domain); the guarded shape windows the (source, n_chars)
    // histogram — every window spec keeps the source partitioning and a
    // hash aggregate runs below it
    val p = plan("q147_domain_cap")
    val windows = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("source")),
      s"q147 window lost its per-source partitioning:\n$p")
    assert(p.contains("HashAggregate"),
      s"q147 lost the histogram aggregate below the window:\n$p")
    assert(!p.contains("row_number"),
      s"q147 reintroduced a per-doc row_number:\n$p")
  }

  test("q148 diversity: bulk stays scan-local, only the long-doc degrade route shuffles") {
    val p = plan("q148_lexical_diversity")
    assert(!p.contains("Join"), s"q148 planned a join:\n$p")
    // the in-bound bulk is scan-local per-row array work; the only hash
    // exchanges allowed are the degrade route's doc_id-keyed aggregates
    // over the (empty-on-healthy-corpora) long-doc slice
    val hashEx = p.linesIterator
      .filter(l => l.contains("Exchange") &&
        !l.contains("rangepartitioning")).toSeq
    assert(hashEx.forall(_.contains("doc_id")),
      s"q148 shuffles outside the doc_id-keyed degrade route:\n$p")
    // the degrade route exists and is gated on the token bound (the
    // in-array path must never see an over-bound doc, and vice versa)
    assert(p.contains("10000"),
      s"q148 lost its length-bound routing filter:\n$p")
  }

  test("q120's checks stay fused: bounded child-table scans") {
    // every FK check over one child table shares a single flag-pass;
    // lineitem may appear at most 3 times (fused flags, uniqueness,
    // part-reverse key set) — the unfused shape scanned it 6+ times
    val p = plan("q120_referential_integrity")
    val liScans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(liScans <= 3, s"q120 scans lineitem $liScans times:\n$p")
  }

  test("q250 broadcasts the part dim; q253's vocab join back is an equi-join") {
    val p250 = plan("q250_wilson_returns")
    assert(p250.contains("BroadcastHashJoin"),
      s"q250 lost the part-dim broadcast:\n$p250")
    assert(!p250.contains("CartesianProduct") &&
      !p250.contains("BroadcastNestedLoopJoin"), p250)
    val p253 = plan("q253_rare_token_mass")
    assert(p253.contains("HashJoin") || p253.contains("SortMergeJoin"),
      s"q253 vocab join is not an equi-join:\n$p253")
    assert(!p253.contains("CartesianProduct"), p253)
  }

  test("q252's window-pair generator is map-side: no join before the pair groupBy") {
    // pair generation must be the nested transform inside the scan
    // stage — the only joins in the plan are the pair-vocab marginal
    // equi-joins and the 1-row broadcast total
    val p = plan("q252_skipgram_cooc")
    assert(!p.contains("CartesianProduct"), p)
    val corpusJoins = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") && l.contains("doc_id"))
    assert(corpusJoins == 0,
      s"q252 pair generation became a positional self-join:\n$p")
  }
}
