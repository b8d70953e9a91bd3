package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // layout-adaptive scan-parallelism floor (Tables.maybeSpread):
      // single-row-group fixture scans would otherwise pin every narrow
      // per-row operator to one core regardless of SPARK_GRAFT_CPUS
      .config("spark.graft.scan.autoParallelize",
        sys.env.getOrElse("SPARK_GRAFT_SCAN_SPREAD", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the shared machinery (JVM, parquet reader, shuffle, codegen
    // pipeline) on a small representative job so the fixed startup cost is
    // not attributed to whichever query happens to run first.
    locally {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
        .join(li.limit(1), Seq("l_returnflag"), "left")
        .write.mode("overwrite").format("noop").save()
    }
    // noop sink forces FULL evaluation of every output column — a bare
    // count() would let Catalyst prune projection-only work (e.g. pure
    // string/scalar queries would measure nothing).
    // a failed query records -1 (not its crash latency) so a regression
    // into an exception can never read as a speedup in the emitted JSON
    //
    // Each query runs ITERS times and reports the per-query MIN: a single
    // contended run on a shared machine can inflate one query by 10×+
    // (observed: 3.7 s reproducible vs 16.8 s recorded), and min-of-N is
    // the standard noise-robust latency estimator when the noise is purely
    // additive (GC pause, CPU contention, page-cache miss). clearCache
    // between iterations keeps every iteration cold at the Spark level
    // (q31/q33/q34 persist feature tables), so the min measures the query,
    // not a cache hit.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    // SPARK_GRAFT_BENCH_ONLY=q03,q55 — comma-separated name prefixes for
    // targeted profiling runs; unset (the driver's mode) runs everything.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only match {
      case Some(prefixes) =>
        SparkEntry.queries.filter { case (n, _) => prefixes.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    // Contention canary: a fixed IO-free CPU job (hash-reduce over an
    // in-memory range) timed before the stage builders and again before
    // each query's iteration batch. Its known-idle cost is ~0.05-0.1 s
    // at 32 threads (BASELINE.md records the box's value); a record whose
    // canary median/max sit far above that is CONTENDED and says so
    // itself — min-of-3 rejects transient spikes but not a box that is
    // oversubscribed for the whole run (the r8 driver record needed a
    // judge re-bench to refute 6 false regressions; this stamps the
    // record instead).
    val canaryTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    // Allocation/bandwidth canary: the r11 driver record inflated q128 8×
    // (and q62/q83 2-4×) while the xxhash canary read 0.073 = idle — the
    // xxhash loop is CACHE-RESIDENT compute, blind to a co-tenant
    // saturating memory bandwidth / the allocator, which is exactly what
    // an expression-heavy regex/string fold like q128's BPE aggregate()
    // pays for. This second probe is allocation-shaped on purpose
    // (string concat + regexp_replace + split over 100k rows ≈ 40 ms
    // idle at 32 threads): a record where canary_alloc's median/max sit
    // far above its known-idle floor while the CPU canary stays clean is
    // bandwidth/allocator-contended — the state the r11 artifact left
    // unlabeled. Sampled every 4th unit to keep the run overhead ~1%.
    val canaryAllocTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    var canaryCalls = 0
    def canary(): Unit = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      // bit_xor, not sum: ANSI mode makes a 16M-term long sum overflow
      spark.range(0, 1L << 24, 1, cpus.toInt)
        .select(bit_xor(xxhash64(col("id"))))
        .write.mode("overwrite").format("noop").save()
      canaryTimes += (System.nanoTime() - t0) / 1e9
      canaryCalls += 1
      if (canaryCalls % 4 == 1) {
        val t1 = System.nanoTime()
        spark.range(0, 100000, 1, cpus.toInt)
          .select(bit_xor(xxhash64(expr(
            "split(regexp_replace(concat('x', id, 'y', id), '(.)', '$1 ')," +
              " ' ')[4]"))))
          .write.mode("overwrite").format("noop").save()
        canaryAllocTimes += (System.nanoTime() - t1) / 1e9
      }
    }
    // Memory-pressure canary: the CPU canary cannot see HEAP contention —
    // the r9 driver record carried a healthy canary (median 0.105) yet
    // q73 read 6.98 s vs a 1.25 s idle re-bench, because a full 153-query
    // run on the default 8 g heap accumulates GC/eviction pressure the
    // per-unit CPU probe never touches. So alongside each unit's time we
    // record the JVM's cumulative-GC-time DELTA for the iteration that
    // produced the reported min (if even the best-of-3 iteration paid
    // heavy GC, the pressure is sustained, not transient), plus run-wide
    // heap stats. Units whose min iteration spent >25% of its wall time
    // in GC are stamped into gc_suspects and flip contended_by_gc — the
    // record self-labels its q73-class inflation instead of needing a
    // judge re-bench. Full-registry runs should export
    // SPARK_DRIVER_MEM=32g (build.sbt wires it to -Xmx); BASELINE.md
    // records both contracts.
    val gcBeans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans
    def gcSeconds(): Double = {
      var s = 0L
      val it = gcBeans.iterator()
      while (it.hasNext) { val t = it.next().getCollectionTime
        if (t > 0) s += t }
      s / 1e3
    }
    val memBean = java.lang.management.ManagementFactory.getMemoryMXBean
    var heapUsedMax = 0.0
    def sampleHeap(): Unit = {
      val gb = memBean.getHeapMemoryUsage.getUsed / 1e9
      if (gb > heapUsedMax) heapUsedMax = gb
    }
    // Shared pinned stages (StageCache) are charged as their OWN units,
    // derived cold up front: previously whichever consumer query ran
    // first absorbed the whole derivation (r7: q123 0.20→3.49 s while
    // q31 rode the pin at 0.14 s), so per-query times depended on run
    // order. With the stage cost explicit, every consumer measures only
    // its own work and the record is stable under query reordering.
    // Builders materialize eagerly (localCheckpoint(true)), so calling
    // them IS the derivation. Skipped under SPARK_GRAFT_BENCH_ONLY
    // unless a selected query consumes them. Consumer sets are FULL
    // query names matched exactly against the selected set (prefix
    // matching made `SPARK_GRAFT_BENCH_ONLY=q30` derive the band stage
    // via the q3 prefix family — misleading for targeted profiling).
    ops.StageCache.clearAll()
    // ANN index-artifact stages come FIRST and before stage_knn_edges:
    // knn_edges consumes ann_ivf_assign, so list order keeps each unit
    // charged with only its own derivation
    val stageBuilders: Seq[(String, Set[String], () => Unit)] = Seq(
      ("stage_ann_lsh_assign",
        Set("q36_ann_lsh", "q37_cosine_neardup", "q68_multiprobe_ann",
          "q104_ann_recall"),
        () => { ops.SimOps.lshAssignment(spark, sfDir); () }),
      ("stage_ann_ivf_assign",
        Set("q47_ivf_ann", "q104_ann_recall", "q130_knn_graph",
          "q132_graph_rank"),
        () => { ops.SimOps.ivfAssignment(spark, sfDir); () }),
      ("stage_ann_pq_codes", Set("q79_pq_adc", "q104_ann_recall"),
        () => { ops.SimOps.pqCodes(spark, sfDir); () }),
      ("stage_ann_ivfpq_codes", Set("q80_ivfpq_ann", "q104_ann_recall"),
        () => { ops.SimOps.ivfPqCodes(spark, sfDir); () }),
      ("stage_attr_heuristic",
        Set("q25_text_quality", "q133_filter_ensemble",
          "q157_budget_admission", "q158_ks_drift", "q159_calibration",
          "q160_rater_agreement", "q161_source_auc"),
        () => { ops.TextOps.attrHeuristic(spark, sfDir); () }),
      ("stage_attr_model",
        Set("q109_quality_model", "q133_filter_ensemble",
          "q159_calibration", "q160_rater_agreement", "q161_source_auc",
          "q265_length_bias"),
        () => { ops.TextOps.attrModel(spark, sfDir); () }),
      ("stage_attr_fluency",
        Set("q129_bigram_lm", "q133_filter_ensemble"),
        () => { ops.TextOps.attrFluency(spark, sfDir); () }),
      ("stage_band_candidates",
        Set("q31_minhash_pairs", "q60_dedup_groups", "q102_cluster_canonical",
          "q116_triad_census", "q123_containment", "q156_cluster_tightness",
          "q162_split_leakage", "q163_cluster_split",
          "q164_source_shrinkage", "q166_dup_flow",
          "q174_threshold_sweep", "q183_dedup_recall",
          "q230_dedup_quality_uplift", "q258_inbatch_collisions",
          "q269_kcore", "q280_pagerank", "q282_assortativity"),
        () => { ops.DedupOps.bandCandidates(spark, sfDir); () }),
      ("stage_cc_labels",
        Set("q60_dedup_groups", "q102_cluster_canonical",
          "q156_cluster_tightness", "q163_cluster_split",
          "q164_source_shrinkage", "q166_dup_flow",
          "q230_dedup_quality_uplift", "q258_inbatch_collisions"),
        () => { ops.DedupOps.ccLabels(spark, sfDir); () }),
      ("stage_knn_edges", Set("q130_knn_graph", "q132_graph_rank"),
        () => { ops.SimOps.knnEdges(spark, sfDir); () }))
    // every declared consumer must be a real registry query — a renamed
    // query would otherwise silently stop deriving its stage
    stageBuilders.foreach { case (st, consumers, _) =>
      val unknown = consumers.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty, s"$st consumers not in registry: $unknown")
    }
    // SPARK_GRAFT_BENCH_STAGES_COLD=1 — the isolated cold-stage record:
    // this fork IS a fresh JVM, so each builder's one-shot time here is
    // its true cold derivation cost after only the shared warm-up job —
    // no 150-query session behind it. The in-drive stages_cold numbers
    // absorb whole-session state (BASELINE.md r9: attr_fluency 57.6 s
    // recorded in-drive vs 9.5 s isolated); this mode pins the honest
    // number once per round without burdening the full record's runtime.
    if (sys.env.get("SPARK_GRAFT_BENCH_STAGES_COLD").contains("1")) {
      ops.StageCache.clearAll()
      val cold = stageBuilders.map { case (name, _, run) =>
        canary()
        val gc0 = gcSeconds()
        val t0 = System.nanoTime()
        val ok = try { run(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false }
        val elapsed = (System.nanoTime() - t0) / 1e9
        (name, if (ok) elapsed else -1.0, gcSeconds() - gc0)
      }
      val cs0 = canaryTimes.sorted
      val json =
        s"""{"metric":"stages_cold_isolated","unit":"sec","stages":""" +
          cold.map { case (n, t, _) => s"\"$n\":$t" }
            .mkString("{", ",", "}") +
          s""","stages_gc":""" +
          cold.map { case (n, _, g) => s"\"$n\":" + f"$g%.3f" }
            .mkString("{", ",", "}") +
          s""","canary":{"n":${cs0.size},"min":${cs0.head},""" +
          s""""median":${cs0(cs0.size / 2)},"max":${cs0.last}},""" +
          s""""sf":"$sfDir"}"""
      println(json)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_stages_cold.json"), json + "\n")
      spark.stop()
      return
    }
    val selectedNames = selected.keySet
    // Stage units are timed min-of-ITERS like queries: a one-shot cold
    // charge has NO contention rejection, and a single noisy window
    // during the ~minute of stage derivations inflated one stage 6×
    // in a full-run record (isolated re-run 9.5 s vs 57.6 s recorded —
    // the same false-regression class min-of-3 already fixes for
    // queries). Between iterations only THIS stage's pin is evicted
    // (`StageCache.clear`), so a stage consuming an upstream stage
    // (knn_edges → ann_ivf_assign) still measures only its own work;
    // after the last iteration the pin stays live for the consumers.
    val stageResults = stageBuilders
      .filter { case (_, consumers, _) => consumers.exists(selectedNames) }
      .map { case (name, _, run) =>
        val cacheKey = name.stripPrefix("stage_")
        val times = scala.collection.mutable.ArrayBuffer.empty[Double]
        val gcs = scala.collection.mutable.ArrayBuffer.empty[Double]
        var failed = false
        var i = 1
        while (i <= iters && !failed) {
          // a failed evict means this iteration would time a CACHE HIT
          // and report a near-zero min — fail loudly instead (only
          // reachable after a successful derivation, so the pin exists)
          if (i > 1) require(ops.StageCache.clear(sfDir, cacheKey),
            s"$name did not pin cache key '$cacheKey' - unit/key drift")
          canary(); sampleHeap()
          val gc0 = gcSeconds()
          val t0 = System.nanoTime()
          val ok = try { run(); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              false }
          val elapsed = (System.nanoTime() - t0) / 1e9
          if (ok) { times += elapsed; gcs += gcSeconds() - gc0 }
          else failed = true
          sampleHeap()
          i += 1
        }
        // head of the UNSORTED buffer = iteration 1 = the true cold
        // per-session derivation cost (JIT + codegen + data), which the
        // min deliberately rejects as noise; emitted as stages_cold so
        // the record keeps the cold-accounting story (BASELINE.md r9
        // attr A/B) while the headline min stays contention-robust
        val gcOfMin = if (failed) -1.0 else gcs(times.indexOf(times.min))
        name -> (if (failed) (Seq(-1.0), -1.0, -1.0)
                 else (times.sorted.toSeq, times.head, gcOfMin))
      }
    val stagesCold = stageResults.map { case (n, (_, cold, _)) => n -> cold }
    val queryResults = selected.map { case (name, fn) =>
      canary(); sampleHeap()
      val runs = (1 to iters).map { _ =>
        val gc0 = gcSeconds()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        // elapsed is read BEFORE clearCache so the unpersist cost of
        // feature-table caches (q31/q33/q34) is not billed to the query
        val elapsed = (System.nanoTime() - t0) / 1e9
        val gcDelta = gcSeconds() - gc0
        spark.catalog.clearCache()
        sampleHeap()
        (if (ok) elapsed else -1.0, gcDelta)
      }
      val times = runs.map(_._1)
      // any failed iteration poisons the query to -1 (never report a min
      // computed over a partial/failed set)
      val gcOfMin = if (times.exists(_ < 0)) -1.0
                    else runs(times.indexOf(times.min))._2
      name -> (if (times.exists(_ < 0)) (Seq(-1.0), gcOfMin)
               else (times.sorted, gcOfMin))
    }
    val gcByUnit =
      stageResults.map { case (n, (_, _, g)) => n -> g } ++
        queryResults.map { case (n, (_, g)) => n -> g }
    val results = stageResults.map { case (n, (t, _, _)) => n -> t }.toMap ++
      queryResults.map { case (n, (t, _)) => n -> t }
    def fmt(pick: Seq[Double] => Double): String = results
      .map { case (k, v) => s"\"" + k + "\":" + pick(v) }
      .mkString("{", ",", "}")
    val qs = fmt(_.head) // per-query MIN — the driver's headline record
    // median alongside min makes a contended record self-diagnosing: a
    // big median/min spread says "box noise", min≈median says "real
    // cost" — no re-run needed to adjudicate (the r5 lesson, where a
    // 5.5 s outlier took a judge re-bench to refute)
    val med = fmt(v => v(v.size / 2))
    // a crashed query records -1 per-query but must NEVER shrink the
    // headline total (a broken round would read as a faster round) —
    // sum only the passing mins and surface the failures explicitly
    val failed = results.collect { case (k, v) if v.head < 0 => k }.toSeq.sorted
    val total = results.values.map(_.head).filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // canary summary: one sample per unit, spread across the whole run —
    // min = the box's achievable floor, median/max = sustained contention
    val cs = canaryTimes.sorted
    val canaryJson =
      if (cs.isEmpty) "null"
      else s"""{"n":${cs.size},"min":${cs.head},""" +
        s""""median":${cs(cs.size / 2)},"max":${cs.last}}"""
    val ca = canaryAllocTimes.sorted
    val canaryAllocJson =
      if (ca.isEmpty) "null"
      else s"""{"n":${ca.size},"min":${ca.head},""" +
        s""""median":${ca(ca.size / 2)},"max":${ca.last}}"""
    val stagesColdJson = stagesCold
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Self-labeling weather report (VERDICT r12 #4): the alloc canary is
    // the probe that actually catches the IO/page-cache/allocator
    // contention class (the CPU canary reads identical either way — the
    // r12 driver record had cpu 0.33 = idle while alloc sat at 1.35 vs
    // the 0.79 idle floor and q112/q96/q36 inflated 2-4×). A record
    // whose alloc-canary median exceeds 1.5× the known-idle floor is
    // stamped contended_by_alloc so consumers stop diffing canary
    // medians by hand. Floor is box-specific — override with
    // SPARK_GRAFT_ALLOC_FLOOR when benching elsewhere.
    val allocFloor = sys.env.getOrElse("SPARK_GRAFT_ALLOC_FLOOR", "0.8")
      .toDouble
    val contendedByAlloc = ca.nonEmpty && ca(ca.size / 2) > 1.5 * allocFloor
    // GC stamp: per-unit GC seconds spent during the iteration that
    // produced the reported min, a suspect list (units whose min paid
    // >25% of its wall time in GC, ignoring sub-0.5 s units where one
    // young-gen pause dominates any ratio), and run-wide heap stats.
    // contended_by_gc=true means per-unit numbers in THIS record may be
    // heap-pressure-inflated — rerun with a larger SPARK_DRIVER_MEM
    // before reading them as regressions.
    val gcJson = gcByUnit
      .map { case (k, v) => s"\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val gcSuspects = gcByUnit.collect { case (k, g)
      if g >= 0 && results(k).head >= 0.5 && g > 0.25 * results(k).head => k
    }.toSeq.sorted
    val gcSuspectsJson = gcSuspects.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val heapJson =
      f"""{"used_max_gb":$heapUsedMax%.2f,""" +
        f""""limit_gb":${Runtime.getRuntime.maxMemory / 1e9}%.2f,""" +
        f""""gc_total_sec":${gcSeconds()}%.1f}"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""queries_median":$med,"stages_cold":$stagesColdJson,""" +
        s""""canary":$canaryJson,"canary_alloc":$canaryAllocJson,""" +
        s""""queries_gc":$gcJson,"gc_suspects":$gcSuspectsJson,""" +
        s""""contended_by_gc":${gcSuspects.nonEmpty},""" +
        s""""alloc_floor":$allocFloor,""" +
        s""""contended_by_alloc":$contendedByAlloc,""" +
        s""""contended":${contendedByAlloc || gcSuspects.nonEmpty},""" +
        s""""heap":$heapJson,""" +
        s""""failed":${failed.size},""" +
        s""""failed_names":$failedJson,"sf":"$sfDir"}"""
    println(json)
    // also persist the record: the driver captures stdout through a tail
    // window that has truncated ~20 of 84 per-query timings in a round —
    // the file survives regardless of capture-buffer size
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), json + "\n")
    spark.stop()
  }
}
