package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR. A warmup pass at sf0.001 first exercises every
  * query's codegen/JIT path (plans are schema-identical across scale
  * factors), so the timed pass measures steady-state throughput rather
  * than first-compile latency.
  *
  * Self-diagnosis (VERDICT r5 #8 — two rounds of driver benches were
  * lost to host-contention windows no median could absorb): the JSON
  * additionally carries per-query BEST-of-reps ("best") and a
  * 2-shuffle scratch-disk probe measured before and after the battery
  * ("probe_pre_sec"/"probe_post_sec"). Reading the artifact: a query
  * whose median is many times its best was hit by a contention window,
  * not a plan change; probe values far above ~1 s (or pre/post
  * disagreeing) mean the shuffle scratch disk or the host was sick for
  * the run.
  *
  * Battery-contention self-adjudication (VERDICT r12 #2 — three
  * consecutive rounds burned a judge/builder session adjudicating
  * phantom e-family "regressions" that an isolated rerun cleared):
  * after the timed battery, the heaviest lines (median ≥ [[RetimeFloorSec]],
  * slowest [[RetimeCap]]) plus any line whose median/best ratio
  * exceeds 2 are re-timed in a QUIESCED pass — caches cleared, heap
  * GC'd, a settle pause, health re-probed — which reproduces the
  * isolated-rerun numbers without a second JVM (the confound is
  * battery-order state: earlier gates' shuffle spill and cache blocks,
  * not the JVM itself). The artifact carries "retimed"/"retimed_best"
  * (the quiet numbers) and "contended" (lines whose battery median
  * exceeds 1.5× their quiet best — read THOSE lines from "retimed",
  * never as regressions). "queries"/"best" stay the raw battery
  * numbers for round-over-round comparability. */
object Bench {

  /** Re-time every battery line at or above this median (seconds) in
    * the quiesced pass — the heavy e/d-family lines where contention
    * artifacts concentrate. */
  val RetimeFloorSec = 1.0
  /** Upper bound on quiesced re-timings per run (slowest-first), so the
    * pass stays a bounded fraction of the battery cost. */
  val RetimeCap = 15

  /** Extra quiesced re-timings granted to the rolling-best net below
    * (on top of [[RetimeCap]]), so a wide contention window cannot
    * starve the heavy-line retimes. */
  val RollingRetimeCap = 10

  /** Rolling-best contention net (VERDICT r18 #5 — the r18 battery
    * flagged only 3 lines while d57/d48/d50/d20 moved 20-70% between
    * same-box runs): the committed per-query quiet-best seconds
    * (`tools/bench_rolling_best.json`, regenerated each optimization
    * round from healthy runs; SPARK_GRAFT_BENCH_ROLLING overrides the
    * path). Any line whose battery median exceeds 1.5× its rolling
    * best joins the quiesced re-time pass — SELECTION ONLY: battery
    * medians in "queries" are untouched, exactly as for the
    * floor/spike selections. Missing or unparseable file = empty map
    * (the net degrades to the r18 behavior, never fails the bench). */
  def rollingBest(): Map[String, Double] = {
    val p = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROLLING",
      "tools/bench_rolling_best.json")
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), java.nio.charset.StandardCharsets.UTF_8)
      val entry = """"([A-Za-z0-9_]+)"\s*:\s*([0-9][0-9.eE+-]*)""".r
      entry.findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble)
        .toMap
    } catch { case _: Throwable => Map.empty }
  }

  /** Fixed 2-shuffle micro-probe (repartition + aggregate over 2M
    * longs): measures per-stage shuffle overhead — scratch-disk and
    * scheduler health — independent of any query's plan. */
  def shuffleProbe(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions.col
    val t0 = System.nanoTime()
    spark.range(0, 2000000, 1, 32)
      .repartition(64, col("id"))
      .groupBy((col("id") % 97).as("k")).count()
      .repartition(32)
      .count()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.withScratch(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_BENCH_ONLY=d19_dedup_clusters,e07_semantic_dedup
    // runs a subset — the isolated-rerun tool the host-noise advisory
    // calls for (NOTES.md): re-measure a suspect line in a fresh JVM
    // without paying for the whole battery.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // SPARK_GRAFT_BENCH_RECALL_ONLY=1 skips the timing battery and
    // reports just the recall section — the cheap way to chart
    // recall-vs-nProbe (with SPARK_GRAFT_NPROBE/FETCH) without paying
    // for 66 timed queries per point.
    val recallOnly = sys.env.get("SPARK_GRAFT_BENCH_RECALL_ONLY").contains("1")
    // ADVICE r8: RECALL_ONLY + BENCH_ONLY together would produce an
    // artifact with neither timings nor recall (the recall section
    // requires a full-battery run). Fail fast instead of emitting a
    // vacuous JSON.
    if (recallOnly && only.nonEmpty) {
      System.err.println(
        "bench: SPARK_GRAFT_BENCH_RECALL_ONLY and SPARK_GRAFT_BENCH_ONLY are mutually exclusive - unset one")
      sys.exit(2)
    }
    // Battery ORDER (VERDICT r13 #4): the known-heavy persist-users
    // run FIRST, on the freshest JVM — alphabetical order put d30
    // after the d19/d29 spill-heavy gates and its battery median read
    // 14× its quiesced time. Heavy-first keeps the battery numbers
    // close to the retimed truth (the retime pass stays the arbiter;
    // this just shrinks its corrections). The rest stay alphabetical
    // for round-over-round comparability.
    val heavyFirst = Seq("d30_dsir_scores", "d19_dedup_clusters",
      "e07_semantic_dedup", "e15_knn_ivfsq_sharded", "e17_knn_opq_sharded",
      "e18_knn_ivfsq_compacted", "e19_knn_ivfsq_rebuilt", "d60_bm25_delta",
      "d54_dedup_keep_best", "d55_lsh_delta_dedup",
      "d29_substring_spans", "e13_knn_ivfsq_verify", "e06_knn_ivfpq_verify",
      "d53_bm25_index", "d14_winnow_overlap", "d23_bloom_decontaminate")
    val names = if (recallOnly) Seq.empty[String]
      else {
        val sel = SparkEntry.queries.keys.toSeq.sorted
          .filter(n => only.forall(_.contains(n)))
        sel.filter(heavyFirst.contains).sortBy(heavyFirst.indexOf) ++
          sel.filterNot(heavyFirst.contains)
      }
    // count() lets Catalyst prune projections and even eliminate a
    // distinct-key outer join under count(*) — a PURE-MAP gate (d22
    // redact, d32 extract, d33 encode) times as scan-only, and d31's
    // join-elimination makes it near-free. That artifact is uniform
    // across rounds (every BENCH_r* used count()), so the default
    // stays count() for comparability; SPARK_GRAFT_BENCH_FULL=1
    // executes each gate's OWN optimized plan to completion
    // (queryExecution.toRdd.count — no column pruning, no driver
    // collect) for honest full-pipeline numbers.
    val full = sys.env.get("SPARK_GRAFT_BENCH_FULL").contains("1")
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      if (full) df.queryExecution.toRdd.count() else df.count(); ()
    }
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { n =>
      try force(SparkEntry.queries(n)(spark, warmDir))
      catch { case _: Throwable => }
    }
    // A failed query must stay visible in the JSON: it is reported as a
    // NEGATIVE duration and listed under "failed" (ADVICE r1 — silently
    // swallowed exceptions let regressions pass the bench gate).
    // Each query runs `reps` times and reports the MEDIAN, so a single
    // GC pause or page-cache miss cannot fake a 12× regression
    // (VERDICT r2: the driver-env d09 "regression" was one noisy rep).
    val reps = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    // Refuse-and-retry on a sick host (VERDICT r6 #6): a probe far
    // above ~1 s means scratch-disk/scheduler contention no per-query
    // median can measure through (r6's driver run: probe_pre 65.3 s,
    // every line garbage). Wait the window out — up to 3 × 60 s —
    // before the battery; if it never clears, the JSON says so
    // ("unhealthy":true) and must not be read as a regression signal.
    // Recall-only mode skips the wait loop (ADVICE r8): recall is a
    // set-intersection quality number, not a timing — a slow scratch
    // disk cannot change it, so paying up to 3x60 s before a
    // recall-curve point is pure waste. One probe still runs so the
    // artifact records host health — but recall-only has no warmup
    // battery before it, so discard a first probe that would otherwise
    // measure first-job JIT/codegen (~5 s in a fresh JVM) as "sickness".
    if (recallOnly) shuffleProbe(spark)
    var probePre = shuffleProbe(spark)
    var probeRetries = 0
    while (!recallOnly && probePre > 5.0 && probeRetries < 3) {
      System.err.println(
        f"bench: scratch probe $probePre%.1f s (healthy ~1 s) - waiting 60 s for the contention window to pass")
      Thread.sleep(60000)
      probePre = shuffleProbe(spark)
      probeRetries += 1
    }
    // Soft warning band (VERDICT r8 "what's wrong" #2): a ~2x-slow box
    // inflates every line uniformly without tripping the 5 s refuse
    // threshold; flag it on stderr so nobody reads uniform inflation
    // as a regression. The hard threshold stays at 5 s.
    if (probePre > 1.5 && probePre <= 5.0)
      System.err.println(
        f"bench: scratch probe $probePre%.2f s is above the ~0.85 s healthy band - timings may be uniformly inflated (not a plan regression)")
    val results = names.map { name =>
      // Per-query isolation: drop every cached/persisted frame left over
      // from earlier queries (index builds, bounded shingle persists) so
      // each query is graded on its own plan, not on heap history —
      // VERDICT r3: e05's index-build reps inflated the next queries'
      // driver-measured times 3-6× while a fresh JVM measured them fine.
      spark.catalog.clearCache()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { force(SparkEntry.queries(name)(spark, sfDir)); true }
          catch { case e: Throwable =>
            System.err.println(s"bench: query $name FAILED: ${e.getMessage}")
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        if (ok) sec else -sec
      }
      val anyFailed = times.exists(_ < 0)
      val abs = times.map(math.abs).sorted
      // lower median ((reps-1)/2): same element for odd reps, the
      // BETTER of two for reps=2 (review r9 — the upper element read
      // systematically pessimistic vs every 3-rep round)
      val median = abs((reps - 1) / 2)
      // best must come from SUCCESSFUL reps only: a fail-fast rep's
      // elapsed time is not a best-case plan time, and it corrupted
      // the median-vs-best contention diagnostic (review r9)
      val okBest = times.filter(_ >= 0).minOption.getOrElse(abs.head)
      (name, if (anyFailed) -median else median, okBest)
    }
    val probePost = shuffleProbe(spark)
    // Quiesced re-timing pass (VERDICT r12 #2). Selection: every line
    // whose battery median is ≥ RetimeFloorSec (capped at the RetimeCap
    // slowest — the e-family confound always lands here) plus any line
    // with median/best > 2 (a mid-battery contention window). Skipped
    // on subset runs (already isolated by construction) and for failed
    // lines (a failure retimes as a failure).
    val retimeSet: Seq[String] =
      if (only.nonEmpty) Seq.empty
      else {
        val heavy = results.filter(r => r._2 >= RetimeFloorSec)
          .sortBy(-_._2).take(RetimeCap).map(_._1)
        val spiky = results.collect {
          case (k, med, best) if med > 0 && best > 0 && med / best > 2.0 => k
        }
        // rolling-best net (r19): lines far above their committed
        // quiet best get adjudicated too, worst overshoot first
        val rb = rollingBest()
        val rolling = results.collect {
          case (k, med, _) if med > 0 &&
            rb.get(k).exists(b => b > 0 && med > 1.5 * b) =>
            k -> (med / rb(k))
        }.sortBy(-_._2).take(RollingRetimeCap).map(_._1)
        (heavy ++ spiky ++ rolling).distinct
      }
    val probeRetime =
      if (retimeSet.isEmpty) -1.0
      else {
        spark.catalog.clearCache()
        System.gc()
        Thread.sleep(2000) // let spill reclaim / page flush settle
        shuffleProbe(spark)
      }
    val retimed: Seq[(String, Double, Double)] = retimeSet.map { name =>
      spark.catalog.clearCache()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { force(SparkEntry.queries(name)(spark, sfDir)); true }
          catch { case _: Throwable => false }
        val sec = (System.nanoTime() - t0) / 1e9
        if (ok) sec else -sec
      }
      val abs = times.map(math.abs).sorted
      val med = abs((reps - 1) / 2)
      val best = times.filter(_ >= 0).minOption.getOrElse(abs.head)
      (name, if (times.exists(_ < 0)) -med else med, best)
    }
    // contended = the battery reading was battery-order state, not the
    // plan: the quiet best undercuts the battery median by > 1.5×.
    val batteryMed = results.map(r => r._1 -> r._2).toMap
    val contendedNames = retimed.collect {
      case (k, med, best) if med > 0 && best > 0 &&
        batteryMed.getOrElse(k, 0.0) / best > 1.5 => k
    }
    // ANN quality gate (VERDICT r7 #1): e02/e05/e10 are rows-only
    // correctness gates (engine-hash-by-design), so recall@5 against
    // e01's exact brute-force top-5 is their ONLY quality signal — and
    // until now it lived in ScaleBench stdout + PqSpec, artifacts the
    // driver never grades. Carry it in the bench JSON with the PqSpec
    // production floor as pass/fail: a gate below floor lands in
    // "failed", so an ANN quality regression fails the driver-read
    // artifact, not just a spec someone must run. Skipped on
    // SPARK_GRAFT_BENCH_ONLY subset runs (e01 may be absent).
    // Per-gate floors (VERDICT r8 #1): the flat 0.3 floor was lenient
    // enough that a real quality regression (0.56 -> 0.31) would still
    // pass. With e05/e10 defaults at fetch=100 (recall ~0.9 on the
    // NOTES knob curve) the floors can carry real teeth: a regression
    // to the old fetch=30 quality level (0.44/0.46) now FAILS the
    // driver-read artifact.
    // VERDICT r14 #6: e02's 0.5 floor sat 0.3 below its measured 0.80
    // (three rounds running) — too slack to catch a real regression.
    // Floors now sit within ~0.1 of steady-state (0.80/0.92/0.90).
    val recallFloors = Map(
      "e02_knn_ivf" -> 0.7,
      "e05_knn_ivfpq" -> 0.8,
      "e10_knn_opq_ivfpq" -> 0.8)
    def floorFor(g: String) = recallFloors.getOrElse(g, 0.3)
    def runRecall(): Seq[(String, Double)] =
      try {
        spark.catalog.clearCache()
        def topSet(name: String) =
          SparkEntry.queries(name)(spark, sfDir).select("qid", "id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
        val exact = topSet("e01_knn_brute")
        // an empty exact set would make recall 0/0 = NaN — not legal
        // JSON; report -1 (below any floor) so the artifact stays
        // parseable and the gate still fails loudly
        require(exact.nonEmpty, "e01_knn_brute returned no rows")
        Seq("e02_knn_ivf", "e05_knn_ivfpq", "e10_knn_opq_ivfpq").map { g =>
          g -> exact.intersect(topSet(g)).size.toDouble / exact.size
        }
      } catch { case e: Throwable =>
        System.err.println(s"bench: recall section FAILED: ${e.getMessage}")
        Seq("recall_section" -> -1.0)
      }
    val recall: Seq[(String, Double)] =
      if (only.isEmpty) runRecall() else Seq.empty
    // Second recall point at the LIBRARY-DEFAULT config (VERDICT r9
    // ask #2; re-anchored by VERDICT r12 #3): nprobe "lib" = query()'s
    // half-cell default AND fetch "lib" = query()'s auto-rerank
    // default (max(20k, 100)) — the exact out-of-the-box operating
    // point a defaults-taking user gets, no synthetic reference knobs.
    // The gate numbers stay 80% probe / fetch 100; floors grade ONLY
    // the gate config. Skipped when the user already overrode a knob —
    // via env OR a pre-set system property (review r11: knobVal reads
    // props FIRST, so a pre-set prop would both be shadowed by this
    // pass and misreport as "default") — and any pre-existing prop
    // value is restored, not deleted.
    val knobEnvSet = Seq("SPARK_GRAFT_NPROBE", "SPARK_GRAFT_FETCH")
      .exists(e => sys.env.get(e).exists(_.trim.nonEmpty))
    val knobPropSet = Seq("graft.bench.nprobe", "graft.bench.fetch")
      .exists(p => sys.props.get(p).exists(_.trim.nonEmpty))
    val recallProd: Seq[(String, Double)] =
      if (only.isEmpty && !knobEnvSet && !knobPropSet) {
        val prior = Seq("graft.bench.nprobe", "graft.bench.fetch")
          .map(p => p -> sys.props.get(p))
        sys.props("graft.bench.nprobe") = "lib"
        sys.props("graft.bench.fetch") = "lib"
        try runRecall()
        finally prior.foreach {
          case (p, Some(v)) => sys.props(p) = v
          case (p, None) => sys.props.remove(p)
        }
      } else Seq.empty
    // Self-describing knobs (ADVICE r8): the recall gates honor
    // SPARK_GRAFT_NPROBE/FETCH, so a knob-tuned run could silently mask
    // a default-config regression. Record the effective values in the
    // artifact; the driver grades runs with both "default".
    // escape env-derived strings: a quote/backslash in a knob value or
    // the sf dir would otherwise corrupt the whole durable artifact
    // (review r9)
    def jEsc(v: String) = v.replace("\\", "\\\\").replace("\"", "\\\"")
    // props outrank env in Pipeline.knobVal, so the artifact must
    // report the same precedence or a -D-tuned run grades as
    // default-config (review r11 — the ADVICE r8 masking, reopened
    // through the property side door)
    def knob(env: String, prop: String) =
      sys.props.get(prop).orElse(sys.env.get(env))
        .map(_.trim).filter(_.nonEmpty)
        .map("\"" + jEsc(_) + "\"").getOrElse("\"default\"")
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val best = results.map { case (k, _, b) => "\"" + k + "\":" + b }
      .mkString("{", ",", "}")
    val failedNames = results.collect { case (k, v, _) if v < 0 => k } ++
      recall.collect { case (k, r) if r < floorFor(k) => s"recall:$k" }
    val failed = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val recallJson = recall.map { case (k, r) => "\"" + k + "\":" + r }
      .mkString("{", ",", "}")
    val recallProdJson = recallProd.map { case (k, r) => "\"" + k + "\":" + r }
      .mkString("{", ",", "}")
    val floorsJson = recall.map { case (k, _) => "\"" + k + "\":" + floorFor(k) }
      .mkString("{", ",", "}")
    val retimedJson = retimed.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val retimedBestJson = retimed.map { case (k, _, b) => "\"" + k + "\":" + b }
      .mkString("{", ",", "}")
    val contendedJson = contendedNames.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val total = results.map(r => math.abs(r._2)).sum
    val unhealthy = probePre > 5.0 || probePost > 5.0
    // probe_ratio: worst probe over the ~0.85 s healthy median of past
    // judge sessions — a reader can divide any timing by this to
    // normalize away uniform host slowness (VERDICT r8 #2).
    val probeRatio = math.max(probePre, probePost) / 0.85
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"best":$best,"failed":$failed,"reps":$reps,"recall_at5":$recallJson,"recall_at5_prod":$recallProdJson,"recall_floors":$floorsJson,"knob_nprobe":${knob("SPARK_GRAFT_NPROBE", "graft.bench.nprobe")},"knob_fetch":${knob("SPARK_GRAFT_FETCH", "graft.bench.fetch")},"retimed":$retimedJson,"retimed_best":$retimedBestJson,"contended":$contendedJson,"probe_pre_sec":$probePre,"probe_post_sec":$probePost,"probe_retime_sec":$probeRetime,"probe_ratio":$probeRatio,"probe_retries":$probeRetries,"unhealthy":$unhealthy,"sf":"${jEsc(sfDir)}"}"""
    println(json)
    // Artifact durability (VERDICT r7 #3): the r7 driver harness
    // captured only the tail of stdout, losing "best" and the early
    // query medians. Persist the same line to a file so a
    // stdout-truncating harness can never lose it.
    // absolute default: a harness may launch Bench from any CWD, and a
    // relative path would then land outside the repo
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/target/bench_latest.json")
    val wrote =
      try {
        val f = new java.io.File(outPath)
        Option(f.getParentFile).foreach(_.mkdirs())
        val w = new java.io.PrintWriter(f, "UTF-8")
        try w.println(json) finally w.close()
        true
      } catch { case e: Throwable =>
        System.err.println(s"bench: could not write $outPath: ${e.getMessage}")
        false
      }
    // Compact battery summary as the LAST stdout line (VERDICT r15 #4,
    // second repeat of r14 #8): the full artifact is one ~6 KB line
    // that overflows the driver's stdout-tail capture, so BENCH_r14/r15
    // committed with "parsed": null. The tail line carries the driver
    // contract keys (metric/value/unit/queries/sf) with "queries"
    // limited to the 10 slowest lines, plus health + the full-artifact
    // path — small enough that any tail window parses it.
    val top10 = results.sortBy(r => -math.abs(r._2)).take(10)
      .map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val summary = s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"queries":$top10,"failed":$failed,"probe_ratio":$probeRatio,"unhealthy":$unhealthy,"full_json":${if (wrote) "\"" + jEsc(outPath) + "\"" else "null"},"sf":"${jEsc(sfDir)}"}"""
    println(summary)
    // The summary FILE carries the FULL per-query dict plus the
    // retime/contention diagnostics (VERDICT r18 #2: two rounds of
    // driver PERF comparisons were lost because only the top-10
    // compact line survived the stdout-tail window; a file has no
    // line-length constraint). Purely ADDITIVE: the stdout compact
    // line above is byte-compatible with every prior round, and
    // "queries" in the FILE is the same full dict the durable artifact
    // (full_json) has always carried.
    val summaryFull = s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"queries":$qs,"best":$best,"failed":$failed,"reps":$reps,"retimed":$retimedJson,"retimed_best":$retimedBestJson,"contended":$contendedJson,"recall_at5":$recallJson,"recall_at5_prod":$recallProdJson,"probe_ratio":$probeRatio,"unhealthy":$unhealthy,"full_json":${if (wrote) "\"" + jEsc(outPath) + "\"" else "null"},"sf":"${jEsc(sfDir)}"}"""
    // File-based handshake (VERDICT r16 #4, third round of the
    // "parsed": null symptom): the tail line above parses as JSON but
    // arrives through sbt with an "[info] " prefix the driver's parser
    // evidently chokes on. The SAME summary also lands in a fixed file
    // via write-temp + atomic rename, so the handshake no longer
    // depends on stdout cosmetics at all.
    try {
      // cwd-relative fallback (ADVICE r17): the bench runs from the
      // build tree, so the default lands in ITS target dir on any
      // machine instead of a hardcoded absolute path
      val sumPath = sys.env.get("SPARK_GRAFT_BENCH_SUMMARY")
        .map(java.nio.file.Paths.get(_))
        .getOrElse(java.nio.file.Paths.get("target", "bench_summary.json"))
      Option(sumPath.getParent).foreach(p =>
        java.nio.file.Files.createDirectories(p))
      val tmp = sumPath.resolveSibling(sumPath.getFileName.toString + ".tmp")
      java.nio.file.Files.write(tmp,
        (summaryFull + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, sumPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch { case e: Throwable =>
      System.err.println(s"bench: could not write summary file: ${e.getMessage}")
    }
    spark.stop()
  }
}
