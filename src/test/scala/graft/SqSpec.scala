package graft

import org.apache.spark.sql.functions._

import graft.ops.{Similarity, Sq, SqModel}

/** Scalar quantization (SQ8): min/max training, encode bounds, clamp
  * and zero-width edges, partition invariance, and compressed-domain
  * kNN quality vs brute force (gates e11/e12 prove encode and search
  * against the DuckDB oracle bit-for-bit). */
class SqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("train: per-dimension min/max match a driver-side scan exactly") {
    val model = Sq.train(emb, "vec")
    assert(model.dim == 64)
    val rows = emb.select(col("vec").cast("array<double>"))
      .as[Seq[Double]].collect()
    for (d <- 0 until 64) {
      assert(model.vmin(d) == rows.map(_(d)).min)
      assert(model.vmax(d) == rows.map(_(d)).max)
    }
    assert((0 until 64).forall(d => model.vmin(d) < model.vmax(d)))
  }

  // codes store as SIGNED tinyints (one Tungsten byte per dim — the
  // realized 4×); the unsigned value is (b & 0xff)
  private def unsigned(codes: Seq[Byte]): Seq[Int] = codes.map(_ & 0xff)

  test("encode: recon error bounded by half a quantization step per dim") {
    val model = Sq.train(emb, "vec")
    val rows = Sq.encode(emb, "vec", model)
      .select(col("vec").cast("array<double>").as("v"), col("codes"))
      .as[(Seq[Double], Seq[Byte])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (v, raw) =>
      val codes = unsigned(raw)
      assert(codes.length == 64)
      for (d <- 0 until 64) {
        val step = (model.vmax(d) - model.vmin(d)) / 255.0
        val recon = model.vmin(d) + codes(d) * step
        assert(codes(d) >= 0 && codes(d) <= 255)
        // floor(r*255 + 0.5) is round-half-up: |x - recon| <= step/2
        assert(math.abs(v(d) - recon) <= step / 2.0 + 1e-12,
          s"dim $d: x=${v(d)} recon=$recon step=$step")
      }
    }
  }

  test("codes are byte-typed (the 4x memory claim holds in Tungsten, " +
      "not just parquet)") {
    val model = Sq.train(emb, "vec")
    val dt = Sq.encode(emb, "vec", model).schema("codes").dataType
    assert(dt == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.ByteType, containsNull = false), s"got $dt")
  }

  test("encode: out-of-range inputs clamp to 0/255; zero-width dim codes 0") {
    // model over a fixed 2-dim corpus: dim0 spans [0, 10], dim1 constant
    val train = Seq((1L, Seq(0.0, 7.0)), (2L, Seq(10.0, 7.0)))
      .toDF("id", "vec")
    val model = Sq.train(train, "vec")
    assert(model.vmin(0) == 0.0 && model.vmax(0) == 10.0)
    assert(model.vmin(1) == 7.0 && model.vmax(1) == 7.0)
    val probe = Seq((3L, Seq(-99.0, 123.0)), (4L, Seq(999.0, -1.0)),
      (5L, Seq(5.0, 7.0))).toDF("id", "vec")
    val got = Sq.encode(probe, "vec", model)
      .select("id", "codes").as[(Long, Seq[Byte])].collect().toMap
      .view.mapValues(unsigned).toMap
    assert(got(3L) == Seq(0, 0))   // below range clamps; constant dim -> 0
    assert(got(4L) == Seq(255, 0)) // above range clamps (255 = byte -1)
    assert(got(5L) == Seq(128, 0)) // midpoint: floor(0.5*255 + 0.5) = 128
  }

  test("codes are partition-invariant") {
    val model = Sq.train(emb, "vec")
    val a = Sq.encode(emb.repartition(1), "vec", model)
      .select("id", "codes").as[(Long, Seq[Byte])].collect().toMap
    val b = Sq.encode(emb.repartition(7), "vec", model)
      .select("id", "codes").as[(Long, Seq[Byte])].collect().toMap
    assert(a == b)
  }

  test("encodeCorpus drops zero-norm rows: their codes would rank as " +
      "quantization noise (review r12)") {
    val model = Sq.train(emb, "vec")
    val zero = Seq((100000L, Seq.fill(64)(0.0f))).toDF("id", "vec")
    val withZero = emb.unionByName(zero)
    // plain encode keeps the row; encodeCorpus drops it
    assert(Sq.encode(withZero, "vec", model).filter(col("id") === 100000L)
      .count() == 1L)
    val enc = Sq.encodeCorpus(withZero, "vec", model)
    assert(enc.filter(col("id") === 100000L).count() == 0L)
    // and no query ever sees the zero row in its top-k
    val q = emb.filter(col("id") < 5)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    assert(Sq.adcKnn(enc, q, model, 5)
      .filter(col("id") === 100000L).count() == 0L)
  }

  test("adcKnn recall vs brute force is near-exact at SQ8 fidelity") {
    val q = emb.filter(col("id") < 10)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val exact = Similarity.bruteForceKnn(emb, q, 5)
      .select("qid", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val model = Sq.train(emb, "vec")
    val got = Sq.adcKnn(Sq.encode(emb, "vec", model), q, model, 5)
      .select("qid", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet == exact.keySet)
    val recall = exact.map { case (qid, ids) =>
      got(qid).intersect(ids).size.toDouble / ids.size
    }.sum / exact.size
    // 8 bits/dim keeps neighbor order almost perfectly at this scale
    assert(recall >= 0.9, s"SQ8 recall@5 = $recall")
  }

  test("adcKnn: a zero-norm query yields no rows, never NaN ranks") {
    val model = Sq.train(emb, "vec")
    val zq = Seq((9999L, Seq.fill(64)(0.0f))).toDF("qid", "qvec")
    assert(Sq.adcKnn(Sq.encode(emb, "vec", model), zq, model, 5).count() == 0L)
  }

  test("NaN fails loudly: train via the model guard, encode per element " +
      "(ADVICE r12 - NaN fails both clamps and would silently code 0)") {
    // a NaN anywhere in the corpus reaches vmax (Spark orders NaN above
    // every double) and the SqModel ctor names the dimension
    val poisoned = Seq((1L, Seq(0.0, 1.0)), (2L, Seq(Double.NaN, 2.0)))
      .toDF("id", "vec")
    val ex = intercept[IllegalArgumentException](Sq.train(poisoned, "vec"))
    assert(ex.getMessage.contains("NaN"), ex.getMessage)
    // a NaN element against a clean model fails in the encode kernel,
    // not silently clamp to code 0
    val model = Sq.train(Seq((1L, Seq(0.0, 1.0)), (2L, Seq(10.0, 2.0)))
      .toDF("id", "vec"), "vec")
    val probe = Seq((3L, Seq(Double.NaN, 1.5))).toDF("id", "vec")
    val ex2 = intercept[Exception] {
      Sq.encode(probe, "vec", model).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    assert(chain(ex2).contains("NaN vector element"), chain(ex2))
  }

  test("train fails loudly on an empty corpus") {
    val empty = emb.filter(col("id") < -1)
    val err = intercept[IllegalArgumentException](Sq.train(empty, "vec"))
    assert(err.getMessage.contains("empty"))
  }

  test("IvfSq: production-settings recall vs brute force, zero-vector drop") {
    import graft.ops.IvfSq
    val q = emb.filter(col("id") < 10)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val exact = Similarity.bruteForceKnn(emb, q, 5)
      .select("qid", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val idx = IvfSq.build(emb, persist = false)
    try {
      // full probe + rerank isolates quantizer quality from the IVF
      // term (the PqSpec floor pattern): SQ8 residuals are near-exact
      val got = idx.query(q, 5, nProbe = idx.nCells, fetch = 100)
        .select("qid", "id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recall = exact.map { case (qid, ids) =>
        got(qid).intersect(ids).size.toDouble / ids.size
      }.sum / exact.size
      assert(recall >= 0.9, s"IVF-SQ8 full-probe recall@5 = $recall")
      // a zero-norm query row gets no neighbors (the IvfPq guard)
      val zq = Seq((9999L, Seq.fill(64)(0.0f))).toDF("qid", "qvec")
      assert(idx.query(zq, 5).count() == 0L)
    } finally idx.close()
  }

  test("IvfSq save/load round-trips bit-identical query results") {
    import graft.ops.IvfSq
    val dir = java.nio.file.Files.createTempDirectory("ivfsq").toString
    val q = emb.filter(col("id") < 6)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val idx = IvfSq.build(emb, nCells = 4, refineIters = 0,
      persist = false, md5Seeds = true)
    idx.save(dir)
    assert(IvfSq.exists(spark, dir))
    val fresh = idx.query(q, 5, nProbe = 2, fetch = 20)
      .collect().map(_.toString).sorted
    val loaded = IvfSq.load(spark, dir, persist = false)
      .query(q, 5, nProbe = 2, fetch = 20)
      .collect().map(_.toString).sorted
    assert(fresh.sameElements(loaded))
    // a plain-IVF layout must not read as a complete IVF-SQ index
    val dir2 = java.nio.file.Files.createTempDirectory("ivfplain").toString
    graft.ops.IvfIndex.build(
      emb.select(col("id"), col("vec")), persist = false).save(dir2)
    assert(!IvfSq.exists(spark, dir2))
  }

  test("IvfSq.append: frozen model byte-encodes the delta, appended " +
      "vectors findable via exact rerank, standing results unchanged") {
    import graft.ops.IvfSq
    def vecA(i: Int) = Array.tabulate(8)(d =>
      (if (d == 0) 1.0f else 0.02f * ((i + d) % 5)))
    def vecB(i: Int) = Array.tabulate(8)(d =>
      (if (d == 1) 1.0f else 0.02f * ((i + d) % 5)))
    val a = (0 until 24).map(i => (i.toLong, vecA(i))).toDF("id", "vec")
    val b = (100 until 112).map(i => (i.toLong, vecB(i))).toDF("id", "vec")
    val dir = java.nio.file.Files.createTempDirectory("ivfsq-append").toString
    IvfSq.build(a, nCells = 2, refineIters = 1, persist = false).save(dir)
    val qa = Seq((-1L, vecA(0))).toDF("qid", "qvec")
    val qb = Seq((-2L, vecB(100))).toDF("qid", "qvec")
    val before = IvfSq.load(spark, dir, persist = false)
      .query(qa, 4, nProbe = 2, fetch = 10).collect().map(_.toSeq).toSet
    IvfSq.append(b, dir, tag = "day-1")
    val idx2 = IvfSq.load(spark, dir, persist = false)
    val hitB = idx2.query(qb, 3, nProbe = 2, fetch = 10).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(hitB(1) == 100L, s"appended vector must rank first: $hitB")
    val after = idx2.query(qa, 4, nProbe = 2, fetch = 10)
      .collect().map(_.toSeq).toSet
    assert(after == before, s"standing results must not move:\n$after\n$before")
    def frontier() = { val m = spark.read.parquet(s"$dir/meta").head()
      m.getInt(m.fieldIndex("shards")) }
    val f1 = frontier()
    IvfSq.append(b, dir, tag = "day-1")
    assert(frontier() == f1, "same-tag append must be a no-op")
    // drift telemetry (VERDICT r14 #4): B is a shifted distribution
    // (e2 cluster vs e1-trained cells) — its shard must cross the
    // documented drift_ratio > 1.5 rebuild threshold, and the build
    // shard anchors at exactly 1.0
    val drift = IvfSq.driftStats(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(drift(0) == 1.0 && drift(1) > 1.5,
      s"shifted append must surface as drift: $drift")
    // probe recall per shard: one row per shard, sane bounds; the
    // well-separated build cluster reads (near-)perfect at full probe
    // + ample rerank fetch
    val pr = IvfSq.probeRecall(spark, dir, k = 3, perShard = 8,
        nProbe = 2, fetch = 12).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(pr.keySet == Set(0, 1), pr.toString)
    assert(pr.values.forall(r => r >= 0.0 && r <= 1.0), pr.toString)
    assert(pr(0) >= 0.9, s"build-cluster recall at full probe: $pr")
  }

  test("re-saving a path as a DIFFERENT index type clears the stale " +
    "layout (review r12)") {
    val dir = java.nio.file.Files.createTempDirectory("idxswap").toString
    val corpus = emb.limit(300)
    graft.ops.IvfSq.build(corpus, nCells = 4, refineIters = 0,
      persist = false).save(dir)
    assert(graft.ops.IvfSq.exists(spark, dir))
    // re-save the SAME path as a plain IVF index: the old sqmodel/
    // encoded/corpus tables must not survive to grade this as a
    // complete IVF-SQ index over mismatched centroids
    graft.ops.IvfIndex.build(corpus.select(col("id"), col("vec")),
      nCells = 4, refineIters = 0, persist = false).save(dir)
    assert(graft.ops.IvfIndex.exists(spark, dir))
    assert(!graft.ops.IvfSq.exists(spark, dir),
      "stale IVF-SQ layout must be cleared by the plain-IVF save")
    assert(!graft.ops.IvfPq.exists(spark, dir))
    // and the fresh plain index loads and queries
    val idx = graft.ops.IvfIndex.load(spark, dir, persist = false)
    val q = corpus.filter(col("id") < 3)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    assert(idx.query(q, 3).count() > 0)
  }

  test("IVF-SQ probe join broadcasts the probe side — the codes table " +
    "never sort-merge shuffles (review r12)") {
    val idx = graft.ops.IvfSq.build(emb, nCells = 8, refineIters = 0,
      persist = false)
    val q = emb.filter(col("id") < 5)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val plan = idx.query(q, 5).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"probe join must broadcast, got:\n$plan")
  }

  test("train names a null sampled vector; adcKnn rejects incomparable " +
    "qids at analysis time (review r12)") {
    // one-row corpus -> limit(1) deterministically picks the null row
    val nullVec = Seq((1L, None: Option[Seq[Double]])).toDF("id", "vec")
    val ex = intercept[IllegalArgumentException] {
      Sq.train(nullVec, "vec")
    }
    assert(ex.getMessage.contains("null vector"), ex.getMessage)
    val model = Sq.train(emb, "vec")
    val enc = Sq.encodeCorpus(emb, "vec", model)
    val sq = Seq(("q-1", Seq.fill(64)(0.5))).toDF("qid", "qvec")
    val ex2 = intercept[IllegalArgumentException] {
      Sq.adcKnn(enc, sq, model, 3)
    }
    assert(ex2.getMessage.contains("not comparable"), ex2.getMessage)
  }

  test("rebuild: retrains from the stored corpus - drift back to 1.0, " +
      "maintain flag clears, ids and tag preserved, rot pin survives " +
      "the IvfPq rebuild (r16)") {
    import graft.ops.{IvfIndex, IvfPq, IvfSq, Pq}
    def vecA(i: Int) = Array.tabulate(8)(d =>
      (if (d == 0) 1.0f else 0.02f * ((i + d) % 5)))
    def vecS(i: Int) = Array.tabulate(8)(d =>
      (if (d == 4 + (i % 2)) 1.0f else 0.01f * ((i + d) % 3)))
    // build sees ONLY the vecA distribution; the append is genuinely
    // shifted (vecS axes), so maintain flags before the rebuild and
    // the rebuilt geometry must then cover both
    val build = (0 until 24).map(i => (i.toLong, vecA(i))).toDF("id", "vec")
    val shifted = (200 until 212).map(i => (i.toLong, vecS(i + 7)))
      .toDF("id", "vec")

    // --- IVF-SQ: flagged drift -> rebuild -> healthy ---
    val p1 = java.nio.file.Files.createTempDirectory("rebuild-sq")
      .toString + "/idx"
    IvfSq.build(build, nCells = 2, refineIters = 1, persist = false)
      .save(p1)
    IvfSq.append(shifted, p1, tag = "d1")
    val before = IvfSq.maintain(spark, p1, maxLiveShards = 1)
    assert(before.rebuildFlagged, before.toString)
    IvfSq.rebuild(spark, p1, nCells = 2, refineIters = 1)
    val drift = IvfSq.driftStats(spark, p1).collect()
    assert(drift.length == 1 && drift.head.getDouble(3) == 1.0,
      s"rebuild must leave one self-referenced shard: ${drift.toSeq}")
    val after = IvfSq.maintain(spark, p1, maxLiveShards = 1)
    assert(!after.rebuildFlagged && !after.compacted, after.toString)
    // every id survives, the appended rows are now first-class
    val m1 = spark.read.parquet(s"$p1/stats".replace("stats", "meta")).head()
    assert(m1.getString(m1.fieldIndex("tag")) == "d1",
      "append tag must carry through the rebuild (streaming retries)")
    val ids = spark.read.parquet(s"$p1/corpus").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == ((0 until 24).map(_.toLong) ++
      (200 until 212).map(_.toLong)).toSet,
      s"rebuild must preserve every row: ${ids.size}")
    // a same-tag append retry on the REBUILT index still no-ops
    IvfSq.append(shifted, p1, tag = "d1")
    val m1b = spark.read.parquet(s"$p1/meta").head()
    assert(m1b.getInt(m1b.fieldIndex("shards")) == 0,
      "retry of the applied tag must stay a no-op post-rebuild")
    // the rebuilt geometry finds shifted-space neighbors natively
    val hit = IvfSq.load(spark, p1, persist = false)
      .query(Seq((-1L, vecS(208))).toDF("qid", "qvec"), 3,
        nProbe = 1, fetch = 10)
      .collect().map(_.getLong(2)).toSet
    assert(hit.nonEmpty && hit.forall(id => id >= 200),
      s"one-probe query in the shifted space must hit shifted rows: $hit")

    // ABA guard (r16 review F4): an append planned BEFORE a rebuild
    // that runs to COMPLETION sees the same (shards, tag) after it -
    // only the minted layout epoch tells the generations apart, and
    // the CAS compares it (without the epoch this append would pass
    // and commit meta over dirs the rebuild deleted)
    def onceCas(f: => Unit): Unit =
      IvfIndex.beforeCasCommit = () => {
        IvfIndex.beforeCasCommit = () => (); f
      }
    val late = (300 until 303).map(i => (i.toLong, vecA(i)))
      .toDF("id", "vec")
    try {
      onceCas { IvfSq.rebuild(spark, p1) }
      val exA = intercept[java.util.ConcurrentModificationException] {
        IvfSq.append(late, p1, tag = "d2")
      }
      assert(exA.getMessage.contains("epoch"), exA.getMessage)
      // the retry plans against the rebuilt generation and lands
      IvfSq.append(late, p1, tag = "d2")
      val mA = spark.read.parquet(s"$p1/meta").head()
      assert(mA.getInt(mA.fieldIndex("shards")) == 1 &&
        mA.getString(mA.fieldIndex("tag")) == "d2", "retry must land")
    } finally IvfIndex.beforeCasCommit = () => ()

    // --- IVF-PQ: the rotation pin survives the rebuild ---
    val (cb, r) = Pq.trainOpq(build, "id", "vec", m = 4, ks = 8,
      iters = 1, opqIters = 1)
    val p2 = java.nio.file.Files.createTempDirectory("rebuild-pq")
      .toString + "/idx"
    IvfPq.build(build.select(col("id"), Pq.matVecCol(col("vec"), r, 8)
        .as("vec")), nCells = 2, m = 4, ks = 8, pqIters = 1,
      persist = false).save(p2, rot = Pq.rotationHash(r))
    IvfPq.rebuild(spark, p2, nCells = 2, m = 4, ks = 8, pqIters = 1)
    assert(IvfPq.rotationPin(spark, p2) == Pq.rotationHash(r),
      "rebuild must preserve the rotation pin")
    Pq.checkRotation(spark, p2, r) // and the query-path guard agrees

    // --- plain IVF rebuild from the assigned table ---
    val p3 = java.nio.file.Files.createTempDirectory("rebuild-ivf")
      .toString + "/idx"
    IvfIndex.build(build, nCells = 2, refineIters = 1,
      persist = false).save(p3)
    IvfIndex.append(shifted, p3, tag = "d1")
    IvfIndex.rebuild(spark, p3, nCells = 2, refineIters = 1)
    val d3 = IvfIndex.driftStats(spark, p3).collect()
    assert(d3.length == 1 && d3.head.getDouble(3) == 1.0, d3.toSeq.toString)
    val m3 = spark.read.parquet(s"$p3/meta").head()
    assert(m3.getString(m3.fieldIndex("tag")) == "d1")
  }

  test("staged rebuild (optimization r19): an abort at the CAS guard " +
      "— AFTER the full retrain and staging — leaves the standing " +
      "index committed, whole, and answering identically; the staging " +
      "dir is discarded") {
    import graft.ops.{IvfIndex, IvfSq}
    def vec(i: Int) = Array.tabulate(8)(d => 0.1f * ((i + d) % 7) + 0.01f)
    val build = (0 until 24).map(i => (i.toLong, vec(i))).toDF("id", "vec")
    val delta = (100 until 112).map(i => (i.toLong, vec(i + 3)))
      .toDF("id", "vec")
    val p = java.nio.file.Files.createTempDirectory("rebuild-abort")
      .toString + "/idx"
    IvfSq.build(build, nCells = 2, refineIters = 1, persist = false).save(p)
    IvfSq.append(delta, p, tag = "d1")
    val q = Seq((-1L, vec(5)), (-2L, vec(105))).toDF("qid", "qvec")
    def answers() = IvfSq.load(spark, p, persist = false)
      .query(q, 3, nProbe = 2, fetch = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val before = answers()
    val metaBefore = spark.read.parquet(s"$p/meta").head().toSeq
    // fail the rebuild at its CAS guard — the retrain AND the staged
    // table writes have fully completed by then (the guard runs last
    // before the promote)
    IvfIndex.beforeCasCommit = () => {
      IvfIndex.beforeCasCommit = () => ()
      throw new IllegalStateException("injected-pre-promote-crash")
    }
    try {
      val ex = intercept[IllegalStateException] { IvfSq.rebuild(spark, p) }
      assert(ex.getMessage == "injected-pre-promote-crash")
    } finally IvfIndex.beforeCasCommit = () => ()
    // the standing index is untouched: still committed, same meta row,
    // identical answers, and no staging residue
    assert(IvfSq.exists(spark, p), "index must still read as complete")
    assert(spark.read.parquet(s"$p/meta").head().toSeq == metaBefore,
      "the committed meta must be byte-identical after the abort")
    assert(answers() == before, "answers must be unchanged")
    assert(!new java.io.File(s"$p/${IvfIndex.RebuildStage}").exists(),
      "aborted staging must be discarded")
    // and a rebuild WITHOUT the injected failure still lands: one live
    // shard, drift 1.0, tag preserved
    IvfSq.rebuild(spark, p)
    val drift = IvfSq.driftStats(spark, p).collect()
    assert(drift.length == 1 && drift.head.getDouble(3) == 1.0)
    val m = spark.read.parquet(s"$p/meta").head()
    assert(m.getString(m.fieldIndex("tag")) == "d1")
  }

  test("IvfSq.compact + IvfIndex.compact: merged index answers " +
      "bit-identically; probe recall and e-gate layout survive (r15)") {
    import graft.ops.{IvfIndex, IvfSq}
    def vecA(i: Int) = Array.tabulate(8)(d =>
      (if (d == 0) 1.0f else 0.02f * ((i + d) % 5)))
    def vecB(i: Int) = Array.tabulate(8)(d =>
      (if (d == 1) 1.0f else 0.02f * ((i + d) % 5)))
    val a = (0 until 24).map(i => (i.toLong, vecA(i))).toDF("id", "vec")
    val b = (100 until 112).map(i => (i.toLong, vecB(i))).toDF("id", "vec")
    val dir = java.nio.file.Files.createTempDirectory("ivfsq-compact").toString
    IvfSq.build(a, nCells = 2, refineIters = 1, persist = false).save(dir)
    IvfSq.append(b, dir, tag = "day-1")
    val q = Seq((-1L, vecA(0)), (-2L, vecB(100))).toDF("qid", "qvec")
    val before = IvfSq.load(spark, dir, persist = false)
      .query(q, 4, nProbe = 2, fetch = 10).collect().map(_.toSeq).toSet
    IvfSq.compact(spark, dir)
    assert(IvfSq.exists(spark, dir))
    val after = IvfSq.load(spark, dir, persist = false)
      .query(q, 4, nProbe = 2, fetch = 10).collect().map(_.toSeq).toSet
    assert(after == before, s"compaction must not move results")
    // telemetry over the merged layout: one shard, self-referenced
    val drift = IvfSq.driftStats(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(drift == Map(3 -> 1.0), drift.toString)
    val pr = IvfSq.probeRecall(spark, dir, k = 3, perShard = 8,
        nProbe = 2, fetch = 12).collect().map(_.getInt(0)).toSet
    assert(pr == Set(3), pr.toString)

    // the plain-IVF family shares the machinery
    val dir2 = java.nio.file.Files.createTempDirectory("ivf-compact").toString
    graft.ops.IvfIndex.build(a, nCells = 2, refineIters = 1,
      persist = false).save(dir2)
    IvfIndex.append(b, dir2, tag = "day-1")
    val q2 = Seq((-1L, vecA(0))).toDF("qid", "qvec")
    val b4 = IvfIndex.load(spark, dir2, persist = false)
      .query(q2, 4, nProbe = 2).collect().map(_.toSeq).toSet
    IvfIndex.compact(spark, dir2)
    val a4 = IvfIndex.load(spark, dir2, persist = false)
      .query(q2, 4, nProbe = 2).collect().map(_.toSeq).toSet
    assert(a4 == b4 && IvfIndex.exists(spark, dir2))
  }
}
