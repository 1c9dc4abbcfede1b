package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.Platform
import graft.model.DantzigModel
import graft.report.ScenarioOperators

class ExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("documentation KV store (base.py:131-162)") {
    val mp = new Platform(spark, tmpDir("graft-docs"))
    mp.store.setDoc("model", "canning problem", "Dantzig 1963 transport LP")
    mp.store.setDoc("region", "World", "everything")
    assert(mp.store.getDoc("model", "canning problem")
      .contains("Dantzig 1963 transport LP"))
    mp.store.setDoc("model", "canning problem", "updated")
    assert(mp.store.getDoc("model", "canning problem").contains("updated"))
    assert(mp.store.docs("model").count() == 1)
    mp.store.removeDoc("model", "canning problem")
    assert(mp.store.getDoc("model", "canning problem").isEmpty)
  }

  test("item cache: unfiltered frame persisted, invalidated on write") {
    val mp = new Platform(spark, tmpDir("graft-cache"))
    val s = mp.newScenario("m", "s")
    s.checkOut()
    DantzigModel.initialize(s)
    s.commit("data")
    val first = s.par("d")
    first.count()
    // second (filtered) read re-filters the same cached plan
    assert(s.par("d", Map("i" -> Seq("seattle"))).count() == 3)
    // a write invalidates: the next read must see the new row
    s.transact("w") {
      s.addSet("j", Seq("boston"))
      s.addPar("d", Seq(("seattle", "boston", 4.0, "km")).toDF("i", "j", "value", "unit"))
    }
    assert(s.par("d").count() == 7)
    // set change invalidated everything but reads still work
    assert(s.par("a").count() == 2)
    mp.store.clearCache()
    assert(s.par("d").count() == 7)
  }

  test("allTsData is ONE partitioned FileScan, not a union of runs") {
    val mp = new Platform(spark, tmpDir("graft-allts"))
    mp.addUnit("u")
    (1 to 30).foreach { i =>
      val s = mp.newScenario(s"m$i", "s")
      s.transact("ts") {
        s.addTimeseries(Seq(("World", "v", "u", 2020, i.toDouble))
          .toDF("region", "variable", "unit", "year", "value"))
      }
    }
    val all = mp.store.allTsData()
    // sparkPlan (pre-AQE-wrapping) so collect() sees the leaf scans
    val plan = all.filter(col("run_id") === 7L).queryExecution.sparkPlan
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val unions = plan.collect {
      case u: org.apache.spark.sql.execution.UnionExec => u
    }
    assert(scans.size == 1, s"expected one FileScan, got ${scans.size}")
    assert(unions.isEmpty, "all-runs TS read must not be a union of per-run branches")
    // run_id survives as a partition filter, so only one run's
    // directory is read (the 10k-run warehouse case of VERDICT r2 #2)
    assert(scans.head.partitionFilters.nonEmpty,
      "run_id predicate must reach the scan's partition filters")
    assert(all.filter(col("run_id") === 7L).select("value")
      .as[Double].collect().toSeq == Seq(7.0))
    assert(all.count() == 30)
  }

  test("model/scenario name codelists list names with no run (base.py:300-338)") {
    val mp = new Platform(spark, tmpDir("graft-names"))
    mp.newScenario("existing model", "existing scenario")
    mp.addModelName("planned model")
    mp.addScenarioName("planned scenario")
    assert(mp.modelNames() == Seq("existing model", "planned model"))
    assert(mp.scenarioNames() == Seq("existing scenario", "planned scenario"))
    // idempotent re-add; run-derived names need no explicit entry
    mp.addModelName("planned model")
    mp.addModelName("existing model")
    assert(mp.modelNames() == Seq("existing model", "planned model"))
  }

  test("iterParData/iterItemData apply overlapping filters, skip disjoint items") {
    val mp = new Platform(spark, tmpDir("graft-iter"))
    val s = mp.newScenario("m", "s")
    s.checkOut()
    DantzigModel.initialize(s)
    s.commit("data")
    // unfiltered: every parameter appears
    val allPars = s.iterParData().toSeq
    assert(allPars.map(_._1).sorted == s.parList().sorted)
    // filtered on i: parameters without an i dimension are SKIPPED
    // (reference scenario.py:462-466), overlapping ones filter to it
    val filtered = s.iterParData(Map("i" -> Seq("seattle"))).toMap
    assert(filtered.keySet.forall(n => s.idxNames(n).contains("i")))
    assert(filtered.keySet.nonEmpty)
    filtered.foreach { case (n, df) =>
      assert(df.select("i").distinct().as[String].collect().toSeq == Seq("seattle"),
        s"item $n not filtered")
    }
    // sets via the generic iterator
    val sets = s.iterItemData(graft.store.ItemType.Set).map(_._1).toSeq
    assert(sets.sorted == s.setList().sorted)
  }

  test("checkAccess: known models readable, writability from the store root") {
    val mp = new Platform(spark, tmpDir("graft-access"))
    mp.newScenario("canning problem", "standard")
    val r = mp.checkAccess("anyone", Seq("canning problem", "no such model"))
    assert(r("canning problem") && !r("no such model"))
    val w = mp.checkAccess("anyone", Seq("canning problem"), access = "edit")
    assert(w("canning problem"), "tmp store root is writable")
    intercept[IllegalArgumentException] { mp.checkAccess("u", Nil) }
    intercept[IllegalArgumentException] {
      mp.checkAccess("u", Seq("canning problem"), access = "admin")
    }
  }

  test("setLogLevel maps reference level names onto Spark") {
    val mp = new Platform(spark, tmpDir("graft-log"))
    // round-trips the name AS SET (review r9): the reference's
    // get_log_level returns what set_log_level was given
    mp.setLogLevel("WARNING")
    assert(mp.getLogLevel == "WARNING")
    mp.setLogLevel("CRITICAL")
    assert(mp.getLogLevel == "CRITICAL")
    intercept[IllegalArgumentException] { mp.setLogLevel("verbose") }
    mp.setLogLevel("WARN") // restore for other specs
  }

  test("loadScenarioData preloads every item in one call (scenario.py:145-160)") {
    val mp = new Platform(spark, tmpDir("graft-preload"))
    mp.addUnit("USD")
    val s = mp.newScenario("m", "s")
    s.checkOut()
    DantzigModel.initialize(s)
    s.commit("data")
    s.loadScenarioData()
    // every item's unfiltered frame is now cache-resident: reads come
    // back persisted without any further scan setup
    (s.setList() ++ s.parList()).foreach { n =>
      val df = mp.store.itemData(s.runId, n)
      assert(df.storageLevel.useMemory || df.storageLevel.useDisk,
        s"item '$n' not persisted after loadScenarioData")
    }
  }

  test("discard rolls back staged writes; transact(discardOnError) leaves no trace") {
    val mp = new Platform(spark, tmpDir("graft-rollback"))
    val s = mp.newScenario("m", "s")
    s.checkOut()
    DantzigModel.initialize(s)
    s.commit("base")
    // explicit discard: staged par write must vanish
    s.checkOut()
    s.addPar("d", Seq(("seattle", "chicago", 99.0, "km")).toDF("i", "j", "value", "unit"))
    assert(s.par("d", Map("i" -> Seq("seattle"), "j" -> Seq("chicago")))
      .select("value").as[Double].head() == 99.0) // uncommitted writes visible
    s.discard()
    assert(s.par("d", Map("i" -> Seq("seattle"), "j" -> Seq("chicago")))
      .select("value").as[Double].head() == 1.7) // rolled back
    // discardOnError: partial writes from a failed transact are dropped
    intercept[RuntimeException] {
      s.transact("boom", discardOnError = true) {
        s.addPar("d", Seq(("seattle", "topeka", 55.0, "km")).toDF("i", "j", "value", "unit"))
        throw new RuntimeException("boom")
      }
    }
    assert(s.par("d", Map("i" -> Seq("seattle"), "j" -> Seq("topeka")))
      .select("value").as[Double].head() == 1.8)
    // catalogs held across writes stay readable (generation retention)
    val held = mp.scenarioList(defaultOnly = false)
    mp.newScenario("m", "s2")
    assert(held.count() >= 1)
  }

  test("concurrent writers to one item never corrupt the published generation") {
    import graft.store.{ItemDef, ItemType}
    val mp = new Platform(spark, tmpDir("graft-conc"))
    val run = mp.store.createRun("m", "s", "scheme", "")
    mp.store.initItem(run.runId, ItemDef("x", ItemType.Par, Nil, Nil))
    // 8 threads race distinct single-row payloads into the same item;
    // generation allocation is synchronized, publish is monotonic, so
    // the surviving read must be EXACTLY one writer's payload
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        try mp.store.writeItemData(run.runId, "x",
          Seq((i.toDouble, "kg")).toDF("value", "unit"))
        catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, s"writer failed: ${Option(errors.peek()).map(_.getMessage)}")
    val rows = mp.store.itemData(run.runId, "x", Map.empty).collect()
    assert(rows.length == 1)
    assert((1 to 8).map(_.toDouble).contains(rows(0).getDouble(0)))
    assert(rows(0).getString(1) == "kg")
  }

  test("manifest is sharded by run: a commit rewrites only its own shard") {
    import graft.store.{ItemDef, ItemType, ParquetStore}
    val root = tmpDir("graft-shard")
    val mp = new Platform(spark, root)
    // a miniature warehouse: many runs, one committed item each — the
    // point is that writing to ONE run must not touch the others'
    // manifest shards (pre-r5 every commit rewrote one global manifest
    // with one row per item per run across ALL runs, i.e. commit I/O
    // scaled with warehouse size, not with the commit)
    val nRuns = 24
    val runs = (1 to nRuns).map { i =>
      val r = mp.store.createRun(s"m$i", "s", "scheme", "")
      mp.store.initItem(r.runId, ItemDef("x", ItemType.Par, Nil, Nil))
      mp.store.writeItemData(r.runId, "x",
        Seq((i.toDouble, "kg")).toDF("value", "unit"))
      r
    }
    def shardGens(): Map[String, Set[String]] = {
      val files = new java.io.File(s"$root/catalog/manifest").listFiles()
      files.map(_.getName).groupBy(_.takeWhile(_ != '.'))
        .map { case (k, v) => k -> v.toSet }
    }
    val before = shardGens()
    assert(before.size == nRuns, "one shard family per run")
    val target = runs.head
    mp.store.writeItemData(target.runId, "x",
      Seq((99.0, "kg")).toDF("value", "unit"))
    val after = shardGens()
    val changed = after.filter { case (k, v) => !before.get(k).contains(v) }.keySet
    assert(changed == Set(s"run_id=${target.runId}"),
      s"commit touched shards $changed — must touch exactly its own run")
    // no legacy whole-warehouse manifest table is ever written
    assert(!new java.io.File(s"$root/catalog").listFiles()
      .exists(_.getName.startsWith("manifest.g")))
    // a fresh store instance reconstructs the same state from shards
    val reloaded = new ParquetStore(spark, root)
    assert(reloaded.itemData(target.runId, "x", Map.empty)
      .select("value").as[Double].head() == 99.0)
    assert(reloaded.itemData(runs.last.runId, "x", Map.empty)
      .select("value").as[Double].head() == nRuns.toDouble)
  }

  test("vacuum removes orphaned generations but keeps live data") {
    val mp = new Platform(spark, tmpDir("graft-vacuum"))
    val s = mp.newScenario("m", "s")
    s.checkOut()
    DantzigModel.initialize(s)
    s.commit("base")
    // stage a write then discard → staged dir deleted by discard, but
    // simulate a crash leftover by writing repeatedly within a checkout
    s.checkOut()
    for (v <- 1 to 3)
      s.addPar("d", Seq(("seattle", "chicago", v.toDouble, "km")).toDF("i", "j", "value", "unit"))
    s.discard()
    val removed = mp.store.vacuum()
    assert(removed >= 1) // intermediate staged generations were orphans
    // data is intact afterwards
    assert(s.par("d").count() == 6)
    assert(s.par("d", Map("i" -> Seq("seattle"), "j" -> Seq("chicago")))
      .select("value").as[Double].head() == 1.7)
    assert(mp.store.vacuum() == 0) // idempotent
  }

  test("scenario operators: store_ts/get_ts/remove_ts(after)/update_scenario") {
    val mp = new Platform(spark, tmpDir("graft-ops"))
    mp.addUnit("USD")
    val s = mp.newScenario("m", "s")
    s.checkOut()
    DantzigModel.initialize(s)
    s.commit("data")
    ScenarioOperators.storeTs(s, Seq(
      ("World", "GDP", "USD", 2000, 1.0), ("World", "GDP", "USD", 2010, 2.0),
      ("World", "GDP", "USD", 2020, 3.0))
      .toDF("region", "variable", "unit", "year", "value"))
    assert(ScenarioOperators.getTs(s, variable = Seq("GDP")).count() == 3)
    ScenarioOperators.removeTs(s,
      Seq(("World", "GDP", "USD")).toDF("region", "variable", "unit"),
      after = Some(2010))
    assert(ScenarioOperators.getTs(s).select("year").as[Int].collect().toSeq == Seq(2000))
    // synonym-keyed after-removal resolves regions (review r12): the
    // raw semi-join against canonical stored regions silently deleted
    // NOTHING for a synonym key
    mp.addRegionSynonym("Globe", "World")
    ScenarioOperators.removeTs(s,
      Seq(("Globe", "GDP", "USD")).toDF("region", "variable", "unit"),
      after = Some(1990))
    assert(ScenarioOperators.getTs(s).count() == 0,
      "a synonym-keyed remove_ts(after) must delete canonical-region rows")
    ScenarioOperators.updateScenario(s, "d",
      Seq(("seattle", "chicago", 2.2, "km")).toDF("i", "j", "value", "unit"))
    assert(s.par("d", Map("i" -> Seq("seattle"), "j" -> Seq("chicago")))
      .select("value").as[Double].head() == 2.2)
    assert(ScenarioOperators.fromUrl(mp, s"m/s#${s.version}").runId == s.runId)
  }

  test("diff matches null keys like pandas merge (review r12)") {
    val a = Seq((Option("x"), 1.0), (None: Option[String], 2.0))
      .toDF("k", "v")
    val b = Seq((Option("x"), 1.5), (None: Option[String], 2.5))
      .toDF("k", "v")
    val got = graft.util.Util.diff(a, b, Seq("k")).collect()
      .map(r => (Option(r.getString(0)), r.getDouble(1), r.getDouble(2),
        r.getString(3))).toSet
    // the null-key row is ONE 'both' row with values paired — a plain
    // join split it into phantom left_only/right_only halves
    assert(got == Set(
      (Some("x"), 1.0, 1.5, "both"),
      (None, 2.0, 2.5, "both")), s"got $got")
  }

  test("toIamcLayout is locale-independent (review r12)") {
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
    try {
      // "REGION".toLowerCase under tr is "regıon" (dotless ı) — the
      // default-locale lowercase rejected a valid IAMC frame
      val df = Seq(("World", "GDP", "USD", 2020, 1.0))
        .toDF("REGION", "VARIABLE", "UNIT", "YEAR", "VALUE")
      val out = graft.util.Util.toIamcLayout(df)
      assert(Seq("region", "variable", "unit").forall(out.columns.contains))
    } finally java.util.Locale.setDefault(prev)
  }

  test("setMeta on disjoint target levels coexists; shared-context still replaces") {
    val mp = new Platform(spark, tmpDir("graft-meta-lvl"))
    mp.setMeta("priority", "\"1\"", model = Some("A"))
    // a scenario-level write must NOT delete the model-level entry:
    // the targets share no specified coordinate
    mp.setMeta("priority", "\"2\"", scenario = Some("Z"))
    assert(mp.getMeta(model = Some("A"), strict = true).count() == 1)
    assert(mp.getMeta(scenario = Some("Z"), strict = true).count() == 1)
    // same shared context still replaces: (A, B) subsumes the A entry
    mp.setMeta("priority", "\"3\"", model = Some("A"), scenario = Some("B"))
    assert(mp.getMeta(model = Some("A"), strict = true).count() == 0)
    // and a DIFFERENT model neither deletes nor matches
    mp.setMeta("priority", "\"4\"", model = Some("Q"))
    assert(mp.getMeta(model = Some("A"), scenario = Some("B"), strict = true)
      .select("value_json").as[String].head() == "\"3\"")
  }

  test("removeSet refuses non-set items; region/synonym adds are idempotent") {
    val mp = new Platform(spark, tmpDir("graft-guards"))
    mp.addUnit("USD")
    val s = mp.newScenario("m", "s")
    s.checkOut()
    DantzigModel.initialize(s)
    val e = intercept[IllegalArgumentException](
      s.removeSet("d", Seq(Seq("seattle", "chicago"))))
    assert(e.getMessage.contains("not a set"))
    s.discard()
    // duplicated synonym rows would fan out resolveRegions' left join
    // and store every datapoint twice — re-running setup must be safe
    mp.addRegion("United Kingdom", "country")
    mp.addRegion("United Kingdom", "country")
    mp.addRegionSynonym("UK", "United Kingdom")
    mp.addRegionSynonym("UK", "United Kingdom")
    val t = mp.newScenario("m", "ts")
    t.transact("seed") {
      t.addTimeseries(Seq(("UK", "GDP", "USD", 2020, 1.5))
        .toDF("region", "variable", "unit", "year", "value"))
    }
    assert(t.timeseries().count() == 1)
  }

  test("a run id recycled after discardRun publishes writes durably") {
    val root = tmpDir("graft-recycle")
    val mp = new Platform(spark, root)
    val s = mp.newScenario("m", "s")
    s.checkOut()
    DantzigModel.initialize(s)
    s.commit("base")
    val oldId = s.runId
    mp.store.discardRun(oldId)
    // nextRunId reuses the discarded max id; stale checkout state under
    // it used to silently stage every non-checkout write into pending
    // (readable this session, lost on restart)
    val u = mp.newScenario("m", "reborn")
    assert(u.runId == oldId)
    u.checkOut()
    DantzigModel.initialize(u)
    u.commit("data")
    u.setAsDefault()
    u.solve(graft.model.Models("dantzig")) // setSolution writes WITHOUT checkout
    // a FRESH store over the same root sees only manifest-published
    // data — staged-forever writes would be invisible here
    val mp2 = new Platform(spark, root)
    val u2 = mp2.getScenario("m", "reborn")
    assert(u2.hasSolution, "solution writes under a recycled id were not published")
  }

  test("commit comments survive in the commit log") {
    val mp = new Platform(spark, tmpDir("graft-commitlog"))
    mp.addUnit("USD")
    val s = mp.newScenario("m", "s")
    s.transact("added 2030 demand data") {
      s.addTimeseries(Seq(("World", "GDP", "USD", 2030, 9.9))
        .toDF("region", "variable", "unit", "year", "value"))
    }
    val log = mp.store.commitLog(Some(s.runId)).collect()
    assert(log.exists(_.getAs[String]("comment") == "added 2030 demand data"))
  }

  test("checkout/commit cycles leave no generation-directory holes") {
    val mp = new Platform(spark, tmpDir("graft-gcgens"))
    val s = mp.newScenario("m", "s")
    s.checkOut()
    DantzigModel.initialize(s)
    s.commit("base")
    for (v <- 1 to 8) {
      s.checkOut()
      s.addPar("d", Seq(("seattle", "chicago", v.toDouble, "km"))
        .toDF("i", "j", "value", "unit"))
      s.commit(s"v$v")
    }
    // publish-time GC: at most KeepGens+1 generations remain on disk
    val dir = new java.io.File(s"${mp.root}/data/par/run_id=${s.runId}/name=d")
    val gens = dir.listFiles().map(_.getName).filter(_.startsWith("g"))
    assert(gens.length <= graft.store.ParquetStore.KeepGens + 1,
      s"generation directories leaked: ${gens.sorted.mkString(",")}")
    assert(s.par("d", Map("i" -> Seq("seattle"), "j" -> Seq("chicago")))
      .select("value").as[Double].head() == 8.0)
  }

  test("preloaded timeseries cache invalidates on the next TS write") {
    val mp = new Platform(spark, tmpDir("graft-preload"))
    mp.addUnit("USD")
    val s = mp.newScenario("m", "s")
    s.transact("v1") {
      s.addTimeseries(Seq(("World", "GDP", "USD", 2020, 1.0))
        .toDF("region", "variable", "unit", "year", "value"))
    }
    s.preloadTimeseries()
    assert(s.timeseries().select("value").as[Double].head() == 1.0)
    s.transact("v2") {
      s.addTimeseries(Seq(("World", "GDP", "USD", 2020, 2.0))
        .toDF("region", "variable", "unit", "year", "value"))
    }
    // a stale preloaded frame would still serve 1.0
    assert(s.timeseries().select("value").as[Double].head() == 2.0)
  }

  test("saved-index cache keys track DIRECTORY parquet contents (ADVICE r6)") {
    // a Spark-written embeddings.parquet is a directory: the top-level
    // status is useless (length != data bytes; dir mtime can survive an
    // in-place part rewrite), so the stamp aggregates the recursive
    // listing — rewriting the data with different contents MUST change
    // the key, and an untouched dataset must keep it stable
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("graft-idxkey")
    val src = spark.range(100).select(col("id").as("vec_id"),
      org.apache.spark.sql.functions.array(col("id").cast("double")).as("embedding"))
    src.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val k1 = graft.queries.Pipeline.idxPath(spark, dir, "t")
    val k1again = graft.queries.Pipeline.idxPath(spark, dir, "t")
    assert(k1 == k1again, "stamp must be stable while data is untouched")
    Thread.sleep(1100) // mtime granularity can be 1 s on some filesystems
    spark.range(200).select(col("id").as("vec_id"),
        org.apache.spark.sql.functions.array(col("id").cast("double")).as("embedding"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val k2 = graft.queries.Pipeline.idxPath(spark, dir, "t")
    assert(k1 != k2, "rewriting the dataset must invalidate the cache key")

    // cache root is scoped per user (ADVICE r11: /dev/shm and /tmp are
    // world-shared — a fixed path is a cross-user permission failure
    // and a cache-poisoning surface)
    val user = sys.props.getOrElse("user.name", "anon")
      .replaceAll("[^A-Za-z0-9._-]", "_")
    assert(new java.io.File(k2).getParentFile.getName.contains(user),
      s"cache root must embed the user name: $k2")

    // stale-stamp GC honors a grace period (ADVICE r11: a concurrent
    // JVM can still be reading a pre-regeneration entry — only
    // hour-stale siblings are reclaimed)
    val fresh = new java.io.File(k1)
    fresh.mkdirs()
    graft.queries.Pipeline.idxPath(spark, dir, "t")
    assert(fresh.exists(),
      "a recently-written stale-stamp sibling must survive GC (grace)")
    val old = System.currentTimeMillis() - 2L * 3600L * 1000L
    fresh.setLastModified(old)
    graft.queries.Pipeline.idxPath(spark, dir, "t")
    assert(!fresh.exists(),
      "an hour-stale sibling with a dead stamp must be reclaimed")
  }

  test("concurrent per-run writer pipelines: durable state consistent from a fresh store") {
    // the realistic multi-pipeline pattern: one driver thread per
    // scenario, all hammering ONE store concurrently — exercises the
    // shared generation allocator, the (runId, name) manifest map, the
    // run-sharded persistManifest, and publish-time gcGens under real
    // parallelism. Scenarios are created serially (catalog pointer
    // swaps are a driver-side setup step); the write/commit phases race.
    val mp = new Platform(spark, tmpDir("graft-conc-runs"))
    val nRuns = 4
    val scens = (0 until nRuns).map { i =>
      val sc = mp.newScenario("m", s"s$i")
      sc.checkOut(); DantzigModel.initialize(sc); sc.commit("base")
      sc
    }
    val writesPerRun = graft.store.ParquetStore.KeepGens + 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nRuns)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val latch = new java.util.concurrent.CountDownLatch(nRuns)
    scens.zipWithIndex.foreach { case (sc, i) =>
      pool.submit(new Runnable {
        def run(): Unit =
          try
            for (w <- 1 to writesPerRun)
              sc.transact(s"w$w") {
                sc.addPar("d", Seq(("seattle", "chicago", (i * 1000 + w).toDouble, "km"))
                  .toDF("i", "j", "value", "unit"))
              }
          catch { case e: Throwable => errs.add(e) }
          finally latch.countDown()
      })
    }
    assert(latch.await(300, java.util.concurrent.TimeUnit.SECONDS), "writers timed out")
    pool.shutdown()
    assert(errs.isEmpty, s"concurrent writers threw: ${errs.peek()}")
    // a FRESH store sees only what was durably persisted: every run
    // must serve its own final value — no cross-run bleed, no pointer
    // at a GC'd generation (each run staged > KeepGens generations)
    val fresh = new graft.store.ParquetStore(spark, mp.root)
    scens.zipWithIndex.foreach { case (sc, i) =>
      val v = fresh.itemData(sc.runId, "d",
          Map("i" -> Seq("seattle"), "j" -> Seq("chicago")))
        .select("value").as[Double].head()
      assert(v == (i * 1000 + writesPerRun).toDouble,
        s"run ${sc.runId}: fresh store read $v, want ${i * 1000 + writesPerRun}")
    }
  }

  test("commit persists the manifest BEFORE sweeping old generations (ADVICE r7)") {
    val mp = new Platform(spark, tmpDir("graft-gc-order"))
    val s = mp.newScenario("m", "s")
    s.checkOut()
    DantzigModel.initialize(s)
    s.commit("base")
    // stage > KeepGens generations of one item in ONE checkout: the
    // publish-time cutoff then lies past the last durably-committed
    // generation, so a sweep-before-persist would delete the very
    // directory the on-disk manifest still references
    s.checkOut()
    val n = graft.store.ParquetStore.KeepGens + 2
    for (v <- 1 to n)
      s.addPar("d", Seq(("seattle", "chicago", v.toDouble, "km"))
        .toDF("i", "j", "value", "unit"))
    var sweepsChecked = 0
    mp.store.onGcSweep = (fam, runId, name, newest) => {
      if (fam == "par" && name == "d") {
        // a FRESH store sees only the durable manifest: by sweep time it
        // must already serve the newly-committed value — otherwise a
        // crash right here would leave it pointing at deleted data
        val fresh = new graft.store.ParquetStore(spark, mp.root)
        val v = fresh.itemData(runId, "d",
            Map("i" -> Seq("seattle"), "j" -> Seq("chicago")))
          .select("value").as[Double].head()
        assert(v == n.toDouble,
          s"gcGens ran before the manifest was durable (fresh store read $v, want $n)")
        sweepsChecked += 1
      }
    }
    try s.commit("bulk") finally mp.store.onGcSweep = (_, _, _, _) => ()
    assert(sweepsChecked > 0, "the commit should have triggered a par/d sweep")
  }

  test("gcGens never reclaims an in-flight generation (ADVICE r7)") {
    val mp = new Platform(spark, tmpDir("graft-gc-inflight"))
    val s = mp.newScenario("m", "s")
    s.checkOut()
    DantzigModel.initialize(s)
    s.commit("base")
    val dirF = new java.io.File(s"${mp.root}/data/par/run_id=${s.runId}/name=d")
    def gens(): Seq[Long] = dirF.listFiles().map(_.getName)
      .filter(_.startsWith("g")).map(_.stripPrefix("g").toLong).toSeq.sorted
    val g0 = gens().max
    // simulate a slow concurrent writer still producing generation g0:
    // mark it in-flight, then publish enough faster generations to push
    // the retention cutoff past it
    mp.store.inFlight((s.runId, "d", g0)) = ()
    val n = graft.store.ParquetStore.KeepGens + 2
    for (v <- 1 to n)
      s.transact(s"v$v") {
        s.addPar("d", Seq(("seattle", "chicago", v.toDouble, "km"))
          .toDF("i", "j", "value", "unit"))
      }
    assert(gens().contains(g0),
      s"in-flight generation g$g0 was deleted mid-write by a concurrent gcGens")
    // writer finishes → the marker clears → the next publish reclaims it
    mp.store.inFlight.remove((s.runId, "d", g0))
    s.transact("final") {
      s.addPar("d", Seq(("seattle", "chicago", 99.0, "km"))
        .toDF("i", "j", "value", "unit"))
    }
    assert(!gens().contains(g0), "finished in-flight generation should be reclaimed")
  }

  test("currentGenOf resolves table names containing glob metacharacters (ADVICE r7)") {
    val root = tmpDir("graft-globsafe")
    val st = new graft.store.ParquetStore(spark, root)
    // a literal-listing resolution would find these; the globStatus
    // rewrite must match them literally too, not as patterns
    for (weird <- Seq("tbl[1]", "tbl{a,b}", "tbl*q", "tbl?x")) {
      val d = new java.io.File(s"$root/$weird.g3")
      assert(d.mkdirs())
      assert(new java.io.File(d, "_SUCCESS").createNewFile())
      assert(st.currentGenOf(weird) == Some(3L),
        s"glob metacharacters in '$weird' broke generation resolution")
    }
    // and a pattern-shaped name must NOT swallow its sibling's generations
    val sib = new java.io.File(s"$root/tblZq.g7")
    assert(sib.mkdirs() && new java.io.File(sib, "_SUCCESS").createNewFile())
    assert(st.currentGenOf("tbl*q") == Some(3L))
  }

  test("addTimeslice mirrors reference redefinition semantics (platform.py:389-397)") {
    val st = new graft.store.ParquetStore(spark, tmpDir("graft-tslice"))
    st.addTimeslice("summer", "season", 0.25)
    // same duration: no-op, never a duplicate row
    st.addTimeslice("summer", "season", 0.25)
    assert(st.timeslices().filter(col("name") === "summer").count() == 1)
    // different duration: error naming the existing definition
    val ex = intercept[IllegalArgumentException] {
      st.addTimeslice("summer", "season", 0.5)
    }
    assert(ex.getMessage.contains("already defined with duration 0.25"))
    // the implicit 'Year' default (read-side, never written) rides
    // along with the one stored row
    assert(st.timeslices().count() == 2)
    assert(st.timeslices().filter(col("name") === "Year")
      .select("duration").head().getDouble(0) == 1.0)
    // re-adding 'Year' over the IMPLICIT default persists the CALLER's
    // row verbatim (review r10: materializing timeslices() silently
    // swapped the caller's category for the default's 'Common')
    st.addTimeslice("Year", "annual", 1.0)
    val yr = st.timeslices().filter(col("name") === "Year")
      .select("category", "duration").collect()
    assert(yr.length == 1, "explicit row shadows the implicit default")
    assert(yr.head.getString(0) == "annual" && yr.head.getDouble(1) == 1.0)
    st.releaseWriterLock()
  }

  test("getRunById on a missing run id fails with a named error") {
    val st = new graft.store.ParquetStore(spark, tmpDir("graft-norun"))
    val ex = intercept[IllegalArgumentException] { st.getRunById(42L) }
    assert(ex.getMessage.contains("no run with id 42"))
  }

  test("writer lock: a second writer process fails fast, readers are unaffected (VERDICT r8 #3)") {
    // Direction 1: this store writes first -> it must hold the OS lock,
    // so a foreign channel (what another process's tryLock sees) cannot
    // take it.
    val root = tmpDir("graft-wlock")
    val st = new graft.store.ParquetStore(spark, root)
    st.createRun("m", "s", "sch", "first write acquires the lock")
    val lockFile = new java.io.File(root, ".writer.lock")
    assert(lockFile.exists(), "first durable mutation must create the lock file")
    val foreign = new java.io.RandomAccessFile(lockFile, "rw")
    try {
      val got =
        try foreign.getChannel.tryLock()
        catch { case _: java.nio.channels.OverlappingFileLockException => null }
      assert(got == null, "store must hold an exclusive OS lock while open as a writer")
    } finally foreign.close()
    // same JVM, second instance on the same root: shares the held lock
    // (registry), writes fine — and a pure reader needs no lock at all
    val sibling = new graft.store.ParquetStore(spark, root)
    sibling.createRun("m2", "s2", "sch", "same-JVM sibling writer")
    assert(new graft.store.ParquetStore(spark, root)
      .listRuns(defaultOnly = false).count() == 2)

    // Direction 2: a foreign holder is already there -> this store's
    // first write fails fast with the holder's identity; after the
    // holder releases, the write goes through.
    val root2 = tmpDir("graft-wlock2")
    new java.io.File(root2).mkdirs()
    val holderRaf = new java.io.RandomAccessFile(
      new java.io.File(root2, ".writer.lock"), "rw")
    val holderLock = holderRaf.getChannel.lock()
    holderRaf.write("pid=99999 (simulated foreign process)".getBytes("UTF-8"))
    val st2 = new graft.store.ParquetStore(spark, root2)
    val ex = intercept[IllegalStateException] {
      st2.createRun("m", "s", "sch", "must be refused")
    }
    assert(ex.getMessage.contains("locked by another writer"),
      s"unexpected refusal message: ${ex.getMessage}")
    assert(ex.getMessage.contains("simulated foreign process"),
      "refusal must name the holder recorded in the lock file")
    holderLock.release(); holderRaf.close()
    st2.createRun("m", "s", "sch", "lock released - write must succeed")
    assert(st2.listRuns(defaultOnly = false).count() == 1)
    st2.releaseWriterLock()
    st.releaseWriterLock()
  }

  test("two store INSTANCES on one root share mirrors and serialize " +
    "writers (review r9)") {
    val root = tmpDir("graft-two-inst")
    val a = new graft.store.ParquetStore(spark, root)
    val b = new graft.store.ParquetStore(spark, root)
    // concurrent run creation through BOTH instances must not lose
    // runs to interleaved pointer-table writes
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val latch = new java.util.concurrent.CountDownLatch(8)
    (0 until 8).foreach { i =>
      val store = if (i % 2 == 0) a else b
      pool.submit(new Runnable {
        def run(): Unit =
          try { store.createRun("m", s"s$i", "", ""); () }
          catch { case e: Throwable => errs.add(e) }
          finally latch.countDown()
      })
    }
    assert(latch.await(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(errs.isEmpty, s"concurrent instance writers threw: ${errs.peek()}")
    assert(a.listRuns(defaultOnly = false, None, None).count() == 8)
    // instance B sees a commit made through instance A (shared
    // manifest mirror — a private stale copy used to mask it)
    val run = a.getRun("m", "s0", Some(1))
    a.checkOut(run.runId, "u")
    a.initItem(run.runId, graft.store.ItemDef("p", graft.store.ItemType.Par,
      Nil, Nil))
    a.writeItemData(run.runId, "p",
      Seq((1.5, "km")).toDF("value", "unit"))
    a.commit(run.runId, "u", "via A")
    assert(b.itemData(run.runId, "p").count() == 1,
      "instance B must observe A's committed manifest")
    a.releaseWriterLock()
  }

  test("two instances, interleaved checkout/commit/discard under a " +
    "concurrent vacuum (VERDICT r9 ask #6)") {
    // The r8/r9 stress specs race CREATION and same-instance commits;
    // this one races the full edit lifecycle THROUGH BOTH instances —
    // each worker alternates which instance it checks out on, commits
    // even iterations and discards odd ones, while a third thread runs
    // vacuum() in a loop. A fresh store must then serve exactly the
    // last COMMITTED value per run: a discarded write surviving, a
    // lost commit, or a vacuum collecting a live generation all fail.
    val root = tmpDir("graft-inst-stress")
    val a = new graft.store.ParquetStore(spark, root)
    val b = new graft.store.ParquetStore(spark, root)
    val nRuns = 3
    val iters = graft.store.ParquetStore.KeepGens + 2 // force GC churn
    val runs = (0 until nRuns).map { i =>
      val r = a.createRun("m", s"s$i", "", "")
      a.checkOut(r.runId, "u")
      a.initItem(r.runId, graft.store.ItemDef("p",
        graft.store.ItemType.Par, Nil, Nil))
      a.writeItemData(r.runId, "p", Seq((0.0, "km")).toDF("value", "unit"))
      a.commit(r.runId, "u", "base")
      r
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nRuns + 1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val latch = new java.util.concurrent.CountDownLatch(nRuns)
    runs.zipWithIndex.foreach { case (r, i) =>
      pool.submit(new Runnable {
        def run(): Unit =
          try
            for (w <- 1 to iters) {
              val st = if ((i + w) % 2 == 0) a else b
              st.checkOut(r.runId, "u")
              st.writeItemData(r.runId, "p",
                Seq(((i * 1000 + w).toDouble, "km")).toDF("value", "unit"))
              // iters is even, so the LAST iteration always commits
              // and the expected final value is i*1000+iters
              if (w % 2 == 0) st.commit(r.runId, "u", s"w$w")
              else st.discardChanges(r.runId)
            }
          catch { case e: Throwable => errs.add(e) }
          finally latch.countDown()
      })
    }
    pool.submit(new Runnable {
      def run(): Unit =
        while (!done.get()) {
          try { a.vacuum(); () }
          catch { case e: Throwable => errs.add(e) }
          Thread.sleep(50)
        }
    })
    // stop the vacuum loop and the pool even when an assertion throws
    // (review r11: a worker deadlock — the bug class this hunts —
    // would otherwise leave the non-daemon vacuum thread spinning and
    // hang the JVM after the failure instead of reporting it)
    try {
      assert(latch.await(300, java.util.concurrent.TimeUnit.SECONDS),
        "lifecycle workers timed out")
    } finally {
      done.set(true)
      pool.shutdown()
      if (!pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS)) {
        pool.shutdownNow(); ()
      }
    }
    assert(errs.isEmpty, s"interleaved lifecycle threw: ${errs.peek()}")
    assert(iters % 2 == 0, "expected-value bookkeeping needs an even iters")
    val fresh = new graft.store.ParquetStore(spark, root)
    runs.zipWithIndex.foreach { case (r, i) =>
      val v = fresh.itemData(r.runId, "p").select("value").as[Double].head()
      assert(v == (i * 1000 + iters).toDouble,
        s"run ${r.runId}: fresh store read $v, want ${i * 1000 + iters}")
    }
    a.releaseWriterLock()
  }

  test("store guards: reserved item names, commit validation, codelist " +
    "defaults stay overridable (review r9)") {
    val st = new graft.store.ParquetStore(spark, tmpDir("graft-guards2"))
    val run = st.createRun("m", "s", "", "")
    // reserved fact-table names share the pointer keyspace
    intercept[IllegalArgumentException] {
      st.initItem(run.runId, graft.store.ItemDef("__ts",
        graft.store.ItemType.Par, Nil, Nil))
    }
    // commit of an unknown or not-checked-out run says so
    intercept[Exception](st.commit(9999L, "u", "boom"))
    intercept[IllegalArgumentException](st.commit(run.runId, "u", "boom"))
    // explicit add over an implicit default persists and is
    // authoritative (hierarchy/parent survive)
    st.addRegion("World", "country", Some("Earth"))
    val w = st.regions().filter(col("region") === "World").collect()
    assert(w.length == 1 && w.head.getString(1) == "country")
    // a synonym cannot shadow a real region
    intercept[IllegalArgumentException](st.addRegionSynonym("World", "GLB"))
    st.releaseWriterLock()
  }

  test("diff tracks key presence, not value null-ness (review r9)") {
    import graft.util.Util
    // a null first-value column on a key present in BOTH sides must
    // still read 'both'; key-only frames must not crash
    val a = Seq(("k1", Option.empty[Double]), ("k2", Option(1.0)))
      .toDF("key", "value")
    val b = Seq(("k1", Option(2.0)), ("k3", Option(3.0))).toDF("key", "value")
    val out = Util.diff(a, b, Seq("key")).collect()
      .map(r => r.getString(0) -> r.getAs[String]("merge_ind")).toMap
    assert(out == Map("k1" -> "both", "k2" -> "left_only", "k3" -> "right_only"))
    // key-only frames (set data): every column in `on`
    val sa = Seq(Tuple1("x"), Tuple1("y")).toDF("k")
    val sb = Seq(Tuple1("y"), Tuple1("z")).toDF("k")
    val so = Util.diff(sa, sb, Seq("k")).collect()
      .map(r => r.getString(0) -> r.getAs[String]("merge_ind")).toMap
    assert(so == Map("x" -> "left_only", "y" -> "both", "z" -> "right_only"))
  }

  test("updatePar drops within-new duplicate keys (keep=False, review r9)") {
    import graft.util.Util
    val existing = Seq(("a", 1.0)).toDF("k", "value")
    val incoming = Seq(("a", 9.0), ("b", 2.0), ("c", 3.0), ("c", 4.0))
      .toDF("k", "value")
    val out = Util.updatePar(existing, incoming, Seq("k"))
      .select("k").as[String].collect().toSeq
    // 'a' exists already, 'c' is internally duplicated -> both copies
    // dropped (the reference's drop_duplicates(keep=False)); only 'b'
    assert(out == Seq("b"))
  }
}
