package graft

import org.apache.spark.sql.functions._

import graft.core.Platform
import graft.model.DantzigModel

/** End-to-end slice of SURVEY §7.3 plus the API-semantics contracts of
  * §7.5 (mirrors tests/core/test_scenario.py and test_timeseries.py). */
class CoreSpec extends SparkSpec {
  import spark.implicits._

  private def dantzigScenario() = {
    val mp = new Platform(spark, tmpDir("graft-core"))
    // TS fixture units (reference test style: non-default units are
    // explicitly registered; the store enforces the codelist as of r9)
    Seq("USD", "mio", "GW", "shape").foreach(mp.addUnit)
    val s = mp.newScenario("canning problem", "standard", scheme = "dantzig")
    s.checkOut()
    DantzigModel.initialize(s)
    s.commit("dantzig data")
    s.setAsDefault()
    (mp, s)
  }

  test("scenario round-trip: init/add/read sets and pars, filtered scan") {
    val (mp, s) = dantzigScenario()
    assert(s.setList() == Seq("i", "j"))
    assert(s.parList() == Seq("a", "b", "d", "f"))
    assert(s.set("i").as[String].collect().toSet == Set("seattle", "san-diego"))
    // filtered scan with a silently-ignored absent value (base.py:997-1005)
    val d = s.par("d", Map("i" -> Seq("seattle", "no-such-plant")))
    assert(d.count() == 3)
    assert(d.columns.toSeq == Seq("i", "j", "value", "unit"))
    // int filter values are str-coerced (test_scenario.py:920-953 analog)
    s.transact("add int-keyed rows") {
      s.addSet("i", Seq(42))
      s.addPar("d", Seq(("42", "topeka", 1.5, "km")).toDF("i", "j", "value", "unit"))
    }
    assert(s.par("d", Map("i" -> Seq(42))).count() == 1)
    // default-version read-back
    val again = mp.getScenario("canning problem", "standard")
    assert(again.version == s.version && again.runId == s.runId)
  }

  test("key validation: missing set element raises the reference error") {
    val (_, s) = dantzigScenario()
    s.checkOut()
    val err = intercept[IllegalArgumentException] {
      s.addPar("d", Seq(("atlantis", "topeka", 1.0, "km")).toDF("i", "j", "value", "unit"))
    }
    assert(err.getMessage.contains("The index set 'i' does not have an element 'atlantis'!"))
    s.discard()
  }

  test("scalar init/read/change (0-D parameter as value+unit dict)") {
    val (_, s) = dantzigScenario()
    assert(s.scalar("f") == ((90.0, "USD/km")))
    s.transact("re-freight") { s.changeScalar("f", 95.0, "USD/km") }
    assert(s.scalar("f") == ((95.0, "USD/km")))
  }

  test("addPar upserts on key; updatePar only adds new keys") {
    val (_, s) = dantzigScenario()
    s.transact("upsert") {
      s.addPar("d", Seq(("seattle", "chicago", 9.9, "km")).toDF("i", "j", "value", "unit"))
    }
    val v = s.par("d", Map("i" -> Seq("seattle"), "j" -> Seq("chicago")))
      .select("value").as[Double].head()
    assert(v == 9.9)
    s.transact("update_par ignores existing keys") {
      s.updatePar("d", Seq(
        ("seattle", "chicago", 1.0, "km"), // existing key: ignored
        ("san-diego", "chicago", 7.7, "km") // existing key: ignored
      ).toDF("i", "j", "value", "unit"))
    }
    assert(s.par("d", Map("i" -> Seq("seattle"), "j" -> Seq("chicago")))
      .select("value").as[Double].head() == 9.9)
    assert(s.par("d").count() == 6)
  }

  test("removeSet/removePar/deleteItem") {
    val (_, s) = dantzigScenario()
    s.transact("removals") {
      s.removePar("d", Seq(("seattle", "topeka")).toDF("i", "j"))
    }
    assert(s.par("d").count() == 5)
    assert(s.itemsIndexedBy("i").toSet == Set("a", "d", "supply", "x"))
    s.transact("drop whole item") { s.deleteItem("b") }
    assert(!s.hasItem("b"))
    assert(s.parList() == Seq("a", "d", "f"))
    // type guards are symmetric (review r12): a SET addressed through
    // the PAR api must refuse, not silently anti-join its rows away
    s.transact("wrong-type removal refused") {
      val e = intercept[IllegalArgumentException] {
        s.removePar("i", Seq(Tuple1("seattle")).toDF("i"))
      }
      assert(e.getMessage.contains("not a parameter"))
    }
    assert(s.set("i").count() == 2, "the set must be untouched")
  }

  test("solve writes solution; golden objective z=153.675; removeSolution clears") {
    val (_, s) = dantzigScenario()
    assert(!s.hasSolution)
    s.solve(DantzigModel)
    assert(s.hasSolution)
    val z = s.variable("z").select("lvl").as[Double].head()
    assert(math.abs(z - 153.675) < 1e-9)
    val x = s.variable("x").collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(x(("seattle", "chicago")) == 300.0)
    assert(x(("san-diego", "topeka")) == 275.0)
    assert(x(("seattle", "new-york")) + x(("san-diego", "new-york")) == 325.0)
    // supply levels respect capacity
    val sup = s.equation("supply").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sup("seattle") <= 350.0 + 1e-9 && sup("san-diego") <= 600.0 + 1e-9)
    s.removeSolution()
    assert(!s.hasSolution)
    // solve() refuses when a solution exists
    s.solve(DantzigModel)
    val err = intercept[IllegalArgumentException](s.solve(DantzigModel))
    assert(err.getMessage.contains("solution"))
  }

  test("transaction guards: no clone/removeSolution on a checked-out run; " +
    "codelist enforcement; named scalar errors (review r9)") {
    val (mp, s) = dantzigScenario()
    s.solve(graft.model.DantzigModel)
    // mutating a live transaction's run from the side is refused
    s.checkOut()
    val e1 = intercept[IllegalArgumentException](s.removeSolution())
    assert(e1.getMessage.contains("checked-out"))
    val e2 = intercept[IllegalArgumentException](s.cloneScenario())
    assert(e2.getMessage.contains("checked-out"))
    // unregistered unit/region on the TS write path fail loudly
    // instead of silently fragmenting the fact table
    val e3 = intercept[IllegalArgumentException] {
      s.addTimeseries(Seq(("World", "GDP", "XyzCoin", 2020, 1.0))
        .toDF("region", "variable", "unit", "year", "value"))
    }
    assert(e3.getMessage.contains("XyzCoin"))
    val e4 = intercept[IllegalArgumentException] {
      s.addTimeseries(Seq(("Wrold", "GDP", "USD", 2020, 1.0))
        .toDF("region", "variable", "unit", "year", "value"))
    }
    assert(e4.getMessage.contains("Wrold"))
    // a null upsert key can never be replaced or removed (the
    // anti-join's EqualTo never matches null) — refuse it loudly
    // instead of silently accumulating duplicates on re-add
    val e4b = intercept[IllegalArgumentException] {
      s.addTimeseries(Seq((Some("World"), None: Option[String],
          Some("USD"), Some(2020), Some(1.0)))
        .toDF("region", "variable", "unit", "year", "value"))
    }
    assert(e4b.getMessage.contains("non-null variable"), e4b.getMessage)
    // 0-D SET is not a scalar (the idxNames-only guard let it through
    // to a raw unresolved-column error)
    s.initSet("flag")
    val e5 = intercept[IllegalArgumentException](s.changeScalar("flag", 1.0, "km"))
    assert(e5.getMessage.contains("not a scalar"))
    // declared-but-never-assigned scalar reads give a named error
    s.initPar("fee", Seq.empty)
    val e6 = intercept[IllegalArgumentException](s.scalar("fee"))
    assert(e6.getMessage.contains("no value assigned"))
    s.discard()
    // committed again: removeSolution works
    s.removeSolution()
    assert(!s.hasSolution)
    // the defaults are implicit: a FRESH platform knows World and the
    // reference unit list without any constructor write
    val fresh = new Platform(spark, tmpDir("graft-defaults"))
    assert(fresh.units().contains("cases") && fresh.units().contains("km"))
    assert(fresh.regions().filter(col("region") === "World").count() == 1)
    assert(fresh.timeslices().filter(col("name") === "Year").count() == 1)
  }

  test("clone: data copy, keepSolution=false, shiftFirstModelYear truncation") {
    val (mp, s) = dantzigScenario()
    s.solve(DantzigModel)
    s.transact("ts", discardOnError = true) {
      s.addTimeseries(Seq(
        ("World", "GDP", "USD", 2005, 1.0), ("World", "GDP", "USD", 2010, 2.0))
        .toDF("region", "variable", "unit", "year", "value"))
      s.addTimeseries(Seq(("World", "Pop", "mio", 2005, 6.5))
        .toDF("region", "variable", "unit", "year", "value"), meta = true)
    }
    val full = s.cloneScenario(scenario = Some("clone-full"))
    assert(full.runId != s.runId)
    assert(full.par("d").count() == 6)
    assert(full.hasSolution)
    assert(full.timeseries().count() == 3)

    val bare = s.cloneScenario(scenario = Some("clone-bare"), keepSolution = false)
    assert(!bare.hasSolution)
    assert(bare.timeseries().count() == 1) // only the meta row survives

    val shifted = s.cloneScenario(scenario = Some("clone-shift"),
      shiftFirstModelYear = Some(2010))
    assert(!shifted.hasSolution)
    // meta row + pre-2010 non-meta rows survive
    assert(shifted.timeseries().select("year").as[Int].collect().sorted.toSeq
      == Seq(2005, 2005))
    assert(mp.scenarioList(defaultOnly = false).count() == 4)
  }

  test("timeseries: wide input, year_lim, IAMC pivot, subannual drop, remove") {
    val (_, s) = dantzigScenario()
    s.transact("wide add") {
      s.addTimeseries(Seq(("World", "GDP", "USD", 1.0, 2.0, 3.0))
        .toDF("region", "variable", "unit", "2000", "2005", "2010"),
        yearLim = (Some(2003), None))
    }
    val long = s.timeseries()
    assert(long.select("year").as[Int].collect().sorted.toSeq == Seq(2005, 2010))
    assert(!long.columns.contains("subannual")) // homogeneous "Year" dropped
    val wide = s.timeseries(iamc = true)
    assert(wide.columns.contains("2005") && wide.columns.contains("2010"))
    assert(wide.count() == 1)
    s.transact("remove one year") {
      s.removeTimeseries(Seq(("World", "GDP", "USD", 2005))
        .toDF("region", "variable", "unit", "year"))
    }
    assert(s.timeseries().select("year").as[Int].collect().toSeq == Seq(2010))
  }

  test("subannual column survives when heterogeneous (timeseries.py:470-479)") {
    val (_, s) = dantzigScenario()
    s.transact("subannual") {
      s.addTimeseries(Seq(
        ("World", "Load", "GW", "Summer", 2020, 1.0),
        ("World", "Load", "GW", "Winter", 2020, 2.0))
        .toDF("region", "variable", "unit", "subannual", "year", "value"))
    }
    val long = s.timeseries()
    assert(long.columns.contains("subannual"))
    assert(long.select("subannual").as[String].collect().sorted.toSeq
      == Seq("Summer", "Winter"))
  }

  test("repeated index set with distinct idx_names (item.py coords vs dims)") {
    val (_, s) = dantzigScenario()
    s.transact("matrix") {
      s.initPar("dist2", Seq("i", "i"), Seq("i_from", "i_to"))
      s.addPar("dist2", Seq(("seattle", "san-diego", 2.0, "km"))
        .toDF("i_from", "i_to", "value", "unit"))
    }
    assert(s.idxSets("dist2") == Seq("i", "i"))
    assert(s.idxNames("dist2") == Seq("i_from", "i_to"))
    assert(s.par("dist2", Map("i_from" -> Seq("seattle"))).count() == 1)
    // both dims validate against set i
    val err = intercept[IllegalArgumentException] {
      s.transact("bad") {
        s.addPar("dist2", Seq(("seattle", "mars", 1.0, "km"))
          .toDF("i_from", "i_to", "value", "unit"))
      }
    }
    assert(err.getMessage.contains("The index set 'i' does not have an element 'mars'!"))
  }

  test("cross-platform clone (scenario.py:870-945 CrossPlatformClone)") {
    val (_, s) = dantzigScenario()
    s.solve(DantzigModel)
    val mp2 = new Platform(spark, tmpDir("graft-dest"))
    val copied = s.cloneScenario(platformDest = Some(mp2))
    assert(copied.platform eq mp2)
    assert(copied.par("d").count() == 6)
    assert(copied.hasSolution)
    assert(mp2.getScenario("canning problem", "standard").runId == copied.runId)
  }

  test("region synonym resolution on TS write (platform.py:335-349)") {
    val (mp, s) = dantzigScenario()
    mp.addRegion("United States", "country")
    mp.addRegionSynonym("US", "United States")
    s.transact("synonym write") {
      s.addTimeseries(Seq(("US", "GDP", "USD", 2020, 21.0))
        .toDF("region", "variable", "unit", "year", "value"))
    }
    assert(s.timeseries().select("region").as[String].head() == "United States")
    // synonym-keyed DELETE resolves like the write (review r12): the
    // data lives under the canonical region, so an unresolved "US" key
    // would anti-join nothing and silently keep the row
    s.transact("synonym remove") {
      s.removeTimeseries(Seq(("US", "GDP", "USD", 2020))
        .toDF("region", "variable", "unit", "year"))
    }
    assert(s.timeseries().count() == 0,
      "a synonym-keyed remove must delete the canonical-region row")
  }

  test("geodata round-trip with string values") {
    val (_, s) = dantzigScenario()
    s.transact("geo") {
      s.addGeodata(Seq(("World", "boundary", "shape", 2020, "POLYGON((0 0))"))
        .toDF("region", "variable", "unit", "year", "value"))
    }
    assert(s.getGeodata().select("value").as[String].head() == "POLYGON((0 0))")
    s.transact("geo remove") {
      s.removeGeodata(Seq(("World", "boundary", "shape", 2020))
        .toDF("region", "variable", "unit", "year"))
    }
    assert(s.getGeodata().count() == 0)
  }

  test("meta: target hierarchy, cross-target name uniqueness, coalescing (#24)") {
    val (mp, s) = dantzigScenario()
    mp.setMeta("author", "\"model-level\"", model = Some(s.model))
    // coalescing: a version-level read falls back to the (m,) target
    val fallback = mp.getMeta(Some(s.model), Some(s.scenario), Some(s.version))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fallback("author") == "\"model-level\"")
    // a name is unique ACROSS targets (data-model.rst:145-169): writing
    // the same name on a more specific target replaces the old row
    mp.setMeta("author", "\"version-level\"", model = Some(s.model),
      scenario = Some(s.scenario), version = Some(s.version))
    mp.setMeta("reviewed", "true", model = Some(s.model), scenario = Some(s.scenario))
    val m = mp.getMeta(Some(s.model), Some(s.scenario), Some(s.version))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("author") == "\"version-level\"")
    assert(m("reviewed") == "true") // coalesced from (m,s)
    assert(mp.getMeta(Some(s.model), None, None, strict = true).count() == 0)
    mp.removeMeta(Seq("author"), model = Some(s.model),
      scenario = Some(s.scenario), version = Some(s.version))
    assert(mp.getMeta(Some(s.model), Some(s.scenario), Some(s.version)).count() == 1)
  }

  test("categories: cat_list/cat_get/cat_set with is_unique (#52)") {
    val (_, s) = dantzigScenario()
    s.transact("cats") {
      s.addCatElement("i", "west-coast", Seq("seattle", "san-diego"))
      s.addCatElement("i", "favorite", Seq("seattle"), isUnique = true)
      s.addCatElement("i", "favorite", Seq("san-diego"), isUnique = true) // replaces
    }
    assert(s.catList("i") == Seq("favorite", "west-coast"))
    assert(s.cat("i", "west-coast") == Seq("san-diego", "seattle"))
    assert(s.cat("i", "favorite") == Seq("san-diego"))
    val err = intercept[IllegalArgumentException] {
      s.transact("bad")(s.addCatElement("i", "bad", Seq("atlantis")))
    }
    assert(err.getMessage.contains("does not have an element 'atlantis'"))
    // map_as_qty adds the 'all' row per element (operator.py:225-229)
    val qty = s.mapAsQty("i")
    assert(qty.filter(col("category") === "all").count() == 2)
  }

  test("checkout discipline: writes require checkOut; double checkout rejected") {
    val (_, s) = dantzigScenario()
    val err = intercept[IllegalArgumentException](s.addSet("i", Seq("boston")))
    assert(err.getMessage.contains("not checked out"))
    s.checkOut()
    intercept[IllegalArgumentException](s.checkOut())
    s.discard()
  }

  test("scenarioList + describeScenarios + export across runs") {
    val mp = new Platform(spark, tmpDir("graft-platform"))
    mp.addUnit("USD")
    val s1 = mp.newScenario("m", "s")
    s1.transact("ts") {
      s1.addTimeseries(Seq(("World", "GDP", "USD", 2020, 1.0))
        .toDF("region", "variable", "unit", "year", "value"))
    }
    s1.setAsDefault()
    val s2 = mp.newScenario("m", "s") // version 2, not default
    s2.transact("ts") {
      s2.addTimeseries(Seq(("World", "GDP", "USD", 2020, 2.0))
        .toDF("region", "variable", "unit", "year", "value"))
    }
    assert(mp.scenarioList().count() == 1)
    assert(mp.scenarioList(defaultOnly = false).count() == 2)
    // 13-column FIELDS["get_scenarios"] inventory with audit stamps
    assert(mp.scenarioList().columns.toSeq == Seq(
      "model", "scenario", "scheme", "is_default", "is_locked",
      "cre_user", "cre_date", "upd_user", "upd_date",
      "lock_user", "lock_date", "annotation", "version"))
    val inv = mp.scenarioList().collect().head
    assert(!inv.getAs[Boolean]("is_locked"))
    assert(inv.getAs[String]("cre_date") != null)
    assert(inv.getAs[String]("upd_date") != null)   // stamped by commit
    assert(inv.getAs[String]("lock_date") == null)  // released
    assert(s1.lastUpdate.isDefined)
    val desc = mp.describeScenarios().collect().head
    assert(desc.getAs[Long]("n") == 2 && desc.getAs[Int]("max_version") == 2
      && desc.getAs[Int]("default_version") == 1)
    // export: default runs only vs all runs, IAMC upper-case columns
    val exp = mp.exportTimeseriesData()
    assert(exp.columns.contains("MODEL") && exp.count() == 1)
    assert(exp.select("VALUE").as[Double].head() == 1.0)
    assert(mp.exportTimeseriesData(defaultOnly = false).count() == 2)
  }

  test("fromUrl resolves coordinates (util/__init__.py:340-408)") {
    val mp = new Platform(spark, tmpDir("graft-url"))
    val s = mp.newScenario("m", "s")
    s.setAsDefault()
    assert(mp.fromUrl("m/s").runId == s.runId)
    assert(mp.fromUrl(s"m/s#${s.version}").runId == s.runId)
    assert(mp.fromUrl("m/s#new").runId != s.runId)
  }
}
