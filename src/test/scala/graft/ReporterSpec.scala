package graft

import org.apache.spark.sql.functions._

import graft.core.Platform
import graft.model.DantzigModel
import graft.report.{Key, Operators, Quantity, Reporter}

/** Mirrors tests/report/test_reporter.py and test_operator.py behavior
  * on the Dantzig scenario. */
class ReporterSpec extends SparkSpec {
  import spark.implicits._

  private def solvedScenario() = {
    val mp = new Platform(spark, tmpDir("graft-rep"))
    val s = mp.newScenario("canning problem", "standard")
    s.checkOut()
    DantzigModel.initialize(s)
    s.commit("data")
    s.solve(DantzigModel)
    s
  }

  test("Key parse/format round-trip") {
    assert(Key.parse("d:i-j") == Key("d", Seq("i", "j")))
    assert(Key.parse("x:") == Key("x", Nil))
    assert(Key.parse("d:i-j:tag") == Key("d", Seq("i", "j"), Some("tag")))
    assert(Key("d", Seq("i", "j")).toString == "d:i-j")
  }

  test("from_scenario registers pars, var levels and margins") {
    val s = solvedScenario()
    val r = Reporter.fromScenario(s)
    assert(r.keys.contains("d:i-j"))
    assert(r.keys.contains("x:i-j"))
    assert(r.keys.contains("x-margin:i-j"))
    assert(r.keys.contains("z:"))
    val d = r.get("d:i-j")
    assert(d.unit == "km")
    assert(d.df.count() == 6)
  }

  test("add() invalidates stale inferred results; sets register as " +
    "indicator quantities (review r9)") {
    import spark.implicits._
    val s = solvedScenario()
    val r = Reporter.fromScenario(s)
    // cache an INFERRED partial sum under d:i
    val inferred = r.get("d:i").df.agg(org.apache.spark.sql.functions.sum("value"))
      .head().getDouble(0)
    assert(inferred > 0)
    // registering an exact node for the same key must win immediately
    r.addDf("d:i", () => Seq(("seattle", 99.0)).toDF("i", "value"), Seq("i"))
    val exact = r.get("d:i").df.collect()
    assert(exact.length == 1 && exact.head.getDouble(1) == 99.0,
      "a newly registered node must not be shadowed by a cached inference")
    // sets come through as element frames with value 1.0 (the mask form)
    val si = r.get("i")
    assert(si.dims == Seq("i") && si.unit == "")
    val elems = si.df.collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(elems == Map("seattle" -> 1.0, "san-diego" -> 1.0))
  }

  test("get resolves the canonical spelling of a bare-name registration " +
    "(review r12)") {
    val s = solvedScenario()
    val r = Reporter.fromScenario(s)
    // sets register under the bare name "i"; its canonical Key
    // spelling is "i:" — requesting that spelling used to recurse
    // get→compute→get to StackOverflowError (the superset resolver
    // returned a key whose toString was exactly the missing request)
    val viaCanonical = r.get("i:")
    val direct = r.get("i")
    assert(viaCanonical.dims == direct.dims &&
      viaCanonical.df.collect().toSet == direct.df.collect().toSet)
    assert(r.describe("i:").contains("spelled 'i'"), r.describe("i:"))
  }

  test("sums lattice is inferred lazily: d:i, d:j, d: (test_reporter.py:48-53)") {
    val s = solvedScenario()
    val r = Reporter.fromScenario(s)
    val di = r.get("d:i")
    val got = di.df.collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
    assert(math.abs(got("seattle") - 6.0) < 1e-9) // 2.5+1.7+1.8
    assert(math.abs(got("san-diego") - 5.7) < 1e-9) // 2.5+1.8+1.4
    val total = r.get("d:").df.as[Double].head()
    assert(math.abs(total - 11.7) < 1e-9)
  }

  test("quantity cache: repeated get is memory-served; writes invalidate") {
    val s = solvedScenario()
    val r = Reporter.fromScenario(s)
    val first = r.get("d:i")
    first.df.count() // force materialization into the persisted frame
    // cache hit: the SAME persisted Quantity comes back — no rebuild,
    // no new scan plan (CachingBackend semantics at quantity level)
    val second = r.get("d:i")
    assert(second eq first, "second get must return the cached quantity")
    assert(second.df.storageLevel.useMemory || second.df.storageLevel.useDisk)
    // any item write ticks store.mutationCount -> stale entry replaced
    s.transact("w") {
      s.addPar("d", Seq(("seattle", "new-york", 9.9, "km")).toDF("i", "j", "value", "unit"))
    }
    val third = r.get("d:i")
    assert(!(third eq first), "a store mutation must invalidate the cache")
    val got = third.df.collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
    assert(math.abs(got("seattle") - 13.4) < 1e-9) // 9.9 (upserted) + 1.7 + 1.8
    // filter-config change also clears
    r.setFilters(Map("i" -> Seq("seattle")))
    val filtered = r.get("d:i")
    assert(!(filtered eq third))
    assert(filtered.df.collect().map(_.getString(0)).toSet == Set("seattle"))
  }

  test("ex-ante filters are pushed into the leaf scan (test_reporter.py:207-278)") {
    val s = solvedScenario()
    val r = Reporter.fromScenario(s)
    r.setFilters(Map("i" -> Seq("seattle")))
    assert(r.get("d:i-j").df.count() == 3)
    assert(math.abs(r.get("d:").df.as[Double].head() - 6.0) < 1e-9)
    r.setFilters(Map.empty)
    assert(r.get("d:i-j").df.count() == 6)
  }

  test("rename_dims applied at registration and load (RENAME_DIMS)") {
    val s = solvedScenario()
    val rep = Reporter.fromScenario(s, renameDims = Map("i" -> "plant"))
    // keys carry the renamed dim
    assert(rep.keys.contains("d:plant-j"))
    val dq = rep.get("d:plant-j")
    assert(dq.df.columns.contains("plant"))
    // lattice inference works on renamed dims too
    assert(rep.get("d:plant").df.count() == 2)
    // filters are reverse-mapped before pushdown (operator.py:63-89)
    rep.setFilters(Map("plant" -> Seq("seattle")))
    assert(rep.get("d:plant-j").df.count() == 3)
  }

  test("product and ratio with unit algebra (#29, #44)") {
    val s = solvedScenario()
    val r = Reporter.fromScenario(s)
    val d = r.get("d:i-j")
    val f = r.get("f:")
    val cost = Operators.product(d, f)
    assert(cost.unit == "USD") // km * USD/km
    val got = cost.df.filter(col("i") === "seattle" && col("j") === "chicago")
      .select("value").as[Double].head()
    assert(math.abs(got - 1.7 * 90.0) < 1e-9)
    val back = Operators.ratio(cost, f)
    assert(back.unit == "km")
    // x * d = case-km shipped
    val xd = Operators.product(r.get("x:i-j"), d)
    assert(xd.dims.toSet == Set("i", "j"))
    assert(xd.df.count() == 6)
  }

  test("aggregate along a dim with named groups; keep=true appends") {
    val s = solvedScenario()
    val r = Reporter.fromScenario(s)
    val d = r.get("d:i-j")
    val agg = Operators.aggregate(d, "j",
      Map("east" -> Seq("new-york"), "central" -> Seq("chicago", "topeka")))
    val got = agg.df.collect()
      .map(row => (row.getString(0), row.getString(1)) -> row.getDouble(2)).toMap
    assert(math.abs(got(("seattle", "central")) - (1.7 + 1.8)) < 1e-9)
    val kept = Operators.aggregate(d, "j", Map("east" -> Seq("new-york")), keep = true)
    assert(kept.df.count() == 6 + 2)
  }

  test("relabel, index_to, combine, pow (genno operator parity)") {
    val s = solvedScenario()
    val r = Reporter.fromScenario(s)
    val d = r.get("d:i-j")
    // relabel: coords rename, values untouched, no re-aggregation
    val rl = Operators.relabel(d, Map("i" -> Map("seattle" -> "SEA")))
    assert(rl.df.filter(col("i") === "SEA").count() == 3)
    assert(rl.df.count() == d.df.count())
    // index_to: seattle row / its new-york value; base slice = 1.0
    val ix = Operators.indexTo(d, "j", "new-york")
    assert(ix.unit == "")
    val seaNy = d.df.filter(col("i") === "seattle" && col("j") === "new-york")
      .select("value").as[Double].head()
    val seaChi = d.df.filter(col("i") === "seattle" && col("j") === "chicago")
      .select("value").as[Double].head()
    val got = ix.df.filter(col("i") === "seattle" && col("j") === "chicago")
      .select("value").as[Double].head()
    assert(math.abs(got - seaChi / seaNy) < 1e-9)
    assert(ix.df.filter(col("j") === "new-york" && col("value") =!= 1.0).count() == 0)
    // combine: 2a - b with weights
    val c = Operators.combineWeighted(Seq(d, d), Seq(2.0, -1.0))
    val cv = c.df.filter(col("i") === "seattle" && col("j") === "chicago")
      .select("value").as[Double].head()
    assert(math.abs(cv - seaChi) < 1e-9, "2d - d = d")
    assert(c.unit == d.unit)
    // combine converts COMPATIBLE units into the head's unit (review
    // r13 — the add r11 defect in its weighted sibling: mixed units
    // used to sum raw magnitudes and blank the unit)
    val dm = d.copy(df = d.df.withColumn("value", col("value") * 1000),
      unit = "m")
    val cm = Operators.combineWeighted(Seq(d, dm), Seq(1.0, 1.0))
    assert(cm.unit == d.unit, s"unit must stay '${d.unit}', got '${cm.unit}'")
    val cmv = cm.df.filter(col("i") === "seattle" && col("j") === "chicago")
      .select("value").as[Double].head()
    assert(math.abs(cmv - 2 * seaChi) < 1e-9,
      s"1 km + 1000 m must combine to 2 km, got $cmv vs ${2 * seaChi}")
    // truly incompatible units raise instead of blanking
    intercept[IllegalArgumentException] {
      Operators.combineWeighted(Seq(d, d.copy(unit = "kg")), Seq(1.0, 1.0))
    }
    // pow: value squared, unit exponentiates (km -> km ** 2)
    val p2 = Operators.pow(d, 2)
    assert(p2.unit == "km ** 2")
    val pv = p2.df.filter(col("i") === "seattle" && col("j") === "chicago")
      .select("value").as[Double].head()
    assert(math.abs(pv - seaChi * seaChi) < 1e-9)
    assert(graft.util.Units.parse(p2.unit).pow(0).format == "")
  }

  test("interpolate linearly along a numeric dim; out-of-range drops") {
    import spark.implicits._
    val df = Seq(
      ("World", 2020, 10.0), ("World", 2030, 30.0), ("World", 2050, 70.0),
      ("North", 2020, 2.0), ("North", 2030, 6.0))
      .toDF("region", "year", "value")
    val q = Quantity(df, Seq("region", "year"), "EJ")
    val out = Operators.interpolate(q, "year", Seq(2020.0, 2025.0, 2040.0, 2060.0))
    // integral targets come back as integer-style STRING labels
    // ("2025", not 2025.0) so they merge with the original coordinate
    // labels downstream (review r9)
    val m = out.df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("World", "2020")) == 10.0, "existing coordinate passes through")
    assert(math.abs(m(("World", "2025")) - 20.0) < 1e-9, "midpoint of 10..30")
    assert(math.abs(m(("World", "2040")) - 50.0) < 1e-9, "midpoint of 30..70")
    assert(!m.contains(("World", "2060")), "beyond the range: dropped")
    assert(!m.contains(("North", "2040")), "per-group range respected")
    assert(math.abs(m(("North", "2025")) - 4.0) < 1e-9)
    assert(out.unit == "EJ")
  }

  test("broadcast_map re-aggregates along a category mapping (#25)") {
    val s = solvedScenario()
    s.transact("cats") {
      s.addCatElement("i", "west", Seq("seattle", "san-diego"))
    }
    val r = Reporter.fromScenario(s)
    val mapping = s.mapAsQty("i").filter(col("category") =!= "all")
    val q = Operators.broadcastMap(r.get("x:i-j"), mapping, "i", Some("region"))
    assert(q.dims == Seq("region", "j"))
    val west = q.df.filter(col("region") === "west")
      .select(sum("value")).as[Double].head()
    assert(math.abs(west - 900.0) < 1e-9) // all shipped cases: 325+300+275
  }

  test("mixed units are discarded with empty unit attr (#30)") {
    val s = solvedScenario()
    s.transact("mixed") {
      s.platform.addUnit("miles")
      s.addPar("d", Seq(("seattle", "topeka", 1.8, "miles")).toDF("i", "j", "value", "unit"))
    }
    val r = Reporter.fromScenario(s)
    assert(r.get("d:i-j").unit == "")
    // units/apply config overrides the discard (operator.py:114-139)
    r.unitOverrides = Map("d" -> "km")
    assert(r.get("d:i-j").unit == "km")
  }

  test("addFile registers a file node; describe explains resolution (reporting.rst:69,82)") {
    val s = solvedScenario()
    val r = Reporter.fromScenario(s)
    // file node: a CSV quantity joins the DAG like any scenario item
    val dir = tmpDir("graft-rep-file")
    val p = java.nio.file.Paths.get(dir, "prices.csv")
    java.nio.file.Files.writeString(p,
      "i,value\nseattle,2.0\nsan-diego,3.0\n")
    r.addFile("price:i", p.toString, spark, unit = "USD")
    val price = r.get("price:i")
    assert(price.unit == "USD")
    assert(price.df.collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
      == Map("seattle" -> 2.0, "san-diego" -> 3.0))
    // describe: registered vs inferred partial sum vs unresolvable
    assert(r.describe("price:i").contains("registered"))
    assert(r.describe("d:i") == "'d:i' = sum of 'd:i-j' over [j]")
    assert(r.describe("nope:x").contains("NOT RESOLVABLE"))
  }

  test("add converts compatible units and raises on incompatible ones " +
    "(review r11)") {
    val kg = Quantity(Seq(("x", 1.0)).toDF("i", "value"), Seq("i"), "kg")
    val t = Quantity(Seq(("x", 1.0)).toDF("i", "value"), Seq("i"), "t")
    // 1 kg + 1 t = 1001 kg (previously: raw 2.0 with a blanked unit)
    val sum1 = Operators.add(kg, t)
    assert(sum1.unit == "kg" &&
      sum1.df.agg(sum("value")).as[Double].head() == 1001.0)
    val cases = Quantity(Seq(("x", 1.0)).toDF("i", "value"), Seq("i"), "cases")
    intercept[IllegalArgumentException](Operators.add(kg, cases))
  }

  test("superset ties resolve deterministically; renameDims refuses a " +
    "populated graph (review r11)") {
    val r = new Reporter
    r.addDf("d:i-j", () => Seq(("a", "b", 1.0)).toDF("i", "j", "value"),
      Seq("i", "j"))
    r.addDf("d:i-k", () => Seq(("a", "c", 2.0)).toDF("i", "k", "value"),
      Seq("i", "k"))
    // equal-arity covering keys: lexicographic winner (d:i-j), every run
    assert(r.describe("d:i").contains("d:i-j"))
    assert(r.get("d:i").df.as[(String, Double)].collect().toSeq ==
      Seq(("a", 1.0)))
    // late renameDims would leave stale key strings over renamed data
    intercept[IllegalArgumentException] {
      r.renameDims = Map("i" -> "x")
    }
  }

  test("select, concat, add, disaggregate, toIamc") {
    val s = solvedScenario()
    val r = Reporter.fromScenario(s)
    val d = r.get("d:i-j")
    val sel = Operators.select(d, Map("i" -> Seq("seattle")))
    assert(sel.df.count() == 3)
    val both = Operators.concat(Seq(sel, Operators.select(d, Map("i" -> Seq("san-diego")))))
    assert(both.df.count() == 6)
    val doubled = Operators.add(d, d)
    assert(math.abs(doubled.df.agg(sum("value")).as[Double].head() - 23.4) < 1e-9)
    val shares = Seq(("h1", 0.4), ("h2", 0.6)).toDF("half", "share")
    val disagg = Operators.disaggregate(r.get("d:i"), shares, "half")
    assert(disagg.df.count() == 4)
    assert(math.abs(disagg.df.agg(sum("value")).as[Double].head() - 11.7) < 1e-9)
    val iamc = Operators.toIamc(r.get("x:i"), "canning problem", "standard",
      "shipments", regionDim = Some("i"), yearDim = None)
    assert(iamc.columns.toSeq == Seq("model", "scenario", "region", "variable", "unit", "value"))
    assert(iamc.count() == 2)
  }

  test("one-call IAMC export: wide column contract + CSV round-trip (reporting.rst:85)") {
    val s = solvedScenario()
    val r = Reporter.fromScenario(s)
    // region×year×tech quantity: tech must be SUMMED out, not dropped
    val df = Seq(
      ("seattle", 2020, "coal", 1.0), ("seattle", 2020, "wind", 0.5),
      ("seattle", 2030, "coal", 2.5),
      ("san-diego", 2020, "coal", 3.0), ("san-diego", 2030, "wind", 4.0))
      .toDF("region", "year", "tech", "value")
    r.addDf("emissions:region-year-tech", () => df,
      Seq("region", "year", "tech"), "Mt")
    val wide = r.toIamc("emissions:region-year-tech",
      "canning problem", "standard")
    // the reference column contract (backend/common.py:52 IAMC_IDX +
    // subannual + ascending year columns)
    assert(wide.columns.toSeq == Seq("model", "scenario", "region",
      "variable", "unit", "subannual", "2020", "2030"))
    val row = wide.filter(col("region") === "seattle").head()
    assert(row.getString(0) == "canning problem")
    assert(row.getString(1) == "standard")
    assert(row.getString(3) == "emissions")
    assert(row.getString(4) == "Mt")
    assert(row.getString(5) == "Year")
    assert(math.abs(row.getDouble(6) - 1.5) < 1e-9) // coal+wind summed
    assert(math.abs(row.getDouble(7) - 2.5) < 1e-9)
    // CSV sink round-trip: read-back equals the wide frame
    val out = tmpDir("graft-iamc")
    r.writeIamcCsv("emissions:region-year-tech", out,
      "canning problem", "standard")
    val back = spark.read.option("header", true).option("inferSchema", true)
      .csv(out)
    assert(back.columns.toSeq == wide.columns.toSeq)
    assert(back.count() == 2)
    val b = back.filter(col("region") === "san-diego").head()
    assert(math.abs(b.getDouble(6) - 3.0) < 1e-9)
    assert(math.abs(b.getDouble(7) - 4.0) < 1e-9)
  }

  test("sub, group_sum, round, clip, rename (genno long-tail operators)") {
    val df = Seq(("a", "x", 1.25), ("a", "y", 2.5),
      ("b", "x", 10.0), ("b", "y", -3.0)).toDF("r", "t", "value")
    val q = Quantity(df, Seq("r", "t"), "GW")

    // sub broadcasts on common dims like product/ratio; units must agree
    val half = Quantity(df.withColumn("value", col("value") / 2), Seq("r", "t"), "GW")
    val d = Operators.sub(q, half)
    assert(d.unit == "GW")
    val dm = d.df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(dm(("a", "x")) - 0.625) < 1e-12)
    assert(math.abs(dm(("b", "y")) - (-1.5)) < 1e-12)
    intercept[IllegalArgumentException](
      Operators.sub(q, Quantity(df, Seq("r", "t"), "km")))
    // COMPATIBLE units convert like add (review r12): b in MW scales
    // into a's GW — v/2 GW expressed as v*500 MW subtracts identically
    val halfMw = Quantity(df.withColumn("value", col("value") * 500),
      Seq("r", "t"), "MW")
    val d2 = Operators.sub(q, halfMw)
    assert(d2.unit == "GW")
    val dm2 = d2.df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(dm.forall { case (k, v) => math.abs(dm2(k) - v) < 1e-9 },
      s"MW-expressed subtrahend must convert: $dm2 vs $dm")

    // group_sum: sum over t within groups of r ≡ sumOver(keep = r)
    val gs = Operators.groupSum(q, group = "r", sum = "t")
    assert(gs.dims == Seq("r"))
    val gm = gs.df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(gm("a") - 3.75) < 1e-12 && math.abs(gm("b") - 7.0) < 1e-12)

    // round is half-even (xarray/numpy): 1.25 -> 1.2, 2.5 -> 2
    val r1 = Operators.round(q, 1).df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(r1(("a", "x")) == 1.2)
    val r0 = Operators.round(q).df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(r0(("a", "y")) == 2.0)

    // clip: one-sided and two-sided
    val c = Operators.clip(q, min = Some(0.0), max = Some(2.0)).df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(c(("b", "y")) == 0.0 && c(("b", "x")) == 2.0 && c(("a", "x")) == 1.25)

    // rename changes dim NAMES, not labels
    val rn = Operators.rename(q, Map("r" -> "region"))
    assert(rn.dims == Seq("region", "t"))
    assert(rn.df.columns.contains("region"))
    intercept[IllegalArgumentException](Operators.rename(q, Map("zz" -> "w")))

    // expand_dims adds a constant-label dim; mul/div are true aliases
    val ed = Operators.expandDims(q, "scenario", "base")
    assert(ed.dims == Seq("r", "t", "scenario"))
    assert(ed.df.select("scenario").distinct().collect().map(_.getString(0)).toSeq == Seq("base"))
    intercept[IllegalArgumentException](Operators.expandDims(q, "r", "x"))
    val viaMul = Operators.mul(q, half).df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val viaProduct = Operators.product(q, half).df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(viaMul == viaProduct)
    assert(Operators.div(q, half).unit == Operators.ratio(q, half).unit)
  }

  test("unit conversion: convert/apply/assign (pint linear semantics)") {
    val df = Seq(("a", 1.0), ("b", 2.5)).toDF("r", "value")
    val q = Quantity(df, Seq("r"), "GW")

    // strict convert: GW -> MW multiplies by 1000
    val mw = Operators.convertUnits(q, "MW")
    assert(mw.unit == "MW")
    val m = mw.df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(m("a") - 1000.0) < 1e-9 && math.abs(m("b") - 2500.0) < 1e-9)

    // compound: km/h -> m/s is /3.6
    val v = Operators.convertUnits(Quantity(df, Seq("r"), "km/h"), "m/s")
    val vm = v.df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(vm("b") - 2.5 * 1000.0 / 3600.0) < 1e-12)

    // incompatible dimensionality throws; applyUnits falls back to assign
    intercept[IllegalArgumentException](Operators.convertUnits(q, "km"))
    val ap = Operators.applyUnits(q, "km")
    assert(ap.unit == "km")
    assert(ap.df.collect().map(_.getDouble(1)).sorted.toSeq == Seq(1.0, 2.5))
    // applyUnits converts when compatible
    val ap2 = Operators.applyUnits(q, "MW")
    assert(math.abs(ap2.df.filter(col("r") === "a").head().getDouble(1) - 1000.0) < 1e-9)
    // assign never touches values
    val as = Operators.assignUnits(q, "Mt")
    assert(as.unit == "Mt" && as.df.filter(col("r") === "a").head().getDouble(1) == 1.0)

    // round-trip factor law: GW -> MW -> GW is identity
    val rt = Operators.convertUnits(mw, "GW")
    assert(math.abs(rt.df.filter(col("r") === "b").head().getDouble(1) - 2.5) < 1e-12)
  }

  test("write_report sinks a quantity as CSV and as a single xlsx workbook") {
    val df = Seq(("seattle", 2020, 1.5), ("san-diego", 2030, 4.0))
      .toDF("region", "year", "value")
    val q = Quantity(df, Seq("region", "year"), "Mt")

    val csvOut = tmpDir("graft-report-csv")
    Operators.writeReport(q, csvOut)
    val back = spark.read.option("header", true).option("inferSchema", true).csv(csvOut)
    assert(back.columns.toSeq == Seq("region", "year", "value", "unit"))
    assert(back.count() == 2)
    assert(back.filter(col("region") === "seattle").head().getDouble(2) == 1.5)
    assert(back.select("unit").distinct().head().getString(0) == "Mt")

    val xlsxOut = tmpDir("graft-report-x") + "/report.xlsx"
    Operators.writeReport(q, xlsxOut)
    val sheets = graft.io.Xlsx.read(xlsxOut)
    assert(sheets.map(_._1) == Seq("data"))
    val rows = sheets.head._2
    assert(rows.head == Seq("region", "year", "value", "unit"))
    assert(rows.tail.map(_.head).toSet == Set("seattle", "san-diego"))
    assert(rows.tail.forall(_.last == "Mt"))
  }
}
