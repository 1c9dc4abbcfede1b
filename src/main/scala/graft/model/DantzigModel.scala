package graft.model

import graft.core.Scenario

/** Native solve of Dantzig's transport LP (reference:
  * ixmp/model/dantzig.py:16-71 + model/dantzig.gms — min cost subject
  * to supply/demand; items i, j, a(i), b(j), d(i,j), f, x(i,j), z,
  * cost, supply(i), demand(j)). The GAMS subprocess of the reference is
  * replaced by [[Transport]] on collected driver data (2×3 keys —
  * SURVEY §3.3).
  */
object DantzigModel extends ModelAdapter {
  val name = "dantzig"

  /** Canonical input data (model/dantzig.py:37-71). */
  val plants = Seq("seattle", "san-diego")
  val markets = Seq("new-york", "chicago", "topeka")
  val capacity = Map("seattle" -> 350.0, "san-diego" -> 600.0)
  val demandQty = Map("new-york" -> 325.0, "chicago" -> 300.0, "topeka" -> 275.0)
  val distance = Map(
    ("seattle", "new-york") -> 2.5, ("seattle", "chicago") -> 1.7,
    ("seattle", "topeka") -> 1.8, ("san-diego", "new-york") -> 2.5,
    ("san-diego", "chicago") -> 1.8, ("san-diego", "topeka") -> 1.4)
  val freight = 90.0 // USD/case per thousand miles

  /** Populate the canonical scenario (mirrors ixmp.testing.make_dantzig,
    * testing/data.py:181-252). Requires a checked-out scenario. */
  override def initialize(s: Scenario): Unit = {
    import s.platform.spark.implicits._
    s.platform.addUnit("cases")
    s.platform.addUnit("km")
    s.platform.addUnit("USD/km")
    s.initSet("i")
    s.addSet("i", plants)
    s.initSet("j")
    s.addSet("j", markets)
    s.initPar("a", Seq("i"))
    s.addPar("a", plants.map(p => (p, capacity(p), "cases")).toDF("i", "value", "unit"))
    s.initPar("b", Seq("j"))
    s.addPar("b", markets.map(mk => (mk, demandQty(mk), "cases")).toDF("j", "value", "unit"))
    s.initPar("d", Seq("i", "j"))
    s.addPar("d", distance.toSeq.map { case ((i, j), v) => (i, j, v, "km") }
      .toDF("i", "j", "value", "unit"))
    s.initScalar("f", freight, "USD/km")
    s.initVar("z")
    s.initVar("x", Seq("i", "j"))
    s.initEqu("cost")
    s.initEqu("supply", Seq("i"))
    s.initEqu("demand", Seq("j"))
  }

  override def run(s: Scenario): Unit = {
    import s.platform.spark.implicits._
    val is = s.set("i").as[String].collect().toSeq.sorted
    val js = s.set("j").as[String].collect().toSeq.sorted
    val a = s.par("a").select("i", "value").as[(String, Double)].collect().toMap
    val b = s.par("b").select("j", "value").as[(String, Double)].collect().toMap
    val dist = s.par("d").select("i", "j", "value").as[(String, String, Double)]
      .collect().map { case (i, j, v) => (i, j) -> v }.toMap
    val f = s.scalar("f")._1

    // GAMS missing-value semantics (review r9): a parameter entry
    // absent from the data is 0, not a crash — a cloned scenario with
    // an added plant but sparse d/a/b rows must still solve
    val cost = Array.tabulate(is.length, js.length)((ii, jj) =>
      f * dist.getOrElse((is(ii), js(jj)), 0.0) / 1000.0)
    val sol = Transport.solve(cost,
      is.map(a.getOrElse(_, 0.0)).toArray, js.map(b.getOrElse(_, 0.0)).toArray)

    val xRows = for (ii <- is.indices; jj <- js.indices) yield
      (is(ii), js(jj), sol.flows.getOrElse((ii, jj), 0.0), sol.reducedCost(ii)(jj))
    s.setSolution("x", xRows.toDF("i", "j", "lvl", "mrg"))
    s.setSolution("z", Seq((sol.objective, 0.0)).toDF("lvl", "mrg"))
    s.setSolution("cost", Seq((sol.objective, 1.0)).toDF("lvl", "mrg"))
    val supplyRows = is.indices.map { ii =>
      val shipped = js.indices.map(jj => sol.flows.getOrElse((ii, jj), 0.0)).sum
      (is(ii), shipped, sol.supplyDual(ii))
    }
    s.setSolution("supply", supplyRows.toDF("i", "lvl", "mrg"))
    val demandRows = js.indices.map { jj =>
      val recvd = is.indices.map(ii => sol.flows.getOrElse((ii, jj), 0.0)).sum
      (js(jj), recvd, sol.demandDual(jj))
    }
    s.setSolution("demand", demandRows.toDF("j", "lvl", "mrg"))
  }
}
