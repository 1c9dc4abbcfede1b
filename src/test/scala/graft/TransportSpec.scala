package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Transport

class TransportSpec extends AnyFunSuite {

  test("Dantzig canonical 2x3: optimal objective 153.675 and flows") {
    // rows: seattle, san-diego; cols: new-york, chicago, topeka
    val cost = Array(
      Array(0.225, 0.153, 0.162),
      Array(0.225, 0.162, 0.126))
    val sol = Transport.solve(cost,
      Array(350.0, 600.0), Array(325.0, 300.0, 275.0))
    assert(math.abs(sol.objective - 153.675) < 1e-9)
    assert(sol.flows((0, 1)) == 300.0) // seattle -> chicago
    assert(sol.flows((1, 2)) == 275.0) // san-diego -> topeka
    assert(sol.flows.getOrElse((0, 0), 0.0) + sol.flows.getOrElse((1, 0), 0.0) == 325.0)
    // optimality: all reduced costs non-negative
    assert(sol.reducedCost.flatten.forall(_ >= -1e-9))
  }

  test("balanced problem (no slack column)") {
    val sol = Transport.solve(
      Array(Array(4.0, 6.0), Array(5.0, 3.0)),
      Array(10.0, 10.0), Array(10.0, 10.0))
    assert(sol.objective == 4.0 * 10 + 3.0 * 10)
    assert(sol.flows == Map((0, 0) -> 10.0, (1, 1) -> 10.0))
  }

  test("degenerate and skewed instances stay optimal") {
    // supply exactly covers one column each; forces degenerate pivots
    val sol = Transport.solve(
      Array(Array(1.0, 100.0, 100.0), Array(100.0, 1.0, 100.0), Array(100.0, 100.0, 1.0)),
      Array(5.0, 5.0, 5.0), Array(5.0, 5.0, 5.0))
    assert(math.abs(sol.objective - 15.0) < 1e-9)
    // 1x1
    val tiny = Transport.solve(Array(Array(2.0)), Array(3.0), Array(3.0))
    assert(tiny.objective == 6.0)
    // oversupply everywhere
    val slacky = Transport.solve(Array(Array(2.0, 1.0)), Array(100.0), Array(10.0, 20.0))
    assert(math.abs(slacky.objective - (2.0 * 10 + 1.0 * 20)) < 1e-9)
  }

  test("duals satisfy complementary slackness when row 0 is capacity-bound") {
    // row 0 is fully used, row 1 holds 9 units of slack: the slack
    // row's shadow price must be ZERO (the old u(0)=0 normalization
    // shifted every marginal by a constant here; reduced costs are
    // shift-invariant, so optimality checks never noticed)
    val sol = graft.model.Transport.solve(
      cost = Array(Array(1.0), Array(5.0)),
      supply = Array(1.0, 10.0), demand = Array(2.0))
    assert(math.abs(sol.supplyDual(1)) < 1e-9,
      s"slack row must price at zero, got ${sol.supplyDual(1)}")
    // the marginal unit comes from plant 1 at cost 5
    assert(math.abs(sol.demandDual(0) - 5.0) < 1e-9)
    // plant 0's capacity is worth the cost difference it saves
    assert(math.abs(sol.supplyDual(0) - (-4.0)) < 1e-9)
  }

  test("infeasible demand raises") {
    intercept[IllegalArgumentException] {
      Transport.solve(Array(Array(1.0)), Array(1.0), Array(2.0))
    }
  }

  test("random instances: objective matches brute-force enumeration") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val m = 2 + rng.nextInt(2)
      val n = 2 + rng.nextInt(2)
      val cost = Array.fill(m, n)(1.0 + rng.nextInt(9))
      val demand = Array.fill(n)(1.0 + rng.nextInt(5))
      val supply = Array.fill(m)(1.0 + rng.nextInt(5))
      val total = math.max(supply.sum, demand.sum)
      supply(0) += math.max(0, total - supply.sum) // ensure feasible
      val sol = Transport.solve(cost, supply, demand)
      // verify feasibility
      for (i <- 0 until m)
        assert((0 until n).map(j => sol.flows.getOrElse((i, j), 0.0)).sum <= supply(i) + 1e-6)
      for (j <- 0 until n)
        assert((0 until m).map(i => sol.flows.getOrElse((i, j), 0.0)).sum >= demand(j) - 1e-6)
      // optimality via reduced costs
      assert(sol.reducedCost.flatten.forall(_ >= -1e-6))
    }
  }
}
