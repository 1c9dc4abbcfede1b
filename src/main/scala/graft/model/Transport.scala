package graft.model

import scala.collection.mutable

/** Driver-side transportation-problem solver (MODI / u-v method over a
  * northwest-corner initial basis). Problem sizes here are tiny — the
  * canonical Dantzig LP is 2×3 (reference model/dantzig.py:16-71) — so
  * a collected driver solve is the right tool; the distributed layer is
  * only responsible for assembling inputs and storing the solution.
  *
  * minimize    sum_ij c(i,j) x(i,j)
  * subject to  sum_j x(i,j) <= supply(i)     (slack absorbed by a
  *             sum_i x(i,j) >= demand(j)      zero-cost dummy column)
  *             x >= 0
  */
object Transport {

  final case class Solution(
      flows: Map[(Int, Int), Double],
      objective: Double,
      supplyDual: Array[Double],
      demandDual: Array[Double],
      reducedCost: Array[Array[Double]])

  private val Eps = 1e-9

  def solve(cost: Array[Array[Double]], supply: Array[Double],
      demand: Array[Double]): Solution = {
    val m = supply.length
    val n = demand.length
    val slack = supply.sum - demand.sum
    require(slack >= -Eps, "infeasible: demand exceeds supply")
    val nn = if (slack > Eps) n + 1 else n
    val c = Array.tabulate(m, nn)((i, j) => if (j < n) cost(i)(j) else 0.0)
    val d = Array.tabulate(nn)(j => if (j < n) demand(j) else slack)

    // --- northwest-corner initial basic feasible solution -------------
    // Advancing exactly one index per step yields m+nn-1 basic cells,
    // i.e. a spanning tree of the bipartite row/col graph.
    val x = Array.fill(m, nn)(0.0)
    val basis = mutable.Set.empty[(Int, Int)]
    val sRem = supply.clone()
    val dRem = d.clone()
    var i = 0
    var j = 0
    while (i < m && j < nn) {
      val q = math.min(sRem(i), dRem(j))
      x(i)(j) = q
      basis += ((i, j))
      sRem(i) -= q
      dRem(j) -= q
      if (i == m - 1 && j == nn - 1) { i += 1; j += 1 }
      else if (sRem(i) <= Eps && i < m - 1) i += 1
      else j += 1
    }

    // --- MODI iterations ----------------------------------------------
    // the cap is a cycling backstop (most-negative-rc entering rule,
    // no Bland fallback); hitting it means the returned basis may be
    // suboptimal, which must be an ERROR, not a silent wrong solution
    var iter = 0
    var improved = true
    while (improved && iter < 10000) {
      iter += 1
      val (u, v) = duals(c, basis, m, nn)
      var enter: Option[(Int, Int)] = None
      var bestRc = -1e-7
      for (i <- 0 until m; j <- 0 until nn if !basis.contains((i, j))) {
        val rc = c(i)(j) - u(i) - v(j)
        if (rc < bestRc) { bestRc = rc; enter = Some((i, j)) }
      }
      enter match {
        case None => improved = false
        case Some(e) =>
          val cycle = findCycle(basis, e)
          val minusCells = cycle.zipWithIndex.collect { case (cell, k) if k % 2 == 1 => cell }
          val theta = minusCells.map { case (ci, cj) => x(ci)(cj) }.min
          cycle.zipWithIndex.foreach { case ((ci, cj), k) =>
            if (k % 2 == 0) x(ci)(cj) += theta else x(ci)(cj) -= theta
          }
          // leave: a minus-cell driven to zero (deterministic tie-break)
          val leave = minusCells.filter { case (ci, cj) => x(ci)(cj) <= Eps }
            .minBy(identity)
          basis -= leave
          basis += e
      }
    }
    require(!improved, "Transport.solve: MODI failed to converge (cycling?)")

    val (u0, v0) = duals(c, basis, m, nn)
    // Normalize the dual constant so the DUMMY (slack) column prices at
    // zero — complementary slackness: unused capacity has no shadow
    // price. The u(0)=0 convention alone shifted every reported
    // marginal by a constant whenever row 0 held no slack (reduced
    // costs are shift-invariant, which is why optimality checks never
    // noticed). Balanced problems (no dummy) keep u(0)=0 — their duals
    // are only defined up to a constant anyway.
    val shift = if (nn > n) v0(n) else 0.0
    val u = u0.map(_ + shift)
    val v = v0.map(_ - shift)
    val rc = Array.tabulate(m, n)((i, j) => c(i)(j) - u(i) - v(j))
    val flows = (for (i <- 0 until m; j <- 0 until n if x(i)(j) > Eps)
      yield (i, j) -> x(i)(j)).toMap
    val obj = (for (i <- 0 until m; j <- 0 until n) yield cost(i)(j) * x(i)(j)).sum
    Solution(flows, obj, u.take(m), v.take(n), rc)
  }

  /** Solve u_i + v_j = c_ij over the basic cells (u_0 = 0). */
  private def duals(c: Array[Array[Double]], basis: mutable.Set[(Int, Int)],
      m: Int, n: Int): (Array[Double], Array[Double]) = {
    val u = Array.fill(m)(Double.NaN)
    val v = Array.fill(n)(Double.NaN)
    u(0) = 0.0
    var changed = true
    while (changed) {
      changed = false
      for ((i, j) <- basis) {
        if (!u(i).isNaN && v(j).isNaN) { v(j) = c(i)(j) - u(i); changed = true }
        else if (u(i).isNaN && !v(j).isNaN) { u(i) = c(i)(j) - v(j); changed = true }
      }
    }
    // an unreachable dual means the basis lost spanning-tree
    // connectivity — a broken invariant (findCycle treats it as a hard
    // error); zero-filling here (review r9) could pass the optimality
    // test with wrong reduced costs and return a silently suboptimal
    // solution
    require((0 until m).forall(i => !u(i).isNaN) &&
      (0 until n).forall(j => !v(j).isNaN),
      "transport basis is not connected — duals are undefined")
    (u, v)
  }

  /** Stepping-stone cycle: the basis is a spanning tree of the
    * bipartite (rows ∪ cols) graph, so adding the entering edge (i, j)
    * closes exactly one cycle — the tree path from row i to col j plus
    * the edge itself. Returned with the entering cell first, so signs
    * alternate +, -, +, … along the sequence. */
  private def findCycle(basis: mutable.Set[(Int, Int)],
      enter: (Int, Int)): Seq[(Int, Int)] = {
    // node encoding: rows as Left(i), cols as Right(j)
    val byRow = basis.groupBy(_._1)
    val byCol = basis.groupBy(_._2)
    val startNode: Either[Int, Int] = Right(enter._2) // col j
    val target: Either[Int, Int] = Left(enter._1) // row i
    val prev = mutable.Map.empty[Either[Int, Int], (Either[Int, Int], (Int, Int))]
    val seen = mutable.Set(startNode)
    val queue = mutable.Queue(startNode)
    while (queue.nonEmpty && !prev.contains(target)) {
      val cur = queue.dequeue()
      val edges = cur match {
        case Left(r) => byRow.getOrElse(r, Set.empty)
        case Right(cj) => byCol.getOrElse(cj, Set.empty)
      }
      for (cell <- edges) {
        val nxt: Either[Int, Int] = cur match {
          case Left(_) => Right(cell._2)
          case Right(_) => Left(cell._1)
        }
        if (!seen.contains(nxt)) {
          seen += nxt
          prev(nxt) = (cur, cell)
          queue += nxt
        }
      }
    }
    require(prev.contains(target), "basis is not connected — no stepping-stone cycle")
    // reconstruct cells from row i back to col j; first cell shares row i
    // with `enter`, so alternation starts correctly at the enter cell
    val cells = mutable.ListBuffer.empty[(Int, Int)]
    var cur = target
    while (cur != startNode) {
      val (p, cell) = prev(cur)
      cells += cell
      cur = p
    }
    enter +: cells.toSeq
  }
}
