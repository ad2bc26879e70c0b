package graft

import graft.queries.KnapsackQueries

/** q238: the knapsack's selection must be feasible and BRUTE-FORCE
  * optimal (2^20 subsets — exhaustive ground truth). */
class KnapsackSpec extends SparkSpec {

  test("q238 selection is feasible and achieves the brute-force optimum") {
    val rows = KnapsackQueries.budgetKnapsack(spark, sfDir).collect()
    val budget = rows.head.getAs[Long]("budget_units")
    val opt = rows.head.getAs[Long]("opt_value")
    val items = rows.map(r => (r.getAs[Long]("wu"), r.getAs[Long]("value"),
      r.getAs[Boolean]("selected")))
    // feasibility + claimed value
    val selW = items.filter(_._3).map(_._1).sum
    val selV = items.filter(_._3).map(_._2).sum
    assert(selW <= budget)
    assert(selV === opt)
    // exhaustive optimum
    val n = items.length
    assert(n <= 22, "brute force bound")
    var best = 0L
    var m = 0
    while (m < (1 << n)) {
      var w = 0L; var v = 0L; var i = 0
      while (i < n) {
        if ((m & (1 << i)) != 0) { w += items(i)._1; v += items(i)._2 }
        i += 1
      }
      if (w <= budget && v > best) best = v
      m += 1
    }
    assert(opt === best)
  }
}
