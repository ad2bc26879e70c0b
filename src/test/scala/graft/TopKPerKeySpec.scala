package graft

import org.apache.spark.sql.functions._

import graft.functions.Money.cents
import graft.plans.Plans

class TopKPerKeySpec extends SparkSpec {

  private def viaWindow(k: Int) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(cents(col("o_totalprice")).desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .join(broadcast(Tables.customer(spark, sfDir)), col("o_custkey") === col("c_custkey"))
      .withColumn("total_cents", cents(col("o_totalprice")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("c_mktsegment", "o_orderkey", "total_cents")
  }

  private def viaTopK(k: Int) = {
    val joined = Tables.orders(spark, sfDir)
      .join(broadcast(Tables.customer(spark, sfDir)), col("o_custkey") === col("c_custkey"))
      .withColumn("total_cents", cents(col("o_totalprice")))
    Plans.topKPerKey(joined,
      Seq(joined("c_mktsegment")),
      Seq((joined("total_cents"), true), (joined("o_orderkey"), false)), k)
      .select("c_mktsegment", "o_orderkey", "total_cents")
  }

  test("TopKPerKey matches the window row_number formulation") {
    val expect = viaWindow(5).collect().map(_.toSeq).toSet
    val got = viaTopK(5).collect().map(_.toSeq).toSet
    assert(got == expect)
    assert(got.size == 25)
  }

  test("plan contains partial and final TopKPerKeyExec with one exchange, no sort") {
    // AQE wraps the plan, so assert on the rendered tree: a partial
    // TopKPerKey (…, true) below the exchange, the final (…, false)
    // above it, and no Sort anywhere
    val p = viaTopK(3).queryExecution.executedPlan.toString
    assert(p.contains(", 3, true"), p)
    assert(p.contains(", 3, false"), p)
    assert(p.contains("Exchange hashpartitioning(c_mktsegment"), p)
    assert(!p.contains("Sort "), p)
  }

  test("k=1 per key equals a max aggregation") {
    val expect = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_suppkey"))
      .agg(max(cents(col("l_extendedprice"))).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val li = Tables.lineitem(spark, sfDir).withColumn("p", cents(col("l_extendedprice")))
    val got = Plans.topKPerKey(li, Seq(li("l_suppkey")), Seq((li("p"), true)), 1)
      .select("l_suppkey", "p")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
  }
}
