package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Descending, Ascending, NullsFirst, NullsLast, SortOrder}
import org.apache.spark.sql.{Column, DataFrame, GraftInternals, SparkSession}

/** DataFrame-level entry points for graft's custom plan nodes. */
object Plans {

  /** Ensure the planner strategy is installed on a live session. */
  def install(spark: SparkSession): Unit =
    GraftInternals.addStrategy(spark, TopKPerKeyStrategy)

  /** Top-k rows per key ordered by `orderBy` (desc flag per column).
    * Equivalent to row_number() over (partition by keys order by ...)
    * <= k, but executed with bounded per-key heaps and a map-side
    * partial pass — no full partition sort. */
  def topKPerKey(df: DataFrame, keyCols: Seq[Column],
                 orderCols: Seq[(Column, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = GraftInternals.analyzedPlan(df)
    val keys = keyCols.map(GraftInternals.expression)
    val order = orderCols.map { case (c, desc) =>
      val e = GraftInternals.expression(c)
      if (desc) SortOrder(e, Descending, NullsLast, Seq.empty)
      else SortOrder(e, Ascending, NullsFirst, Seq.empty)
    }
    GraftInternals.ofRows(spark, TopKPerKeyNode(keys, order, k, analyzed))
  }
}
