package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Clamped sequential recurrences over event streams, solved in closed
  * form so they run as ordinary partitioned windows instead of
  * per-row driver loops.
  *
  * The key identity (Lindley recursion / Skorokhod reflection): for
  *   S_t = max(0, S_{t-1} + d_t),  S_0 = 0
  * the solution is
  *   S_t = P_t - least(0, min_{k<=t} P_k),   P_t = sum_{k<=t} d_k.
  * Both P and its running min are single-pass window aggregates, so a
  * recurrence that looks inherently sequential (CUSUM change-point
  * statistics, leaky-bucket/token-bucket levels, queue depths with an
  * empty floor) costs exactly one shuffle on the partition key and a
  * per-key ordered scan — the sessionize shape, with no iteration and
  * no state carried across rows by the driver. At 100 TB the partition
  * key (event type, user id) spreads the work and no task ever holds
  * more than one key group's ordered run.
  */
object EventOps {

  /** Append `outCol` = reflected running sum of `dCol` (the closed-form
    * max(0, prev + d) recurrence) per `partCol` ordered by `orderCols`. */
  def reflect(df: DataFrame, dCol: String, outCol: String,
              partCol: String, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(partCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn(s"__p_$outCol", sum(col(dCol)).over(w))
      .withColumn(outCol,
        col(s"__p_$outCol") -
          least(lit(0L), min(col(s"__p_$outCol")).over(w)))
      .drop(s"__p_$outCol")
  }
}
