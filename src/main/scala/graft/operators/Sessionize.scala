package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — the batch analog of
  * the reference's queue-consumer batching
  * (services/extraction/adapters/pending_news_queue.py), and the shape
  * every event pipeline needs at scale: ONE shuffle on the user key,
  * per-key time sort inside the window, no global sort.
  *
  * All time arithmetic is in epoch microseconds (exact integers):
  * source timestamps are nanosecond parquet that Spark truncates to
  * micros, so emitting raw timestamps is engine-dependent while
  * epoch_us is reproducible.
  */
object Sessionize {

  /** Assign 1-based session ids per user with a max inactivity gap. */
  def assign(events: DataFrame, userCol: String, tsCol: String,
             gapMicros: Long, tieBreak: String): DataFrame = {
    val order = Window.partitionBy(col(userCol))
      .orderBy(col("ts_us"), col(tieBreak))
    events
      .withColumn("ts_us", unix_micros(col(tsCol)))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(order))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_us", "new_session")
  }

  /** Per-session rollup: bounds, duration, event count, value cents. */
  def rollup(sessions: DataFrame, userCol: String, valueCol: String): DataFrame =
    sessions
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
        sum(round(col(valueCol) * 100).cast("long")).as("value_cents"))
}
