package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot keys at scale. AQE's skew-join
  * handles sort-merge cases adaptively; these explicit versions cover
  * the shapes AQE can't touch (aggregations, broadcast-side
  * replication) and make the salting strategy testable.
  *
  * Salts are deterministic (hash of a caller-chosen distribution
  * column, never rand()) so retried tasks and reruns produce identical
  * partitioning — a correctness requirement, not a style choice.
  */
object Skew {

  /** Deterministic salt in [0, n) from a distribution column. */
  def salt(distCol: String, n: Int) = pmod(xxhash64(col(distCol)), lit(n))

  /** Two-phase (salted) aggregation: count+sum per key without any
    * single reducer seeing a whole hot key. */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
                     distCol: String, n: Int = 16): DataFrame =
    df.withColumn("_salt", salt(distCol, n))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_c"), sum(col(valueCol)).as("_s"))
      .groupBy(col(keyCol))
      .agg(sum(col("_c")).as("n_rows"), sum(col("_s")).as("sum_value"))

  /** Salted fact-dim join: the dim side is replicated n times (one row
    * per salt), the fact side gets a deterministic salt — a hot join
    * key spreads over n reducers instead of one. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keyCol: String,
                 factDistCol: String, n: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt", salt(factDistCol, n))
    val repDim = dim.withColumn("_salt", explode(array((0 until n).map(lit): _*)))
    saltedFact.join(repDim, Seq(keyCol, "_salt")).drop("_salt")
  }
}
