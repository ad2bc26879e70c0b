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

  /** Salting where it is MEASURED to matter: one partial-agg pass
    * counts fact rows per key, keys at/above `hotThreshold` take the
    * replicated-dim salted shape, and the cold majority joins plain —
    * the two key classes are disjoint so the union is row-identical
    * to the plain join. The hot-key set is bounded by
    * |fact| / hotThreshold rows, so broadcasting it is safe by
    * construction at any scale. Unconditional salting replicates the
    * WHOLE dim n times; when the dim is itself fact-sized that
    * replication dominates the job (x256 ladder: q86 at 67.8s with
    * zero actually-hot keys — a 38M-row dim shuffled 16x for
    * nothing; adaptive, the same query is a plain join plus one
    * cheap counting agg). This is the aggregation/broadcast-shape
    * complement of AQE's sort-merge skew split. */
  def adaptiveSaltedJoin(fact: DataFrame, dim: DataFrame, keyCol: String,
                         factDistCol: String, n: Int = 16,
                         hotThreshold: Long = 2000000L): DataFrame = {
    val hot = fact.groupBy(col(keyCol)).agg(count(lit(1)).as("_kn"))
      .filter(col("_kn") >= hotThreshold)
      .select(col(keyCol), lit(true).as("_hot"))
    val factF = fact.join(broadcast(hot), Seq(keyCol), "left")
    val dimF = dim.join(broadcast(hot), Seq(keyCol), "left")
    val hotJoin = saltedJoin(
      factF.filter(col("_hot").isNotNull).drop("_hot"),
      dimF.filter(col("_hot").isNotNull).drop("_hot"), keyCol, factDistCol, n)
    val coldJoin = factF.filter(col("_hot").isNull).drop("_hot")
      .join(dimF.filter(col("_hot").isNull).drop("_hot"), Seq(keyCol))
    coldJoin.unionByName(hotJoin)
  }
}
