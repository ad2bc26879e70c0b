package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table storage: pre-shuffle once at write time so repeated
  * joins/aggregations on the bucket key run with NO exchange at read
  * time — the storage-level answer to "this join shuffles 100 TB every
  * night". Bucket counts must match across tables that join; the spec
  * asserts the shuffle-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table) // managed table under the warehouse dir

  def read(s: SparkSession, table: String): DataFrame = s.table(table)

  /** Join two same-bucketed tables on the bucket key — planner sees
    * compatible output partitioning on both sides and skips the
    * exchange entirely. */
  def colocatedJoin(s: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    read(s, leftTable).join(read(s, rightTable), Seq(key))
}
