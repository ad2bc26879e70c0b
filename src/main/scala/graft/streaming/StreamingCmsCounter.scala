package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.functions.TextFunctions.{fold, tokens}
import graft.queries.ScaleOpsQueries

/** Incremental count-min heavy-hitter counting — q171's streaming
  * form, and the sketch CMS was DESIGNED for: each micro-batch folds
  * its token counts into the 3×32-cell sketch and the running
  * estimates are available without ever holding the vocabulary in
  * state.
  *
  * The counter update is an ABELIAN sum — per-batch (d, cell) partials
  * appended to a parquet log fold to exactly the batch sketch in ANY
  * arrival order or batching (the q166 checksum property; the spec
  * replays two different batchings to the same state). State is
  * sketch-sized (depth × width cells, a few KB) at any corpus size —
  * with the dim-sized drift monitor and the corpus-sized dedup band
  * index, the three streaming state regimes are all represented.
  *
  * Replay idempotency: counter partials are keyed by batchId
  * (overwrite) — the abelian fold of the log is then exactly-once
  * under foreachBatch's at-least-once re-delivery (see
  * [[StreamingState]]).
  *
  * Estimates never undercount (CMS guarantee, asserted in the batch
  * q171 gate); a monitor probes `estimates` with any watchlist — the
  * exact top-k, a blocklist, a spike-detection candidate set — at
  * dim cost.
  */
class StreamingCmsCounter(val sketchDir: String) {

  private val cellSchema = StructType(Seq(
    StructField("d", IntegerType),
    StructField("cell", LongType),
    StructField("cnt", LongType)))

  /** The persisted per-batch counter log (empty before the first
    * batch). Readers fold by (d, cell). */
  def historicalCells(s: SparkSession): DataFrame = {
    val dirs = StreamingState.batchDirs(sketchDir)
    if (dirs.nonEmpty) s.read.schema(cellSchema).parquet(dirs: _*)
    else s.createDataFrame(s.sparkContext.emptyRDD[Row], cellSchema)
  }

  /** The folded sketch over everything seen so far. */
  def sketch(s: SparkSession): DataFrame =
    historicalCells(s)
      .groupBy(col("d"), col("cell")).agg(sum(col("cnt")).as("cnt"))

  /** One micro-batch: fold the arrivals' token counts into the sketch.
    * Returns this batch's partial counters (what was appended). */
  def processBatch(arrivals: DataFrame, textCol: String,
      batchId: Long): DataFrame = {
    val batchCells = ScaleOpsQueries.cmsCounters(
      arrivals
        .select(explode_outer(tokens(fold(col(textCol)))).as("tok"))
        .filter(col("tok").isNotNull)
        .groupBy(col("tok")).agg(count(lit(1)).as("c")))
      .select(col("d").cast("int").as("d"), col("cell"), col("cnt"))
      .localCheckpoint()
    batchCells.write.mode("overwrite")
      .parquet(StreamingState.writeDir(sketchDir, batchId))
    batchCells
  }

  /** Legacy entry point: allocates the next sequential batch id from
    * the counter log itself (max committed id + 1). */
  def processBatch(arrivals: DataFrame, textCol: String): DataFrame =
    processBatch(arrivals, textCol,
      StreamingState.batchIds(sketchDir).lastOption.map(_ + 1L).getOrElse(0L))

  /** CMS estimates for a (tok) watchlist against the current state. */
  def estimates(s: SparkSession, probes: DataFrame): DataFrame =
    ScaleOpsQueries.cmsEstimates(probes, sketch(s))

  /** Drive a document stream through foreachBatch. */
  def run(stream: DataFrame, textCol: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        processBatch(batch, textCol, epochId)
        ()
      }
      .start()
}
