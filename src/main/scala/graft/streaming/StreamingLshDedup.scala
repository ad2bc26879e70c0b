package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.operators.Dedup

/** Incremental MinHash-LSH ingest dedup — the streaming form of q23
  * (reference dedup-on-ingest: servico_coleta_noticias.py checks each
  * arrival against the stored corpus before inserting; here the check
  * is near-duplicate, not just key-exact).
  *
  * Each micro-batch: (1) band-signature the arrivals (q23's exact
  * MinHash/band math — Dedup.minhashSignatures/minhashBands), (2)
  * probe the HISTORICAL band index plus the batch's own bands with
  * one equi-join on (band_id, band_val), (3) emit (doc_a < doc_b,
  * n_bands) candidate verdicts, (4) write the new bands to the
  * index under `batch=<id>`. Replaying any batch partition of a
  * corpus emits exactly the batch `minhashCandidates` verdict on the
  * union (spec-pinned): a pair is emitted in the batch where its
  * LATER member arrives, and never again — later batches probe only
  * their own arrivals.
  *
  * Scale shape: the historical index is an append-only PARQUET table
  * keyed by (band_id, band_val) — corpus-sized state lives on disk
  * where a 100 TB/day stream needs it, NOT in the state store (a
  * RocksDB state holding every band of the corpus is the wrong
  * tool); the per-batch probe is an equi-join whose left side is one
  * micro-batch — broadcastable — so the incremental cost per batch
  * is a banded index seek, not a corpus scan-and-shuffle.
  *
  * Replay idempotency: index writes are keyed by batchId (overwrite)
  * and the probe reads only ids strictly before the current one, so a
  * foreachBatch re-delivery neither double-appends bands nor probes
  * against its own partial output (see [[StreamingState]]). */
class StreamingLshDedup(val indexDir: String) {

  private val bandSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("band_id", IntegerType),
    StructField("band_val", StringType)))

  /** Committed batch ids present in the index, ascending. */
  def batchIds(): Seq[Long] = StreamingState.batchIds(indexDir)

  /** The persisted band index, optionally restricted to batches
    * strictly before `before` (empty before the first batch). */
  def historicalBands(s: SparkSession, before: Option[Long] = None): DataFrame = {
    val dirs = StreamingState.batchDirs(indexDir, before)
    if (dirs.nonEmpty) s.read.schema(bandSchema).parquet(dirs: _*)
    else s.createDataFrame(s.sparkContext.emptyRDD[Row], bandSchema)
  }

  /** One micro-batch: returns this batch's candidate verdicts
    * (doc_a < doc_b, n_bands — q23's output shape) and writes the
    * batch's bands to the index under `batch=<batchId>` (overwrite —
    * a foreachBatch replay of the same id is idempotent). The
    * verdicts are materialized BEFORE the write so the probe never
    * sees its own output. */
  def processBatch(arrivals: DataFrame, textCol: String,
      idCol: String, batchId: Long): DataFrame = {
    val s = arrivals.sparkSession
    val newBands = Dedup.minhashBands(
      Dedup.minhashSignatures(
        Dedup.shingles(arrivals, textCol, idCol), idCol), idCol)
      .select(col(idCol).cast("long").as("doc_id"),
        col("band_id").cast("int"), col("band_val"))
      .localCheckpoint()
    val target = historicalBands(s, Some(batchId)).unionByName(newBands)
    val verdicts = newBands
      .select(col("doc_id").as("p_id"), col("band_id"), col("band_val"))
      .join(target.select(col("doc_id").as("t_id"), col("band_id"),
        col("band_val")), Seq("band_id", "band_val"))
      .filter(col("p_id") =!= col("t_id"))
      .select(least(col("p_id"), col("t_id")).as("doc_a"),
        greatest(col("p_id"), col("t_id")).as("doc_b"), col("band_id"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count_distinct(col("band_id")).as("n_bands"))
      .localCheckpoint()
    newBands.write.mode("overwrite")
      .parquet(StreamingState.writeDir(indexDir, batchId))
    verdicts
  }

  /** Legacy entry point: allocates the next sequential batch id from
    * the index itself (max committed id + 1). */
  def processBatch(arrivals: DataFrame, textCol: String, idCol: String): DataFrame =
    processBatch(arrivals, textCol, idCol,
      batchIds().lastOption.map(_ + 1L).getOrElse(0L))

  /** Drive a document stream through foreachBatch, writing each
    * batch's verdicts to `verdictDir/batch=<id>` (overwrite, so a
    * replayed batch is idempotent end to end). */
  def run(stream: DataFrame, textCol: String, idCol: String,
      verdictDir: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        processBatch(batch, textCol, idCol, epochId)
          .write.mode("overwrite")
          .parquet(StreamingState.writeDir(verdictDir, epochId))
        ()
      }
      .start()
}
