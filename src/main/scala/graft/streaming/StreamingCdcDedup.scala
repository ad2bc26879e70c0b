package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.queries.CdcQueries

/** Incremental content-defined-chunk dedup — the streaming form of
  * q181, the storage-dedup gate at ingest: each arriving document is
  * chunked map-side (the native CdcChunks pass), its chunk hashes are
  * probed against the persisted chunk index PLUS the batch's EARLIER
  * arrivals (id order — never the batch's future), and the arrival's
  * INGEST verdict (how many of its chars the store already holds —
  * the bytes a dedup store would not write) is emitted before the
  * chunks append. The at-ingest verdict is the causal prefix of
  * q181's global one: it counts duplication against the
  * PAST, while the batch audit also sees the future — so per doc
  * `dup_chars_at_ingest <= dup_chars` (spec-pinned), and folding the
  * full chunk log through the SHARED `CdcQueries.chunkAudit` gives
  * exactly the batch q181 output on the union under any batching
  * (same table, same aggregation — spec-pinned).
  *
  * Scale shape: state is the append-only chunk-hash parquet table — a
  * storage-dedup index lives on disk, not in the state store; the
  * per-batch probe is an md5-keyed equi-join whose left side is one
  * micro-batch (broadcastable), so incremental cost is an index seek
  * per arriving chunk, never a corpus scan.
  *
  * Replay idempotency: Structured Streaming's foreachBatch contract
  * re-delivers a batch whose processing did not commit, so every
  * index write is keyed by batchId (`chunkDir/batch=<id>`, written
  * with overwrite) and the probe reads only batches strictly BEFORE
  * the current id — a replayed batch overwrites its own partial
  * append instead of accumulating it, and never probes against it. */
class StreamingCdcDedup(val chunkDir: String) {

  private val chunkSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("len", LongType),
    StructField("clen", LongType),
    StructField("h", StringType)))

  /** Committed batch ids present in the index, ascending. */
  def batchIds(): Seq[Long] = StreamingState.batchIds(chunkDir)

  /** The persisted chunk index, optionally restricted to batches
    * strictly before `before` (empty before the first batch). */
  def historicalChunks(s: SparkSession, before: Option[Long] = None): DataFrame = {
    val dirs = StreamingState.batchDirs(chunkDir, before)
    if (dirs.nonEmpty) s.read.schema(chunkSchema).parquet(dirs: _*)
    else s.createDataFrame(s.sparkContext.emptyRDD[Row], chunkSchema)
  }

  /** One micro-batch: returns the arrivals' at-ingest verdicts
    * (doc_id, n_chars, n_chunks, dup_chunks_at_ingest,
    * dup_chars_at_ingest, dup_share_at_ingest_e6) and writes the
    * batch's chunks to the index under `batch=<batchId>` (overwrite —
    * a foreachBatch replay of the same id is idempotent). A chunk
    * occurrence is a dup at ingest when its hash already exists in
    * the store, OR an EARLIER doc of the same batch carries it, OR it
    * repeats within its own document — exactly the verdict a
    * batch-size-1 sequential ingest would produce, for ANY batching.
    * (The previous rule — df >= 2 over history + whole batch — marked
    * BOTH members of a co-batched dup pair, so the reject gate's
    * survivor set depended on where batch boundaries fell; a pair
    * split across batches kept its first copy, the same pair
    * co-batched kept neither. Batch-size invariance of the composed
    * ingest pipeline is spec-pinned on exactly this case.) Verdicts
    * are materialized BEFORE the append. */
  def processBatch(arrivals: DataFrame, textCol: String, idCol: String,
      batchId: Long): DataFrame = {
    val s = arrivals.sparkSession
    val newChunks = CdcQueries.chunkTable(arrivals, textCol, idCol)
      .localCheckpoint()
    // (doc, h) occurrence grain: n_occ repeats collapse before any
    // join, and same-hash chunks share content, so one clen suffices
    val occ = newChunks.groupBy(col("doc_id"), col("h"))
      .agg(max(col("len")).as("len"), max(col("clen")).as("clen"),
        count(lit(1)).as("n_occ"))
    val firstDoc = newChunks.groupBy(col("h"))
      .agg(min(col("doc_id")).as("first_doc"))
    // history probe: semi-join the index's h column against this
    // batch's hashes (cheaper than the former full-history count agg —
    // the scan is column-pruned either way, but nothing re-aggregates
    // the whole store per batch)
    val histHit = historicalChunks(s, Some(batchId))
      .join(newChunks.select(col("h")).distinct(), Seq("h"), "left_semi")
      .select(col("h")).distinct()
      .withColumn("in_hist", lit(true))
    val verdicts = occ.join(firstDoc, Seq("h"))
      .join(histHit, Seq("h"), "left")
      .withColumn("is_dup", coalesce(col("in_hist"), lit(false)) ||
        col("doc_id") > col("first_doc") || col("n_occ") >= 2)
      .groupBy(col("doc_id"))
      .agg(max(col("len")).as("n_chars"),
        sum(col("n_occ")).as("n_chunks"),
        sum(when(col("is_dup"), col("n_occ")).otherwise(0L)).as("dup_chunks_at_ingest"),
        sum(when(col("is_dup"), col("n_occ") * col("clen")).otherwise(0L)).as("dup_chars_at_ingest"))
      .withColumn("dup_share_at_ingest_e6",
        expr("dup_chars_at_ingest * 1000000 div n_chars"))
      .localCheckpoint()
    newChunks.write.mode("overwrite")
      .parquet(StreamingState.writeDir(chunkDir, batchId))
    verdicts
  }

  /** Legacy entry point: allocates the next sequential batch id from
    * the index itself (max committed id + 1). */
  def processBatch(arrivals: DataFrame, textCol: String, idCol: String): DataFrame =
    processBatch(arrivals, textCol, idCol,
      batchIds().lastOption.map(_ + 1L).getOrElse(0L))

  /** Fold the chunk index into the batch q181 audit on everything
    * ingested so far — the SAME aggregation the batch query runs. */
  def foldAudit(s: SparkSession): DataFrame =
    CdcQueries.chunkAudit(historicalChunks(s))

  /** Drive a document stream through foreachBatch, writing each
    * batch's at-ingest verdicts to `verdictDir/batch=<id>` (overwrite,
    * so a replayed batch is idempotent end to end). */
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
