package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}

import graft.functions.TextFunctions

object StreamingIngestPipeline {
  /** One arriving document: id-ordered per the ingest contract
    * (doc_id monotone with arrival, ts_us non-decreasing per source). */
  case class IngestDoc(doc_id: Long, source: String, ts_us: Long, text: String)
}

/** The ingest-to-packed composition — the round's streaming
  * components wired into ONE pipeline, the stream-shaped spine of
  * what `CurationPipeline.curateExtended` does in batch:
  *
  *   arrivals (doc_id, source, ts_us, text)
  *     -> per-source leaky-bucket ADMISSION (`Streaming.advanceBucket`
  *        — q210/rateLimit's fold; an over-cap arrival is load-shed,
  *        the reference collector's crawl-rate discipline)
  *     -> CDC chunk-dedup gate (`StreamingCdcDedup` — q181's at-ingest
  *        verdict; a doc whose chars the store already holds at >=
  *        `dupShareMaxE6` is not stored, curateExtended's exact-dedup
  *        stage made causal)
  *     -> MinHash-LSH near-dup gate (`StreamingLshDedup` — q23's
  *        candidates at ingest; the LATER member of any pair sharing
  *        >= `minBands` bands is dropped, curateExtended's
  *        near-dup-clustering stage made causal: first arrival is the
  *        cluster representative)
  *     -> incremental context-window PACKING (packStream's per-source
  *        fold; survivors append to fixed `ctxLen` windows exactly
  *        where `Curation.sequencePack` would put them)
  *
  * Equivalence contract (StreamingIngestPipelineSpec pins all four):
  * admission ≡ the sequential bucket on the union; CDC rejections ≡
  * the causal verdict (a doc is rejected iff a duplicated chunk's
  * other copy is in the store, in an EARLIER-arriving doc, or a
  * within-doc repeat — the batch-size-1 sequential answer, invariant
  * to batch boundaries); LSH rejections ≡ batch q23 candidates over every
  * CDC-survivor with drop-the-later-member; packed layout ≡
  * `Curation.sequencePack` over the final survivors. The quality /
  * decontamination stages of curateExtended stay batch-side by
  * design: they need corpus-global statistics (df thresholds, eval
  * overlap) that an ingest gate cannot know causally.
  *
  * State placement is the 100 TB argument: the two corpus-sized
  * indexes (chunk hashes, LSH bands) are append-only parquet tables —
  * disk state, seekable by equi-join, never a RocksDB store holding
  * the corpus — while the per-source bucket levels and pack cursors
  * are bounded dims persisted as tiny parquet snapshots (the
  * bounded-model pattern: |sources| rows, rewritten per batch).
  * Rejected docs' chunks and bands ARE indexed ("dedup against
  * everything seen"): a near-dup of a rejected doc is still a
  * near-dup, and the index append happens before the gate filter so
  * transitive duplicates cannot slip through between representatives.
  *
  * Replay idempotency (the foreachBatch contract: a batch whose
  * processing did not commit to the streaming checkpoint is
  * RE-DELIVERED with the same epochId): every piece of state is keyed
  * by that id — index appends and the packed output land in
  * `batch=<id>` dirs with overwrite, and the dims are per-batch
  * SNAPSHOTS rather than a single rewritten file, read as-of
  * `batchId - 1`. A replayed batch therefore re-reads exactly the
  * pre-batch dims (no double-charged admission cost), overwrites its
  * own partial index/output contribution, and probes history that
  * excludes it — byte-identical to a first delivery. Old dim
  * snapshots beyond a short tail are pruned (replays only reach back
  * to the last uncommitted batch). */
class StreamingIngestPipeline(
    val stateRoot: String,
    val costMicro: Long, val capMicro: Long,
    val dupShareMaxE6: Long, val minBands: Long, val ctxLen: Int) {

  import StreamingIngestPipeline.IngestDoc

  val cdc = new StreamingCdcDedup(s"$stateRoot/cdc_chunks")
  val lsh = new StreamingLshDedup(s"$stateRoot/lsh_bands")
  private val bucketDir = s"$stateRoot/bucket_state"
  private val cursorDir = s"$stateRoot/pack_cursor"
  private val DimSnapshotsKept = 3

  private val bucketSchema = StructType(Seq(
    StructField("source", StringType),
    StructField("last_us", LongType),
    StructField("level", LongType)))
  private val cursorSchema = StructType(Seq(
    StructField("source", StringType),
    StructField("cum_tokens", LongType)))

  /** The dim as of the latest snapshot strictly BEFORE `batchId` —
    * what a replay of `batchId` must see. */
  private def readDim(s: SparkSession, dir: String, schema: StructType,
      batchId: Long): Map[String, (Long, Long)] = {
    val dirs = StreamingState.batchDirs(dir, Some(batchId))
    if (dirs.isEmpty) Map.empty
    else s.read.schema(schema).parquet(dirs.last).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.length > 2) r.getLong(2) else 0L))).toMap
  }

  private def writeDim(s: SparkSession, dir: String, schema: StructType,
      rows: Seq[Row], batchId: Long): Unit = {
    val df = s.createDataFrame(
      s.sparkContext.parallelize(rows, 1), schema)
    df.write.mode("overwrite")
      .parquet(StreamingState.writeDir(dir, batchId))
    StreamingState.pruneBefore(dir, batchId, DimSnapshotsKept)
  }

  /** Stage 1: per-source leaky-bucket admission for one micro-batch.
    * Returns (admitted docs, updated per-source states). The fold is
    * per-source sequential — exactly `Streaming.advanceBucket` — run
    * distributed via groupByKey; prior levels come from the bounded
    * persisted dim as of the previous batch. */
  def admitBatch(batch: Dataset[IngestDoc], batchId: Long)
      : (Dataset[IngestDoc], Seq[Row]) = {
    val s = batch.sparkSession
    import s.implicits._
    val prior = readDim(s, bucketDir, bucketSchema, batchId)
    val bPrior = s.sparkContext.broadcast(prior)
    // locals so the task closures capture values, not `this`
    val cost = costMicro
    val cap = capMicro
    val admitted = batch.groupByKey(_.source).flatMapGroups {
      (src: String, rows: Iterator[IngestDoc]) =>
        var st = bPrior.value.get(src)
          .map { case (last, lvl) => Streaming.BucketState(last, lvl) }
        rows.toSeq.sortBy(d => (d.ts_us, d.doc_id)).flatMap { d =>
          val (next, lvl) = Streaming.advanceBucket(st, d.ts_us, cost)
          st = Some(next)
          if (lvl > cap) None else Some(d)
        }.iterator
    }
    // the batch's final per-source states: a second distributed fold
    // that collects only the |sources|-row dim, never the batch
    val finals = batch.groupByKey(_.source).mapGroups {
      (src: String, rows: Iterator[IngestDoc]) =>
        var st = bPrior.value.get(src)
          .map { case (last, lvl) => Streaming.BucketState(last, lvl) }
        rows.toSeq.sortBy(d => (d.ts_us, d.doc_id)).foreach { d =>
          st = Some(Streaming.advanceBucket(st, d.ts_us, cost)._1)
        }
        (src, st.get.lastUs, st.get.level)
    }.collect().map { case (src, last, lvl) => Row(src, last, lvl) }.toSeq
    val untouched = (prior.keySet -- finals.map(_.getString(0)).toSet)
      .toSeq.map(src => Row(src, prior(src)._1, prior(src)._2))
    (admitted, finals ++ untouched)
  }

  /** One micro-batch through all four stages; returns this batch's
    * packed survivor rows (the sequencePack schema) and advances every
    * piece of state, keyed by `batchId` so a foreachBatch replay of
    * the same id reproduces (not compounds) the state transition. */
  def processBatch(batch0: Dataset[IngestDoc], batchId: Long): DataFrame = {
    val s = batch0.sparkSession
    // the micro-batch is read twice (admission + state fold): pin it
    val batch = batch0.localCheckpoint()
    val (admittedDs, bucketRows) = admitBatch(batch, batchId)
    val admitted = admittedDs.toDF().localCheckpoint()
    writeDim(s, bucketDir, bucketSchema, bucketRows, batchId)

    // CDC gate: at-ingest storage-dup share, index write inside
    val cdcVerdicts = cdc.processBatch(admitted, "text", "doc_id", batchId)
    val cdcReject = cdcVerdicts
      .filter(col("dup_share_at_ingest_e6") >= dupShareMaxE6)
      .select(col("doc_id"))
    val s1 = admitted.join(cdcReject, Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // LSH gate: drop the later member of every candidate pair
    val lshVerdicts = lsh.processBatch(s1, "text", "doc_id", batchId)
    val lshReject = lshVerdicts.filter(col("n_bands") >= minBands)
      .select(col("doc_b").as("doc_id")).distinct()
    val s2 = s1.join(lshReject, Seq("doc_id"), "left_anti")

    // pack survivors onto each source's running window cursor
    val cursors = readDim(s, cursorDir, cursorSchema, batchId)
    val bCursors = s.sparkContext.broadcast(cursors)
    val baseCol = udfFreeBase(col("source"), bCursors.value)
    val wPrev = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = s2
      .select(col("doc_id"), col("source"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens",
        coalesce(sum(col("n_tokens")).over(wPrev), lit(0L)) + baseCol)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"),
        expr(s"cum_tokens div $ctxLen").as("seq_id"),
        (col("cum_tokens") % ctxLen).as("offset_in_seq"),
        (col("cum_tokens") % ctxLen + col("n_tokens") > ctxLen).as("straddles"))
      .localCheckpoint()
    val advanced = packed.groupBy(col("source"))
      .agg(max(col("cum_tokens") + col("n_tokens")).as("cum")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = (cursors.view.mapValues(_._1).toMap ++ advanced)
      .map { case (src, cum) => Row(src, cum) }.toSeq
    writeDim(s, cursorDir, cursorSchema, merged, batchId)
    packed
  }

  /** The per-source cursor base as a foldable CASE over the bounded
    * cursor dim — no UDF, stays inside codegen. */
  private def udfFreeBase(src: org.apache.spark.sql.Column,
      cursors: Map[String, (Long, Long)]): org.apache.spark.sql.Column =
    if (cursors.isEmpty) lit(0L)
    else cursors.foldLeft(lit(0L)) { case (acc, (k, (cum, _))) =>
      when(src === k, cum).otherwise(acc)
    }

  /** Drive a document stream end-to-end, writing each batch's packed
    * survivors to `outDir/batch=<id>` (overwrite — replay-idempotent,
    * and readable as one table via `spark.read.parquet(outDir)`). */
  def run(stream: Dataset[IngestDoc], outDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[IngestDoc], epochId: Long) =>
        processBatch(batch, epochId).write.mode("overwrite")
          .parquet(StreamingState.writeDir(outDir, epochId))
        ()
      }
      .start()
}
