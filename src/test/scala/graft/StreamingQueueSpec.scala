package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.QueueReplayQueries
import graft.streaming.Streaming

/** Streaming.pendingQueue: incremental replay of the delivery-queue
  * ops log across micro-batch boundaries must equal batch q243's
  * windowed fold on the union — per-url depth, inflight flag, and the
  * dropped / acked / retried counters, plus the global depths. */
class StreamingQueueSpec extends SparkSpec {

  test("micro-batch replay equals the batch queue fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val script = QueueReplayQueries.OpScript.toDF("fam", "seq", "op")
    val log = Tables.documents(spark, sfDir)
      .select((col("doc_id") % 6).as("fam"),
        concat(lit("https://"), col("source"), lit("/news/"),
          col("doc_id").cast("string")).as("url"))
      .join(broadcast(script), Seq("fam"))
      .select(col("url"), col("seq"), col("op"))
      .as[Streaming.QueueEvent].collect()
    // split by seq: per-url arrival order across batches is seq order
    val batches = Seq(
      log.filter(_.seq <= 2), log.filter(_.seq == 3), log.filter(_.seq >= 4))
    val input = MemoryStream[Streaming.QueueEvent]
    val q = Streaming.pendingQueue(input.toDS())
      .writeStream.format("memory").queryName("queue_snap")
      .outputMode("update").start()
    try {
      batches.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      // last snapshot per url
      val got = spark.sql(
        """SELECT url, queued_n, inflight, dropped_n, acked_n, retried_n
          |FROM (SELECT *, row_number() OVER (PARTITION BY url ORDER BY last_seq DESC) rn
          |      FROM queue_snap) WHERE rn = 1""".stripMargin)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      val batch = QueueReplayQueries.queueReplay(spark, sfDir).collect()
        .map(r => r.getAs[String]("url") -> ((r.getAs[Long]("queued_n"),
          r.getAs[Boolean]("inflight"), r.getAs[Long]("dropped_n"),
          r.getAs[Long]("acked_n"), r.getAs[Long]("retried_n")))).toMap
      assert(got === batch)
      // global depths match the batch query's broadcast totals
      val (qc, ic) = (got.values.map(_._1).sum,
        got.values.count(_._2).toLong)
      val batchTotals = QueueReplayQueries.queueReplay(spark, sfDir)
        .select(col("queued_count"), col("inflight_count")).head()
      assert((qc, ic) === ((batchTotals.getLong(0), batchTotals.getLong(1))))
    } finally q.stop()
  }

  test("the six scripted families land in the reference's final states") {
    import spark.implicits._
    val perFam = QueueReplayQueries.queueReplay(spark, sfDir)
      .groupBy(col("fam"))
      .agg(first(col("queued_n")).as("q"), first(col("inflight")).as("i"),
        first(col("dropped_n")).as("d"), first(col("acked_n")).as("a"),
        first(col("retried_n")).as("r"),
        countDistinct(struct(col("queued_n"), col("inflight"),
          col("dropped_n"), col("acked_n"), col("retried_n"))).as("variants"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // hand-run of pending_news_queue.py per script: (queued, inflight,
    // dropped, acked, retried); every url in a family is identical
    val expected = Map(
      0L -> ((0L, false, 0L, 1L, 0L, 1L)), // deliver
      1L -> ((0L, false, 0L, 1L, 1L, 1L)), // retry then deliver
      2L -> ((1L, false, 0L, 0L, 1L, 1L)), // retry leaves it queued
      3L -> ((0L, true, 0L, 0L, 0L, 1L)),  // stuck inflight
      4L -> ((1L, false, 1L, 1L, 0L, 1L)), // inflight dedup drops enqueue
      5L -> ((1L, false, 0L, 1L, 0L, 1L))) // queue duplicates are legal
    assert(perFam.view.mapValues(v => (v._1, v._2, v._3, v._4, v._5, v._6)).toMap
      === expected)
  }
}
