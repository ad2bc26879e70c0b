package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.EventOpsQueries
import graft.streaming.Streaming

/** Streaming.rateLimit: per-event levels across micro-batches must
  * equal the sequential bucket, and the per-user rollup must equal
  * batch q210 on the same events. */
class StreamingRateLimitSpec extends SparkSpec {

  private val C = EventOpsQueries.BucketCostMicro
  private val Cap = EventOpsQueries.BucketCapMicro

  test("micro-batch replay equals the sequential bucket and the batch q210 rollup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .collect().map(r => Streaming.BucketEvent(r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(e => (e.ts_us, e.event_id))
    // three time-ordered micro-batches (cross-batch per-user order holds)
    val batches = events.grouped(math.max(1, events.length / 3 + 1)).toSeq
    val input = MemoryStream[Streaming.BucketEvent]
    val q = Streaming.rateLimit(input.toDS(), C, Cap)
      .writeStream.format("memory").queryName("bucket_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val got = spark.sql("SELECT * FROM bucket_out").collect()
        .map(r => r.getAs[Long]("event_id") ->
          ((r.getAs[Long]("level_micro"), r.getAs[Boolean]("over_cap")))).toMap
      // sequential bucket per user
      var exp = Map.empty[Long, (Long, Boolean)]
      events.groupBy(_.user_id).foreach { case (_, es) =>
        var lvl = 0L; var last = 0L; var first = true
        es.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
          lvl = if (first) C else math.max(0L, lvl - (e.ts_us - last)) + C
          first = false; last = e.ts_us
          exp += e.event_id -> ((lvl, lvl > Cap))
        }
      }
      assert(got === exp)
      // rollup parity with the oracle-gated batch query
      val batch = EventOpsQueries.leakyBucket(spark, sfDir).collect()
        .map(r => r.getLong(0) -> ((r.getAs[Long]("max_level_micro"),
          r.getAs[Long]("n_over_cap"), r.getAs[Long]("end_level_micro")))).toMap
      val rolled = spark.sql("SELECT * FROM bucket_out").collect()
        .groupBy(_.getAs[Long]("user_id")).view.mapValues { rs =>
          val lvls = rs.map(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("event_id"),
            r.getAs[Long]("level_micro")))
          (lvls.map(_._3).max, lvls.count(_._3 > Cap).toLong,
            lvls.maxBy(l => (l._1, l._2))._3)
        }.toMap
      assert(rolled === batch)
    } finally q.stop()
  }

  test("a late cross-batch event cannot inflate the bucket (drain clamp)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streaming.BucketEvent]
    val q = Streaming.rateLimit(input.toDS(), C, Cap)
      .writeStream.format("memory").queryName("bucket_late")
      .outputMode("append").start()
    try {
      // batch 1: two in-order events 10s apart -> level drains between
      input.addData(Seq(
        Streaming.BucketEvent(7L, 10_000_000L, 1L),
        Streaming.BucketEvent(7L, 20_000_000L, 2L)))
      q.processAllAvailable()
      // batch 2: a LATE event (ts before the last seen) violating the
      // in-order contract. Un-clamped, (ts - lastUs) < 0 would ADD
      // 15s of tokens; clamped, the late event pays full cost with no
      // drain and lastUs stays monotone.
      input.addData(Seq(Streaming.BucketEvent(7L, 5_000_000L, 3L)))
      q.processAllAvailable()
      // batch 3: back in order; drain measured from the MONOTONE
      // lastUs (20s), not the late 5s timestamp.
      input.addData(Seq(Streaming.BucketEvent(7L, 21_000_000L, 4L)))
      q.processAllAvailable()
      val got = spark.sql("SELECT event_id, level_micro FROM bucket_late")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val afterTwo = math.max(0L, C - 10_000_000L) + C
      assert(got(1L) === C)
      assert(got(2L) === afterTwo)
      assert(got(3L) === afterTwo + C) // no drain, no inflation
      assert(got(4L) === math.max(0L, afterTwo + C - 1_000_000L) + C)
    } finally q.stop()
  }
}
