package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.queries.EventOpsQueries
import graft.streaming.Streaming
import graft.streaming.Streaming.ChainEvent

/** Streaming temporal chain dedup (q202's state, incremental):
  * cross-batch chain continuation, gap-closure, and full equivalence
  * with the batch `chainDedup` core on the union under arbitrary
  * micro-batch splits. */
class StreamingTemporalDedupSpec extends SparkSpec {

  private val Day = 86400L * 1000000

  /** Latest snapshot per (key, chain_seq) from an update-mode sink. */
  private def latest(table: String): Map[(Long, String, String, Long), (Long, Long, Long)] =
    spark.sql(
      s"""SELECT user_id, event_type, props, chain_seq,
         |  survivor_event_id, n_events, span_s FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY user_id, event_type, props, chain_seq
         |    ORDER BY n_events DESC) AS rn FROM $table) WHERE rn = 1""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)) ->
        (r.getLong(4), r.getLong(5), r.getLong(6))).toMap

  test("a gap past the chain horizon closes the chain across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChainEvent]
    val q = Streaming.temporalDedup(input.toDS())
      .writeStream.format("memory").queryName("chain_out")
      .outputMode("update").start()
    try {
      // batch 1: two re-crawls 1 day apart -> one chain of 2
      input.addData(
        ChainEvent(1L, "view", "a", 0L, 100L),
        ChainEvent(1L, "view", "a", Day, 101L))
      q.processAllAvailable()
      // batch 2: 2 days later still chains (within 3-day gap);
      // then 10 days later -> new chain with its own survivor
      input.addData(
        ChainEvent(1L, "view", "a", 3 * Day, 102L),
        ChainEvent(1L, "view", "a", 13 * Day, 103L))
      q.processAllAvailable()
      val rows = latest("chain_out")
      assert(rows((1L, "view", "a", 1L)) == ((100L, 3L, 3 * Day / 1000000)), rows)
      assert(rows((1L, "view", "a", 2L)) == ((103L, 1L, 0L)), rows)
      // the first chain was emitted closed exactly once
      val closed = spark.sql(
        "SELECT count(*) FROM chain_out WHERE closed").collect()(0).getLong(0)
      assert(closed == 1L)
    } finally q.stop()
  }

  test("incremental replay equals the batch chainDedup core on the union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // keys with: in-chain dups, exact-gap boundary, multiple closures,
    // and tie timestamps (order falls to event_id)
    val log = Seq(
      ChainEvent(1L, "view", "a", 0L, 1L),
      ChainEvent(1L, "view", "a", 2 * Day, 2L),
      ChainEvent(1L, "view", "a", 5 * Day, 3L),     // exactly 3d: chains
      ChainEvent(1L, "view", "a", 9 * Day, 4L),     // 4d: new chain
      ChainEvent(1L, "view", "a", 9 * Day, 5L),     // tie ts: same chain
      ChainEvent(2L, "click", "b", 0L, 6L),
      ChainEvent(2L, "click", "b", 7 * Day, 7L),    // new chain
      ChainEvent(2L, "click", "b", 15 * Day, 8L),   // new chain again
      ChainEvent(3L, "view", "c", 4 * Day, 9L))
    val expected = EventOpsQueries.chainDedup(
      log.toDF("user_id", "event_type", "props", "ts_us", "event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getAs[Long]("chain_seq")) ->
        (r.getAs[Long]("survivor_event_id"), r.getAs[Long]("n_events"),
          r.getAs[Long]("span_s"))).toMap
    // replay in batches of 2 (splits chains mid-flight)
    val input = MemoryStream[ChainEvent]
    val q = Streaming.temporalDedup(input.toDS())
      .writeStream.format("memory").queryName("chain_replay_out")
      .outputMode("update").start()
    try {
      log.grouped(2).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val got = latest("chain_replay_out")
      assert(got == expected, s"\ngot      $got\nexpected $expected")
    } finally q.stop()
  }
}
