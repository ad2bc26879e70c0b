package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = new Timestamp(1700000000000L + minute * 60000L)

  test("streaming dedupIngest drops duplicate keys within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Timestamp)]
    val deduped = Streaming.dedupIngest(
      input.toDF().toDF("portal_name", "url", "ts"), "ts", Seq("portal_name", "url"))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(("p1", "u1", ts(0)), ("p1", "u1", ts(0)), ("p1", "u2", ts(1)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT portal_name, url FROM dedup_out").collect()
      assert(rows.length == 2)
    } finally q.stop()
  }

  test("streaming tumblingCounts aggregates per window and key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val counts = Streaming.tumblingCounts(
      input.toDF().toDF("ts", "event_type", "value"), "ts", "event_type", "10 minutes")
    val q = counts.writeStream.format("memory").queryName("win_out")
      .outputMode("update").start()
    try {
      input.addData((ts(0), "click", 1.0), (ts(1), "click", 2.5), (ts(2), "view", 4.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n_events, value_cents FROM win_out ORDER BY event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq == Seq(("click", 2L, 350L), ("view", 1L, 400L)))
    } finally q.stop()
  }

  test("stateful sessionizer closes a session after the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streaming.SessionEvent]
    val sessions = Streaming.sessionize(input.toDS())
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // two events 5 min apart, then a 40-min gap -> first session closes
      input.addData(
        Streaming.SessionEvent(7L, ts(0), 1.0),
        Streaming.SessionEvent(7L, ts(5), 2.0))
      q.processAllAvailable()
      input.addData(Streaming.SessionEvent(7L, ts(45), 3.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n_events, value_cents FROM sess_out").collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(0) == 7L && rows.head.getLong(1) == 2L && rows.head.getLong(2) == 300L)
    } finally q.stop()
  }
}
