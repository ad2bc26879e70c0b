package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streaming
import graft.streaming.Streaming.StoreEvent

/** Streaming ExtractionResultStore (extraction_result_store.py:57-66,
  * 150-166): cross-batch state — version resets clear accumulated
  * occurrences, keep-last dedup reorders across batches — the
  * behaviors the batch replay (q114) cannot exercise incrementally. */
class StreamingResultStoreSpec extends SparkSpec {

  /** Update-mode memory sink keeps one snapshot row per batch; the
    * current state per url is the row with the highest last_seq. */
  private def latest(table: String, c1: String, c2: String): Map[String, (String, String)] =
    spark.sql(s"SELECT url, $c1, $c2 FROM (SELECT *, " +
      "row_number() OVER (PARTITION BY url ORDER BY last_seq DESC) AS rn " +
      s"FROM $table) WHERE rn = 1")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap

  test("version change across batches clears state; dedup re-appends at end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StoreEvent]
    val snaps = Streaming.resultStore(input.toDS())
    val q = snaps.writeStream.format("memory").queryName("store_out")
      .outputMode("update").start()
    try {
      // batch 1: u1 accumulates A,B then re-appends A (order -> B,A);
      // u2 accumulates X,Y
      input.addData(
        StoreEvent("u1", 1, "n1", "g1", "pA", 0, 4),
        StoreEvent("u1", 2, "n1", "g1", "pB", 10, 14),
        StoreEvent("u1", 3, "n1", "g1", "pA", 0, 4),
        StoreEvent("u2", 1, "n1", "g1", "pX", 0, 2),
        StoreEvent("u2", 2, "n1", "g1", "pY", 5, 7))
      q.processAllAvailable()
      val afterB1 = latest("store_out", "people_csv", "ner_version")
      assert(afterB1("u1") == ("pB,pA", "n1"), afterB1)
      assert(afterB1("u2") == ("pX,pY", "n1"), afterB1)

      // batch 2: u1 sees a NEW ner version -> state cleared, then C,A;
      // u2 same version, duplicate X re-appends at the end (-> Y,X)
      input.addData(
        StoreEvent("u1", 4, "n2", "g1", "pC", 20, 24),
        StoreEvent("u1", 5, "n2", "g1", "pA", 0, 4),
        StoreEvent("u2", 3, "n1", "g1", "pX", 0, 2))
      q.processAllAvailable()
      val afterB2 = latest("store_out", "people_csv", "ner_version")
      assert(afterB2("u1") == ("pC,pA", "n2"), afterB2)
      assert(afterB2("u2") == ("pY,pX", "n1"), afterB2)
    } finally q.stop()
  }

  test("streaming snapshots agree with the batch replay on a replayed log") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a log whose final state the batch operator's semantics predict:
    // last version boundary at seq 4, survivors deduped keep-last
    val log = Seq(
      StoreEvent("w", 1, "n1", "g1", "pA", 0, 1),
      StoreEvent("w", 2, "n1", "g2", "pB", 2, 3), // version change: clears pA
      StoreEvent("w", 3, "n1", "g2", "pC", 4, 5),
      StoreEvent("w", 4, "n2", "g2", "pD", 6, 7), // version change: clears B,C
      StoreEvent("w", 5, "n2", "g2", "pE", 8, 9),
      StoreEvent("w", 6, "n2", "g2", "pD", 6, 7)) // dup: D moves after E
    val input = MemoryStream[StoreEvent]
    val q = Streaming.resultStore(input.toDS())
      .writeStream.format("memory").queryName("store_replay_out")
      .outputMode("update").start()
    try {
      log.grouped(2).foreach { batch => input.addData(batch: _*); q.processAllAvailable() }
      val fin = latest("store_replay_out", "ner_version", "people_csv")("w")
      assert(fin == ("n2", "pE,pD"), fin)
    } finally q.stop()
  }
}
