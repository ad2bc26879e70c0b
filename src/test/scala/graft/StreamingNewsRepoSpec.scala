package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streaming
import graft.streaming.Streaming.RepoEvent

/** Streaming news-repo mutation state (infrastructure/extraction.py:
  * 77-113): the cross-batch behaviors the batch replay (q124) cannot
  * exercise incrementally — upsert-on-error, the processed-before-
  * creation no-op, and the last_error-survives-success quirk applied
  * across micro-batch boundaries. */
class StreamingNewsRepoSpec extends SparkSpec {

  private def latest(table: String): Map[String, (Boolean, Option[Boolean], Long, String, String)] =
    spark.sql(s"SELECT url, upserted, ner_done, err_count, last_error, ner_version FROM (" +
      "SELECT *, row_number() OVER (PARTITION BY url ORDER BY last_seq DESC, err_count ASC) AS rn " +
      s"FROM $table) WHERE rn = 1")
      .collect().map { r =>
        r.getString(0) -> ((r.getBoolean(1),
          if (r.isNullAt(2)) None else Some(r.getBoolean(2)),
          r.getLong(3), r.getString(4), r.getString(5)))
      }.toMap

  test("upsert-on-error, processed-before-creation no-op, last_error survives success") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RepoEvent]
    val q = Streaming.newsRepoState(input.toDS())
      .writeStream.format("memory").queryName("repo_out")
      .outputMode("update").start()
    try {
      // batch 1: u1 collected then errors twice; u2 NOT collected —
      // its processed event must be a silent no-op (mark_processed
      // does not upsert), its later error upserts it; u3 collected only
      input.addData(
        RepoEvent("u1", 1, "collect", null, null, null),
        RepoEvent("u1", 2, "error", "boom-1", null, null),
        RepoEvent("u1", 3, "error", "boom-2", null, null),
        RepoEvent("u2", 1, "processed", null, "n1", "g1"),
        RepoEvent("u2", 2, "error", "late-birth", null, null),
        RepoEvent("u3", 1, "collect", null, null, null))
      q.processAllAvailable()
      val b1 = latest("repo_out")
      assert(b1("u1") == ((false, Some(false), 2L, "boom-2", null)), b1)
      // u2 exists only via the error; the earlier processed left no trace
      assert(b1("u2") == ((true, Some(false), 1L, "late-birth", null)), b1)
      // collected but never extracted: ner_done is unset, no errors
      assert(b1("u3") == ((false, None, 0L, null, null)), b1)

      // batch 2: u1 succeeds — the errors ARRAY clears ($unset) but
      // last_error SURVIVES (mark_processed never unsets it); u2's
      // processed now applies (the document exists since its error)
      input.addData(
        RepoEvent("u1", 4, "processed", null, "n2", "g2"),
        RepoEvent("u2", 3, "processed", null, "n1", "g1"))
      q.processAllAvailable()
      val b2 = latest("repo_out")
      assert(b2("u1") == ((false, Some(true), 0L, "boom-2", "n2")), b2)
      assert(b2("u2") == ((true, Some(true), 0L, "late-birth", "n1")), b2)
    } finally q.stop()
  }

  test("streaming snapshots agree with the batch replay semantics on a replayed log") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RepoEvent]
    val q = Streaming.newsRepoState(input.toDS())
      .writeStream.format("memory").queryName("repo_out2")
      .outputMode("update").start()
    try {
      // error -> processed -> error -> error: final state has the
      // post-success errors only, ner_done false, last_error = latest
      input.addData(
        RepoEvent("u9", 1, "error", "e1", null, null),
        RepoEvent("u9", 2, "processed", null, "nA", "gA"))
      q.processAllAvailable()
      input.addData(
        RepoEvent("u9", 3, "error", "e2", null, null),
        RepoEvent("u9", 4, "error", "e3", null, null))
      q.processAllAvailable()
      val fin = latest("repo_out2")("u9")
      assert(fin == ((true, Some(false), 2L, "e3", "nA")), fin)
      // err_first/err_last track the CURRENT array (since the success)
      val row = spark.sql("SELECT err_first, err_last FROM (SELECT *, " +
        "row_number() OVER (PARTITION BY url ORDER BY last_seq DESC) AS rn " +
        "FROM repo_out2) WHERE rn = 1 AND url = 'u9'").collect()(0)
      assert(row.getString(0) == "e2" && row.getString(1) == "e3")
    } finally q.stop()
  }
}
