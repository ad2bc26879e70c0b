package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.CdcQueries
import graft.streaming.StreamingCdcDedup

/** Incremental CDC chunk dedup: the fold of the streamed chunk index
  * must be exactly batch q181 on the union, and every at-ingest
  * verdict is the causal prefix of the global one. */
class StreamingCdcDedupSpec extends SparkSpec {

  test("chunk-log fold equals batch q181; ingest verdicts are causal prefixes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val expected = CdcQueries.cdcChunks(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val rows = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val tmp = java.nio.file.Files.createTempDirectory("cdcdedup").toFile
    val op = new StreamingCdcDedup(s"$tmp/chunks")
    val input = MemoryStream[(Long, String)]
    val q = op.run(input.toDF().toDF("doc_id", "text"),
      "text", "doc_id", s"$tmp/verdicts", s"$tmp/chk")
    try {
      rows.grouped(83).foreach { g =>
        input.addData(g.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // fold == batch audit, field for field
    val folded = op.foldAudit(spark).collect()
    assert(folded.length === expected.size)
    folded.foreach { r =>
      val e = expected(r.getAs[Long]("doc_id"))
      Seq("n_chars", "n_chunks", "max_chunk_len", "mean_chunk_len_milli",
        "dup_chunks", "dup_chars", "dup_share_e6").foreach { c =>
        assert(r.getAs[Long](c) === e.getAs[Long](c),
          s"$c of doc ${r.getAs[Long]("doc_id")}")
      }
    }

    // at-ingest duplication never exceeds the global verdict (the
    // future can only add copies), and the stream actually exposes
    // both a strict case and an equal case
    val ingest = spark.read.parquet(s"$tmp/verdicts").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dup_chunks_at_ingest"), r.getAs[Long]("dup_chars_at_ingest"))).toMap
    assert(ingest.size === expected.size)
    ingest.foreach { case (id, (dc, dch)) =>
      assert(dc <= expected(id).getAs[Long]("dup_chunks"), s"chunks of $id")
      assert(dch <= expected(id).getAs[Long]("dup_chars"), s"chars of $id")
    }
    assert(ingest.exists { case (id, (dc, _)) =>
      dc < expected(id).getAs[Long]("dup_chunks") },
      "a first copy must predate its duplicates somewhere")
    assert(ingest.exists { case (id, (dc, _)) =>
      dc > 0 && dc == expected(id).getAs[Long]("dup_chunks") },
      "a last copy must see all its duplicates at ingest")
  }
}
