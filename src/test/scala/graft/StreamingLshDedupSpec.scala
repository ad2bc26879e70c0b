package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamingLshDedup

/** The incremental-ingest near-dup gate: replaying a corpus through
  * micro-batches must emit exactly the batch q23 MinHash-LSH verdict
  * on the union — each candidate pair once, in the batch where its
  * later member arrives. */
class StreamingLshDedupSpec extends SparkSpec {

  test("incremental LSH dedup across micro-batches equals batch q23 on the union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).orderBy(col("doc_id")).limit(150)
    val docs = docsDf.collect().map(r => (r.getLong(0), r.getString(1)))

    val tmp = java.nio.file.Files.createTempDirectory("lshdedup").toFile
    val op = new StreamingLshDedup(s"$tmp/index")
    val input = MemoryStream[(Long, String)]
    val q = op.run(input.toDF().toDF("doc_id", "text"), "text", "doc_id",
      s"$tmp/verdicts", s"$tmp/chk")
    try {
      // three micro-batches of 50 arrivals each
      docs.grouped(50).foreach { g =>
        input.addData(g.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamedRows = spark.read.parquet(s"$tmp/verdicts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batchRows = Dedup.minhashCandidates(
      Dedup.minhashSignatures(
        Dedup.shingles(docsDf, "text", "doc_id"), "doc_id"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // exactly the batch verdict — same pairs, same band counts…
    assert(streamedRows.toSet == batchRows.toSet)
    // …and each pair emitted exactly once across all batches
    assert(streamedRows.length == batchRows.length)
    assert(batchRows.nonEmpty) // the corpus really has near-dup candidates
  }

  test("a pair is emitted in the batch where its later member arrives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two identical tiny docs arriving in DIFFERENT batches
    val tmp = java.nio.file.Files.createTempDirectory("lshdedup2").toFile
    val op = new StreamingLshDedup(s"$tmp/index")
    val input = MemoryStream[(Long, String)]
    val q = op.run(input.toDF().toDF("doc_id", "text"), "text", "doc_id",
      s"$tmp/verdicts", s"$tmp/chk")
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    try {
      input.addData((1L, text)); q.processAllAvailable()
      val afterFirst =
        try spark.read.parquet(s"$tmp/verdicts").count() catch { case _: Throwable => 0L }
      assert(afterFirst == 0L) // nothing to match yet
      input.addData((2L, text)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(s"$tmp/verdicts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // identical docs agree on every band
    assert(rows.toSeq == Seq((1L, 2L, graft.operators.Dedup.MinhashBands.toLong)))
  }
}
