package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.CorpusAuditQueries
import graft.streaming.StreamingDriftMonitor

/** Drift monitoring at ingest: folding per-batch histograms must
  * re-derive exactly the batch q162 verdict on everything seen. */
class StreamingDriftMonitorSpec extends SparkSpec {

  test("incremental drift verdict after the last batch equals batch q162") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    val tmp = java.nio.file.Files.createTempDirectory("driftmon").toFile
    val mon = new StreamingDriftMonitor(s"$tmp/hist")
    val input = MemoryStream[(Long, String, String)]
    val q = mon.run(input.toDF().toDF("doc_id", "source", "text"),
      "text", "source", s"$tmp/verdicts", s"$tmp/chk")
    try {
      docs.grouped(180).foreach { g =>
        input.addData(g.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val snaps = spark.read.parquet(s"$tmp/verdicts")
    val lastSeq = snaps.agg(max(col("batch_seq"))).head().getLong(0)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_bins"), r.getAs[Long]("ks_e6"),
        r.getAs[Long]("tv_e6"), r.getAs[Long]("modal_bin"))
    val streamed = snaps.filter(col("batch_seq") === lastSeq)
      .collect().map(key).toSet
    val batch = CorpusAuditQueries.lengthDrift(spark, sfDir)
      .collect().map(key).toSet
    assert(streamed === batch)
    // earlier snapshots exist and cover fewer docs — the monitor was
    // genuinely incremental, not a single catch-up batch
    assert(lastSeq > 0L)
    val firstDocs = snaps.filter(col("batch_seq") === 0L)
      .agg(sum(col("n_docs"))).head().getLong(0)
    val lastDocs = snaps.filter(col("batch_seq") === lastSeq)
      .agg(sum(col("n_docs"))).head().getLong(0)
    assert(firstDocs < lastDocs)
    assert(lastDocs === docs.length.toLong)
  }

  test("a source that starts truncating is flagged within one batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("driftmon2").toFile
    val mon = new StreamingDriftMonitor(s"$tmp/hist")
    val long = "tok " * 200
    val short = "tok tok"
    // batch 1: both sources ship long docs — srcB matches the rest
    val b1 = (1 to 40).map(i => (i.toLong, if (i % 2 == 0) "srcA" else "srcB", long))
    // batch 2: srcB flips to truncated docs
    val b2 = (41 to 80).map(i => (i.toLong, if (i % 2 == 0) "srcA" else "srcB",
      if (i % 2 == 0) long else short))
    val input = MemoryStream[(Long, String, String)]
    val q = mon.run(input.toDF().toDF("doc_id", "source", "text"),
      "text", "source", s"$tmp/verdicts", s"$tmp/chk")
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val snaps = spark.read.parquet(s"$tmp/verdicts")
    def ks(seq: Long): Long = snaps
      .filter(col("batch_seq") === seq && col("source") === "srcB")
      .head().getAs[Long]("ks_e6")
    assert(ks(0L) === 0L, "identical distributions start at zero drift")
    assert(ks(1L) > 300000L, "the truncation flip must move KS sharply")
  }
}
