package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.CorpusStatsQueries
import graft.streaming.StreamingContamGuard

/** The decontamination-on-ingest gate: replaying training docs through
  * micro-batches against the fixed benchmark gram index must emit
  * exactly the batch q151 verdicts for those docs. */
class StreamingContamGuardSpec extends SparkSpec {

  test("incremental contamination verdicts across micro-batches equal batch q151") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    val tmp = java.nio.file.Files.createTempDirectory("contamguard").toFile
    val guard = new StreamingContamGuard(s"$tmp/bench")
    // one-time setup: the benchmark suite is q151's doc_id % 41 == 0 stripe
    guard.writeBenchIndex(
      docs.filter(pmod(col("doc_id"), lit(CorpusStatsQueries.ContamBenchMod)) === 0),
      "text")

    val training = docs
      .filter(pmod(col("doc_id"), lit(CorpusStatsQueries.ContamBenchMod)) =!= 0)
      .select(col("doc_id"), col("text")).orderBy(col("doc_id")).limit(120)
      .collect().map(r => (r.getLong(0), r.getString(1)))

    val input = MemoryStream[(Long, String)]
    val q = guard.run(input.toDF().toDF("doc_id", "text"), "text", "doc_id",
      s"$tmp/verdicts", s"$tmp/chk")
    try {
      training.grouped(40).foreach { g =>
        input.addData(g.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.read.parquet(s"$tmp/verdicts")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_hit"), r.getAs[Long]("hit_frac_e6"),
        r.getAs[String]("verdict")))
    // batch q151 on the full corpus, restricted to the streamed ids
    val ids = training.map(_._1).toSet
    val batch = CorpusStatsQueries.ngramContamination(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_hit"), r.getAs[Long]("hit_frac_e6"),
        r.getAs[String]("verdict")))
      .filter(t => ids.contains(t._1))
    assert(streamed.toSet === batch.toSet)
    assert(streamed.length === batch.length) // each doc judged exactly once
    assert(streamed.exists(_._5 != "clean")) // the stripe really contaminates
  }

  test("a benchmark clone arriving mid-stream is flagged contaminated") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("contamguard2").toFile
    val guard = new StreamingContamGuard(s"$tmp/bench")
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    guard.writeBenchIndex(Seq(benchText).toDF("text"), "text")

    val input = MemoryStream[(Long, String)]
    val q = guard.run(input.toDF().toDF("doc_id", "text"), "text", "doc_id",
      s"$tmp/verdicts", s"$tmp/chk")
    try {
      input.addData((1L, "completely unrelated words nowhere near the suite at all ok"))
      q.processAllAvailable()
      input.addData((2L, benchText), (3L, "tiny"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(s"$tmp/verdicts")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(rows(1L) === "clean")
    assert(rows(2L) === "contaminated")
    assert(rows(3L) === "short") // below the 8-gram grain
  }
}
