package graft

import org.apache.spark.sql.functions._

class CurationPipelineSpec extends SparkSpec {

  test("curate runs the full flow: dedup, quality, decontaminate, near-dup, sample, pack") {
    val good = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = spark.createDataFrame(Seq(
      (0L, "s", good), // eval doc: excluded from output, defines contamination
      (1L, "s", good.replace("alpha", "omega")), // near-copy of eval -> contaminated
      (2L, "s", "all work and no play " * 8), // repetitive -> quality-dropped
      (3L, "s", "too short to keep"), // < 20 tokens -> quality-dropped
      (4L, "s", (1 to 20).map(i => s"w$i").mkString(" ")), // clean keeper
      (5L, "s", (1 to 20).map(i => s"w$i").mkString(" ")), // exact dup of 4 -> dropped
      (6L, "s", (1 to 20).map(i => s"v$i").mkString(" ")), // clean keeper
      (7L, "s", (1 to 20).map(i => s"v$i").mkString(" ") + " extra"))) // near-dup of 6
      .toDF("doc_id", "source", "text")
    val out = CurationPipeline.curate(docs, col("doc_id") === 0,
      CurationPipeline.Config(sampleDenom = 1, ctxLen = 16))
      .orderBy(col("doc_id")).collect()
    // survivors: 4 (exact-dup rep) and 6 (near-dup rep); 20 tokens each
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(4L, 6L))
    assert(out.map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("offset_in_seq"),
      r.getAs[Boolean]("straddles"))).toSeq ==
      Seq((0L, 0L, true), (1L, 4L, true))) // 20-token docs in 16-token windows
  }

  test("sampleDenom thins the surviving corpus per source") {
    val docs = spark.createDataFrame(
      (1L to 40L).map(i => (i, s"src${i % 2}", (1 to 25).map(j => s"t${i}x$j").mkString(" "))))
      .toDF("doc_id", "source", "text")
    val out = CurationPipeline.curate(docs, lit(false),
      CurationPipeline.Config(sampleDenom = 4, ctxLen = 64))
    assert(out.count() == 10) // ceil(20/4) per source x 2 sources
  }
}
