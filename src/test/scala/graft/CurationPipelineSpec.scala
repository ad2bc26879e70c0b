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

  test("curateWithSplit tags packed sequences with their domain split") {
    val docs = spark.createDataFrame(
      (0 until 40).map(i => (i.toLong, s"src$i", // 40 distinct domains
        (1 to 25).map(j => s"w${i}_$j").mkString(" "))))
      .toDF("doc_id", "source", "text")
    val out = CurationPipeline.curateWithSplit(docs, col("doc_id") === -1,
      CurationPipeline.Config(sampleDenom = 1, ctxLen = 64))
      .collect()
    assert(out.nonEmpty)
    // the split is a pure function of the source domain
    out.groupBy(_.getAs[String]("source")).values.foreach { rs =>
      assert(rs.map(_.getAs[String]("split")).distinct.length == 1)
    }
    assert(out.forall(r => Set("train", "valid", "test")(r.getAs[String]("split"))))
    // 40 domains hash into more than one split class
    assert(out.map(_.getAs[String]("split")).distinct.length >= 2)
  }

  test("boilerplate-prefix docs below the Jaccard bar die in the gram stage") {
    val boiler = (1 to 30).map(i => s"c$i").mkString(" ")
    val docs = spark.createDataFrame(Seq(
      (0L, "s", boiler), // 100% of its 5-grams appear in doc 1
      (1L, "s", boiler + " " + (1 to 40).map(i => s"b$i").mkString(" ")),
      (2L, "s", (1 to 30).map(i => s"u$i").mkString(" ")))) // unique keeper
      .toDF("doc_id", "source", "text")
    val out = CurationPipeline.curate(docs, col("doc_id") === -1,
      CurationPipeline.Config(sampleDenom = 1, ctxLen = 64))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // Jaccard(0,1) = 28/68 < 0.5 so clustering keeps both; the gram
    // stage then drops doc 0 (all its grams duplicated in doc 1) while
    // doc 1 (40% duplicated) and doc 2 survive
    assert(out == Set(1L, 2L))
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
