package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.VectorMiningQueries
import graft.streaming.StreamingKnnGraph

/** Incremental k-NN graph maintenance: replaying the embedding corpus
  * through micro-batches must fold to exactly the batch q183 audit on
  * the union — every candidate pair scored once, in the batch where
  * its later member arrives. */
class StreamingKnnGraphSpec extends SparkSpec {

  private def auditRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("degree"),
      r.getAs[Long]("in_degree"), r.getAs[Long]("recip_edges"),
      Option(r.get(r.fieldIndex("top1_id"))), Option(r.get(r.fieldIndex("top1_cos_e6"))),
      r.getAs[Long]("sum_cos_e6"))).toSet

  test("micro-batch replay folds to the batch q183 audit on the union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val expected = auditRows(VectorMiningQueries.knnGraph(spark, sfDir))
    val rows = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val tmp = java.nio.file.Files.createTempDirectory("knngraph").toFile
    val op = new StreamingKnnGraph(s"$tmp/state")
    val input = MemoryStream[(Long, Seq[Float])]
    val q = op.run(input.toDF().toDF("vec_id", "embedding"),
      s"$tmp/edges", s"$tmp/chk")
    try {
      rows.grouped(97).foreach { g =>
        input.addData(g.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = auditRows(op.graphAudit(spark, s"$tmp/edges"))
    assert(got === expected)
    assert(expected.nonEmpty)
    // every candidate pair was scored exactly once across all batches
    val log = spark.read.parquet(s"$tmp/edges")
    assert(log.count() === log.select(col("src"), col("dst")).distinct().count())
  }

  test("the audit is refreshable mid-stream and grows monotonically") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .limit(60).collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val tmp = java.nio.file.Files.createTempDirectory("knngraph2").toFile
    val op = new StreamingKnnGraph(s"$tmp/state")
    val input = MemoryStream[(Long, Seq[Float])]
    val q = op.run(input.toDF().toDF("vec_id", "embedding"),
      s"$tmp/edges", s"$tmp/chk")
    try {
      input.addData(rows.take(30).toSeq: _*); q.processAllAvailable()
      val mid = op.graphAudit(spark, s"$tmp/edges").collect()
      assert(mid.length === 30, "mid-stream audit covers only ingested vectors")
      input.addData(rows.drop(30).toSeq: _*); q.processAllAvailable()
      val fin = op.graphAudit(spark, s"$tmp/edges").collect()
      assert(fin.length === 60)
      // already-ingested nodes never lose edges when more data arrives
      val midDeg = mid.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("degree")).toMap
      fin.foreach { r =>
        midDeg.get(r.getAs[Long]("vec_id")).foreach { d =>
          assert(r.getAs[Long]("degree") >= d)
        }
      }
    } finally q.stop()
  }
}
