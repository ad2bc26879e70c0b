package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.StreamingSemDedup

/** The incremental semantic-dedup gate: replaying an embedding corpus
  * through micro-batches against a fixed quantizer must fold to
  * exactly the batch q156 verdicts on the union — every pair scored
  * once, in the batch where its later member arrives, with historical
  * members retro-flipped when a higher-priority paraphrase arrives. */
class StreamingSemDedupSpec extends SparkSpec {

  private val Tau = 400000L

  test("incremental SemDeDup across micro-batches equals the batch verdicts on the union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    // fixed quantizer trained offline on the full corpus
    val cents = Similarity.kmeansFit(emb, 8, 64, 2)._2
    val expected = Similarity.semDedupVerdictsAssigned(
      Similarity.kmeansAssign(
        emb.select(col("vec_id"), Similarity.microVec(col("embedding")).as("m")),
        cents), Tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.get(4)), r.getString(5))).toSet

    val rows = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val tmp = java.nio.file.Files.createTempDirectory("semdedup").toFile
    val op = new StreamingSemDedup(s"$tmp/members", Tau)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = op.run(input.toDF().toDF("vec_id", "embedding"), cents,
      s"$tmp/deltas", s"$tmp/chk")
    try {
      rows.grouped(17).foreach { g =>
        input.addData(g.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = op.verdicts(spark, s"$tmp/deltas")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.get(4)), r.getString(5))).toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("a later-arriving higher-priority paraphrase retro-drops the stored member") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def v(xs: Double*) = xs.map(_.toFloat).toSeq
    // one centroid at the origin direction; b sits FARTHER from the
    // centroid than a, and cos(a, b) ~ 1 -> b (higher priority) drops a
    val cents = Seq((0L, Seq.fill(8)(0L)))
      .toDF("cid", "cm")
    val a = (1L, v(0.6, 0.8, 0, 0, 0, 0, 0, 0))
    val b = (2L, v(0.9, 1.2, 0, 0, 0, 0, 0, 0))
    val tmp = java.nio.file.Files.createTempDirectory("semdedup2").toFile
    val op = new StreamingSemDedup(s"$tmp/members", Tau)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = op.run(input.toDF().toDF("vec_id", "embedding"), cents,
      s"$tmp/deltas", s"$tmp/chk")
    try {
      input.addData(a); q.processAllAvailable()
      // alone, a is kept
      val interim = op.verdicts(spark, s"$tmp/deltas").collect()
      assert(interim.length === 1 && interim.head.getString(5) === "kept")
      input.addData(b); q.processAllAvailable()
    } finally q.stop()
    val fin = op.verdicts(spark, s"$tmp/deltas")
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(fin === Map(1L -> "dropped", 2L -> "kept"))
  }
}
