package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamingDedupClusters

/** Incremental min-label clustering must converge to exactly the
  * batch q67-style CC verdict over the union's candidate pairs, no
  * matter how the stream is batched — including cross-batch cluster
  * merges, where the surviving root is the overall min node id. */
class StreamingDedupClustersSpec extends SparkSpec {

  test("incremental clusters across micro-batches equal batch CC on the union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).orderBy(col("doc_id")).limit(150)
    val docs = docsDf.collect().map(r => (r.getLong(0), r.getString(1)))

    val tmp = java.nio.file.Files.createTempDirectory("lshcc").toFile
    val op = new StreamingDedupClusters(s"$tmp/index", s"$tmp/clusters")
    val input = MemoryStream[(Long, String)]
    val q = op.run(input.toDF().toDF("doc_id", "text"), "text", "doc_id",
      s"$tmp/verdicts", s"$tmp/chk")
    try {
      docs.grouped(50).foreach { g =>
        input.addData(g.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = op.currentAssignments(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Dedup.connectedComponents(
      Dedup.minhashCandidates(
        Dedup.minhashSignatures(
          Dedup.shingles(docsDf, "text", "doc_id"), "doc_id"), "doc_id"),
      "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("a cross-batch bridge merges two existing clusters down to the min root") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("lshcc2").toFile
    val op = new StreamingDedupClusters(s"$tmp/index", s"$tmp/clusters")
    val input = MemoryStream[(Long, String)]
    val q = op.run(input.toDF().toDF("doc_id", "text"), "text", "doc_id",
      s"$tmp/verdicts", s"$tmp/chk")
    val tA = "alpha beta gamma delta epsilon zeta eta theta"
    val tB = "one two three four five six seven eight nine"
    try {
      // batch 1: cluster {1,2} on text A; batch 2: cluster {10,11} on
      // text B; batch 3: doc 12 duplicates BOTH (bridging text) — all
      // five must collapse onto root 1
      input.addData((1L, tA), (2L, tA)); q.processAllAvailable()
      input.addData((10L, tB), (11L, tB)); q.processAllAvailable()
      val mid = op.currentAssignments(spark)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(mid == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
      input.addData((12L, tA + " " + tB)); q.processAllAvailable()
    } finally q.stop()
    val fin = op.currentAssignments(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // the binding invariant: whatever the bridge doc's bands collide
    // with, the incremental state equals batch CC over the union
    import spark.implicits._
    val unionDf = Seq((1L, tA), (2L, tA), (10L, tB), (11L, tB),
      (12L, tA + " " + tB)).toDF("doc_id", "text")
    val batch = Dedup.connectedComponents(
      Dedup.minhashCandidates(
        Dedup.minhashSignatures(
          Dedup.shingles(unionDf, "text", "doc_id"), "doc_id"), "doc_id"),
      "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fin == batch, s"streamed=$fin batch=$batch")
    // and the merge (if the bridge matched both sides) relabeled EVERY
    // member of the absorbed cluster, not just its root
    if (fin.get(12L).contains(1L) && fin.get(10L).contains(1L))
      assert(fin(11L) == 1L)
  }
}
