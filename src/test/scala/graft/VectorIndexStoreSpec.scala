package graft

import org.apache.spark.sql.functions._

import graft.sources.VectorIndexStore

class VectorIndexStoreSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("persisted IVF-PQ index answers searches identically to the in-memory build") {
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") >= 10)
    val queries = emb.filter(col("vec_id") < 10)
    val dir = java.nio.file.Files.createTempDirectory("vindex").toString

    VectorIndexStore.build(spark, corpus, dir, k = 8, dim = 64, iters = 2)
    val fromStore = VectorIndexStore.search(spark, queries, dir, nprobe = 2, topK = 3)
      .orderBy(col("q_vec_id"), col("rank")).collect()
      .map(r => (r.getAs[Long]("q_vec_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("centroid_id"), r.getAs[Long]("adc_dist")))

    // in-memory reference: same trained quantizer, same codebook rule
    val cents = graft.operators.Similarity.kmeansFit(corpus, 8, 64, 2)._2
    val inMem = graft.operators.Similarity.ivfPqTopK(
      queries, corpus, cents,
      rsubs => {
        val ids = rsubs.select(col("vec_id")).distinct()
          .orderBy(col("vec_id")).limit(VectorIndexStore.CodebookCodes)
          .withColumn("code", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))).cast("long") - 1)
        rsubs.join(broadcast(ids), Seq("vec_id"))
          .select(col("code"), col("block"), col("sub").as("cw"))
      },
      nprobe = 2, k = 3)
      .orderBy(col("q_vec_id"), col("rank")).collect()
      .map(r => (r.getAs[Long]("q_vec_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("centroid_id"), r.getAs[Long]("adc_dist")))

    assert(fromStore.nonEmpty && fromStore.toSeq == inMem.toSeq)
  }

  test("the codes scan prunes to probed cluster partitions") {
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("vindex2").toString
    VectorIndexStore.build(spark, emb.filter(col("vec_id") >= 10), dir, 8, 64, 2)
    val plan = VectorIndexStore.search(spark, emb.filter(col("vec_id") < 10), dir, 2, 3)
      .queryExecution.executedPlan.toString
    // the codes relation must carry a partition filter on cluster
    // (dynamic partition pruning from the broadcast ADC join) — the
    // inverted-list seek; raw embeddings never appear in the scan
    assert(plan.contains("dynamicpruning") || plan.contains("PartitionFilters: [isnotnull(cluster"),
      plan.linesIterator.filter(_.contains("codes")).mkString("\n"))
  }
}
