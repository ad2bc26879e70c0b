package graft

import graft.multimodal.MultimodalBatch

class MultimodalSpec extends SparkSpec {

  test("asset pipeline decodes deterministic features via batched mapPartitions") {
    val docs = Tables.documents(spark, sfDir).limit(100)
    val assets = MultimodalBatch.assetsFromDocuments(spark, docs)
    val feats = MultimodalBatch.decodeFeatures(assets)
    val rows = feats.collect()
    assert(rows.length == 100)
    assert(rows.forall(f => f.width >= 16 && f.width < 80))
    assert(rows.forall(f => f.n_frames >= 1 && f.n_frames <= 7))
    // deterministic: same input -> same features
    val again = MultimodalBatch.decodeFeatures(assets).collect()
    assert(rows.sortBy(_.asset_id).toSeq == again.sortBy(_.asset_id).toSeq)
  }

  test("payload is genuine binary with byte-accurate length") {
    import spark.implicits._
    val df = Seq((1L, "héllo")).toDF("doc_id", "text")
      .withColumnRenamed("text", "text")
    val assets = MultimodalBatch.assetsFromDocuments(spark,
      df.withColumnRenamed("doc_id", "doc_id").withColumn("source", org.apache.spark.sql.functions.lit("s")))
    val f = MultimodalBatch.decodeFeatures(assets).collect().head
    assert(f.byte_len == 6) // é is 2 bytes in UTF-8
  }
}
