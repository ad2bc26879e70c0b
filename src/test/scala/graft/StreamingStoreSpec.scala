package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sources.ArticleStore

/** Streaming ingestion end-to-end: a stream of raw article payloads is
  * processed by the batch Pipeline inside foreachBatch and lands in
  * the partitioned ArticleStore — the production wiring where each
  * micro-batch reuses the exact batch operators. */
class StreamingStoreSpec extends SparkSpec {

  test("stream -> Pipeline -> ArticleStore via foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("sstore").toString + "/store"
    val ts = Timestamp.valueOf("2024-05-01 10:00:00")

    val input = MemoryStream[(String, String, Timestamp, String, String)]
    val raw = input.toDF().toDF("portal_name", "url", "published_at", "title", "body")
    val q = raw.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          ArticleStore.write(Pipeline.processArticles(spark, batch), dir,
            org.apache.spark.sql.SaveMode.Append)
        }
      }
      .start()
    try {
      input.addData(
        ("p1", "u1", ts, "t1", "the spark join runs here"),
        ("p2", "u2", ts, "t2", "plain text"))
      q.processAllAvailable()
      val listed = ArticleStore.listByPeriod(spark, dir, "p1", "2024-05-01", "2024-05-01")
      assert(listed.select("url").as[String].collect().toSeq == Seq("u1"))
    } finally q.stop()
  }
}
