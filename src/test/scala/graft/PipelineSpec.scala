package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.sources.ArticleStore

class PipelineSpec extends SparkSpec {

  test("end-to-end: raw payloads -> dedup -> normalize -> enrich -> store -> query") {
    import spark.implicits._
    val ts = Timestamp.valueOf("2024-05-01 10:00:00")
    val raw = Seq(
      ("p1", "u1", ts, "t1", "leia também: lixo\nthe spark join runs here"),
      ("p1", "u1", ts, "t1-dup", "should be dropped"),
      ("p1", "u2", ts, "t2", "no known keywords in this text"))
      .toDF("portal_name", "url", "published_at", "title", "body")

    val processed = Pipeline.processArticles(spark, raw)
    val rows = processed.orderBy("url").collect()
    assert(rows.length == 2)
    val u1 = rows(0)
    assert(u1.getAs[String]("norm_body") == "the spark join runs here")
    assert(u1.getSeq[String](u1.fieldIndex("cities")).toSeq == Seq("join", "spark"))
    assert(u1.getAs[String]("primary_keyword") == "spark") // 1350 vs join 1300
    val u2 = rows(1)
    assert(u2.getSeq[String](u2.fieldIndex("cities")).isEmpty)
    assert(u2.getAs[Long]("n_mentions") == 0L)

    // store + pruned listing round-trip
    val dir = Files.createTempDirectory("pipe").toString + "/store"
    ArticleStore.write(processed, dir)
    val listed = ArticleStore.listByPeriod(spark, dir, "p1", "2024-05-01", "2024-05-01", Some("spark"))
    assert(listed.select("url").as[String].collect().toSeq == Seq("u1"))
  }
}
