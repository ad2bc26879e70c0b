package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.ArticleStore

class ArticleStoreSpec extends SparkSpec {

  private def ts(day: Int): Timestamp = Timestamp.valueOf(f"2024-05-$day%02d 10:00:00")

  test("write dedups on (portal,url), partitions by portal/date, and listByPeriod prunes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("articles").toString + "/store"
    val articles = Seq(
      ("p1", "u1", ts(1), "a one", Seq("cityA")),
      ("p1", "u1", ts(1), "a one dup", Seq("cityA")), // dup key -> dropped
      ("p1", "u2", ts(2), "a two", Seq("cityB")),
      ("p2", "u3", ts(2), "b one", Seq("cityA")))
      .toDF("portal_name", "url", "published_at", "body", "cities")
    ArticleStore.write(articles, dir)

    val all = ArticleStore.read(spark, dir)
    assert(all.count() == 3)

    // partition layout exists (the "index")
    val p1dirs = new java.io.File(dir, "portal_name=p1").list()
    assert(p1dirs != null && p1dirs.exists(_.startsWith("pub_date=")))

    val listed = ArticleStore.listByPeriod(spark, dir, "p1", "2024-05-01", "2024-05-02")
    assert(listed.count() == 2)
    val cityFiltered = ArticleStore.listByPeriod(spark, dir, "p1", "2024-05-01", "2024-05-02", Some("cityA"))
    assert(cityFiltered.select("url").as[String].collect().toSeq == Seq("u1"))

    // pruning reaches the scan: partition filters present in the plan
    val plan = listed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("portal_name"), plan)

    // city secondary index: listByCity prunes on the city partition
    // instead of scanning the store with array_contains
    val byCity = ArticleStore.listByCity(spark, dir, "cityA", "2024-05-01", "2024-05-02")
    assert(byCity.select("url").as[String].collect().sorted.toSeq == Seq("u1", "u3"))
    val cityPlan = byCity.queryExecution.executedPlan.toString
    assert(cityPlan.contains("PartitionFilters") && cityPlan.contains("city"), cityPlan)
    assert(!cityPlan.contains("array_contains"), cityPlan)

    // full-row variant returns the same articles via the semi join
    val fullRows = ArticleStore.listArticlesByCity(spark, dir, "cityA", "2024-05-01", "2024-05-02")
    assert(fullRows.select("url").as[String].collect().sorted.toSeq == Seq("u1", "u3"))
  }
}
