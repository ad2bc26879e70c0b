package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Collector

class CollectorSpec extends SparkSpec {
  import spark.implicits._

  private def page(n: Int): DataFrame = n match {
    case 1 => Seq(("p", "u1", "a"), ("p", "u2", "b")).toDF("portal_name", "url", "body")
    case 2 => Seq(("p", "u2", "b"), ("p", "u3", "c")).toDF("portal_name", "url", "body") // 1 overlap
    case 3 => Seq(("p", "u3", "c")).toDF("portal_name", "url", "body") // all seen -> stop
    case _ => Seq(("p", "u9", "z")).toDF("portal_name", "url", "body") // never reached
  }

  test("collectAll walks pages until one adds nothing new") {
    val sweep = Collector.collectAll(page, Seq("portal_name", "url"))
    assert(sweep.pagesFetched == 2)
    assert(sweep.totalNew == 3)
    val urls = sweep.articles.select("url").as[String].collect().sorted.toSeq
    assert(urls == Seq("u1", "u2", "u3"))
  }

  test("each page is fetched exactly once (no O(P^2) refetch)") {
    val fetches = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    def counted(n: Int): DataFrame = { fetches(n) += 1; page(n) }
    val sweep = Collector.collectAll(counted, Seq("portal_name", "url"))
    // force full consumption of the result AFTER the sweep — the
    // buffered pages are materialized, so this must not refetch
    assert(sweep.articles.count() == 3)
    assert(sweep.articles.count() == 3)
    assert(fetches.toMap == Map(1 -> 1, 2 -> 1, 3 -> 1), fetches.toString)
  }

  test("maxPages bounds the sweep") {
    def endless(n: Int): DataFrame =
      Seq(("p", s"u$n", "x")).toDF("portal_name", "url", "body")
    val sweep = Collector.collectAll(endless, Seq("portal_name", "url"), maxPages = 5)
    assert(sweep.pagesFetched == 5)
    assert(sweep.totalNew == 5)
  }
}
