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

  test("maxPages bounds the sweep") {
    def endless(n: Int): DataFrame =
      Seq(("p", s"u$n", "x")).toDF("portal_name", "url", "body")
    val sweep = Collector.collectAll(endless, Seq("portal_name", "url"), maxPages = 5)
    assert(sweep.pagesFetched == 5)
    assert(sweep.totalNew == 5)
  }
}
