package graft

import java.nio.file.Files

import graft.sources.PortalCatalog

class PortalCatalogSpec extends SparkSpec {

  private def writeConfig(json: String): String = {
    val dir = Files.createTempDirectory("portals")
    Files.writeString(dir.resolve("portal.json"), json)
    dir.toString
  }

  private val good =
    """{"name": "Portal X", "base_url": "https://example.com",
      | "listing_path_template": "/news/{date}",
      | "headers": {"User-Agent": "bot"},
      | "selectors": {"listing_article": {"query": "div.post"},
      |               "article_content": {"query": "div.entry"},
      |               "listing_url": {"query": "a", "attribute": "href"}}}""".stripMargin

  test("loads a portal config with explicit schema and validates clean") {
    val df = PortalCatalog.validate(PortalCatalog.load(spark, writeConfig(good)))
    val row = df.collect().head
    assert(row.getAs[Boolean]("is_valid"))
    assert(row.getAs[String]("date_format") == "%Y-%m-%d") // default applied
  }

  test("flags registration violations like the reference service") {
    val bad =
      """{"name": " ", "base_url": "ftp://x", "listing_path_template": "/news/",
        | "selectors": {"listing_article": {"query": "div.post"}}}""".stripMargin
    val row = PortalCatalog.validate(PortalCatalog.load(spark, writeConfig(bad))).collect().head
    val violations = row.getSeq[String](row.fieldIndex("violations"))
    assert(!row.getAs[Boolean]("is_valid"))
    assert(violations.toSet == Set(
      "missing name", "base_url must be http(s)",
      "listing_path_template needs {date} or {page}",
      "selectors.article_content required"))
  }

  test("listing_url_for fills the template and normalizes slashes") {
    val df = PortalCatalog.listingUrlFor(
      PortalCatalog.load(spark, writeConfig(good)), "2024-05-01")
    assert(df.collect().head.getAs[String]("listing_url") ==
      "https://example.com/news/2024-05-01")
  }

  test("repairSelectorQuery fixes the reference's malformed-selector shapes") {
    import org.apache.spark.sql.functions.col
    // the four cases of test_scraper_selector_normalization.py, plus
    // a double-quote variant and a no-op plain selector
    val cases = Seq(
      "meta[property='article:published_time']" -> "meta[property='article:published_time']",
      "meta[property='article:published_time'" -> "meta[property='article:published_time']",
      "meta[property='article:published_time" -> "meta[property='article:published_time']",
      "meta[property='article:published_time]" -> "meta[property='article:published_time']",
      "meta[name=\"og:title" -> "meta[name=\"og:title\"]",
      "div.content > p" -> "div.content > p")
    val df = spark.createDataFrame(cases.map { case (raw, _) => Tuple1(raw) }).toDF("q")
    val out = df.select(PortalCatalog.repairSelectorQuery(col("q"))).collect().map(_.getString(0))
    cases.zip(out).foreach { case ((raw, expected), got) =>
      assert(got == expected, s"repair of '$raw'")
    }
  }
}
