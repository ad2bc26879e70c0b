package graft

import graft.queries.ScrapeQueries

/** q93: the urljoin resolution of `_extract_url` (scraper.py:471-473).
  * Expected values below are Python `urllib.parse.urljoin` ground
  * truth for each synthesized href shape. */
class UrlResolveSpec extends SparkSpec {

  test("resolved URLs match python urljoin for every href shape") {
    val rows = ScrapeQueries.urlResolve(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val base = r.getAs[String]("base_url")
      val auth = base.stripPrefix("https://").takeWhile(_ != '/')
      val expected = (id % 6) match {
        case 0 => s"http://mirror.example.org/m/$id.html"
        case 1 => s"https://cdn.example.org/c/$id"
        case 2 => s"https://$auth/arts/item$id.html#top"
        case 3 => s"https://$auth/news/2024/sub/item$id.html"
        case 4 => s"https://$auth/news/arch/item$id.html"
        case _ => base
      }
      assert(r.getAs[String]("resolved") == expected, s"doc $id")
    }
  }

  test("canonical form strips fragments and lowercases; domain/path split") {
    val rows = ScrapeQueries.urlResolve(spark, sfDir).collect()
    rows.foreach { r =>
      val canonical = r.getAs[String]("canonical")
      assert(!canonical.contains("#"))
      assert(canonical == canonical.toLowerCase)
      assert(canonical == "https://" + r.getAs[String]("domain") + r.getAs[String]("path")
        || canonical == "http://" + r.getAs[String]("domain") + r.getAs[String]("path"))
    }
  }
}
