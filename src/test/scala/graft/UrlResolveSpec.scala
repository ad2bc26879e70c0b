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

  test("q174 blocklist verdicts match label-boundary suffix semantics") {
    // in-memory reference: a rule matches iff it equals the host or
    // the host ends with "." + rule — never a mid-label substring
    def matches(host: String, rule: String): Boolean =
      host == rule || host.endsWith("." + rule)
    val rows = ScrapeQueries.urlBlocklist(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val host = r.getAs[String]("host")
      val expect = ScrapeQueries.BlockRules.filter(matches(host, _)).sorted
      assert(r.getAs[Long]("n_matched") === expect.length.toLong, host)
      assert(r.getAs[String]("matched_rules") === expect.mkString("|"), host)
      assert(r.getAs[Boolean]("blocked") === expect.nonEmpty, host)
    }
    // every rule shape fires somewhere; clean hosts exist too
    val matched = rows.flatMap(_.getAs[String]("matched_rules").split('|')).filter(_.nonEmpty).toSet
    assert(matched === ScrapeQueries.BlockRules.toSet)
    assert(rows.exists(!_.getAs[Boolean]("blocked")))
    // the boundary rule: "example.net" must never block a *.example.com
    // host, and no host matches on a partial label
    rows.filter(_.getAs[String]("host").endsWith(".example.com")).foreach { r =>
      assert(!r.getAs[String]("matched_rules").contains("example.net"))
    }
  }

  test("q174 plan: blocklist joins broadcast; no corpus shuffle before the doc agg") {
    val p = ScrapeQueries.urlBlocklist(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
