package graft

import graft.queries.FallbackUrlQueries

/** q120: `_first_page_fallback_urls` (scraper.py:375-469). Ground
  * truth is a literal transcription of the reference algorithm run
  * over the same synthesized URLs. */
class FallbackUrlSpec extends SparkSpec {

  /** scraper.py:375-469, line for line, over (host, path, query). */
  private def reference(host: String, path: String, query: String): Seq[String] = {
    val original = host + path + (if (query.nonEmpty) "?" + query else "")
    val candidates = scala.collection.mutable.ArrayBuffer.empty[String]
    def unsplit(p: String, q: String): String =
      host + p + (if (q.nonEmpty) "?" + q else "")
    if (query.nonEmpty) {
      val params = query.split("&", -1).toSeq
      val paginationKeys = Set("page", "paged", "pagina", "pag", "p")
      val filtered = params.filterNot(i => paginationKeys.contains(i.split("=", 2)(0)))
      if (filtered != params) {
        val newQuery = filtered.filter(_.nonEmpty).mkString("&")
        candidates += unsplit(path, newQuery)
        if (newQuery.isEmpty) candidates += unsplit(path, "")
      }
    }
    val suffixes = Seq("/1" -> "", "-1" -> "", "_1" -> "")
    val trailingSegments = Seq("/page", "/pagina", "/pag", "/p")
    for ((suffix, replacement) <- suffixes if path.endsWith(suffix)) {
      val trimmed = path.dropRight(suffix.length) + replacement
      candidates += unsplit(if (trimmed.nonEmpty) trimmed else "/", query)
      for (segment <- trailingSegments if trimmed.endsWith(segment)) {
        val altPath = { val t = trimmed.dropRight(segment.length); if (t.nonEmpty) t else "/" }
        candidates += unsplit(altPath, query)
      }
    }
    candidates += host // base_url
    val normalizedOriginal = original.reverse.dropWhile(_ == '/').reverse
    val seen = scala.collection.mutable.Set.empty[String]
    candidates.toSeq.flatMap { c =>
      val normalized = c.reverse.dropWhile(_ == '/').reverse
      if (normalized.isEmpty || normalized == normalizedOriginal || seen(normalized)) None
      else { seen += normalized; Some(c) }
    }
  }

  private def synth(k: Long): (String, String, String) = {
    val host = s"https://p${k % 7}.example"
    val path =
      if (k % 8 == 0) "/1"
      else if (k % 4 == 0) "/list/1"
      else if (k % 4 == 1) "/news/page/1"
      else if (k % 4 == 2) "/arch-1"
      else "/feed"
    val query =
      if (k % 9 == 0) "tag=only"
      else if (k % 3 == 0) "page=2&tag=br"
      else if (k % 3 == 1) s"p=${k % 5}"
      else ""
    (host, path, query)
  }

  test("candidate lists equal the reference algorithm for every url") {
    val out = FallbackUrlQueries.firstPageFallback(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("url_id"))
    val ids = Tables.orders(spark, sfDir).select("o_orderkey").collect()
      .map(_.getLong(0))
    assert(ids.nonEmpty)
    ids.foreach { k =>
      val (host, path, query) = synth(k)
      val expected = reference(host, path, query)
      val got = out.getOrElse(k, Array.empty).sortBy(_.getAs[Long]("pos"))
        .map(_.getAs[String]("candidate")).toSeq
      assert(got == expected, s"url $k ($host$path?$query): $got != $expected")
    }
  }

  test("structural branches: segment strip, empty-path trim, base-url fallback") {
    val rows = FallbackUrlQueries.firstPageFallback(spark, sfDir).collect()
    assert(rows.exists(_.getAs[String]("candidate").endsWith("/news")),
      "trailing-segment strip never fired")
    assert(rows.exists(r => r.getAs[String]("candidate").matches("https://p\\d\\.example/")),
      "empty-path trim never produced the bare slash form")
    assert(rows.exists(r => r.getAs[String]("candidate").matches("https://p\\d\\.example")),
      "base-url fallback never survived the dedup")
  }
}
