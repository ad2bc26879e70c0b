package graft

import graft.queries.GeoCliQueries

/** q112/q113: the geo CLI's name-index disambiguator and GeoOutput
  * metadata assembly (geo_cli.py:196-350). */
class GeoCliSpec extends SparkSpec {

  private lazy val dis = GeoCliQueries.geoDisambiguate(spark, sfDir).collect()
  private lazy val meta = GeoCliQueries.geoOutputMeta(spark, sfDir).collect()

  test("prefilled candidates pass through untouched") {
    val pre = dis.filter(_.getAs[String]("resolved_by") == "prefilled")
    assert(pre.nonEmpty)
    assert(pre.forall { r =>
      r.getAs[Long]("match_id") % 7 == 0 &&
        r.getAs[String]("resolved_id").startsWith("9")
    })
  }

  test("every disambiguation branch fires") {
    val byBranch = dis.groupBy(_.getAs[String]("resolved_by")).view.mapValues(_.length)
    for (b <- Seq("prefilled", "unique", "uf_filtered", "unresolved"))
      assert(byBranch.getOrElse(b, 0) > 0, s"branch $b never fired")
  }

  test("unique resolutions point at the unique-name entries") {
    // surfaces 'city 1007'..'city 1147' target ck = 7,17,...,147; the
    // resolved id is '7' + zero-padded ck (ck=87 has a blank name and
    // ck%31==0/%41==0 ids are falsy, so those stay unresolved). Alt
    // keys whose partner entry lost its name (ck%29==0) also resolve
    // as unique — for those only the id shape is asserted.
    val uniq = dis.filter(_.getAs[String]("resolved_by") == "unique")
    val cityUniq = uniq.filter(_.getAs[String]("surface").matches("city 1\\d{3}"))
    assert(cityUniq.nonEmpty)
    assert(cityUniq.forall { r =>
      val ck = r.getAs[String]("surface").drop(5).trim.toInt - 1000
      r.getAs[String]("resolved_id") == "7" + f"$ck%06d"
    })
    assert(uniq.forall(_.getAs[String]("resolved_id").startsWith("7")))
  }

  test("uf_filtered only fires on multi-candidate keys with a context UF") {
    val uf = dis.filter(_.getAs[String]("resolved_by") == "uf_filtered")
    assert(uf.nonEmpty)
    assert(uf.forall(_.getAs[String]("context_uf") != null))
    // resolved id must belong to an entry whose uf matches the context
    // case-insensitively: context came as 'ufN' or 'UFN'
    assert(uf.forall(_.getAs[String]("resolved_id").startsWith("7")))
  }

  test("article_id falls back id -> url -> unknown-article skipping empties") {
    assert(meta.nonEmpty)
    meta.foreach { r =>
      val seq = r.getAs[Long]("article_seq")
      val id = r.getAs[String]("article_id")
      if (seq % 3 == 2) assert(id == s"art-$seq")
      else if (seq % 7 == 0) assert(id == "unknown-article")
      else assert(id == s"https://news.example/a/$seq")
    }
  }

  test("catalog_version coalesces article-catalog > payload > legacy") {
    meta.foreach { r =>
      val seq = r.getAs[Long]("article_seq")
      val v = r.getAs[String]("catalog_version")
      if (seq % 5 == 0) assert(v == s"art-cat-v${seq % 3}")
      else if (seq % 5 < 2) assert(v == s"pl-v${seq % 2}")
      else if (seq % 11 == 0) assert(v == "legacy-v9")
      else assert(v == null)
    }
  }

  test("matches_total is the per-article match count, 0 when absent") {
    assert(meta.forall(_.getAs[Long]("matches_total") >= 0))
    assert(meta.exists(_.getAs[Long]("matches_total") > 0))
    // catalog_entries is the fixed 150-entry dim on every row
    assert(meta.forall(_.getAs[Long]("catalog_entries") == 150L))
  }
}
