package graft

import graft.queries.CollectJobQueries

/** q116/q117: collection-run day metrics
  * (servico_coleta_noticias.py:96-180) and GeoEnrichmentJob counters
  * (geo_enrichment_job.py:92-199). */
class CollectJobSpec extends SparkSpec {

  private lazy val collectRows =
    CollectJobQueries.collectAccounting(spark, sfDir).collect()
  private lazy val jobRows =
    CollectJobQueries.geoJobMetrics(spark, sfDir).collect()

  test("per-day counters nest: stored <= unique <= found") {
    assert(collectRows.nonEmpty)
    collectRows.foreach { r =>
      val (f, u, st) = (r.getAs[Long]("n_found"), r.getAs[Long]("n_unique"),
        r.getAs[Long]("n_stored"))
      assert(st <= u && u <= f && f > 0)
    }
    // the cross-day dedup actually drops something somewhere
    assert(collectRows.exists(r => r.getAs[Long]("n_unique") < r.getAs[Long]("n_found")))
    // and the repository gate drops something the dedup kept
    assert(collectRows.exists(r => r.getAs[Long]("n_stored") < r.getAs[Long]("n_unique")))
  }

  test("a url counts as unique only on its first day within a portal") {
    // replay the semantics independently on the raw table
    val stream = Tables.orders(spark, sfDir).selectExpr(
      "concat('p', o_custkey % 7) as portal",
      "to_date(o_orderdate) as day",
      "o_orderkey % 150 as uid").collect()
    val firstDay = stream.groupBy(r => (r.getString(0), r.getLong(2)))
      .view.mapValues(_.map(_.getDate(1)).min).toMap
    val expected = stream.count(r =>
      firstDay((r.getString(0), r.getLong(2))) == r.getDate(1))
    assert(collectRows.map(_.getAs[Long]("n_unique")).sum == expected)
  }

  test("job counters satisfy the reference invariants") {
    assert(jobRows.length == 4)
    jobRows.foreach { r =>
      val scanned = r.getAs[Long]("scanned")
      val processed = r.getAs[Long]("processed")
      val enriched = r.getAs[Long]("enriched")
      val skipped = r.getAs[Long]("skipped")
      val errors = r.getAs[Long]("n_errors")
      // scanned = processed + compute errors; processed = enriched + skipped
      assert(processed + (errors - skipped) == scanned)
      assert(enriched + skipped == processed)
      assert(errors >= skipped)
    }
    assert(jobRows.map(_.getAs[Long]("n_errors")).sum > 0)
    assert(jobRows.map(_.getAs[Long]("skipped")).sum > 0)
  }
}
