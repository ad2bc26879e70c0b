package graft

import graft.queries.ExtractJobQueries

/** q119: city-extraction job per-batch counters
  * (city_extraction_job.py:94-232, batch_summary at :199-215). */
class ExtractJobSpec extends SparkSpec {

  private lazy val rows = ExtractJobQueries.extractJobBatches(spark, sfDir).collect()

  test("batch counters satisfy the loop's invariants") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scanned = r.getAs[Long]("scanned")
      val processed = r.getAs[Long]("processed")
      val updated = r.getAs[Long]("updated")
      val skipped = r.getAs[Long]("skipped")
      val errs = r.getAs[Long]("n_errors")
      // only_missing skips happen before processed counts
      assert(processed <= scanned)
      // every processed doc updates, errors, or skips on unchanged hash
      assert(updated + errs + (skipped - (scanned - processed)) == processed)
      assert(scanned <= ExtractJobQueries.BatchSize)
    }
    assert(rows.map(_.getAs[Long]("ambiguous")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_errors")).sum > 0)
  }

  test("pagination fills every batch but the portal's last") {
    rows.groupBy(_.getAs[String]("portal")).values.foreach { bs =>
      val sorted = bs.sortBy(_.getAs[Long]("batch_index"))
      assert(sorted.map(_.getAs[Long]("batch_index")).toSeq ==
        (0L until sorted.length.toLong))
      sorted.dropRight(1).foreach(r =>
        assert(r.getAs[Long]("scanned") == ExtractJobQueries.BatchSize))
    }
  }
}
