package graft

import org.apache.spark.sql.functions._

import graft.queries.TemporalDpQueries

/** q236/q237: burst Viterbi and day-of-week profiles — driver
  * recomputations of the DP recursion and the seasonality indexes. */
class TemporalDpSpec extends SparkSpec {

  private lazy val daily: Map[(String, Long), Long] =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("q236 cumulative costs match the sequential two-state recursion") {
    val rows = TemporalDpQueries.burstViterbi(spark, sfDir).collect()
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val days = daily.keys.collect { case (`t`, d) => d }.toSeq.sorted
      val cnts = days.map(d => daily((t, d)))
      val mean = cnts.map(_ * 1000).sum / cnts.size
      var cn = 0L; var cb = 0L
      val sorted = rs.sortBy(_.getAs[Long]("day"))
      sorted.zip(cnts).foreach { case (r, c) =>
        val nn = math.min(cn, cb + mean) + math.abs(c * 1000 - mean)
        val nb = math.min(cb, cn + mean) + math.abs(c * 1000 - 2 * mean)
        cn = nn; cb = nb
        assert(r.getAs[Long]("cnt") === c)
        assert(r.getAs[Long]("cost_n") === cn, s"$t day ${r.getAs[Long]("day")}")
        assert(r.getAs[Long]("cost_b") === cb)
        assert(r.getAs[Boolean]("burst") === (cb < cn))
      }
    }
    // the corpus rates are steady, so burst days should be a minority
    assert(rows.count(_.getAs[Boolean]("burst")) < rows.length / 2)
  }

  test("q237 indexes reconcile with the dow means and average near 1e6") {
    val rows = TemporalDpQueries.dowProfile(spark, sfDir).collect()
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val days = daily.keys.collect { case (`t`, d) => d }.toSeq
      val total = days.map(d => daily((t, d))).sum
      val overall = total * 1000 / days.size
      rs.foreach { r =>
        val dow = r.getAs[Long]("dow")
        val dws = days.filter(d => ((d + 4) % 7 + 7) % 7 == dow)
        val dtotal = dws.map(d => daily((t, d))).sum
        assert(r.getAs[Long]("n_days") === dws.size.toLong)
        assert(r.getAs[Long]("total") === dtotal)
        assert(r.getAs[Long]("dow_mean_milli") === dtotal * 1000 / dws.size)
        assert(r.getAs[Long]("index_e6") ===
          (dtotal * 1000 / dws.size) * 1000000 / overall)
      }
      // parity by construction: the n_days-weighted mean index ~ 1e6
      // (individual buckets swing with Poisson noise at small SFs)
      val wsum = rs.map(r => r.getAs[Long]("n_days") * r.getAs[Long]("index_e6")).sum
      val wtot = rs.map(_.getAs[Long]("n_days")).sum
      assert(math.abs(wsum / wtot - 1000000L) < 150000L, s"$t weighted mean")
    }
  }
}
