package graft

import org.apache.spark.sql.functions._

import graft.queries.BehaviorQueries

/** q234/q235: RFM segmentation and decayed counters — driver
  * recomputations of the quintile scores and the shift-decay sums. */
class BehaviorSpec extends SparkSpec {

  private lazy val events: Seq[(Long, String, Long, Long)] =
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        round(col("value") * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("q234 RFM scores match value-dim quintiles and compose the segment") {
    val maxLast = events.map(_._3).max
    val users = events.groupBy(_._1).map { case (u, es) =>
      (u, (maxLast - es.map(_._3).max) / 86400000000L,
        es.size.toLong, es.map(_._4).sum)
    }.toSeq
    val n = users.size.toLong
    def scores(vals: Seq[Long], invert: Boolean): Map[Long, Long] = {
      val dist = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ordered = if (invert) dist.keys.toSeq.sorted.reverse else dist.keys.toSeq.sorted
      var cum = 0L
      ordered.map { v =>
        cum += dist(v)
        v -> math.min(5L, (cum - 1) * 5 / n + 1)
      }.toMap
    }
    val rs = scores(users.map(_._2), invert = true)
    val fs = scores(users.map(_._3), invert = false)
    val ms = scores(users.map(_._4), invert = false)
    val rows = BehaviorQueries.rfmSegments(spark, sfDir).collect()
    assert(rows.length === users.size)
    val byU = users.map(u => u._1 -> u).toMap
    rows.foreach { r =>
      val (_, rv, fv, mv) = byU(r.getLong(0))
      assert((r.getAs[Long]("r"), r.getAs[Long]("f"), r.getAs[Long]("m")) === ((rv, fv, mv)))
      assert(r.getAs[Long]("r_score") === rs(rv))
      assert(r.getAs[Long]("f_score") === fs(fv))
      assert(r.getAs[Long]("m_score") === ms(mv))
      assert(r.getAs[String]("segment") === s"${rs(rv)}${fs(fv)}${ms(mv)}")
      assert(r.getAs[Boolean]("champion") ===
        (rs(rv) >= 4 && fs(fv) >= 4 && ms(mv) >= 4))
    }
    // every score value in 1..5; at least one metric spreads across
    // >= 3 quintiles (recency can collapse when everyone is active)
    val spreads = Seq("r_score", "f_score", "m_score").map { c =>
      val vs = rows.map(_.getAs[Long](c)).toSet
      assert(vs.forall(v => v >= 1 && v <= 5))
      vs.size
    }
    assert(spreads.max >= 3, s"score spreads $spreads")
  }

  test("q235 decayed counts equal the shift-weighted sums") {
    val maxTs = events.map(_._3).max
    val rows = BehaviorQueries.decayedCounts(spark, sfDir).collect()
    val byType = events.groupBy(_._2)
    assert(rows.map(_.getString(0)).toSet === byType.keySet)
    rows.foreach { r =>
      val es = byType(r.getString(0))
      val ws = es.map { e =>
        val age = (maxTs - e._3) / 86400000000L
        if (age >= 63) 0L else 1000000L >> age
      }
      assert(r.getAs[Long]("n_events") === es.size.toLong)
      assert(r.getAs[Long]("decayed_e6") === ws.sum)
      assert(r.getAs[Long]("freshness_e6") === ws.sum / es.size)
      assert(r.getAs[Boolean]("active_today") ===
        es.exists(e => (maxTs - e._3) / 86400000000L == 0))
    }
  }
}
