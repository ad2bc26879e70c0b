package graft

import org.apache.spark.sql.functions._

import graft.queries.EventQueries

/** q179: the watermark late-arrival audit, replayed sequentially. */
class EventAuditSpec extends SparkSpec {

  test("q179 matches a sequential watermark replay per user") {
    val delay = EventQueries.WatermarkDelayMicros
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect()
      .map { r =>
        val id = r.getLong(1)
        val skew = if (id % 7 == 0) 86400000000L
        else if (id % 23 == 0) 300000000L else 0L
        (r.getLong(0), id, r.getLong(2) - skew)
      }
    // sequential replay: per user in arrival (event_id) order, track
    // the running max event time; an event is late when it is behind
    // the watermark (max seen before it, minus the delay)
    val expected = evs.groupBy(_._1).map { case (u, xs) =>
      var maxSeen = Long.MinValue
      var late = 0L
      var worst = 0L
      xs.sortBy(_._2).foreach { case (_, _, ts) =>
        if (maxSeen != Long.MinValue && ts < maxSeen - delay) {
          late += 1
          worst = math.max(worst, maxSeen - delay - ts)
        }
        maxSeen = math.max(maxSeen, ts)
      }
      u -> (xs.length.toLong, late, worst)
    }
    val rows = EventQueries.watermarkAudit(spark, sfDir).collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val (n, late, worst) = expected(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") === n)
      assert(r.getAs[Long]("n_late") === late)
      assert(r.getAs[Long]("max_lateness_us") === worst)
    }
    // the synthesized disorder makes lateness real and bounded
    val totalLate = rows.map(_.getAs[Long]("n_late")).sum
    assert(totalLate > 0L)
    assert(rows.map(_.getAs[Long]("max_lateness_us")).max <= 86400000000L)
    // the 5-min skew alone can never make an event late: lateness
    // requires a backward jump past the 10-min allowance
    assert(totalLate < rows.map(_.getAs[Long]("n_events")).sum / 4)
  }

  test("q197 sweep rows reconcile with q179 and trade monotonically") {
    import org.apache.spark.sql.functions._
    import graft.queries.EventQueries
    val rows = EventQueries.watermarkSweep(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("delay_us")).toSeq ===
      EventQueries.SweepDelaysUs)
    // totals are corpus-constant across delays
    val n = rows.head.getAs[Long]("n_events")
    rows.foreach(r => assert(r.getAs[Long]("n_events") === n))
    // a longer allowed delay can only ACCEPT more: late mass falls,
    // buffered out-of-order mass rises, and their sum (all out-of-order
    // events) is delay-invariant
    val lates = rows.map(_.getAs[Long]("n_late")).toSeq
    val buffered = rows.map(_.getAs[Long]("n_ooo_buffered")).toSeq
    assert(lates.zip(lates.tail).forall { case (a, b) => b <= a }, lates.toString)
    assert(buffered.zip(buffered.tail).forall { case (a, b) => b >= a })
    val totalOoo = lates.zip(buffered).map { case (l, b) => l + b }.distinct
    assert(totalOoo.size === 1, "late + buffered must be the fixed out-of-order mass")
    // the 10-minute row is exactly q179's audit rolled up to the corpus
    val q179 = EventQueries.watermarkAudit(spark, sfDir).collect()
    val row10 = rows.find(_.getAs[Long]("delay_us") === 600000000L).get
    assert(row10.getAs[Long]("n_late") === q179.map(_.getAs[Long]("n_late")).sum)
    assert(row10.getAs[Long]("max_lateness_us") ===
      q179.map(_.getAs[Long]("max_lateness_us")).max)
    assert(rows.exists(_.getAs[Long]("n_late") > 0), "the sweep must see late data")
  }

  test("q198 percentile buckets match a driver-side HDR transcription") {
    import org.apache.spark.sql.functions._
    import graft.queries.EventQueries
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val gaps = events.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(e => (e._4, e._2))
      sorted.sliding(2).collect { case Array(a, b) =>
        (b._3, (b._4 - a._4) / 1000) // later event's type, gap ms
      }
    }.toSeq
    def bucketOf(ms: Long): Long = java.lang.Long.toBinaryString(ms + 1).length.toLong
    val rows = EventQueries.gapSlo(spark, sfDir).collect()
    val byType = gaps.groupBy(_._1)
    assert(rows.length === byType.size)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val ms = byType(t).map(_._2).sorted
      assert(r.getAs[Long]("n_gaps") === ms.length.toLong)
      assert(r.getAs[Long]("max_gap_ms") === ms.max)
      def pctBucketUb(p: Double): Long = {
        val counts = ms.groupBy(bucketOf).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
        val n = ms.length.toLong
        var cum = 0L
        val b = counts.collectFirst {
          case (bk, c) if { cum += c; cum >= p * n - 1e-9 } => bk
        }.get
        (1L << b) - 1
      }
      assert(r.getAs[Long]("p50_ms_ub") === pctBucketUb(0.5), s"p50 of $t")
      assert(r.getAs[Long]("p95_ms_ub") === pctBucketUb(0.95), s"p95 of $t")
      assert(r.getAs[Long]("p99_ms_ub") === pctBucketUb(0.99), s"p99 of $t")
      // percentile bounds are ordered and below the exact max
      assert(r.getAs[Long]("p50_ms_ub") <= r.getAs[Long]("p95_ms_ub"))
      assert(r.getAs[Long]("p95_ms_ub") <= r.getAs[Long]("p99_ms_ub"))
    }
  }
}
