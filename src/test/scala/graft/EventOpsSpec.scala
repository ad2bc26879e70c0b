package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.queries.EventOpsQueries

/** q202/q208/q210/q211/q212: the closed-form sequential recurrences and
  * the survival/transition estimators, each pinned against a literal
  * driver-side transcription of the sequential definition. */
class EventOpsSpec extends SparkSpec {

  private lazy val events: Seq[(Long, String, String, Long, Long)] =
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("props"),
        unix_micros(col("ts")), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))

  test("EventOps.reflect equals the sequential max(0, prev + d) recurrence") {
    val data = Seq(
      ("a", 1L, 5L), ("a", 2L, -10L), ("a", 3L, 3L), ("a", 4L, -1L), ("a", 5L, 7L),
      ("b", 1L, -4L), ("b", 2L, 9L), ("b", 3L, -2L))
    val df = spark.createDataFrame(data).toDF("k", "i", "d")
    val got = EventOps.reflect(df, "d", "s", "k", Seq("i"))
      .select(col("k"), col("i"), col("s")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((k, group) <- data.groupBy(_._1)) {
      var s = 0L
      for ((_, i, d) <- group.sortBy(_._2)) {
        s = math.max(0L, s + d)
        assert(got((k, i)) === s, s"key $k step $i")
      }
    }
  }

  test("q210 leaky-bucket levels match a sequential bucket simulation") {
    val C = EventOpsQueries.BucketCostMicro
    val cap = EventOpsQueries.BucketCapMicro
    val sim = events.groupBy(_._1).map { case (u, es) =>
      val sorted = es.sortBy(e => (e._4, e._5))
      var lvl = 0L; var prev = 0L
      var maxLvl = 0L; var over = 0L
      sorted.zipWithIndex.foreach { case ((_, _, _, ts, _), i) =>
        if (i > 0) lvl = math.max(0L, lvl - (ts - prev))
        lvl += C; prev = ts
        maxLvl = math.max(maxLvl, lvl)
        if (lvl > cap) over += 1
      }
      u -> ((sorted.size.toLong, maxLvl, over, lvl))
    }
    val got = EventOpsQueries.leakyBucket(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet === sim.keySet)
    sim.foreach { case (u, exp) => assert(got(u) === exp, s"user $u") }
  }

  test("q208 CUSUM columns match a sequential Page recursion per type") {
    val rows = EventOpsQueries.cusumChangepoint(spark, sfDir).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      var sp = 0L; var sn = 0L
      rs.sortBy(_.getLong(1)).foreach { r =>
        val dev = r.getAs[Long]("dev_milli")
        sp = math.max(0L, sp + dev); sn = math.max(0L, sn - dev)
        assert(r.getAs[Long]("cusum_pos_milli") === sp)
        assert(r.getAs[Long]("cusum_neg_milli") === sn)
        assert(r.getAs[Boolean]("alarm_pos") ===
          (sp > EventOpsQueries.CusumMadMult * r.getAs[Long]("mad_milli")))
      }
    }
    // the dim table covers every (type, day) with at least one event
    val expectKeys = events.map(e => (e._2, e._4 / 86400000000L)).distinct.size
    assert(rows.length === expectKeys)
  }

  test("q202 chains match a sequential walk of each content key") {
    val gap = EventOpsQueries.ChainGapMicros
    val exp = events.groupBy(e => (e._1, e._2, e._3)).flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._4, e._5))
      val chains = sorted.foldLeft(Vector.empty[Vector[(Long, Long)]]) {
        case (acc, (_, _, _, ts, id)) =>
          if (acc.nonEmpty && ts - acc.last.last._1 <= gap)
            acc.init :+ (acc.last :+ ((ts, id)))
          else acc :+ Vector((ts, id))
      }
      chains.map(c => c.head._2 -> ((c.size.toLong, (c.last._1 - c.head._1) / 1000000L)))
    }
    val got = EventOpsQueries.temporalDedup(spark, sfDir).collect()
      .map(r => r.getAs[Long]("survivor_event_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("span_s")))).toMap
    assert(got.keySet === exp.keySet)
    exp.foreach { case (id, e) => assert(got(id) === e, s"survivor $id") }
  }

  test("q211 stationary distribution matches driver power iteration and rows are stochastic") {
    val rows = EventOpsQueries.markovTransitions(spark, sfDir).collect()
    // independent pair extraction
    val pairs = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val t = es.sortBy(e => (e._4, e._5)).map(_._2)
      t.zip(t.drop(1))
    }
    val n = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromTot = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      val (f, t) = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("n") === n((f, t)))
      assert(r.getAs[Long]("p_e6") === n((f, t)) * 1000000L / fromTot(f))
    }
    // per-from p_e6 sums to 1e6 minus truncation dust
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val s = rs.map(_.getAs[Long]("p_e6")).sum
      assert(s <= 1000000L && s > 1000000L - rs.length)
    }
    // stationary: driver-side power iteration over the same matrix
    val states = fromTot.keys.toSeq.sorted
    val p = n.map { case ((f, t), c) => (f, t) -> c * 1000000L / fromTot(f) }
    var pi = states.map(_ -> 1000000L / states.size).toMap
    for (_ <- 1 to EventOpsQueries.MarkovRounds)
      pi = states.map(t =>
        t -> states.map(f => pi(f) * p.getOrElse((f, t), 0L) / 1000000L).sum).toMap
    rows.foreach(r => assert(r.getAs[Long]("pi_from_e6") === pi(r.getString(0))))
  }

  test("q212 Kaplan-Meier matches the product-limit fold and is monotone") {
    val rows = EventOpsQueries.kaplanMeier(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // transcription: subject = (user, type)
    val subj = events.groupBy(e => (e._1, e._2)).map { case (_, es) =>
      (es.map(_._4).min, es.map(_._4).max)
    }.toSeq
    val maxLast = subj.map(_._2).max
    val lab = subj.map { case (f, l) =>
      ((l - f) / 86400000000L, l > maxLast - EventOpsQueries.CensorWindowMicros)
    }
    val total = lab.size.toLong
    val byDay = lab.groupBy(_._1).view
      .mapValues(g => (g.count(!_._2).toLong, g.size.toLong)).toMap
    var s = 1000000L
    var risk = total
    var prev = Long.MaxValue
    val expect = byDay.keys.toSeq.sorted.flatMap { d =>
      val (deaths, all) = byDay(d)
      val out = if (deaths > 0) {
        s = s * (risk - deaths) / risk
        Some((d, risk, deaths, s))
      } else None
      risk -= all
      out
    }
    assert(rows.length === expect.length)
    rows.zip(expect).foreach { case (r, (d, nr, nd, se)) =>
      assert(r.getAs[Long]("t_day") === d)
      assert(r.getAs[Long]("n_risk") === nr)
      assert(r.getAs[Long]("n_deaths") === nd)
      assert(r.getAs[Long]("surv_e6") === se)
      assert(se <= prev); prev = se
    }
  }

  test("q218 dwell times match a sequential per-user gap walk") {
    val exp = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._4, e._5))
      sorted.zip(sorted.drop(1)).map { case (cur, nxt) => (cur._2, nxt._4 - cur._4) }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = graft.queries.EventOpsQueries.dwellTime(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet === exp.keySet)
    rows.foreach { r =>
      val ds = exp(r.getString(0))
      assert(r.getAs[Long]("n") === ds.size.toLong)
      assert(r.getAs[Long]("mean_dwell_us") === ds.sum / ds.size)
      assert(r.getAs[Long]("max_dwell_us") === ds.max)
      assert(r.getAs[Long]("n_under_min") === ds.count(_ < 60000000L).toLong)
    }
  }
}
