package graft

import org.apache.spark.sql.functions._

import graft.queries.{EventOpsQueries, RetrievalEvalQueries}

/** q230/q231: last-touch attribution and isotonic calibration. The
  * attribution is replayed sequentially; the PAV fit is checked for
  * monotonicity, mass conservation AND L2-optimality against an
  * exhaustive enumeration of monotone contiguous partitions. */
class CalibAttrSpec extends SparkSpec {

  test("q230 matches a sequential last-touch walk per user") {
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"), round(col("value") * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val w = EventOpsQueries.AttribWindowMicros
    val attributed = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._4))
      var lastTouch: Option[(Long, String)] = None
      sorted.flatMap { case (_, tpe, ts, _, cents) =>
        val out = if (tpe == "purchase") {
          val ch = lastTouch match {
            case Some((lts, lt)) if ts - lts <= w => lt
            case _ => "direct"
          }
          val lat = lastTouch match {
            case Some((lts, _)) if ch != "direct" => Some(ts - lts)
            case _ => None
          }
          Some((ch, cents, lat))
        } else None
        if (tpe == "click" || tpe == "view") lastTouch = Some((ts, tpe))
        out
      }
    }
    val expect = attributed.groupBy(_._1).view.mapValues { ps =>
      val latSum = ps.flatMap(_._3).sum
      (ps.size.toLong, ps.map(_._2).sum,
        if (ps.forall(_._3.isEmpty)) None
        else Some(latSum / (ps.size.toLong * 1000000L)))
    }.toMap
    val rows = EventOpsQueries.attribution(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet === expect.keySet)
    val totalP = attributed.size.toLong
    rows.foreach { r =>
      val (n, cents, lat) = expect(r.getString(0))
      assert(r.getAs[Long]("n_purchases") === n)
      assert(r.getAs[Long]("cents") === cents)
      lat match {
        case Some(l) => assert(r.getAs[Long]("mean_latency_s") === l)
        case None => assert(r.isNullAt(r.fieldIndex("mean_latency_s")))
      }
      assert(r.getAs[Long]("share_e6") === n * 1000000L / totalP)
    }
  }

  test("q231 PAV fit is monotone, mass-preserving and L2-optimal") {
    val rows = RetrievalEvalQueries.isotonicFit(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("bin"))
    assert(rows.nonEmpty)
    // monotone non-decreasing calibrated rates
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("iso_rate_e6") <= b.getAs[Long]("iso_rate_e6"))
      case _ =>
    }
    // block pooling preserves mass
    rows.groupBy(_.getAs[Long]("block_id")).foreach { case (_, bs) =>
      val bn = bs.head.getAs[Long]("block_n")
      assert(bs.map(_.getAs[Long]("n")).sum === bn)
      bs.foreach(r => assert(r.getAs[Long]("block_n") === bn))
    }
    // L2-optimality: enumerate every contiguous partition whose block
    // means are non-decreasing; PAV's fitted values must achieve the
    // minimal weighted SSE
    val ns = rows.map(_.getAs[Long]("n"))
    val ps = rows.map(_.getAs[Long]("n_pos"))
    val k = ns.length
    def blocksOf(cuts: Seq[Int]): Seq[(Int, Int)] =
      (0 +: cuts.map(_ + 1)).zip(cuts :+ (k - 1))
    val allCuts = (0 until (1 << math.max(0, k - 1))).map { m =>
      (0 until k - 1).filter(i => (m & (1 << i)) != 0)
    }
    def sse(cuts: Seq[Int]): (Double, Array[Double]) = {
      val fit = Array.ofDim[Double](k)
      var tot = 0.0
      var prev = Double.NegativeInfinity
      var mono = true
      blocksOf(cuts).foreach { case (a, b) =>
        val n = (a to b).map(ns(_)).sum.toDouble
        val p = (a to b).map(ps(_)).sum.toDouble
        val mean = p / n
        if (mean < prev - 1e-12) mono = false
        prev = mean
        (a to b).foreach { i =>
          fit(i) = mean
          val ri = ps(i).toDouble / ns(i)
          tot += ns(i) * (ri - mean) * (ri - mean)
        }
      }
      (if (mono) tot else Double.PositiveInfinity, fit)
    }
    val best = allCuts.map(c => sse(c)).minBy(_._1)
    val gotFit = rows.map(r =>
      r.getAs[Long]("iso_rate_e6").toDouble / 1000000.0)
    gotFit.zip(best._2).foreach { case (g, b) =>
      assert(math.abs(g - b) < 1e-5, s"fitted $g vs optimal $b")
    }
  }
}
