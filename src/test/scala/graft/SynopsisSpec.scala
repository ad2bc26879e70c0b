package graft

import org.apache.spark.sql.functions._

import graft.queries.SynopsisQueries

/** q240/q241: v-optimal histogram and interval join — SSE recomputed
  * from raw values, boundary-perturbation local optimality, and a
  * sequential window-overlap transcription. */
class SynopsisSpec extends SparkSpec {

  test("q240 buckets partition the range; SSE is exact; no boundary move improves") {
    val vals = Tables.documents(spark, sfDir)
      .select(expr(s"n_chars div ${SynopsisQueries.VoptRes}")).collect()
      .map(_.getLong(0))
    val cells = vals.groupBy(identity).toSeq
      .map { case (v, g) => (v, g.size.toLong) }.sortBy(_._1)
    val rows = SynopsisQueries.voptHistogram(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("bucket"))
    // partition: contiguous, ordered, covering all cells
    assert(rows.head.getAs[Long]("v_lo") === cells.head._1)
    assert(rows.last.getAs[Long]("v_hi") === cells.last._1)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val nextIdx = cells.indexWhere(_._1 == a.getAs[Long]("v_hi")) + 1
        assert(b.getAs[Long]("v_lo") === cells(nextIdx)._1)
      case _ =>
    }
    // per-bucket stats recomputed from raw cells
    def stats(lo: Long, hi: Long): (Long, Long, Long) = {
      val in = cells.filter(c => c._1 >= lo && c._1 <= hi)
      val n = in.map(_._2).sum
      val s1 = in.map(c => c._1 * c._2).sum
      val s2 = in.map(c => c._1 * c._1 * c._2).sum
      (n, s1, s2)
    }
    def sse(lo: Long, hi: Long): Long = {
      val (n, s1, s2) = stats(lo, hi)
      s2 * 1000L - s1 * s1 * 1000L / n
    }
    rows.foreach { r =>
      val (n, s1, _) = stats(r.getAs[Long]("v_lo"), r.getAs[Long]("v_hi"))
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("mean_milli") === s1 * 1000L / n)
      assert(r.getAs[Long]("sse_e3") === sse(r.getAs[Long]("v_lo"), r.getAs[Long]("v_hi")))
    }
    val total = rows.map(_.getAs[Long]("sse_e3")).sum
    assert(rows.head.getAs[Long]("total_sse_e3") === total)
    // local optimality: shifting any boundary one cell either way never helps
    val cuts = rows.init.map(r => cells.indexWhere(_._1 == r.getAs[Long]("v_hi")))
    def totalFor(cs: Seq[Int]): Long = {
      val bounds = (-1 +: cs) :+ (cells.length - 1)
      if (bounds.sliding(2).exists { case Seq(a, b) => b <= a }) Long.MaxValue
      else bounds.sliding(2).map { case Seq(a, b) =>
        sse(cells(a + 1)._1, cells(b)._1)
      }.sum
    }
    assert(totalFor(cuts) === total)
    for (ci <- cuts.indices; d <- Seq(-1, 1)) {
      val moved = cuts.updated(ci, cuts(ci) + d)
      assert(totalFor(moved) >= total, s"boundary $ci move $d improved")
    }
  }

  test("q241 window metrics match a direct overlap transcription") {
    val events = Tables.events(spark, sfDir)
      .select(unix_micros(col("ts")), col("user_id"),
        round(col("value") * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val t0 = events.map(_._1).min
    val rows = SynopsisQueries.intervalJoin(spark, sfDir).collect()
    val expect = (0L until SynopsisQueries.IntervalWindows).flatMap { w =>
      val start = t0 + w * 3L * 86400000000L
      val end = start + (w % 3 + 1) * 6L * 3600 * 1000000
      val in = events.filter(e => e._1 >= start && e._1 < end)
      if (in.isEmpty) None
      else Some(w -> ((start, end, in.size.toLong,
        in.map(_._2).distinct.size.toLong, in.map(_._3).sum)))
    }.toMap
    assert(rows.map(_.getLong(0)).toSet === expect.keySet)
    rows.foreach { r =>
      val (st, en, n, u, c) = expect(r.getLong(0))
      assert(r.getAs[Long]("w_start") === st)
      assert(r.getAs[Long]("w_end") === en)
      assert(r.getAs[Long]("n_events") === n)
      assert(r.getAs[Long]("n_users") === u)
      assert(r.getAs[Long]("cents") === c)
    }
    assert(rows.nonEmpty)
  }
}
