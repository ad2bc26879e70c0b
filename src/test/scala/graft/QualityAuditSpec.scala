package graft

import org.apache.spark.sql.functions._

import graft.queries.QualityAuditQueries

/** q226/q227/q228/q229: trend estimators + QA audits, each against a
  * driver recomputation. */
class QualityAuditSpec extends SparkSpec {

  private lazy val series: Map[String, Seq[Long]] = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    daily.keys.map(_._1).toSeq.distinct.map { t =>
      val days = daily.keys.collect { case (`t`, d) => d }
      t -> (days.min to days.max).map(d => daily.getOrElse((t, d), 0L))
    }.toMap
  }

  test("q226 OLS matches the closed-form normal equations per type") {
    val rows = QualityAuditQueries.linregress(spark, sfDir).collect()
    assert(rows.length === series.size)
    rows.foreach { r =>
      val ys = series(r.getString(0))
      val n = ys.size.toLong
      val xs = ys.indices.map(_.toLong)
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(x => x * x).sum
      val syy = ys.map(y => y * y).sum
      val bNum = n * sxy - sx * sy
      val bDen = n * sxx - sx * sx
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("slope_e6") ===
        math.round(1000000.0 * bNum.toDouble / bDen.toDouble))
      assert(r.getAs[Long]("intercept_e6") === math.round(1000000.0 *
        (sy.toDouble * bDen.toDouble - bNum.toDouble * sx.toDouble) /
        (n.toDouble * bDen.toDouble)))
      assert(r.getAs[Long]("r2_e6") === math.round(1000000.0 *
        bNum.toDouble * bNum.toDouble /
        (bDen.toDouble * (n * syy - sy * sy).toDouble)))
      assert(r.getAs[Long]("r2_e6") >= 0 && r.getAs[Long]("r2_e6") <= 1000000L)
    }
  }

  test("q227 Theil-Sen picks the lower-median pairwise slope") {
    val rows = QualityAuditQueries.theilSen(spark, sfDir).collect()
    rows.foreach { r =>
      val ys = series(r.getString(0))
      val slopes = for {
        i <- ys.indices; j <- (i + 1) until ys.size
      } yield ((ys(j) - ys(i)).toDouble / (j - i).toDouble, i.toLong, j.toLong)
      val sorted = slopes.sortBy(identity)
      assert(r.getAs[Long]("n_pairs") === slopes.size.toLong)
      val med = sorted((slopes.size + 1) / 2 - 1)
      assert(r.getAs[Long]("slope_e6") === math.round(1000000.0 * med._1))
      assert((r.getAs[Long]("med_xi"), r.getAs[Long]("med_xj")) === ((med._2, med._3)))
    }
  }

  test("q228 l-diversity classes reconcile with q-id groups and majority shares") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars"), col("lang")).collect()
      .map(r => (r.getString(0),
        java.lang.Long.toBinaryString(math.max(r.getLong(1), 1L)).length.toLong,
        r.getString(2)))
    val byClass = docs.groupBy(d => (d._1, d._2))
    val rows = QualityAuditQueries.lDiversity(spark, sfDir).collect()
    assert(rows.length === byClass.size)
    rows.foreach { r =>
      val cls = byClass((r.getString(0), r.getAs[Long]("size_bin")))
      val byLang = cls.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      assert(r.getAs[Long]("k") === cls.size.toLong)
      assert(r.getAs[Long]("l") === byLang.size.toLong)
      assert(r.getAs[Long]("majority_n") === byLang.values.max)
      assert(r.getAs[Long]("majority_share_e6") ===
        byLang.values.max * 1000000L / cls.size)
    }
  }

  test("q248 t-closeness matches an exact driver recomputation per class") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars"), col("lang")).collect()
      .map(r => (r.getString(0),
        java.lang.Long.toBinaryString(math.max(r.getLong(1), 1L)).length.toLong,
        r.getString(2)))
    val n = docs.length.toLong
    val glob = docs.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val byClass = docs.groupBy(d => (d._1, d._2))
    val rows = QualityAuditQueries.tCloseness(spark, sfDir).collect()
    assert(rows.length === byClass.size)
    val expected = byClass.view.mapValues { cls =>
      val k = cls.size.toLong
      val byLang = cls.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val numer = glob.map { case (v, gv) =>
        math.abs(byLang.getOrElse(v, 0L) * n - gv * k)
      }.sum
      (k, numer * 1000000L / (2L * k * n))
    }.toMap
    rows.foreach { r =>
      val (k, t) = expected((r.getString(0), r.getAs[Long]("size_bin")))
      assert(r.getAs[Long]("k") === k)
      assert(r.getAs[Long]("t_e6") === t)
    }
    // the per-source worst case is the max over that source's classes
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val mx = rs.map(_.getAs[Long]("t_e6")).max
      rs.foreach(r => assert(r.getAs[Long]("source_max_t_e6") === mx, src))
    }
    // a uniformly-mixed corpus would score 0; real sources diverge
    assert(rows.map(_.getAs[Long]("t_e6")).max > 0L)
  }

  test("q229 finds zero orphans on healthy data and real childless parents") {
    val rows = QualityAuditQueries.refIntegrity(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size === 5)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_orphans") === 0L, r.getString(0))
      assert(r.getAs[Long]("orphan_rate_e6") === 0L)
    }
    // independent recomputation of one edge each way
    val custs = Tables.customer(spark, sfDir).select(col("c_custkey")).collect()
      .map(_.getLong(0)).toSet
    val orderCust = Tables.orders(spark, sfDir).select(col("o_custkey")).collect()
      .map(_.getLong(0))
    val e = rows("orders->customer")
    assert(e.getAs[Long]("n_child") === orderCust.length.toLong)
    assert(e.getAs[Long]("n_parent") === custs.size.toLong)
    assert(e.getAs[Long]("n_childless_parents") ===
      custs.diff(orderCust.toSet).size.toLong)
  }
}
