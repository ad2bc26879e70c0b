package graft

import org.apache.spark.sql.functions._

import graft.queries.GraphTsQueries

/** q223/q224/q225: ACF, BFS reachability and Hamilton apportionment —
  * driver transcriptions + each algorithm's defining invariants. */
class GraphTsSpec extends SparkSpec {

  test("q223 ACF matches a driver Pearson over the dense zero-filled series") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rows = GraphTsQueries.acf(spark, sfDir).collect()
    val types = daily.keys.map(_._1).toSeq.distinct
    assert(rows.length === types.size * GraphTsQueries.AcfMaxLag)
    rows.foreach { r =>
      val (t, l) = (r.getString(0), r.getAs[Long]("lag"))
      val days = daily.keys.collect { case (`t`, d) => d }
      val series = (days.min to days.max).map(d => daily.getOrElse((t, d), 0L))
      val pairs = series.drop(l.toInt).zip(series.dropRight(l.toInt))
      val n = pairs.size.toLong
      assert(r.getAs[Long]("n") === n)
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val rr = 1000000.0 * (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (math.sqrt(n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
          math.sqrt(n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
      assert(r.getAs[Long]("r_e6") === math.round(rr), s"$t lag $l")
      assert(math.abs(r.getAs[Long]("r_e6")) <= 1000000L)
    }
  }

  test("q224 BFS distances equal a driver BFS over the independently built k-NN closure") {
    // rebuild the graph from the scored LSH pairs + a driver top-k,
    // independent of the query's join/anti-join machinery
    val pairs = graft.operators.Similarity
      .cosinePairsLsh(Tables.embeddings(spark, sfDir), -2.0)
      .select(col("vec_id_a"), col("vec_id_b"), col("cos_e6")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val directed = (pairs.map(p => (p._1, p._2, p._3)) ++
      pairs.map(p => (p._2, p._1, p._3)))
      .groupBy(_._1).toSeq.flatMap { case (s, es) =>
        es.sortBy(e => (-e._3, e._2)).take(4).map(e => (s, e._2))
      }
    val undSet: Set[(Long, Long)] =
      (directed ++ directed.map(e => (e._2, e._1))).toSet
    val und: Map[Long, Seq[Long]] =
      undSet.toSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = Tables.embeddings(spark, sfDir).select(col("vec_id")).collect()
      .map(_.getLong(0)).filter(_ % 17 == 0).toSet
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (d <- 1 to GraphTsQueries.BfsMaxHops) {
      val next = frontier.flatMap(v => und.getOrElse(v, Seq.empty))
        .diff(dist.keySet)
      dist ++= next.map(_ -> d.toLong)
      frontier = next
    }
    val rows = GraphTsQueries.knnBfs(spark, sfDir).collect()
    rows.foreach { r =>
      val v = r.getAs[Long]("vec_id")
      assert(r.getAs[Boolean]("seed") === seeds.contains(v))
      dist.get(v) match {
        case Some(d) =>
          assert(r.getAs[Boolean]("reached"))
          assert(r.getAs[Long]("dist") === d, s"vec $v")
        case None => assert(!r.getAs[Boolean]("reached"))
      }
    }
    assert(rows.exists(r => !r.getAs[Boolean]("seed") && r.getAs[Boolean]("reached")))
  }

  test("q225 apportionment sums exactly to the budget, within 1 of true quota") {
    val rows = GraphTsQueries.apportion(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("weight")).sum
    val b = GraphTsQueries.TokenBudget
    assert(rows.map(_.getAs[Long]("alloc")).sum === b)
    rows.foreach { r =>
      val w = r.getAs[Long]("weight")
      val floorQ = w * b / total
      assert(r.getAs[Long]("floor_q") === floorQ)
      val alloc = r.getAs[Long]("alloc")
      assert(alloc === floorQ || alloc === floorQ + 1)
    }
    // the extras go to the largest remainders
    val sorted = rows.sortBy(r => (-r.getAs[Long]("rem"), r.getString(0)))
    val leftover = b - rows.map(_.getAs[Long]("floor_q")).sum
    sorted.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("extra") === (if (i < leftover) 1L else 0L))
    }
  }
}
