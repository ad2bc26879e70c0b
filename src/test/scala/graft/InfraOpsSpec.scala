package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.queries.InfraOpsQueries

/** q213/q214/q216/q217: spatial grid join, A/B analysis, LPT balance
  * and rendezvous sharding — driver transcriptions + the algorithms'
  * defining properties (ring-nearest correctness, minimal movement). */
class InfraOpsSpec extends SparkSpec {

  private def lat(k: Long, m: Long) = (k * m % 170 - 85).toDouble + 0.5
  private def lon(k: Long, m: Long) = (k * m % 360 - 180).toDouble + 0.5

  private def havM(la1: Double, lo1: Double, la2: Double, lo2: Double): Long = {
    val p1 = math.toRadians(la1); val p2 = math.toRadians(la2)
    val dp = math.toRadians(la2 - la1); val dl = math.toRadians(lo2 - lo1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    math.round(2.0 * 6371.0 * math.atan2(math.sqrt(a), math.sqrt(1 - a)) * 1000.0)
  }

  test("q213 reports the true nearest station within the cell ring") {
    val custs = Tables.customer(spark, sfDir).select(col("c_custkey"))
      .collect().map(_.getLong(0))
    val stats = Tables.supplier(spark, sfDir).select(col("s_suppkey"))
      .collect().map(_.getLong(0))
    val cd = InfraOpsQueries.CellDeg
    def cellOf(k: Long, mLat: Long, mLon: Long) =
      ((k * mLat % 170 + 5) / cd, (k * mLon % 360) / cd)
    val statCells = stats.map(s => s -> cellOf(s, 19, 23)).toMap
    val rows = InfraOpsQueries.geohashJoin(spark, sfDir).collect()
    assert(rows.length === custs.length)
    rows.foreach { r =>
      val c = r.getAs[Long]("c_custkey")
      val (cy, cx) = cellOf(c, 7, 13)
      assert(r.getAs[Long]("cy") === cy && r.getAs[Long]("cx") === cx)
      val ring = stats.filter { s =>
        val (sy, sx) = statCells(s)
        math.abs(sy - cy) <= 1 &&
          (math.abs(sx - cx) <= 1 ||
            math.abs(sx - cx) === InfraOpsQueries.LonCells - 1)
      }
      assert(r.getAs[Long]("n_cand") === ring.length.toLong)
      if (ring.isEmpty) assert(r.isNullAt(r.fieldIndex("nearest_suppkey")))
      else {
        val best = ring.map(s =>
          (havM(lat(c, 7), lon(c, 13), lat(s, 19), lon(s, 23)), s)).min
        assert(r.getAs[Long]("nearest_suppkey") === best._2, s"cust $c")
        assert(r.getAs[Long]("dist_m") === best._1, s"cust $c")
      }
    }
  }

  test("q214 reproduces arm assignment, funnel conversion and the chi-square tree") {
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byUser = events.groupBy(_._1).view
      .mapValues(es => if (es.exists(_._2 == "purchase")) 1L else 0L).toMap
    def arm(u: Long) =
      (((Hashing.hashA(5) * u + Hashing.hashB(5)) % 1000000007L % 2) + 2) % 2
    val na = byUser.keys.count(arm(_) == 0).toLong
    val nb = byUser.keys.count(arm(_) == 1).toLong
    val ca = byUser.collect { case (u, c) if arm(u) == 0 => c }.sum
    val cb = byUser.collect { case (u, c) if arm(u) == 1 => c }.sum
    val r = InfraOpsQueries.abTest(spark, sfDir).collect()(0)
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("conv_a"), r.getAs[Long]("conv_b")) === ((na, nb, ca, cb)))
    assert(r.getAs[Long]("rate_a_e6") === ca * 1000000L / na)
    assert(r.getAs[Long]("lift_e6") ===
      cb * 1000000L / nb - ca * 1000000L / na)
    val chi2 = (na + nb).toDouble *
      math.pow(ca.toDouble * (nb - cb).toDouble - cb.toDouble * (na - ca).toDouble, 2) /
      (na.toDouble * nb.toDouble * (ca + cb).toDouble * ((na + nb) - (ca + cb)).toDouble)
    assert(r.getAs[Long]("chi2_e6") === math.round(chi2 * 1000000.0))
  }

  test("q216 LPT fold matches a driver greedy and respects load accounting") {
    val weights = Tables.documents(spark, sfDir)
      .groupBy(col("source")).agg(sum(col("n_chars")).as("w")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val loads = Array.fill(InfraOpsQueries.Workers)(0L)
    val expect = weights.toSeq.sortBy { case (s, w) => (-w, s) }.map { case (s, w) =>
      val j = loads.zipWithIndex.minBy { case (l, i) => (l, i) }._2
      loads(j) += w
      s -> ((w, j + 1L, loads(j)))
    }.toMap
    val rows = InfraOpsQueries.lptBalance(spark, sfDir).collect()
    assert(rows.length === weights.size)
    rows.foreach { r =>
      val s = r.getString(0)
      assert((r.getAs[Long]("weight"), r.getAs[Long]("worker"),
        r.getAs[Long]("load_after")) === expect(s), s)
    }
    val mk = rows.head.getAs[Long]("makespan")
    assert(mk === loads.max)
    assert(rows.head.getAs[Long]("balance_e6") >= 1000000L)
  }

  test("q217 rendezvous reshard moves docs ONLY to the new shards") {
    val rows = InfraOpsQueries.rendezvousShards(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n")).sum === total)
    rows.foreach { r =>
      val (b, a) = (r.getAs[Long]("shard_before"), r.getAs[Long]("shard_after"))
      if (b != a) {
        assert(r.getAs[Boolean]("moved"))
        assert(a >= InfraOpsQueries.ShardsBefore,
          s"moved $b -> $a is not a new shard")
      }
    }
    // transcription of the argmax for a sample of docs
    val docs = Tables.documents(spark, sfDir).select(col("doc_id")).collect()
      .map(_.getLong(0))
    def score(d: Long, k: Int) =
      (Hashing.hashA(k) * d + Hashing.hashB(k)) % 1000000007L
    def shard(d: Long, n: Int) =
      (0 until n).map(k => (score(d, k), k.toLong)).max._2
    val expect = docs.groupBy(d => (shard(d, 8), shard(d, 10))).view
      .mapValues(_.length.toLong).toMap
    val got = rows.map(r => (r.getAs[Long]("shard_before"),
      r.getAs[Long]("shard_after")) -> r.getAs[Long]("n")).toMap
    assert(got === expect)
  }
}
