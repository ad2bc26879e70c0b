package graft

import org.apache.spark.sql.functions._

import graft.queries.{CorpusOpsQueries, PatternMiningQueries}

/** q215/q219/q220/q221: sampling and pattern mining — transcriptions
  * of the stride walk, the intersection, the sequence match and the
  * basket lift. */
class PatternMiningSpec extends SparkSpec {

  private def foldTokens(t: String): Seq[String] = {
    val hyphens = "-‐‑‒–—―"
    val noHyphen = t.map(c => if (hyphens.contains(c)) ' ' else c)
      .filterNot(_ == '­')
    val folded = java.text.Normalizer.normalize(noHyphen, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}", "").toLowerCase
    folded.trim.split("\\s+").toSeq.filter(_.nonEmpty)
  }

  test("q215 systematic PPS captures exactly K strides with true cumsums") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = docs.map(_._2).sum
    val k = PatternMiningQueries.PpsK
    val step = total / k
    val off0 = step / 2
    var cum = 0L
    val expect = docs.flatMap { case (id, w) =>
      val iLo = if (cum <= off0) 0L else (cum - off0 + step - 1) / step
      val iHiRaw = if (cum + w <= off0) -1L else (cum + w - off0 - 1) / step
      val iHi = math.min(iHiRaw, k - 1)
      val row = if (iHi - iLo + 1 > 0) Some(id -> ((w, cum, iLo, iHi - iLo + 1))) else None
      cum += w
      row
    }.toMap
    val rows = PatternMiningQueries.ppsSample(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_hits")).sum === k)
    assert(rows.map(_.getLong(0)).toSet === expect.keySet)
    rows.foreach { r =>
      val e = expect(r.getLong(0))
      assert((r.getAs[Long]("w"), r.getAs[Long]("cum_before"),
        r.getAs[Long]("first_target"), r.getAs[Long]("n_hits")) === e)
    }
  }

  test("q219 returns exactly the docs containing EVERY query term") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> foldTokens(r.getString(1)))
    val rows = PatternMiningQueries.booleanAnd(spark, sfDir).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (for {
      (qid, terms) <- CorpusOpsQueries.Bm25Queries.groupBy(_._1.toLong)
        .view.mapValues(_.map(_._2).toSet).toSeq
      (d, toks) <- docs
      if terms.subsetOf(toks.toSet)
    } yield (qid, d)).toSet
    assert(got === expect)
    rows.foreach { r =>
      val toks = docs.toMap.apply(r.getLong(1))
      val terms = CorpusOpsQueries.Bm25Queries
        .filter(_._1.toLong == r.getLong(0)).map(_._2)
      val tfs = terms.map(t => toks.count(_ == t).toLong)
      assert(r.getAs[Long]("tf_sum") === tfs.sum)
      assert(r.getAs[Long]("tf_min") === tfs.min)
    }
  }

  test("q220 matches a sequential next-purchase walk per user") {
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val w = PatternMiningQueries.PatternWindowMicros
    val expect = events.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._4))
      val errs = sorted.zipWithIndex.collect { case ((_, "error", ts, _), i) =>
        val nextP = sorted.drop(i + 1).collectFirst { case (_, "purchase", pts, _) => pts }
        (ts, nextP)
      }
      if (errs.isEmpty) None
      else {
        val matched = errs.collect { case (ts, Some(p)) if p - ts <= w => p - ts }
        Some(u -> ((errs.size.toLong, matched.size.toLong,
          if (matched.isEmpty) None else Some(matched.min))))
      }
    }
    val rows = PatternMiningQueries.eventPattern(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSet === expect.keySet)
    rows.foreach { r =>
      val (ne, nm, ml) = expect(r.getLong(0))
      assert(r.getAs[Long]("n_errors") === ne)
      assert(r.getAs[Long]("n_matched") === nm)
      if (ml.isEmpty) assert(r.isNullAt(r.fieldIndex("min_latency_us")))
      else assert(r.getAs[Long]("min_latency_us") === ml.get)
      assert(r.getAs[Long]("match_rate_e6") === nm * 1000000L / ne)
    }
  }

  test("q221 basket pairs and lift match a driver recomputation") {
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = Tables.orders(spark, sfDir).select(col("o_orderkey"))
      .distinct().count()
    val partN = items.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pairCounts = items.groupBy(_._1).toSeq.flatMap { case (_, its) =>
      val ps = its.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= PatternMiningQueries.MinPairSupport).toMap
    val rows = PatternMiningQueries.copurchaseLift(spark, sfDir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet === pairCounts.keySet)
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(r.getAs[Long]("n_ab") === pairCounts(key))
      assert(r.getAs[Long]("n_a") === partN(key._1))
      assert(r.getAs[Long]("n_b") === partN(key._2))
      assert(r.getAs[Long]("lift_e6") ===
        pairCounts(key) * nOrders * 1000000L / (partN(key._1) * partN(key._2)))
    }
  }
}
