package graft

import scala.collection.mutable

import graft.queries.MatchAggQueries

/** q118: `_aggregate_matches` (city_extraction_job.py:274-361).
  * Ground truth here is a LITERAL transcription of the reference's
  * sequential fold (dicts, label_index, rekey-on-upgrade, order
  * slots) run over the same synthesized matches — the set-wise Spark
  * form must reproduce it row for row. */
class MatchAggSpec extends SparkSpec {

  private case class M(seq: Int, surface: String, name: Option[String],
    cityId: Option[String], method: Option[String], uf: Option[String])

  private case class Entry(var identifier: String, var cityId: Option[String],
    var label: Option[String], var uf: Option[String], var occurrences: Int,
    val sources: mutable.ArrayBuffer[String])

  /** The reference algorithm, line for line. */
  private def referenceFold(ms: Seq[M]): Seq[(Int, String, Option[String], Option[String], Int, String)] = {
    val entries = mutable.LinkedHashMap.empty[String, Entry]
    val order = mutable.ArrayBuffer.empty[String]
    val labelIndex = mutable.Map.empty[String, String]
    for (m <- ms) {
      val surface = m.surface.trim // py:280 (surface or name or '').strip()
      val surfaceRef = if (surface.nonEmpty) surface else m.name.getOrElse("").trim
      val canonical = m.name.filter(_.nonEmpty).getOrElse(surfaceRef)
      val normalized = canonical.trim.toLowerCase
      val cityId = m.cityId.filter(_.nonEmpty)
      if (!(surfaceRef.isEmpty && cityId.isEmpty)) {
        val fallbackKey = Seq(normalized, surfaceRef.toLowerCase)
          .find(_.nonEmpty).orElse(cityId).getOrElse(surfaceRef)
        var key = cityId.orElse(
          if (normalized.nonEmpty) labelIndex.get(normalized) else None)
          .getOrElse(fallbackKey)
        // upgrade path py:295-316
        cityId.foreach { c =>
          if (!entries.contains(c) && normalized.nonEmpty && labelIndex.contains(normalized)) {
            val prev = labelIndex(normalized)
            entries.remove(prev).foreach { e =>
              val idx = order.indexOf(prev)
              if (idx >= 0) order(idx) = c else order += c
              e.identifier = c; e.cityId = Some(c)
              entries(c) = e
              labelIndex(normalized) = c
              key = c
            }
          }
        }
        if (!entries.contains(key)) {
          val identifier = cityId.orElse(Option(surfaceRef).filter(_.nonEmpty))
            .getOrElse(fallbackKey)
          entries(key) = Entry(identifier, cityId,
            Option(canonical.trim).filter(_.nonEmpty)
              .orElse(Option(surfaceRef).filter(_.nonEmpty)),
            m.uf, 0, mutable.ArrayBuffer.empty)
          order += key
          if (normalized.nonEmpty) labelIndex(normalized) = key
        }
        val e = entries(key)
        e.occurrences += 1
        if (e.cityId.isEmpty && cityId.nonEmpty) { e.cityId = cityId; e.identifier = cityId.get }
        if (e.label.isEmpty)
          Option(canonical.trim).filter(_.nonEmpty)
            .orElse(Option(surfaceRef).filter(_.nonEmpty)).foreach(v => e.label = Some(v))
        if (e.uf.isEmpty && m.uf.nonEmpty) e.uf = m.uf
        m.method.foreach(meth => if (!e.sources.contains(meth)) e.sources += meth)
      }
    }
    order.toSeq.distinct.flatMap { key =>
      entries.get(key).filter(_.cityId.nonEmpty).map { e =>
        (0, e.cityId.get, e.label, e.uf, e.occurrences, e.sources.mkString(","))
      }
    }.zipWithIndex.map { case ((_, c, l, u, o, s), i) => (i + 1, c, l, u, o, s) }
  }

  /** Re-synthesize the q118 input for one article from the raw table. */
  private def synth(rows: Array[org.apache.spark.sql.Row]): Seq[M] =
    rows.sortBy(r => (r.getAs[Int]("l_linenumber"), r.getAs[Long]("l_partkey"),
      r.getAs[Long]("l_suppkey"))).zipWithIndex.map { case (r, i) =>
      val pk = r.getAs[Long]("l_partkey"); val sk = r.getAs[Long]("l_suppkey")
      val ln = r.getAs[Int]("l_linenumber"); val lab = pk % 13
      val (surface, name, city) =
        if (sk % 11 == 1) ("", None, None)
        else if (sk % 13 == 2) ("", None, Some(s"x${pk % 19}"))
        else {
          val sf = if (sk % 5 == 0) s"  Place $lab  " else s"Place $lab"
          val nm = if (sk % 7 == 0) None else Some(s"Place $lab")
          val c = if (sk % 3 == 0 && lab % 5 != 4) Some(s"c$lab") else None
          (sf, nm, c)
        }
      val method = (ln % 3) match {
        case 1 => Some("automaton"); case 2 => Some("pattern"); case _ => None
      }
      val uf = if (sk % 4 == 0) Some(s"UF${pk % 27}") else None
      M(i + 1, surface, name, city, method, uf)
    }.toSeq

  test("set-wise aggregation equals the reference's sequential fold") {
    val out = MatchAggQueries.matchAggregate(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("article_id"))
    val raw = Tables.lineitem(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("l_orderkey"))
    assert(raw.nonEmpty)
    var checkedMentions = 0
    raw.foreach { case (article, rows) =>
      val expected = referenceFold(synth(rows))
      val got = out.getOrElse(article, Array.empty).sortBy(_.getAs[Long]("pos"))
        .map(r => (r.getAs[Long]("pos").toInt, r.getAs[String]("city_id"),
          Option(r.getAs[String]("label")), Option(r.getAs[String]("uf")),
          r.getAs[Long]("occurrences").toInt, r.getAs[String]("sources_csv")))
        .toSeq
      assert(got == expected, s"article $article: $got != $expected")
      checkedMentions += expected.length
    }
    assert(checkedMentions > 100, "input too thin to trust the equivalence")
  }

  test("all structural branches are exercised by the synthesized input") {
    val out = MatchAggQueries.matchAggregate(spark, sfDir).collect()
    assert(out.exists(_.getAs[String]("city_id").startsWith("x")), "no city-only groups")
    assert(out.exists(_.getAs[String]("city_id").startsWith("c")), "no label-bound groups")
    assert(out.exists(_.getAs[Long]("occurrences") > 1), "no multi-occurrence entry")
    assert(out.exists(_.getAs[String]("sources_csv").contains(",")), "no two-method entry")
    assert(out.exists(_.getAs[String]("uf") == null), "no null-uf survivor")
  }
}
