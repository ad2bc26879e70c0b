package graft

import graft.queries.PatternQueries

/** q105-q107: the extraction service's deterministic pattern layer —
  * find_city_pattern_matches (gazetteer.py:86-107) with the
  * seen_spans dedup (service.py:138-152), _split_city_surface
  * (service.py:191-202), and process_next_batch accounting
  * (service.py:59-100). */
class PatternSpec extends SparkSpec {

  private lazy val patternRows =
    PatternQueries.cityPatterns(spark, sfDir).collect()

  test("q105 spans are unique per doc and ordinals contiguous") {
    val byDoc = patternRows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, rs) =>
      val spans = rs.map(r => (r.getAs[Long]("m_start"), r.getAs[Long]("m_end")))
      assert(spans.distinct.length === spans.length, "seen_spans dedup leaked a duplicate span")
      assert(rs.map(_.getAs[Long]("ord")).sorted.toSeq === (1L to rs.length).toSeq)
    }
  }

  test("q105 city_uf wins the exact span collision against prefeito") {
    // decoration 4 (doc_id % 7 == 1): "prefeito de Name - UF," — the
    // prefeito name group covers exactly the City-UF match span, so
    // only the city_uf row may survive (service.py:140 first-wins)
    val collisionDocs = patternRows.map(_.getAs[Long]("doc_id")).distinct
      .filter(_ % 7 == 1)
    assert(collisionDocs.nonEmpty)
    collisionDocs.foreach { d =>
      val rs = patternRows.filter(_.getAs[Long]("doc_id") == d)
      val cuSpans = rs.filter(_.getAs[String]("kind") == "city_uf")
        .map(r => (r.getAs[Long]("m_start"), r.getAs[Long]("m_end"))).toSet
      rs.filter(_.getAs[String]("kind") != "city_uf").foreach { r =>
        assert(!cuSpans.contains((r.getAs[Long]("m_start"), r.getAs[Long]("m_end"))))
      }
    }
  }

  test("q105 nested Município-CityUF overlap keeps both (distinct spans)") {
    // decoration 3b (doc_id % 5 == 3): "e no Município de Name - UF," —
    // the City-UF match starts at 'Município' (uppercase M starts the
    // name class), the município name group starts at Name: same end,
    // different start, no dedup
    val docs = patternRows.filter { r =>
      r.getAs[Long]("doc_id") % 5 == 3 && r.getAs[String]("kind") == "municipio"
    }
    assert(docs.nonEmpty)
    docs.foreach { mu =>
      val d = mu.getAs[Long]("doc_id")
      val cu = patternRows.find { r =>
        r.getAs[Long]("doc_id") == d && r.getAs[String]("kind") == "city_uf" &&
          r.getAs[Long]("m_end") == mu.getAs[Long]("m_end")
      }
      assert(cu.isDefined, s"doc $d: no enclosing city_uf match")
      assert(cu.get.getAs[Long]("m_start") < mu.getAs[Long]("m_start"))
      assert(cu.get.getAs[String]("surface").startsWith("Município de "))
    }
  }

  test("q105 only city_uf rows carry a UF") {
    assert(patternRows.forall { r =>
      (r.getAs[String]("kind") == "city_uf") == (r.getAs[String]("uf") != null)
    })
    patternRows.filter(_.getAs[String]("kind") == "city_uf").foreach { r =>
      assert(r.getAs[String]("surface").endsWith(" - " + r.getAs[String]("uf")) ||
        r.getAs[String]("surface").endsWith("/" + r.getAs[String]("uf")))
    }
  }

  test("q105 plan: map-side regex scan, one window exchange, no recompute leak") {
    val p = PatternQueries.cityPatterns(spark, sfDir)
      .queryExecution.executedPlan.toString
    // both windows (span dedup + ordinal) share one doc_id partitioning
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1, p)
    // the compiled-regex pass must never be inlined into a scan filter
    val scanLines = p.linesIterator.filter(_.contains("Scan parquet")).mkString("\n")
    assert(!scanLines.contains("graft_regex_spans"), scanLines)
  }

  private lazy val splitRows =
    PatternQueries.splitCitySurface(spark, sfDir).collect()

  test("q106 hyphenated name falls through '-' to the '/' separator") {
    // doc_id % 60 == 11: surface "Xique-Xique/ba" — '-' split yields a
    // non-UF tail, '/' split wins, lowercase tail upper-cases
    val r = splitRows.filter(r => r.getAs[Long]("doc_id") % 60 == 11)
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[String]("name") == "Xique-Xique"))
    assert(r.forall(_.getAs[String]("uf") == "BA"))
  }

  test("q106 non-UF tail and bare names resolve to (surface, null)") {
    val noUf = splitRows.filter(r =>
      r.getAs[Long]("doc_id") % 5 == 2 || r.getAs[Long]("doc_id") % 5 == 4)
    assert(noUf.nonEmpty)
    // "Xique-Xique" alone: '-' present but the tail is not a UF
    noUf.foreach { r =>
      if (r.getAs[Long]("doc_id") % 5 == 4)
        assert(r.getAs[String]("name") == r.getAs[String]("surface"))
      assert(r.getAs[String]("uf") == null)
    }
  }

  private lazy val deserRows =
    PatternQueries.deserializeShim(spark, sfDir).collect()

  test("q111 datetime cascade: unparseable shapes fall to epoch 0, date-only to midnight") {
    assert(deserRows.nonEmpty)
    deserRows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val e = r.getAs[Long]("published_epoch")
      d % 6 match {
        case 4 | 5 => assert(e === 0L, s"doc $d: '${r.getAs[String]("raw")}' must not parse")
        case 3 => assert(e > 0 && e % 86400 === 0, s"doc $d: date-only must be UTC midnight")
        case _ => assert(e > 0)
      }
      // 22:45:01-03:00 is 01:45:01 UTC (next day): the offset is applied
      if (d % 6 == 1) assert(e % 86400 === 1 * 3600 + 45 * 60 + 1)
    }
  }

  test("q111 or-chain fallback: empty primary falls through, both-missing yields ''") {
    deserRows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val t = r.getAs[String]("title_resolved")
      if (d % 4 >= 2) assert(t === s"Título $d")
      else if (d % 8 < 4) assert(t === s"Alt $d", s"doc $d: falsy titulo must fall through")
      else assert(t === "")
    }
  }

  test("q107 batch accounting partitions every document exactly once") {
    val rows = PatternQueries.batchAccounting(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("processed") + r.getAs[Long]("skipped_empty") +
        r.getAs[Long]("n_errors") === r.getAs[Long]("n_docs"))
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total === Tables.documents(spark, sfDir).count())
  }
}
