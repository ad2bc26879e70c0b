package graft

import graft.queries.ExtractorQueries

/** q89: the extract_cities_from_article field-selection semantics
  * (city_matching/extractor.py:42-55) over the synthesized
  * title/body/content fields. */
class ExtractorSpec extends SparkSpec {

  private lazy val rows =
    ExtractorQueries.fieldExtraction(spark, sfDir).collect()

  test("title rows exist for docs with non-empty titles only") {
    val titleDocs = rows.filter(_.getAs[String]("field") == "title")
      .map(_.getAs[Long]("doc_id")).toSet
    assert(titleDocs.nonEmpty)
    assert(titleDocs.forall(_ % 11 != 0), "doc_id % 11 == 0 has an empty title")
  }

  test("content substitutes only when body is missing, with the note") {
    val byField = rows.groupBy(_.getAs[String]("field"))
    val contentRows = byField.getOrElse("content", Array.empty)
    assert(contentRows.nonEmpty)
    // content rows only when content exists (doc_id % 10 != 0); the
    // body may be NULL (doc_id % 5 < 2) or present-but-EMPTY (text
    // shorter than the body substring start — the reference's
    // `if body_text:` truthiness, extractor.py:49)
    assert(contentRows.forall { r =>
      val id = r.getAs[Long]("doc_id")
      id % 10 != 0 && r.getAs[String]("notes") == "used_content_field"
    })
    // body rows never carry a note
    assert(byField.getOrElse("body", Array.empty).forall(_.getAs[String]("notes") == ""))
    // no doc has both body and content rows
    val bodyDocs = byField.getOrElse("body", Array.empty).map(_.getAs[Long]("doc_id")).toSet
    val contentDocs = contentRows.map(_.getAs[Long]("doc_id")).toSet
    assert(bodyDocs.intersect(contentDocs).isEmpty)
  }

  test("missing_body_and_content note surfaces on title-only docs") {
    val noted = rows.filter(_.getAs[String]("notes") == "missing_body_and_content")
    assert(noted.nonEmpty)
    assert(noted.forall { r =>
      r.getAs[String]("field") == "title" && r.getAs[Long]("doc_id") % 10 == 0
    })
  }

  test("payload is sorted by (field, start) per doc — python string sort on field") {
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    perDoc.values.foreach { rs =>
      val keys = rs.map(r => (r.getAs[String]("field"), r.getAs[Long]("pos"),
        r.getAs[Long]("n_toks"), r.getAs[Int]("kw_id")))
      assert(keys.sameElements(keys.sorted), "rows not in (field, start) order")
    }
    // body/content sort BEFORE title (extractor.py:81 string sort)
    val firstFields = perDoc.values.map(_.head.getAs[String]("field")).toSet
    assert(!firstFields.contains("title") || perDoc.values.exists(rs =>
      rs.map(_.getAs[String]("field")).distinct.length == 1))
  }

  test("method tags: multi-token grams are pattern, single automaton") {
    assert(rows.forall { r =>
      val expected = if (r.getAs[Long]("n_toks") > 1) "pattern" else "automaton"
      r.getAs[String]("method") == expected
    })
  }
}
