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

  test("content substitutes only when body is NULL, with the note") {
    val byField = rows.groupBy(_.getAs[String]("field"))
    val contentRows = byField.getOrElse("content", Array.empty)
    assert(contentRows.nonEmpty)
    // content rows only when body is NULL (doc_id % 5 < 2) AND content
    // exists (doc_id % 10 != 0) — extractor.py:44 fetches content only
    // for `body is None`, so a present-but-EMPTY body (text shorter
    // than the body substring start) gets no fallback
    assert(contentRows.forall { r =>
      val id = r.getAs[Long]("doc_id")
      id % 5 < 2 && id % 10 != 0 && r.getAs[String]("notes") == "used_content_field"
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
    // noted docs scan only their title: either body is NULL and
    // content is too (doc_id % 10 == 0), or the body is present but
    // EMPTY (short text) which blocks the content fallback entirely
    assert(noted.forall(_.getAs[String]("field") == "title"))
    assert(noted.forall { r =>
      val id = r.getAs[Long]("doc_id")
      id % 10 == 0 || id % 5 >= 2
    })
  }

  test("payload is sorted by (field, start) per doc — python string sort on field") {
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    perDoc.values.foreach { rs =>
      val keys = rs.map(r => (r.getAs[String]("field"), r.getAs[Long]("pos"),
        r.getAs[Long]("n_toks"), r.getAs[Int]("kw_id")))
      assert(keys.sameElements(keys.sorted), "rows not in (field, start) order")
    }
    // body/content sort BEFORE title (extractor.py:81 string sort):
    // every doc with both a title row and a body/content row must NOT
    // lead with title
    val multiField = perDoc.values.filter(rs =>
      rs.map(_.getAs[String]("field")).distinct.length > 1)
    assert(multiField.nonEmpty, "no multi-field doc exercises the ordering")
    multiField.foreach(rs =>
      assert(rs.head.getAs[String]("field") != "title",
        s"title sorted first in doc ${rs.head.getAs[Long]("doc_id")}"))
  }

  test("method tags: multi-token grams are pattern, single automaton") {
    assert(rows.forall { r =>
      val expected = if (r.getAs[Long]("n_toks") > 1) "pattern" else "automaton"
      r.getAs[String]("method") == expected
    })
  }
}
