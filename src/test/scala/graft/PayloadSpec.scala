package graft

import graft.queries.PayloadQueries

/** q114/q115: ExtractionResultStore replay semantics
  * (extraction_result_store.py:57-66, 150-166) and the
  * CityMentionPayload or-chain coercions (article_payload.py:25-53). */
class PayloadSpec extends SparkSpec {

  private lazy val store = PayloadQueries.storeReplay(spark, sfDir).collect()
  private lazy val mentions = PayloadQueries.cityMentionPayload(spark, sfDir).collect()

  test("every url's survivors share the record's final version pair") {
    assert(store.nonEmpty)
    store.groupBy(_.getAs[String]("url")).values.foreach { rs =>
      assert(rs.map(r => (r.getAs[String]("ner_version"),
        r.getAs[String]("gazetteer_version"))).distinct.length == 1,
        "a version change inside the survivor set means the reset was missed")
    }
  }

  test("occurrences are unique per (url, person, span) with dense positions") {
    store.groupBy(_.getAs[String]("url")).values.foreach { rs =>
      val keys = rs.map(r => (r.getAs[String]("person_id"),
        r.getAs[Long]("start_off"), r.getAs[Long]("end_off")))
      assert(keys.distinct.length == keys.length, "duplicate occurrence survived")
      val pos = rs.map(_.getAs[Long]("pos")).sorted
      assert(pos.sameElements(1L to rs.length), "positions not dense from 1")
    }
  }

  test("identifier resolves through the 7-field or-chain skipping falsy") {
    assert(mentions.nonEmpty)
    mentions.foreach { r =>
      val k = r.getAs[Long]("mention_id")
      val ident = r.getAs[String]("identifier")
      if (k % 11 == 0) assert(ident == s"ident-$k")
      else if (k % 5 == 2) assert(ident == s"cid-${k % 100}")
      else if (k % 3 == 1) assert(ident == s"ibge-${k % 77}")
      // later fields only when the first three are all falsy
      else assert(!ident.startsWith("ident-"))
    }
  }

  test("mentions without a truthy city_id are dropped") {
    // kept rows always resolved a non-empty city_id from the 3-chain
    assert(mentions.forall(_.getAs[String]("city_id").nonEmpty))
    // and rows where all of city_id/ibge_id/id are falsy never appear:
    // k%5 in {0,3,4} (city null/empty), k%3 in {0,2} (ibge falsy),
    // k%7 not in {0,1} (id falsy)
    assert(mentions.forall { r =>
      val k = r.getAs[Long]("mention_id")
      (k % 5 == 2) || (k % 3 == 1) || (k % 7 < 2)
    })
  }

  test("occurrences default to 1 when null or non-positive") {
    mentions.foreach { r =>
      val k = r.getAs[Long]("mention_id")
      val occ = r.getAs[Long]("occurrences")
      if (k % 9 == 0 || k % 7 - 2 <= 0) assert(occ == 1L)
      else assert(occ == k % 7 - 2)
      assert(occ >= 1L)
    }
  }

  test("sources drop empties and dedupe keeping first-seen order") {
    mentions.foreach { r =>
      val k = r.getAs[Long]("mention_id")
      val parts = r.getAs[String]("sources_csv").split(",").toSeq
      assert(parts.head == "web")
      assert(parts.distinct == parts, "duplicate source survived")
      assert(!parts.contains(""), "empty source survived")
      if (k % 3 == 0) assert(parts.count(_ == "web") == 1, "second 'web' not deduped")
      else assert(parts.last == s"feed-${k % 3}")
    }
  }
}
