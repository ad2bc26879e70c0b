package graft

import org.apache.spark.sql.functions._

import graft.queries.SinkPayloadQueries

/** Semantics pins for the q141/q142 serialization boundaries — each
  * default-fill / drop branch of the reference's payload coercions
  * must be exercised by the synthesized data AND produce the
  * reference's outcome. */
class SinkPayloadSpec extends SparkSpec {

  private lazy val rt = SinkPayloadQueries.sinkRoundTrip(spark, sfDir).cache()
  private lazy val pp = SinkPayloadQueries.portalPayload(spark, sfDir).cache()
  private lazy val ar = SinkPayloadQueries.articleStoreRoundTrip(spark, sfDir).cache()

  // ---- q141: publications sink round-trip ----

  test("q141 accepted subset: existing (portal, url) keys never come back") {
    // the repo pre-contains every key with article_key % 11 == 3
    assert(rt.filter(col("article_key") % 11 === 3).count() == 0L)
    assert(rt.count() > 0L)
  }

  test("q141 ISO datetime round-trip is the identity on the instant") {
    val iso = rt.select(col("iso_published"),
      unix_timestamp(to_timestamp(col("iso_published"),
        "yyyy-MM-dd'T'HH:mm:ss")).as("reparsed"), col("rt_epoch"))
    assert(iso.filter(col("reparsed") =!= col("rt_epoch")).count() == 0L)
    // the serialized form is the reference's isoformat() shape
    assert(iso.filter(!col("iso_published")
      .rlike("^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}$")).count() == 0L)
  }

  test("q141 mentions without a city_id key are dropped by the server filter") {
    // n_stored < n_sent must actually occur (a slot with null city_id
    // was sent), and n_stored never exceeds n_sent
    assert(rt.filter(col("n_stored") < col("n_sent")).count() > 0L)
    assert(rt.filter(col("n_stored") > col("n_sent")).count() == 0L)
    // when nothing survives there is no first mention
    assert(rt.filter(col("n_stored") === 0 && col("first_city_id").isNotNull)
      .count() == 0L)
  }

  test("q141 classification is lost client-side but summary passes through") {
    assert(rt.filter(col("classification_rt").isNotNull).count() == 0L)
    assert(rt.filter(col("had_classification")).count() > 0L)
    // payload.get("summary") has no falsy chain: '' survives as ''
    assert(rt.filter(col("summary_rt") === "").count() > 0L)
    assert(rt.filter(col("summary_rt").isNull).count() > 0L)
  }

  test("q141 first surviving mention's sources are deduped keep-first") {
    val csv = rt.filter(col("m1_sources_csv").isNotNull)
    // 'web' duplicate collapses; '' is dropped; distinct extras survive
    assert(csv.filter(col("m1_sources_csv") === "web").count() > 0L)
    assert(csv.filter(col("m1_sources_csv").startsWith("web,rss-")).count() > 0L)
    assert(csv.filter(col("m1_sources_csv").contains("web,web")).count() == 0L)
    assert(csv.filter(col("m1_sources_csv").contains(",,")).count() == 0L)
  }

  // ---- q142: portal/selector payload coercions ----

  test("q142 selector attribute defaults to null on missing AND explicit null") {
    // k%3 in {0,1} -> no attribute either way; k%3==2 -> 'href'
    assert(pp.filter(col("portal_key") % 3 =!= 2 && col("la_attr").isNotNull)
      .count() == 0L)
    assert(pp.filter(col("portal_key") % 3 === 2 && col("la_attr") =!= "href")
      .count() == 0L)
  }

  test("q142 listing_summary: empty payload is skipped exactly like missing") {
    assert(pp.filter(col("ls_state") < 2 && col("ls_query").isNotNull).count() == 0L)
    assert(pp.filter(col("ls_state") >= 2 && col("ls_query").isNull).count() == 0L)
  }

  test("q142 headers default to empty, date_format keeps explicit null over the default") {
    assert(pp.filter(col("n_headers").isNull).count() == 0L)
    assert(pp.filter(col("portal_key") % 5 >= 2 && col("n_headers") =!= 0L)
      .count() == 0L)
    // dict.get default fires only on MISSING (df_state 0); an explicit
    // null (df_state 1) is kept as null
    assert(pp.filter(col("date_format") === "%Y-%m-%d").count() > 0L)
    assert(pp.filter(col("portal_key") % 3 === 1 && col("date_format").isNotNull)
      .count() == 0L)
    assert(pp.filter(col("portal_key") % 3 === 2 &&
      !col("date_format").startsWith("%d/%m/")).count() == 0L)
  }

  test("q142 legacy string city: strip, digits->city_id, text->label, empty dropped") {
    // digits (with surrounding whitespace) -> city_id == identifier, survives
    val digits = pp.filter(col("lc_city_id").isNotNull)
    assert(digits.count() > 0L)
    assert(digits.filter(col("lc_city_id") =!= col("lc_identifier")).count() == 0L)
    assert(digits.filter(!col("lc_survives")).count() == 0L)
    assert(digits.filter(col("lc_city_id").rlike("^[0-9]+$")).count() == digits.count())
    // non-digit text -> label only, and NEVER survives to_domain's
    // truthy-city_id filter
    val labels = pp.filter(col("lc_label").isNotNull)
    assert(labels.count() > 0L)
    assert(labels.filter(col("lc_survives")).count() == 0L)
    assert(labels.filter(col("lc_label").startsWith(" ")).count() == 0L)
    // whitespace-only and empty input -> everything null
    val empty = pp.filter(col("portal_key") % 6 === 2 || col("portal_key") % 6 === 4)
    assert(empty.filter(col("lc_identifier").isNotNull).count() == 0L)
  }

  // ---- q143: all-or-nothing batch validation ----

  test("q143 one invalid article rejects its whole batch; empty-string title is valid") {
    val bv = SinkPayloadQueries.batchValidation(spark, sfDir).cache()
    // all-or-nothing: accepted <=> zero invalid; stored is n or 0
    assert(bv.filter(col("accepted") && col("n_invalid") > 0).count() == 0L)
    assert(bv.filter(!col("accepted") && col("n_stored") =!= 0L).count() == 0L)
    assert(bv.filter(col("accepted") && col("n_stored") =!= col("n_articles"))
      .count() == 0L)
    // both outcomes occur, and rejected batches name their first error
    assert(bv.filter(col("accepted")).count() > 0L)
    assert(bv.filter(!col("accepted")).count() > 0L)
    assert(bv.filter(!col("accepted") && col("first_error_key").isNull)
      .count() == 0L)
    assert(bv.filter(col("accepted") && col("first_error_key").isNotNull)
      .count() == 0L)
    // pydantic str accepts '': batches holding empty titles can still pass
    assert(bv.filter(col("accepted") && col("n_empty_title_ok") > 0).count() > 0L)
  }

  // ---- q144: pending-feed deserialization cascade ----

  test("q144 every datetime branch fires and the fallback is epoch zero, not null") {
    val pd = graft.queries.PayloadQueries.pendingDeserialize(spark, sfDir).cache()
    val branches = pd.select(col("pub_branch")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(branches === Set("offset", "naive", "date_only", "fallback_epoch0"))
    // unparseable AND null published_at both collapse to the sentinel
    assert(pd.filter(col("pub_branch") === "fallback_epoch0" &&
      col("pub_epoch") =!= 0L).count() == 0L)
    assert(pd.filter(col("pub_branch") =!= "fallback_epoch0" &&
      col("pub_epoch") === 0L).count() == 0L)
    // `or ''` fills: title/body never null; source passes null through
    assert(pd.filter(col("title").isNull || col("body").isNull).count() == 0L)
    assert(pd.filter(col("source").isNull).count() > 0L)
  }

  // ---- q145: length-bucketed dynamic batching ----

  test("q145 batches respect size, bucket bounds and exact padding math") {
    val lb = graft.queries.CorpusOpsQueries.lengthBatches(spark, sfDir).cache()
    val bs = graft.queries.CorpusOpsQueries.LenBatchSize.toLong
    assert(lb.filter(col("n_docs") < 1 || col("n_docs") > bs).count() == 0L)
    // padded cost is exactly max_len * n_docs, and waste < 1 (e6)
    assert(lb.filter(col("padded_tokens") =!= col("max_len") * col("n_docs"))
      .count() == 0L)
    assert(lb.filter(col("pad_waste_e6") < 0L || col("pad_waste_e6") >= 1000000L)
      .count() == 0L)
    // within a (bucket, shard) only the LAST batch may be short
    val shortNotLast = lb.as("a").join(lb.as("b"),
      col("a.bucket") === col("b.bucket") && col("a.shard") === col("b.shard") &&
        col("a.batch_idx") < col("b.batch_idx"))
      .filter(col("a.n_docs") < bs)
    assert(shortNotLast.count() == 0L)
    // bucket is the floor-log2 band: every member length fits it
    assert(lb.filter(col("max_len") >= lit(2L).cast("long") * pow(lit(2.0),
      col("bucket").cast("double") - 1).cast("long")).count() == 0L)
  }

  // ---- q146: article-cities sync writer replay ----

  test("q146 last update wins, unset really unsets, portal-less hits all copies") {
    val cs = graft.queries.PayloadQueries.citiesSync(spark, sfDir).cache()
    // untouched articles keep their original fields and never report removal
    assert(cs.filter(col("n_applied") === 0L && col("meta_removed")).count() == 0L)
    // an applying update with null metadata UNSETS: final_meta must be null
    assert(cs.filter(col("meta_removed") && col("final_meta").isNotNull)
      .count() == 0L)
    // both replaced and untouched articles exist in the replay
    assert(cs.filter(col("n_applied") > 0L).count() > 0L)
    // both the $set and the $unset outcome occur among applied updates
    assert(cs.filter(col("n_applied") > 0L && col("meta_removed")).count() > 0L)
    assert(cs.filter(col("n_applied") > 0L && col("final_meta").isNotNull)
      .count() > 0L)
    // (untouched articles and the portal-less multi-copy fan-out need
    // key spaces that first diverge at sf0.01 — the oracle gate covers
    // both there)
  }

  // ---- q222: Mongo article-store round-trip ----

  test("q222 replays a literal transcription of _serialize/_deserialize per key") {
    // mongo_article_repository.py:78-116 transcribed: document build
    // with the conditional cities_extraction key, then the read-side
    // raw merge and `or ()` collapse
    ar.collect().foreach { r =>
      val k = r.getAs[Long]("article_key")
      val meta = if (k % 2 == 0) Some(s"meta-v${k % 5}") else None
      val rawOwn = if (k % 3 == 0) Some(s"raw-v${k % 7}") else None
      // serialize: key present iff metadata is not None
      assert(r.getAs[Boolean]("doc_has_meta_key") === meta.isDefined)
      // deserialize raw merge: raw's own value wins; metadata fills the gap
      val expectedRt = rawOwn.orElse(meta)
      assert(Option(r.getAs[String]("raw_extraction_rt")) === expectedRt, s"key $k")
      assert(r.getAs[Boolean]("meta_merged") === (rawOwn.isEmpty && meta.isDefined))
      // cities `or ()`: zero stored mentions collapse exactly when the list is empty
      assert(r.getAs[Boolean]("cities_collapsed") === (r.getAs[Long]("n_cities_rt") == 0L))
      // summary passthrough: '' survives as '', null as null
      val sumExp = (k % 5) match {
        case 0 => null; case 1 => ""; case m => s"s$m"
      }
      assert(r.getAs[String]("summary_rt") === sumExp)
    }
  }

  test("q222 exercises every branch: both merge outcomes and both collapse states") {
    val rows = ar.collect()
    assert(rows.exists(r => r.getAs[Boolean]("meta_merged")))
    assert(rows.exists(r => !r.getAs[Boolean]("meta_merged") &&
      r.getAs[String]("raw_extraction_rt") != null)) // raw's own won
    assert(rows.exists(_.getAs[String]("raw_extraction_rt") == null))
    assert(rows.exists(_.getAs[Boolean]("cities_collapsed")))
    assert(rows.exists(!_.getAs[Boolean]("cities_collapsed")))
  }
}
