package graft

import org.apache.spark.sql.functions._

import graft.queries.{CatalogEnrichQueries, ErrorReplayQueries, PersonNerQueries}

/** Semantics pins for the three round-7 reference slices: person NER
  * (q122), catalog enrichment (q123), and the news-repo mutation
  * replay (q124). Each test asserts a behavior of the REFERENCE state
  * machine the relational form must preserve, on concrete keys. */
class ReferenceSlicesSpec extends SparkSpec {

  private lazy val ner = PersonNerQueries.personNer(spark, sfDir).cache()
  private lazy val cat = CatalogEnrichQueries.catalogEnrich(spark, sfDir).cache()
  private lazy val rep = ErrorReplayQueries.errorReplay(spark, sfDir).cache()

  test("q122: doc 1 yields the honorific and bare mentions with their sentences") {
    val rows = ner.filter(col("doc_id") === 1)
      .orderBy(col("m_start"))
      .select(col("canonical"), col("method"), col("confidence_milli"), col("sentence"))
      .collect()
    assert(rows.length === 2)
    // _titlecase_word capitalizes connector particles too
    // (normalization.py:112 part_lower.capitalize()): "de" -> "De"
    assert(rows(0).getString(0) === "Maria De Souza")
    assert(rows(0).getString(1) === "honorific")
    assert(rows(0).getLong(2) === 950L)
    // the "." of "Dr." terminates the preceding sentence segment, so
    // the entity's sentence starts at the name (find_sentence_containing)
    assert(rows(0).getString(3) === "Maria de Souza, que falou sobre o tema.")
    assert(rows(1).getString(0) === "Otávio Nunes")
    assert(rows(1).getString(1) === "caps_run")
    assert(rows(1).getString(3) === "Depois disso, Otávio Nunes respondeu as perguntas!")
  }

  test("q122: ensure_person gives one stable id per canonical; no empty canonicals") {
    val perCanon = ner.groupBy(col("canonical"))
      .agg(countDistinct(col("person_id")).as("n"))
    assert(perCanon.filter(col("n") =!= 1).count() === 0)
    assert(ner.filter(col("canonical") === "").count() === 0)
    // the all-honorific surface ("Deputada Presidente") never survives
    assert(ner.filter(col("psurface") === "Deputada Presidente").count() === 0)
  }

  test("q123: coercion branches — flat-coords fallback, seq all-or-nothing, key-chain past garbage") {
    val r3 = cat.filter(col("p_partkey") === 3).collect()(0) // k%5==3: '' lat in coords map -> flat fields
    assert(r3.getAs[Double]("lat") === -61.25)
    val r9 = cat.filter(col("p_partkey") === 9).collect()(0) // k%12==9: bad seq element -> whole bbox null
    assert(r9.isNullAt(r9.fieldIndex("bbox_south")) && r9.isNullAt(r9.fieldIndex("bbox_east")))
    val r4 = cat.filter(col("p_partkey") === 4).collect()(0) // k%12==4: south falls past 'oops' to min_lat; east '' has no fallback
    assert(r4.getAs[Double]("bbox_south") === -26.25)
    assert(r4.isNullAt(r4.fieldIndex("bbox_east")))
    assert(!r4.isNullAt(r4.fieldIndex("bbox_west")))
    val r36 = cat.filter(col("p_partkey") === 36).collect()(0) // _STATE_CAPITAL_IBGE_IDS match
    assert(r36.getAs[Boolean]("capital"))
    val r2 = cat.filter(col("p_partkey") === 2).collect()(0) // str('') stays '' (catalog.py:216)
    assert(r2.getAs[String]("ibge_id") === "")
  }

  test("q123: last capital in entry order wins; refresh metadata is global") {
    import spark.implicits._
    val capKeys = cat.filter(col("capital"))
      .groupBy(col("uf")).agg(max(col("p_partkey")).as("want"))
    val got = cat.filter(col("cap_ibge_id").isNotNull)
      .select(col("uf"), col("cap_ibge_id")).distinct()
      .join(capKeys, "uf")
      .filter(col("cap_ibge_id") =!= col("want").cast("string"))
    // every attached capital summary is the LAST (max-key) capital of
    // its uf, unless that entry's ibge_id was ''/null (summary skips it)
    assert(got.count() === 0 ||
      got.select("uf").as[String].collect().forall { uf =>
        val k = capKeys.filter(col("uf") === uf).select("want").as[Long].collect()(0)
        k % 4 >= 2 // the winning entry carries no usable ibge_id
      })
    assert(cat.select(col("record_count"), col("checksum"), col("should_refresh"))
      .distinct().count() === 1)
  }

  test("q124: success clears the errors array but NOT last_error; done implies no pending errors") {
    // ner_done=true => errors array was $unset by the last processed
    assert(rep.filter(col("ner_done") === true && col("err_count") =!= 0).count() === 0)
    // the pinned quirk: at least one url is done yet still carries a
    // last_error from an earlier failure
    assert(rep.filter(col("ner_done") === true && col("last_error").isNotNull).count() > 0)
    // collector-written urls with no extraction events exist with nulls
    assert(rep.filter(col("ner_done").isNull)
      .filter(col("err_count") =!= 0 || col("upserted") === true).count() === 0)
  }

  test("q124: mark_processed does not upsert — processed before the first error is a no-op") {
    // upserted urls exist only via an error, so they must carry error
    // history, and any earlier processed event must not have applied
    val up = rep.filter(col("upserted") === true)
    assert(up.count() > 0)
    assert(up.filter(col("last_error").isNull).count() === 0)
    // a processed-only url outside the collector set must be absent
    val nv = rep.filter(col("upserted") === true && col("ner_done") === true)
    // such urls became visible only at their first error; their
    // processed_at must come from an event at-or-after that error
    assert(nv.filter(col("processed_at").isNull).count() === 0)
  }
}
