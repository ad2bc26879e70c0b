package graft

import org.apache.spark.sql.functions._

import graft.operators.Gazetteer
import graft.queries.ContextQueries

/** The context-UF scoring chain (signals.py / aggregator.py):
  * per-sentence context extraction, the +-300/700 milli adjustment with
  * its max(0, ·) clamp, the 6-step tie-break chain, and the suppression
  * audit trail — each on hand-crafted inputs where the expected values
  * are computable by eye. */
class ContextGazetteerSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("context match adds +300 milli; mismatch subtracts 700 with a clamp at 0") {
    val docs = docsDf(
      (1L, "spark data"), // title sentence, ctx DT == spark's UF -> match
      (2L, "spark row"), // ctx RW != DT -> mismatch
      (3L, "the batch hash row")) // hash (UF DT) in sentence 1 w/ ctx RW: conf 350 -> clamped to 0
    val m = Gazetteer.contextMatches(docs, spark, "text", "doc_id")
      .select("doc_id", "keyword", "score_milli", "context_matches", "context_mismatches")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // spark: weight 950 + title 400 + bonus 300
    assert(m((1L, "spark")) == (1650L, 1L, 0L))
    // spark: 950 + 400 - 700
    assert(m((2L, "spark")) == (650L, 0L, 1L))
    // hash: weight 350, sentence 1 (no title), mismatch -> max(0, 350-700)
    assert(m((3L, "hash")) == (0L, 0L, 1L))
    // batch (the sentence terminator is itself a catalog keyword) sits in
    // sentence 0 with no state word there: unadjusted 700 + 400
    assert(m((3L, "batch")) == (1100L, 0L, 0L))
  }

  test("admin markers use the +-48-char window, not token adjacency") {
    // near: 'fast' is 4 tokens from 'spark' but chars [12,16) sit inside
    // [0-48, 5+48) -> marker (old +-1-token adjacency would miss it).
    // far: 8 five-char fillers push 'fast' to chars [54,58), past
    // match_end+48 = 53 -> no marker.
    val near = "spark a b c fast"
    val far = "spark " + Seq.fill(8)("wwwww").mkString(" ") + " fast"
    val m = Gazetteer.contextMatches(docsDf((1L, near), (2L, far)), spark, "text", "doc_id")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("keyword")) ->
        (r.getAs[Long]("admin_markers"), r.getAs[Long]("score_milli"))).toMap
    assert(m((1L, "spark")) == (1L, 1950L)) // 950 + title 400 + admin 600
    assert(m((2L, "spark")) == (0L, 1350L)) // 950 + title 400
  }

  test("tie-break steps 4-6 and the suppression audit label losers at the first failing step") {
    import spark.implicits._
    val aggd = Seq(
      // (doc, kw_id, keyword, score, occ, admin, title, ctx_m, ctx_mm)
      (1L, 1, "a", 100L, 3L, 2L, 400L, 0L, 0L), // the primary
      (1L, 2, "b", 100L, 5L, 2L, 400L, 0L, 2L), // loses at context_uf
      (1L, 3, "c", 100L, 2L, 2L, 400L, 0L, 0L), // loses at occurrences
      (1L, 4, "d", 100L, 3L, 2L, 400L, 0L, 0L), // loses at city_id
      (1L, 5, "e", 100L, 9L, 1L, 400L, 0L, 0L), // loses at admin_marker
      (1L, 6, "f", 90L, 9L, 9L, 900L, 0L, 0L), // loses at score
      (1L, 7, "g", 100L, 9L, 2L, 300L, 0L, 0L)) // loses at title_boost
      .toDF("doc_id", "kw_id", "keyword", "score_milli", "occurrences",
        "admin_markers", "title_boost_milli", "context_matches", "context_mismatches")
    val primary = Gazetteer.primaryWithContext(aggd, "doc_id").collect()
    assert(primary.length == 1 && primary.head.getAs[Int]("kw_id") == 1)
    val sup = Gazetteer.suppressions(aggd, "doc_id")
      .collect().map(r => r.getAs[Int]("kw_id") -> (r.getAs[String]("reason"), r.getAs[String]("rule"))).toMap
    assert(sup(2) == ("tie_break", "context_uf"))
    assert(sup(3) == ("tie_break", "occurrences"))
    assert(sup(4) == ("tie_break", "city_id"))
    assert(sup(5) == ("tie_break", "admin_marker"))
    assert(sup(6) == ("lower_score", "score"))
    assert(sup(7) == ("tie_break", "title_boost"))
    assert(!sup.contains(1), "the primary must not appear in the audit")
  }

  test("q58 state extraction finds injected names and standalone abbreviations") {
    val rows = ContextQueries.stateMentions(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byDoc = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // doc 2: name Amapa -> AP; abbreviation index (2*11+5)%27 = 0 -> AC
    assert(Set("AP", "AC").subsetOf(byDoc(2L)), byDoc(2L).toString)
    // doc 1: name Alagoas only (odd id: no abbreviation, 1%7 != 0)
    assert(byDoc(1L) == Set("AL"), byDoc(1L).toString)
    // every extracted UF is one of the 27 real codes
    val valid = ContextQueries.States.map(_._3).toSet
    assert(rows.map(_._2).forall(valid.contains))
  }

  test("foldWithOffsets maps folded chars back to source indices") {
    import spark.implicits._
    import graft.functions.TextFunctions.{fold, foldWithOffsets}
    // "Ação-X" -> folded "acao x": 'ç' (idx 2) keeps its index, the
    // hyphen (idx 4) becomes the space, soft hyphen (in "tr­ena")
    // is deleted so its index never appears
    val df = Seq((1L, "Ação-X"), (2L, "tr­ena")).toDF("id", "t")
      .select(col("id"), fold(col("t")).as("whole"), foldWithOffsets(col("t")).as("fo"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getStruct(2).getString(0), r.getStruct(2).getSeq[Int](1))).toMap
    assert(df(1L)._2 == "acao x" && df(1L)._2 == df(1L)._1)
    assert(df(1L)._3 == Seq(0, 1, 2, 3, 4, 5))
    assert(df(2L)._2 == "trena" && df(2L)._2 == df(2L)._1)
    assert(df(2L)._3 == Seq(0, 1, 3, 4, 5)) // index 2 (soft hyphen) skipped
  }

  test("q61 match spans project folded matches back onto the raw text") {
    import org.apache.spark.sql.functions.col
    // U+2011 hyphen folds to the space of 2-token "hash join" (1:1
    // chars); the soft hyphen in "fil­ter" is DELETED, so orig spans
    // are one char wider than folded spans past it
    val docs = docsDf((1L, "hash‑join x"), (2L, "fil­ter a"))
    val rows = Gazetteer.matchSpans(docs, Gazetteer.variantsDf(spark), "text", "doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("variant")) ->
        (r.getAs[Long]("orig_start"), r.getAs[Long]("orig_end"), r.getAs[String]("orig_surface"))).toMap
    assert(rows((1L, "hash join")) == (0L, 9L, "hash‑join"))
    assert(rows((1L, "hash")) == (0L, 4L, "hash"))
    assert(rows((1L, "join")) == (5L, 9L, "join"))
    assert(rows((2L, "filter")) == (0L, 7L, "fil­ter"))
    // contiguity guard: "hash  join" (double space) is NOT the keyword
    // "hash join" — the char automaton would not match it either
    val none = Gazetteer.matchSpans(docsDf((3L, "hash  join")),
      Gazetteer.variantsDf(spark), "text", "doc_id")
      .filter(col("variant") === "hash join")
    assert(none.count() == 0)
  }

  test("q56/q57 shapes: one primary per doc; audit rows only for losers") {
    val q56 = ContextQueries.contextGazetteer(spark, sfDir)
    val nDocs = q56.select("doc_id").distinct().count()
    assert(q56.count() == nDocs)
    val q57 = ContextQueries.suppressionAudit(spark, sfDir)
    val joined = q57.join(q56, Seq("doc_id", "kw_id"), "inner")
    assert(joined.count() == 0, "no suppressed row may also be the primary")
  }
}
