package graft

import org.apache.spark.sql.functions._

import graft.operators.Gazetteer

class GazetteerSpec extends SparkSpec {

  test("matches finds keywords with title-zone and char-window admin signals") {
    import spark.implicits._
    // "join" at pos 1 (title zone); "fast" sits at chars [9,13) so BOTH
    // "join" (span [4,8)) and "merge" (span [22,27), window start
    // 22-48 < 9) see it inside their +-48-char windows.
    val docs = Seq((1L, "the join fast x y z w merge end")).toDF("doc_id", "text")
    val m = Gazetteer.matches(docs, Gazetteer.variantsDf(spark), "text", "doc_id")
      .orderBy("kw_id").collect()
    val join = m.find(_.getAs[String]("keyword") == "join").get
    assert(join.getAs[Long]("occurrences") == 1L)
    assert(join.getAs[Long]("admin_markers") == 1L)
    assert(join.getAs[Long]("title_boost_milli") == Gazetteer.TitleBoostMilli)
    // 900 (weight) + 600 (admin) + 400 (title)
    assert(join.getAs[Long]("score_milli") == 1900L)
    // 650 (weight) + 600 (admin in the char window; the old +-1-token
    // adjacency would have missed it 5 tokens away)
    val merge = m.find(_.getAs[String]("keyword") == "merge").get
    assert(merge.getAs[Long]("score_milli") == 1250L)
  }

  test("admin marker outside the 48-char window does not fire") {
    import spark.implicits._
    // eight 5-char fillers put 'fast' at chars [54,58): past
    // match_end(5) + 48 = 53 for the 'spark' span [0,5)
    val far = "spark " + Seq.fill(8)("wwwww").mkString(" ") + " fast"
    val docs = Seq((1L, far)).toDF("doc_id", "text")
    val m = Gazetteer.matches(docs, Gazetteer.variantsDf(spark), "text", "doc_id").collect()
    val spk = m.find(_.getAs[String]("keyword") == "spark").get
    assert(spk.getAs[Long]("admin_markers") == 0L)
    assert(spk.getAs[Long]("score_milli") == 1350L) // 950 + title 400
  }

  test("primary applies the reference tie-break chain deterministically") {
    import spark.implicits._
    // two keywords with equal score: sort/agg crafted so occurrences break the tie
    val docs = Seq((1L, "sort agg agg spark")).toDF("doc_id", "text")
    val m = Gazetteer.matches(docs, Gazetteer.variantsDf(spark), "text", "doc_id")
    val p = Gazetteer.primary(m, "doc_id").collect()
    assert(p.length == 1)
    // spark kw: 950 + title 400 = 1350; agg: 2*550 + 2*400 = 1900; sort: 600+400
    assert(p.head.getAs[String]("keyword") == "agg")
  }

  test("gazetteer match plan broadcasts the catalog (no shuffle on corpus side)") {
    val docs = Tables.documents(spark, sfDir)
    val m = Gazetteer.matches(docs, Gazetteer.variantsDf(spark), "text", "doc_id")
    val plan = m.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }
}
