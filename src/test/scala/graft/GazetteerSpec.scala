package graft

import org.apache.spark.sql.functions._

import graft.operators.Gazetteer

class GazetteerSpec extends SparkSpec {

  test("matches finds keywords with title-zone and admin-adjacency signals") {
    import spark.implicits._
    // "join" at pos 1 (title zone) with admin neighbor "fast";
    // "merge" at pos 7 (outside title zone), no admin neighbor.
    val docs = Seq((1L, "the join fast x y z w merge end")).toDF("doc_id", "text")
    val m = Gazetteer.matches(docs, Gazetteer.variantsDf(spark), "text", "doc_id")
      .orderBy("kw_id").collect()
    val join = m.find(_.getAs[String]("keyword") == "join").get
    assert(join.getAs[Long]("occurrences") == 1L)
    assert(join.getAs[Long]("admin_markers") == 1L)
    assert(join.getAs[Long]("title_boost_milli") == Gazetteer.TitleBoostMilli)
    // 900 (weight) + 600 (admin) + 400 (title)
    assert(join.getAs[Long]("score_milli") == 1900L)
    val merge = m.find(_.getAs[String]("keyword") == "merge").get
    assert(merge.getAs[Long]("score_milli") == 650L)
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
