package graft

import graft.operators.Disambiguation

class DisambiguationSpec extends SparkSpec {
  import spark.implicits._

  private def resolveOne(text: String) =
    Disambiguation.resolve(Seq((1L, text)).toDF("doc_id", "text"), spark, "text", "doc_id")
      .collect().map(r => (r.getAs[String]("surface"), r.getAs[String]("status"),
        Option(r.getAs[Any]("resolved_id")), r.getAs[Long]("confidence_milli")))

  test("unambiguous surface resolves at 0.95") {
    val Array(r) = resolveOne("x filter y")
    assert(r == (("filter", "resolved", Some(206), 950L)))
  }

  test("ambiguous-marked surface needs reinforcing context (reliable-context rule)") {
    // 'sort' is in AmbiguousSurfaces (requires 'batch'): alone it is
    // downgraded to unknown_ctx at 0.4 despite the single candidate
    val Array(lone) = resolveOne("x sort y")
    assert(lone == (("sort", "unknown_ctx", None, 400L)))
    // rule 1: the explicit hint names the required ctx -> resolved
    val hinted = resolveOne("x sort batch y").find(_._1 == "sort").get
    assert(hinted == (("sort", "resolved", Some(205), 950L)))
    // rules 2/3: the required ctx mentioned in the SAME sentence
    val sameSent = resolveOne("sort a b batch").find(_._1 == "sort").get
    assert(sameSent == (("sort", "resolved", Some(205), 950L)))
    // ctx in a PREVIOUS sentence does not help (sentence-scoped)
    val otherSent = resolveOne("a batch sort c").find(_._1 == "sort").get
    assert(otherSent == (("sort", "unknown_ctx", None, 400L)))
  }

  test("ambiguous surface without context stays ambiguous at 0.5") {
    val Array(r) = resolveOne("x merge y")
    assert(r._2 == "ambiguous" && r._3.isEmpty && r._4 == 500L)
  }

  test("document context narrows an ambiguous surface to resolved") {
    // 'merge' is (201,'join')/(202,'stream'); doc mentions 'join' only
    val rs = resolveOne("a merge b join c")
    val m = rs.find(_._1 == "merge").get
    assert(m._2 == "resolved" && m._3 == Some(201))
  }

  test("context is sentence-scoped: a ctx word in another sentence does not resolve") {
    // 'batch' terminates sentence 0; 'join' lives in sentence 1, so the
    // mention of 'merge' (sentence 0) must stay ambiguous
    val rs = resolveOne("a merge b batch join c")
    val m = rs.find(_._1 == "merge").get
    assert(m._2 == "ambiguous" && m._3.isEmpty && m._4 == 500L)
    // same words, same sentence -> resolved (control)
    val ctl = resolveOne("a merge b join c").find(_._1 == "merge").get
    assert(ctl._2 == "resolved" && ctl._3 == Some(201))
  }

  test("a surface with no catalog candidates is foreign at 0.2") {
    // disambiguation.py:113-119: empty candidate list -> "foreign", 0.2
    val Array(r) = resolveOne("x agg y")
    assert(r == (("agg", "foreign", None, 200L)))
    // the empty-candidate check runs BEFORE the hint path, so a hint
    // next to a foreign surface still yields foreign, not unknown_ctx
    val Array(h) = resolveOne("x hash join y")
    assert(h._1 == "hash" && h._2 == "foreign" && h._3.isEmpty && h._4 == 200L)
  }

  test("explicit hint wins; a hint matching no candidate is unknown_ctx at 0.4") {
    // hint 'stream' right after 'merge' -> 202 even though 'join' also present
    val hinted = resolveOne("a merge stream b join c")
    val m = hinted.find(_._1 == "merge").get
    assert(m._2 == "resolved" && m._3 == Some(202))
    // 'sort' only has ctx 'batch'; hint 'join' matches nothing
    val unknown = resolveOne("a sort join b")
    val s = unknown.find(_._1 == "sort").get
    assert(s._2 == "unknown_ctx" && s._3.isEmpty && s._4 == 400L)
  }
}
