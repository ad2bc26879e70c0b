package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.queries.WebOpsQueries

/** q203/q204: URL canonicalization dedup and politeness scheduling. */
class WebOpsSpec extends SparkSpec {

  test("canonicalUrl applies each rule (ports, www, fragment, tracking, slashes)") {
    val cases = Seq(
      ("HTTP://WWW.Ex.COM:80/A/1#frag", "http://ex.com/A/1"),
      ("http://ex.com:443/a", "http://ex.com:443/a"),
      ("https://ex.com:443/a/", "https://ex.com/a"),
      ("https://ex.com/", "https://ex.com/"),
      ("https://ex.com/p///", "https://ex.com/p"),
      ("https://ex.com/p?utm_source=x&utm_campaign=y", "https://ex.com/p"),
      ("https://ex.com/p?b=2&utm_source=x&a=1", "https://ex.com/p?b=2&a=1"),
      ("https://ex.com/p?fbclid=1&gclid=2&page=3", "https://ex.com/p?page=3"))
    val got = spark.createDataFrame(cases).toDF("u", "want")
      .withColumn("got", WebOpsQueries.canonicalUrl(col("u")))
      .collect()
    got.foreach(r => assert(r.getAs[String]("got") === r.getAs[String]("want"),
      r.getAs[String]("u")))
  }

  test("q203 groups match the constructed variant structure") {
    val n = Tables.documents(spark, sfDir).count()
    val rows = WebOpsQueries.urlCanonical(spark, sfDir).collect()
      .map(r => r.getAs[String]("canonical") ->
        ((r.getAs[Long]("survivor_doc_id"), r.getAs[Long]("n_raw"),
          r.getAs[Long]("n_distinct_raw"), r.getAs[Long]("n_tracking"))))
      .toMap
    val expected = (0L until n).groupBy(_ / 4).flatMap { case (a, ids) =>
      val host = s"h${a % 7}.example.com"
      val plainMembers = ids.filter(i => i % 4 != 1)
      val paged = ids.filter(i => i % 4 == 1)
      val plain =
        if (plainMembers.isEmpty) Nil
        else Seq(s"https://$host/a/$a" ->
          ((plainMembers.min, plainMembers.size.toLong, plainMembers.size.toLong,
            plainMembers.count(_ % 4 == 3).toLong)))
      val page =
        if (paged.isEmpty) Nil
        else Seq(s"https://$host/a/$a?page=2" -> ((paged.min, 1L, 1L, 1L)))
      plain ++ page
    }
    assert(rows.keySet === expected.keySet)
    expected.foreach { case (c, e) => assert(rows(c) === e, c) }
  }

  test("q204 two-level rank equals the naive per-domain priority rank") {
    val rows = WebOpsQueries.crawlSchedule(spark, sfDir).collect()
    val naive = rows.groupBy(_.getAs[String]("domain")).toSeq.flatMap { case (_, rs) =>
      rs.sortBy(r => (-r.getAs[Long]("priority"), r.getAs[Long]("doc_id")))
        .zipWithIndex.map { case (r, i) => r.getAs[Long]("doc_id") -> (i + 1L) }
    }.toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("rank_in_domain") === naive(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("sched_ms") ===
        (r.getAs[Long]("rank_in_domain") - 1) * WebOpsQueries.PolitenessMs)
    }
    // priorities reproduce the affine family
    rows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val p = (Hashing.hashA(11) * d + Hashing.hashB(11)) % 1000000007L % 1000L
      assert(r.getAs[Long]("priority") === p)
    }
  }
}
