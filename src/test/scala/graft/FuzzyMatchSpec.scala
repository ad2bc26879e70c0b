package graft

import org.apache.spark.sql.functions._

import graft.queries.FuzzyMatchQueries

/** q239: fuzzy title matching — independent Levenshtein + blocking
  * transcription, plus the guaranteed-recall property for the
  * synthesized one-char-deleted re-posts. */
class FuzzyMatchSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def foldPrefix(t: String): String = {
    val hyphens = "-‐‑‒–—―"
    val noHyphen = t.map(c => if (hyphens.contains(c)) ' ' else c)
      .filterNot(_ == '­')
    val f = java.text.Normalizer.normalize(noHyphen, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}", "").toLowerCase
    f.substring(0, math.min(FuzzyMatchQueries.FzTitleLen, f.length))
  }

  test("q239 matches an independent blocking + Levenshtein transcription") {
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), foldPrefix(r.getString(1))))
    val reposts = base.collect { case (id, t) if id % 3 == 0 =>
      val p = (id % 20 + 2).toInt // keep first p chars, drop char p+1
      (id + 1000000L, t.substring(0, math.min(p, t.length)) +
        (if (t.length > p + 1) t.substring(p + 1) else ""))
    }
    val all = base ++ reposts
    val expect = (for {
      (ia, ta) <- all; (ib, tb) <- all
      if ia < ib
      if ta.take(2) == tb.take(2)
      // blocking: b probes blk(b)-1, blk(b), blk(b)+1 — pair visible iff
      // |blk(a) - blk(b)| <= 1
      if math.abs(ta.length / 4 - tb.length / 4) <= 1
      d = lev(ta, tb)
      if d > 0 && d <= FuzzyMatchQueries.FzMaxDist
    } yield (ia, ib) -> d.toLong).toMap
    val got = FuzzyMatchQueries.fuzzyTitles(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("dist")).toMap
    assert(got === expect)
    // guaranteed recall for the synthesized re-posts: every one pairs
    // with its original (edit past position 2, length change 1)
    reposts.foreach { case (rid, rt) =>
      val orig = rid - 1000000L
      val ot = base.find(_._1 == orig).get._2
      if (rt != ot) // a deletion inside the prefix really happened
        assert(got.contains((orig, rid)), s"repost of $orig missing")
    }
    assert(got.nonEmpty)
  }
}
