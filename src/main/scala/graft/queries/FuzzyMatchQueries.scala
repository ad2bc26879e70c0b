package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.functions.TextFunctions.fold

/** q239: fuzzy title matching by bounded edit distance — the
  * entity-resolution grain the dedup family did not yet hold: q21
  * demands byte equality, q22/q23 measure set overlap, q233 vector
  * angle; edit distance catches the one-typo re-post (a dropped
  * letter, a transposed pair) that none of those see as close.
  */
object FuzzyMatchQueries {

  type Q = (SparkSession, String) => DataFrame

  val FzTitleLen = 40
  val FzMaxDist = 2L

  /** q239: near-identical "titles" (the folded 40-char prefix) within
    * edit distance [[FzMaxDist]], over the originals PLUS synthesized
    * one-char-deleted re-posts (every third document re-appears with
    * the character at position doc_id%20+3 dropped — the q93 synthesis
    * pattern; ids offset by 10^6). Candidates come from deterministic
    * BLOCKING — same (length-div-4 bucket, first two chars): two
    * strings within edit distance 2 differ in length by at most 2
    * (adjacent length buckets are probed) and a same-prefix block is
    * the standard cheap key for title typos (a PREFIX typo escapes the
    * block — the documented recall contract of blocking, exactly as
    * LSH bands carry a miss probability; the synthesized edits sit
    * past position 2, so for THEM recall is complete and gate-checked).
    * Verdicts use the built-in Levenshtein — unit-cost edit distance
    * with the SAME definition on both engines, exact integers.
    *
    * Shape: blocking keys are map-side; candidate pairs form only
    * inside (block, prefix) buckets; the quadratic is bounded by
    * bucket size like every dedup bucket join. */
  def fuzzyTitles(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), substring(fold(col("text")), 1, FzTitleLen).as("title"))
    val reposts = base.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        expr(s"concat(substring(title, 1, CAST(doc_id % 20 + 2 AS INT)), " +
          s"substring(title, CAST(doc_id % 20 + 4 AS INT), $FzTitleLen))").as("title"))
    val titles = base.unionByName(reposts)
      .withColumn("tlen", length(col("title")))
      .withColumn("pfx", substring(col("title"), 1, 2))
    val a = titles.select(col("pfx"), expr("tlen div 4").as("blk"),
      col("doc_id").as("doc_a"), col("title").as("title_a"))
    // probe own and adjacent length blocks so a +-2 length change stays visible
    val b = titles
      .select(col("pfx"), col("tlen"), col("doc_id").as("doc_b"), col("title").as("title_b"))
      .withColumn("blk", explode(expr("array(tlen div 4 - 1, tlen div 4, tlen div 4 + 1)")))
    a.join(b, Seq("pfx", "blk"))
      .filter(col("doc_a") < col("doc_b"))
      // necessary conditions first (codegen'd, cheap), then the BANDED
      // threshold Levenshtein — O(k*n) early-exit instead of the full
      // O(n^2) DP per candidate (returns -1 above the threshold)
      .filter(abs(length(col("title_a")) - length(col("title_b"))) <= FzMaxDist)
      .filter(col("title_a") =!= col("title_b"))
      .withColumn("dist",
        levenshtein(col("title_a"), col("title_b"), FzMaxDist.toInt).cast("long"))
      .filter(col("dist") > 0)
      .select(col("doc_a"), col("doc_b"), col("dist"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val fuzzyTitlesSql: String = {
    val foldSql = "lower(strip_accents(translate(text, '-‐‑‒–—―­', '       ')))"
    s"""WITH t0 AS (SELECT doc_id, substr($foldSql, 1, $FzTitleLen) AS title FROM documents),
       |t AS (SELECT doc_id, title FROM t0
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id,
       |    substr(title, 1, CAST(doc_id % 20 + 2 AS INT)) ||
       |      substr(title, CAST(doc_id % 20 + 4 AS INT), $FzTitleLen) AS title
       |  FROM t0 WHERE doc_id % 3 = 0),
       |k AS (SELECT doc_id, title, length(title) AS tlen,
       |    substr(title, 1, 2) AS pfx FROM t),
       |a AS (SELECT pfx, tlen // 4 AS blk, doc_id AS doc_a, title AS title_a FROM k),
       |b AS (SELECT pfx, u.blk, doc_id AS doc_b, title AS title_b
       |  FROM k, UNNEST([tlen // 4 - 1, tlen // 4, tlen // 4 + 1]) AS u(blk))
       |SELECT DISTINCT a.doc_a, b.doc_b,
       |  CAST(levenshtein(a.title_a, b.title_b) AS BIGINT) AS dist
       |FROM a JOIN b ON a.pfx = b.pfx AND a.blk = b.blk AND a.doc_a < b.doc_b
       |WHERE levenshtein(a.title_a, b.title_b) <= $FzMaxDist
       |  AND levenshtein(a.title_a, b.title_b) > 0
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q239_fuzzy_titles" -> (fuzzyTitles _))

  val oracles: Map[String, String] = Map(
    "q239_fuzzy_titles" -> fuzzyTitlesSql)
}
