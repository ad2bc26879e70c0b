package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.functions.Money.cents
import graft.functions.TextFunctions._
import graft.plans.Plans

/** q46: character-n-gram language identification (the classic
  * trigram-profile heuristic — complements q17's stopword profile) and
  * q47: the custom TopKPerKey physical operator run inside the
  * correctness gate. */
object LangNgramQueries {

  type Q = (SparkSession, String) => DataFrame

  /** (lang, trigram) profiles — tiny literal catalogs, broadcast. */
  val TrigramProfiles: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "ing", "en" -> "and", "en" -> "ion", "en" -> "ter",
    "de" -> "sch", "de" -> "der", "de" -> "ein", "de" -> "ich", "de" -> "und",
    "es" -> "que", "es" -> "los", "es" -> "ent", "es" -> "ado", "es" -> "cio",
    "pt" -> "cao", "pt" -> "nho", "pt" -> "ada", "pt" -> "ent", "pt" -> "dos")

  def langIdNgram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val prof = TrigramProfiles.toDF("cand_lang", "tri")
    val docs = Tables.documents(s, dir)
    // char trigrams of the folded text via positional substring
    // build the trigram array in one expression, then explode small
    // strings — exploding per-char rows would duplicate the full
    // folded text into every row
    val grams = docs
      .select(col("doc_id"), fold(col("text")).as("f"))
      .select(col("doc_id"),
        explode(expr(
          "CASE WHEN length(f) >= 3 THEN transform(sequence(1, length(f) - 2), i -> substring(f, i, 3)) ELSE array() END"))
          .as("tri"))
    val hits = grams
      .join(broadcast(prof), Seq("tri"))
      .groupBy(col("doc_id"), col("cand_lang"))
      .agg(count(lit(1)).as("hits"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("hits").desc, col("cand_lang"))
    val picked = hits.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    docs.select(col("doc_id"))
      .join(picked.select(col("doc_id"), col("cand_lang"), col("hits")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cand_lang"), lit("und")).as("lang_pred"),
        coalesce(col("hits"), lit(0L)).as("tri_hits"))
      .orderBy(col("doc_id"))
  }

  val langIdNgramSql: String = {
    val fold = "lower(strip_accents(translate(text, '-‐‑‒–—―­', '       ')))"
    val values = TrigramProfiles.map { case (l, t) => s"('$l', '$t')" }.mkString(", ")
    s"""WITH prof(cand_lang, tri) AS (VALUES $values),
       |f AS (SELECT doc_id, $fold AS f FROM documents),
       |grams AS (SELECT doc_id, substring(f, i, 3) AS tri
       |  FROM (SELECT doc_id, f, generate_subscripts(string_split(f, ''), 1) AS i,
       |               unnest(string_split(f, '')) AS ch
       |        FROM f)
       |  WHERE i + 3 <= length(f) + 1),
       |hits AS (SELECT doc_id, cand_lang, COUNT(*) AS hits
       |  FROM grams JOIN prof USING (tri) GROUP BY doc_id, cand_lang),
       |picked AS (SELECT doc_id, cand_lang, hits,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang) AS rn
       |  FROM hits)
       |SELECT d.doc_id,
       |  coalesce(p.cand_lang, 'und') AS lang_pred,
       |  coalesce(p.hits, 0) AS tri_hits
       |FROM documents d LEFT JOIN (SELECT * FROM picked WHERE rn = 1) p USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** q47: top-5 orders per market segment executed by the custom
    * TopKPerKeyExec (bounded heaps, no partition sort) — identical
    * rows to the window formulation, so the standard SQL oracles it. */
  def topkCustom(s: SparkSession, dir: String): DataFrame = {
    val joined = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .withColumn("total_cents", cents(col("o_totalprice")))
    Plans.topKPerKey(joined,
      Seq(joined("c_mktsegment")),
      Seq((joined("total_cents"), true), (joined("o_orderkey"), false)), 5)
      .select(col("c_mktsegment"), col("o_orderkey"), col("total_cents"))
      .orderBy(col("c_mktsegment"), col("total_cents").desc, col("o_orderkey"))
  }

  val topkCustomSql: String =
    """SELECT c_mktsegment, o_orderkey, total_cents FROM (
      |  SELECT c_mktsegment, o_orderkey,
      |    CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_cents,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |      ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT) DESC, o_orderkey) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |WHERE rn <= 5
      |ORDER BY c_mktsegment, total_cents DESC, o_orderkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q46_lang_id_ngram" -> (langIdNgram _),
    "q47_topk_custom" -> (topkCustom _))

  val oracles: Map[String, String] = Map(
    "q46_lang_id_ngram" -> langIdNgramSql,
    "q47_topk_custom" -> topkCustomSql)
}
