package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.TextFunctions._

/** Dictionary/gazetteer matching over a document corpus, re-expressing
  * the reference's city-matching pipeline Spark-first:
  *
  *  - `CityMatcher` FlashText automaton (city_matching/matcher.py:44)
  *    -> tokenize + broadcast hash join against the catalog. The
  *    automaton exists to scan one document against many keywords in
  *    one pass; in Spark the same effect is a codegen'd explode +
  *    broadcast join, embarrassingly parallel over documents, with the
  *    only shuffle keyed on doc_id for re-aggregation.
  *  - signal enrichment (city_matching/signals.py:24): title boost for
  *    matches in the leading token zone, admin-marker detection in a
  *    +-1-token window -> positional explode + element_at, no second
  *    join.
  *  - aggregation + primary selection (city_matching/aggregator.py:92,
  *    :193): per-(doc, keyword) score sums and the deterministic
  *    tie-break chain score -> admin markers -> title boost ->
  *    occurrences -> keyword id, as one window row_number.
  *
  * Scores are integer milli-units (the reference's 0.4/0.6 float
  * weights scaled by 1000) so aggregation is exact at any parallelism.
  */
object Gazetteer {

  /** (kwId, keyword, category, weightMilli) — the catalog plays the role
    * of the IBGE municipality gazetteer (data/municipios_br_v1.json). */
  val DefaultCatalog: Seq[(Int, String, String, Long)] = Seq(
    (1, "spark", "engine", 950L),
    (2, "join", "op", 900L),
    (3, "filter", "op", 850L),
    (4, "window", "op", 800L),
    (5, "stream", "mode", 750L),
    (6, "batch", "mode", 700L),
    (7, "merge", "op", 650L),
    (8, "sort", "op", 600L),
    (9, "agg", "op", 550L),
    (10, "query", "noun", 500L),
    (11, "table", "noun", 450L),
    (12, "scan", "op", 400L),
    (13, "hash", "op", 350L),
    (14, "group", "op", 300L))

  /** Modifier words whose adjacency boosts a match — the analog of the
    * reference's admin markers "prefeito/governador/..." near a city
    * name (signals.py:25 `_ADMIN_KEYWORDS`). */
  val AdminWords: Seq[String] = Seq("fast", "slow", "big", "small")

  val TitleZoneTokens = 5
  val TitleBoostMilli = 400L // signals.py:22 TITLE_BOOST_WEIGHT = 0.4
  val AdminMarkerMilli = 600L // signals.py:23 ADMIN_MARKER_WEIGHT = 0.6

  def catalog(s: SparkSession): DataFrame = {
    import s.implicits._
    DefaultCatalog.toDF("kw_id", "keyword", "category", "weight_milli")
  }

  /** Per-(doc, keyword) aggregated match payload: occurrences,
    * admin_markers, title_boost_sum, score_milli. */
  def matches(docs: DataFrame, cat: DataFrame, textCol: String, idCol: String): DataFrame = {
    val admin = AdminWords.map(x => x: Any)
    val toks = docs
      .select(col(idCol), tokens(fold(col(textCol))).as("toks"))
      .select(col(idCol), col("toks"), posexplode(col("toks")).as(Seq("pos", "tok")))
    // neighbors via 0-based get() (null-safe out of bounds); pos is 0-based
    val withSignals = toks
      .withColumn("admin_adj",
        coalesce(get(col("toks"), col("pos") + 1).isin(admin: _*), lit(false)) ||
          coalesce(get(col("toks"), col("pos") - 1).isin(admin: _*), lit(false)))
      .withColumn("in_title_zone", col("pos") < TitleZoneTokens)
      .drop("toks")
    withSignals
      .join(broadcast(cat), col("tok") === col("keyword"))
      .groupBy(col(idCol), col("kw_id"), col("keyword"), col("weight_milli"))
      .agg(
        count(lit(1)).as("occurrences"),
        sum(when(col("admin_adj"), 1L).otherwise(0L)).as("admin_markers"),
        sum(when(col("in_title_zone"), TitleBoostMilli).otherwise(0L)).as("title_boost_milli"))
      .withColumn("score_milli",
        col("occurrences") * col("weight_milli") +
          col("admin_markers") * AdminMarkerMilli + col("title_boost_milli"))
  }

  /** Primary keyword per document via the reference's tie-break chain
    * (aggregator.py:193 primary_city_selection). */
  def primary(matchesDf: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(
      col("score_milli").desc, col("admin_markers").desc,
      col("title_boost_milli").desc, col("occurrences").desc, col("kw_id"))
    matchesDf
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** The catalog as a DuckDB VALUES clause for oracle SQL. */
  def catalogValuesSql: String =
    DefaultCatalog
      .map { case (id, kw, cat, w) => s"($id, '$kw', '$cat', CAST($w AS BIGINT))" }
      .mkString("(VALUES ", ", ", ") AS catalog(kw_id, keyword, category, weight_milli)")

  def adminListSql: String = AdminWords.map(w => s"'$w'").mkString("(", ", ", ")")
}
