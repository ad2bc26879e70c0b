package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Portal-configuration catalog — the registration surface of the
  * reference (domain/entities/portal.py, servico_registro_portal.py,
  * `register-portal <file.json>`): portals with base URL, a listing
  * path template, per-field CSS selectors and optional headers.
  *
  * Spark-native form: configs are a JSON dataset read with an explicit
  * schema (never inferred — schema drift in config files must fail
  * loudly, not silently re-type a column), plus a validation pass that
  * yields per-row violations the way the registration service rejects
  * bad payloads. The catalog is tiny and broadcast-joins against
  * collected pages.
  */
object PortalCatalog {

  val selectorType: StructType = StructType(Seq(
    StructField("query", StringType),
    StructField("attribute", StringType)))

  val schema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("base_url", StringType),
    StructField("listing_path_template", StringType),
    StructField("date_format", StringType),
    StructField("headers", MapType(StringType, StringType)),
    StructField("selectors", StructType(Seq(
      StructField("listing_article", selectorType),
      StructField("listing_title", selectorType),
      StructField("listing_url", selectorType),
      StructField("listing_summary", selectorType),
      StructField("article_content", selectorType),
      StructField("article_date", selectorType))))))

  /** Load portal configs (one JSON object per file or per line). */
  def load(s: SparkSession, path: String): DataFrame =
    s.read.schema(schema).option("multiLine", "true").json(path)
      .withColumn("date_format", coalesce(col("date_format"), lit("%Y-%m-%d")))

  /** Registration-service validation (servico_registro_portal.py):
    * required identity fields, a '{date}' or '{page}' slot in the
    * listing template, and the selectors collection must name at least
    * the article content. Returns (portal row, violations array). */
  def validate(portals: DataFrame): DataFrame = {
    def violation(cond: org.apache.spark.sql.Column, msg: String) =
      when(cond, msg)
    portals.withColumn("violations",
      filter(
        array(
          violation(col("name").isNull || trim(col("name")) === "", "missing name"),
          violation(col("base_url").isNull || !col("base_url").rlike("^https?://"),
            "base_url must be http(s)"),
          violation(col("listing_path_template").isNull ||
            !(col("listing_path_template").contains("{date}") ||
              col("listing_path_template").contains("{page}")),
            "listing_path_template needs {date} or {page}"),
          violation(col("selectors").isNull || col("selectors.article_content.query").isNull,
            "selectors.article_content required")),
        v => v.isNotNull))
      .withColumn("is_valid", size(col("violations")) === 0)
  }

  /** Listing URL for a date — Portal.listing_url_for, as a column expr
    * (template fill + slash normalization). */
  def listingUrlFor(portals: DataFrame, dateStr: String): DataFrame =
    portals.withColumn("listing_url",
      concat(
        regexp_replace(col("base_url"), "/+$", ""),
        lit("/"),
        regexp_replace(
          regexp_replace(col("listing_path_template"), "\\{date\\}", dateStr),
          "^/+", "")))

  /** The scraper's malformed-CSS-selector auto-repair
    * (scraper.py:522-554 `_normalize_selector_query`): a single
    * left-to-right char fold tracking open-quote state and bracket
    * balance — an unclosed quote is closed (before a `]` if one
    * follows, else at the end), and missing closing brackets are
    * appended. A native codegen'd expression
    * (graft.expressions.RepairSelector) — the former higher-order
    * `aggregate` struct-accumulator fold was CodegenFallback,
    * interpreted per char per row, and made q92 a bench hotspot on a
    * map-only query. */
  def repairSelectorQuery(query: Column): Column =
    graft.functions.GraftFunctions.repairSelector(query)
}
