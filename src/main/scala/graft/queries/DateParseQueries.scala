package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.Tables

/** q48: locale-free Brazilian date parsing — the scraper's
  * `%d de %B de %Y` handling (infrastructure/scraper.py:579: inject
  * the numeric month for the Portuguese name, then parse numerically,
  * so no OS locale dependency). Surfaces are synthesized from
  * o_orderdate, parsed back, and must round-trip. */
object DateParseQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Month number -> Portuguese name (scraper.py:581). */
  val PtMonths: Seq[(Int, String)] = Seq(
    1 -> "janeiro", 2 -> "fevereiro", 3 -> "março", 4 -> "abril",
    5 -> "maio", 6 -> "junho", 7 -> "julho", 8 -> "agosto",
    9 -> "setembro", 10 -> "outubro", 11 -> "novembro", 12 -> "dezembro")

  private def monthName(m: Column): Column =
    PtMonths.tail.foldLeft(when(m === 1, PtMonths.head._2)) {
      case (acc, (n, name)) => acc.when(m === n, name)
    }

  private def monthNum(name: Column): Column =
    PtMonths.tail.foldLeft(when(name === PtMonths.head._2, 1)) {
      case (acc, (n, nm)) => acc.when(name === nm, n)
    }

  def dateParse(s: SparkSession, dir: String): DataFrame = {
    val surfaced = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"))
      .withColumn("surface",
        concat(dayofmonth(col("d")), lit(" de "), monthName(month(col("d"))),
          lit(" de "), year(col("d"))))
    // parse path: extract (day, monthname, year), inject numeric month
    surfaced
      .withColumn("p_day", regexp_extract(col("surface"), "^(\\d+) de ", 1).cast("int"))
      .withColumn("p_mon", monthNum(regexp_extract(col("surface"), " de ([^ ]+) de ", 1)))
      .withColumn("p_year", regexp_extract(col("surface"), " de (\\d+)$", 1).cast("int"))
      .withColumn("parsed", make_date(col("p_year"), col("p_mon"), col("p_day")))
      .withColumn("roundtrip_ok", col("parsed") === col("d"))
      .select(col("o_orderkey"), col("surface"), col("parsed"), col("roundtrip_ok"))
      .orderBy(col("o_orderkey"))
  }

  val dateParseSql: String = {
    val nameCase = PtMonths
      .map { case (n, nm) => s"WHEN $n THEN '$nm'" }.mkString(" ")
    val numCase = PtMonths
      .map { case (n, nm) => s"WHEN '$nm' THEN $n" }.mkString(" ")
    s"""WITH surfaced AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
       |    CAST(day(o_orderdate) AS VARCHAR) || ' de ' ||
       |    (CASE month(o_orderdate) $nameCase END) || ' de ' ||
       |    CAST(year(o_orderdate) AS VARCHAR) AS surface
       |  FROM orders),
       |parsed AS (SELECT o_orderkey, d, surface,
       |    make_date(
       |      CAST(regexp_extract(surface, ' de (\\d+)$$', 1) AS INT),
       |      CASE regexp_extract(surface, ' de ([^ ]+) de ', 1) $numCase END,
       |      CAST(regexp_extract(surface, '^(\\d+) de ', 1) AS INT)) AS parsed
       |  FROM surfaced)
       |SELECT o_orderkey, surface, parsed, parsed = d AS roundtrip_ok
       |FROM parsed ORDER BY o_orderkey""".stripMargin
  }

  val queries: Map[String, Q] = Map("q48_date_parse" -> (dateParse _))
  val oracles: Map[String, String] = Map("q48_date_parse" -> dateParseSql)
}
