package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.Tables
import graft.functions.Money.cents

/** q53: dataset profiling — the per-column audit (row counts, null
  * counts, exact ranges in integer cents, distinct counts) that gates
  * ingestion in a production pipeline. One scan, all columns profiled
  * in a single aggregate per column; emitted long-form (one row per
  * column) the way profilers report. */
object ProfileQueries {

  type Q = (SparkSession, String) => DataFrame

  private val Profiled = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def profile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    def one(c: String): DataFrame =
      li.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        min(cents(col(c))).as("min_cents"),
        max(cents(col(c))).as("max_cents"),
        countDistinct(cents(col(c))).as("n_distinct"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
          col("min_cents"), col("max_cents"), col("n_distinct"))
    Profiled.map(one).reduce(_.unionByName(_)).orderBy(col("column_name"))
  }

  val profileSql: String = {
    val selects = Profiled.map { c =>
      s"""SELECT '$c' AS column_name,
         |  COUNT(*) AS n_rows,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  MIN(CAST(ROUND($c*100) AS BIGINT)) AS min_cents,
         |  MAX(CAST(ROUND($c*100) AS BIGINT)) AS max_cents,
         |  COUNT(DISTINCT CAST(ROUND($c*100) AS BIGINT)) AS n_distinct
         |FROM lineitem""".stripMargin
    }
    selects.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  val queries: Map[String, Q] = Map("q53_profile" -> (profile _))
  val oracles: Map[String, String] = Map("q53_profile" -> profileSql)
}
