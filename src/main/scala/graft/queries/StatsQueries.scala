package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.functions.Money.cents

/** Distribution analytics with engine-exact numerics:
  *
  *  - q54: Pearson correlation computed from EXACT integer moments
  *    (n, Σx, Σy, Σxy, Σx², Σy² in integer units) with one final scalar
  *    expression. `corr()` builtins aggregate floats in partition
  *    order and are not cross-engine reproducible; integer moments
  *    are, and the closed-form final step is a fixed expression tree —
  *    bit-exact on both engines, at any parallelism.
  *  - q55: value histogram with integer bucket edges (floor division —
  *    no float boundary ambiguity).
  */
object StatsQueries {

  type Q = (SparkSession, String) => DataFrame

  def correlation(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("x"), // integer-valued
        // whole dollars: keeps sum(y*y) far from int64 overflow at any SF
        round(col("l_extendedprice")).cast("long").as("y"))
    li.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("corr_e6",
        round(lit(1000000.0) *
          (col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
          (sqrt(col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) *
            sqrt(col("n").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double")))).cast("long"))
      .select(col("l_returnflag"), col("n"), col("sx"), col("sy"), col("corr_e6"))
      .orderBy(col("l_returnflag"))
  }

  val correlationSql: String =
    """WITH b AS (SELECT l_returnflag,
      |    CAST(l_quantity AS BIGINT) AS x,
      |    CAST(ROUND(l_extendedprice) AS BIGINT) AS y
      |  FROM lineitem),
      |m AS (SELECT l_returnflag,
      |    COUNT(*) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x*y) AS BIGINT) AS sxy,
      |    CAST(SUM(x*x) AS BIGINT) AS sxx,
      |    CAST(SUM(y*y) AS BIGINT) AS syy
      |  FROM b GROUP BY l_returnflag)
      |SELECT l_returnflag, n, sx, sy,
      |  CAST(ROUND(1000000.0 *
      |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) AS BIGINT) AS corr_e6
      |FROM m ORDER BY l_returnflag""".stripMargin

  val BucketCents = 2000000L // $20k buckets

  def histogram(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("bucket", expr(s"CAST(ROUND(o_totalprice*100) AS BIGINT) div $BucketCents"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("bucket_cents"))
      .withColumn("bucket_lo_cents", col("bucket") * BucketCents)
      .select(col("bucket"), col("bucket_lo_cents"), col("n_orders"), col("bucket_cents"))
      .orderBy(col("bucket"))

  val histogramSql: String =
    s"""SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) // $BucketCents AS bucket,
       |  (CAST(ROUND(o_totalprice*100) AS BIGINT) // $BucketCents) * $BucketCents AS bucket_lo_cents,
       |  COUNT(*) AS n_orders,
       |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS bucket_cents
       |FROM orders
       |GROUP BY 1
       |ORDER BY bucket""".stripMargin

  val queries: Map[String, Q] = Map(
    "q54_correlation" -> (correlation _),
    "q55_histogram" -> (histogram _))

  val oracles: Map[String, String] = Map(
    "q54_correlation" -> correlationSql,
    "q55_histogram" -> histogramSql)
}
