package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Parquet-backed article store — the Spark-native replacement for the
  * reference's MongoDB collection + index set
  * (infrastructure/repositories/article_indexes.py):
  *
  *  - unique (portal, url)      -> dedup-on-write (min-id per key)
  *  - (portal, published_at)    -> partitionBy(portal, pub_date):
  *       both listing predicates become partition PRUNING, the 100 TB
  *       equivalent of a b-tree range index
  *  - within-file ordering      -> sortWithinPartitions(published_at):
  *       parquet min/max page stats give row-group skipping
  *
  * Readers use `listByPeriod`, which mirrors
  * mongo_article_read_repository.list_by_period (portal + date range +
  * optional city containment) and relies on pruning, not scanning.
  */
object ArticleStore {

  /** Write a batch, deduplicating on (portal, url) within the batch. */
  def write(articles: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("portal_name"), col("url"))
    articles
      .withColumn("_rn", row_number().over(w.orderBy(col("published_at"))))
      .filter(col("_rn") === 1).drop("_rn")
      .withColumn("pub_date", col("published_at").cast("date"))
      .repartition(col("portal_name"), col("pub_date"))
      .sortWithinPartitions(col("published_at"))
      .write
      .partitionBy("portal_name", "pub_date")
      .mode(mode)
      .parquet(path)
  }

  def read(s: SparkSession, path: String): DataFrame = s.read.parquet(path)

  /** Date-range + portal listing (query_service.py list_articles). */
  def listByPeriod(s: SparkSession, path: String, portal: String,
                   startDate: String, endDate: String,
                   city: Option[String] = None): DataFrame = {
    val base = read(s, path)
      .filter(col("portal_name") === portal &&
        col("pub_date") >= lit(startDate).cast("date") &&
        col("pub_date") <= lit(endDate).cast("date"))
    val filtered = city match {
      case Some(c) => base.filter(array_contains(col("cities"), c))
      case None => base
    }
    filtered.orderBy(col("published_at"))
  }
}
