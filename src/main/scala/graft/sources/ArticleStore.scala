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

  /** The city secondary index lives NEXT TO the article store (the
    * analog of article_indexes.py's (city, published_at) index): an
    * exploded city -> (portal, pub_date, url, published_at) projection,
    * partitioned by city then pub_date so a city-filtered listing is
    * partition PRUNING — without it, "articles mentioning city X" is a
    * full corpus scan with an array_contains filter. */
  def cityIndexPath(path: String): String = path + "_city_index"

  /** Write a batch, deduplicating on (portal, url) within the batch.
    * Also writes the exploded city index projection. */
  def write(articles: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("portal_name"), col("url"))
    val deduped = articles
      .withColumn("_rn", row_number().over(w.orderBy(col("published_at"))))
      .filter(col("_rn") === 1).drop("_rn")
      .withColumn("pub_date", col("published_at").cast("date"))
    deduped
      .repartition(col("portal_name"), col("pub_date"))
      .sortWithinPartitions(col("published_at"))
      .write
      .partitionBy("portal_name", "pub_date")
      .mode(mode)
      .parquet(path)
    deduped
      .select(explode(col("cities")).as("city"), col("portal_name"),
        col("pub_date"), col("url"), col("published_at"))
      .repartition(col("city"), col("pub_date"))
      .sortWithinPartitions(col("published_at"))
      .write
      .partitionBy("city", "pub_date")
      .mode(mode)
      .parquet(cityIndexPath(path))
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

  /** City + date-range listing via the secondary index — both
    * predicates become partition pruning on the index projection
    * (mongo's (city, published_at) b-tree, re-expressed). Returns the
    * covering projection (city, portal_name, pub_date, url,
    * published_at); join back on (portal_name, url) for full rows. */
  def listByCity(s: SparkSession, path: String, city: String,
                 startDate: String, endDate: String): DataFrame =
    s.read.parquet(cityIndexPath(path))
      .filter(col("city") === city &&
        col("pub_date") >= lit(startDate).cast("date") &&
        col("pub_date") <= lit(endDate).cast("date"))
      .orderBy(col("published_at"))

  /** Full-row city listing: prune via the index, then a semi join back
    * to the store on the unique (portal_name, url) key. */
  def listArticlesByCity(s: SparkSession, path: String, city: String,
                         startDate: String, endDate: String): DataFrame = {
    val idx = listByCity(s, path, city, startDate, endDate)
      .select(col("portal_name"), col("url"))
    read(s, path)
      .join(idx, Seq("portal_name", "url"), "left_semi")
      .orderBy(col("published_at"))
  }
}
