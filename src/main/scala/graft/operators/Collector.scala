package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pagination-driven collection — `collect_all_for_portal`
  * (application/servico_coleta_noticias.py: walk listing pages until a
  * page contributes nothing new, bounded by max_pages).
  *
  * Pagination is inherently sequential (page N+1's existence depends
  * on page N), so the LOOP lives on the driver — but each page payload
  * is a distributed DataFrame and the new-vs-seen check is a
  * distributed anti-join; nothing row-level ever touches the driver.
  *
  * Each page is FETCHED EXACTLY ONCE: the fetch is eagerly
  * materialized before anything consumes it, the fresh rows are
  * materialized once before being counted and buffered, and the seen
  * key set is re-checkpointed per page so its lineage never re-executes
  * earlier fetches. (The naive form — an iterative union re-evaluated
  * by every later page's count and anti-join — re-fetches O(P^2) pages
  * against the remote portal.)
  */
object Collector {

  /** Result of a collection sweep. */
  final case class Sweep(articles: DataFrame, pagesFetched: Int, totalNew: Long)

  /** Fetch pages `startPage..` until one adds no new keys (or maxPages).
    *
    * @param fetchPage  page number -> raw article DataFrame (empty DF
    *                   when the portal has no such page)
    * @param keyCols    identity columns (the (portal_name, url) index)
    */
  def collectAll(fetchPage: Int => DataFrame, keyCols: Seq[String],
                 startPage: Int = 1, maxPages: Int = 100): Sweep = {
    val fresh = mutable.Buffer.empty[DataFrame]
    var seenKeys: Option[DataFrame] = None
    var page = startPage
    var totalNew = 0L
    var done = false
    while (!done && fresh.size < maxPages) {
      // materialize the fetch once; every later use reads the checkpoint
      val batch = fetchPage(page).localCheckpoint(true)
      val newRows = (seenKeys match {
        case Some(k) => batch.join(k, keyCols, "left_anti")
        case None => batch
      }).localCheckpoint(true)
      // the same count the reference logs as "N novas" — served from the
      // materialized checkpoint, no recompute
      val nNew = newRows.count()
      if (nNew == 0) done = true
      else {
        fresh += newRows
        totalNew += nNew
        val pageKeys = newRows.select(keyCols.map(col): _*).distinct()
        seenKeys = Some((seenKeys match {
          case Some(k) => k.unionByName(pageKeys)
          case None => pageKeys
        }).localCheckpoint(true)) // truncate lineage every page
        page += 1
      }
    }
    val out = fresh.reduceOption(_.unionByName(_))
      .getOrElse(fetchPage(startPage).limit(0))
    Sweep(out, fresh.size, totalNew)
  }
}
