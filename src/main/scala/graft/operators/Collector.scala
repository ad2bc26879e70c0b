package graft.operators

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
    var seen: Option[DataFrame] = None
    var page = startPage
    var pages = 0
    var done = false
    while (!done && pages < maxPages) {
      val batch = fetchPage(page)
      val fresh = seen match {
        case Some(s) => batch.join(s.select(keyCols.map(col): _*).distinct(),
          keyCols, "left_anti")
        case None => batch
      }
      // one small action per page decides loop continuation — the same
      // count the reference logs as "N novas"
      val nNew = fresh.count()
      if (nNew == 0) done = true
      else {
        seen = Some(seen.map(_.unionByName(fresh)).getOrElse(fresh))
        pages += 1
        page += 1
      }
    }
    val out = seen.getOrElse(fetchPage(startPage).limit(0))
    Sweep(out, pages, seen.map(_ => out.count()).getOrElse(0L))
  }
}
