package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.Tables
import graft.functions.TextFunctions.fold
import graft.operators.Dedup

/** Content-defined chunking (CDC) — the shift-robust storage-dedup
  * primitive (Rabin-fingerprint boundaries, Muthitacharoen et al.,
  * LBFS SOSP'01; the FastCDC/restic/borg family). The reference dedups
  * whole articles on ingest (servico_coleta_noticias.py — exact url
  * identity); q21 hashes whole documents, q126 dedups on LINE
  * boundaries, q147 on fixed n-grams. CDC completes the family with
  * boundaries chosen by the CONTENT itself: a rolling hash over the
  * last `CdcWindow` chars cuts wherever `H % CdcDivisor == 0`, so an
  * insertion early in a document shifts only the chunk it lands in —
  * every later boundary re-synchronizes, and the unchanged tail
  * re-deduplicates. Fixed-size blocks lose ALL alignment after one
  * insertion; that is precisely why storage dedup is content-defined.
  */
object CdcQueries {

  type Q = (SparkSession, String) => DataFrame

  private val FoldSql =
    "lower(strip_accents(translate(text, '-‐‑‒–—―­', '       ')))"

  /** Rolling-hash parameters. Window 8 chars; polynomial base 131 mod
    * the prime 1048573 (< 2^20, so an 8-term sum of code*pow products
    * stays far inside int64); boundary wherever H % 64 == 0 → expected
    * chunk length 64 + the window, i.e. several chunks per ~300-char
    * document. All integer, so both engines compute identical cuts. */
  val CdcWindow = 8
  val CdcMod = 1048573L
  val CdcBase = 131L
  val CdcDivisor = 64L

  /** B^0..B^(W-1) mod M — the single source of truth for BOTH the
    * Spark columns and the DuckDB oracle literals. */
  val CdcPows: Seq[Long] =
    Iterator.iterate(1L)(p => p * CdcBase % CdcMod).take(CdcWindow).toSeq

  /** Chunk array column — the native one-pass chunker (rolling hash,
    * boundary test and substring split in one loop; see
    * expressions/CdcChunks.scala — the HOF fold it replaced ran
    * interpreted per character). */
  def cdcChunksCol(s: Column): Column =
    org.apache.spark.sql.GraftInternals.column(
      graft.expressions.CdcChunks(
        org.apache.spark.sql.GraftInternals.expression(s),
        CdcWindow, CdcPows, CdcMod, CdcDivisor))

  private def hashAtSql: String =
    "(" + CdcPows.zipWithIndex.map { case (p, j) =>
      s"cs[CAST(i - $j AS INT)] * $p"
    }.mkString(" + ") + s") % $CdcMod"

  // ---- q181: CDC chunk dedup accounting ----

  /** q181: per-document chunk table + corpus-wide chunk-occurrence
    * dedup. Boundaries are all end-positions i in [W, len) whose
    * rolling hash divides; chunks are the spans between consecutive
    * boundaries (plus the head and tail). A chunk is duplicated when
    * its md5 occurs >= 2 times ANYWHERE (a second copy inside the same
    * document is just as dedupable as one in another document). Per
    * doc: chunk count, max/mean chunk length, duplicated-chunk count
    * and char share.
    *
    * Scale shape: boundary detection and chunking are map-side column
    * math (no shuffle); the only aggregations are the chunk-hash df
    * count (keys are md5 values — maximally spread, no skew) and the
    * per-doc rollup (doc_id keyed). The chunk table is staged once and
    * feeds both, the q91 gram-df shape. At 100 TB the chunk-hash agg
    * IS the storage-dedup index build; nothing here is quadratic. */
  /** The (doc_id, len, clen, h) chunk table of a document set —
    * map-side chunking via the native expression. */
  def chunkTable(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), fold(col(textCol)).as("s"))
      .withColumn("len", length(col("s")).cast("long"))
      .filter(col("len") > 0)
      .select(col("doc_id"), col("len"),
        explode(cdcChunksCol(col("s"))).as("chunk"))
      .select(col("doc_id"), col("len"),
        length(col("chunk")).cast("long").as("clen"),
        md5(col("chunk")).as("h"))

  /** q181's audit over a chunk table: the md5-keyed occurrence count
    * plus the per-doc dedup rollup — shared with the streaming fold
    * (StreamingCdcDedup replays to exactly this). */
  def chunkAudit(chunks0: DataFrame): DataFrame = {
    val chunks = Dedup.stage(chunks0)
    val df = chunks.groupBy(col("h")).agg(count(lit(1)).as("df"))
    chunks.join(df, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(
        max(col("len")).as("n_chars"),
        count(lit(1)).as("n_chunks"),
        max(col("clen")).as("max_chunk_len"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("dup_chunks"),
        sum(when(col("df") >= 2, col("clen")).otherwise(0L)).as("dup_chars"))
      .withColumn("mean_chunk_len_milli", expr("n_chars * 1000 div n_chunks"))
      .withColumn("dup_share_e6", expr("dup_chars * 1000000 div n_chars"))
      .select(col("doc_id"), col("n_chars"), col("n_chunks"),
        col("max_chunk_len"), col("mean_chunk_len_milli"),
        col("dup_chunks"), col("dup_chars"), col("dup_share_e6"))
      .orderBy(col("doc_id"))
  }

  def cdcChunks(s: SparkSession, dir: String): DataFrame =
    chunkAudit(chunkTable(Tables.documents(s, dir), "text", "doc_id"))

  val cdcChunksSql: String =
    s"""WITH d AS (SELECT doc_id, $FoldSql AS s FROM documents),
       |base AS (SELECT doc_id, s, CAST(length(s) AS BIGINT) AS len
       |  FROM d WHERE length(s) > 0),
       |codes AS (SELECT doc_id, s, len,
       |    list_transform(range(1, CAST(len AS INT) + 1),
       |      i -> CAST(ascii(substr(s, CAST(i AS INT), 1)) AS BIGINT)) AS cs
       |  FROM base),
       |bnd AS (SELECT doc_id, s, len,
       |    list_filter(range($CdcWindow, len + 1),
       |      i -> i < len AND ($hashAtSql) % $CdcDivisor = 0) AS bs
       |  FROM codes),
       |lists AS (SELECT doc_id, s, len,
       |    list_prepend(CAST(0 AS BIGINT), bs) AS st,
       |    list_append(bs, len) AS en
       |  FROM bnd),
       |seg AS (SELECT doc_id, s, len,
       |    unnest(st) AS cst, unnest(en) AS cen
       |  FROM lists),
       |chunk AS (SELECT doc_id, len, cen - cst AS clen,
       |    md5(substr(s, CAST(cst AS INT) + 1, CAST(cen - cst AS INT))) AS h
       |  FROM seg),
       |df AS (SELECT h, COUNT(*) AS df FROM chunk GROUP BY h)
       |SELECT doc_id,
       |  MAX(len) AS n_chars,
       |  COUNT(*) AS n_chunks,
       |  CAST(MAX(clen) AS BIGINT) AS max_chunk_len,
       |  MAX(len) * 1000 // COUNT(*) AS mean_chunk_len_milli,
       |  CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
       |  CAST(SUM(CASE WHEN df.df >= 2 THEN clen ELSE 0 END) AS BIGINT) AS dup_chars,
       |  CAST(SUM(CASE WHEN df.df >= 2 THEN clen ELSE 0 END) AS BIGINT) * 1000000
       |    // MAX(len) AS dup_share_e6
       |FROM chunk JOIN df USING (h)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q181_cdc_chunks" -> (cdcChunks _))

  val oracles: Map[String, String] = Map(
    "q181_cdc_chunks" -> cdcChunksSql)
}
