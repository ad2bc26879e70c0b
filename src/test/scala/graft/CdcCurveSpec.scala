package graft

import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.fold
import graft.queries.CdcQueries

/** q254: the CDC chunk-geometry curve. The engine derives every arm
  * from ONE finest-grain chunking (CdcChunksMeta residues + per-arm
  * merge); the spec's reference path chunks each arm DIRECTLY with
  * its own CdcChunks pass and recomputes the full rollup row — if the
  * nesting/merge reconstruction is wrong anywhere, some arm's row
  * differs. Plus the structural pins: chunk counts monotone in the
  * divisor, total chars invariant, and the 64 arm reconciling with
  * q181's per-doc audit. */
class CdcCurveSpec extends SparkSpec {

  private def directArm(d: Long) = {
    val chunkCol = GraftInternals.column(
      graft.expressions.CdcChunks(
        GraftInternals.expression(fold(col("text"))),
        CdcQueries.CdcWindow, CdcQueries.CdcPows, CdcQueries.CdcMod, d))
    val chunks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(chunkCol).as("chunk"))
      .select(length(col("chunk")).cast("long").as("clen"),
        md5(col("chunk")).as("h"))
    val dfreq = chunks.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val r = chunks.join(dfreq, Seq("h"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("clen")).as("n_chars"),
        max(col("clen")).as("max_chunk_len"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("dup_chunks"),
        sum(when(col("df") >= 2, col("clen")).otherwise(0L)).as("dup_chars"))
      .head()
    val idx = dfreq.count()
    (r.getAs[Long]("n_chunks"), idx, r.getAs[Long]("n_chars"),
      r.getAs[Long]("max_chunk_len"), r.getAs[Long]("dup_chunks"),
      r.getAs[Long]("dup_chars"))
  }

  test("every arm's rollup equals an independent direct chunking at that divisor") {
    val out = CdcQueries.cdcCurve(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("divisor")).toSeq == CdcQueries.CdcCurveArms)
    out.foreach { row =>
      val d = row.getAs[Long]("divisor")
      val (nc, idx, chars, mx, dupC, dupCh) = directArm(d)
      assert(row.getAs[Long]("n_chunks") == nc, s"n_chunks @ $d")
      assert(row.getAs[Long]("index_rows") == idx, s"index_rows @ $d")
      assert(row.getAs[Long]("n_chars") == chars, s"n_chars @ $d")
      assert(row.getAs[Long]("max_chunk_len") == mx, s"max_chunk_len @ $d")
      assert(row.getAs[Long]("dup_chunks") == dupC, s"dup_chunks @ $d")
      assert(row.getAs[Long]("dup_chars") == dupCh, s"dup_chars @ $d")
      assert(row.getAs[Long]("mean_chunk_len_milli") == chars * 1000 / nc)
      assert(row.getAs[Long]("dup_share_e6") == dupCh * 1000000L / chars)
    }

    // structural pins: coarser divisors merge cuts (chunk count
    // monotone non-increasing), chunking never loses characters
    // (n_chars arm-invariant), the index never exceeds the chunk
    // count, and the curve actually moves (finest != coarsest)
    val byD = out.sortBy(_.getAs[Long]("divisor"))
    byD.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_chunks") >= b.getAs[Long]("n_chunks"))
      assert(a.getAs[Long]("n_chars") == b.getAs[Long]("n_chars"))
    }
    byD.foreach(r =>
      assert(r.getAs[Long]("index_rows") <= r.getAs[Long]("n_chunks")))
    assert(byD.head.getAs[Long]("n_chunks") > byD.last.getAs[Long]("n_chunks"))
  }

  test("the shipped 64 arm reconciles with q181's per-doc audit") {
    val arm64 = CdcQueries.cdcCurve(spark, sfDir)
      .filter(col("divisor") === CdcQueries.CdcDivisor).head()
    val audit = CdcQueries.cdcChunks(spark, sfDir)
      .agg(sum(col("n_chunks")).as("n_chunks"),
        sum(col("dup_chunks")).as("dup_chunks"),
        sum(col("dup_chars")).as("dup_chars"),
        max(col("max_chunk_len")).as("max_chunk_len")).head()
    assert(arm64.getAs[Long]("n_chunks") == audit.getAs[Long]("n_chunks"))
    assert(arm64.getAs[Long]("dup_chunks") == audit.getAs[Long]("dup_chunks"))
    assert(arm64.getAs[Long]("dup_chars") == audit.getAs[Long]("dup_chars"))
    assert(arm64.getAs[Long]("max_chunk_len") == audit.getAs[Long]("max_chunk_len"))
  }

  test("empty-after-fold docs are excluded from every arm (the q181/oracle rule)") {
    // the gate corpora carry no empty documents, so this pins the
    // r14 ADVICE fix directly: without the length(fold) > 0 gate an
    // empty doc seeds one md5('') chunk into EVERY arm (CdcChunksMeta
    // returns a single empty chunk for ''), silently diverging from
    // the q254 oracle and q181's chunkTable on any corpus containing
    // one
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_empty").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s0", 45L),
      (2L, "", "en", "s0", 0L), // empty: must contribute NO chunks
      (3L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s0", 45L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CdcQueries.cdcCurve(spark, dir).collect()
    assert(out.nonEmpty)
    // doc 2 contributes nothing: per arm, chunks/chars come from the
    // two identical 45-char docs only — all chunks duplicated, and
    // the empty-string hash is absent from the index accounting
    out.foreach { r =>
      assert(r.getAs[Long]("n_chars") == 90L, s"n_chars @ ${r.getAs[Long]("divisor")}")
      assert(r.getAs[Long]("dup_chunks") == r.getAs[Long]("n_chunks"))
      assert(r.getAs[Long]("n_chunks") % 2 == 0)
      assert(r.getAs[Long]("index_rows") == r.getAs[Long]("n_chunks") / 2)
    }
  }
}
