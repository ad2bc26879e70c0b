package graft

import org.apache.spark.sql.functions._

import graft.queries.CdcQueries

/** q181: content-defined chunking — transcription parity plus the
  * shift-robustness property that motivates CDC over fixed blocks. */
class CdcSpec extends SparkSpec {

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Driver-side transcription of the chunker: same fold, same rolling
    * hash, same boundary rule. */
  private def foldText(t: String): String = {
    val hyphens = "-‐‑‒–—―"
    val noHyphen = t.map(c => if (hyphens.contains(c)) ' ' else c)
      .filterNot(_ == '­')
    java.text.Normalizer.normalize(noHyphen, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}", "").toLowerCase
  }

  private def chunksOf(s: String): Seq[String] = {
    val w = CdcQueries.CdcWindow
    val bs = (w until s.length).filter { i =>
      val h = (0 until w).map { j =>
        s.charAt(i - 1 - j).toLong * CdcQueries.CdcPows(j)
      }.sum % CdcQueries.CdcMod
      h % CdcQueries.CdcDivisor == 0
    }
    val cuts = 0 +: bs :+ s.length
    cuts.sliding(2).map { case Seq(a, b) => s.substring(a, b) }.toSeq
  }

  test("q181 matches an in-memory transcription of CDC chunk dedup") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> foldText(r.getString(1))).toMap
    val chunks = docs.view.mapValues(chunksOf).toMap
    val dfreq = chunks.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val rows = CdcQueries.cdcChunks(spark, sfDir).collect()
    assert(rows.length === docs.count(_._2.nonEmpty))
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val cs = chunks(id)
      assert(r.getAs[Long]("n_chars") === docs(id).length.toLong)
      assert(r.getAs[Long]("n_chunks") === cs.length.toLong)
      assert(r.getAs[Long]("max_chunk_len") === cs.map(_.length).max.toLong)
      val dup = cs.filter(c => dfreq(c) >= 2)
      assert(r.getAs[Long]("dup_chunks") === dup.length.toLong)
      assert(r.getAs[Long]("dup_chars") === dup.map(_.length).sum.toLong)
      assert(r.getAs[Long]("dup_share_e6") ===
        dup.map(_.length).sum.toLong * 1000000L / docs(id).length)
    }
    assert(rows.exists(_.getAs[Long]("n_chunks") > 1), "boundaries must fire")
  }

  test("q181 boundaries re-synchronize after an insertion (shift robustness)") {
    val base = Tables.documents(spark, sfDir)
      .select(col("text")).limit(1).collect()(0).getString(0)
    val s = foldText(base)
    val shifted = "inserted preamble " + s
    val (a, b) = (chunksOf(s), chunksOf(shifted))
    // every chunk after the first boundary of the original reappears
    // verbatim in the shifted text's chunk set — only the head differs
    assert(a.length > 2, "test doc must produce several chunks")
    val tail = a.drop(1)
    val bSet = b.toSet
    assert(tail.forall(bSet.contains),
      s"tail chunks must survive the shift: ${tail.filterNot(bSet.contains)}")
    // a fixed-size blocker would share NO block after the shift; CDC
    // shares all but O(1) — the md5-keyed dedup index still hits
    assert(tail.map(md5).toSet.subsetOf(b.map(md5).toSet))
  }
}
