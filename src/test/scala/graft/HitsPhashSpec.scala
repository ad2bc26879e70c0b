package graft

import org.apache.spark.sql.functions._

import graft.expressions.SlicePhashUtil
import graft.queries.{CorpusOpsQueries, MultimodalQueries}

/** Invariants + in-memory differentials for q163 (HITS on the
  * provenance-directed domain graph) and q165 (perceptual-hash
  * near-dup banding), and byte-parity for the SlicePhash kernel. */
class HitsPhashSpec extends SparkSpec {

  private lazy val hits = CorpusOpsQueries.domainHits(spark, sfDir)
  private lazy val pairs = MultimodalQueries.phashNeardup(spark, sfDir)

  // ---- SlicePhash kernel ---------------------------------------------

  test("slice phash: locality — a single-character edit flips few bits") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val h0 = SlicePhashUtil.phash(
      org.apache.spark.unsafe.types.UTF8String.fromString(base))
    // perturb one character in the middle
    val edited = base.updated(20, 'Z')
    val h1 = SlicePhashUtil.phash(
      org.apache.spark.unsafe.types.UTF8String.fromString(edited))
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 3)
    // and the hash is 16-bit
    assert((h0 & ~0xFFFFL) === 0L && (h1 & ~0xFFFFL) === 0L)
  }

  test("slice phash: expression matches the plain-Scala kernel on the corpus") {
    import graft.functions.GraftFunctions.slicePhash
    val rows = Tables.documents(spark, sfDir)
      .select(col("text"), slicePhash(col("text")).as("ph"))
      .collect()
    rows.foreach { r =>
      val expect = SlicePhashUtil.phash(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))
      assert(r.getLong(1) === expect)
    }
  }

  // ---- q163 -----------------------------------------------------------

  test("q163: scores are valid e6, normalization hits 1e6, degrees reconcile") {
    val rows = hits.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("hub_e6") >= 0 && r.getAs[Long]("hub_e6") <= 1000000L)
      assert(r.getAs[Long]("auth_e6") >= 0 && r.getAs[Long]("auth_e6") <= 1000000L)
    }
    // L-infinity normalization: if any edge exists, some node sits at 1e6
    if (rows.exists(_.getAs[Long]("outdeg") > 0)) {
      assert(rows.map(_.getAs[Long]("auth_e6")).max === 1000000L)
      assert(rows.map(_.getAs[Long]("hub_e6")).max === 1000000L)
    }
    // total out-mass equals total in-mass (each edge counted once each side)
    assert(rows.map(_.getAs[Long]("outdeg")).sum === rows.map(_.getAs[Long]("indeg")).sum)
  }

  test("q163: authority mass sits only on nodes with inlinks (and hubs on outlinks)") {
    assert(hits.filter(col("auth_e6") > 0 && col("indeg") === 0).count() === 0)
    assert(hits.filter(col("hub_e6") > 0 && col("outdeg") === 0).count() === 0)
  }

  test("q163: matches an in-memory HITS recomputation exactly") {
    // rebuild the edge set + 4 integer fixed-point rounds in plain Scala
    val rows = hits.collect()
    val edgeRows = {
      val segs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source"),
          explode_outer(split(regexp_replace(col("text"), " batch ", ". "), "\\. "))
            .as("seg"))
        .withColumn("seg", trim(col("seg")))
        .filter(col("seg").isNotNull && length(col("seg")) > 0)
        .groupBy(col("source"), col("seg")).agg(min(col("doc_id")).as("min_doc"))
        .collect()
        .map(r => (r.getAs[String]("source"), r.getAs[String]("seg"), r.getAs[Long]("min_doc")))
      val byCount = segs.groupBy(_._2).filter { case (_, g) =>
        g.size >= 2 && g.size <= CorpusOpsQueries.PrSegDfCap }
      byCount.toSeq.flatMap { case (_, g) =>
        val origin = g.minBy(_._3)._1
        g.map(_._1).filter(_ != origin).map(s => (s, origin))
      }.distinct
    }
    val nodes = Tables.documents(spark, sfDir).select(col("source")).distinct()
      .collect().map(_.getString(0)).sorted
    var hub = nodes.map(_ -> 1000000L).toMap
    var auth = nodes.map(_ -> 0L).toMap
    for (_ <- 1 to CorpusOpsQueries.HitsRounds) {
      val aRaw = nodes.map(n =>
        n -> edgeRows.filter(_._2 == n).map(e => hub(e._1)).sum).toMap
      val amx = math.max(aRaw.values.max, 1L)
      auth = aRaw.map { case (k, v) => k -> v * 1000000L / amx }
      val hRaw = nodes.map(n =>
        n -> edgeRows.filter(_._1 == n).map(e => auth(e._2)).sum).toMap
      val hmx = math.max(hRaw.values.max, 1L)
      hub = hRaw.map { case (k, v) => k -> v * 1000000L / hmx }
    }
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      assert(r.getAs[Long]("hub_e6") === hub(s), s"hub($s)")
      assert(r.getAs[Long]("auth_e6") === auth(s), s"auth($s)")
    }
  }

  // ---- q165 -----------------------------------------------------------

  test("q165: pairs are oriented, banded, and within hamming 1") {
    val rows = pairs.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("hamming") <= 1L)
    }
    // no duplicate pairs
    val keys = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(keys.distinct.length === keys.length)
  }

  test("q165: matches an in-memory all-pairs recomputation (cap-aware)") {
    val docs = Tables.documents(spark, sfDir)
      .filter(col("n_chars") >= MultimodalQueries.MinPhashChars)
      .select(col("doc_id"), col("n_chars"), col("text")).collect()
      .map { r =>
        val ph = SlicePhashUtil.phash(
          org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(2)))
        val lenBin = java.lang.Long.toBinaryString(r.getLong(1)).length.toLong
        (r.getLong(0), lenBin, ph)
      }
    val bucketN = docs.groupBy(d => (d._2, d._3)).map { case (k, g) => k -> g.size }
    val kept = docs.filter(d => bucketN((d._2, d._3)) <= MultimodalQueries.PhashBucketCap)
    val expected = (for {
      a <- kept; b <- kept
      if a._1 < b._1 && a._2 == b._2 &&
        java.lang.Long.bitCount(a._3 ^ b._3) <= 1
    } yield (a._1, b._1, a._2, java.lang.Long.bitCount(a._3 ^ b._3).toLong)).toSet
    val got = pairs.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      r.getAs[Long]("len_bin"), r.getAs[Long]("hamming"))).toSet
    assert(got === expected)
  }
}
