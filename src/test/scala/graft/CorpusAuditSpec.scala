package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{fold, tokens}
import graft.queries.CorpusAuditQueries

/** Invariants for the corpus-audit quartet: q161 Zipf spectrum fit,
  * q162 length-distribution drift, q164 k-anonymity audit, q166 shard
  * manifest — plus the plan shapes their 100 TB safety depends on. */
class CorpusAuditSpec extends SparkSpec {

  private lazy val zipf = CorpusAuditQueries.zipfSpectrum(spark, sfDir)
  private lazy val drift = CorpusAuditQueries.lengthDrift(spark, sfDir)
  private lazy val kanon = CorpusAuditQueries.kanonAudit(spark, sfDir)
  private lazy val manifest = CorpusAuditQueries.shardManifest(spark, sfDir)

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  // ---- q161 -----------------------------------------------------------

  test("q161: moments are consistent and the spectrum masses add up") {
    val rows = zipf.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("hapax") <= r.getAs[Long]("vocab"))
      assert(r.getAs[Long]("vocab") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_points") <= r.getAs[Long]("vocab"))
    }
    // token mass per source must equal a direct count off the corpus
    val direct = Tables.documents(spark, sfDir)
      .select(col("source"), explode(tokens(fold(col("text")))).as("tok"))
      .groupBy(col("source")).agg(count(lit(1)).as("direct"))
    val joined = zipf.join(direct, Seq("source"))
    assert(joined.filter(col("n_tokens") =!= col("direct")).count() === 0)
  }

  test("q161: the OLS fit matches an in-memory recomputation exactly") {
    // recompute the spectrum + e6-ln OLS in plain Scala off the corpus
    // (sf0.001 is small enough to collect) and demand bit-identical
    // slope/intercept — the differential check on the moment algebra
    val pts = Tables.documents(spark, sfDir)
      .select(col("source"), explode(tokens(fold(col("text")))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("f"))
      .groupBy(col("source"), col("f")).agg(count(lit(1)).as("n_types"))
      .collect()
      .groupBy(_.getAs[String]("source"))
    val expected = pts.map { case (src, rows) =>
      val xy = rows.map { r =>
        (math.round(math.log(r.getAs[Long]("f").toDouble) * 1e6),
          math.round(math.log(r.getAs[Long]("n_types").toDouble) * 1e6))
      }
      val n = xy.length.toLong
      val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
      val sxx = xy.map(p => BigInt(p._1) * BigInt(p._1)).sum
      val sxy = xy.map(p => BigInt(p._1) * BigInt(p._2)).sum
      val den = (BigInt(n) * sxx - BigInt(sx) * BigInt(sx)).toDouble
      val slope = (BigInt(n) * sxy - BigInt(sx) * BigInt(sy)).toDouble / den
      val slopeE6 = math.round(slope * 1e6)
      val interceptE6 = math.round((sy.toDouble - slope * sx.toDouble) / n.toDouble)
      src -> ((slopeE6, interceptE6))
    }
    zipf.collect().foreach { r =>
      val (s, i) = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("zipf_slope_e6") === s, r.toString)
      assert(r.getAs[Long]("intercept_e6") === i, r.toString)
    }
  }

  test("q161: plan is windowless and join-free (pure hash-agg cascade)") {
    val p = plan(zipf)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  // ---- q162 -----------------------------------------------------------

  test("q162: distances are valid e6 probabilities and docs add up") {
    val rows = drift.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("ks_e6") >= 0 && r.getAs[Long]("ks_e6") <= 1000000L)
      assert(r.getAs[Long]("tv_e6") >= 0 && r.getAs[Long]("tv_e6") <= 1000000L)
      // KS (a single max gap) is never above TV + 1 ulp on shared bins
      assert(r.getAs[Long]("ks_e6") <= 2 * r.getAs[Long]("tv_e6") + 1)
    }
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
  }

  test("q162: a source identical in shape to the rest scores near zero") {
    // sanity: the uniform doc_id stripes of the testdata make sources
    // near-iid, so no source should look wildly drifted
    assert(drift.filter(col("ks_e6") > 900000L).count() === 0)
  }

  // ---- q164 -----------------------------------------------------------

  test("q164: bands partition each source's docs and min-k is coherent") {
    val perSource = kanon.groupBy(col("source")).agg(
      sum(col("n_docs")).as("docs"),
      min(col("source_min_k")).as("mn"),
      max(col("source_min_k")).as("mx"))
    val direct = Tables.documents(spark, sfDir)
      .groupBy(col("source")).agg(count(lit(1)).as("direct"))
    val j = perSource.join(direct, Seq("source"))
    assert(j.filter(col("docs") =!= col("direct")).count() === 0)
    // source_min_k is a per-source constant
    assert(j.filter(col("mn") =!= col("mx")).count() === 0)
    // a source has band '1' iff its min class size is 1
    val hasBand1 = kanon.filter(col("k_band") === "1")
      .select(col("source")).distinct().collect().map(_.getString(0)).toSet
    val minK1 = kanon.filter(col("source_min_k") === 1)
      .select(col("source")).distinct().collect().map(_.getString(0)).toSet
    assert(hasBand1 === minK1)
  }

  test("q164: share_e6 sums to ~1e6 per source") {
    val sums = kanon.groupBy(col("source"))
      .agg(sum(col("doc_share_e6")).as("s")).collect()
    sums.foreach { r =>
      val v = r.getAs[Long]("s")
      assert(math.abs(v - 1000000L) <= 4, s"share sum $v")
    }
  }

  // ---- q166 -----------------------------------------------------------

  test("q166: manifest totals reconcile with the corpus and shards balance") {
    val docs = Tables.documents(spark, sfDir)
    val total = docs.count()
    val rows = manifest.collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    assert(rows.length <= CorpusAuditQueries.ManifestShards)
    rows.foreach { r =>
      val c = r.getAs[Long]("checksum")
      assert(c >= 0 && c < 1000000007L)
      assert(r.getAs[Long]("min_doc_id") <= r.getAs[Long]("max_doc_id"))
      assert(r.getAs[Long]("top_source_share_e6") <= 1000000L)
    }
    // the affine-hash assignment balances shards without any sort
    val sizes = rows.map(_.getAs[Long]("n_docs"))
    assert(sizes.max <= 3 * math.max(sizes.min, 1), sizes.mkString(","))
  }

  // ---- q167 -----------------------------------------------------------

  test("q167: held-out bigram surprisal matches an in-memory LM exactly") {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(fold(col("text"))).as("t"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1))
    val mod = CorpusAuditQueries.HeldMod
    val train = toks.filter(_._1 % mod != 0)
    val bc = train.flatMap { case (_, t) => t.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))) }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val cx = bc.groupBy(_._1._1).map { case (k, g) => k -> g.values.sum }
    val uc = train.flatMap(_._2).groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val nt = uc.values.sum
    def lb(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    val rows = CorpusAuditQueries.bigramSurprisal(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("doc_id") % mod == 0))
    rows.foreach { r =>
      val t = toks.toMap.apply(r.getAs[Long]("doc_id"))
      val prs = t.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))).toSeq
      val bits = prs.map { p =>
        bc.get(p) match {
          case Some(c) => lb(cx(p._1)) - lb(c)
          case None => CorpusAuditQueries.BackoffBits + lb(nt) - lb(uc.getOrElse(p._2, 0L) + 1)
        }
      }.sum
      val nBack = prs.count(p => !bc.contains(p)).toLong
      assert(r.getAs[Long]("n_scored") === prs.length.toLong, r.toString)
      assert(r.getAs[Long]("n_backoff") === nBack, r.toString)
      assert(r.getAs[Long]("total_bits") === bits, r.toString)
      if (prs.nonEmpty)
        assert(r.getAs[Long]("milli_bits_per_token") ===
          1000L * bits / prs.length, r.toString)
    }
  }

  test("q167: held-out docs see some backoff but mostly seen bigrams") {
    val agg = CorpusAuditQueries.bigramSurprisal(spark, sfDir)
      .agg(sum(col("n_backoff")).as("b"), sum(col("n_scored")).as("s")).head()
    assert(agg.getAs[Long]("s") > 0)
    // the corpus shares vocabulary across the split: backoff is the
    // exception, not the rule
    assert(agg.getAs[Long]("b") * 2 < agg.getAs[Long]("s"))
  }

  // ---- q168 -----------------------------------------------------------

  test("q168: max cosine vs the eval stripe matches an in-memory recompute") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray)
    val mod = CorpusAuditQueries.EmbedBenchMod
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    val bench = vecs.filter(_._1 % mod == 0)
    val rows = CorpusAuditQueries.embedContamination(spark, sfDir).collect()
    assert(rows.length === vecs.count(_._1 % mod != 0))
    rows.foreach { r =>
      val v = vecs.toMap.apply(r.getAs[Long]("vec_id"))
      val scored = bench.map { case (bid, b) =>
        (math.round(dot(v, b) / (nrm(v) * nrm(b)) * 1e6), bid)
      }
      val best = scored.maxBy { case (c, bid) => (c, -bid) }
      assert(r.getAs[Long]("max_cos_e6") === best._1, r.toString)
      assert(r.getAs[Long]("nearest_eval_id") === best._2, r.toString)
      val expectVerdict =
        if (best._1 >= CorpusAuditQueries.LeakCosE6) "leaked"
        else if (best._1 >= CorpusAuditQueries.SuspectCosE6) "suspect"
        else "clean"
      assert(r.getAs[String]("verdict") === expectVerdict)
    }
  }

  test("q168: the probe plan broadcasts the eval side and never shuffles the corpus pre-agg") {
    val p = plan(CorpusAuditQueries.embedContamination(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("q166: the checksum is order-free (recomputable from any layout)") {
    import graft.functions.Hashing
    val expected = Tables.documents(spark, sfDir)
      .select(col("doc_id"))
      .repartition(7) // a different physical layout than the query saw
      .withColumn("shard", Hashing.affine(col("doc_id"), 11) % CorpusAuditQueries.ManifestShards)
      .withColumn("chk", Hashing.affine(col("doc_id"), 13))
      .groupBy(col("shard"))
      .agg(pmod(sum(col("chk")), lit(1000000007L)).as("expected"))
    val j = manifest.join(expected, Seq("shard"))
    assert(j.count() === manifest.count())
    assert(j.filter(col("checksum") =!= col("expected")).count() === 0)
  }
}
