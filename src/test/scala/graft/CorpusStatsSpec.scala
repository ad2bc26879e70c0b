package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{fold, tokens}
import graft.queries.CorpusStatsQueries

/** Invariants for the corpus-measurement trio: q151 n-gram
  * decontamination, q153 Heaps-law vocabulary growth, q154 embedding
  * anisotropy — plus the plan shapes their 100 TB safety depends on. */
class CorpusStatsSpec extends SparkSpec {

  // NOT cached: the plan tests below must see the parquet-scan plan,
  // and a .cache() here would swap in an InMemoryRelation for every
  // later lookup of the same canonical plan.
  private lazy val contam = CorpusStatsQueries.ngramContamination(spark, sfDir)
  private lazy val growth = CorpusStatsQueries.vocabGrowth(spark, sfDir)
  private lazy val aniso = CorpusStatsQueries.embedAnisotropy(spark, sfDir)

  // ---- q151 -----------------------------------------------------------

  test("q151: benchmark docs are excluded; every training doc appears exactly once") {
    assert(contam.filter(pmod(col("doc_id"), lit(CorpusStatsQueries.ContamBenchMod)) === 0)
      .count() === 0)
    val total = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(CorpusStatsQueries.ContamBenchMod)) =!= 0).count()
    assert(contam.count() === total)
    assert(contam.select(col("doc_id")).distinct().count() === total)
  }

  test("q151: counts are consistent and the verdict tiers partition the rows") {
    assert(contam.filter(col("n_hit") > col("n_grams")).count() === 0)
    assert(contam.filter(col("hit_frac_e6") < 0 || col("hit_frac_e6") > 1000000L).count() === 0)
    assert(contam.filter(col("verdict") === "short" && col("n_grams") =!= 0).count() === 0)
    assert(contam.filter(col("verdict") === "clean" &&
      (col("n_hit") =!= 0 || col("n_grams") === 0)).count() === 0)
    assert(contam.filter(col("verdict") === "contaminated" &&
      col("hit_frac_e6") < CorpusStatsQueries.ContamFracE6).count() === 0)
  }

  test("q151: an exact textual clone of a benchmark doc is fully contaminated") {
    val sigs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(concat_ws(" ", tokens(fold(col("text"))))).as("sig"),
        size(tokens(fold(col("text")))).as("n"))
    val benchSigs = sigs
      .filter(pmod(col("doc_id"), lit(CorpusStatsQueries.ContamBenchMod)) === 0)
      .select(col("sig")).distinct()
    val clones = sigs
      .filter(pmod(col("doc_id"), lit(CorpusStatsQueries.ContamBenchMod)) =!= 0)
      .filter(col("n") >= CorpusStatsQueries.ContamGramK)
      .join(benchSigs, Seq("sig"))
      .select(col("doc_id"))
    val verdicts = clones.join(contam, Seq("doc_id"))
    assert(verdicts.count() === clones.count())
    assert(verdicts.filter(col("hit_frac_e6") =!= 1000000L).count() === 0)
  }

  test("q151 plan: benchmark gram set joins by broadcast; no windows anywhere") {
    val p = contam.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
  }

  // ---- q153 -----------------------------------------------------------

  test("q153: 16 checkpoints, cumulative counts monotone, final step equals corpus totals") {
    assert(growth.count() === CorpusStatsQueries.GrowthSteps.toLong)
    val rows = growth.orderBy(col("step")).collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_docs") <= b.getAs[Long]("n_docs"))
      assert(a.getAs[Long]("n_tokens") <= b.getAs[Long]("n_tokens"))
      assert(a.getAs[Long]("vocab") <= b.getAs[Long]("vocab"))
    }
    val last = rows.last
    val docs = Tables.documents(spark, sfDir)
    assert(last.getAs[Long]("n_docs") === docs.count())
    val totTokens = docs.select(sum(size(tokens(fold(col("text"))))).cast("long"))
      .head().getLong(0)
    assert(last.getAs[Long]("n_tokens") === totTokens)
    val totVocab = docs.select(explode(tokens(fold(col("text")))).as("t"))
      .select(col("t")).distinct().count()
    assert(last.getAs[Long]("vocab") === totVocab)
  }

  test("q153: growth ratios are >= 1e6 (cumulative) and null only on the first step") {
    val rows = growth.orderBy(col("step")).collect()
    assert(rows.head.isNullAt(rows.head.fieldIndex("vocab_ratio_e6")))
    rows.tail.foreach { r =>
      assert(r.getAs[Long]("vocab_ratio_e6") >= 1000000L)
      assert(r.getAs[Long]("token_ratio_e6") >= 1000000L)
    }
  }

  // ---- q154 -----------------------------------------------------------

  test("q154: anisotropy in [0, 1e6], rms >= mu-norm, variance trace nonnegative") {
    assert(aniso.filter(col("aniso_e6") < 0 || col("aniso_e6") > 1000000L).count() === 0)
    assert(aniso.filter(col("mu_norm_e6") > col("rms_norm_e6")).count() === 0)
    assert(aniso.filter(col("trace_var_e6") < 0).count() === 0)
    assert(aniso.filter(col("n_dims") =!= 64L).count() === 0)
    val totVecs = aniso.agg(sum(col("n_vecs"))).head().getLong(0)
    assert(totVecs === Tables.embeddings(spark, sfDir).count())
  }

  test("q154 plan: one embeddings scan, partial aggregation, no window, no join") {
    val p = aniso.queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("Scan parquet")) === 1, p)
    assert(p.contains("partial_"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  // ---- q157 -----------------------------------------------------------

  test("q157: contingency cells reconcile with each filter's own marginal counts") {
    val cells = CorpusStatsQueries.filterAgreement(spark, sfDir).collect()
    val total = cells.map(_.getAs[Long]("n_docs")).sum
    assert(total === Tables.documents(spark, sfDir).count())
    // rounded shares sum to ~1e6 (at most 1 ulp of rounding per cell)
    val shareSum = cells.map(_.getAs[Long]("share_e6")).sum
    assert(math.abs(shareSum - 1000000L) <= cells.length)
    // marginals match the source filters exactly
    val rulesKept = cells.filter(_.getAs[Boolean]("rules_keep"))
      .map(_.getAs[Long]("n_docs")).sum
    assert(rulesKept === graft.queries.CurationQueries.qualityFilter(spark, sfDir)
      .filter(col("keep")).count())
    val clfKept = cells.filter(_.getAs[Boolean]("clf_keep"))
      .map(_.getAs[Long]("n_docs")).sum
    assert(clfKept === graft.queries.CorpusOpsQueries.qualityClassifier(spark, sfDir)
      .filter(col("keep")).count())
    val lmKept = cells.filter(_.getAs[Boolean]("lm_keep"))
      .map(_.getAs[Long]("n_docs")).sum
    assert(lmKept === graft.queries.CorpusOpsQueries.lmSurprisal(spark, sfDir)
      .filter(col("bucket") =!= "tail").count())
  }

  // ---- q160 -----------------------------------------------------------

  test("q160: the operating curve is monotone — shorter grams flag more") {
    val rows = CorpusStatsQueries.contaminationSweep(spark, sfDir)
      .orderBy(col("gram_n")).collect()
    assert(rows.map(_.getAs[Long]("gram_n")).toSeq ===
      CorpusStatsQueries.SweepGramSizes.map(_.toLong))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_clean") + r.getAs[Long]("n_flagged") +
        r.getAs[Long]("n_contaminated") === r.getAs[Long]("n_docs"))
    }
    rows.sliding(2).foreach { case Array(short, long) =>
      // longer grams can only shrink the testable-doc set and the hit mass
      assert(short.getAs[Long]("n_docs") >= long.getAs[Long]("n_docs"))
      assert(short.getAs[Long]("corpus_hit_e6") >= long.getAs[Long]("corpus_hit_e6"))
    }
    // the 8-gram row agrees with q151's per-doc verdicts
    val row8 = rows.find(_.getAs[Long]("gram_n") === 8L).get
    val q151 = contam.filter(col("n_grams") > 0)
    assert(row8.getAs[Long]("n_docs") === q151.count())
    assert(row8.getAs[Long]("n_clean") === q151.filter(col("verdict") === "clean").count())
    assert(row8.getAs[Long]("n_contaminated") ===
      q151.filter(col("verdict") === "contaminated").count())
  }

  test("q187 entropy matches a driver-side bigram transcription") {
    def foldText(t: String): String = {
      val hyphens = "-\u2010\u2011\u2012\u2013\u2014\u2015"
      val noHyphen = t.map(c => if (hyphens.contains(c)) ' ' else c)
        .filterNot(_ == '\u00ad')
      java.text.Normalizer.normalize(noHyphen, java.text.Normalizer.Form.NFD)
        .replaceAll("\\p{M}", "").toLowerCase
    }
    def bitsLen(x: Long): Int = java.lang.Long.toBinaryString(x).length
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> foldText(r.getString(1))).filter(_._2.length >= 2)
    val expected = docs.map { case (id, s) =>
      val bgs = s.sliding(2).toSeq
      val t = bgs.length.toLong
      val counts = bgs.groupBy(identity).view.mapValues(_.size.toLong)
      val totalBits = counts.values.map(c => c * (bitsLen(t) - bitsLen(c))).sum
      id -> ((t, counts.size.toLong, totalBits * 1000 / t, counts.size.toLong * 1000000 / t))
    }.toMap
    val meanEntropy = expected.values.map(_._3).sum / expected.size
    val rows = CorpusStatsQueries.charEntropy(spark, sfDir).collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val (t, nd, ent, de6) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_bigrams") === t)
      assert(r.getAs[Long]("n_distinct") === nd)
      assert(r.getAs[Long]("entropy_milli") === ent)
      assert(r.getAs[Long]("distinct_e6") === de6)
      assert(r.getAs[Boolean]("low_entropy") === (ent < meanEntropy))
    }
    assert(rows.exists(_.getAs[Boolean]("low_entropy")))
    assert(rows.exists(!_.getAs[Boolean]("low_entropy")))
  }

  test("q190 burstiness matches a driver-side dispersion transcription") {
    def foldText(t: String): String = {
      val hyphens = "-\u2010\u2011\u2012\u2013\u2014\u2015"
      val noHyphen = t.map(c => if (hyphens.contains(c)) ' ' else c)
        .filterNot(_ == '\u00ad')
      java.text.Normalizer.normalize(noHyphen, java.text.Normalizer.Form.NFD)
        .replaceAll("\\p{M}", "").toLowerCase
    }
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> foldText(r.getString(1)).trim.split("\\s+").toSeq)
    val nDocs = docs.length.toLong
    val perTok = docs.flatMap { case (id, ts) => ts.map(t => (t, id)) }
      .groupBy(_._1).view.mapValues { occ =>
        val byDoc = occ.groupBy(_._2).view.mapValues(_.size.toLong).values.toSeq
        (byDoc.size.toLong, byDoc.sum, byDoc.map(c => c * c).sum)
      }.toMap
    val top = perTok.toSeq.sortBy { case (t, (_, c, _)) => (-c, t) }
      .take(CorpusStatsQueries.BurstTopK)
    val rows = CorpusStatsQueries.tokenBurstiness(spark, sfDir).collect()
    assert(rows.length === math.min(CorpusStatsQueries.BurstTopK, perTok.size))
    rows.zip(top).foreach { case (r, (tok, (df, cnt, s2))) =>
      assert(r.getAs[String]("tok") === tok)
      assert(r.getAs[Long]("df") === df)
      assert(r.getAs[Long]("cnt") === cnt)
      assert(r.getAs[Long]("s2") === s2)
      val vmr = math.round((s2.toDouble / cnt - cnt.toDouble / nDocs) * 1e6)
      assert(r.getAs[Long]("vmr_e6") === vmr, s"vmr of $tok")
      assert(r.getAs[Boolean]("bursty") === (vmr > CorpusStatsQueries.BurstVmrE6))
    }
  }

  test("q191 percentiles equal a per-source cume_dist over the score") {
    val rows = CorpusStatsQueries.qualityPercentile(spark, sfDir).collect()
    assert(rows.length === 500)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (_, g) =>
      val n = g.length.toLong
      g.foreach { r =>
        val score = r.getAs[Long]("entropy_milli")
        val nLe = g.count(_.getAs[Long]("entropy_milli") <= score).toLong
        assert(r.getAs[Long]("n_source") === n)
        assert(r.getAs[Long]("n_le") === nLe)
        assert(r.getAs[Long]("pct_e6") === nLe * 1000000L / n)
      }
      // the per-source max always sits at exactly 100%
      assert(g.map(_.getAs[Long]("pct_e6")).max === 1000000L)
    }
    assert(bySource.size > 1, "percentiles must be per-source to mean anything")
  }
}
