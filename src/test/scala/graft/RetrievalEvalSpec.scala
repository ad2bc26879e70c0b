package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.queries.{CorpusOpsQueries, RetrievalEvalQueries, SimilarityQueries}

/** q205/q206/q207: calibration, PRF expansion and graded ranking
  * metrics — structural invariants plus driver-side recomputation of
  * every metric from the (independently gated) component rankings. */
class RetrievalEvalSpec extends SparkSpec {

  test("q205 bins partition the corpus and ECE is the n-weighted mean gap") {
    val rows = RetrievalEvalQueries.scoreCalibration(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n")).sum
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(total === nDocs)
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      val conf = r.getAs[Long]("conf_e6")
      assert(bin >= 0 && bin <= 9)
      assert(conf >= bin * 100000 && conf < (bin + 1) * 100000)
      assert(r.getAs[Long]("acc_e6") ===
        r.getAs[Long]("n_pos") * 1000000L / r.getAs[Long]("n"))
      assert(r.getAs[Long]("gap_e6") ===
        math.abs(r.getAs[Long]("acc_e6") - conf))
    }
    val ece = rows.map(r => r.getAs[Long]("n") * r.getAs[Long]("gap_e6")).sum / total
    rows.foreach(r => assert(r.getAs[Long]("ece_e6") === ece))
  }

  test("q206 expansion keeps original terms dominant and ranks are dense") {
    val rows = RetrievalEvalQueries.prfExpansion(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === CorpusOpsQueries.Bm25Queries.map(_._1.toLong).toSet)
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq ===
        (1L to sorted.length).toSeq, s"query $q dense ranks")
      // ranking order consistent with scores (desc, doc asc tiebreak)
      val keys = sorted.map(r =>
        (-r.getAs[Long]("wscore_e6"), r.getAs[Long]("doc_id")))
      assert(keys.toSeq === keys.sortBy(identity).toSeq, s"query $q order")
      // a doc can match at most the 2 original + FbTerms expansion terms
      rs.foreach(r => assert(r.getAs[Long]("n_terms_hit") <=
        2 + RetrievalEvalQueries.FbTerms))
    }
  }

  test("q206 feedback terms are new terms weighted at most half an original term") {
    // reconstruct the selected expansion terms exactly as the query does
    val qt = spark.createDataFrame(CorpusOpsQueries.Bm25Queries)
      .toDF("query_id", "term")
    val (docTok, dfreq, dl, norms) =
      graft.operators.Curation.bm25Stats(
        Tables.documents(spark, sfDir), "text", "doc_id")
    val fb = graft.operators.Curation
      .bm25Rank(docTok, dfreq, dl, norms, "doc_id", qt, RetrievalEvalQueries.FbDocs)
      .select(col("query_id"), col("doc_id"))
    val cand = docTok.join(broadcast(fb), Seq("doc_id"))
      .groupBy(col("query_id"), col("tok")).agg(sum(col("tf")).as("fbw"))
      .collect().map(r => (r.getAs[Long]("query_id"), r.getString(1)) -> r.getAs[Long]("fbw"))
      .toMap
    val orig = CorpusOpsQueries.Bm25Queries.groupBy(_._1.toLong)
      .view.mapValues(_.map(_._2).toSet).toMap
    // top-FbTerms by (fbw desc, tok) excluding originals, per query
    cand.keys.map(_._1).toSeq.distinct.foreach { q =>
      val sel = cand.collect { case ((`q`, t), w) if !orig(q).contains(t) => (t, w) }
        .toSeq.sortBy { case (t, w) => (-w, t) }.take(RetrievalEvalQueries.FbTerms)
      assert(sel.nonEmpty, s"query $q has expansion candidates")
      val maxW = sel.map(_._2).max
      sel.foreach { case (_, w) =>
        val we6 = 500000L * w / maxW
        assert(we6 > 0 && we6 <= 500000L)
      }
    }
  }

  test("q207 metrics match a driver recomputation from the component rankings") {
    import SimilarityQueries.{QuerySetBound, KmeansK, KmeansIters, TrainedNprobe, Dim}
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val qs = emb.filter(col("vec_id") < QuerySetBound)
    val corpus = emb.filter(col("vec_id") >= QuerySetBound)
    val gt = Similarity.bruteForceTopK(qs, corpus, RetrievalEvalQueries.GtDepth)
      .select(col("q_vec_id"), col("vec_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cents = Similarity.kmeansFit(emb, KmeansK, Dim, KmeansIters)._2
    val sys = Similarity
      .ivfTrainedTopK(qs, corpus, cents, TrainedNprobe, RetrievalEvalQueries.SysK)
      .select(col("q_vec_id"), col("vec_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def relOf(gr: Long): Long = if (gr <= 3) 3L else if (gr <= 10) 2L else 1L
    val rows = RetrievalEvalQueries.ndcgEval(spark, sfDir).collect()
    assert(rows.length === QuerySetBound)
    rows.foreach { r =>
      val q = r.getLong(0)
      val mine = sys.filter(_._1 == q).map { case (_, v, rk) =>
        (rk, gt.get((q, v)).map(relOf).getOrElse(0L))
      }
      val dcg = mine.map { case (rk, rel) => rel * 1000000L / (rk + 1) }.sum
      val idcg = (1L to RetrievalEvalQueries.SysK)
        .map(rk => relOf(rk) * 1000000L / (rk + 1)).sum
      val firstRel = mine.filter(_._2 > 0).map(_._1).sorted.headOption
      assert(r.getAs[Long]("dcg_e6") === dcg)
      assert(r.getAs[Long]("idcg_e6") === idcg)
      assert(r.getAs[Long]("ndcg_e6") === dcg * 1000000L / idcg)
      assert(r.getAs[Long]("mrr_e6") === firstRel.map(1000000L / _).getOrElse(0L))
      assert(r.getAs[Long]("n_rel_found") === mine.count(_._2 > 0).toLong)
      assert(r.getAs[Long]("prec_e6") ===
        mine.count(_._2 > 0).toLong * 1000000L / RetrievalEvalQueries.SysK)
      assert(r.getAs[Long]("dcg_e6") <= r.getAs[Long]("idcg_e6"))
    }
  }

  test("q249 nprobe curve: recall recomputed from truth, monotone, anchored at full probe") {
    import SimilarityQueries._
    val rows = SimilarityQueries.ivfNprobeCurve(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("nprobe"))
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq ===
      NprobeSweep.map(_.toLong))

    // recompute every arm's recall from the independently-run pieces:
    // exact truth (q26 ranking) vs the q70 search at that nprobe
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val qs = emb.filter(col("vec_id") < QuerySetBound)
    val corpus = emb.filter(col("vec_id") >= QuerySetBound)
    val cents = Similarity.kmeansFit(emb, KmeansK, Dim, KmeansIters)._2
    val truth = Similarity.bruteForceTopK(qs, corpus, LshTopK)
      .select(col("q_vec_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val np = r.getAs[Long]("nprobe").toInt
      val approx = Similarity.ivfTrainedTopK(qs, corpus, cents, np, LshTopK)
        .select(col("q_vec_id"), col("vec_id"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val hits = truth.count(approx)
      assert(r.getAs[Long]("n_truth") === truth.size.toLong, s"nprobe $np")
      assert(r.getAs[Long]("n_hits") === hits.toLong, s"nprobe $np")
      assert(r.getAs[Long]("recall_e6") ===
        math.round(hits.toDouble / truth.size * 1e6), s"nprobe $np")
    }

    // the curve's shape: recall and scanned fraction are monotone
    // nondecreasing in nprobe, and the full-probe arm (nprobe = K)
    // anchors at recall 1.0 over scan 1.0
    val recalls = rows.map(_.getAs[Long]("recall_e6")).toSeq
    val scans = rows.map(_.getAs[Long]("scanned_frac_e6")).toSeq
    assert(recalls === recalls.sorted)
    assert(scans === scans.sorted)
    assert(recalls.last === 1000000L)
    assert(scans.last === 1000000L)
    assert(scans.head < scans.last, "the shallow arm must scan less")
    // scanned counts reconcile: full probe reads the whole corpus once
    // per query
    assert(rows.last.getAs[Long]("n_scanned") ===
      rows.last.getAs[Long]("n_queries") * rows.last.getAs[Long]("n_corpus"))
  }

  test("q250 code-size curve: every arm's recall recomputed from truth via the q79 machinery") {
    import SimilarityQueries._
    val rows = SimilarityQueries.pqCodeCurve(spark, sfDir).collect()
    assert(rows.length === PqCodeSweep.length)
    // ordered by (code_bits, pq_blocks), bits = m * ceil(log2 codes)
    val bitsOf = rows.map { r =>
      val b = r.getAs[Long]("pq_blocks")
      val c = r.getAs[Long]("pq_codes").toInt
      val bits = b * (32 - Integer.numberOfLeadingZeros(c - 1))
      assert(r.getAs[Long]("code_bits") === bits, s"arm ($b, $c)")
      (bits, b)
    }.toSeq
    assert(bitsOf === bitsOf.sorted)
    assert(rows.map(r => (r.getAs[Long]("pq_blocks").toInt,
      r.getAs[Long]("pq_codes").toInt)).toSet === PqCodeSweep.toSet)

    // recompute every arm from the independently-run pieces: exact
    // truth (q26 ranking) vs a from-scratch q79 encode+ADC-scan at
    // that arm's geometry and fixed-quantizer codebook
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val qs = emb.filter(col("vec_id") < QuerySetBound)
    val corpus = emb.filter(col("vec_id") >= QuerySetBound)
    val truth = Similarity.bruteForceTopK(qs, corpus, LshTopK)
      .select(col("q_vec_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nQueries = qs.count()
    rows.foreach { r =>
      val blocks = r.getAs[Long]("pq_blocks").toInt
      val codes = r.getAs[Long]("pq_codes").toInt
      val subs = Similarity.pqSubvectorsAt(
        emb.select(col("vec_id"), Similarity.microVec(col("embedding")).as("m")),
        blocks, Dim)
      val codebook = subs
        .filter(col("vec_id") >= QuerySetBound &&
          col("vec_id") < QuerySetBound + codes)
        .select((col("vec_id") - QuerySetBound).as("code"),
          col("block"), col("sub").as("cw"))
      val approx = Similarity.pqSearch(
        subs.filter(col("vec_id") < QuerySetBound),
        Similarity.pqEncode(subs.filter(col("vec_id") >= QuerySetBound), codebook),
        codebook, LshTopK)
        .select(col("q_vec_id"), col("vec_id"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val hits = truth.count(approx)
      assert(r.getAs[Long]("n_queries") === nQueries, s"arm ($blocks, $codes)")
      assert(r.getAs[Long]("n_truth") === truth.size.toLong, s"arm ($blocks, $codes)")
      assert(r.getAs[Long]("n_hits") === hits.toLong, s"arm ($blocks, $codes)")
      assert(r.getAs[Long]("recall_e6") ===
        math.round(hits.toDouble / truth.size * 1e6), s"arm ($blocks, $codes)")
    }
    // the curve's reason to exist: the widest code dominates the
    // narrowest (strict monotonicity is NOT an invariant of a fixed
    // quantizer at micro code sizes — sf0.001 measures a non-monotone
    // middle — but the endpoints must order or the knob buys nothing)
    assert(rows.last.getAs[Long]("recall_e6") >
      rows.head.getAs[Long]("recall_e6"))
  }
}
