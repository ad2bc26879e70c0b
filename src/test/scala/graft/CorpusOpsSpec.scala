package graft

import org.apache.spark.sql.functions._

import graft.queries.CorpusOpsQueries

/** q126-q129: corpus-cleaning operators — duplicated-line removal,
  * LM-surprisal quality scoring, the MinHash-LSH precision/recall
  * eval, and vocabulary coverage / OOV analysis. */
class CorpusOpsSpec extends SparkSpec {

  private lazy val lineRows = CorpusOpsQueries.lineDedup(spark, sfDir).collect()

  test("q126 accounting is internally consistent") {
    assert(lineRows.length === 500)
    lineRows.foreach { r =>
      val (nSegs, nRem) = (r.getAs[Long]("n_segs"), r.getAs[Long]("n_removed"))
      assert(nRem <= nSegs)
      assert(r.getAs[Long]("chars_removed") >= 0)
      // a doc with nothing removed keeps all its characters
      if (nRem == 0) assert(r.getAs[Long]("chars_removed") === 0)
      // a doc with everything removed hashes the empty survivor text
      if (nRem == nSegs)
        assert(r.getAs[String]("kept_md5") ===
          java.security.MessageDigest.getInstance("MD5").digest(Array.emptyByteArray)
            .map("%02x".format(_)).mkString)
    }
    assert(lineRows.count(_.getAs[Long]("n_removed") > 0) > 0, "dup segments must exist")
  }

  test("q126 matches an in-memory transcription of duplicated-line removal") {
    // recompute the whole operator in plain Scala on the driver and
    // compare every row — segmentation, df threshold, accounting and
    // the reassembled-survivor md5 all pinned at once
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val segsOf: Map[Long, Seq[String]] = docs.map { case (id, text) =>
      id -> text.replace(" batch ", ". ").split("\\. ", -1).toSeq
        .map(_.trim).filter(_.nonEmpty)
    }
    val dfreq = segsOf.toSeq.flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (seg, xs) => seg -> xs.map(_._2).distinct.size }
    lineRows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val ss = segsOf(id)
      val (dup, kept) = ss.partition(sg => dfreq(sg) >= 2)
      assert(r.getAs[Long]("n_segs") === ss.length.toLong, s"doc $id")
      assert(r.getAs[Long]("n_removed") === dup.length.toLong, s"doc $id")
      assert(r.getAs[Long]("chars_removed") === dup.map(_.length.toLong).sum, s"doc $id")
      assert(r.getAs[Long]("kept_chars") === kept.map(_.length.toLong).sum, s"doc $id")
      assert(r.getAs[String]("kept_md5") === md5(kept.mkString(". ")), s"doc $id")
    }
    assert(lineRows.length === docs.size)
  }

  test("q126 plan: df join-back, no cartesian products") {
    val p = CorpusOpsQueries.lineDedup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q169 matches an in-memory transcription of per-source boilerplate removal") {
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val segsOf: Map[Long, Seq[String]] = docs.map { case (id, _, text) =>
      id -> text.replace(" batch ", ". ").split("\\. ", -1).toSeq
        .map(_.trim).filter(_.nonEmpty)
    }.toMap
    val srcOf = docs.map(d => d._1 -> d._2).toMap
    // df keyed by (source, seg): distinct docs of that source only
    val dfreq = docs.flatMap { case (id, src, _) =>
      segsOf(id).distinct.map(sg => (src, sg) -> id)
    }.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).distinct.size }
    val rows = CorpusOpsQueries.sourceBoilerplate(spark, sfDir).collect()
    assert(rows.length === docs.length)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val src = r.getAs[String]("source")
      assert(src === srcOf(id))
      val ss = segsOf(id)
      val (dup, kept) = ss.partition(sg =>
        dfreq((src, sg)) >= CorpusOpsQueries.BoilerMinDf)
      assert(r.getAs[Long]("n_segs") === ss.length.toLong, s"doc $id")
      assert(r.getAs[Long]("n_removed") === dup.length.toLong, s"doc $id")
      assert(r.getAs[Long]("kept_chars") === kept.map(_.length.toLong).sum, s"doc $id")
      assert(r.getAs[String]("kept_md5") === md5(kept.mkString(". ")), s"doc $id")
    }
    // the domain grain is a genuinely different verdict set from the
    // corpus grain: some segment is corpus-duplicated (q126 removes it)
    // yet on no single source 3 times (q169 keeps it)
    val corpusDf = docs.flatMap { case (id, _, _) => segsOf(id).distinct }
      .groupBy(identity).map { case (sg, xs) => sg -> xs.size }
    val diverges = docs.exists { case (id, src, _) =>
      segsOf(id).exists(sg => corpusDf(sg) >= 2 &&
        dfreq((src, sg)) < CorpusOpsQueries.BoilerMinDf)
    }
    assert(diverges, "expected at least one syndicated-but-not-boilerplate segment")
  }

  test("q175 snapshot ledger reconciles and exposes the policy gap") {
    val rows = CorpusOpsQueries.snapshotDedup(spark, sfDir).collect()
    assert(rows.length === CorpusOpsQueries.SnapMod.toInt)
    // in-memory replay of both dedup policies at the segment grain
    val segs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val snap = r.getLong(0) % CorpusOpsQueries.SnapMod
        r.getString(1).replace(" batch ", ". ").split("\\. ", -1).toSeq
          .map(_.trim).filter(_.nonEmpty).map(sg => (snap, sg))
      }
    val bySnap = segs.groupBy(_._1)
    val globalFirstSnap = segs.groupBy(_._2)
      .map { case (sg, xs) => sg -> xs.map(_._1).min }
    rows.foreach { r =>
      val snap = r.getAs[Long]("snap")
      val xs = bySnap(snap)
      val sigs = xs.map(_._2).distinct
      assert(r.getAs[Long]("n_segs") === xs.length.toLong)
      assert(r.getAs[Long]("n_sigs") === sigs.length.toLong)
      assert(r.getAs[Long]("dup_within") === (xs.length - sigs.length).toLong)
      val cross = sigs.count(sg => globalFirstSnap(sg) < snap)
      assert(r.getAs[Long]("cross_dup_kept") === cross.toLong)
      assert(r.getAs[Long]("kept_global") === (sigs.length - cross).toLong)
    }
    // the two policies genuinely disagree on this corpus: some
    // snapshot keeps a segment global dedup would drop
    assert(rows.map(_.getAs[Long]("cross_dup_kept")).sum > 0L)
    // snapshot 0 can never hold a cross-snapshot duplicate
    assert(rows.find(_.getAs[Long]("snap") == 0L).get
      .getAs[Long]("cross_dup_kept") === 0L)
  }

  test("q180 band sweep is monotone and its 4x2 row equals q128") {
    val rows = CorpusOpsQueries.lshBandSweep(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("rows_per_band"))
    assert(rows.length === CorpusOpsQueries.BandSweep.length)
    // truth is config-independent
    assert(rows.map(_.getAs[Long]("n_true")).distinct.length === 1)
    // more rows per band can only shrink the candidate set (bands at
    // rpb are refinements): recall non-increasing, candidates
    // non-increasing along 1 -> 2 -> 4
    rows.sliding(2).foreach { w =>
      if (w.length == 2) {
        assert(w(0).getAs[Long]("n_cand") >= w(1).getAs[Long]("n_cand"))
        assert(w(0).getAs[Long]("recall_e6") >= w(1).getAs[Long]("recall_e6"))
      }
    }
    // the curve is a real tradeoff on this corpus: the recall-max and
    // precision-max endpoints differ
    assert(rows.head.getAs[Long]("n_cand") > rows.last.getAs[Long]("n_cand"))
    // the production 4x2 row must equal q128's verdict exactly
    val mid = rows.find(r => r.getAs[Long]("bands") == 4L).get
    val q128 = CorpusOpsQueries.lshEval(spark, sfDir).head()
    assert(mid.getAs[Long]("n_true") === q128.getAs[Long]("n_true"))
    assert(mid.getAs[Long]("n_cand") === q128.getAs[Long]("n_cand"))
    assert(mid.getAs[Long]("n_hit") === q128.getAs[Long]("n_hit"))
    assert(mid.getAs[Long]("precision_e6") === q128.getAs[Long]("precision_e6"))
    assert(mid.getAs[Long]("recall_e6") === q128.getAs[Long]("recall_e6"))
  }

  test("q182 longest runs match an in-memory consecutive-repeat scan") {
    import graft.functions.TextFunctions.{fold, tokens}
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokens(fold(col("text"))).as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    def runsOf(t: Seq[String]): Seq[(String, Int, Int)] = {
      // (token, length, start)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
      var i = 0
      while (i < t.length) {
        var j = i
        while (j < t.length && t(j) == t(i)) j += 1
        out += ((t(i), j - i, i))
        i = j
      }
      out.toSeq
    }
    val rows = CorpusOpsQueries.tokenRuns(spark, sfDir).collect()
    assert(rows.length === toks.size)
    rows.foreach { r =>
      val t = toks(r.getAs[Long]("doc_id"))
      val rs = runsOf(t)
      val best = rs.maxBy { case (_, len, start) => (len, -start) }
      assert(r.getAs[Long]("n_tokens") === t.length.toLong)
      assert(r.getAs[Long]("n_runs") === rs.length.toLong)
      assert(r.getAs[Long]("max_run_len") === best._2.toLong)
      assert(r.getAs[String]("run_token") === best._1)
      assert(r.getAs[Long]("run_start") === best._3.toLong)
      assert(r.getAs[Long]("n_runs_ge3") === rs.count(_._2 >= 3).toLong)
      assert(r.getAs[Boolean]("looping") === (best._2 >= CorpusOpsQueries.RunLoopMin))
    }
    // the corpus genuinely contains consecutive repeats
    assert(rows.exists(_.getAs[Long]("max_run_len") >= 2L))
  }

  test("q177 curriculum positions are a permutation ordered easy-to-hard") {
    val rows = CorpusOpsQueries.curriculumLayout(spark, sfDir).collect()
    assert(rows.length === 500)
    // global positions are a permutation of 1..N
    assert(rows.map(_.getAs[Long]("cur_pos")).sorted.toSeq === (1L to 500L).toSeq)
    // bucket blocks are contiguous and ordered head < middle < tail
    def rangeOf(b: String) = {
      val ps = rows.filter(_.getAs[String]("bucket") == b).map(_.getAs[Long]("cur_pos"))
      (ps.min, ps.max, ps.length)
    }
    val present = rows.map(_.getAs[String]("bucket")).distinct
    val ordered = Seq("head", "middle", "tail").filter(present.contains)
    assert(ordered.size >= 2, "corpus must exercise multiple buckets")
    ordered.foldLeft(0L) { case (prevMax, b) =>
      val (mn, mx, n) = rangeOf(b)
      assert(mn === prevMax + 1, s"bucket $b not contiguous")
      assert(mx === prevMax + n)
      mx
    }
    // shard deal: shard/pos derive from cur_pos; every reader's stream
    // is cur_pos-increasing, i.e. its own easy-to-hard ramp
    rows.foreach { r =>
      val p = r.getAs[Long]("cur_pos") - 1
      assert(r.getAs[Long]("shard") === p % CorpusOpsQueries.CurricShards)
      assert(r.getAs[Long]("shard_pos") === p / CorpusOpsQueries.CurricShards)
    }
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    assert(byShard.size === CorpusOpsQueries.CurricShards.toInt)
    byShard.values.foreach { rs =>
      val sortedByPos = rs.sortBy(_.getAs[Long]("shard_pos"))
      val milliBuckets = sortedByPos.map(_.getAs[String]("bucket"))
      // within a shard, bucket labels never go backwards
      val ord = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
      assert(milliBuckets.map(ord).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    }
  }

  test("q172 skipgram lift matches an in-memory recompute at both gaps") {
    import graft.functions.TextFunctions.{fold, tokens}
    val toks = Tables.documents(spark, sfDir)
      .select(tokens(fold(col("text"))).as("t")).collect()
      .map(_.getSeq[String](0))
    val rows = CorpusOpsQueries.skipgramAssoc(spark, sfDir).collect()
    (1 to CorpusOpsQueries.SkipMaxGap).foreach { g =>
      val pairs = toks.flatMap(t => t.dropRight(g).zip(t.drop(g)))
      val cnt = pairs.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
      val cA = cnt.groupBy(_._1._1).map { case (a, xs) => a -> xs.values.sum }
      val cB = cnt.groupBy(_._1._2).map { case (b, xs) => b -> xs.values.sum }
      val nG = cnt.values.sum
      val scored = cnt.toSeq
        .filter(_._2 >= CorpusOpsQueries.SkipMinCount)
        .map { case ((a, b), cab) =>
          val lift = math.round(cab.toDouble * nG.toDouble /
            (cA(a).toDouble * cB(b).toDouble) * 1000000.0)
          (a, b, cab, cA(a), cB(b), lift)
        }
        .sortBy { case (a, b, _, _, _, l) => (-l, a, b) }
        .take(CorpusOpsQueries.SkipTopK)
      val got = rows.filter(_.getAs[Long]("gap") == g.toLong)
        .sortBy(_.getAs[Long]("rnk"))
      assert(got.length === scored.length, s"gap $g")
      got.zip(scored).foreach { case (r, (a, b, cab, ca, cb, l)) =>
        assert(r.getAs[String]("a") === a, s"gap $g")
        assert(r.getAs[String]("b") === b, s"gap $g")
        assert(r.getAs[Long]("c_ab") === cab)
        assert(r.getAs[Long]("c_a") === ca)
        assert(r.getAs[Long]("c_b") === cb)
        assert(r.getAs[Long]("lift_e6") === l)
      }
    }
    // the gap-2 list must surface an association the adjacent list
    // cannot: distance-2 pairs are a different relation
    val g1 = rows.filter(_.getAs[Long]("gap") == 1L).map(r =>
      (r.getAs[String]("a"), r.getAs[String]("b"))).toSet
    val g2 = rows.filter(_.getAs[Long]("gap") == 2L).map(r =>
      (r.getAs[String]("a"), r.getAs[String]("b"))).toSet
    assert(g2.nonEmpty && (g2 -- g1).nonEmpty)
  }

  private lazy val lmRows = CorpusOpsQueries.lmSurprisal(spark, sfDir).collect()

  test("q127 surprisal is floor-div consistent and buckets match thresholds") {
    assert(lmRows.length === 500)
    lmRows.foreach { r =>
      val (nt, tb) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("total_bits"))
      val milli = r.getAs[Long]("milli_bits_per_token")
      assert(nt > 0 && tb > 0)
      assert(milli === (1000L * tb) / nt)
      val expected =
        if (milli < CorpusOpsQueries.HeadMaxMilli) "head"
        else if (milli < CorpusOpsQueries.MiddleMaxMilli) "middle"
        else "tail"
      assert(r.getAs[String]("bucket") === expected)
    }
    // the near-uniform corpus pins most docs to the head bucket, but
    // rare-token docs must push into middle/tail (the CCNet split)
    val buckets = lmRows.map(_.getAs[String]("bucket")).toSet
    assert(buckets === Set("head", "middle", "tail"))
  }

  test("q127 rare-token docs score strictly above the uniform floor") {
    // docs containing the rare token ('dup', corpus count ~26 vs ~900
    // for every other token) must have higher surprisal than the
    // all-common-token floor of 5000 milli-bits
    val rareDocs = Tables.documents(spark, sfDir)
      .filter(col("text").contains("dup"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(rareDocs.nonEmpty)
    val floor = lmRows.filterNot(r => rareDocs.contains(r.getAs[Long]("doc_id")))
      .map(_.getAs[Long]("milli_bits_per_token")).max
    lmRows.filter(r => rareDocs.contains(r.getAs[Long]("doc_id"))).foreach { r =>
      assert(r.getAs[Long]("milli_bits_per_token") > floor)
    }
  }

  test("q128 LSH eval: perfect recall, bounded precision at this band config") {
    val r = CorpusOpsQueries.lshEval(spark, sfDir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_true") === 28L)
    assert(row.getAs[Long]("n_cand") === 77L)
    assert(row.getAs[Long]("n_hit") === 28L)
    assert(row.getAs[Long]("n_false_neg") === 0L)
    assert(row.getAs[Long]("recall_e6") === 1000000L)
    // 4x2 bands over-generate below-threshold candidates: precision
    // is deliberately < 1 (that's what the exact rescore is for)
    assert(row.getAs[Long]("precision_e6") < 1000000L)
    assert(row.getAs[Long]("n_hit") <=
      math.min(row.getAs[Long]("n_true"), row.getAs[Long]("n_cand")))
  }

  private lazy val oovRows = CorpusOpsQueries.vocabOov(spark, sfDir).collect()

  test("q129 OOV accounting respects the vocab size") {
    assert(oovRows.length === 500)
    oovRows.foreach { r =>
      val (nt, oov) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"))
      assert(oov <= nt)
      assert(r.getAs[Long]("n_oov_types") <= oov)
      // corpus has 31 distinct tokens; vocab keeps 16 → at most 15 OOV types
      assert(r.getAs[Long]("n_oov_types") <= 31L - CorpusOpsQueries.VocabSize)
      assert(r.getAs[Long]("oov_e6") ===
        math.round(1e6 * oov.toDouble / nt.toDouble))
    }
  }

  test("q129 plan: vocab joins broadcast, corpus never shuffle-joined for the probe") {
    val p = CorpusOpsQueries.vocabOov(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q130 DSIR weights separate target-language docs from the background") {
    val rows = CorpusOpsQueries.dsirWeights(spark, sfDir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      // integer div truncates toward zero on both engines (the hash
      // compare pins it); re-check the arithmetic here
      assert(r.getAs[Long]("per_token_dev_e6") ===
        r.getAs[Long]("weight_e6") / r.getAs[Long]("n_tokens"))
      assert(r.getAs[Boolean]("target_like") === (r.getAs[Long]("weight_e6") > 0L))
    }
    // the signal must discriminate: both classes present, and English
    // docs (the target) must average strictly higher than the rest
    val en = Tables.documents(spark, sfDir).filter(col("lang") === "en")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val (tgt, rest) = rows.partition(r => en.contains(r.getAs[Long]("doc_id")))
    assert(tgt.nonEmpty && rest.nonEmpty)
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Long]("per_token_dev_e6")).sum.toDouble / rs.length
    assert(mean(tgt) > mean(rest),
      s"target mean ${mean(tgt)} must exceed background mean ${mean(rest)}")
  }

  test("q131 epoch shuffle deals balanced shards with contiguous positions") {
    val rows = CorpusOpsQueries.epochShuffle(spark, sfDir).collect()
    assert(rows.length === 500)
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet === (0L until CorpusOpsQueries.ShuffleShards).toSet)
    // hash dealing balances: no shard more than 2x the smallest
    val sizes = byShard.values.map(_.length)
    assert(sizes.max <= 2 * sizes.min, s"shard sizes $sizes")
    byShard.values.foreach { rs =>
      val pos = rs.map(_.getAs[Long]("pos")).sorted
      assert(pos.toSeq === (1L to rs.length), "positions are contiguous per shard")
    }
    // a different seed is a different permutation
    val re = graft.operators.Curation.epochShuffle(
      Tables.documents(spark, sfDir), "doc_id", "ep2", CorpusOpsQueries.ShuffleShards)
      .select(col("doc_id"), col("shard")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val moved = rows.count(r => re(r.getAs[Long]("doc_id")) != r.getAs[Long]("shard"))
    assert(moved > 100, s"epoch reseed must reshuffle (only $moved docs moved)")
  }

  test("q133 classifier emits integer logits with both verdicts present") {
    val rows = CorpusOpsQueries.qualityClassifier(spark, sfDir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_feats") > 0)
      assert(r.getAs[Long]("milli_score") ===
        1000L * r.getAs[Long]("score_sum") / r.getAs[Long]("n_feats"))
      assert(r.getAs[Boolean]("keep") === (r.getAs[Long]("score_sum") >= 0L))
    }
    val verdicts = rows.map(_.getAs[Boolean]("keep")).toSet
    assert(verdicts === Set(true, false), "a useful threshold splits the corpus")
  }

  test("q133 plan: the model joins broadcast, the corpus never shuffles for it") {
    val p = CorpusOpsQueries.qualityClassifier(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q134 BM25 ranks 5 docs per query, rarity dominates the rare-term query") {
    val rows = CorpusOpsQueries.bm25(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === (0L to 9L).toSet)
    byQ.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq === (1L to rs.length))
      assert(rs.length === CorpusOpsQueries.Bm25TopK)
      val scores = sorted.map(_.getAs[Long]("score_e6")).toSeq
      assert(scores === scores.sorted.reverse, "ranked by descending score")
      assert(rs.forall(_.getAs[Long]("n_terms_hit") <= 2))
    }
    // query 9 carries the rare token 'dup': its rarity weight must put
    // dup-bearing docs at the top of that ranking
    val dupDocs = Tables.documents(spark, sfDir)
      .filter(col("text").contains("dup")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val top9 = byQ(9L).minBy(_.getAs[Long]("rnk")).getAs[Long]("doc_id")
    assert(dupDocs.contains(top9), "rare term dominates its query's top hit")
  }

  test("q134 plan: broadcast query probe + bounded-heap ranking, no ranking window") {
    val p = CorpusOpsQueries.bm25(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Window"), p)
  }

  test("q135 RRF fusion ranks integer-summed contributions from both lists") {
    val rows = CorpusOpsQueries.hybridRrf(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === (0L to 9L).toSet)
    // every contribution is round(1e6/(60+rank)) for rank 1..5
    val legal = (1 to CorpusOpsQueries.Bm25TopK)
      .map(r => math.round(1e6 / (60.0 + r))).toSet
    byQ.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq === (1L to rs.length))
      val scores = sorted.map(_.getAs[Long]("rrf_e6")).toSeq
      assert(scores === scores.sorted.reverse)
      rs.foreach { r =>
        assert(r.getAs[Boolean]("in_dense") || r.getAs[Boolean]("in_sparse"))
        val s = r.getAs[Long]("rrf_e6")
        val fromBoth = r.getAs[Boolean]("in_dense") && r.getAs[Boolean]("in_sparse")
        if (fromBoth) assert(legal.exists(a => legal.contains(s - a)))
        else assert(legal.contains(s), s"score $s must be a single-list contribution")
      }
    }
  }

  test("q136 pack audit: windows mix sources, accounting is consistent") {
    val rows = CorpusOpsQueries.packAudit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nd, ns) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_sources"))
      assert(ns >= 1 && ns <= nd)
      assert(r.getAs[Long]("top_source_docs") <= nd)
      assert(r.getAs[Long]("n_straddlers") <= nd)
      assert(r.getAs[Long]("dominant_e6") ===
        math.round(1e6 * r.getAs[Long]("top_source_docs").toDouble / nd))
    }
    // the shuffle's whole point: multi-doc windows usually mix sources
    val multi = rows.filter(_.getAs[Long]("n_docs") >= 2)
    assert(multi.nonEmpty)
    val mixed = multi.count(_.getAs[Long]("n_sources") >= 2)
    assert(mixed * 2 > multi.length,
      s"most multi-doc windows mix sources ($mixed of ${multi.length})")
  }

  test("q137 upsampling deals each domain's quota exactly across its docs") {
    val rows = CorpusOpsQueries.upsampleRepeats(spark, sfDir).collect()
    assert(rows.length === 500)
    // the whole budget is spent, no more, no less
    assert(rows.map(_.getAs[Long]("n_repeats")).sum ===
      CorpusOpsQueries.UpsampleBudget)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val quota = rs.head.getAs[Long]("quota")
      assert(rs.forall(_.getAs[Long]("quota") === quota))
      // per-domain repeats sum to the quota exactly
      assert(rs.map(_.getAs[Long]("n_repeats")).sum === quota)
      // every doc repeats base or base+1 times
      val base = rs.head.getAs[Long]("base_repeats")
      assert(rs.forall(r => {
        val n = r.getAs[Long]("n_repeats"); n == base || n == base + 1
      }))
    }
    // the budget (2000) exceeds the corpus (500): upsampling is real
    assert(rows.forall(_.getAs[Long]("n_repeats") >= 1L))
    assert(rows.exists(_.getAs[Long]("n_repeats") >= 4L))
  }

  test("q138 integer PageRank converges to a deterministic non-uniform ranking") {
    val rows = CorpusOpsQueries.domainPagerank(spark, sfDir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      // teleport floor: every node keeps at least the base mass
      assert(r.getAs[Long]("rank_e6") >= 150000L)
    }
    // the boilerplate graph is non-trivial: ranks differentiate
    assert(rows.map(_.getAs[Long]("rank_e6")).distinct.length > 1)
    // presentation order is (rank desc, source) — deterministic
    val ranks = rows.map(_.getAs[Long]("rank_e6")).toSeq
    assert(ranks === ranks.sorted.reverse)
    // bit-reproducible: a second evaluation is identical row for row
    val again = CorpusOpsQueries.domainPagerank(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("q139 power iteration yields a normalized, reproducible direction") {
    val rows = CorpusOpsQueries.pcaPower(spark, sfDir).collect()
    assert(rows.length === 64)
    val vs = rows.map(_.getAs[Long]("v_e6"))
    // L-inf normalized each round: the peak component sits near +-1e6
    val peak = vs.map(math.abs).max
    assert(peak >= 900000L && peak <= 1100000L, s"peak $peak")
    // a real direction, not a collapsed one
    assert(vs.count(_ != 0L) > 1)
    // bit-reproducible across evaluations
    val again = CorpusOpsQueries.pcaPower(spark, sfDir).collect()
      .map(_.getAs[Long]("v_e6"))
    assert(vs.toSeq === again.toSeq)
  }

  test("lineDedup matches an in-memory reference on random corpora") {
    // randomized corpora exercise edge cases the testdata can't:
    // all-duplicate docs, empty-after-trim segments, single-segment docs
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val segPool = (1 to 8).map(i => s"seg$i words here")
    (1 to 3).foreach { trial =>
      val docs = (0L until 30L).map { id =>
        val n = 1 + rng.nextInt(4)
        val body = (0 until n).map(_ => segPool(rng.nextInt(segPool.length)))
        (id, body.mkString(". "))
      }
      val df = docs.toDF("doc_id", "text")
      val out = graft.operators.Curation.lineDedup(df, "doc_id",
        split(col("text"), "\\. "), ". ", minDf = 2)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_segs"), r.getAs[Long]("n_removed"),
            r.getAs[String]("kept_text"))).toMap
      val segsOf = docs.map { case (id, t) =>
        id -> t.split("\\. ", -1).toSeq.map(_.trim).filter(_.nonEmpty) }.toMap
      val dfreq = segsOf.toSeq.flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (sg, xs) => sg -> xs.map(_._2).distinct.size }
      docs.foreach { case (id, _) =>
        val ss = segsOf(id)
        val (dup, kept) = ss.partition(sg => dfreq(sg) >= 2)
        val (nSegs, nRem, keptText) = out(id)
        assert(nSegs === ss.length.toLong, s"trial $trial doc $id")
        assert(nRem === dup.length.toLong, s"trial $trial doc $id")
        assert(keptText === kept.mkString(". "), s"trial $trial doc $id")
      }
    }
  }

  test("epochShuffle is a permutation with exact per-shard positions on random ids") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val ids = (0 until 200).map(_ => rng.nextLong().abs % 1000000L).distinct
    val df = ids.map(Tuple1(_)).toDF("doc_id")
    Seq("s1", "s2").foreach { seed =>
      val out = graft.operators.Curation.epochShuffle(df, "doc_id", seed, 4).collect()
      assert(out.length === ids.length, "every doc dealt exactly once")
      assert(out.map(_.getAs[Long]("doc_id")).toSet === ids.toSet)
      out.groupBy(_.getAs[Long]("shard")).foreach { case (sh, rs) =>
        assert(sh >= 0 && sh < 4)
        // positions are exactly 1..n in (key, id) order
        val byPos = rs.sortBy(_.getAs[Long]("pos"))
        assert(byPos.map(_.getAs[Long]("pos")).toSeq === (1L to rs.length))
        val keys = byPos.map(r => (r.getAs[Long]("shuffle_key"), r.getAs[Long]("doc_id")))
        assert(keys.toSeq === keys.sortBy(identity).toSeq)
      }
    }
  }

  test("upsampleRepeats spends arbitrary quotas exactly on random strata") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val docs = (0L until 120L).map(id => (id, s"s${rng.nextInt(6)}")).toDF("doc_id", "source")
    val quotas = (0 until 6).map(i => (s"s$i", 1L + rng.nextInt(400).toLong))
      .toDF("source", "quota")
    val out = graft.operators.Curation.upsampleRepeats(docs, "source", "doc_id", quotas)
      .collect()
    val want = quotas.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Long]("n_repeats")).sum === want(src),
        s"stratum $src must spend its quota exactly")
    }
  }

  test("q140 collocations rank by lift with count floors respected") {
    val rows = CorpusOpsQueries.collocations(spark, sfDir).collect()
    assert(rows.length === CorpusOpsQueries.CollocTopK)
    val lifts = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("lift_e6")).toSeq
    assert(lifts === lifts.sorted.reverse)
    rows.foreach { r =>
      assert(r.getAs[Long]("c_ab") >= CorpusOpsQueries.CollocMinCount)
      // a pair can't occur more often than either part
      assert(r.getAs[Long]("c_ab") <= r.getAs[Long]("c_a"))
      assert(r.getAs[Long]("c_ab") <= r.getAs[Long]("c_b"))
      assert(r.getAs[String]("bg").split(" ").length === 2)
    }
    // lift discriminates: the top pair beats the bottom pair strictly
    assert(lifts.head > lifts.last)
  }

  test("q132 span accounting is consistent and near the corruption rate") {
    val rows = CorpusOpsQueries.spanCorrupt(spark, sfDir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val (nt, nm, ns) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_masked"),
        r.getAs[Long]("n_spans"))
      assert(ns <= nm && nm <= nt)
      if (nm > 0) assert(ns >= 1)
      // each span costs one sentinel on each side
      assert(r.getAs[Long]("n_input_tokens") === nt - nm + ns)
      assert(r.getAs[Long]("n_target_tokens") === nm + ns)
    }
    val totTok = rows.map(_.getAs[Long]("n_tokens")).sum
    val totMask = rows.map(_.getAs[Long]("n_masked")).sum
    val rate = totMask.toDouble / totTok
    assert(rate > 0.10 && rate < 0.20,
      s"corpus mask rate $rate must sit near the 15% draw")
  }

  test("exactSubstrDedup matches an in-memory reference on random corpora") {
    // a 4-symbol vocabulary forces heavy gram duplication (64 possible
    // 3-grams vs ~300 occurrences) — overlapping deletions, fully
    // removed docs, and sub-k docs with no grams at all
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rng = new scala.util.Random(11)
    val pool = Array("a", "b", "c", "d")
    val k = 3
    (1 to 3).foreach { trial =>
      val docs = (0L until 30L).map { id =>
        val n = 1 + rng.nextInt(15)
        (id, (0 until n).map(_ => pool(rng.nextInt(pool.length))).mkString(" "))
      }
      val out = graft.operators.Curation
        .exactSubstrDedup(docs.toDF("doc_id", "text"), "text", "doc_id", k)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
            r.getAs[Long]("n_spans"), r.getAs[String]("kept_md5"))).toMap
      // reference: every non-first occurrence (by (doc, pos)) of a
      // duplicated gram deletes its range; union ranges per doc
      val toksOf = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val occ = docs.flatMap { case (id, _) =>
        val ts = toksOf(id)
        (0 to ts.length - k).map(p => (ts.slice(p, p + k).mkString(" "), id, p))
      }
      val deleted = occ.groupBy(_._1).values.toSeq
        .flatMap(os => os.sortBy(o => (o._2, o._3)).drop(1).filter(_ => os.size > 1))
      val remOf = deleted.groupBy(_._2).map { case (id, os) =>
        id -> os.flatMap(o => o._3 until o._3 + k).toSet }
      docs.foreach { case (id, _) =>
        val ts = toksOf(id)
        val rem = remOf.getOrElse(id, Set.empty[Int])
        val spans = ts.indices.count(i => rem(i) && !rem(i - 1))
        val kept = ts.indices.filterNot(rem).map(ts).mkString(" ")
        assert(out(id) === ((ts.length.toLong, rem.size.toLong,
          spans.toLong, md5hex(kept))), s"trial $trial doc $id")
      }
    }
  }

  test("q149 datasheet partitions the corpus exactly") {
    val rows = CorpusOpsQueries.datasheet(spark, sfDir).collect()
    // strata partition the corpus: doc counts add up to the full table
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    rows.foreach { r =>
      val (nd, nt) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("dup_docs") <= nd)
      assert(r.getAs[Long]("short_docs") <= nd)
      assert(r.getAs[Long]("vocab") <= nt)
      assert(r.getAs[Long]("mean_len_e6") === nt * 1000000L / nd)
    }
  }

  test("q150 overlap matrix is upper-triangular with positive counts") {
    val rows = CorpusOpsQueries.sourceOverlap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(a <= b, s"$a > $b")
      assert(r.getAs[Long]("shared_segs") >= 1L)
    }
    // cross-source sharing exists (boilerplate segments span sources)
    assert(rows.exists(r =>
      r.getAs[String]("source_a") != r.getAs[String]("source_b")))
  }

  test("q148 chunking tiles every doc with the declared overlap") {
    val rows = CorpusOpsQueries.chunkOverlap(spark, sfDir).collect()
    val (c, s) = (CorpusOpsQueries.ChunkSize, CorpusOpsQueries.ChunkStride)
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, chunks) =>
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_id"))
      // chunk ids are dense from 0; starts advance by the stride
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_id") === i.toLong)
        assert(r.getAs[Long]("chunk_start") === 1L + i.toLong * s)
        val len = r.getAs[Long]("chunk_len")
        assert(len >= 1 && len <= c)
        val ov = r.getAs[Long]("overlap_prev")
        // overlap = min(c - s, remaining tokens), zero only on chunk 0
        if (i == 0) assert(ov === 0L)
        else assert(ov === math.min((c - s).toLong, len))
      }
    }
    // every doc's chunks cover exactly its tokens: Σ(len) - Σ(overlap) = n
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(
          graft.functions.TextFunctions.fold(col("text")))).cast("long").as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, chunks) =>
      val covered = chunks.map(r =>
        r.getAs[Long]("chunk_len") - r.getAs[Long]("overlap_prev")).sum
      assert(covered === docs(id), s"doc $id covers $covered of ${docs(id)}")
    }
  }

  test("q199 interleave matches a driver-side team-draft transcription") {
    import graft.queries.{CorpusOpsQueries, SimilarityQueries}
    import graft.operators.{Curation, Similarity}
    val emb = Tables.embeddings(spark, sfDir)
    val K = CorpusOpsQueries.InterleaveK
    val dense = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < SimilarityQueries.QuerySetBound),
      emb.filter(col("vec_id") >= SimilarityQueries.QuerySetBound), K)
      .collect().map(r => (r.getAs[Long]("q_vec_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("vec_id")))
    val qt = spark.createDataFrame(CorpusOpsQueries.Bm25Queries).toDF("query_id", "term")
    val sparse = Curation.bm25TopK(Tables.documents(spark, sfDir), "text", "doc_id", qt, K)
      .collect().map(r => (r.getAs[Number]("query_id").longValue, r.getAs[Long]("rnk"),
        r.getAs[Long]("doc_id")))
    def listOf(xs: Array[(Long, Long, Long)], q: Long): Seq[Long] =
      xs.filter(_._1 == q).sortBy(_._2).map(_._3).toSeq
    def coin(q: Long, r: Int): String = {
      // the PolyHash fold: seeded with the first char code, then
      // (a*31 + code) % 1000000007 per char
      val codes = s"$q:r$r".map(_.toLong)
      val h = codes.reduce((a, b) => (a * 31 + b) % 1000000007L)
      if (h % 2 == 0) "dense" else "sparse"
    }
    val queries = (dense.map(_._1) ++ sparse.map(_._1)).distinct.sorted
    val expected = queries.flatMap { q =>
      val lists = Map("dense" -> listOf(dense, q), "sparse" -> listOf(sparse, q))
      val taken = scala.collection.mutable.LinkedHashSet.empty[(Long, String, Long)]
      val used = scala.collection.mutable.HashSet.empty[Long]
      for (t <- 1 to 2 * K) {
        val r = (t + 1) / 2
        val first = coin(q, r)
        val team = if (t % 2 == 1) first
          else (if (first == "dense") "sparse" else "dense")
        val ranked = lists(team).zipWithIndex.filterNot { case (it, _) => used(it) }
        ranked.headOption.foreach { case (it, idx) =>
          used += it; taken += ((it, team, idx + 1L))
        }
      }
      taken.toSeq.zipWithIndex.map { case ((it, team, tr), i) =>
        (q, i + 1L) -> ((it, team, tr))
      }
    }.toMap
    val rows = CorpusOpsQueries.teamDraft(spark, sfDir).collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("slot"))
      val (it, team, tr) = expected(key)
      assert(r.getAs[Long]("item_id") === it, s"item at $key")
      assert(r.getAs[String]("team") === team, s"team at $key")
      assert(r.getAs[Long]("team_rank") === tr, s"rank at $key")
    }
    // both teams get slots somewhere, and overlap dedup happens
    assert(rows.exists(_.getAs[String]("team") == "dense"))
    assert(rows.exists(_.getAs[String]("team") == "sparse"))
  }
}
