package graft

import graft.queries.ScaleOpsQueries

/** q108-q110: the scale-path primitives — portable Bloom filter,
  * SQ8 scalar-quantized ANN, sliding-window chunking. */
class ScaleOpsSpec extends SparkSpec {

  private lazy val bloomRows =
    ScaleOpsQueries.bloomFilter(spark, sfDir).collect()

  test("q108 bloom has no false negatives and measurable false positives") {
    assert(bloomRows.nonEmpty)
    // every exact hit must also be a bloom hit (bloom guarantees no FN)
    bloomRows.foreach { r =>
      assert(r.getAs[Long]("n_bloom_hits") >= r.getAs[Long]("n_true_hits"))
      assert(r.getAs[Long]("n_false_pos") ===
        r.getAs[Long]("n_bloom_hits") - r.getAs[Long]("n_true_hits"))
    }
    // the filter is a real bloom, not an exact set: FPs exist corpus-wide
    assert(bloomRows.map(_.getAs[Long]("n_false_pos")).sum > 0)
    // eval docs are never probed
    assert(bloomRows.forall(_.getAs[Long]("doc_id") % 97 != 0))
  }

  test("q108 plan: bloom words broadcast, corpus never shuffle-joined") {
    val p = ScaleOpsQueries.bloomFilter(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q109 SQ8 ranks are contiguous and cosine-descending per query") {
    val rows = ScaleOpsQueries.sq8Ann(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_vec_id"))
    assert(byQ.size === 10)
    byQ.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq === (1L to rs.length))
      val cos = sorted.map(_.getAs[Long]("cos_e6")).toSeq
      assert(cos === cos.sorted.reverse, "rescore must rank by exact cosine")
      assert(rs.forall(_.getAs[Long]("vec_id") >= 10), "corpus results only")
    }
  }

  test("q109 shortlist rescore agrees with exact search on the top hit") {
    // SQ8 keeps near-exact recall: the rank-1 result must equal the
    // exact integer-cosine argmax over the full corpus
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val exact = graft.operators.Similarity.exactRescoreTopK(
      emb.filter(col("vec_id") < 10).select(col("vec_id").as("q_vec_id"))
        .crossJoin(emb.filter(col("vec_id") >= 10).select(col("vec_id"))),
      emb.filter(col("vec_id") < 10), emb.filter(col("vec_id") >= 10), 1)
      .collect().map(r => r.getAs[Long]("q_vec_id") -> r.getAs[Long]("vec_id")).toMap
    val sq = ScaleOpsQueries.sq8Ann(spark, sfDir).collect()
      .filter(_.getAs[Long]("rnk") == 1L)
      .map(r => r.getAs[Long]("q_vec_id") -> r.getAs[Long]("vec_id")).toMap
    val agree = sq.count { case (q, v) => exact.get(q).contains(v) }
    assert(agree >= 8, s"SQ8 top-1 agreed on only $agree/10 queries")
  }

  test("q110 chunk geometry: stride starts, bounded windows, full cover") {
    val rows = ScaleOpsQueries.chunkWindows(spark, sfDir).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("chunk_ord"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_ord") === i)
        assert(r.getAs[Long]("start_tok") === i * ScaleOpsQueries.ChunkStride)
        val n = r.getAs[Long]("n_chunk_toks")
        assert(n > 0 && n <= ScaleOpsQueries.ChunkWindow)
        // a non-last chunk always has more than one stride of tokens
        // (otherwise no further start position would exist)
        if (i < sorted.length - 1) assert(n > ScaleOpsQueries.ChunkStride)
      }
    }
  }

  test("q171 CMS never undercounts, collides at width 32, and matches exact top-k") {
    import graft.functions.TextFunctions.{fold, tokens}
    import org.apache.spark.sql.functions._
    val rows = ScaleOpsQueries.cmsHeavyHitters(spark, sfDir).collect()
    assert(rows.length === ScaleOpsQueries.CmsTopK)
    // the defining CMS guarantee: estimate >= exact, always
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact"))
      assert(r.getAs[Long]("overcount") === r.getAs[Long]("cms_est") - r.getAs[Long]("exact"))
    }
    // width 32 against this vocabulary must produce real collisions —
    // otherwise the eval measures nothing
    assert(rows.exists(_.getAs[Long]("overcount") > 0L),
      "expected at least one colliding heavy hitter at width 32")
    // the ranked heavy hitters are the true exact top-k
    val exact = Tables.documents(spark, sfDir)
      .select(explode(tokens(fold(col("text")))).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }.take(ScaleOpsQueries.CmsTopK)
    rows.sortBy(_.getAs[Long]("rnk")).zip(exact).foreach { case (r, (t, c)) =>
      assert(r.getAs[String]("tok") === t)
      assert(r.getAs[Long]("exact") === c)
    }
  }

  test("q171 plan: counter probe is a broadcast join, no corpus-scale sort") {
    val p = ScaleOpsQueries.cmsHeavyHitters(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("TopKPerKey"), p)
  }

  test("q252 curve: every arm recomputed from exact counts via driver-side CMS") {
    import graft.functions.TextFunctions.{fold, tokens}
    import graft.functions.Hashing
    import org.apache.spark.sql.functions._
    val rows = ScaleOpsQueries.cmsCurve(spark, sfDir)
      .collect().sortBy(r => (r.getAs[Long]("cells"), r.getAs[Long]("width")))
    assert(rows.length === ScaleOpsQueries.CmsSweep.length)

    // independent truth: exact token counts collected, each arm's CMS
    // simulated driver-side with the same affine family
    val counts = Tables.documents(spark, sfDir)
      .select(explode(tokens(fold(col("text")))).as("tok"))
      .filter(col("tok").isNotNull)
      .groupBy("tok").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def polyHash(t: String): Long =
      t.codePoints().toArray.foldLeft(0L)((a, c) => (a * Hashing.Base + c) % Hashing.Mod)
    val totalN = counts.map(_._2).sum
    rows.zip(ScaleOpsQueries.CmsSweep.map { case (w, d) => (w.toLong, d.toLong) }
        .sortBy { case (w, d) => (w * d, w) }).foreach { case (r, (w, d)) =>
      assert(r.getAs[Long]("width") === w)
      assert(r.getAs[Long]("depth") === d)
      assert(r.getAs[Long]("cells") === w * d)
      val cellSum = scala.collection.mutable.Map.empty[(Long, Long), Long]
      val cellOf = counts.map { case (t, c) =>
        val hs = polyHash(t)
        val cs = (0L until d).map { dep =>
          val cell = (Hashing.hashA(dep.toInt) * hs + Hashing.hashB(dep.toInt)) % Hashing.Mod % w
          cellSum((dep, cell)) = cellSum.getOrElse((dep, cell), 0L) + c
          cell
        }
        (t, c, cs)
      }
      val overs = cellOf.map { case (_, c, cs) =>
        cs.zipWithIndex.map { case (cell, dep) => cellSum((dep.toLong, cell)) }.min - c
      }
      // the defining guarantee: CMS never undercounts
      assert(overs.forall(_ >= 0L))
      assert(r.getAs[Long]("n_tokens") === counts.length.toLong)
      assert(r.getAs[Long]("sum_exact") === totalN)
      assert(r.getAs[Long]("sum_over") === overs.sum)
      assert(r.getAs[Long]("max_over") === overs.max)
      assert(r.getAs[Long]("mean_over_e6") ===
        math.round(overs.sum.toDouble / totalN * 1e6))
      assert(r.getAs[Long]("n_over_bound") ===
        overs.count(o => o * w > 2L * totalN).toLong)
    }
    // the curve's reason to exist: the widest sketch dominates the
    // narrowest on mean error
    assert(rows.last.getAs[Long]("mean_over_e6") <
      rows.head.getAs[Long]("mean_over_e6"))
  }
}
