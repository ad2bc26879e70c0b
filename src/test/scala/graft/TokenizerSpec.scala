package graft

import graft.queries.TokenizerQueries

/** q121: BPE merge training. Ground truth is a literal in-memory BPE
  * over the same word-frequency dictionary: count adjacent pairs,
  * take (max count, lexicographically smallest) and merge greedily
  * left-to-right, repeated MergeRounds times. */
class TokenizerSpec extends SparkSpec {

  private def referenceBpe(words: Map[String, Long], rounds: Int): Seq[(String, String, Long)] = {
    var dict: Map[Vector[String], Long] =
      words.toSeq.groupBy(_._1.map(_.toString).toVector)
        .map { case (k, vs) => k -> vs.map(_._2).sum }
    val out = Seq.newBuilder[(String, String, Long)]
    (1 to rounds).foreach { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      val ((a, b), n) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
      out += ((a, b, n))
      dict = dict.toSeq.map { case (syms, f) =>
        val merged = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            merged += (a + b); i += 2
          } else { merged += syms(i); i += 1 }
        }
        (merged.result(), f)
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    }
    out.result()
  }

  test("merge table equals a literal in-memory BPE over the same dictionary") {
    val words = Tables.documents(spark, sfDir)
      .selectExpr("explode(split(lower(text), '[^a-z]+')) AS w")
      .where("w <> ''").groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceBpe(words, TokenizerQueries.MergeRounds)
    val got = TokenizerQueries.bpeMerges(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("round"))
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym"),
        r.getAs[Long]("pair_count"))).toSeq
    assert(got == expected, s"$got != $expected")
    // merged column is the concatenation and at least one later round
    // merges a multi-char symbol (a product of an earlier merge)
    val rows = TokenizerQueries.bpeMerges(spark, sfDir).collect()
    assert(rows.forall(r => r.getAs[String]("merged") ==
      r.getAs[String]("left_sym") + r.getAs[String]("right_sym")))
    assert(rows.exists(r => r.getAs[String]("left_sym").length > 1 ||
      r.getAs[String]("right_sym").length > 1),
      "no round consumed a previously merged symbol")
  }

  test("q152: stratum fertility reconciles with q125's per-doc totals and respects bounds") {
    import org.apache.spark.sql.functions._
    val strata = TokenizerQueries.fertility(spark, sfDir).cache()
    val docs = TokenizerQueries.bpeEncode(spark, sfDir)
    // every word occurrence lands in exactly one stratum: totals match
    val st = strata.agg(sum(col("n_words")), sum(col("n_tokens")), sum(col("n_syms"))).head()
    val dt = docs.agg(sum(col("n_words")), sum(col("n_tokens")), sum(col("n_syms"))).head()
    assert(st.getLong(0) === dt.getLong(0))
    assert(st.getLong(1) === dt.getLong(1))
    assert(st.getLong(2) === dt.getLong(2))
    // a word costs at least one token; a token carries at least one char
    assert(strata.filter(col("fertility_e6") < 1000000L).count() === 0)
    assert(strata.filter(col("chars_per_tok_e6") < 1000000L).count() === 0)
    // merges actually compress: overall fertility strictly below chars/word
    assert(strata.filter(col("n_tokens") >= col("n_syms")).count() === 0)
    strata.unpersist()
  }

  test("q200 vocab curve is monotone and reconciles with a driver count") {
    import org.apache.spark.sql.functions._
    import graft.queries.TokenizerQueries
    val rows = TokenizerQueries.vocabCurve(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("vocab_size")).toSeq ===
      TokenizerQueries.VocabCurveSizes)
    def foldText(t: String): String = {
      val hyphens = "-\u2010\u2011\u2012\u2013\u2014\u2015"
      val noHyphen = t.map(c => if (hyphens.contains(c)) ' ' else c)
        .filterNot(_ == '\u00ad')
      java.text.Normalizer.normalize(noHyphen, java.text.Normalizer.Form.NFD)
        .replaceAll("\\p{M}", "").toLowerCase
    }
    val counts = Tables.documents(spark, sfDir).select(col("text")).collect()
      .flatMap(r => foldText(r.getString(0)).trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }
    val total = counts.values.sum
    rows.foreach { r =>
      val v = r.getAs[Long]("vocab_size").toInt
      val oov = ranked.drop(v).map(_._2).sum
      assert(r.getAs[Long]("n_types") === counts.size.toLong)
      assert(r.getAs[Long]("n_tokens") === total)
      assert(r.getAs[Long]("covered_types") === math.min(v, counts.size).toLong)
      assert(r.getAs[Long]("oov_tokens") === oov, s"oov at v=$v")
      assert(r.getAs[Long]("oov_rate_e6") === oov * 1000000L / total)
    }
    val oovs = rows.map(_.getAs[Long]("oov_tokens")).toSeq
    assert(oovs.zip(oovs.tail).forall { case (a, b) => b <= a },
      "a bigger vocabulary can only cover more")
  }
}
