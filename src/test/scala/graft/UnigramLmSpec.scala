package graft

import org.apache.spark.sql.functions._

import graft.queries.TokenizerQueries

/** q185: unigram-LM Viterbi segmentation — full driver-side
  * transcription (vocab build, bit costs, DP with the total
  * tie-break) plus reassembly invariants. */
class UnigramLmSpec extends SparkSpec {

  private lazy val rows = TokenizerQueries.unigramSegment(spark, sfDir).collect()

  test("q185 matches a driver-side transcription of the unigram pipeline") {
    val words = Tables.documents(spark, sfDir).select(col("text")).collect()
      .flatMap(_.getString(0).toLowerCase.split("[^a-z]+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val P = graft.operators.UnigramLm.MaxPieceLen
    // piece counts: every substring occurrence weighted by word freq
    val pieceCnt = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, f) =>
      for (l <- 1 to math.min(P, w.length); s <- 0 to w.length - l)
        pieceCnt.updateWith(w.substring(s, s + l))(o => Some(o.getOrElse(0L) + f))
    }
    val ranked = pieceCnt.toSeq.sortBy { case (p, c) => (-c, p) }
    val top = ranked.take(TokenizerQueries.UnigramTopV).map(_._1).toSet
    val vocab0 = pieceCnt.filter { case (p, _) => p.length == 1 || top(p) }
    val t = vocab0.values.sum
    def bitsOf(c: Long): Long =
      java.lang.Long.toBinaryString(t).length.toLong - java.lang.Long.toBinaryString(c).length
    val bits = vocab0.map { case (p, c) => p -> bitsOf(c) }
    // Viterbi carrying (cost, np, seg) with the total tie-break
    def segment(w: String): (Long, Long, String) = {
      val dp = Array.fill[Option[(Long, Long, String)]](w.length + 1)(None)
      dp(0) = Some((0L, 0L, ""))
      for (i <- 1 to w.length) {
        val cands = for {
          j <- math.max(0, i - P) until i
          prev <- dp(j)
          piece = w.substring(j, i)
          b <- bits.get(piece)
        } yield (prev._1 + b, prev._2 + 1,
          if (prev._3.isEmpty) piece else prev._3 + " " + piece)
        dp(i) = Some(cands.minBy(c => (c._1, c._2, c._3)))
      }
      dp(w.length).get
    }
    assert(rows.length === words.size)
    rows.foreach { r =>
      val w = r.getAs[String]("word")
      val (cost, np, seg) = segment(w)
      assert(r.getAs[Long]("freq") === words(w))
      assert(r.getAs[Long]("n_chars") === w.length.toLong)
      assert(r.getAs[Long]("cost_bits") === cost, s"cost of '$w'")
      assert(r.getAs[Long]("n_pieces") === np, s"pieces of '$w'")
      assert(r.getAs[String]("seg") === seg, s"segmentation of '$w'")
    }
  }

  test("q185 segmentations reassemble their words from vocab pieces") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pieces = r.getAs[String]("seg").split(" ")
      assert(pieces.mkString === r.getAs[String]("word"))
      assert(pieces.length.toLong === r.getAs[Long]("n_pieces"))
      assert(pieces.forall(_.length <= graft.operators.UnigramLm.MaxPieceLen))
    }
    // multi-char pieces must actually get used — the vocabulary beats
    // the char-by-char fallback somewhere or the DP is vacuous
    assert(rows.exists(r => r.getAs[Long]("n_pieces") < r.getAs[Long]("n_chars")))
  }
}
