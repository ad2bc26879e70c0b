package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame}

import graft.plans.Plans

/** Unigram-LM subword segmentation (Kudo 2018, the SentencePiece
  * algorithm) — the OTHER mainstream tokenizer next to BPE
  * (operators/Bpe.scala): instead of greedy merge rules, a piece
  * vocabulary with costs and an exact Viterbi decomposition of every
  * word into the minimum-cost piece sequence.
  *
  * Engine-exact by construction: piece costs are the integer floor-log2
  * surrogate `len(bin(total)) - len(bin(count))` (the q127 trick — no
  * transcendental ln enters any compared value), and the Viterbi
  * tie-break is lexicographic on (cost, piece count, segmentation
  * string), so both engines pick the identical decomposition.
  *
  * Scale shape: everything is DICTIONARY-sized. The corpus is touched
  * once to build the (word, freq) dictionary; candidate pieces explode
  * bounded substrings of distinct words; the vocabulary is a bounded
  * top-V through TopKPerKeyExec; and the DP runs `MaxWordLen` rounds,
  * each a dictionary-sized join against the broadcast vocabulary with
  * a bounded k=1 heap per word — the BPE trainer's iteration budget
  * shape, with the corpus-side encode being (as with BPE) one
  * broadcast-dictionary join afterwards. */
object UnigramLm {

  val MaxPieceLen = 4
  val MaxWordLen = 12

  /** Candidate pieces: every substring of length 1..MaxPieceLen of
    * every dictionary word, count = Σ word freq per occurrence. */
  def pieceCounts(words: DataFrame): DataFrame =
    words
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), least(length(col("word")), lit(MaxPieceLen)))).as("l"))
      .select(col("word"), col("freq"), col("l"),
        explode(sequence(lit(1), length(col("word")) - col("l") + 1)).as("st"))
      .select(expr("substring(word, st, l)").as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** Piece vocabulary: the global top-`topV` pieces by (count desc,
    * piece asc) PLUS every single character (so any word remains
    * segmentable), with integer bit costs against the kept-vocab mass. */
  def pieceVocab(words: DataFrame, topV: Int): DataFrame = {
    val pieces = Dedup.stage(pieceCounts(words))
    val g = pieces.withColumn("g", lit(1))
    val top = Plans.topKPerKeyRanked(g, Seq(g("g")),
      Seq((g("cnt"), true), (g("piece"), false)), topV, "rn")
      .select(col("piece"), col("cnt"))
    val vocab0 = top
      .union(pieces.filter(length(col("piece")) === 1).select(col("piece"), col("cnt")))
      .dropDuplicates("piece")
    val tot = vocab0.agg(sum(col("cnt")).as("t"))
    vocab0.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        (length(bin(col("t"))) - length(bin(col("cnt")))).cast("long").as("bits"))
  }

  /** Exact Viterbi decomposition of every dictionary word: forward DP
    * over end positions, each round extending states at positions
    * i-MaxPieceLen..i-1 by one vocabulary piece and keeping the
    * (cost, np, seg)-minimal state per word through a bounded k=1
    * heap. States carry the segmentation string itself, so no
    * backtracking pass is needed and the tie-break is total. */
  def viterbiSegment(words: DataFrame, vocab: DataFrame): DataFrame = {
    val w = Dedup.stage(words.withColumn("len", length(col("word")).cast("long")))
    val vb = broadcast(vocab.select(col("piece"), col("bits")))
    // rounds beyond the longest word are dead joins — the probe is a
    // 1-row dictionary-sized collect (the BPE argmax precedent), and
    // MaxWordLen stays the contract bound the oracle unrolls to
    val maxLen = math.min(MaxWordLen,
      w.agg(max(col("len"))).collect()(0).getLong(0).toInt)
    var dp = Dedup.stage(w.select(col("word"), lit(0L).as("pos"),
      lit(0L).as("cost"), lit(0L).as("np"), lit("").as("seg")))
    for (i <- 1 to maxLen) {
      val cand = dp
        .filter(col("pos") >= lit((i - MaxPieceLen).toLong) && col("pos") <= lit((i - 1).toLong))
        .join(w.select(col("word"), col("len")), Seq("word"))
        .filter(col("len") >= i)
        .withColumn("piece", expr(s"substring(word, pos + 1, $i - pos)"))
        .join(vb, Seq("piece"))
        .select(col("word"),
          (col("cost") + col("bits")).as("cost"),
          (col("np") + 1L).as("np"),
          when(col("seg") === "", col("piece"))
            .otherwise(concat(col("seg"), lit(" "), col("piece"))).as("seg"))
      val best = Plans.topKPerKeyRanked(cand, Seq(cand("word")),
        Seq((cand("cost"), false), (cand("np"), false), (cand("seg"), false)), 1, "r")
        .select(col("word"), lit(i.toLong).as("pos"), col("cost"), col("np"), col("seg"))
      dp = Dedup.stage(dp.union(best))
    }
    dp.join(w, Seq("word")).filter(col("pos") === col("len"))
      .select(col("word"), col("freq"), col("len").as("n_chars"),
        col("np").as("n_pieces"), col("cost").as("cost_bits"), col("seg"))
  }
}
