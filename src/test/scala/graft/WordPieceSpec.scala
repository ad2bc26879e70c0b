package graft

import org.apache.spark.sql.functions._

import graft.queries.TokenizerQueries

/** q209: WordPiece greedy longest-match — transcription parity against
  * a literal driver-side implementation, plus reassembly invariants. */
class WordPieceSpec extends SparkSpec {

  private def dictionary: Map[String, Long] =
    Tables.documents(spark, sfDir)
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("word"))
      .filter(col("word") =!= "").groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("q209 matches a driver transcription of vocab build + greedy walk") {
    val words = dictionary.keySet.filter(_.length <= TokenizerQueries.WpMaxWordLen)
    // vocab: all single chars; length 2..4 substrings in >= WpMinDf words
    val cand = for {
      w <- words.toSeq; s <- 1 to w.length
      l <- 1 to math.min(TokenizerQueries.WpMaxPieceLen, w.length - s + 1)
    } yield (w.substring(s - 1, s - 1 + l), s > 1, w)
    val vocab = cand.groupBy(c => (c._1, c._2)).toSeq
      .collect { case ((p, cont), cs)
        if p.length == 1 || cs.map(_._3).distinct.size >= TokenizerQueries.WpMinDf =>
        (p, cont)
      }.toSet
    def encode(w: String): Seq[String] = {
      var pos = 0
      val out = Seq.newBuilder[String]
      while (pos < w.length) {
        val cands = (1 to math.min(TokenizerQueries.WpMaxPieceLen, w.length - pos))
          .filter(l => vocab((w.substring(pos, pos + l), pos > 0)))
        assert(cands.nonEmpty, s"word $w pos $pos")
        val maxL = cands.max
        out += (if (pos > 0) "##" else "") + w.substring(pos, pos + maxL)
        pos += maxL
      }
      out.result()
    }
    val rows = TokenizerQueries.wordpieceSegment(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet === words)
    rows.foreach { r =>
      val w = r.getString(0)
      val exp = encode(w)
      assert(r.getAs[Long]("n_pieces") === exp.length.toLong, w)
      assert(r.getAs[String]("seg") === exp.mkString(" "), w)
      assert(r.getAs[Long]("freq") === dictionary(w))
      assert(r.getAs[Long]("n_chars") === w.length.toLong)
      // pieces reassemble the word exactly
      assert(exp.map(_.stripPrefix("##")).mkString === w, w)
      // only the first piece is continuation-free
      assert(!exp.head.startsWith("##") && exp.tail.forall(_.startsWith("##")), w)
    }
  }
}
