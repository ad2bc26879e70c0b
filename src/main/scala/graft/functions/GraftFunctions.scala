package graft.functions

import org.apache.spark.sql.{Column, GraftInternals}

import graft.expressions.{AdminIntervals, CountMembers, IntervalAdjacent, RepairSelector, SlicePhash, StreamSignals, TokenCharStarts, TokenPrefixStarts, TokenShingles}

/** Column wrappers over graft's native codegen'd expressions — the
  * text-geometry family that replaced interpreted higher-order-function
  * folds on the hottest corpus scans (q15/q16/q59/q61/q92). */
object GraftFunctions {

  /** Prefix char offsets of each token under space-joined geometry
    * (n + 1 entries, long). */
  def tokenPrefixStarts(toks: Column): Column =
    GraftInternals.column(TokenPrefixStarts(GraftInternals.expression(toks)))

  /** Char intervals [s, e) of tokens that are members of `words`. */
  def adminIntervals(toks: Column, words: Seq[String]): Column =
    GraftInternals.column(AdminIntervals(GraftInternals.expression(toks), words))

  /** exists interval [s, e] within [lo, hi] (all long). */
  def intervalAdjacent(intervals: Column, lo: Column, hi: Column): Column =
    GraftInternals.column(IntervalAdjacent(
      GraftInternals.expression(intervals),
      GraftInternals.expression(lo), GraftInternals.expression(hi)))

  /** Code-point positions where a token starts in folded text. */
  def tokenCharStarts(folded: Column): Column =
    GraftInternals.column(TokenCharStarts(GraftInternals.expression(folded)))

  /** Malformed-CSS-selector auto-repair (scraper.py:522-554). */
  def repairSelector(query: Column): Column =
    GraftInternals.column(RepairSelector(GraftInternals.expression(query)))

  /** Space-joined n-token shingles; empty array below n tokens. */
  def tokenShingles(toks: Column, n: Int): Column =
    GraftInternals.column(TokenShingles(GraftInternals.expression(toks), n))

  /** 16-slice perceptual-hash stub over a payload (multimodal near-dup key). */
  def slicePhash(payload: Column): Column =
    GraftInternals.column(SlicePhash(GraftInternals.expression(payload)))

  /** Count of tokens that are members of `words`. */
  def countMembers(toks: Column, words: Seq[String]): Column =
    GraftInternals.column(CountMembers(GraftInternals.expression(toks), words))

  /** Per-token context-gazetteer signals + anchored grams, one pass;
    * emitSentence additionally carries each token's space-joined
    * sentence text (the occurrence-sentence view). */
  def streamSignals(toks: Column, breakToken: String, adminWords: Seq[String],
      stateUf: Seq[(String, String)], windowChars: Long, maxN: Int,
      emitSentence: Boolean = false): Column =
    GraftInternals.column(StreamSignals(GraftInternals.expression(toks),
      breakToken, adminWords, stateUf, windowChars, maxN, emitSentence))
}
