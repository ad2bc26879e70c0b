package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.TextFunctions._

/** Mention disambiguation — the reference's `disambiguate_city`
  * decision tree (extraction/disambiguation.py:88) re-expressed as one
  * join + one aggregate:
  *
  *  1. an explicit hint next to the mention (the "Cidade-UF" suffix,
  *     gazetteer.py:85) filters candidates first; a hint matching no
  *     candidate short-circuits to `unknown_ctx` (the unknown_uf path,
  *     confidence 0.4);
  *  2. document-level context signals (the state-mention set,
  *     normalization.py:146) narrow a still-plural candidate set;
  *  3. a single survivor is `resolved` (0.95), anything else is
  *     `ambiguous` (0.5).
  *
  * Confidences are integer milli-units of the reference's constants
  * (disambiguation.py:41-44). Candidate "UFs" are context words from
  * the corpus vocabulary; ambiguity is real (surfaces map to multiple
  * catalog entries).
  */
object Disambiguation {

  /** (surface, cand_id, ctx) — surfaces with >1 entry are ambiguous. */
  val Catalog: Seq[(String, Int, String)] = Seq(
    ("merge", 201, "join"), ("merge", 202, "stream"),
    ("scan", 203, "batch"), ("scan", 204, "window"),
    ("sort", 205, "batch"), ("filter", 206, "window"))

  /** Surfaces marked ambiguous-out-of-context (disambiguation.py:33
    * `_AMBIGUOUS_SURFACES`): even with a single surviving candidate,
    * the mention needs a reinforcing signal — the explicit hint naming
    * one of the required ctx words, the candidate's own ctx mentioned
    * in the sentence, or any required ctx word mentioned — else it is
    * downgraded to unknown_ctx at 0.4 (disambiguation.py:142-153
    * `_has_reliable_context` + the len==1 branch). */
  val AmbiguousSurfaces: Map[String, Seq[String]] = Map("sort" -> Seq("batch"))

  val CtxWords: Seq[String] = Seq("join", "stream", "batch", "window")

  /** Mention surfaces with NO catalog candidates — the analog of a
    * foreign city name the gazetteer recognizes as a mention but holds
    * no municipality record for (disambiguation.py:114 empty-candidate
    * branch -> status "foreign"). */
  val ForeignSurfaces: Seq[String] = Seq("agg", "hash")
  val Surfaces: Seq[String] = Catalog.map(_._1).distinct
  val AllSurfaces: Seq[String] = Surfaces ++ ForeignSurfaces

  val ConfResolved = 950L // disambiguation.py:41 _CONFIDENCE_RESOLVED
  val ConfAmbiguous = 500L // :42 _CONFIDENCE_AMBIGUOUS
  val ConfUnknown = 400L // :43 _CONFIDENCE_UNKNOWN_UF
  val ConfForeign = 200L // :44 _CONFIDENCE_FOREIGN

  def catalogDf(s: SparkSession): DataFrame = {
    import s.implicits._
    Catalog.toDF("surface", "cand_id", "ctx")
  }

  /** Resolve every mention of a catalog surface in the corpus.
    *
    * Context signals are scoped to the SENTENCE containing the mention
    * (signals.py computes context per sentence via
    * find_sentence_containing, not per document) — sentence ids follow
    * the q40 convention shared with Gazetteer.contextMatches. The flag
    * aggregate filters to context-word tokens BEFORE grouping, so the
    * aggregated volume is the ctx-word hits, not the whole corpus. */
  def resolve(docs: DataFrame, s: SparkSession, textCol: String, idCol: String): DataFrame = {
    val ctxAny = CtxWords.map(x => x: Any)
    val surfAny = AllSurfaces.map(x => x: Any)

    // SINGLE-PASS: one scan + explode; sentence ids, the next-token
    // hint and the per-sentence context flags are all windows over the
    // same stream (no second scan, no sentence-keyed shuffle join)
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val wSentPrefix = wDoc.rowsBetween(Window.unboundedPreceding, -1)
    val wSent = Window.partitionBy(col(idCol), col("sent_id"))
    val toks = docs
      .select(col(idCol), posexplode_outer(tokens(fold(col(textCol)))).as(Seq("pos", "tok")))
      .withColumn("sent_id",
        coalesce(sum(when(col("tok") === Gazetteer.SentenceBreakToken, 1L).otherwise(0L))
          .over(wSentPrefix), lit(0L)))
      .withColumn("next_tok", lead(col("tok"), 1).over(wDoc))
    val flagged = CtxWords.foldLeft(toks) { (df, w) =>
      df.withColumn(s"has_$w", max(when(col("tok") === w, 1L).otherwise(0L)).over(wSent))
    }

    // mentions with the optional explicit next-token hint
    val mentions = flagged
      .filter(col("tok").isin(surfAny: _*))
      .withColumn("hint", when(col("next_tok").isin(ctxAny: _*), col("next_tok")))
      .select(col(idCol) +: col("pos") +: col("tok").as("surface") +: col("hint") +:
        CtxWords.map(w => col(s"has_$w")): _*)

    // LEFT join: foreign surfaces keep one all-null candidate row, so
    // n_cand (count of non-null cand_id) lands at 0 for them — the
    // reference's empty candidate_list (disambiguation.py:113)
    val withCands = mentions
      .join(broadcast(catalogDf(s)), Seq("surface"), "left")
      .withColumn("hint_match", col("hint").isNotNull && col("ctx") === col("hint"))
      .withColumn("ctx_match",
        CtxWords.map(w => col("ctx") === w && col(s"has_$w") === 1L).reduce(_ || _))
      .withColumn("both_match", col("hint_match") && col("ctx_match"))

    val aggCols = Seq(
      count(col("cand_id")).as("n_cand"),
      sum(when(col("hint_match"), 1L).otherwise(0L)).as("n_hint"),
      sum(when(col("ctx_match"), 1L).otherwise(0L)).as("n_ctx"),
      sum(when(col("both_match"), 1L).otherwise(0L)).as("n_both"),
      min(col("cand_id")).as("id_all"),
      min(when(col("hint_match"), col("cand_id"))).as("id_hint"),
      min(when(col("ctx_match"), col("cand_id"))).as("id_ctx"),
      min(when(col("both_match"), col("cand_id"))).as("id_both")) ++
      CtxWords.map(w => max(col(s"has_$w")).as(s"has_$w"))
    val agg = withCands
      .groupBy(col(idCol), col("pos"), col("surface"), col("hint"))
      .agg(aggCols.head, aggCols.tail: _*)

    val n1 = when(col("hint").isNull, col("n_cand")).otherwise(col("n_hint"))
    val m1 = when(col("hint").isNull, col("n_ctx")).otherwise(col("n_both"))
    val finalN = when(n1 > 1 && m1 > 0, m1).otherwise(n1)
    val id1 = when(col("hint").isNull,
      when(col("n_cand") > 1 && col("n_ctx") > 0, col("id_ctx")).otherwise(col("id_all")))
      .otherwise(
        when(col("n_hint") > 1 && col("n_both") > 0, col("id_both")).otherwise(col("id_hint")))
    // _has_reliable_context, per marked surface: hint names a required
    // ctx word (rule 1), the surviving candidate's own ctx is mentioned
    // in the sentence (rule 2 — for a single survivor that is exactly
    // m1 >= 1), or any required ctx word is mentioned (rule 3)
    val unreliable = AmbiguousSurfaces.map { case (surf, req) =>
      val reqAny = req.map(x => x: Any)
      col("surface") === surf &&
        !(coalesce(col("hint").isin(reqAny: _*), lit(false)) ||
          m1 >= 1 ||
          req.map(r => col(s"has_$r") === 1L).reduce(_ || _))
    }.reduce(_ || _)

    agg
      // "foreign" is decided FIRST — before the hint path — exactly as
      // disambiguation.py:113 checks `if not candidate_list` before
      // touching uf_surface; the reliable-context downgrade sits inside
      // the single-survivor branch (disambiguation.py:142-153)
      .withColumn("status",
        when(col("n_cand") === 0, "foreign")
          .when(col("hint").isNotNull && col("n_hint") === 0, "unknown_ctx")
          .when(finalN === 1 && unreliable, "unknown_ctx")
          .when(finalN === 1, "resolved")
          .otherwise("ambiguous"))
      .withColumn("resolved_id", when(col("status") === "resolved", id1))
      .withColumn("confidence_milli",
        when(col("status") === "foreign", ConfForeign)
          .when(col("status") === "resolved", ConfResolved)
          .when(col("status") === "ambiguous", ConfAmbiguous)
          .otherwise(ConfUnknown))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("surface"), col("hint"),
        col("n_cand"), col("status"), col("resolved_id"), col("confidence_milli"))
  }
}
