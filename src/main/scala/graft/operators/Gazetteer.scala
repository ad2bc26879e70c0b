package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.functions.GraftFunctions
import graft.functions.TextFunctions._

/** Dictionary/gazetteer matching over a document corpus, re-expressing
  * the reference's city-matching pipeline Spark-first:
  *
  *  - `CityMatcher` FlashText automaton (city_matching/matcher.py:44)
  *    -> tokenize + broadcast hash join against the catalog. The
  *    automaton exists to scan one document against many keywords in
  *    one pass; in Spark the same effect is a codegen'd explode +
  *    broadcast join, embarrassingly parallel over documents, with the
  *    only shuffle keyed on doc_id for re-aggregation.
  *  - signal enrichment (city_matching/signals.py:24): title boost for
  *    matches in the leading token zone, admin-marker detection in the
  *    reference's +-48-char window around the match span
  *    (signals.py:65-69) -> carried char offsets + interval test, no
  *    second join.
  *  - aggregation + primary selection (city_matching/aggregator.py:92,
  *    :193): per-(doc, keyword) score sums and the deterministic
  *    tie-break chain score -> admin markers -> title boost ->
  *    occurrences -> keyword id, as one window row_number.
  *
  * Scores are integer milli-units (the reference's 0.4/0.6 float
  * weights scaled by 1000) so aggregation is exact at any parallelism.
  */
object Gazetteer {

  /** (kwId, keyword, category, weightMilli) — the catalog plays the role
    * of the IBGE municipality gazetteer (data/municipios_br_v1.json).
    * Keywords 15+ are MULTI-TOKEN, the analog of multi-word municipality
    * names ("rio de janeiro") the reference's char-level automaton
    * matches as units (city_matching/matcher.py:89 keys are whole
    * normalized names, not tokens). */
  val DefaultCatalog: Seq[(Int, String, String, Long)] = Seq(
    (1, "spark", "engine", 950L),
    (2, "join", "op", 900L),
    (3, "filter", "op", 850L),
    (4, "window", "op", 800L),
    (5, "stream", "mode", 750L),
    (6, "batch", "mode", 700L),
    (7, "merge", "op", 650L),
    (8, "sort", "op", 600L),
    (9, "agg", "op", 550L),
    (10, "query", "noun", 500L),
    (11, "table", "noun", 450L),
    (12, "scan", "op", 400L),
    (13, "hash", "op", 350L),
    (14, "group", "op", 300L),
    (15, "hash join", "op", 980L),
    (16, "sort merge join", "op", 990L),
    (17, "stream filter", "op", 720L),
    (18, "query window", "noun", 520L))

  /** Alternate surface forms resolving to the same keyword id — the
    * catalog's `alt_names` (city_matching/catalog.py; matcher.py:69
    * inserts every variant under the same city_id, keeping the
    * canonical name on the match). Variants are pre-folded, exactly as
    * matcher.py:75 normalizes each variant before insertion. */
  val AltNames: Seq[(Int, String)] = Seq(
    2 -> "merge join",
    15 -> "hash merge",
    18 -> "query vector")

  /** Longest keyword variant, in tokens. */
  val MaxKeywordTokens: Int =
    (DefaultCatalog.map(_._2) ++ AltNames.map(_._2)).map(_.split(" ").length).max

  /** (variant, kw_id, keyword, category, weight_milli): one row per
    * surface form; `keyword` is the canonical name (aggregation and
    * tie-breaks run on canonical identity, never on the variant). */
  val Variants: Seq[(String, Int, String, String, Long)] = {
    val byId = DefaultCatalog.map(e => e._1 -> e).toMap
    DefaultCatalog.map(e => (e._2, e._1, e._2, e._3, e._4)) ++
      AltNames.map { case (id, alt) =>
        val (_, name, cat, w) = (byId(id)._1, byId(id)._2, byId(id)._3, byId(id)._4)
        (alt, id, name, cat, w)
      }
  }

  /** Modifier words whose adjacency boosts a match — the analog of the
    * reference's admin markers "prefeito/governador/..." near a city
    * name (signals.py:25 `_ADMIN_KEYWORDS`). */
  val AdminWords: Seq[String] = Seq("fast", "slow", "big", "small")

  val TitleZoneTokens = 5
  val TitleBoostMilli = 400L // signals.py:22 TITLE_BOOST_WEIGHT = 0.4
  val AdminMarkerMilli = 600L // signals.py:23 ADMIN_MARKER_WEIGHT = 0.6
  val AdminWindowChars = 48L // signals.py:66 +-48-char marker window

  def variantsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    Variants.toDF("variant", "kw_id", "keyword", "category", "weight_milli")
  }

  /** Candidate n-grams (n = 1..MaxKeywordTokens) anchored at each token
    * position, built from the carried token array: struct(n, gram),
    * gram null when it would run off the array. The explode multiplies
    * the stream by MaxKeywordTokens map-side only — the broadcast
    * variant join immediately collapses it to actual matches. This is
    * the Spark form of the automaton emitting every keyword ending at
    * each char (matcher.py:138): token-anchored grams inherit the
    * word-boundary guarantee (matcher.py:116 `_boundary_ok`) for free. */
  private def gramStructs: Seq[Column] =
    gramStructsFor(col("toks"), col("pos"), col("tok"))

  /** The same anchored-gram construction over any carried token array —
    * reused by callers that gram-match inside a sub-unit (q50 scores
    * per-sentence token arrays rather than whole documents). */
  def gramStructsFor(toks: Column, pos: Column, tok: Column): Seq[Column] =
    (1 to MaxKeywordTokens).map { n =>
      val parts = tok +: (1 until n).map(k => get(toks, pos + k))
      struct(lit(n).as("n"),
        when(pos + n <= size(toks), concat_ws(" ", parts: _*)).as("gram"))
    }

  /** Per-(doc, keyword) aggregated match payload: occurrences,
    * admin_markers, title_boost_sum, score_milli. Multi-token variants
    * match as units; admin markers use the reference's +-48-CHAR window
    * around the match span (signals.py:65-69), computed map-only: the
    * per-token char offsets (space-joined geometry) come from one
    * prefix-scan over the carried token array, and the window test is
    * an `exists` over the doc's few admin-occurrence intervals — no
    * shuffle is added, the broadcast-join-then-aggregate shape stands.
    * (The stream form of the same window lives in contextMatches.) */
  def matches(docs: DataFrame, variants: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), tokens(fold(col(textCol))).as("toks"))
      // starts(i) = char offset of token i in concat_ws(" ", toks),
      // n+1 entries; admins = char intervals of admin-word tokens.
      // Both are native codegen'd one-pass expressions (the former
      // aggregate/filter/zip_with HOF folds were CodegenFallback —
      // interpreted per row on the two hottest corpus scans).
      .withColumn("starts", GraftFunctions.tokenPrefixStarts(col("toks")))
      .withColumn("admins", GraftFunctions.adminIntervals(col("toks"), AdminWords))
      .select(col(idCol), col("toks"), col("starts"), col("admins"),
        posexplode_outer(col("toks")).as(Seq("pos", "tok")))
    // outer explodes: stop Catalyst from inferring isnotnull/size>0 on
    // the exploded arrays and pushing them to the scan, which would
    // inline (and re-evaluate per row) the fold/starts/admins chain
    val cands = toks
      .withColumn("g", explode_outer(array(gramStructs: _*)))
      .filter(col("g.gram").isNotNull)
      .withColumn("m_start", element_at(col("starts"), col("pos") + 1))
      .withColumn("m_end", col("m_start") + length(col("g.gram")).cast("long"))
      .withColumn("admin_adj", GraftFunctions.intervalAdjacent(col("admins"),
        col("m_start") - AdminWindowChars, col("m_end") + AdminWindowChars))
      .withColumn("in_title_zone", col("pos") < TitleZoneTokens)
      .select(col(idCol), col("g.gram").as("gram"), col("admin_adj"), col("in_title_zone"))
    cands
      .join(broadcast(variants), col("gram") === col("variant"))
      .groupBy(col(idCol), col("kw_id"), col("keyword"), col("weight_milli"))
      .agg(
        count(lit(1)).as("occurrences"),
        sum(when(col("admin_adj"), 1L).otherwise(0L)).as("admin_markers"),
        sum(when(col("in_title_zone"), TitleBoostMilli).otherwise(0L)).as("title_boost_milli"))
      .withColumn("score_milli",
        col("occurrences") * col("weight_milli") +
          col("admin_markers") * AdminMarkerMilli + col("title_boost_milli"))
  }

  /** Match-level detail rows (doc, start pos, token span, variant,
    * canonical keyword) — the automaton's raw CityMatch feed
    * (matcher.py:148: city_id + canonical name + the matched surface). */
  def matchDetails(docs: DataFrame, variants: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol), tokens(fold(col(textCol))).as("toks"))
      .select(col(idCol), col("toks"), posexplode_outer(col("toks")).as(Seq("pos", "tok")))
      .withColumn("g", explode_outer(array(gramStructs: _*)))
      .filter(col("g.gram").isNotNull)
      .select(col(idCol), col("pos").cast("long").as("pos"),
        col("g.n").cast("long").as("n_toks"), col("g.gram").as("gram"))
      .join(broadcast(variants), col("gram") === col("variant"))

  /** Match details projected onto the ORIGINAL text (matcher.py:144-146:
    * `orig_start = offsets[start]; orig_end = offsets[end-1] + 1;
    * surface = text[orig_start:orig_end]`) via the
    * normalize_text_with_offsets offsets array (q59 /
    * TextFunctions.foldWithOffsets).
    *
    * Char starts of tokens are recovered from the folded string itself
    * (a token starts at a non-space char whose predecessor is space or
    * the text edge), so spans are exact under runs of whitespace — and
    * a multi-token gram is admitted ONLY when its folded span is
    * contiguous single-spaced (`fold_end - fold_start == len(gram)`),
    * which is precisely the char-automaton's matching condition: the
    * keyword "hash join" never matches "hash  join". Map-only per doc;
    * the only join is the broadcast variant table. */
  def matchSpans(docs: DataFrame, variants: DataFrame, textCol: String, idCol: String): DataFrame = {
    val base = docs
      .select(col(idCol), col(textCol).as("src"), foldWithOffsets(col(textCol)).as("fo"))
      .select(col(idCol), col("src"),
        col("fo.folded").as("folded"), col("fo.offsets").as("offsets"))
      // token char starts via a native one-pass expression (the former
      // per-char filter/sequence/rlike chain was interpreted per row)
      .withColumn("starts", GraftFunctions.tokenCharStarts(col("folded")))
      .withColumn("toks", tokens(col("folded")))
      .drop("folded")
    // Plan-shape care, measured 23 s -> ~1 s at sf0.1: (a) OUTER
    // explodes — non-outer Generate makes Catalyst infer isnotnull/
    // size>0 filters on the exploded array and push them to the scan,
    // inlining the whole per-char fold pipeline into a scan Filter
    // that re-evaluates it per row; (b) fold_start/fold_end live
    // INSIDE the gram struct, so the contiguity filter references only
    // generated g.* fields — a filter on projected derived columns
    // would be constraint-inferred and pushed below the projections,
    // again inlining the expensive expressions. The arrays are never
    // empty and null rows die at the g.gram filter, so outer is
    // semantically identical.
    val spanGrams = (1 to MaxKeywordTokens).map { n =>
      val parts = col("tok") +: (1 until n).map(k => get(col("toks"), col("pos") + k))
      struct(lit(n).as("n"),
        when(col("pos") + n <= size(col("toks")), concat_ws(" ", parts: _*)).as("gram"),
        get(col("starts"), col("pos")).as("fold_start"),
        (get(col("starts"), col("pos") + n - 1) +
          length(get(col("toks"), col("pos") + n - 1))).as("fold_end"))
    }
    val exploded = base
      .select(col(idCol), col("src"), col("offsets"), col("starts"), col("toks"),
        posexplode_outer(col("toks")).as(Seq("pos", "tok")))
      .withColumn("g", explode_outer(array(spanGrams: _*)))
      // contiguity: the folded span must read exactly as the gram
      .filter(col("g.gram").isNotNull &&
        col("g.fold_end") - col("g.fold_start") === length(col("g.gram")))
      .withColumn("orig_start", get(col("offsets"), col("g.fold_start")))
      .withColumn("orig_end", get(col("offsets"), col("g.fold_end") - 1) + 1)
      .withColumn("orig_surface",
        col("src").substr(col("orig_start") + 1, col("orig_end") - col("orig_start")))
    exploded
      .join(broadcast(variants), col("g.gram") === col("variant"))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        col("g.n").cast("long").as("n_toks"), col("variant"), col("kw_id"), col("keyword"),
        col("g.fold_start").cast("long").as("fold_start"),
        col("g.fold_end").cast("long").as("fold_end"),
        col("orig_start").cast("long").as("orig_start"),
        col("orig_end").cast("long").as("orig_end"),
        col("orig_surface"))
  }

  /** Primary keyword per document via the reference's tie-break chain
    * (aggregator.py:193 primary_city_selection). */
  def primary(matchesDf: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(
      col("score_milli").desc, col("admin_markers").desc,
      col("title_boost_milli").desc, col("occurrences").desc, col("kw_id"))
    matchesDf
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** The variant table as a DuckDB VALUES clause for oracle SQL. */
  def variantsValuesSql: String =
    Variants
      .map { case (v, id, kw, cat, w) => s"('$v', $id, '$kw', '$cat', CAST($w AS BIGINT))" }
      .mkString("(VALUES ", ", ", ") AS variants(variant, kw_id, keyword, category, weight_milli)")

  /** Guarded n-gram candidate CTE body over a token CTE exposing
    * (doc_id, t, tok, i [1-based], ...extraCols): one UNION ALL branch
    * per n. Mirrors `gramStructs` exactly (DuckDB t[i+k] is null-safe
    * past the end, but the explicit len guard keeps rows null-free). */
  def gramsCteSql(fromCte: String, extraCols: String = ""): String =
    (1 to MaxKeywordTokens).map { n =>
      val parts = "tok" +: (1 until n).map(k => s"t[i+$k]")
      val guard = if (n == 1) "" else s" WHERE i + ${n - 1} <= len(t)"
      s"SELECT doc_id, t, i$extraCols, $n AS n, ${parts.mkString(" || ' ' || ")} AS gram FROM $fromCte$guard"
    }.mkString("\n  UNION ALL ")

  def adminListSql: String = AdminWords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** `off` + `adm` CTE pair shared by every oracle needing the
    * +-48-char admin window: char offsets in the space-joined geometry
    * (prefix SUM window) and the first-fit admin occurrence columns
    * (fa_s, fa_e) via a RANGE window on the char axis. `fromCte` must
    * expose (doc_id, t, tok, i, ...extraCols). A gram row then tests
    * `fa_s IS NOT NULL AND fa_e <= tok_start + length(gram) + 48` —
    * equivalent to "exists an occurrence inside the window" because
    * occurrences are disjoint and ordered. */
  def adminCharCteSql(fromCte: String, extraCols: String = ""): String =
    s"""off AS (SELECT doc_id, t, tok, i$extraCols,
       |    CAST(coalesce(SUM(CAST(length(tok) AS BIGINT) + 1)
       |      OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
       |  FROM $fromCte),
       |adm AS (SELECT doc_id, t, tok, i$extraCols, tok_start,
       |    MIN(CASE WHEN tok IN $adminListSql THEN tok_start END) OVER w48 AS fa_s,
       |    MIN(CASE WHEN tok IN $adminListSql THEN tok_start + CAST(length(tok) AS BIGINT) END) OVER w48 AS fa_e
       |  FROM off
       |  WINDOW w48 AS (PARTITION BY doc_id ORDER BY tok_start
       |    RANGE BETWEEN $AdminWindowChars PRECEDING AND UNBOUNDED FOLLOWING))""".stripMargin

  // --------------------------------------------------------------------
  // Context-UF scoring chain — the reference's full per-match adjustment
  // (city_matching/signals.py + aggregator.py), which round 1 left out:
  //
  //  - state (UF) mention extraction per SENTENCE (signals.py:72
  //    `_extract_context_uf`: the sentence containing the match is
  //    scanned for state mentions, the alphabetically-first one wins);
  //  - `_context_adjust` (aggregator.py:66): +0.3 CONTEXT_MATCH_BONUS
  //    when the match's context UF equals the city's UF, else
  //    max(0, conf - 0.7) CONTEXT_MISMATCH_PENALTY — integer milli;
  //  - per-city context_matches / context_mismatches counters feeding
  //    tie-break step 4 "menor quantidade de conflitos de UF"
  //    (aggregator.py:232) and the suppression audit trail
  //    (aggregator.py:173 `_register_suppression`).
  //
  // Sentences follow the q40 convention (the corpus has no punctuation;
  // " batch " plays the sentence terminator, so a token's sentence id is
  // the number of "batch" tokens before it). The title field is sentence
  // 0, matching the reference's field=="title" title boost
  // (signals.py:89) rather than round 1's flat first-5-token zone.
  // --------------------------------------------------------------------

  /** Corpus words acting as the state-name table (the synthetic analog
    * of normalization.py:31 `_STATE_NAMES`); none collide with catalog
    * keywords or admin words. `uf` codes sort so the reference's
    * sorted(mentions)[0] pick is MIN(uf). */
  val StateWords: Seq[(String, String)] = Seq(
    ("column", "CL"), ("data", "DT"), ("key", "KY"),
    ("line", "LN"), ("row", "RW"), ("vector", "VC"))

  /** Home state per catalog keyword — the city's UF in the reference's
    * municipality gazetteer. */
  val KeywordUf: Seq[(Int, String)] = Seq(
    1 -> "DT", 2 -> "RW", 3 -> "LN", 4 -> "CL", 5 -> "VC", 6 -> "KY",
    7 -> "DT", 8 -> "RW", 9 -> "LN", 10 -> "CL", 11 -> "VC", 12 -> "KY",
    13 -> "DT", 14 -> "RW", 15 -> "CL", 16 -> "VC", 17 -> "KY", 18 -> "LN")

  val ContextMatchBonusMilli = 300L // aggregator.py:11 CONTEXT_MATCH_BONUS = 0.3
  val ContextMismatchPenaltyMilli = 700L // aggregator.py:12 CONTEXT_MISMATCH_PENALTY = 0.7
  val SentenceBreakToken = "batch" // q40's synthesized sentence terminator

  def keywordUfDf(s: SparkSession): DataFrame = {
    import s.implicits._
    KeywordUf.toDF("kw_id", "city_uf")
  }

  /** Per-(doc, keyword) aggregation with the full context chain:
    * occurrences, admin_markers, title_boost_milli, score_milli (sum of
    * per-match context-adjusted confidences), context_matches,
    * context_mismatches.
    *
    * SINGLE-PASS over the corpus, and as of round 7 WINDOWLESS: every
    * per-token signal the reference derives by re-walking the text —
    * sentence ids, char offsets, the first admin occurrence inside the
    * +-48-char window (signals.py:65-69 `_detect_admin_marker`), the
    * sentence's min state-UF (the reference's sorted(mentions)[0]),
    * and the lead-token grams — computes in ONE native codegen'd pass
    * over the token array (graft.expressions.StreamSignals) BEFORE the
    * explode, inside the scan stage. The former formulation ran four
    * window functions plus lead() columns over the exploded stream,
    * which required an exchange of every token in the corpus; now the
    * only shuffle in the whole chain is the per-(doc, keyword)
    * aggregation itself, fed by map-side partial aggregation — the
    * shape that survives a 100x scale-up.
    *
    * Admin-marker parity: admin occurrences are non-overlapping and
    * ordered, so the first occurrence starting at-or-after
    * `match_start - 48` is the only one that can fit inside the
    * window — `first.end <= match_end + 48` decides, exactly the old
    * RANGE-frame min. */
  def contextMatches(docs: DataFrame, s: SparkSession, textCol: String, idCol: String): DataFrame = {
    // r16 spread the projected input here; r17 reverted it after the
    // driver contradicted the win (q56 +0.18, q57 +0.25 vs r15, both
    // scaling 0.55 at 8-vs-32 cores) and an in-JVM interleaved A/B
    // confirmed the revert (q57 3.36→1.62, q61 −0.46, q63 −0.24,
    // context family −2.9 s total at local[32])
    val sig0 = docs.select(col(idCol), col(textCol))
      .select(col(idCol), tokens(fold(col(textCol))).as("toks"))
      .select(col(idCol),
        posexplode_outer(GraftFunctions.streamSignals(col("toks"),
          SentenceBreakToken, AdminWords, StateWords,
          AdminWindowChars, MaxKeywordTokens)).as(Seq("pos", "sg")))
    val gramCols = (1 to MaxKeywordTokens).map { n =>
      struct(lit(n).as("n"), element_at(col("sg.grams"), n).as("gram"))
    }
    // OUTER explodes — see matches() on inferred-filter pushdown
    val sig = sig0
      .withColumn("g", explode_outer(array(gramCols: _*)))
      .filter(col("g.gram").isNotNull)
      // match span in chars: [tok_start, tok_start + len(gram))
      .withColumn("admin_adj",
        col("sg.fa_s").isNotNull &&
          col("sg.fa_e") <= col("sg.tok_start") + length(col("g.gram")).cast("long") + AdminWindowChars)
      .withColumn("ctx_uf", col("sg.ctx_uf"))
      .withColumn("in_title", col("sg.sent_id") === 0L)
    val conf = col("weight_milli") +
      when(col("in_title"), TitleBoostMilli).otherwise(0L) +
      when(col("admin_adj"), AdminMarkerMilli).otherwise(0L)
    val matchRows = sig
      .join(broadcast(variantsDf(s)), col("g.gram") === col("variant"))
      .join(broadcast(keywordUfDf(s)), Seq("kw_id"))
      .withColumn("conf_milli", conf)
      .withColumn("adjusted_milli",
        when(col("ctx_uf").isNull, col("conf_milli"))
          .when(col("ctx_uf") === col("city_uf"), col("conf_milli") + ContextMatchBonusMilli)
          .otherwise(greatest(lit(0L), col("conf_milli") - ContextMismatchPenaltyMilli)))
      .withColumn("ctx_match", col("ctx_uf").isNotNull && col("ctx_uf") === col("city_uf"))
      .withColumn("ctx_mismatch", col("ctx_uf").isNotNull && col("ctx_uf") =!= col("city_uf"))
    matchRows
      .groupBy(col(idCol), col("kw_id"), col("keyword"))
      .agg(
        sum(col("adjusted_milli")).as("score_milli"),
        count(lit(1)).as("occurrences"),
        sum(when(col("admin_adj"), 1L).otherwise(0L)).as("admin_markers"),
        sum(when(col("in_title"), TitleBoostMilli).otherwise(0L)).as("title_boost_milli"),
        sum(when(col("ctx_match"), 1L).otherwise(0L)).as("context_matches"),
        sum(when(col("ctx_mismatch"), 1L).otherwise(0L)).as("context_mismatches"))
  }

  /** Primary pick with the reference's FULL 6-step tie-break chain
    * (aggregator.py:193): score desc -> admin markers desc -> title
    * boost desc -> FEWEST context mismatches -> occurrences desc ->
    * keyword id asc. */
  def primaryWithContext(ctxMatches: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(
      col("score_milli").desc, col("admin_markers").desc,
      col("title_boost_milli").desc, col("context_mismatches").asc,
      col("occurrences").desc, col("kw_id"))
    ctxMatches
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Suppression audit trail (aggregator.py:173 `_register_suppression`):
    * each losing candidate is recorded at the FIRST selection step that
    * eliminated it — reason "lower_score" at step 1, reason "tie_break"
    * with the step's rule name after that.
    *
    * The six staged conditional extrema ("max admin among max score",
    * "max title among those", ...) are all fields of ONE lexicographic
    * struct max: struct ordering compares field-by-field, so the max
    * tuple fixes each prefix and its k-th field IS the step-k
    * conditional extremum. Minimized fields (context mismatches, kw id)
    * enter negated. One window aggregate, one exchange, one pass. */
  def suppressions(ctxMatches: DataFrame, idCol: String): DataFrame = {
    val wd = Window.partitionBy(col(idCol))
    val chain = struct(
      col("score_milli"), col("admin_markers"), col("title_boost_milli"),
      (-col("context_mismatches")).as("neg_ctx"), col("occurrences"),
      (-col("kw_id")).as("neg_kw"))
    ctxMatches
      .withColumn("best", max(chain).over(wd))
      .withColumn("rule",
        when(col("score_milli") =!= col("best.score_milli"), "score")
          .when(col("admin_markers") =!= col("best.admin_markers"), "admin_marker")
          .when(col("title_boost_milli") =!= col("best.title_boost_milli"), "title_boost")
          .when(-col("context_mismatches") =!= col("best.neg_ctx"), "context_uf")
          .when(col("occurrences") =!= col("best.occurrences"), "occurrences")
          .when(-col("kw_id") =!= col("best.neg_kw"), "city_id"))
      .filter(col("rule").isNotNull)
      .withColumn("reason",
        when(col("rule") === "score", "lower_score").otherwise("tie_break"))
      .select(col(idCol), col("kw_id"), col("keyword"), col("score_milli"),
        col("occurrences"), col("reason"), col("rule"))
  }

  def statesValuesSql: String =
    StateWords.map { case (w, uf) => s"('$w', '$uf')" }
      .mkString("(VALUES ", ", ", ") AS states(state_word, uf)")

  def keywordUfValuesSql: String =
    KeywordUf.map { case (id, uf) => s"($id, '$uf')" }
      .mkString("(VALUES ", ", ", ") AS ufcat(uf_kw_id, city_uf)")
}
