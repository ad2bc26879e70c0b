package graft.functions

import org.apache.spark.sql.{Column, GraftInternals}
import org.apache.spark.sql.functions._

import graft.expressions.{FoldWithOffsets, StripAccents}

/** Column-level text normalization, mirroring the reference's
  * extraction/normalization.py as pure Catalyst expressions (no UDFs,
  * everything stays inside whole-stage codegen).
  */
object TextFunctions {

  /** Unicode hyphen variants folded to space; soft hyphen deleted
    * (reference: normalization.py:74 `_HYPHEN_CHARS`, :181 soft hyphen). */
  private val HyphenChars = "-‐‑‒–—―­"
  private val HyphenRepl = "       " // 7 spaces; 8th char (soft hyphen) deleted

  /** Connector particles kept lowercase-ish in Brazilian names
    * (reference: normalization.py:73 `_CONNECTORS`). */
  val Connectors: Seq[String] = Seq("da", "de", "dos", "das", "do", "e")

  def stripAccents(c: Column): Column =
    GraftInternals.column(StripAccents(GraftInternals.expression(c)))

  /** Matching normalization: lowercase, de-accent, hyphens -> space
    * (reference: normalization.py:191 `normalize_text_with_offsets`). */
  def fold(c: Column): Column =
    lower(stripAccents(translate(c, HyphenChars, HyphenRepl)))

  /** `normalize_text_with_offsets` (normalization.py:191) — the folded
    * text PLUS the offsets array mapping each folded character back to
    * the index of its originating character, so dictionary matches on
    * the folded form can be projected onto the original text. A native
    * codegen'd expression (graft.expressions.FoldWithOffsets): the
    * per-char mapping composes to exactly `fold` over the whole string
    * (hyphen variants -> space, soft hyphen -> deleted, else
    * lower+de-accent), and a char contributes its index once per
    * emitted char, zero times when deleted. Returns
    * struct(folded, offsets). */
  def foldWithOffsets(c: Column): Column =
    GraftInternals.column(FoldWithOffsets(GraftInternals.expression(c)))

  /** Boilerplate-line removal + whitespace collapse
    * (reference: normalization.py:77 `normalize_article_text`).
    * Pattern avoids Java-only regex features so the DuckDB (RE2) oracle
    * compiles the identical pattern; accented chars are enumerated
    * because RE2 has no (?u) Unicode case folding.
    */
  val BoilerplateRegex: String =
    "(?im)^[ \\t]*(leia tamb[eéÉ]m|leia ainda|cr[eéÉ]dito:|reportagem:|foto:)[^\\n]*(\\n|$)"

  def normalizeArticle(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, BoilerplateRegex, ""), "\\s+", " "))

  /** Whitespace tokenization of already-folded text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Sentence segmentation of the line-dedup family (q126/q169/q175/
    * q178/q255) and the composed gate (q253): '. '-delimited segments
    * after normalizing the synthetic ' batch ' delimiter to '. '. ONE
    * shared definition so the q253 gate's "reuses q126's
    * segmentation" claim holds by construction — change it here and
    * every consumer (and its oracle via [[sentenceSegsSql]]) moves
    * together. */
  def sentenceSegs(c: Column): Column =
    split(regexp_replace(c, " batch ", ". "), "\\. ")

  /** The DuckDB rendering of [[sentenceSegs]] over a SQL expression —
    * same delimiter semantics, kept adjacent so the pair can only
    * drift together. */
  def sentenceSegsSql(colSql: String): String =
    s"string_split(regexp_replace($colSql, ' batch ', '. ', 'g'), '. ')"

  /** Honorific/title removal (reference: normalization.py:18
    * `_HONORIFIC_PATTERNS`, :93 `_remove_titles`): strip title words,
    * then a leading "ex-"/"ex " prefix, then leading non-word chars. */
  val HonorificRegex: String =
    "(?i)\\b(deputad[ao]a?|ministr[ao]a?|presidente|governador[ae]?|prefeit[ao]a?|vereador[ae]?|senador[ae]?|dra|dr|dep)\\b"

  def removeTitles(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, HonorificRegex, ""),
        "(?i)^ex[\\s-]+", ""),
      "^[^\\wÀ-ÿ]+", "")

  /** Title-case one token the way the reference does
    * (normalization.py:101 `_titlecase_word`): short ALL-CAPS
    * non-connector tokens survive as acronyms; otherwise each
    * hyphen-separated part is capitalized. */
  private def titleToken(t: Column): Column = {
    val isAcronym = t === upper(t) && t =!= lower(t) &&
      length(t) <= 3 && !lower(t).isin(Connectors.map(x => x: Any): _*)
    val capParts = array_join(
      transform(split(t, "-"),
        p => concat(upper(substring(p, 1, 1)), lower(substring(p, 2, 1000000)))),
      "-")
    when(isAcronym, t).otherwise(capParts)
  }

  /** Canonical person-name normalization
    * (reference: normalization.py:118 `normalize_person_name`). */
  def normalizePersonName(c: Column): Column = {
    val cleaned = trim(regexp_replace(removeTitles(trim(c)), "\\s+", " "))
    array_join(transform(tokens(cleaned), t => titleToken(t)), " ")
  }

  /** Exact integer token statistics over a token array. Computed as
    * the char count of the separator-free join (codegen'd ConcatWs)
    * rather than an interpreted `aggregate()` fold; null-array input
    * still yields null like the fold did. NULL ELEMENTS are ignored
    * (ConcatWs skips them) where the fold returned null — no graft
    * caller produces null elements (tokens()/split never do), but a
    * new caller needing null propagation must pre-check with
    * `exists(toks, _.isNull)`. */
  def tokenLengthSum(toks: Column): Column =
    when(toks.isNull, lit(null).cast("long"))
      .otherwise(length(concat_ws("", toks)).cast("long"))
}
