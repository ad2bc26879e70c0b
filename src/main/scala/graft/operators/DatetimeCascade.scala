package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The scraper's datetime-parsing cascade as column expressions — the
  * reference's `_parse_datetime` (infrastructure/scraper.py:556-713):
  *
  *   1. normalize the raw value (scraper.py:715: NBSP/NNBSP -> space,
  *      collapse whitespace runs, strip);
  *   2. try ISO-8601 (`_try_parse_isoformat` :644: optional time,
  *      optional seconds, `Z` or `+-HH:MM` offset folded to UTC);
  *   3. if the portal's `date_format` LOOKS LIKE A REGEX
  *      (`_looks_like_regex` :675: no `%` directive and any of
  *      `(?`, `\d`, `[`, `)`), extract the captured candidate and
  *      re-run normalize -> ISO -> BR on it
  *      (`_parse_datetime_with_regex` :607);
  *   4. fall back to the Brazilian surface form anywhere in the value
  *      (`_try_parse_br_datetime` :656: `d/m/yyyy` plus an optional
  *      `H:MM[:SS]` or `HhMM` time, midnight when absent);
  *   5. otherwise the strptime path — the `%B` Portuguese-month leg is
  *      q48's operator; a value no leg parses is an error row.
  *
  * Scope notes vs the reference: candidate extraction models the
  * single-capture-group config (the common portal case) — group 1 IS
  * the candidate, standing in for the reference's named-group priority
  * scan (`published`/`date`/`datetime`, then remaining groups); ISO
  * accepts `YYYY-MM-DD[ T]HH:MM[:SS][Z|+-HH:MM]` (no fractional
  * seconds — the scraped surfaces never carry them). Python validates
  * component ranges in the `datetime` constructor and treats overflow
  * as parse failure; [[epochUs]] reproduces that with an arithmetic
  * days-in-month guard so both engines NULL out `99/99/2024` instead
  * of erroring (DuckDB's make_timestamp raises on invalid dates).
  *
  * Everything is plain codegen'd column arithmetic: at 100 TB the
  * cascade runs map-side inside the scan stage, and the per-portal
  * `date_format` dispatch is a foldable CASE over the broadcast portal
  * dim's bounded format vocabulary (patterns compile once per plan,
  * not per row).
  */
object DatetimeCascade {

  /** Anchored ISO-8601 shape; groups: 1=y 2=mo 3=dd 4=hh 5=mi 6=ss
    * 7=offset (`Z`, `+HH:MM`, `-HH:MM`, or empty). Single-backslash
    * escapes so the SAME string is a Java regex for Spark and an RE2
    * for the DuckDB oracle. */
  val IsoPattern: String =
    "^(\\d{4})-(\\d{2})-(\\d{2})(?:[T ](\\d{2}):(\\d{2})(?::(\\d{2}))?(Z|[+-]\\d{2}:\\d{2})?)?$"

  /** Brazilian date anywhere in the value (scraper.py:657). */
  val BrDatePattern: String = "(\\d{1,2})/(\\d{1,2})/(\\d{4})"

  /** Brazilian clock time: `9:07[:03]` or `14h30` (scraper.py:661). */
  val BrTimePattern: String = "(\\d{1,2})[:h](\\d{2})(?:[:h](\\d{2}))?"

  /** NBSP / narrow-NBSP -> space, collapse `\s+`, strip
    * (scraper.py:715-718). The NBSP translate is load-bearing here:
    * Python's `\s` matches U+00A0, Java's and RE2's do not. */
  def normalize(v: Column): Column =
    trim(regexp_replace(translate(v, "\u00A0\u202F", "  "), "\\s+", " "))

  private def leapYear(y: Column): Column =
    (y % 4 === 0 && y % 100 =!= 0) || (y % 400 === 0)

  private def daysInMonth(y: Column, mo: Column): Column =
    when(mo === 2, when(leapYear(y), 29).otherwise(28))
      .when(mo.isin(4, 6, 9, 11), 30)
      .otherwise(31)

  /** Component-validated epoch micros (UTC session): NULL when the
    * Python `datetime` constructor would raise — out-of-range month,
    * day (month-aware), hour, minute, or second. */
  def epochUs(y: Column, mo: Column, dd: Column,
      hh: Column, mi: Column, ss: Column): Column =
    when(mo.between(1, 12) && dd.between(1, daysInMonth(y, mo)) &&
        hh.between(0, 23) && mi.between(0, 59) && ss.between(0, 59),
      unix_micros(make_timestamp(y, mo, dd, hh, mi, ss.cast("int"))))

  /** ISO leg from PRE-EXTRACTED components: `matched` is the anchored
    * rlike verdict, `g(i)` the i-th capture group. Callers on a hot
    * path MUST bind `g(i)` to staged columns (each regex evaluated
    * once per row): everything here sits under `when(...)` branches,
    * which whole-stage codegen excludes from subexpression
    * elimination — inlining the extracts re-runs each regex at every
    * reference and costs ~10x (measured on q242). */
  def isoUsFrom(matched: Column, g: Int => Column): Column = {
    val hasTime = g(4) =!= ""
    val base = epochUs(
      g(1).cast("int"), g(2).cast("int"), g(3).cast("int"),
      when(hasTime, g(4).cast("int")).otherwise(0),
      when(hasTime, g(5).cast("int")).otherwise(0),
      when(hasTime && g(6) =!= "", g(6).cast("int")).otherwise(0))
    val tz = g(7)
    val offMin =
      when(tz === "" || tz === "Z", 0L)
        .otherwise(
          (when(substring(tz, 1, 1) === "-", -1L).otherwise(1L)) *
            (substring(tz, 2, 2).cast("long") * 60L +
              substring(tz, 5, 2).cast("long")))
    when(matched, base - offMin * 60000000L)
  }

  /** `_try_parse_isoformat` as epoch micros: NULL unless the WHOLE
    * normalized value is the ISO shape; offsets fold to UTC, naive
    * values pass through, a date-only value is midnight. Convenience
    * single-expression form (fine on dims/specs; stage the extracts
    * via [[isoUsFrom]] on corpus-sized scans). */
  def isoUs(v: Column): Column =
    isoUsFrom(v.rlike(IsoPattern), i => regexp_extract(v, IsoPattern, i))

  /** BR leg from PRE-EXTRACTED components: `d(i)` / `t(i)` are the
    * date / time capture groups (index 0 = whole match). Same staging
    * contract as [[isoUsFrom]]. */
  def brUsFrom(d: Int => Column, t: Int => Column): Column = {
    val hasDate = d(0) =!= ""
    val hasTime = t(0) =!= ""
    when(hasDate, epochUs(
      d(3).cast("int"), d(2).cast("int"), d(1).cast("int"),
      when(hasTime, t(1).cast("int")).otherwise(0),
      when(hasTime, t(2).cast("int")).otherwise(0),
      when(hasTime && t(3) =!= "", t(3).cast("int")).otherwise(0)))
  }

  /** `_try_parse_br_datetime` as epoch micros: date and time are
    * searched INDEPENDENTLY anywhere in the value (first match each,
    * exactly `re.search`); no time means midnight; an invalid
    * component (99/99/2024, hour 25) is NULL, not an error.
    * Single-expression convenience form — see [[brUsFrom]]. */
  def brUs(v: Column): Column =
    brUsFrom(i => regexp_extract(v, BrDatePattern, i),
      i => regexp_extract(v, BrTimePattern, i))

  /** `_looks_like_regex` (scraper.py:675) on the portal's
    * `date_format` column: no `%` strptime directive, and at least one
    * regex-ish token. */
  def looksLikeRegex(fmt: Column): Column =
    !fmt.contains("%") &&
      (fmt.contains("(?") || fmt.contains("\\d") ||
        fmt.contains("[") || fmt.contains(")"))

  /** The regex leg's candidate re-parse: normalize, then ISO, then BR
    * (`_parse_datetime_with_regex` :630-637). */
  def candidateUs(cand: Column): Column = {
    val n = normalize(cand)
    coalesce(isoUs(n), brUs(n))
  }

  /** Which leg of the cascade claimed the value: `iso`, `regex`, `br`,
    * or `error` — precedence exactly as scraper.py:556-604 (a regex
    * MATCH outranks the BR fallback; a regex MISS falls through to
    * it). */
  def branchOf(iso: Column, isRegex: Column, candUs: Column,
      br: Column): Column =
    when(iso.isNotNull, "iso")
      .when(isRegex && candUs.isNotNull, "regex")
      .when(br.isNotNull, "br")
      .otherwise("error")

  /** The cascade's parsed value (epoch micros; NULL = error row). */
  def parsedUs(iso: Column, isRegex: Column, candUs: Column,
      br: Column): Column =
    coalesce(iso, when(isRegex, candUs), br)
}
