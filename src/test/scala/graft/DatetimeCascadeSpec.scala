package graft

import java.time.LocalDateTime
import java.time.ZoneOffset

import org.apache.spark.sql.functions._

import graft.operators.DatetimeCascade
import graft.queries.DateParseQueries

/** Pins every leg of the datetime cascade against ground truth
  * produced by running the REFERENCE implementation
  * (`RequestsSoupScraper._parse_datetime`, scraper.py:556-713) on the
  * same (value, date_format) inputs: ISO with Z / positive / negative
  * offsets, date-only and second-less ISO, regex-format candidate
  * parsed as BR and as ISO, regex miss falling through to BR, BR with
  * `:` and `h` separators, BR date-only midnight, component-invalid
  * BR (99/99) rejected, and the terminal error. */
class DatetimeCascadeSpec extends SparkSpec {

  private def us(y: Int, mo: Int, d: Int, h: Int = 0, mi: Int = 0,
      s: Int = 0): Long =
    LocalDateTime.of(y, mo, d, h, mi, s).toEpochSecond(ZoneOffset.UTC) * 1000000L

  private val FmtNunca = "NUNCA (\\d+)"
  private val FmtData = "data: (\\S+) fim"

  // (label, raw value, date_format, expected branch, expected micros)
  private val cases: Seq[(String, String, String, String, Option[Long])] = Seq(
    ("iso_z", " 2024-03-05T14:30:22Z ", "%Y-%m-%d",
      "iso", Some(us(2024, 3, 5, 14, 30, 22))),
    ("iso_offset", "2024-03-05 14:30:22+03:00", "%Y-%m-%d",
      "iso", Some(us(2024, 3, 5, 11, 30, 22))),
    ("iso_neg_off", "1997-12-31T23:59:59-02:30", "%Y-%m-%d",
      "iso", Some(us(1998, 1, 1, 2, 29, 59))),
    ("iso_dateonly", " 2024-03-05 ", "%Y-%m-%d",
      "iso", Some(us(2024, 3, 5))),
    ("iso_no_sec", "2024-03-05T14:30", "%Y-%m-%d",
      "iso", Some(us(2024, 3, 5, 14, 30))),
    ("regex_br", "Publicado em  05/03/2024 às 14h30",
      DateParseQueries.RegexFmt,
      "regex", Some(us(2024, 3, 5, 14, 30))),
    ("regex_iso_cand", "data: 2024-03-05T08:01:02Z fim", FmtData,
      "regex", Some(us(2024, 3, 5, 8, 1, 2))),
    ("regex_fail_br", "07/08/1999 10h05 extra", FmtNunca,
      "br", Some(us(1999, 8, 7, 10, 5))),
    ("regex_fail_all", "sem data aqui", FmtNunca, "error", None),
    ("br_full", "5/3/2024 9:07:03 — Gazeta Regional", "%d/%m/%Y",
      "br", Some(us(2024, 3, 5, 9, 7, 3))),
    ("br_h_sep", "Em 05/03/2024 às 14h30, o plenário", "%d/%m/%Y",
      "br", Some(us(2024, 3, 5, 14, 30))),
    ("br_dateonly", "Em 05/03/2024, o plenário aprovou", "%d/%m/%Y",
      "br", Some(us(2024, 3, 5))),
    ("br_invalid", "99/99/2024 relatório", "%d/%m/%Y", "error", None),
    ("err_text", "ontem à tarde", "%d/%m/%Y", "error", None))

  test("every cascade leg matches the reference implementation") {
    import spark.implicits._
    val df = cases.map(c => (c._1, c._2, c._3)).toDF("label", "value", "fmt")
      .withColumn("v", DatetimeCascade.normalize(col("value")))
      // per-format candidate dispatch: one foldable extractor per
      // regex-typed format in the (bounded) format vocabulary
      .withColumn("cand", coalesce(
        when(col("fmt") === DateParseQueries.RegexFmt,
          nullif(regexp_extract(col("v"), DateParseQueries.RegexFmt, 1), lit(""))),
        when(col("fmt") === FmtNunca,
          nullif(regexp_extract(col("v"), FmtNunca, 1), lit(""))),
        when(col("fmt") === FmtData,
          nullif(regexp_extract(col("v"), FmtData, 1), lit("")))))
      .withColumn("is_rx", DatetimeCascade.looksLikeRegex(col("fmt")))
      .withColumn("iso_us", DatetimeCascade.isoUs(col("v")))
      .withColumn("cand_us", DatetimeCascade.candidateUs(col("cand")))
      .withColumn("br_us", DatetimeCascade.brUs(col("v")))
    val got = df.select(col("label"),
      DatetimeCascade.branchOf(col("iso_us"), col("is_rx"), col("cand_us"),
        col("br_us")).as("branch"),
      DatetimeCascade.parsedUs(col("iso_us"), col("is_rx"), col("cand_us"),
        col("br_us")).as("parsed_us"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]))))
      .toMap
    cases.foreach { case (label, _, _, branch, expected) =>
      assert(got(label) === ((branch, expected)), s"case $label")
    }
  }

  test("looksLikeRegex matches the reference predicate") {
    import spark.implicits._
    val fmts = Seq(
      "%d/%m/%Y" -> false, // % directive wins
      "%d de %B de %Y" -> false,
      DateParseQueries.RegexFmt -> true, // \d and ) tokens
      FmtNunca -> true,
      "(?P<published>.+)" -> true, // (? token
      "[0-9]+" -> true, // [ token
      "plain text" -> false, // no regex tokens at all
      "%H)%M" -> false) // ) but % makes it strptime
    val got = fmts.map(_._1).toDF("fmt")
      .select(col("fmt"), DatetimeCascade.looksLikeRegex(col("fmt")).as("r"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    fmts.foreach { case (f, e) => assert(got(f) === e, s"fmt $f") }
  }
}
