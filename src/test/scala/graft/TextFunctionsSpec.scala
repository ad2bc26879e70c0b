package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.Hashing

class TextFunctionsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def one(colExpr: org.apache.spark.sql.Column, input: String): String = {
    val df = spark.createDataFrame(Seq(Tuple1(input))).toDF("text")
    df.select(colExpr.as("out")).collect() match {
      case Array(Row(v: String)) => v
      case other => fail(s"unexpected $other")
    }
  }

  test("normalizeArticle strips boilerplate lines and collapses whitespace") {
    // reference: normalization.py normalize_article_text
    val in = "Leia também: outra matéria\n  Primeira   linha\n\nfoto: João\nSegunda linha  "
    assert(one(normalizeArticle(col("text")), in) == "Primeira linha Segunda linha")
  }

  test("fold lowers, strips accents, folds hyphen variants, drops soft hyphen") {
    assert(one(fold(col("text")), "São João-Del–Rei co­op") == "sao joao del rei coop")
    assert(one(fold(col("text")), "Ångström") == "angstrom")
  }

  test("stripAccents is a no-op fast path on ascii") {
    assert(one(stripAccents(col("text")), "plain ascii") == "plain ascii")
  }

  test("stripAccents handles null") {
    val df = spark.createDataFrame(Seq(Tuple1(Option.empty[String]))).toDF("text")
    assert(df.select(stripAccents(col("text"))).collect().head.isNullAt(0))
  }

  test("normalizePersonName removes honorifics and title-cases") {
    // reference: normalization.py normalize_person_name
    assert(one(normalizePersonName(col("text")), "dr. joão da silva") == "João Da Silva")
    assert(one(normalizePersonName(col("text")), "EX-presidente lula") == "Lula")
    assert(one(normalizePersonName(col("text")), "maria APT santos-souza") == "Maria APT Santos-Souza")
    assert(one(normalizePersonName(col("text")), "governadora   ana") == "Ana")
  }

  test("polyHash matches a hand-rolled left fold") {
    val s = "ab1"
    val expected = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val df = spark.createDataFrame(Seq(Tuple1(s))).toDF("text")
    val got = df.select(Hashing.polyHash(col("text")).as("h")).collect().head.getLong(0)
    assert(got == expected)
  }
}
