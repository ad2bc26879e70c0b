package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.functions.TextFunctions
import graft.operators.Gazetteer
import graft.sources.PortalCatalog

/** Differential tests: each native codegen'd text-geometry expression
  * must be byte-identical to the interpreted higher-order-function
  * formulation it retired, over both real corpus text (sf0.001
  * documents) and adversarial literals. The HOF reference
  * implementations live here, frozen, as the executable spec. */
class TextGeometrySpec extends SparkSpec {

  // ---- frozen HOF reference implementations (the retired forms) ----

  private val HyphenChars = "-‐‑‒–—―­"

  private def foldCharRef(ch: Column): Column =
    when(ch.isin(HyphenChars.dropRight(1).map(_.toString): _*), lit(" "))
      .when(ch === "­", lit(""))
      .otherwise(lower(TextFunctions.stripAccents(ch)))

  private def foldWithOffsetsRef(c: Column): Column = {
    val cs = split(c, "")
    val mapped = transform(cs, ch => foldCharRef(ch))
    val offsets = flatten(zip_with(mapped, sequence(lit(0), size(cs) - 1),
      (m, i) => array_repeat(i, length(m))))
    struct(array_join(mapped, "").as("folded"), offsets.as("offsets"))
  }

  private def tokenCharStartsRef(folded: Column): Column = {
    val chars = split(folded, "")
    filter(sequence(lit(0), size(chars) - 1), p => {
      val prev = when(p === 0, lit(" ")).otherwise(element_at(chars, p))
      !element_at(chars, p + 1).rlike("^\\s$") && prev.rlike("^\\s$")
    })
  }

  private def tokenPrefixStartsRef(toks: Column): Column =
    aggregate(toks, array(lit(0L)),
      (acc, t) => concat(acc, array(element_at(acc, -1) + length(t).cast("long") + 1L)))

  private def adminIntervalsRef(toks: Column, words: Seq[String]): Column = {
    val starts = tokenPrefixStartsRef(toks)
    filter(
      zip_with(toks, slice(starts, lit(1), size(toks)),
        (t, st) => struct(st.as("s"), (st + length(t).cast("long")).as("e"), t.as("tok"))),
      a => a.getField("tok").isin(words.map(x => x: Any): _*))
  }

  private def repairSelectorRef(query: Column): Column = {
    val chars = split(query, "")
    val zero = struct(lit("").as("res"), lit(0).as("bal"),
      lit(null).cast("string").as("q"))
    aggregate(chars, zero,
      (acc, c) => {
        val q0 = acc.getField("q")
        val isQuote = c === "'" || c === "\""
        val q1 = when(isQuote && q0.isNull, c)
          .when(isQuote && q0 === c, lit(null).cast("string"))
          .otherwise(q0)
        val bal0 = acc.getField("bal")
        val bal1 = when(c === "[" && q1.isNull, bal0 + 1)
          .when(c === "]" && bal0 > 0, bal0 - 1)
          .otherwise(bal0)
        val res1 = when(c === "]" && q1.isNotNull,
          concat(acc.getField("res"), q1, c))
          .otherwise(concat(acc.getField("res"), c))
        val q2 = when(c === "]", lit(null).cast("string")).otherwise(q1)
        struct(res1.as("res"), bal1.as("bal"), q2.as("q"))
      },
      acc => concat(acc.getField("res"),
        coalesce(acc.getField("q"), lit("")),
        lit("]]]]]]]]]]]]]]]]").substr(lit(1), greatest(acc.getField("bal"), lit(0)))))
  }

  // ---- corpora ----

  /** Real corpus text plus adversarial literals: every hyphen variant,
    * soft hyphen mid-word, accents, a ligature that NFKD-expands,
    * leading/trailing/multiple spaces, tabs/newlines, empty string. */
  private def textCorpus = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text").as("t")).limit(200)
    val lits = Seq(
      "", " ", "   ", "a", "Ab-Cd", "a‐b‑c‒d–e—f―g",
      "co­operate", "­", "cação ÉLAN",
      "ﬁsh ﬂood", // ligatures fi, fl expand under NFKD
      "  leading and  double  spaces ", "tab\tand\nnewline\r.",
      "JOSÉ à Noël", "x­y­z",
      "uma frase longa com várias palavras acentuadas: ação, órgão, saúde")
      .toDF("t")
    docs.union(lits)
  }

  test("FoldWithOffsets is byte-identical to the retired HOF fold") {
    val df = textCorpus
      .select(foldWithOffsetsRef(col("t")).as("ref"),
        TextFunctions.foldWithOffsets(col("t")).as("nat"))
    val bad = df.filter(
      col("ref.folded") =!= col("nat.folded") ||
        col("ref.offsets") =!= col("nat.offsets"))
    assert(bad.count() === 0)
  }

  test("TokenCharStarts matches the retired filter/sequence/rlike chain") {
    val df = textCorpus
      .select(TextFunctions.fold(col("t")).as("folded"))
      .select(tokenCharStartsRef(col("folded")).as("ref"),
        GraftFunctions.tokenCharStarts(col("folded")).as("nat"))
    assert(df.filter(col("ref") =!= col("nat")).count() === 0)
  }

  test("TokenPrefixStarts and AdminIntervals match the retired folds") {
    val words = Gazetteer.AdminWords
    val df = textCorpus
      .select(TextFunctions.tokens(TextFunctions.fold(col("t"))).as("toks"))
      .select(
        tokenPrefixStartsRef(col("toks")).as("sRef"),
        GraftFunctions.tokenPrefixStarts(col("toks")).as("sNat"),
        adminIntervalsRef(col("toks"), words).as("aRef"),
        GraftFunctions.adminIntervals(col("toks"), words).as("aNat"))
      .select(col("sRef"), col("sNat"),
        transform(col("aRef"), a => struct(a.getField("s").as("s"), a.getField("e").as("e"))).as("aRef2"),
        col("aNat"))
    assert(df.filter(col("sRef") =!= col("sNat")).count() === 0)
    assert(df.filter(col("aRef2") =!= col("aNat")).count() === 0)
  }

  test("IntervalAdjacent matches exists() over admin intervals") {
    val df = textCorpus
      .select(TextFunctions.tokens(TextFunctions.fold(col("t"))).as("toks"))
      .select(col("toks"), GraftFunctions.adminIntervals(col("toks"), Gazetteer.AdminWords).as("admins"),
        posexplode_outer(col("toks")).as(Seq("pos", "tok")))
      .select(col("admins"),
        (col("pos").cast("long") * 7L).as("lo"),
        (col("pos").cast("long") * 7L + 20L).as("hi"))
      .select(
        exists(col("admins"), a =>
          a.getField("s") >= col("lo") && a.getField("e") <= col("hi")).as("ref"),
        GraftFunctions.intervalAdjacent(col("admins"), col("lo"), col("hi")).as("nat"))
    assert(df.filter(col("ref") =!= col("nat")).count() === 0)
  }

  test("RepairSelector is byte-identical to the retired struct fold") {
    import spark.implicits._
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_name").as("q")).limit(500)
    val lits = Seq(
      "", "div.article", "a[href='x]", "a[href='x'", "a[href=\"x]",
      "div[a[b[c", "x]]", "it's a 'test", "[", "]", "'", "\"",
      "a['][", "q[x=']'][y=\"]\"]", "[" * 20, "a[b]'c[d\"e]f",
      "main article div[class='content']")
      .toDF("q")
    val df = part.union(lits).select(
      repairSelectorRef(col("q")).as("ref"),
      PortalCatalog.repairSelectorQuery(col("q")).as("nat"))
    assert(df.filter(col("ref") =!= col("nat")).count() === 0)
  }
}
