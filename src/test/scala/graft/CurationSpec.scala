package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

class CurationSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def scrub(input: String): (String, Int, Int) = {
    val df = spark.createDataFrame(Seq(Tuple1(input))).toDF("text")
    df.select(Curation.scrubPii(col("text")).as("s"),
      Curation.emailCount(col("text")).as("e"),
      Curation.phoneCount(col("text")).as("p")).collect() match {
      case Array(Row(s: String, e: Int, p: Int)) => (s, e, p)
      case other => fail(s"unexpected $other")
    }
  }

  test("scrubPii masks emails and phone-like runs, in that order") {
    val (s, e, p) = scrub("mail a.b+c@sub.example.org or call +55 (11) 91234-5678 now")
    assert(s == "mail <EMAIL> or call <PHONE> now")
    assert(e == 1 && p == 1)
  }

  test("scrubPii does not double-count an email's digits as a phone") {
    val (s, e, p) = scrub("user12345678@example.com")
    assert(s == "<EMAIL>" && e == 1 && p == 0)
  }

  test("scrubPii leaves clean text alone") {
    val (s, e, p) = scrub("no contact data here, just words")
    assert(s == "no contact data here, just words" && e == 0 && p == 0)
  }

  test("repetitionStats counts a fully repeated doc as maximally duplicated") {
    val df = spark.createDataFrame(Seq(
      (1L, "spark spark spark spark"),
      (2L, "all tokens here differ fully"))).toDF("doc_id", "text")
    val rows = Curation.repetitionStats(df, "text", "doc_id")
      .orderBy(col("doc_id")).collect()
    val r1 = rows(0)
    assert(r1.getAs[Long]("n_tokens") == 4 && r1.getAs[Long]("n_distinct_tokens") == 1)
    assert(r1.getAs[Long]("top_token_e6") == 1000000L)
    assert(r1.getAs[Long]("top_bigram_e6") == 1000000L)
    assert(r1.getAs[Long]("dup_token_e6") == 750000L)
    val r2 = rows(1)
    assert(r2.getAs[Long]("dup_token_e6") == 0L && r2.getAs[Long]("top_token_e6") == 200000L)
  }

  test("stratifiedSample keeps an exact ceil(n/denom) quota per stratum") {
    val df = spark.createDataFrame(
      (1L to 23L).map(i => (i, if (i <= 17) "a" else "b"))).toDF("doc_id", "source")
    val kept = Curation.stratifiedSample(df, "source", "doc_id", 5)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("a" -> 4L, "b" -> 2L)) // ceil(17/5)=4, ceil(6/5)=2
    // deterministic: same pick on a rerun
    val ids1 = kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Curation.stratifiedSample(df, "source", "doc_id", 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
  }

  test("sequencePack lays docs at running offsets and flags straddlers") {
    val df = spark.createDataFrame(Seq(
      (1L, "s", "a b c d"), // 4 toks at offset 0
      (2L, "s", (1 to 7).map(_ => "w").mkString(" ")), // 7 toks at offset 4, crosses 8
      (3L, "s", "x y"))) // 2 toks at offset 11 -> seq 1, offset 3
      .toDF("doc_id", "source", "text")
    val out = Curation.sequencePack(df, "text", "doc_id", "source", 8)
      .orderBy(col("doc_id")).collect()
    assert(out.map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("offset_in_seq"),
      r.getAs[Boolean]("straddles"))).toSeq ==
      Seq((0L, 0L, false), (0L, 4L, true), (1L, 3L, false)))
  }

  test("topTerms ranks by tf desc then rarity (df) then term") {
    val df = spark.createDataFrame(Seq(
      (1L, "rare rare common unique"),
      (2L, "common common other"))).toDF("doc_id", "text")
    val out = Curation.topTerms(df, "text", "doc_id", 2)
      .orderBy(col("doc_id"), col("rnk")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rnk"), r.getAs[String]("tok")))
    // doc1: rare tf=2 first; then df tie at tf=1 broken by df: unique(df1) < common(df2)
    // doc2: common tf=2; then other
    assert(out.toSeq == Seq((1L, 1L, "rare"), (1L, 2L, "unique"),
      (2L, 1L, "common"), (2L, 2L, "other")))
  }

  test("mixAllocation distributes the remainder by largest fraction and caps at availability") {
    val counts = spark.createDataFrame(Seq(("a", 100L), ("b", 2L), ("c", 100L)))
      .toDF("key", "n_docs")
    // budget 10: raw = floor(10*share) = 3/3/2, fracs .5/.5/.9 -> remainder 2
    // goes to c (.9) then a (tie .5, key order) => 4/3/3; b capped at 2.
    val out = Curation.mixAllocation(counts, "key",
      Seq("a" -> 350000L, "b" -> 350000L, "c" -> 290000L), 10L)
      .orderBy(col("key")).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("quota"),
        r.getAs[Long]("alloc"), r.getAs[Long]("shortfall")))
    assert(out.toSeq == Seq(("a", 4L, 4L, 0L), ("b", 3L, 2L, 1L), ("c", 3L, 3L, 0L)))
  }

  test("contamination flags a doc sharing most shingles with the eval set") {
    val df = spark.createDataFrame(Seq(
      (0L, "alpha beta gamma delta epsilon"), // eval doc (id % 2 == 0... use pred)
      (1L, "alpha beta gamma delta zeta"), // 3 of 3 shingles? no: 3 shared of 3? compute below
      (3L, "one two three four five"))).toDF("doc_id", "text")
    val out = Curation.contamination(df, "text", "doc_id", col("doc_id") === 0)
      .orderBy(col("doc_id")).collect()
    // doc 1 shingles: "alpha beta gamma","beta gamma delta","gamma delta zeta";
    // first two appear in eval doc 0 -> 2/3 contaminated, flagged.
    assert(out(0).getAs[Long]("n_shingles") == 3 && out(0).getAs[Long]("n_contaminated") == 2)
    assert(out(0).getAs[Boolean]("contaminated"))
    assert(out(1).getAs[Long]("n_contaminated") == 0 && !out(1).getAs[Boolean]("contaminated"))
  }

  test("dupNgrams marks grams shared across docs and flags mostly-duplicated docs") {
    val df = spark.createDataFrame(Seq(
      (0L, "a b c d e f"), //  grams: "a b c d e", "b c d e f" — both shared with doc 1
      (1L, "a b c d e f g"), // shares both of doc 0's grams, has one unique
      (2L, "p q r s t u"))).toDF("doc_id", "text")
    val out = Curation.dupNgrams(df, "text", "doc_id", 5)
      .orderBy(col("doc_id")).collect()
    assert(out(0).getAs[Long]("n_grams") == 2 && out(0).getAs[Long]("n_dup_grams") == 2)
    assert(out(0).getAs[Boolean]("near_dup"))
    assert(out(1).getAs[Long]("n_grams") == 3 && out(1).getAs[Long]("n_dup_grams") == 2)
    assert(out(1).getAs[Boolean]("near_dup")) // 2*2 >= 3
    assert(out(2).getAs[Long]("n_dup_grams") == 0 && !out(2).getAs[Boolean]("near_dup"))
    assert(out(0).getAs[Long]("max_gram_df") == 2)
  }

  test("exactSubstrDedup removes every non-first duplicated-gram span") {
    val df = spark.createDataFrame(Seq(
      (1L, "a b c d"),     // holds the first occurrences of "a b" / "b c" / "c d"
      (2L, "a b c x"),     // "a b"@1 and "b c"@2 both duplicated -> tokens 1-3 go
      (3L, "z z z"),       // within-doc repeat of "z z": second occurrence goes
      (4L, "a b q c d")    // two DISJOINT deleted spans around a kept token
    )).toDF("doc_id", "text")
    val out = Curation.exactSubstrDedup(df, "text", "doc_id", 2)
      .orderBy(col("doc_id")).collect()
    def row(i: Int) = (out(i).getAs[Long]("n_tokens"), out(i).getAs[Long]("n_removed"),
      out(i).getAs[Long]("n_spans"), out(i).getAs[String]("kept_md5"))
    // doc 1: owns every first occurrence -> untouched
    assert(row(0) == ((4L, 0L, 0L, "713f592bd537f7725d491a03e837d64a"))) // "a b c d"
    // doc 2: ranges [1,2] and [2,3] union into ONE span; only "x" survives
    assert(row(1) == ((4L, 3L, 1L, "9dd4e461268c8034f5c8564e155c67a6"))) // "x"
    // doc 3: "z z" repeats within the doc; the second occurrence's range goes
    assert(row(2) == ((3L, 2L, 1L, "fbade9e36a3f36d3d676c1b808451dd7"))) // "z"
    // doc 4: "a b" and "c d" are non-first -> spans [1,2] and [4,5], "q" kept
    assert(row(3) == ((5L, 4L, 2L, "7694f4a66316e53c8cdd9d9954bd611d"))) // "q"
  }

  test("q158 DoReMi mix: weights and quotas are exact budget splits, ordered by excess loss") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.CurationQueries.doremiMix(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("weight_e6")).sum === 1000000L)
    assert(out.map(_.getAs[Long]("quota_docs")).sum ===
      graft.queries.CurationQueries.DoremiBudget)
    // a domain with zero excess never out-weighs one with positive excess
    // (largest-remainder rounding can wiggle a weight by a few units)
    val zero = out.filter(_.getAs[Long]("excess_milli") === 0L)
    val pos = out.filter(_.getAs[Long]("excess_milli") > 0L)
    if (zero.nonEmpty && pos.nonEmpty) {
      val maxZero = zero.map(_.getAs[Long]("weight_e6")).max
      val minPos = pos.map(_.getAs[Long]("weight_e6")).min
      assert(maxZero <= minPos + 10, s"$maxZero vs $minPos")
    }
    // the iteration moved mass: unless all excesses are equal, some
    // domain must sit above the uniform share and some below
    val k = out.length
    if (out.map(_.getAs[Long]("excess_milli")).distinct.length > 1) {
      assert(out.exists(_.getAs[Long]("weight_e6") > 1000000L / k))
      assert(out.exists(_.getAs[Long]("weight_e6") < 1000000L / k + 1))
    }
  }

  test("q170 Luhn audit matches an in-memory checksum replay") {
    // reference Luhn: sum digits right-to-left, doubling every second
    def luhnOk(pan: String): Boolean = {
      val s = pan.reverse.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 1) { val dd = d * 2; if (dd > 9) dd - 9 else dd } else d
      }.sum
      s % 10 == 0
    }
    val custs = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = custs.groupBy(_._2).map { case (seg, xs) =>
      val flags = xs.map { case (k, _) =>
        val p15 = f"${(k * 7919L + 13L) % 1000000000000000L}%015d"
        val sum15 = (p15 + "0").reverse.zipWithIndex.map { case (ch, i) =>
          val d = ch - '0'
          if (i % 2 == 1) { val dd = d * 2; if (dd > 9) dd - 9 else dd } else d
        }.sum
        val chk = (10 - sum15 % 10) % 10
        val digit = if (k % 3 == 0) chk else (chk + 5) % 10
        luhnOk(p15 + digit.toString)
      }
      seg -> (flags.length.toLong, flags.count(identity).toLong)
    }
    val rows = graft.queries.CurationQueries.luhnAudit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, v) = expected(r.getAs[String]("segment"))
      assert(r.getAs[Long]("n_candidates") === n)
      assert(r.getAs[Long]("n_luhn_valid") === v)
      assert(r.getAs[Long]("n_rejected") === n - v)
      assert(r.getAs[Long]("digits_redacted") === v * 16L)
    }
    // the off-by-5 check digit always breaks Luhn, the exact one always
    // passes: validated set == custkey % 3 == 0 set
    val nValid = rows.map(_.getAs[Long]("n_luhn_valid")).sum
    assert(nValid === custs.count(_._1 % 3 == 0).toLong)
    assert(nValid > 0 && nValid < custs.length)
  }

  test("stratumValueRankAsc equals the single-window ascending rank") {
    import spark.implicits._
    // skewed strata (one stratum holds half the rows) with sparse,
    // wide-range keys so the adaptive bucket width actually buckets
    val df = spark.range(0, 5000).select(
      when($"id" % 10 < 5, lit("hot")).otherwise(concat(lit("s"), $"id" % 7)).as("stratum"),
      ($"id" * $"id" % 1000003 * 977).as("v"),
      $"id".as("rid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"stratum").orderBy($"v", $"rid")
    val expected = df.withColumn("rk0", row_number().over(w).cast("long"))
      .select($"stratum", $"rid", $"rk0").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = Curation.stratumValueRankAsc(df, "stratum", "v", "rid")
      .select($"stratum", $"rid", $"rk").collect()
    assert(got.length === expected.size)
    got.foreach(r => assert(
      r.getLong(2) === expected((r.getString(0), r.getLong(1))), r))
  }
}
