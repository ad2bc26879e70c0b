package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals the plain aggregation") {
    val df = Tables.lineitem(spark, sfDir)
      .select($"l_suppkey".as("key"), $"l_quantity".as("v"), $"l_orderkey".as("row_key"))
    val plain = df.groupBy($"key")
      .agg(count(lit(1)).as("n_rows"), sum($"v").as("sum_value"))
      .orderBy($"key").collect()
    val salted = Skew.saltedSumCount(df, "key", "v", "row_key")
      .orderBy($"key").collect()
    assert(plain.map(_.toSeq).toSeq == salted.map(_.toSeq).toSeq)
  }

  test("adaptive salted join equals the plain join with and without hot keys") {
    val fact = Tables.orders(spark, sfDir)
      .select($"o_custkey".as("k"), $"o_orderkey")
    val dim = Tables.customer(spark, sfDir)
      .select($"c_custkey".as("k"), $"c_name")
    val plain = fact.join(dim, Seq("k")).select($"o_orderkey", $"c_name")
      .orderBy($"o_orderkey", $"c_name").collect()
    // threshold above every key count: pure cold path
    val cold = Skew.adaptiveSaltedJoin(fact, dim, "k", "o_orderkey")
      .select($"o_orderkey", $"c_name").orderBy($"o_orderkey", $"c_name").collect()
    assert(plain.map(_.toSeq).toSeq == cold.map(_.toSeq).toSeq)
    // threshold of 1: every key is "hot" — pure salted path, same rows
    val hot = Skew.adaptiveSaltedJoin(fact, dim, "k", "o_orderkey", hotThreshold = 1L)
      .select($"o_orderkey", $"c_name").orderBy($"o_orderkey", $"c_name").collect()
    assert(plain.map(_.toSeq).toSeq == hot.map(_.toSeq).toSeq)
  }

  test("adaptive salted join splits a genuinely skewed key set exactly") {
    // one hot key carrying half the fact, many cold keys
    val fact = spark.range(0, 20000).select(
      when($"id" < 10000, lit(7L)).otherwise($"id" % 500).as("k"),
      $"id".as("row_key"), ($"id" * 3).as("v"))
    val dim = spark.range(0, 500).select($"id".as("k"), concat(lit("d"), $"id").as("name"))
    val plain = fact.join(dim, Seq("k"))
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .orderBy($"k").collect()
    val adaptive = Skew.adaptiveSaltedJoin(fact, dim, "k", "row_key", hotThreshold = 5000L)
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .orderBy($"k").collect()
    assert(plain.map(_.toSeq).toSeq == adaptive.map(_.toSeq).toSeq)
  }

  test("salted join equals the plain join") {
    val fact = Tables.orders(spark, sfDir)
      .select($"o_custkey".as("k"), $"o_orderkey")
    val dim = Tables.customer(spark, sfDir)
      .select($"c_custkey".as("k"), $"c_name")
    val plain = fact.join(dim, Seq("k")).select($"o_orderkey", $"c_name")
      .orderBy($"o_orderkey").collect()
    val salted = Skew.saltedJoin(fact, dim, "k", "o_orderkey").select($"o_orderkey", $"c_name")
      .orderBy($"o_orderkey").collect()
    assert(plain.map(_.toSeq).toSeq == salted.map(_.toSeq).toSeq)
  }
}
