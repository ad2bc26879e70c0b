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
