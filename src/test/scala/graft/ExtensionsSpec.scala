package graft

class ExtensionsSpec extends SparkSpec {

  test("graft functions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_strip_accents('São João') AS s,
        |       graft_poly_hash('ab1') AS h,
        |       graft_array_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                       array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d
        |""".stripMargin).collect().head
    assert(r.getString(0) == "Sao Joao")
    assert(r.getLong(1) == "ab1".foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L))
    assert(r.getDouble(2) == 11.0)
  }
}
