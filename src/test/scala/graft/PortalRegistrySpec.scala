package graft

import org.apache.spark.sql.functions._

import graft.queries.PortalRegistryQueries

/** q244: first-registration-wins, duplicate conflict, and not-found
  * semantics of the portal registration service
  * (servico_registro_portal.py:24-67). */
class PortalRegistrySpec extends SparkSpec {

  private lazy val out =
    PortalRegistryQueries.portalRegistry(spark, sfDir).collect()

  test("exactly one registration per name wins; the rest conflict") {
    val regs = out.filter(_.getAs[String]("op") == "register")
    val winners = regs.filter(_.getAs[String]("outcome") == "registered")
    assert(winners.map(_.getAs[String]("name")).toSet.size === winners.length)
    assert(winners.length === PortalRegistryQueries.NamePool)
    regs.filter(_.getAs[String]("outcome") == "conflict").foreach { r =>
      assert(r.getAs[Long]("winner_seq") < r.getAs[Long]("seq"))
      assert(r.getAs[String]("message") ===
        s"Portal '${r.getAs[String]("name")}' already exists")
    }
  }

  test("gets see the registry as of their seq; unknown names raise") {
    val regs = out.filter(_.getAs[String]("op") == "register")
    val firstSeq = regs.filter(_.getAs[String]("outcome") == "registered")
      .map(r => r.getAs[String]("name") -> r.getAs[Long]("seq")).toMap
    out.filter(_.getAs[String]("op") == "get").foreach { r =>
      val name = r.getAs[String]("name")
      val expectFound = firstSeq.get(name).exists(_ < r.getAs[Long]("seq"))
      if (expectFound) {
        assert(r.getAs[String]("outcome") === "found")
        assert(r.getAs[Long]("winner_seq") === firstSeq(name))
      } else {
        assert(r.getAs[String]("outcome") === "not_found")
        assert(r.getAs[String]("message") === s"Portal '$name' not found")
        assert(r.isNullAt(r.fieldIndex("winner_seq")))
      }
    }
    // the never-registered tail of the probe pool is exercised
    val notFoundNames = out.filter(r => r.getAs[String]("op") == "get" &&
      r.getAs[String]("outcome") == "not_found").map(_.getAs[String]("name")).toSet
    assert((PortalRegistryQueries.NamePool until PortalRegistryQueries.GetNames)
      .map(i => s"portal_$i").toSet.subsetOf(notFoundNames))
  }
}
