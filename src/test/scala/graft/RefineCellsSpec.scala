package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** [[Similarity.refineCells]] — the occupancy-bounded cell splitting
  * that keeps SemDeDup's within-cell pairwise from going quadratic at
  * trajectory scale. Pins: identity below the cap (the gate regime),
  * cap enforcement on separable data, coarse-partition refinement
  * (a refined cell never mixes coarse clusters), per-vector payload
  * preservation, determinism, and termination on the degenerate
  * all-identical cell. */
class RefineCellsSpec extends SparkSpec {

  import spark.implicits._

  private def mem(rows: Seq[(Long, Long, Long, Seq[Long])]) =
    rows.toDF("vec_id", "cluster", "dist", "m")

  // two tight groups far apart inside cluster 1, a small cluster 2
  private val separable = mem(
    (0L until 6L).map(i => (i, 1L, 10L + i, Seq(i % 2 * 1000L, 100L + i))) ++
      Seq((100L, 2L, 5L, Seq(7L, 7L))))

  test("identity when no cell exceeds the cap") {
    val out = Similarity.refineCells(separable, cap = 16)
    assert(out.orderBy("vec_id").collect().toSeq ===
      separable.orderBy("vec_id").collect().toSeq)
  }

  test("oversized separable cells split under the cap; payload and coarse partition preserved") {
    val out = Similarity.refineCells(separable, cap = 4, fanout = 2).cache()
    assert(out.count() === 7)
    // cap holds everywhere
    val occ = out.groupBy("cluster").count().collect().map(_.getLong(1))
    assert(occ.forall(_ <= 4))
    // dist and m ride through untouched
    val byId = out.collect().map(r =>
      r.getLong(0) -> (r.getLong(2), r.getSeq[Long](3))).toMap
    separable.collect().foreach { r =>
      assert(byId(r.getLong(0)) === ((r.getLong(2), r.getSeq[Long](3))))
    }
    // refinement only ever SPLITS a coarse cluster: members of coarse
    // cluster 1 and coarse cluster 2 never share a refined cell
    val cellsOf = out.collect().groupBy(_.getLong(1))
      .map { case (c, rs) => c -> rs.map(_.getLong(0)).toSet }
    cellsOf.values.foreach { ids =>
      assert(ids.forall(_ < 100L) || ids.forall(_ >= 100L))
    }
    // the two planted groups (even/odd vec_ids, 1000 apart in dim 1)
    // land in different refined cells
    val cellOf = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cellOf(0L) === cellOf(2L) && cellOf(1L) === cellOf(3L))
    assert(cellOf(0L) !== cellOf(1L))
    out.unpersist()
  }

  test("deterministic across runs") {
    val a = Similarity.refineCells(separable, cap = 4, fanout = 2)
      .orderBy("vec_id").collect().toSeq
    val b = Similarity.refineCells(separable, cap = 4, fanout = 2)
      .orderBy("vec_id").collect().toSeq
    assert(a === b)
  }

  test("all-identical oversized cell terminates at maxRounds without row loss") {
    val ident = mem((0L until 10L).map(i => (i, 3L, 1L, Seq(5L, 5L))))
    val out = Similarity.refineCells(ident, cap = 4, fanout = 2, maxRounds = 3)
    assert(out.count() === 10)
    // every member picked seed 0 each round: one surviving cell
    assert(out.select("cluster").distinct().count() === 1)
  }

  test("q156 at the gate SF is unchanged by the cell cap") {
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    import graft.queries.SimilarityQueries._
    val capped = Similarity.semDedupVerdicts(
      emb, SemDedupK, Dim, SemDedupIters, SemDedupTauE6, SemDedupCellCap)
      .orderBy("vec_id").collect().toSeq
    val uncapped = Similarity.semDedupVerdicts(
      emb, SemDedupK, Dim, SemDedupIters, SemDedupTauE6)
      .orderBy("vec_id").collect().toSeq
    assert(capped === uncapped)
  }

  test("a cap crossing fails loudly at the gate and refines only under the scale opt-in") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    import graft.queries.SimilarityQueries._
    // a cap far below the per-cell occupancy: without the scale opt-in
    // the verdict must REFUSE (the oracle SQL does not mirror the
    // refinement), never silently diverge
    val ex = intercept[IllegalArgumentException] {
      Similarity.semDedupVerdicts(emb, k = 2, Dim, SemDedupIters,
        SemDedupTauE6, cellCap = 8).count()
    }
    assert(ex.getMessage.contains("exceeds cap"))
    // with the session-conf opt-in the same call engages refineCells
    // and completes (a session conf, unlike the former JVM-global
    // system property, can't race with concurrently running suites)
    spark.conf.set(Similarity.AllowCellSplitConf, "true")
    try {
      val n = Similarity.semDedupVerdicts(emb, k = 2, Dim, SemDedupIters,
        SemDedupTauE6, cellCap = 8).count()
      assert(n === emb.count())
    } finally spark.conf.unset(Similarity.AllowCellSplitConf)
  }
}
