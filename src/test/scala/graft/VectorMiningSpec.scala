package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.queries.VectorMiningQueries

/** q183: k-NN graph — structural invariants plus a differential
  * re-derivation of the edge ranking through a window (pinning the
  * TopKPerKeyExec heap path against the textbook row_number form). */
class VectorMiningSpec extends SparkSpec {

  private lazy val rows = VectorMiningQueries.knnGraph(spark, sfDir).collect()

  test("q183 node audit is internally consistent") {
    assert(rows.length === 500)
    var totalDeg = 0L; var totalIn = 0L
    rows.foreach { r =>
      val deg = r.getAs[Long]("degree")
      assert(deg >= 0 && deg <= VectorMiningQueries.KnnK)
      assert(r.getAs[Long]("recip_edges") <= deg)
      assert((deg == 0) === r.isNullAt(r.fieldIndex("top1_id")),
        "top1 exists exactly when the node has an edge")
      totalDeg += deg; totalIn += r.getAs[Long]("in_degree")
    }
    // every directed edge has exactly one source and one destination
    assert(totalDeg === totalIn)
    assert(rows.count(_.getAs[Long]("degree") > 0) > 400,
      "the bands must connect most of the corpus")
    assert(rows.exists(_.getAs[Long]("recip_edges") > 0), "mutual neighbors exist")
  }

  test("q183 edges match a row_number window over the same candidates") {
    val emb = Tables.embeddings(spark, sfDir)
    val pairs = Similarity.cosinePairsLsh(emb, -2.0)
    val both = pairs.select(col("vec_id_a").as("src"), col("vec_id_b").as("dst"), col("cos_e6"))
      .union(pairs.select(col("vec_id_b").as("src"), col("vec_id_a").as("dst"), col("cos_e6")))
    val w = Window.partitionBy(col("src")).orderBy(col("cos_e6").desc, col("dst"))
    val ref = both.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= VectorMiningQueries.KnnK)
      .groupBy(col("src")).agg(count(lit(1)).as("degree"),
        sum(col("cos_e6")).as("sum_cos_e6"),
        max(when(col("rnk") === 1, col("dst"))).as("top1_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      ref.get(id) match {
        case Some((deg, sumCos, top1)) =>
          assert(r.getAs[Long]("degree") === deg, s"degree of $id")
          assert(r.getAs[Long]("sum_cos_e6") === sumCos, s"sum_cos of $id")
          assert(r.getAs[Long]("top1_id") === top1, s"top1 of $id")
        case None =>
          assert(r.getAs[Long]("degree") === 0L, s"node $id should be isolated")
      }
    }
  }
}
