package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.queries.SimilarityQueries

/** The band-bucket occupancy cap on cosinePairsLsh: a bucket past the
  * cap is dropped before the self-join (quadratic-work guard rail),
  * while gate-scale corpora never trip it. */
class CosinePairsCapSpec extends SparkSpec {

  test("a dense bucket past the cap is dropped; a small one survives") {
    import spark.implicits._
    // 200 identical vectors land in the SAME bucket of every band
    // (cap 128 < 200 -> all four bands drop it); two other near-equal
    // vectors form their own tiny bucket and must still pair up
    val dense = (0L until 200L).map(i => (i, Array.fill(64)(1.0f)))
    val sparsePair = Seq(
      (1000L, Array.tabulate(64)(i => if (i == 0) -1.0f else 0.01f)),
      (1001L, Array.tabulate(64)(i => if (i == 0) -1.0f else 0.011f)))
    val vecs = (dense ++ sparsePair).toDF("vec_id", "embedding")
    val capped = Similarity.cosinePairsLsh(vecs, 0.4,
      bucketCap = Some(SimilarityQueries.NeardupBucketCap)).collect()
    val uncapped = Similarity.cosinePairsLsh(vecs, 0.4).collect()
    // uncapped: the dense clique alone is 200*199/2 pairs
    assert(uncapped.length >= 199 * 100)
    // capped: every dense-clique pair is gone, the sparse pair remains
    val cappedPairs = capped.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedPairs === Set((1000L, 1001L)))
  }

  test("the cap never binds at gate scale (q25 results unchanged)") {
    val emb = Tables.embeddings(spark, sfDir)
    val maxOcc = Similarity.neardupBandRows(
      emb.withColumn("nrm", lit(1.0)), "vec_id", "embedding")
      .groupBy(col("band_id"), col("band_val")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxOcc <= SimilarityQueries.NeardupBucketCap,
      s"gate corpus bucket occupancy $maxOcc exceeds the cap")
  }
}
