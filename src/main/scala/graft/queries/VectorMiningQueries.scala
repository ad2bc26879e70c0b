package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.functions.VectorFunctions._
import graft.operators.{Dedup, Similarity}
import graft.plans.Plans

/** Embedding-space mining beyond point lookups — the graph-, panel-
  * and pair-shaped consumers of the ANN machinery an embedding-driven
  * data pipeline runs next: the k-NN GRAPH whose degree/reciprocity
  * profile is the standard ANN-index health check (and the substrate
  * of graph-based indexes like HNSW), MMR diversified reranking (the
  * RAG answer-set de-redundancy step), and contrastive hard-negative
  * mining (the training-pair generator for embedding-model
  * fine-tuning). All candidate generation rides the multi-band LSH of
  * q25 — never an all-pairs scan — and every ranking key is integer,
  * so results are engine-exact. */
object VectorMiningQueries {

  type Q = (SparkSession, String) => DataFrame

  private val Dim = Similarity.Dim

  // ---- q183: k-NN graph + degree/reciprocity audit ----

  val KnnK = 4

  /** q183: directed k-NN graph over the corpus — each vector's top-4
    * most-similar peers among its multi-band LSH candidates — plus the
    * per-node audit every ANN deployment reads before trusting an
    * index: out-degree (< k means the bands isolated the node),
    * IN-degree (hubness — the skew that poisons graph-index
    * navigability), reciprocal-edge count (symmetry of the
    * neighborhood relation) and the top-1 neighbor.
    *
    * Scale shape: candidates are the q25 band self-join (work is
    * Sum(bucket^2), never n^2); each undirected pair is scored ONCE
    * and emitted in both directions; per-node top-k runs through
    * TopKPerKeyExec bounded heaps (no corpus-wide window); the
    * in-degree/reciprocity joins touch only the n*k edge table, keyed
    * by vec_id. Exactly the candidate+rank recipe an HNSW/NSG builder
    * distributes at 100 TB. */
  def knnGraph(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    // threshold -2 keeps every scored candidate (cos >= -1 always)
    val pairs = Dedup.stage(Similarity.cosinePairsLsh(emb, -2.0))
    val both = pairs.select(col("vec_id_a").as("src"), col("vec_id_b").as("dst"), col("cos_e6"))
      .union(pairs.select(col("vec_id_b").as("src"), col("vec_id_a").as("dst"), col("cos_e6")))
    val edges = Dedup.stage(Plans.topKPerKeyRanked(both, Seq(both("src")),
      Seq((both("cos_e6"), true), (both("dst"), false)), KnnK, "rnk"))
    val outd = edges.groupBy(col("src")).agg(
      count(lit(1)).as("degree"), sum(col("cos_e6")).as("sum_cos_e6"))
    val ind = edges.groupBy(col("dst").as("src")).agg(count(lit(1)).as("in_degree"))
    val rec = edges.select(col("src"), col("dst"))
      .join(edges.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"))
      .groupBy(col("src")).agg(count(lit(1)).as("recip_edges"))
    val top1 = edges.filter(col("rnk") === 1L)
      .select(col("src"), col("dst").as("top1_id"), col("cos_e6").as("top1_cos_e6"))
    emb.select(col("vec_id").as("src"))
      .join(outd, Seq("src"), "left")
      .join(ind, Seq("src"), "left")
      .join(rec, Seq("src"), "left")
      .join(top1, Seq("src"), "left")
      .select(col("src").as("vec_id"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"),
        coalesce(col("recip_edges"), lit(0L)).as("recip_edges"),
        col("top1_id"), col("top1_cos_e6"),
        coalesce(col("sum_cos_e6"), lit(0L)).as("sum_cos_e6"))
      .orderBy(col("vec_id"))
  }

  val knnGraphSql: String = {
    val dotAB = dotSql("a.emb_a", "b.emb_b", Dim)
    val bandSelects = (0 until Similarity.NeardupBands).map { b =>
      s"SELECT vec_id, $b AS band_id, ${Similarity.neardupBandSql("embedding", b)} AS band_val FROM base"
    }.mkString("\nUNION ALL\n")
    s"""WITH base AS (SELECT vec_id, embedding, ${normSql("embedding", Dim)} AS nrm FROM embeddings),
       |banded AS (
       |$bandSelects),
       |cand AS (SELECT DISTINCT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
       |  FROM banded a JOIN banded b
       |    ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.vec_id < b.vec_id),
       |pairs AS (SELECT vec_id_a, vec_id_b,
       |    ${e6Sql(s"($dotAB) / (a.norm_a * b.norm_b)")} AS cos_e6
       |  FROM cand
       |  JOIN (SELECT vec_id AS vec_id_a, embedding AS emb_a, nrm AS norm_a FROM base) a USING (vec_id_a)
       |  JOIN (SELECT vec_id AS vec_id_b, embedding AS emb_b, nrm AS norm_b FROM base) b USING (vec_id_b)),
       |both_dir AS (SELECT vec_id_a AS src, vec_id_b AS dst, cos_e6 FROM pairs
       |  UNION ALL SELECT vec_id_b AS src, vec_id_a AS dst, cos_e6 FROM pairs),
       |edges AS (SELECT src, dst, cos_e6, rnk FROM (
       |    SELECT src, dst, cos_e6,
       |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos_e6 DESC, dst) AS rnk
       |    FROM both_dir) WHERE rnk <= $KnnK),
       |outd AS (SELECT src, COUNT(*) AS degree,
       |    CAST(SUM(cos_e6) AS BIGINT) AS sum_cos_e6 FROM edges GROUP BY src),
       |ind AS (SELECT dst AS src, COUNT(*) AS in_degree FROM edges GROUP BY dst),
       |rec AS (SELECT e1.src AS src, COUNT(*) AS recip_edges
       |  FROM edges e1 JOIN edges e2 ON e1.src = e2.dst AND e1.dst = e2.src
       |  GROUP BY e1.src),
       |top1 AS (SELECT src, dst AS top1_id, cos_e6 AS top1_cos_e6 FROM edges WHERE rnk = 1)
       |SELECT v.vec_id,
       |  COALESCE(outd.degree, 0) AS degree,
       |  COALESCE(ind.in_degree, 0) AS in_degree,
       |  COALESCE(rec.recip_edges, 0) AS recip_edges,
       |  top1.top1_id, top1.top1_cos_e6,
       |  COALESCE(outd.sum_cos_e6, 0) AS sum_cos_e6
       |FROM (SELECT vec_id FROM embeddings) v
       |LEFT JOIN outd ON v.vec_id = outd.src
       |LEFT JOIN ind ON v.vec_id = ind.src
       |LEFT JOIN rec ON v.vec_id = rec.src
       |LEFT JOIN top1 ON v.vec_id = top1.src
       |ORDER BY v.vec_id""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q183_knn_graph" -> (knnGraph _))

  val oracles: Map[String, String] = Map(
    "q183_knn_graph" -> knnGraphSql)
}
