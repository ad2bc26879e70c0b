package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Differential tests: the native micro-int vector primitives must be
  * byte-identical to the interpreted HOF formulations they retired,
  * over the real embeddings table plus adversarial values (negative
  * halves, where Math.round and BigDecimal HALF_UP differ). */
class VectorPrimitivesSpec extends SparkSpec {

  // frozen HOF reference forms
  private def microVecRef(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1e6).cast("long"))
  private def sqDistRef(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)
  private def intDotRef(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), _ + _)
  private def microNormRef(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0L), _ + _).cast("double"))
  private def subVecRef(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x - y)

  private def vecs = {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("embedding")).limit(200)
    // negative halves: -0.0000005f * 1e6 = -0.5 exactly; HALF_UP -> -1
    val lits = Seq(
      Seq.fill(64)(-0.0000005f), Seq.fill(64)(0.0000005f),
      Seq.fill(64)(0.0f), (0 until 64).map(i => (i - 32) * 0.015625f))
      .toDF("embedding")
    emb.union(lits)
  }

  test("MicroVec / LongSqDist / LongDot / LongSumSq / LongSubVec match the retired HOFs") {
    val df = vecs
      .withColumn("m", Similarity.microVec(col("embedding")))
      .withColumn("mRef", microVecRef(col("embedding")))
      .withColumn("rev", reverse(col("m")))
    assert(df.filter(col("m") =!= col("mRef")).count() === 0)
    val ops = df.select(
      (Similarity.sqDist(col("m"), col("rev")) === sqDistRef(col("m"), col("rev"))).as("d"),
      (Similarity.intDot(col("m"), col("rev")) === intDotRef(col("m"), col("rev"))).as("i"),
      (Similarity.microNorm(col("m")) === microNormRef(col("m"))).as("n"),
      (Similarity.subVec(col("m"), col("rev")) === subVecRef(col("m"), col("rev"))).as("s"))
    assert(ops.filter(!col("d") || !col("i") || !col("n") || !col("s")).count() === 0)
  }

  test("PqSlices matches the retired transform+slice lambda") {
    val df = vecs
      .withColumn("m", Similarity.microVec(col("embedding")))
      .withColumn("ref", transform(sequence(lit(0), lit(Similarity.PqBlocks - 1)), b =>
        struct(b.as("block"),
          slice(col("m"), b * Similarity.PqSub + 1, lit(Similarity.PqSub)).as("sub"))))
    val nat = Similarity.pqSubvectors(
      df.select(lit(1L).as("vec_id"), col("m"), col("ref")))
    // compare the exploded form: block/sub columns against the lambda
    val refx = df.select(lit(1L).as("vec_id"), explode(col("ref")).as("r"))
      .select(col("r.block").as("block"), col("r.sub").as("sub"))
    assert(nat.select(col("block"), col("sub")).except(refx).count() === 0)
    assert(refx.except(nat.select(col("block"), col("sub"))).count() === 0)
  }
}
