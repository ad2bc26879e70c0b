package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` columns via higher-order
  * functions — stays native (no UDF), and the fold order is strictly
  * left-to-right so results are bit-reproducible against any engine
  * that folds the same way (DuckDB `list_reduce` seeds with the first
  * element; seeding with 0.0 is bit-identical because 0.0 + x == x).
  *
  * Cross-checked outputs always export cosine as integer micro-units
  * (`cosE6`) — integer rounding of an identical double is engine-safe,
  * a 6-dp double round is not.
  */
object VectorFunctions {

  import org.apache.spark.sql.GraftInternals
  import graft.expressions.ArrayDot

  /** Codegen'd float-array dot; both inputs must be array<float>. */
  def dot(a: Column, b: Column): Column =
    GraftInternals.column(ArrayDot(GraftInternals.expression(a), GraftInternals.expression(b)))

  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** cosine from a precomputed dot and two precomputed norms. */
  def cosineFrom(dotCol: Column, normA: Column, normB: Column): Column =
    dotCol / (normA * normB)

  def e6(c: Column): Column = round(c * lit(1000000.0)).cast("long")

  // ---- DuckDB SQL fragments computing the identical fold ----

  /** Element product fold: dot of two list<float> expressions (1-based). */
  def dotSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"

  def normSql(a: String, dim: Int): String =
    s"sqrt(list_reduce(list_transform(range(1, ${dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)), (x, y) -> x + y))"

  def e6Sql(e: String): String = s"CAST(ROUND(($e) * 1000000.0) AS BIGINT)"
}
