package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable, engine-independent hashing built from explicit integer
  * arithmetic over code points. Used wherever a hash value is part of a
  * cross-engine-checked result (fingerprints, minhash, simhash, LSH
  * buckets): engine-builtin hashes (murmur3, xxhash) differ between
  * systems, so they can never appear in an oracle-compared column.
  *
  * All folds are left-to-right with the accumulator seeded by the first
  * element (matching DuckDB's `list_reduce`), and all intermediates stay
  * exact in Long arithmetic.
  */
object Hashing {
  val Mod: Long = 1000000007L
  val Base: Long = 31L

  /** Polynomial rolling hash of a string's code points, mod 1e9+7. */
  def polyHash(c: Column): Column =
    aggregate(
      transform(split(c, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * Base + x) % Mod)

  /** Seeded variant: h_seed(s) = polyHash(seed || ':' || s). Cheap family
    * of independent-ish hash functions for minhash. */
  def polyHashSeeded(c: Column, seed: Int): Column =
    polyHash(concat(lit(s"$seed:"), c))

  /** DuckDB SQL fragment computing the same polyHash over expression `e`. */
  def polyHashSql(e: String): String =
    s"list_reduce(list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT)), (a, b) -> (a * 31 + b) % 1000000007)"

  def polyHashSeededSql(e: String, seed: Int): String =
    polyHashSql(s"'$seed:' || $e")
}
