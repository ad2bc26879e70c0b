package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, GraftInternals}

import graft.expressions.PolyHash

/** Portable, engine-independent hashing built from explicit integer
  * arithmetic over code points. Used wherever a hash value is part of a
  * cross-engine-checked result (fingerprints, minhash, simhash, LSH
  * buckets): engine-builtin hashes (murmur3, xxhash) differ between
  * systems, so they can never appear in an oracle-compared column.
  *
  * The string fold runs as a codegen'd Catalyst expression
  * ([[graft.expressions.PolyHash]]); the minhash family derives K
  * hashes from ONE fold via affine maps `(A_k*h + B_k) mod M` — the
  * standard universal-hashing trick that keeps minhash O(len) instead
  * of O(K*len) per shingle.
  */
object Hashing {
  val Mod: Long = 1000000007L
  val Base: Long = 31L

  /** Polynomial rolling hash of a string's code points, mod 1e9+7. */
  def polyHash(c: Column): Column =
    GraftInternals.column(PolyHash(GraftInternals.expression(c)))

  /** Affine-family constants (deterministic, engine-independent). */
  def hashA(k: Int): Long = ((k + 1) * 2654435761L) % Mod
  def hashB(k: Int): Long = (k * 40503L + 17L) % Mod

  /** k-th family member applied to a precomputed base hash. */
  def affine(baseHash: Column, k: Int): Column =
    (lit(hashA(k)) * baseHash + lit(hashB(k))) % Mod

  /** DuckDB SQL fragment computing the same polyHash over expression `e`. */
  def polyHashSql(e: String): String =
    s"list_reduce(list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT)), (a, b) -> (a * 31 + b) % 1000000007)"

  /** DuckDB SQL for the k-th affine family member over a hash column. */
  def affineSql(baseExpr: String, k: Int): String =
    s"(${hashA(k)} * $baseExpr + ${hashB(k)}) % $Mod"
}
