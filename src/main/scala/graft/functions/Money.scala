package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-integer money arithmetic.
  *
  * The driver's correctness gate hash-compares Spark output against a
  * DuckDB oracle. Floating-point aggregates are summation-order
  * dependent, so every monetary aggregate in this engine is carried as
  * an exact integer (cents, or basis-point-scaled units). Integer sums
  * are associative — identical on any engine, any partitioning, any
  * scale. This is also the right call at 100 TB: integer aggregation
  * never accumulates float error across a billion rows.
  */
object Money {
  /** 2-decimal monetary column -> exact integer cents. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** 2-decimal rate column (e.g. 0.07) -> exact integer percent. */
  def pct(c: Column): Column = round(c * 100).cast("long")

  /** extendedprice*(1-discount) in 1e-4 currency units, exact. */
  def discPriceE4(price: Column, discount: Column): Column =
    cents(price) * (lit(100L) - pct(discount))

  /** extendedprice*(1-discount)*(1+tax) in 1e-6 units, exact. */
  def chargeE6(price: Column, discount: Column, tax: Column): Column =
    cents(price) * (lit(100L) - pct(discount)) * (lit(100L) + pct(tax))
}
