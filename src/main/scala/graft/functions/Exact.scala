package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Exact (order-independent) numeric aggregation helpers.
  *
  * Summing IEEE doubles is order-dependent; Spark sums per-partition then
  * merges in a nondeterministic order, while a single-threaded oracle sums
  * sequentially — the low bits differ and a hash-compare fails. The
  * money-like columns in the corpus carry two decimal digits, so casting to
  * DECIMAL(18,2) is lossless; decimal arithmetic is exact and associative,
  * making the aggregate bit-identical on every engine and partitioning.
  * The final cast back to double is a single deterministic rounding.
  *
  * At 100 TB this matters beyond testing: decimal sums stay correct under
  * AQE re-partitioning, skew-join splitting and speculative retries, where
  * double sums silently wobble.
  */
object Exact {
  /** Lossless 2-dp decimal view of a money-like double column. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent SUM of a 2-dp column, returned as double. */
  def moneySum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact TPC-H style discounted revenue: SUM(price * (1 - disc)). */
  def revenueSum(price: Column, disc: Column): Column =
    sum(dec2(price) * (lit(1) - dec2(disc))).cast(DoubleType)

  /** Exact AVG built from an exact sum and a count (double division of two
    * bit-identical operands is itself deterministic).
    */
  def exactAvg(c: Column): Column = moneySum(c) / count(c)
}
