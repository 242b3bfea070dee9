package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers enforcing the hash-match determinism rules of
  * SURVEY.md §5.4: DECIMAL(18,2) money math (exact, associative —
  * partition-order independent), explicit total ORDER BY, and
  * double division only on already-exact operands.
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  /** Money cast: do this BEFORE aggregating; decimal sums are exact. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Final cast for aggregated money, so Spark's widened sum type
    * (DECIMAL(28,2)) and DuckDB's (DECIMAL(38,2)) align at (18,2). */
  def dec18(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact average: decimal sum → double, divided by a count.
    * Both engines perform the identical IEEE-754 division. */
  def avgExact(sum: Column, n: Column): Column =
    sum.cast(DoubleType) / n
}
