package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric helpers shared by query definitions and operators.
  *
  * Floating-point SUM is order-dependent; on a 1000-executor cluster the
  * combine order is nondeterministic, so two runs of the same query can
  * disagree in the last ULPs. For money-like columns (TPC-H prices,
  * quantities — at most 4 meaningful decimals) we sum in exact decimal
  * space and convert once at the end: deterministic at any parallelism and
  * bit-identical to any other engine (the DuckDB oracle) doing the same.
  */
object Numeric {

  /** Exact, order-independent sum of a money-like double column.
    * Oracle form: CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE).
    */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Exact average built from the exact decimal sum (sum/count in double:
    * one final division of two identical values on any engine).
    * Oracle form: CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(x).
    */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double") / count(c)

  /** Exact decimal sum of a product of two money-like columns (e.g.
    * extendedprice * (1 - discount)). Multiply in decimal space so the
    * product is exact, then renormalize to scale 4 BEFORE summing: for
    * 2-dp money inputs the product has ≤4 decimals so this loses
    * nothing, and it keeps the summed value's scaled integer below 2^53
    * — above that, engines that convert decimal→double as
    * (double)int128 / 10^scale (two roundings) drift 1 ulp from a
    * correctly-rounded conversion, which exact differential testing
    * catches at sf0.1.
    * Oracle form: CAST(SUM(CAST(CAST(x AS DECIMAL(18,4)) *
    *   CAST(y AS DECIMAL(18,4)) AS DECIMAL(28,4))) AS DOUBLE).
    */
  def dsumProduct(x: Column, y: Column): Column =
    sum((x.cast(DecimalType(18, 4)) * y.cast(DecimalType(18, 4)))
      .cast(DecimalType(28, 4))).cast("double")
}
