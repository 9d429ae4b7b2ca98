package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared column helpers used across the query surface.
  *
  * Floating-point discipline: any aggregate whose value depends on the
  * order of a distributed reduction (sum/avg over doubles) is computed over
  * an exact decimal so the result is bit-identical regardless of partition
  * count or scheduling — this is what makes results stable between a
  * local[32] run and a 1000-executor cluster, and lets the DuckDB oracle
  * hash-match. Min/max/count are order-independent already.
  */
object Sql {

  /** Order-independent exact sum of a double column, returned as double.
    * DuckDB equivalent: CAST(SUM(CAST(x AS DECIMAL(27,4))) AS DOUBLE).
    */
  def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(27, 4))).cast("double")

  /** Order-independent mean: exact decimal sum / count, double division.
    * DuckDB equivalent: CAST(SUM(CAST(x AS DECIMAL(27,4))) AS DOUBLE)/COUNT(x).
    */
  def exactAvg(c: Column): Column =
    exactSum(c) / count(c)

  /** Round a double to `d` decimals (HALF_UP, matches DuckDB's
    * round-half-away-from-zero for the magnitudes we use).
    */
  def r(c: Column, d: Int): Column = round(c, d)

  /** pandas-compatible shortest string form of a value already rounded to
    * `scale` decimals: "2.45" not "2.450", "-18.0" not "-18".
    * (reference float-format oracle: test_transforms.py:4203-4214)
    * DuckDB equivalent: the same two regexp_replace calls over
    * CAST(CAST(x AS DECIMAL(12,scale)) AS VARCHAR).
    */
  def floatStr(c: Column, scale: Int): Column = {
    val full = c.cast(DecimalType(12, scale)).cast("string")
    val stripped = regexp_replace(full, "(\\.[0-9]*[1-9])0+$", "$1")
    regexp_replace(stripped, "\\.0+$", ".0")
  }
}
