package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic numeric helpers.
  *
  * The driver hash-compares our results against DuckDB. A plain
  * `SUM(double)` is order-dependent (floating-point addition is not
  * associative), so two engines summing the same values in different
  * orders produce different low bits. Summing after a cast to
  * DECIMAL(38,6) is exact and order-independent, and the final cast back
  * to DOUBLE of the same decimal value is bit-identical in both engines.
  * Rounding double→decimal is also consistent: both engines round the
  * binary value to nearest (ties away from zero), and real-world doubles
  * essentially never land exactly on a decimal tie.
  *
  * Averages are expressed as exact-decimal-sum / count so the single
  * double division happens on identical operands in both engines.
  */
object Cols {
  val Dec: DecimalType = DecimalType(38, 6)

  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")
  def davg(c: Column): Column = dsum(c) / count(c)
  def dsumOver(c: Column, w: WindowSpec): Column =
    sum(c.cast(Dec)).over(w).cast("double")

  /** DuckDB-SQL mirrors of the helpers above, for oracle strings. */
  def dsumSql(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(38,6))) AS DOUBLE)"
  def davgSql(e: String): String = s"${dsumSql(e)} / COUNT($e)"
}
