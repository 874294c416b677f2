package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys: interleave the low bits of two dimensions so
  * that sorting by the single key clusters rows that are close in BOTH
  * dimensions — the standard multi-dimensional data-layout trick
  * (Delta/Iceberg OPTIMIZE ZORDER) expressed as a plain column.
  *
  * Why it matters at 100 TB: parquet row-group skipping prunes on
  * min/max of the SORT prefix only. A (user, time) table sorted by
  * user serves time-range scans badly and vice versa;
  * `sortWithinPartitions(zValue(user, bucket))` gives both predicate
  * families sub-linear scans from one layout. The key is pure integer
  * bit math — deterministic, codegen-friendly, and verifiable against
  * an independent engine bit-for-bit.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of x (even positions) and
    * y (odd positions). Inputs must be non-negative; callers truncate
    * to `bits` by construction (values are bucketed/hashed first).
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { b =>
      pmod(shiftright(x.cast("long"), b), lit(2L)) * lit(1L << (2 * b)) +
        pmod(shiftright(y.cast("long"), b), lit(2L)) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)

  /** DuckDB SQL mirror of [[zValue]] over expressions `x` and `y`. */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { b =>
      s"((($x) // ${1L << b}) % 2) * ${1L << (2 * b)}" +
        s" + ((($y) // ${1L << b}) % 2) * ${1L << (2 * b + 1)}"
    }.mkString("(", " + ", ")")
}
