package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve for multi-dimensional data layout.
  *
  * Interleaving the bits of two clustering dimensions gives a single sort
  * key under which files/row-groups are simultaneously tight in BOTH
  * dimensions — the layout trick behind Delta/Iceberg `ZORDER BY`: a scan
  * filtered on either dimension (or both) prunes most buckets by its
  * min/max statistics, where a single-column sort only prunes one
  * dimension. The curve itself is pure row-local bit arithmetic — zero
  * shuffle to compute; the one exchange in a full rewrite is the final
  * `repartitionByRange(zval)` that lays files out (at 100 TB: a range
  * shuffle you pay once at write time to make every later scan cheaper).
  *
  * Exactness: the interleave is an unrolled integer sum of shifted bits —
  * the same 16-term expression is emitted for Spark ([[interleaveCol]])
  * and for the DuckDB oracle ([[interleaveSql]]), so the gate compares a
  * bit-identical derivation, not a reimplementation.
  */
object ZOrder {

  /** Bits taken from each dimension (z fits in 2·Bits ≤ 63). */
  val Bits = 16

  /** Morton-interleave two non-negative int columns (low [[Bits]] bits
    * each): x occupies even bit positions, y odd.
    */
  def interleaveCol(x: Column, y: Column): Column =
    (0 until Bits)
      .map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      }
      .reduce(_ + _)

  /** The same interleave as DuckDB SQL over expressions `x` and `y`. */
  def interleaveSql(x: String, y: String): String =
    (0 until Bits)
      .map(i => s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")
}
