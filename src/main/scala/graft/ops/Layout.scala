package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning at scale.
  *
  * Z-ordering (Morton curve) maps a pair of clustering keys to one
  * dimension such that points close in BOTH keys stay close on the curve:
  * sorting/partitioning 100 TB of files by the z-value gives every file a
  * tight min/max envelope on BOTH columns at once, so range predicates on
  * either key (or both) prune files — the layout trick behind
  * OPTIMIZE ZORDER in lakehouse engines, expressed here as a plain
  * deterministic integer expression (codegen'd bit arithmetic, no UDF,
  * oracle-checkable on any engine with shift/and operators).
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of x (even positions)
    * and y (odd positions). With the default 16+16 bits the result fits in
    * 32 bits. Inputs must be non-negative (callers bucket/clamp first).
    */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }
}
