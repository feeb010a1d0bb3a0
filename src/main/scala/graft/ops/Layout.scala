package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Write `df` as a bucketed (and optionally sorted) parquet table — the
    * pre-shuffled layout for repeated co-located joins/aggregations on
    * `keys`: every table bucketed the same way joins WITHOUT a shuffle
    * exchange (and without a sort, when `sortCols` covers the join key),
    * which at 100 TB turns the recurring fact⋈fact join from the
    * cluster's dominant network cost into a per-bucket local merge.
    * Bucket pruning additionally serves `key = literal` probes from a
    * single bucket. The spec pins the contract by asserting the join plan
    * of two co-bucketed tables contains NO exchange.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(buckets >= 1, "buckets must be positive")
    require(keys.nonEmpty, "need at least one bucketing key")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }
}
