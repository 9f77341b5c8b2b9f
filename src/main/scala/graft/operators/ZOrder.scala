package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimension layout clustering — the lakehouse
  * data-layout technique for making file-level min/max statistics prune on
  * MORE THAN ONE column at once (Delta/Iceberg `OPTIMIZE ZORDER BY`; the
  * curve itself is Morton 1966). Sorting by `zValue(x, y)` interleaves the
  * two dimensions' bits, so consecutive rows are close in BOTH x and y:
  * after a range-partitioned write, a filter on EITHER column skips most
  * files, where a lexicographic sort (x, y) prunes only on x.
  *
  * 100 TB design: the z-value is one map-side expression (no shuffle of its
  * own); the layout cost is the one `repartitionByRange` the write needs
  * anyway (the s8 compaction shape). Pruning then happens at scan time from
  * parquet footer min/max — no index structure to build or maintain.
  *
  * Scope: 2 × 16-bit dimensions → 32-bit z-value, matching the file-count
  * granularity this layout targets (file skipping needs ~thousands of
  * distinct prefixes, not per-row resolution); callers bucket wider
  * domains down first (`& 0xffff`, quantile bins, epoch-seconds masks).
  */
object ZOrder {

  /** Morton-interleaved z-value of the low 16 bits of two long columns:
    * bit j of x lands at position 2j, bit j of y at 2j+1. Pure integer
    * arithmetic (a fold over the 16 bit positions), so it mirrors exactly
    * in DuckDB — see [[duckSql]].
    */
  def zValue(x: Column, y: Column): Column = {
    val xm = x.bitwiseAND(lit(0xffffL))
    val ym = y.bitwiseAND(lit(0xffffL))
    // Statically unrolled over the 16 bit positions (shift amounts must be
    // literals for the builtin shiftleft/shiftright) — 32 integer terms in
    // one codegen'd projection, no lambda-function interpretation.
    (0 until 16).map { j =>
      shiftleft(shiftright(xm, j).bitwiseAND(lit(1L)), 2 * j) +
        shiftleft(shiftright(ym, j).bitwiseAND(lit(1L)), 2 * j + 1)
    }.reduce(_ + _)
  }

  /** The same fold in DuckDB SQL over expressions `x`, `y` (already-masked
    * inputs are the caller's responsibility — this masks identically).
    */
  def duckSql(x: String, y: String): String =
    s"""list_sum(list_transform(generate_series(0, 15), j ->
       |  (((($x) & 65535) >> j) & 1) * (CAST(1 AS BIGINT) << (2 * j))
       |  + (((($y) & 65535) >> j) & 1) * (CAST(1 AS BIGINT) << (2 * j + 1))))""".stripMargin

  /** Cluster `df` for layout: range-partition + sort by the z-value of the
    * two dimension columns (the write-side half; scan-side pruning falls
    * out of parquet min/max footers). `numFiles` bounds output file count.
    */
  def cluster(df: DataFrame, x: Column, y: Column, numFiles: Int): DataFrame = {
    val z = zValue(x, y).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
