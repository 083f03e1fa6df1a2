package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout via Morton (Z-order) interleaving.
  *
  * Parquet pruning is driven by per-row-group min/max stats; sorting by ONE
  * column makes that column prunable and destroys locality on every other.
  * Interleaving the bits of two key columns into a single z-value and
  * range-partitioning + sorting by it bounds BOTH coordinates within any
  * contiguous z-range: rows agreeing on all z-bits above 2j agree on all
  * coordinate bits above j, so a z-bucket of size 4^j spans at most 2^j
  * distinct values per coordinate. Filters on either column then skip most
  * row groups — the standard layout trick for multi-key scan-heavy tables
  * (a 100 TB fact table queried by both part and supplier, say).
  *
  * The z-value is pure column arithmetic (constant shifts + adds), fully
  * codegen'd — no UDF, no shuffle of its own; the only exchange is the
  * range partitioning the caller asks for when writing the layout.
  */
object Layout {

  /** Morton code of two non-negative integer columns, `bits` low bits each
    * (values are taken mod 2^bits; callers bucket/hash wider domains down
    * first). x occupies even output bits, y odd — a 2·bits-bit z-value.
    */
  def zvalue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      val xb = shiftrightunsigned(x.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
      val yb = shiftrightunsigned(y.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
      xb + yb
    }.reduce(_ + _)
  }

  /** Range-partition and sort `df` by the z-value of (`xCol`, `yCol`) —
    * the write-side layout step. Each output partition covers a contiguous
    * z-range, i.e. a bounded rectangle set in (x, y) space.
    */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numPartitions: Int): DataFrame = {
    require(!df.columns.contains("__z"),
      "clusterByZ reserves the __z column name; rename the input column")
    val z = zvalue(col(xCol), col(yCol), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
