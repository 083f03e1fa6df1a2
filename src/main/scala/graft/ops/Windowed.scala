package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact trailing ROWS-frame aggregates over a single globally
  * ordered series.
  *
  * A global `Window.orderBy(k)` with no partition key sends every row to one
  * partition (WindowExec's "No Partition Defined" fallback) — correct, but a
  * scale cliff. The stitched form keeps the exact ROWS-frame semantics while
  * staying partitioned:
  *
  *  1. bucket the order key (`bucket = k div bucketSpan`);
  *  2. carry each bucket's LAST `frameRows` rows into the NEXT `frameRows`
  *     buckets as context rows — a frame's preceding rows each sit in their
  *     own bucket's tail (if ≥ `frameRows` bucket rows followed one, it
  *     couldn't be among the global preceding `frameRows`), so the carries
  *     cover every frame that reaches back through populated buckets;
  *  3. window inside each bucket over (context ∪ own rows) ordered by the
  *     key, then drop the context rows from the output.
  *
  * Exactness domain (documented, asserted by OpsSpec/OpsPropertySpec
  * against the unpartitioned formulation): every gap between CONSECUTIVE
  * keys is smaller than `bucketSpan`. Then adjacent rows sit at most one
  * bucket apart, so a frame's `frameRows` preceding rows lie within the
  * `frameRows` preceding buckets — exactly what the carries cover.
  * Trivially true for contiguous daily/hourly rollups (gap = 1); a series
  * with larger gaps wants `bucketSpan` above its max gap. A gap ≥
  * `bucketSpan` can strand a frame beyond carry reach and silently drop
  * its tail — size `bucketSpan` from the data's known cadence, not from
  * hope. Carry replication is ≤ `frameRows`² rows per bucket — noise next
  * to the partitioning it buys. Both windows partition by bucket, never by
  * a constant (Spark's `EliminateWindowPartitions` folds constant keys
  * right back to the single-partition fallback).
  */
object Windowed {

  /** Trailing `frameRows`-preceding-to-current aggregate of `valueCol` over
    * `orderCol` (a LONG key with unique values, e.g. a day number), globally
    * ordered, emitted as `outCol`. `aggFn` maps the value column to its frame
    * aggregate (e.g. `avg`).
    */
  def trailingStitched(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      frameRows: Int,
      aggFn: Column => Column,
      outCol: String,
      bucketSpan: Long = 1024L): DataFrame = {
    require(frameRows >= 1, s"frameRows must be >= 1, got $frameRows")
    require(bucketSpan >= 1, s"bucketSpan must be >= 1, got $bucketSpan")
    val bkt = col("__bkt")
    val bucketed = df.withColumn("__bkt", floor(col(orderCol) / lit(bucketSpan)))
    val lastRows = Window.partitionBy(bkt).orderBy(col(orderCol).desc)
    val carry = bucketed
      .withColumn("__rn", row_number().over(lastRows))
      .filter(col("__rn") <= frameRows)
      .drop("__rn")
      .withColumn("__hop", explode(sequence(lit(1), lit(frameRows))))
      .withColumn("__bkt", bkt + col("__hop"))
      .drop("__hop")
      .withColumn("__ctx", lit(true))
    val w = Window.partitionBy(bkt).orderBy(col(orderCol)).rowsBetween(-frameRows, 0)
    bucketed.withColumn("__ctx", lit(false))
      .unionByName(carry)
      .withColumn(outCol, aggFn(col(valueCol)).over(w))
      .filter(!col("__ctx"))
      .drop("__bkt", "__ctx")
  }
}
