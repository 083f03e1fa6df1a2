package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for additive rollups — the materialized-
  * aggregate discipline of a 100 TB event pipeline: the base table is too
  * big to re-aggregate per query, so a ROLLUP table of mergeable partial
  * aggregates (count / exact decimal sum / min / max per group per
  * partition key) is materialized once and then maintained by DELTAS: an
  * arriving batch is aggregated ALONE (its own tiny shuffle), only the
  * rollup partitions the batch touches are read back, partials merge by
  * group key (count+count, sum+sum, min(min), max(max) — every kept
  * statistic is a commutative monoid, which is exactly what makes the
  * maintenance exact, not approximate), and the touched partitions swap in
  * via the COW rename + epoch protocol of [[Layout.upsertPartitioned]].
  * A day of trickle against a year of rollup rewrites the day, never the
  * year. Derived statistics that are NOT mergeable (avg) are computed at
  * READ time from the merged partials ([[readAgg]]), never stored.
  *
  * The non-goal is general IVM (joins/distinct under deletion need
  * retraction bookkeeping); this is the additive-aggregate core that covers
  * the monitoring/reporting rollups the engine's own uts queries run.
  */
object Ivm {

  /** Mergeable partials of `valueCol` per (`partitionCol`, `groupCols`):
    * `n`, exact `sum_dec` (decimal(30,10) of round(value, 10) — the repo's
    * standard order-independent lattice), `vmin`, `vmax`.
    */
  private def partials(
      df: DataFrame, partitionCol: String, groupCols: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy((partitionCol +: groupCols).map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(round(col(valueCol), 10).cast("decimal(30,10)")).as("sum_dec"),
        min(col(valueCol)).as("vmin"),
        max(col(valueCol)).as("vmax"))

  /** Materialize the rollup of `base` at `path`, partitioned by
    * `partitionCol` (the maintenance granularity — a day column for daily
    * trickle). One aggregation of the base table, written once.
    */
  def buildRollup(
      spark: SparkSession,
      base: DataFrame,
      path: String,
      partitionCol: String,
      groupCols: Seq[String],
      valueCol: String): Unit =
    partials(base, partitionCol, groupCols, valueCol)
      .write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Fold a batch of BASE-TABLE rows into the rollup: aggregate the batch
    * alone, read back ONLY the touched partitions' partials (partition
    * filter reaches the scan), merge per group key (outer — a batch can
    * open a new group or a new partition), and swap exactly the touched
    * partitions ([[Layout.upsertPartitioned]] carries the crash-marker,
    * epoch-bump and manifest-patch discipline; `keyCols` = the group key,
    * so merged rows REPLACE the old partials). Additive semantics: batch
    * rows are new observations — feeding the same batch twice counts it
    * twice, like any event stream; idempotence is the ingest layer's
    * ledger problem, not the rollup's.
    */
  def applyDelta(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      partitionCol: String,
      groupCols: Seq[String],
      valueCol: String): Unit = {
    val delta = partials(batch, partitionCol, groupCols, valueCol)
    val touched = delta.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)) // bounded: one value per touched partition
    val old = spark.read.parquet(path)
      .filter(col(partitionCol).isin(touched: _*))
    val keys = (partitionCol +: groupCols)
    val merged = old.select(keys.map(col) :+ struct(col("n"), col("sum_dec"),
        col("vmin"), col("vmax")).as("__old"): _*)
      .join(delta.select(keys.map(col) :+ struct(col("n"), col("sum_dec"),
        col("vmin"), col("vmax")).as("__new"): _*), keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("__old.n"), lit(0L)) + coalesce(col("__new.n"), lit(0L)))
          .as("n"),
        (coalesce(col("__old.sum_dec"), lit(0).cast("decimal(30,10)")) +
          coalesce(col("__new.sum_dec"), lit(0).cast("decimal(30,10)")))
          .cast("decimal(30,10)").as("sum_dec"),
        least(col("__old.vmin"), col("__new.vmin")).as("vmin"),
        greatest(col("__old.vmax"), col("__new.vmax")).as("vmax")): _*)
    Layout.upsertPartitioned(spark, path, merged,
      keyCols = groupCols, partitionCol = partitionCol)
  }

  private val LedgerFile = "_ivm_last_batch"

  /** [[applyDelta]] guarded by a batch-id LEDGER — the exactly-once
    * discipline a streaming `foreachBatch` maintainer needs: Structured
    * Streaming replays the in-flight micro-batch after a restart, and an
    * unguarded fold would count it twice (additive semantics make
    * double-apply silent skew, not a crash). The ledger (`_ivm_last_batch`
    * at the rollup root) records the last APPLIED batch id; a replayed id
    * is skipped. The ledger write FOLLOWS the partition swap, so the
    * crash-window cases are: crash mid-swap → the COW crash marker
    * ([[Layout.upsertPartitioned]]'s `.__upsert_old`) fails the replay loud
    * for manual repair; crash between swap and ledger write → the replay
    * re-applies a fully-applied batch, the one window where this degrades
    * to at-least-once (closing it needs the swap and the ledger in one
    * atomic commit, i.e. a table format's transaction log). Returns whether
    * the batch was applied.
    */
  def applyDeltaOnce(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      batchId: Long,
      partitionCol: String,
      groupCols: Seq[String],
      valueCol: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, LedgerFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val last = Layout.readLongFile(fs, p)
    if (last.exists(_ >= batchId)) false
    else {
      applyDelta(spark, path, batch, partitionCol, groupCols, valueCol)
      Layout.writeLongFile(fs, p, batchId)
      true
    }
  }

  /** Continuous maintenance: run `stream` into the rollup at `path`, one
    * ledger-guarded [[applyDeltaOnce]] per micro-batch — the landing path
    * that keeps a materialized rollup fresh while the base table ingests.
    * The caller picks the trigger (AvailableNow for a catch-up replay, a
    * processing-time trigger for continuous trickle) and owns the returned
    * query's lifecycle. Single-writer: the same ownership every COW writer
    * in [[Layout]] requires.
    */
  def maintainStream(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      partitionCol: String,
      groupCols: Seq[String],
      valueCol: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyDeltaOnce(batch.sparkSession, path, batch, id,
          partitionCol, groupCols, valueCol): Unit
      }
      .start()

  /** Read-side finalization: collapse the rollup to per-`groupCols` totals
    * with the derived (non-mergeable) mean computed HERE from the merged
    * partials. The scan reads partials — one row per (partition, group) —
    * never base rows.
    */
  def readAgg(spark: SparkSession, path: String, partitionCol: String,
      groupCols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("n")).as("n_events"),
        sum(col("sum_dec")).cast("decimal(30,10)").as("__sum"),
        min(col("vmin")).as("min_value"),
        max(col("vmax")).as("max_value"),
        countDistinct(col(partitionCol)).as("n_partitions"))
      .select(groupCols.map(col) ++ Seq(
        col("n_events"),
        round(col("__sum").cast("double"), 4).as("sum_value"),
        round((col("__sum").cast("double") / col("n_events")), 6).as("avg_value"),
        col("min_value"), col("max_value"), col("n_partitions")): _*)
}
