package graft.uts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's `derivative(col, I)` aggregate
  * (`/root/reference/uts.ts:458-507`), re-derived as a distributed plan.
  *
  * Exact semantics (quirk Q11, verified against test.js:96-136):
  *  - per-point delta `vᵢ − vᵢ₋₁` in (time, seq) order; the first point
  *    contributes 0 (uts.ts:476-479);
  *  - the emission grid anchors at the FIRST point's time `t0`, stepping `I`:
  *    the reference emits grid point `g = lastTime + I` whenever a point
  *    arrives with `t > g` (strict, uts.ts:481-483), so delta `i` lands in
  *    bucket `k = max(ceil((tᵢ − t0)/I), 1)`;
  *  - intermediate empty grid slots emit value 0 (the while-loop resets,
  *    uts.ts:490-498);
  *  - the trailing partial bucket is flushed at the LAST point's actual time,
  *    not a grid time (uts.ts:500-506);
  *  - empty input ⇒ no rows (test.js:130-136).
  *
  * Spark shape: one window pass for `lag` + per-partition min/max, a hash
  * aggregate on the grid bucket, and a `sequence`-exploded spine left-joined
  * for gap fill — no driver-side collect anywhere. With `partitionCols` the
  * whole thing parallelizes per key (e.g. per `user_id`); without, the lag
  * runs through [[graft.ops.Windowed.lagStitched]] — range-partitioned with
  * broadcast seam stitching, so even the single-logical-series case never
  * touches WindowExec's single-partition fallback, and `t0` comes from a
  * broadcast scalar instead of an unpartitioned min window.
  *
  * Output: `partitionCols ++ (der_time: Long epoch-ms, der_value)` ordered by
  * (partitionCols, der_time).
  */
object Derivative {
  def apply(
      df: DataFrame,
      valueCol: String,
      intervalMs: Long,
      timeCol: String = "time",
      partitionCols: Seq[String] = Nil,
      seqCol: Option[String] = None): DataFrame =
    // The grid is a DOWNSAMPLED series — report-sized by construction (one
    // row per interval per key) — so the ordered form sorts it in a single
    // shuffled partition: a range sort's boundary sampling would re-execute
    // the whole derivative subtree just to pick split points. Massive grids
    // (tiny interval × many keys) should compose on [[points]]/the unordered
    // core instead.
    graft.ops.Ordered.smallResult(
      core(df, valueCol, intervalMs, timeCol, partitionCols, seqCol),
      (partitionCols :+ "der_time"): _*)

  /** The unordered grid — compose aggregations on this ([[points]] does):
    * a global `orderBy`'s range-boundary sampling re-executes the whole
    * derivative subtree, and a downstream shuffle discards the order anyway.
    */
  private def core(
      df: DataFrame,
      valueCol: String,
      intervalMs: Long,
      timeCol: String,
      partitionCols: Seq[String],
      seqCol: Option[String]): DataFrame = {
    val part = partitionCols.map(col)
    val seq0 = seqCol.map(col).getOrElse(lit(0L))

    // Bucket k = max(ceil((t − t0)/I), 1); K = max(ceil((tmax − t0)/I), 1).
    // (t − t0) is a bounded window span, exact in double arithmetic.
    def ceilDiv(c: org.apache.spark.sql.Column) =
      greatest(ceil(c / lit(intervalMs.toDouble)).cast("long"), lit(1L))

    // Per-partition bounds — feeds BOTH the spine and (global case) the
    // broadcast t0, as the same DataFrame so the aggregation exchange is
    // planned once and reused instead of scanning the input twice.
    val bounds = df
      .groupBy(part: _*)
      .agg(min(col(timeCol)).as("__t0"), max(col(timeCol)).as("__tmax"))
      // Global grouping over empty input yields one all-null row; drop it so
      // empty series ⇒ empty output (test.js:130-136), never a null bucket.
      .where(col("__t0").isNotNull)
      .withColumn("__kmax", ceilDiv(col("__tmax") - col("__t0")))

    val withDelta =
      if (part.nonEmpty) {
        val w = Window.partitionBy(part: _*).orderBy(col(timeCol).asc, seq0.asc)
        val whole = Window.partitionBy(part: _*)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        df.select(
          part ++ Seq(
            col(timeCol).as("__t"),
            coalesce(col(valueCol) - lag(col(valueCol), 1).over(w), lit(0.0)).as("__delta"),
            min(col(timeCol)).over(whole).as("__t0")): _*)
      } else {
        // Unpartitioned series: stitched lag over VALUE buckets — the time
        // axis sliced into numShufflePartitions equal spans from the
        // broadcast bounds (already computed for the spine), so the lag
        // costs one hash exchange: no single-partition window, no range-
        // sampling pass, and the broadcast t0 rides along as __t0.
        // Equal spans balance time-uniform series; a pathologically
        // clustered series degrades to fewer active buckets (still exact).
        val nBkt = df.sparkSession.sessionState.conf.numShufflePartitions.toLong
        val spanned = df
          .select(col(timeCol).as("__t"), seq0.as("__seq"), col(valueCol).as("__v"))
          .crossJoin(broadcast(bounds.select(col("__t0"), col("__tmax"))))
          .withColumn("__bkt", least(
            floor((col("__t") - col("__t0")).cast("double") /
              greatest(ceil((col("__tmax") - col("__t0") + 1).cast("double") / nBkt.toDouble),
                lit(1.0))).cast("long"),
            lit(nBkt - 1)))
        graft.ops.Windowed.lagOverBuckets(spanned, Seq("__t", "__seq"), "__v", "__lagv")
          .select(
            col("__t"),
            coalesce(col("__v") - col("__lagv"), lit(0.0)).as("__delta"),
            col("__t0"))
      }

    val bucketed = withDelta
      .withColumn("__k", ceilDiv(col("__t") - col("__t0")))
      .groupBy((part :+ col("__k")): _*)
      .agg(sum(col("__delta")).as("__dv"))
    val spine = bounds.select(
      part ++ Seq(col("__t0"), col("__tmax"), col("__kmax"),
        explode(sequence(lit(1L), col("__kmax"))).as("__k")): _*)

    val joinKeys = partitionCols :+ "__k"
    val joined = spine.join(
      bucketed.select((part ++ Seq(col("__k"), col("__dv"))): _*), joinKeys, "left")

    joined.select(
      part ++ Seq(
        when(col("__k") === col("__kmax"), col("__tmax"))
          .otherwise(col("__t0") + col("__k") * lit(intervalMs)).as("der_time"),
        coalesce(col("__dv"), lit(0.0)).as("der_value")): _*)
  }

  /** The reference's OUTPUT FORM: one row per series with the grid as a
    * time-ordered `array<struct<der_time, der_value>>` — `derivative` is an
    * Aggregate there, so its value in a query result is the nested points
    * list (`/root/reference/uts.ts:500-506`). Same numbers as [[apply]]
    * (SURVEY.md §2.5 prefers the exploded rows for the oracle gate); the
    * per-series array is a documented bounded-group buffer, like `MapCol`.
    */
  def points(
      df: DataFrame,
      valueCol: String,
      intervalMs: Long,
      timeCol: String = "time",
      partitionCols: Seq[String] = Nil,
      seqCol: Option[String] = None): DataFrame = {
    val part = partitionCols.map(col)
    // array_sort orders each series' points; the grouped aggregate needs no
    // pre-ordered input, so build on the unordered core.
    core(df, valueCol, intervalMs, timeCol, partitionCols, seqCol)
      .groupBy(part: _*)
      .agg(array_sort(collect_list(struct(col("der_time"), col("der_value"))))
        .as("der_points"))
  }
}
