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
    core(df, valueCol, intervalMs, timeCol, partitionCols, seqCol)
      .orderBy((partitionCols.map(col) :+ col("der_time").asc): _*)

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
        // Unpartitioned series: stitched lag (range-partitioned, broadcast
        // seams) + broadcast scalar t0 — no single-partition window exec.
        val lagged = graft.ops.Windowed.lagStitched(
          df.select(col(timeCol).as("__t"), seq0.as("__seq"), col(valueCol).as("__v")),
          Seq("__t", "__seq"), "__v", "__lagv")
        lagged
          .crossJoin(broadcast(df.agg(min(col(timeCol)).as("__t0"))))
          .select(
            col("__t"),
            coalesce(col("__v") - col("__lagv"), lit(0.0)).as("__delta"),
            col("__t0"))
      }

    // Bucket k = max(ceil((t − t0)/I), 1); K = max(ceil((tmax − t0)/I), 1).
    // (t − t0) is a bounded window span, exact in double arithmetic.
    def ceilDiv(c: org.apache.spark.sql.Column) =
      greatest(ceil(c / lit(intervalMs.toDouble)).cast("long"), lit(1L))

    val bucketed = withDelta
      .withColumn("__k", ceilDiv(col("__t") - col("__t0")))
      .groupBy((part :+ col("__k")): _*)
      .agg(sum(col("__delta")).as("__dv"))

    // Per-partition spine 1..K for gap fill (empty grid slots emit 0);
    // bounds come straight off the input — a plain partial-aggregatable scan,
    // no window needed.
    val bounds = df
      .groupBy(part: _*)
      .agg(min(col(timeCol)).as("__t0"), max(col(timeCol)).as("__tmax"))
      // Global grouping over empty input yields one all-null row; drop it so
      // empty series ⇒ empty output (test.js:130-136), never a null bucket.
      .where(col("__t0").isNotNull)
      .withColumn("__kmax", ceilDiv(col("__tmax") - col("__t0")))
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
