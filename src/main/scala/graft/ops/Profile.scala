package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiling — the `ANALYZE TABLE` / data-quality-report
  * analogue a training-data pipeline runs before trusting a new corpus drop.
  *
  * Everything folds into ONE aggregation over ONE scan: per column —
  * row/non-null counts, exact distinct count, and type-appropriate min/max
  * (numeric bounds as doubles, string bounds lexicographic). The single
  * aggregated row then unpivots to long format (one output row per column)
  * with a zero-shuffle literal explode — profiling N columns must never cost
  * N scans, and at 100 TB the one scan is the whole cost.
  *
  * Scale note: `count_distinct` is exact, so its shuffle carries each
  * column's distinct set — right for profiling dimension-ish columns (ids,
  * categories). For columns where even the distinct SET is too large to
  * shuffle, [[Sketches.kmvDistinct]] is the bounded-buffer estimate to swap
  * in; the profile stays exact here because exactness is what makes it
  * oracle-gateable.
  */
object Profile {

  /** Long-format profile of `cols` (numeric, string, or timestamp-free
    * schema subset): `(column, n_rows, n_nonnull, n_distinct, min_num,
    * max_num, min_str, max_str)` — numeric bounds NULL for string columns
    * and vice versa, so one schema serves both families.
    */
  def columns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Profile.columns needs at least one column")
    val kinds: Seq[(String, Boolean)] = cols.map { c =>
      df.schema(c).dataType match {
        case _: NumericType => (c, true)
        case StringType => (c, false)
        case other => throw new IllegalArgumentException(
          s"Profile.columns supports numeric and string columns; `$c` is $other")
      }
    }
    val aggs: Seq[Column] = kinds.flatMap { case (c, isNum) =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        (if (isNum) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"__mn_$c"),
        (if (isNum) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"__mx_$c"),
        (if (isNum) lit(null).cast("string") else min(col(c))).as(s"__sn_$c"),
        (if (isNum) lit(null).cast("string") else max(col(c))).as(s"__sx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // Unpivot the one-row aggregate: a literal array of per-column structs,
    // exploded — pure projection, no further shuffle or scan.
    val entries = array(kinds.map { case (c, _) =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_num"),
        col(s"__mx_$c").as("max_num"),
        col(s"__sn_$c").as("min_str"),
        col(s"__sx_$c").as("max_str"))
    }: _*)
    one.select(explode(entries).as("__e")).select(col("__e.*"))
  }

  /** Robust per-group outlier report: median / MAD (median absolute
    * deviation) and the count of values beyond `cutoff` scaled MADs — the
    * quality gate that survives the heavy tails that break mean/stddev
    * z-scores (one extreme value drags the mean AND inflates the stddev, so
    * classical z-scores mask exactly the rows they should flag; the median
    * and MAD have 50% breakdown).
    *
    * Both medians are RANK STATISTICS (the k-th smallest value at
    * k = ceil(n/2) — the lower median), not interpolated: interpolation
    * formulas differ across engines in the last bits, while selecting an
    * EXISTING value is identical everywhere (same convention as
    * [[Sketches.histQuantiles]]'s exact twin). The MAD is the same rank
    * statistic over `abs(value − median)` — subtraction and abs are exact
    * IEEE, so every derived double is bit-identical cross-engine. The
    * consistency constant 1.4826 (≈ 1/Φ⁻¹(3/4)) rescales the MAD to a
    * stddev-comparable unit under normality — `cutoff` is then the familiar
    * "k sigmas", default 3.5 (Iglewicz–Hoaglin).
    *
    * Shape at scale: two hash-partitioned windows keyed by `keyCol` (rank
    * within group — never a single-partition window) plus one broadcast
    * join of the per-group medians (one row per group). NULL values are
    * excluded outright (rank semantics under engine-specific NULL ordering
    * would silently diverge, same note as [[Sketches.histQuantilesLog2]]).
    *
    * Output per group: `n`, `med`, `mad`, `n_out`, `max_dev` (the largest
    * absolute deviation among outliers; NULL when none) — doubles rounded
    * to 4 for the cross-engine compare.
    */
  def robustOutliers(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      cutoff: Double = 3.5): DataFrame = {
    require(cutoff > 0, s"cutoff must be positive, got $cutoff")
    import org.apache.spark.sql.expressions.Window
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(valueCol).cast("double").as("__v"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v"))
    val wn = Window.partitionBy(col(keyCol))
    val meds = vals
      .withColumn("__r", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
      .groupBy(col(keyCol))
      .agg(
        max(col("__n")).as("__n"),
        min(when(col("__r") === ceil(col("__n") * 0.5), col("__v"))).as("__med"))
    val dev = vals.join(broadcast(meds), Seq(keyCol))
      .withColumn("__dev", abs(col("__v") - col("__med")))
    val wd = Window.partitionBy(col(keyCol)).orderBy(col("__dev"))
    val mads = dev
      .withColumn("__rd", row_number().over(wd))
      .groupBy(col(keyCol))
      .agg(min(when(col("__rd") === ceil(col("__n") * 0.5), col("__dev"))).as("__mad"))
    // Fixed parenthesization: (cutoff · 1.4826) folds to ONE double constant
    // in both engines before multiplying the per-group MAD.
    val bound = lit(cutoff * 1.4826)
    dev.join(broadcast(mads), Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(
        max(col("__n")).as("n"),
        // med/mad/max_dev are emitted UNROUNDED: each is a selected raw
        // corpus value or a single IEEE subtract+abs of two raw values —
        // bit-identical cross-engine already. round(x, 4) on such a double
        // is the .00005-boundary hazard class (Spark rounds the exact
        // binary expansion, DuckDB a 1e4-scaled double) that split
        // lm_quality_bands at sf0.1; reserve rounding for genuinely
        // divergent float paths.
        max(col("__med")).as("med"),
        max(col("__mad")).as("mad"),
        count(when(col("__dev") > bound * col("__mad"), lit(1))).as("n_out"),
        max(when(col("__dev") > bound * col("__mad"), col("__dev"))).as("max_dev"))
  }

  /** Winsorization — clip `valueCol` into its group's own [loQ, hiQ]
    * quantile band, emitted as `<valueCol>_w` beside every original column
    * (plus `__wlo`/`__whi`, the bounds, for the caller's audit): the
    * outlier TREATMENT next to [[robustOutliers]]'s detection, the standard
    * pre-aggregation step when a metric's tail is real data but must not
    * dominate a mean. Bounds are the same rank statistics as everywhere in
    * this family (k-th smallest at k = ceil(q·n) — an existing value,
    * engine-identical), computed per group in one key-partitioned window
    * pass and joined back as a broadcast (one row per group). NULL values
    * stay NULL (Spark's `greatest`/`least` skip NULLs, which would
    * otherwise silently clip a NULL to the lower bound). Rows of groups
    * absent from the bounds (all-NULL groups) keep NULL bounds and pass
    * through unclipped.
    */
  def winsorize(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      loQ: Double = 0.05,
      hiQ: Double = 0.95): DataFrame = {
    require(loQ > 0 && loQ < hiQ && hiQ <= 1,
      s"need 0 < loQ < hiQ <= 1, got ($loQ, $hiQ)")
    import org.apache.spark.sql.expressions.Window
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(valueCol).cast("double").as("__v"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v"))
    val wn = Window.partitionBy(col(keyCol))
    val bounds = vals
      .withColumn("__r", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
      .groupBy(col(keyCol))
      .agg(
        min(when(col("__r") === ceil(col("__n") * loQ), col("__v"))).as("__wlo"),
        min(when(col("__r") === ceil(col("__n") * hiQ), col("__v"))).as("__whi"))
    df.join(broadcast(bounds), Seq(keyCol), "left")
      .withColumn(s"${valueCol}_w",
        when(col(valueCol).isNotNull && col("__wlo").isNotNull,
          least(greatest(col(valueCol).cast("double"), col("__wlo")), col("__whi")))
          .otherwise(col(valueCol).cast("double")))
  }
}
