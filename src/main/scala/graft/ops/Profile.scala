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
}
