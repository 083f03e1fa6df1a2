package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with the same key
  * and right.time ≤ left.time. Ties on right.time resolve to the greatest
  * `rightTieCol` (deterministic).
  *
  * Implementation is the union-sort trick, not a join: tag both sides, union,
  * sort within each key by (time, tag, tie) and carry the last seen right
  * payload forward with `last(ignoreNulls)` over an unbounded-preceding frame.
  * One shuffle on the key, linear in |L|+|R| — no per-left-row range probe,
  * no broadcast requirement on either side. This is the 100 TB-safe shape;
  * skewed keys behave like any skewed aggregation (AQE/salting applies).
  */
object AsofJoin {
  def apply(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightTieCol: String): DataFrame = {
    val lCols = left.columns.toSeq
    val tagged = {
      // Right rows sort before left rows at the same timestamp (tag 0 < 1),
      // making the match inclusive (right.time ≤ left.time). Rows with a
      // NULL right time are EXCLUDED up front: `t ≤ left.time` is unknown
      // for them, but the window's nulls-first ascending sort would place
      // them before every real row and carry them as the match for left
      // rows that precede all genuine right rows.
      val r = right.filter(col(rightTime).isNotNull).select(
        keyCols.map(col) ++ Seq(
          col(rightTime).as("__t"), lit(0).as("__tag"), col(rightTieCol).as("__tie"),
          struct(rightPayload.map(col): _*).as("__payload")) ++
          lCols.filterNot(keyCols.contains).map(c => lit(null).as(c)): _*)
      // Left rows never compete on __tie (ordering among left rows at one
      // (t, tag) is irrelevant); a typed NULL keeps the union working for
      // non-numeric tie columns (timestamps, strings).
      val l = left.select(
        keyCols.map(col) ++ Seq(
          col(leftTime).as("__t"), lit(1).as("__tag"),
          lit(null).cast(right.schema(rightTieCol).dataType).as("__tie"),
          lit(null).cast(r.schema("__payload").dataType).as("__payload")) ++
          lCols.filterNot(keyCols.contains).map(col): _*)
      r.unionByName(l)
    }
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(lCols.map(col) ++
        rightPayload.map(p => col("__match").getField(p).as(p)): _*)
  }
}
