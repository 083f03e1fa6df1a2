package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the nearest right row with the same key —
  * `direction = "backward"` (default) takes the most recent right with
  * right.time ≤ left.time, `"forward"` the earliest right with right.time ≥
  * left.time (the pandas `merge_asof` surface). `tolerance` bounds the match
  * distance: a left row whose NEAREST right is farther than `tolerance` time
  * units gets NULLs (any other candidate is farther still, so this is exact
  * no-match semantics, not best-effort). Ties on right.time resolve to the
  * greatest `rightTieCol` (deterministic).
  *
  * Implementation is the union-sort trick, not a join: tag both sides, union,
  * sort within each key by (time, tag, tie) — time DESCENDS for the forward
  * direction, which turns "earliest following" into the same carry — and
  * carry the last seen right payload forward with `last(ignoreNulls)` over an
  * unbounded-preceding frame. One shuffle on the key, linear in |L|+|R| — no
  * per-left-row range probe, no broadcast requirement on either side. This is
  * the 100 TB-safe shape; skewed keys behave like any skewed aggregation
  * (AQE/salting applies). Tolerance requires a numeric time column (cast
  * date/timestamp upstream, e.g. `unix_millis`).
  */
object AsofJoin {
  def apply(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightTieCol: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(!rightPayload.contains("__mt"), "__mt is reserved")
    // A negative tolerance can never admit a match (the nearest candidate is
    // at distance >= 0) — reject it loudly instead of returning all-NULL
    // payloads that read as "no right rows existed".
    require(tolerance.forall(_ >= 0),
      s"tolerance must be >= 0, got ${tolerance.get}")
    val lCols = left.columns.toSeq
    val tagged = {
      // Right rows sort before left rows at the same timestamp (tag 0 < 1),
      // making the match inclusive in BOTH directions. Rows with a NULL
      // right time are EXCLUDED up front: the bound predicate is unknown
      // for them, but the window's nulls-first ascending sort would place
      // them before every real row and carry them as the match for left
      // rows that precede all genuine right rows.
      val r = right.filter(col(rightTime).isNotNull).select(
        keyCols.map(col) ++ Seq(
          col(rightTime).as("__t"), lit(0).as("__tag"), col(rightTieCol).as("__tie"),
          // The matched TIME rides inside the payload so tolerance can be
          // tested at the left row after the carry.
          struct((rightPayload.map(col) :+ col(rightTime).as("__mt")): _*).as("__payload")) ++
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
    // nulls FIRST in both directions: a left row with NULL time must sort
    // before every right row so nothing is carried into it (desc's default
    // NULLS LAST would hand it the key's minimum-time right row as a
    // spurious forward match).
    val timeOrder =
      if (direction == "backward") col("__t").asc_nulls_first
      else col("__t").desc_nulls_first
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(timeOrder, col("__tag").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = last(col("__payload"), ignoreNulls = true).over(w)
    val withMatch = tagged
      .withColumn("__match", matched)
      .filter(col("__tag") === 1)
    val inBound = tolerance match {
      case None => lit(true)
      case Some(tol) =>
        val dist =
          if (direction == "backward") col("__t") - col("__match").getField("__mt")
          else col("__match").getField("__mt") - col("__t")
        dist <= lit(tol)
    }
    withMatch.select(lCols.map(col) ++
      rightPayload.map(p => when(inBound, col("__match").getField(p)).as(p)): _*)
  }
}
