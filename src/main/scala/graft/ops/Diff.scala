package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the table-diff a COW/upsert lifecycle
  * ([[Layout.upsertPartitioned]]) needs for auditing: given two snapshots of
  * a keyed table, emit each key that was ADDED, REMOVED, or CHANGED between
  * them, and nothing for untouched keys.
  *
  * Shape: one full-outer join on the key (both sides shuffle on it — at
  * 100 TB both snapshots scale together, so no broadcast), with the non-key
  * columns packed into ONE struct per side and compared null-safely
  * (`<=>`) — a VALUE comparison, not a hash, so the verdict is exact and
  * oracle-matchable (a hash compare would trade that for narrower shuffle
  * rows; at wide-row scale precompute `xxhash64` per side and compare
  * hashes, accepting the 2⁻⁶⁴ collision).
  *
  * The unchanged majority is dropped AFTER the join by a filter on the
  * packed structs — the join itself is the scan bound; the output is
  * delta-sized.
  */
object Diff {

  /** `(keys..., change ∈ {added, removed, changed})`, one row per differing
    * key. Both frames must share the key columns and the compared columns
    * (the intersection of their non-key columns, compared by NAME — a
    * column present on one side only is ignored, stated policy: schema
    * evolution is not data drift).
    */
  def snapshots(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "Diff.snapshots needs at least one key column")
    val nonKey = (oldDf.columns.toSet
      .intersect(newDf.columns.toSet) -- keys).toSeq.sorted
    require(nonKey.nonEmpty,
      "Diff.snapshots needs at least one shared non-key column to compare")
    val o = oldDf.select(
      keys.map(k => col(k).as(s"__ok_$k")) ++ Seq(
        struct(nonKey.map(col): _*).as("__ov"), lit(true).as("__oe")): _*)
    val n = newDf.select(
      keys.map(k => col(k).as(s"__nk_$k")) ++ Seq(
        struct(nonKey.map(col): _*).as("__nv"), lit(true).as("__ne")): _*)
    // Null-safe key equality (`<=>`): a USING join never matches NULL keys,
    // which would report a NULL-keyed row present in both snapshots twice —
    // as `added` AND `removed` — instead of unchanged/changed.
    val cond = keys.map(k => col(s"__ok_$k") <=> col(s"__nk_$k")).reduce(_ && _)
    o.join(n, cond, "full_outer")
      .withColumn("change",
        when(col("__oe").isNull, lit("added"))
          .when(col("__ne").isNull, lit("removed"))
          .when(!(col("__ov") <=> col("__nv")), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("change") =!= "unchanged")
      .select(keys.map(k =>
        coalesce(col(s"__ok_$k"), col(s"__nk_$k")).as(k)) :+ col("change"): _*)
  }
}
