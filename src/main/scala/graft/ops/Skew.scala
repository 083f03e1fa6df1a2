package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew defenses for hot grouping keys.
  *
  * A `groupBy(k)` hash-shuffles every row of a key to one task; a key holding
  * 1% of 100 TB pins 1 TB on one executor. Salting splits each key into
  * `salt` sub-keys for the first (partial) aggregation, then re-aggregates
  * the `salt`-per-key partials without the salt — the hot key's rows spread
  * over `salt` tasks, and the second shuffle carries only partials.
  *
  * Works for ALGEBRAIC aggregates (those with a merge: sum/count/min/max and
  * compositions like mean = sum/count assembled by the caller from salted
  * sums). Holistic aggregates (exact distinct, exact percentile) don't salt —
  * use their approximate counterparts (`approx_count_distinct`,
  * `percentile_approx`), which are sketches and DO merge.
  *
  * AQE's skew-join handling rebalances JOINS at runtime; aggregation skew
  * still wants explicit salt because the partial-aggregate hash map absorbs
  * only what fits per task.
  */
object Skew {

  /** Two-phase salted aggregation: `aggs` maps output column name to an
    * algebraic (partial, merge) pair — the partial runs per (keys, salt),
    * the merge collapses salts per keys. E.g.
    * `"n" -> (count(lit(1)), sum(_))`, `"sum_v" -> (sum(col("v")), sum(_))`.
    *
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      salt: Int,
      aggs: Seq[(String, (Column, Column => Column))]): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(aggs.nonEmpty, "saltedAgg needs at least one aggregate")
    require(!df.columns.contains("__salt"),
      "saltedAgg reserves the __salt column name; rename the input column")
    // SEEDED rand: deterministic per (partition, row position), so a
    // speculatively re-executed task recomputes identical salts, yet the
    // salt is independent of row CONTENT — a content hash would collapse a
    // hot key's duplicate rows onto one salt and quietly disable the whole
    // defense (duplicate rows are the norm in event data). Unseeded rand()
    // would genuinely break retries. PRECONDITION: per-position determinism
    // holds only when intra-partition row ORDER is deterministic. A scan or
    // narrow lineage qualifies; a SHUFFLE OUTPUT does not (fetch arrival
    // order varies across task re-executions — the classic
    // rand-partitioning indeterminacy hazard), so callers salting a
    // shuffle-produced input must materialize it first (e.g.
    // localCheckpoint) or accept that a fetch-failure retry may re-salt
    // rows and corrupt the partials.
    val saltCol = floor(rand(0x5417L) * salt).cast("int").as("__salt")
    val partial = df
      .groupBy((keys.map(col) :+ saltCol): _*)
      .agg(aggs.head._2._1.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, (p, _)) => p.as(s"__p_$n") }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        aggs.head._2._2(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, (_, m)) => m(col(s"__p_$n")).as(n) }: _*)
  }
}
