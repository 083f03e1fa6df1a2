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
      aggs: Seq[(String, (Column, Column => Column))],
      saltBy: Option[Column] = None): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(aggs.nonEmpty, "saltedAgg needs at least one aggregate")
    require(!df.columns.contains("__salt"),
      "saltedAgg reserves the __salt column name; rename the input column")
    // Salt choice, strongest first:
    //  - `saltBy = Some(uniqueKey)` (e.g. an event id): hash of the key —
    //    retry/speculation-safe BY CONSTRUCTION (pure function of content)
    //    and still spreads duplicate-content rows because the key is unique
    //    per row. Prefer this whenever a unique row key exists.
    //  - `saltBy = None`: SEEDED rand — deterministic per (partition, row
    //    position), so a re-executed task recomputes identical salts, and
    //    independent of row content (a hash of NON-unique columns would
    //    collapse a hot key's duplicate rows onto one salt and quietly
    //    disable the defense). PRECONDITION: per-position determinism holds
    //    only when intra-partition row ORDER is deterministic. A scan or
    //    narrow lineage qualifies; a SHUFFLE OUTPUT does not (fetch arrival
    //    order varies across re-executions — the classic rand-partitioning
    //    indeterminacy hazard), so callers salting a shuffle-produced input
    //    must materialize it first (e.g. localCheckpoint) or pass `saltBy`.
    val saltCol = saltBy
      .map(c => pmod(xxhash64(c), lit(salt)).cast("int"))
      .getOrElse(floor(rand(0x5417L) * salt).cast("int"))
      .as("__salt")
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

  /** Skew-proof TOP-K PER GROUP (per-domain document caps, per-key
    * leaderboards): a plain `row_number().over(partitionBy(keys))` sends a
    * hot key's every row to ONE task and sorts them there — the same 1 TB
    * pin [[saltedAgg]] defends against, plus a full sort. Two stages
    * instead: a local top-k within each (keys, salt) slice, then the real
    * top-k over the ≤ salt·k survivors per key. Any row in the global
    * top-k is by definition in its own salt slice's top-k, so the prune
    * loses nothing; the second window's per-key input is bounded by
    * salt·k rows regardless of group size.
    *
    * `orderBy` must be a TOTAL order (tie-break on a unique column) —
    * `row_number` over ties is nondeterministic, and the two stages could
    * break them differently. Salt discipline is [[saltedAgg]]'s: pass
    * `saltBy = Some(uniqueKeyCol)` when one exists (content-pure,
    * retry-safe); the seeded-rand fallback requires deterministic
    * intra-partition input order.
    */
  def topKPerGroupSalted(
      df: DataFrame,
      keys: Seq[String],
      orderBy: Seq[Column],
      k: Int,
      salt: Int = 8,
      saltBy: Option[Column] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(orderBy.nonEmpty, "topKPerGroupSalted needs an ordering")
    require(!df.columns.contains("__salt") && !df.columns.contains("__rn"),
      "topKPerGroupSalted reserves __salt/__rn column names; rename the input columns")
    import org.apache.spark.sql.expressions.Window
    val saltCol = saltBy
      .map(c => pmod(xxhash64(c), lit(salt)).cast("int"))
      .getOrElse(floor(rand(0x5417L) * salt).cast("int"))
    val w1 = Window.partitionBy((keys.map(col) :+ col("__salt")): _*)
      .orderBy(orderBy: _*)
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__salt", saltCol)
      .withColumn("__rn", row_number().over(w1)).filter(col("__rn") <= k)
      .drop("__rn")
      .withColumn("__rn", row_number().over(w2)).filter(col("__rn") <= k)
      .drop("__rn", "__salt")
  }
}
