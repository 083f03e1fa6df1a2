package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Materialize.NarrowSyntax

/** Distributed exact trailing ROWS-frame aggregates over a single globally
  * ordered series.
  *
  * A global `Window.orderBy(k)` with no partition key sends every row to one
  * partition (WindowExec's "No Partition Defined" fallback) — correct, but a
  * scale cliff. The stitched form keeps the exact ROWS-frame semantics while
  * staying partitioned:
  *
  *  1. bucket the order key (`bucket = k div bucketSpan`);
  *  2. carry each bucket's LAST `frameRows` rows into the NEXT `frameRows`
  *     buckets as context rows — a frame's preceding rows each sit in their
  *     own bucket's tail (if ≥ `frameRows` bucket rows followed one, it
  *     couldn't be among the global preceding `frameRows`), so the carries
  *     cover every frame that reaches back through populated buckets;
  *  3. window inside each bucket over (context ∪ own rows) ordered by the
  *     key, then drop the context rows from the output.
  *
  * Exactness domain (documented, asserted by OpsSpec/OpsPropertySpec
  * against the unpartitioned formulation): every gap between CONSECUTIVE
  * keys is at most `bucketSpan` (`floor((k+g)/span) ≤ floor(k/span)+1`
  * for g ≤ span, so adjacent rows sit at most one bucket apart and a
  * frame's `frameRows` preceding rows lie within the `frameRows`
  * preceding buckets — exactly what the carries cover).
  * Trivially true for contiguous daily/hourly rollups (gap = 1); a series
  * with larger gaps wants `bucketSpan` at or above its max gap. A gap >
  * `bucketSpan` can strand a frame beyond carry reach and drop its tail —
  * so by default the plan carries a runtime guard that ERRORS on such a
  * gap (`validateGaps`), the same fail-loud stance
  * [[Dedup.connectedComponents]] takes on non-convergence. Carry
  * replication is ≤ `frameRows`² rows per bucket — noise next to the
  * partitioning it buys. Both windows partition by bucket, never by
  * a constant (Spark's `EliminateWindowPartitions` folds constant keys
  * right back to the single-partition fallback).
  */
object Windowed {

  /** Every op here stages state in `__`-prefixed columns that `withColumn`
    * would silently overwrite — fail loudly instead (same contract as
    * `Layout.clusterByZ` / `Skew.saltedAgg` / `Joins`).
    */
  private def requireFree(df: DataFrame, op: String, names: String*): Unit = {
    val clash = df.columns.filter(names.contains)
    require(clash.isEmpty,
      s"$op reserves column name(s) ${clash.mkString(", ")}; rename the input column(s)")
  }

  /** Session conf key for the stitched helpers' partition sizing: target
    * bytes per pinned range partition (default 64 MiB of optimizer
    * estimate). */
  val StitchBytesPerPartition = "spark.graft.stitch.bytesPerPartition"

  /** Scale-adaptive partition count for the PINNED range partitionings in
    * [[lagStitched]] / [[runningSumStitched]] (optimization r22, the
    * [[concurrencySweepGlobal]] rowsPerPartition pattern extended per
    * VERDICT r21 #5): the checkpoint pin means AQE can never coalesce the
    * exchange, so a constant `numShufflePartitions` pays the full
    * per-partition stitch machinery (window group + summary row +
    * broadcast-join build per partition) even when the input is a few MB.
    * Derive the count from the optimizer's size estimate instead — floored
    * at 1, CAPPED at the session's shuffle parallelism (at 100 TB the
    * deployment raises `spark.sql.shuffle.partitions`, and an over-
    * estimated input simply keeps today's cap) — so local-mode benches and
    * clusters both get input-proportional stitch fan-out from the same
    * code. Correctness is parts-independent: the seam stitch is exact for
    * any split (StitchedConsistencySpec pins it across parts counts).
    */
  private[graft] def adaptiveParts(df: DataFrame): Int = {
    val target = df.sparkSession.conf
      .get(StitchBytesPerPartition, (64L << 20).toString).toLong
    require(target > 0, s"$StitchBytesPerPartition must be > 0, got $target")
    val cap = df.sparkSession.sessionState.conf.numShufflePartitions
    // Analyzed-plan stats — one size-visitor walk, no second optimizer
    // fixpoint (Materialize.narrowIfSmall note).
    val est = df.queryExecution.analyzed.stats.sizeInBytes
    ((est + target - 1) / target).min(BigInt(cap)).max(BigInt(1)).toInt
  }

  /** Per-event session assignment: `outCol` (1-based per key) increments
    * when ≥ `gapMs` of event time passed since the key's PREVIOUS event —
    * `session_window`'s gap semantics as a composable per-row column (the
    * `session_counts_by_type` gate aggregates these same breaks; this is
    * the form that lets downstream ops join, window or dedup BY session).
    * Deterministic under timestamp ties: a tied event's break indicator is
    * 0 and tied rows share one prefix sum, so the output is independent of
    * tie order. The window hash-partitions by the key — no single-partition
    * fallback at any scale (skewed keys behave like any skewed window:
    * AQE/salting upstream).
    */
  def sessionIds(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gapMs: Long,
      outCol: String = "session_seq"): DataFrame = {
    require(gapMs > 0, s"gapMs must be positive, got $gapMs")
    requireFree(df, "sessionIds", "__brk", outCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    df.withColumn("__brk",
        when(col(tsCol) - lag(col(tsCol), 1).over(w) >= gapMs, lit(1L))
          .otherwise(lit(0L))) // first event: lag NULL → unknown → 0
      .withColumn(outCol,
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          + lit(1L))
      .drop("__brk")
  }

  /** Trailing `frameRows`-preceding-to-current aggregate of `valueCol` over
    * `orderCol` (a LONG key with unique values, e.g. a day number), globally
    * ordered, emitted as `outCol`. `aggFn` maps the value column to its frame
    * aggregate (e.g. `avg`).
    *
    * `validateGaps` (default ON) welds a one-row guard into the plan: the max
    * gap between consecutive keys, computed WITHOUT a global sort (per-bucket
    * sorted key lists of ≤ `bucketSpan` keys, then cross-bucket seams over
    * the report-sized bucket summary), cross-joined in as an `assert_true`.
    * A gap > `bucketSpan` then fails the query at runtime instead of
    * returning a silently wrong frame aggregate. Costs one extra pass over
    * the input and a tiny shuffle; disable only when the cadence is known
    * contiguous (e.g. a dense daily spine).
    */
  def trailingStitched(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      frameRows: Int,
      aggFn: Column => Column,
      outCol: String,
      bucketSpan: Long = 1024L,
      validateGaps: Boolean = true): DataFrame = {
    require(frameRows >= 1, s"frameRows must be >= 1, got $frameRows")
    require(bucketSpan >= 1, s"bucketSpan must be >= 1, got $bucketSpan")
    requireFree(df, "trailingStitched", "__bkt", "__rn", "__hop", "__ctx", "__gap_ok")
    val bkt = col("__bkt")
    val bucketed = df.withColumn("__bkt", floor(col(orderCol) / lit(bucketSpan)))
    val lastRows = Window.partitionBy(bkt).orderBy(col(orderCol).desc)
    val carry = bucketed
      .withColumn("__rn", row_number().over(lastRows))
      .filter(col("__rn") <= frameRows)
      .drop("__rn")
      .withColumn("__hop", explode(sequence(lit(1), lit(frameRows))))
      .withColumn("__bkt", bkt + col("__hop"))
      .drop("__hop")
      .withColumn("__ctx", lit(true))
    val w = Window.partitionBy(bkt).orderBy(col(orderCol)).rowsBetween(-frameRows, 0)
    val stitched = bucketed.withColumn("__ctx", lit(false))
      .unionByName(carry)
      .withColumn(outCol, aggFn(col(valueCol)).over(w))
      .filter(!col("__ctx"))
      .drop("__bkt", "__ctx")
    if (!validateGaps) stitched
    else {
      // assert_true yields NULL on success; the isNull filter keeps every
      // row while referencing the guard column, so column pruning cannot
      // eliminate the (1-row, broadcast) guard subtree.
      stitched.crossJoin(broadcast(maxGapGuard(bucketed, orderCol, bucketSpan)))
        .filter(col("__gap_ok").isNull)
        .drop("__gap_ok")
    }
  }

  /** Global `lag(valueCol, 1)` over `orderCols` WITHOUT WindowExec's
    * single-partition fallback, exact for ARBITRARY key distributions (no
    * cadence precondition, unlike [[trailingStitched]]): range-repartition
    * on the order keys, lag inside each partition, and stitch the partition
    * seams with a broadcast per-partition boundary summary — the first row
    * of partition p takes the last value of the nearest non-empty earlier
    * partition, resolved over the numPartitions-row summary with sorted-
    * array expressions (no window at all on the summary, so the plan emits
    * zero "No Partition Defined" fallbacks). Cost vs the fallback: the
    * range exchange's sampling pass — and full parallelism afterwards.
    *
    * Equal order keys land in one partition (range boundaries are key
    * values), so seam stitching never splits a tie; lag order among exact
    * duplicates is unspecified, as in any window.
    */
  def lagStitched(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      outCol: String): DataFrame = {
    require(orderCols.nonEmpty, "lagStitched needs at least one order column")
    requireFree(df, "lagStitched", "__bkt", "__rn", "__lag", "__lastv", "__pred")
    val parts = adaptiveParts(df)
    // localCheckpoint PINS one physical partitioning: range-partitioner
    // bounds are SAMPLED per execution (rdd.id-seeded), and this frame has
    // two consumers (the windowed rows and the boundary-summary broadcast).
    // If exchange reuse doesn't kick in, the two executions draw slightly
    // different bounds and a seam row stitches against the WRONG bucket's
    // boundary value — observed as a handful of corrupted lags per million
    // rows, silent. Correctness must not hang on a reuse optimization.
    // (Executor-local blocks: an executor loss fails the query — recompute;
    // same documented trade as jaccardPairsPrefixFiltered.)
    val withBkt = df.repartitionByRange(parts, orderCols.map(col): _*)
      .withColumn("__bkt", spark_partition_id().cast("long"))
      .narrowCheckpoint()
    lagOverBuckets(withBkt, orderCols, valueCol, outCol).drop("__bkt")
  }

  /** Seam-stitched global lag over rows already carrying a `__bkt` column
    * that is MONOTONE in the global (orderCols) order — every row of bucket
    * b precedes every row of bucket b' > b. Callers that can derive such a
    * bucket from the key itself (e.g. time sliced into `(max−min)/n` spans,
    * [[graft.uts.Derivative]]) skip [[lagStitched]]'s range-exchange
    * sampling pass AND its second per-pid exchange: here the window's hash
    * exchange on `__bkt` is the only data movement. The per-bucket boundary
    * summary comes off the window output itself (the `rn == 1` row carries
    * the bucket's last value via an unbounded frame), so the input is
    * scanned once — no separate summary aggregation over the source.
    */
  private[graft] def lagOverBuckets(
      withBkt: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      outCol: String): DataFrame = {
    val valueType = withBkt.schema(valueCol).dataType
    val w = Window.partitionBy(col("__bkt")).orderBy(orderCols.map(col): _*)
    val wAll = Window.partitionBy(col("__bkt")).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val winned = withBkt
      .withColumn("__rn", row_number().over(w))
      .withColumn("__lag", lag(col(valueCol), 1).over(w))
      .withColumn("__lastv", last(col(valueCol)).over(wAll))
    // One row per non-empty bucket — a filter on the window output, not a
    // second aggregation over the source.
    val summary = winned.filter(col("__rn") === 1).select(col("__bkt"), col("__lastv"))
    // (bucket, predecessor bucket's last value), via one sorted struct list:
    // entry i's predecessor is entry i-1 (1-based element_at(i)); the list
    // holds only non-empty buckets, so this is the nearest earlier one.
    val preds = summary
      .agg(sort_array(collect_list(struct(col("__bkt"), col("__lastv")))).as("__a"))
      .select(explode(transform(col("__a"), (x, i) =>
        struct(
          x.getField("__bkt").as("__bkt"),
          when(i === 0, lit(null).cast(valueType))
            .otherwise(element_at(col("__a"), i).getField("__lastv")).as("__pred"))))
        .as("__p"))
      .select(col("__p.__bkt").as("__bkt"), col("__p.__pred").as("__pred"))
    winned
      .join(broadcast(preds), Seq("__bkt"), "left")
      .withColumn(outCol,
        when(col("__rn") === 1, col("__pred")).otherwise(col("__lag")))
      .drop("__rn", "__lag", "__lastv", "__pred")
  }

  /** Global running SUM of `valueCol` over `orderCols` (rows from the start
    * through the current row) WITHOUT the single-partition window fallback —
    * the two-pass distributed prefix sum: range-repartition on the order
    * keys, cumulative sum inside each partition, then add each partition's
    * exclusive prefix offset, resolved like [[lagStitched]]'s seams from one
    * sorted per-partition totals list (numPartitions rows, pure
    * expressions, no window on the summary). Exact for arbitrary key
    * distributions. Emits `outCol` (inclusive running sum) as DOUBLE —
    * bit-exact (and addition-order-independent) for integral inputs below
    * 2⁵³, the packing/counting domain this exists for; true floating-point
    * inputs can differ from a sequential sum in the last ulps.
    */
  def runningSumStitched(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      outCol: String): DataFrame = {
    require(orderCols.nonEmpty, "runningSumStitched needs at least one order column")
    requireFree(df, "runningSumStitched", "__pid", "__off", "__a", "__p")
    val parts = adaptiveParts(df)
    // Pinned partitioning (localCheckpoint) for the same reason as
    // [[lagStitched]]: the per-partition totals job and the final join are
    // two executions of this exchange, and re-sampled range bounds between
    // them would hand rows a __pid whose broadcast offset was computed for
    // a DIFFERENT partition extent — a silently wrong prefix sum.
    val ranged = df.repartitionByRange(parts, orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .narrowCheckpoint()
    val w = Window.partitionBy(col("__pid"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = ranged.groupBy(col("__pid"))
      .agg(sum(col(valueCol).cast("double")).as("__tot"))
    // Exclusive prefix offset per partition: sum of all earlier partitions'
    // totals, from one sorted (pid, total) list.
    val offsets = totals
      .agg(sort_array(collect_list(struct(col("__pid"), col("__tot")))).as("__a"))
      .select(explode(transform(col("__a"), (x, i) =>
        struct(
          x.getField("__pid").as("__pid"),
          coalesce(
            aggregate(slice(col("__a"), lit(1), i), lit(0.0),
              (acc, e) => acc + e.getField("__tot")),
            lit(0.0)).as("__off"))))
        .as("__p"))
      .select(col("__p.__pid").as("__pid"), col("__p.__off").as("__off"))
    ranged
      .join(broadcast(offsets), Seq("__pid"), "left")
      .withColumn(outCol, sum(col(valueCol).cast("double")).over(w) + coalesce(col("__off"), lit(0.0)))
      .drop("__pid", "__off")
  }

  /** One-row DataFrame whose single `__gap_ok` column is an `assert_true`
    * over the max gap between consecutive `orderCol` keys in `bucketed`
    * (which must carry `__bkt`). No global sort: intra-bucket gaps come from
    * per-bucket sorted key lists (≤ bucketSpan keys each); cross-bucket
    * seams (last key of a populated bucket → first key of the next) from
    * one sorted struct list over the report-sized bucket summary.
    */
  private def maxGapGuard(bucketed: DataFrame, orderCol: String, bucketSpan: Long): DataFrame = {
    def pairsMax(arr: Column, gap: (Column, Column) => Column): Column =
      coalesce(
        array_max(zip_with(
          slice(arr, lit(1), greatest(size(arr) - 1, lit(0))),
          slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
          gap)),
        lit(0L))
    val perBucket = bucketed
      .groupBy(col("__bkt"))
      .agg(sort_array(collect_list(col(orderCol).cast("long"))).as("__ks"))
      .select(
        col("__bkt"),
        element_at(col("__ks"), 1).as("__min"),
        element_at(col("__ks"), -1).as("__max"),
        pairsMax(col("__ks"), (a, b) => b - a).as("__intra"))
    perBucket
      .agg(sort_array(collect_list(
        struct(col("__bkt"), col("__min"), col("__max"), col("__intra")))).as("__bs"))
      .select(greatest(
        coalesce(array_max(transform(col("__bs"), b => b("__intra"))), lit(0L)),
        pairsMax(col("__bs"), (a, b) => b("__min") - a("__max"))).as("__maxgap"))
      .select(assert_true(
        col("__maxgap") <= lit(bucketSpan),
        concat(
          lit("trailingStitched: consecutive-key gap "),
          col("__maxgap").cast("string"),
          lit(s" > bucketSpan $bucketSpan strands frames beyond carry reach; " +
            "raise bucketSpan to at least the series' max gap"))).as("__gap_ok"))
  }

  /** M4 time-series decimation (Jugel et al., VLDB 2014): per time bucket,
    * the min, max, FIRST, and LAST values — the four points that make a
    * line-chart rendering of the bucket pixel-identical to rendering every
    * point, which is why M4 is the canonical width-bound downsampler for
    * dashboards over series too big to ship.
    *
    * One aggregation: min/max are plain; first/last ride `min_by`/`max_by`
    * over the (time, seq) struct — lexicographic struct ordering IS the
    * series order, so ties at equal timestamps break on the insertion seq
    * exactly like every ordered uts metric. Shuffles one row per
    * (partition, bucket): decimation output is the plot's width, never the
    * data's size.
    */
  def m4Downsample(
      df: DataFrame,
      timeCol: String,
      valueCol: String,
      seqCol: String,
      bucketMs: Long,
      partitionCols: Seq[String] = Nil): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    val ord = struct(col(timeCol), col(seqCol))
    df.filter(col(valueCol).isNotNull)
      .groupBy((partitionCols.map(col) :+
        expr(s"CAST($timeCol AS BIGINT) div $bucketMs").as("__bkt")): _*)
      .agg(
        count(lit(1)).as("n"),
        min(col(valueCol)).as("v_min"),
        max(col(valueCol)).as("v_max"),
        min_by(col(valueCol), ord).as("v_first"),
        max_by(col(valueCol), ord).as("v_last"))
      .select(partitionCols.map(col) ++ Seq(
        (col("__bkt") * bucketMs).as("bucket_start"),
        col("n"), col("v_min"), col("v_max"), col("v_first"), col("v_last")): _*)
  }

  /** Sweep-line concurrency over an interval table: per `keyCol`, the PEAK
    * number of simultaneously-active intervals and the total BUSY time
    * (length of the union of the intervals — "how long was at least one
    * session open"), the capacity-planning pair every sessionized event log
    * eventually needs.
    *
    * Shape: each interval explodes to two boundary deltas (+1 at `startCol`,
    * −1 at `endCol`), deltas are NETTED per (key, timestamp) by a plain
    * aggregation, and a key-partitioned running sum over the netted
    * boundaries is the concurrency on each half-open segment
    * `[t, next_t)` — max of that is the peak, and summing `next_t − t`
    * where the running count is positive is the union length. Netting
    * BEFORE the window is what makes the sweep deterministic: all deltas at
    * one timestamp collapse into one row, so no intra-timestamp processing
    * order exists to disagree about, and the half-open `[start, end)`
    * convention falls out for free (an interval ending at `t` nets against
    * one starting at `t` — they never overlap). Zero-length intervals
    * (`start == end`) net to 0 and contribute nothing, by the same
    * convention.
    *
    * Cost: one shuffle to net the boundaries, one key-partitioned window
    * over 2× interval-count rows (hash-partitioned by key — never a
    * single-partition window; a single GLOBAL timeline instead of per-key
    * ones is [[runningSumStitched]]'s job). All arithmetic is exact Long —
    * oracle-replicable bit for bit.
    *
    * Output per key: `n_intervals`, `peak_concurrency`, `busy_ms`.
    */
  def concurrencySweep(
      intervals: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    requireFree(intervals, "concurrencySweep",
      "__t", "__d", "__e", "__net", "__ns", "__run", "__seg")
    // ONE pass over `intervals` (optimization r21): each row explodes to
    // its two boundary deltas via a 2-element array instead of a
    // starts ∪ ends union — the union form executed the (often expensive:
    // sessionized windows) interval subtree twice, and the separate
    // n_intervals count a third time. The start-edge count rides the same
    // netting aggregate (`__ns`), so n_intervals is a per-key rollup of
    // the netted frame — computed BEFORE the zero-net filter, which keeps
    // keys whose every timestamp fully nets (all zero-length intervals)
    // reporting (n, 0, 0) exactly as the three-scan form did.
    val netted0 = intervals
      .select(col(keyCol), explode(array(
        struct(col(startCol).cast("long").as("__t"), lit(1L).as("__d")),
        struct(col(endCol).cast("long").as("__t"), lit(-1L).as("__d")))).as("__e"))
      .select(col(keyCol), col("__e.__t").as("__t"), col("__e.__d").as("__d"))
      .groupBy(col(keyCol), col("__t"))
      .agg(sum(col("__d")).as("__net"),
        count(when(col("__d") === 1L, lit(1))).as("__ns"))
    // ONE window + ONE aggregation over the netted frame (optimization
    // r22; closes ADVICE r21 on the double-consumed netted0): zero-net
    // rows stay IN the window pass — they add 0 to the running sum, and a
    // segment split at a zero-net timestamp contributes (t₂−t₁)+(t₃−t₂) =
    // t₃−t₁, so the busy sum is unchanged — while the peak replicates the
    // old filtered-max domain exactly via max(when(net≠0, run)). The
    // n_intervals rollup, the peak and the busy time then collapse into a
    // single groupBy, so the interval subtree executes exactly once per
    // query with no materialization and no final join at all.
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"))
    val swept = netted0
      .withColumn("__run",
        sum(col("__net")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__seg",
        when(col("__run") > 0L, lead(col("__t"), 1).over(w) - col("__t")))
    swept.groupBy(col(keyCol)).agg(
        sum(col("__ns")).as("n_intervals"),
        coalesce(max(when(col("__net") =!= 0L, col("__run"))), lit(0L))
          .as("peak_concurrency"),
        coalesce(sum(col("__seg")), lit(0L)).as("busy_ms"))
      .select(col(keyCol), col("n_intervals"), col("peak_concurrency"),
        col("busy_ms"))
  }

  /** [[concurrencySweep]] without a key — ONE global timeline, the "how
    * many sessions does the whole service hold at once" number. A keyed
    * sweep hash-partitions its windows by the key; a single global timeline
    * has no key, so the running concurrency rides
    * [[runningSumStitched]] (two-pass distributed prefix sum — exact for
    * these integral deltas) and the busy-time segments come from
    * [[lagStitched]]'s seam-stitched global lag — NO single-partition
    * window anywhere, which is the entire reason this variant exists. A
    * segment `(prev_t, t]` counts as busy when the concurrency BEFORE `t`
    * (`run − net`) was positive — the same half-open union as the keyed
    * sweep, written lag-wise.
    *
    * Output: one row `(n_intervals, peak_concurrency, busy_ms)`.
    */
  def concurrencySweepGlobal(
      intervals: DataFrame,
      startCol: String,
      endCol: String): DataFrame = {
    requireFree(intervals, "concurrencySweepGlobal",
      "__t", "__d", "__e", "__net", "__ns", "__pid", "__run", "__pt", "__s")
    // ONE pass over `intervals` (optimization r21, the keyed sweep's note):
    // boundary deltas explode from a 2-element array instead of a
    // starts ∪ ends union, and n_intervals rolls up from the same netting
    // aggregate's start-edge count — the union form executed the interval
    // subtree twice and the final count a third time.
    val netted0 = intervals
      .select(explode(array(
        struct(col(startCol).cast("long").as("__t"), lit(1L).as("__d")),
        struct(col(endCol).cast("long").as("__t"), lit(-1L).as("__d")))).as("__e"))
      .select(col("__e.__t").as("__t"), col("__e.__d").as("__d"))
      .groupBy(col("__t"))
      .agg(sum(col("__d")).as("__net"),
        count(when(col("__d") === 1L, lit(1))).as("__ns"))
    // Materialized: consumed by BOTH the ranged sweep below and the
    // n_intervals rollup at the tail — without the cut, those separate
    // executions would each re-scan `intervals` (the very double-scan this
    // rewrite removes). Size is bounded by the distinct-timestamp count.
    val nettedAll = netted0.narrowCheckpoint()
    val netted = nettedAll.select(col("__t"), col("__net"))
      .filter(col("__net") =!= 0L)
    // FUSED stitch: composing runningSumStitched + lagStitched would range-
    // partition, materialize and window the timeline TWICE. One pinned
    // range partitioning serves both — per-partition cumulative sum and lag
    // in a single window pass, then one broadcast summary stitches both
    // seams (the exclusive prefix offset for the sum AND the previous
    // non-empty partition's last timestamp for the lag) from the same
    // sorted per-partition list.
    // Scale-adaptive partition count (optimization r21): the range
    // partitioning is PINNED by the checkpoint (AQE cannot coalesce it), so
    // a constant `numShufflePartitions` pays the full per-partition stitch
    // machinery — 3 × parts tasks — even for a timeline of a few thousand
    // edges. Derive parts from the materialized timeline's actual row
    // count (one cheap count over checkpoint blocks): rows/partition
    // targeted by `spark.graft.sweep.rowsPerPartition` (default 4M ≈
    // tens of MB of (long, long) rows per window task), floored at 1,
    // capped at the session's shuffle parallelism so a 100 TB timeline
    // still spreads. Correctness is parts-independent — the seam stitch
    // is exact for any split — and the count is read from the checkpoint,
    // never a re-scan.
    val parts = {
      val target = intervals.sparkSession.conf
        .get("spark.graft.sweep.rowsPerPartition", "4000000").toLong
      require(target > 0, s"spark.graft.sweep.rowsPerPartition must be > 0, got $target")
      val cap = intervals.sparkSession.sessionState.conf.numShufflePartitions
      math.max(1L, math.min(cap.toLong, (nettedAll.count() + target - 1) / target)).toInt
    }
    val ranged = netted.repartitionByRange(parts, col("__t"))
      .withColumn("__pid", spark_partition_id())
      .narrowCheckpoint() // pin ONE partitioning for rows + summary (seam note in lagStitched)
    val w = Window.partitionBy(col("__pid")).orderBy(col("__t"))
    val local = ranged
      .withColumn("__run", sum(col("__net")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__pt", lag(col("__t"), 1).over(w))
    val summary = ranged.groupBy(col("__pid"))
      .agg(sum(col("__net")).as("__tot"), max(col("__t")).as("__last"))
    val seams = summary
      .agg(sort_array(collect_list(struct(col("__pid"), col("__tot"), col("__last"))))
        .as("__s"))
      .select(explode(transform(col("__s"), (x, i) =>
        struct(
          x.getField("__pid").as("__pid"),
          coalesce(
            aggregate(slice(col("__s"), lit(1), i), lit(0L),
              (acc, e) => acc + e.getField("__tot")),
            lit(0L)).as("__off"),
          when(i === 0, lit(null).cast("long"))
            .otherwise(element_at(col("__s"), i).getField("__last")).as("__pred"))))
        .as("__p"))
      .select(col("__p.__pid").as("__pid"), col("__p.__off").as("__off"),
        col("__p.__pred").as("__pred"))
    val stitched = local.join(broadcast(seams), Seq("__pid"))
      .select(col("__t"), col("__net"),
        (col("__run") + col("__off")).as("__run"),
        coalesce(col("__pt"), col("__pred")).as("__pt"))
    val agg = stitched.agg(
      max(col("__run")).as("peak_concurrency"),
      coalesce(sum(when(col("__run") - col("__net") > 0L, col("__t") - col("__pt"))),
        lit(0L)).as("busy_ms"))
    // n_intervals = total start edges, rolled up from the materialized
    // netted frame — never a re-scan of `intervals` (empty input: sum is
    // NULL over the empty group, coalesced to the count form's 0).
    nettedAll.agg(coalesce(sum(col("__ns")), lit(0L)).as("n_intervals"))
      .crossJoin(broadcast(agg))
      .select(col("n_intervals"),
        coalesce(col("peak_concurrency"), lit(0L)).as("peak_concurrency"),
        coalesce(col("busy_ms"), lit(0L)).as("busy_ms"))
  }
}
