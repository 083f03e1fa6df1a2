package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** Structured-Streaming counterparts of the reference's streaming-adjacent
  * behaviors (SURVEY.md §2.9): continuous ingestion with event time, windowed
  * aggregation over recent data, and TTL-bounded state.
  *
  * The reference's model is pull-based (re-query a RAM array with a moving
  * `now`, evict with a 1 s sweep that assumes in-order arrival —
  * `/root/reference/uts.ts:103-147,250-269`). Watermarks are the principled
  * distributed replacement: they bound state for out-of-order data instead of
  * assuming order.
  */
object StreamOps {

  /** Tumbling per-`keyCol` aggregate with a watermark. Spark's `window()` is
    * epoch-aligned — the right semantics for an unbounded stream (the
    * reference's end-aligned bins need a fixed `now`, which a stream doesn't
    * have; batch queries over the sink reproduce those exactly via
    * [[graft.uts.IntervalGroup]]).
    */
  def tumblingStats(
      stream: DataFrame,
      widthSeconds: Long,
      watermarkDelay: String,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      valueCol: String = "value"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), s"$widthSeconds seconds"), col(keyCol))
      // Sum over EXACT decimals (associative) rather than doubles: partial
      // merge order varies across micro-batch/shuffle layouts, and a
      // double-sum's last-ulp wobble lands on round-N .5 boundaries when
      // results are compared against a batch re-derivation (the gate does).
      // The mean inherits determinism from the exact numerator. (30,10):
      // 10 fractional digits keep the per-row quantization bias below 5e-11
      // and 20 integer digits keep |value| sums far from the ANSI overflow
      // a (18,6) cast hits at 1e12 — must match the oracle's cast exactly.
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(30,10)")).cast("double").as("__sv"),
        count(col(valueCol)).as("__nv"))
      .select(
        col("window.start").as("win_start"), col("window.end").as("win_end"),
        col(keyCol), col("n"),
        coalesce(col("__sv") / col("__nv"), lit(0.0)).as("mean_value"),
        coalesce(col("__sv"), lit(0.0)).as("sum_value"))

  /** Session windows (gap-based grouping — absent in the reference, noted in
    * SURVEY.md §2.9 as the Spark-native generalization): events for a key
    * belong to one session until `gapSeconds` of event-time silence.
    */
  def sessionCounts(
      stream: DataFrame,
      gapSeconds: Long,
      watermarkDelay: String,
      tsCol: String = "ts",
      keyCol: String = "event_type"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), s"$gapSeconds seconds"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col(keyCol), col("n"))

  /** Dedup-at-ingest: drop rows whose `keyCols` (e.g. a content
    * fingerprint, [[graft.ops.Text.fingerprint]]) were already seen — the
    * streaming twin of [[graft.ops.Dedup.exact]] for a landing pipeline.
    * `dropDuplicatesWithinWatermark` keeps a key's state only until the
    * watermark passes its event time, so state is bounded by the disorder
    * horizon instead of growing with the corpus: the first arrival within
    * the horizon wins, and a duplicate arriving later than `watermarkDelay`
    * after the original is a (documented) re-admit — at 100 TB the
    * unbounded-horizon exact pass is the batch op's job, downstream.
    */
  def dedupStream(
      stream: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      watermarkDelay: String): DataFrame = {
    require(keyCols.nonEmpty, "dedupStream needs at least one key column")
    stream
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)
  }

  /** `seq` is the insertion-order tiebreak for equal timestamps (the batch
    * ops order by (time, seqCol)); defaults to 0 for sources without one.
    */
  final case class KeyedEvent(key: String, tsMs: Long, value: Double, seq: Long = 0L)
  final case class RunningLast(key: String, n: Long, last: Double)

  final case class DerivState(t0: Long, lastVal: Double, curK: Long, acc: Double)
  final case class DerivPoint(key: String, der_time: Long, der_value: Double)

  /** Streaming counterpart of [[graft.uts.Derivative]] (reference semantics at
    * uts.ts:458-507) as explicit keyed state: per-key rate-of-change resampled
    * onto a grid anchored at the key's FIRST point, emitting a grid point each
    * time an event crosses a bucket boundary (empty intermediate buckets emit
    * 0, matching the batch op's gap fill).
    *
    * Deviation from batch, inherent to unboundedness: the trailing partial
    * bucket stays in state instead of being flushed at the last point's time —
    * a stream has no last point. Events are ordered per micro-batch; across
    * batches arrival order is trusted (bound disorder upstream with a
    * watermark + sort, or accept the reference's same in-order assumption,
    * Q12).
    */
  def streamingDerivative(
      spark: SparkSession,
      stream: Dataset[KeyedEvent],
      intervalMs: Long): Dataset[DerivPoint] = {
    import spark.implicits._
    stream
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, events: Iterator[KeyedEvent], state: GroupState[DerivState]) =>
          // (tsMs, seq): the same tie order as batch Derivative's
          // (time, seqCol) — a value-based tiebreak would diverge from
          // batch whenever tied timestamps end a bucket.
          val sorted = events.toSeq.sortBy(e => (e.tsMs, e.seq))
          val out = scala.collection.mutable.ArrayBuffer.empty[DerivPoint]
          var st = state.getOption.orNull
          for (e <- sorted) {
            if (st == null) {
              // First point: anchors the grid, contributes delta 0 (uts.ts:476-479).
              st = DerivState(e.tsMs, e.value, 1L, 0.0)
            } else {
              val delta = e.value - st.lastVal
              val k = math.max(math.ceil((e.tsMs - st.t0).toDouble / intervalMs).toLong, 1L)
              if (k > st.curK) {
                out += DerivPoint(key, st.t0 + st.curK * intervalMs, st.acc)
                var j = st.curK + 1
                while (j < k) { out += DerivPoint(key, st.t0 + j * intervalMs, 0.0); j += 1 }
                st = DerivState(st.t0, e.value, k, delta)
              } else {
                st = st.copy(lastVal = e.value, acc = st.acc + delta)
              }
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** The reference's retention/`last` semantics as explicit keyed state:
    * per-key running count + last value, with a processing-time TTL that
    * drops idle keys — `Series.setRetention` (uts.ts:250-269) re-expressed as
    * `mapGroupsWithState` + timeout instead of a sweep thread.
    */
  def runningLastWithTtl(
      spark: SparkSession,
      stream: Dataset[KeyedEvent],
      ttlMs: Long): Dataset[RunningLast] = {
    import spark.implicits._
    // ttl=0 keeps state forever (the reference's setRetention(0), uts.ts:253-255)
    // and uses NoTimeout — a ProcessingTimeTimeout query schedules batches
    // continuously, which also means `processAllAvailable` never quiesces in
    // tests.
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    stream
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(), timeout) {
        (key: String, events: Iterator[KeyedEvent], state: GroupState[RunningLast]) =>
          if (state.hasTimedOut) {
            // Eviction only clears state — re-emitting the stale row here
            // (the mapGroupsWithState shape, which MUST return a value)
            // duplicated the key's last update at every timeout.
            state.remove()
            Iterator.empty
          } else {
            val sorted = events.toSeq.sortBy(e => (e.tsMs, e.seq))
            val prev = state.getOption.getOrElse(RunningLast(key, 0L, 0.0))
            val next = RunningLast(
              key,
              prev.n + sorted.size,
              if (sorted.nonEmpty) sorted.last.value else prev.last)
            state.update(next)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            Iterator.single(next)
          }
      }
  }

  final case class TypedEvent(key: Long, tpe: String, tsMs: Long)
  final case class FunnelState(step: Int, arrivalMs: Long)
  final case class FunnelReach(key: Long, step_idx: Long, step: String, arrival: Long)

  /** Streaming counterpart of [[graft.ops.Funnel.steps]]: a per-user state
    * machine (steps completed + last arrival time) that emits one row the
    * moment a user reaches a funnel step. Counting rows per `step_idx`
    * downstream reproduces the batch reach counts incrementally.
    *
    * Equivalence contract: first-touch batch semantics take the EARLIEST
    * qualifying event per hop; the state machine takes the first qualifying
    * event it PROCESSES. These agree when per-user events are processed in
    * event-time order — events are sorted per micro-batch, and across
    * batches arrival order is trusted (the same in-order contract as
    * [[streamingDerivative]]; bound disorder upstream with a watermark).
    * State is two fields per user — O(users), not O(events).
    */
  def streamingFunnel(
      spark: SparkSession,
      stream: Dataset[TypedEvent],
      stepTypes: Seq[String],
      withinMs: Long): Dataset[FunnelReach] = {
    require(stepTypes.nonEmpty, "funnel needs at least one step")
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    import spark.implicits._
    stream
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: Long, events: Iterator[TypedEvent], state: GroupState[FunnelState]) =>
          val sorted = events.toSeq.sortBy(e => (e.tsMs, e.tpe))
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelReach]
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          for (e <- sorted) {
            // Shared greedy transition — the batch one-scan funnel
            // (Funnel.stepsOneScan) runs the same predicate, so the batch
            // and streaming formulations cannot drift.
            if (graft.ops.Funnel.advances(
                st.step, st.arrivalMs, e.tpe, e.tsMs, stepTypes, withinMs)) {
              out += FunnelReach(key, st.step.toLong, stepTypes(st.step), e.tsMs)
              st = FunnelState(st.step + 1, e.tsMs)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
