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
    slidingStats(stream, widthSeconds, widthSeconds, watermarkDelay,
      tsCol, keyCol, valueCol)

  /** Sliding (hopping) per-`keyCol` aggregate: epoch-aligned windows of
    * `widthSeconds` advancing every `slideSeconds`, so each event lands in
    * `width/slide` overlapping windows. `slide == width` degenerates to the
    * tumbling case ([[tumblingStats]] delegates here). State per window is
    * the same (window, key) partial as tumbling — the overlap multiplies the
    * number of LIVE windows by width/slide, not the per-window state, and
    * the watermark still retires a window the moment it passes `win_end`.
    */
  def slidingStats(
      stream: DataFrame,
      widthSeconds: Long,
      slideSeconds: Long,
      watermarkDelay: String,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    require(widthSeconds > 0, s"window width must be positive, got $widthSeconds")
    require(slideSeconds > 0 && slideSeconds <= widthSeconds,
      s"slide must be in (0, width=$widthSeconds], got $slideSeconds")
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(
        window(col(tsCol), s"$widthSeconds seconds", s"$slideSeconds seconds"),
        col(keyCol))
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
  }

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

  /** Per-window DISTINCT cardinality — "daily active users per type" as a
    * stream: exact `count(DISTINCT idCol)` per (tumbling window, key),
    * composed from Spark's two bounded-state primitives instead of holding
    * per-window id SETS in aggregation state. Stage 1 dedups on (key, id,
    * window); stage 2 is a plain watermarked window COUNT of the deduped
    * rows (partials merge map-side, the window retires at the watermark).
    * Both stages' state is watermark-bounded, which is the whole point: a
    * set-valued `collect_set` aggregate would hold every id in state AND
    * break partial aggregation. Chained stateful operators require append
    * output — windows emit once the watermark closes them, so a bounded
    * replay needs a far-future sentinel to flush the tail (the driver gate
    * plants one and filters it back out).
    *
    * The dedup stage is `dropDuplicates` WITH the event-time window in its
    * keys — not `dropDuplicatesWithinWatermark`, whose state expires
    * `watermarkDelay` after a key's FIRST occurrence: a user active at a
    * window's open and again near its close (gap > delay) would re-admit
    * and overcount. Keying on the window makes Spark hold each (key, id,
    * window) row until the watermark passes the WINDOW — exactly the
    * lifetime per-window distinctness needs, and the minimum any exact
    * distinct can get away with. Duplicates arriving beyond the watermark
    * horizon are late rows and drop entirely (standard watermark
    * semantics), so the streamed count equals the batch `count(DISTINCT)`
    * whenever disorder stays within `watermarkDelay` — which the gate's
    * replay does.
    */
  def windowedDistinct(
      stream: DataFrame,
      widthSeconds: Long,
      watermarkDelay: String,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      idCol: String = "user_id"): DataFrame = {
    require(widthSeconds > 0, s"window width must be positive, got $widthSeconds")
    stream
      .withWatermark(tsCol, watermarkDelay)
      .select(window(col(tsCol), s"$widthSeconds seconds").as("__w"),
        col(keyCol), col(idCol))
      .dropDuplicates(keyCol, idCol, "__w")
      .groupBy(col("__w"), col(keyCol))
      .agg(count(lit(1)).as("n_distinct"))
      .select(
        col("__w.start").as("win_start"), col("__w.end").as("win_end"),
        col(keyCol), col("n_distinct"))
  }

  /** Per-window value-distribution HISTOGRAM — the streaming half of
    * [[graft.ops.Sketches.histQuantilesLog2]]: one count per (tumbling
    * window, key, occupied power-of-two bucket), maintained as ordinary
    * watermarked window-aggregation state. Bucket counts are the MERGEABLE
    * part of the quantile sketch (they add across micro-batches exactly like
    * partial aggregates add map-side), so state per live window is bounded
    * by the occupied-bucket count — ~64 buckets covers the full positive
    * Long range — never by the number of events, and a window's counters
    * retire wholesale when the watermark passes `win_end`. Quantile
    * EXTRACTION (cumulative counts → `est_p<q>` lower bounds) runs over the
    * emitted sketch rows with [[graft.ops.Sketches.quantilesFromBuckets]] —
    * a sketch-sized batch step, deliberately not in the stream: the
    * estimates are not mergeable, the counts are.
    *
    * The bucket index is [[graft.ops.Sketches.log2Bucket]] — the identical
    * integer bit-length arithmetic as batch, so a stream replay lands every
    * value in the same bucket as the batch sketch and the per-window counts
    * (and any quantile derived from them) must match the batch re-derivation
    * EXACTLY whenever disorder stays inside the watermark; NULL values are
    * excluded on both sides by the same rule.
    */
  def windowedHistogram(
      stream: DataFrame,
      widthSeconds: Long,
      watermarkDelay: String,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    require(widthSeconds > 0, s"window width must be positive, got $widthSeconds")
    stream
      .filter(col(valueCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(
        window(col(tsCol), s"$widthSeconds seconds"),
        col(keyCol),
        graft.ops.Sketches.log2Bucket(col(valueCol)).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("window.start").as("win_start"), col("window.end").as("win_end"),
        col(keyCol), col("bucket"), col("cnt"))
  }

  /** Per-window APPROXIMATE distinct — the O(k)-state member of the
    * windowed-distinct family: [[windowedDistinct]] is exact but its dedup
    * state holds every (key, id, window) row; this holds ONE ≤ k-hash KMV
    * buffer per live (window, key) ([[graft.ops.Sketches.kmvAggColumn]] —
    * an Aggregator whose commutative merge is what streaming aggregation
    * folds micro-batch partials with), so state is O(k) regardless of id
    * cardinality — the trade a 100 TB stream makes. The sketch is a
    * DETERMINISTIC function of the window's id SET (the k smallest distinct
    * hashes), so the streamed estimate must equal the batch
    * [[graft.ops.Sketches.kmvDistinct]] over the same per-day sets exactly
    * whenever replay disorder stays inside the watermark — an equality
    * gate, not an error-envelope one.
    *
    * Output per retired window: `win_start`, `win_end`, keyCol,
    * `est_distinct` (exact count while n_buf < k), `kth`, `n_buf`.
    */
  def windowedKmvDistinct(
      stream: DataFrame,
      widthSeconds: Long,
      watermarkDelay: String,
      k: Int = 64,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      idCol: String = "user_id"): DataFrame = {
    require(widthSeconds > 0, s"window width must be positive, got $widthSeconds")
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), s"$widthSeconds seconds"), col(keyCol))
      .agg(graft.ops.Sketches.kmvAggColumn(col(idCol), k).as("__kmv"))
      .select(
        col("window.start").as("win_start"), col("window.end").as("win_end"),
        col(keyCol),
        col("__kmv.est").as("est_distinct"),
        col("__kmv.kth").as("kth"),
        col("__kmv.n_buf").as("n_buf"))
  }

  /** Per-window Count-Min sketch — the third member of the bounded-state
    * sketch family beside [[windowedKmvDistinct]] (distinct) and
    * [[windowedHistogram]] (distribution): per tumbling window, the
    * `depth × width` salted-murmur counters of
    * [[graft.ops.Sketches.cmsSketch]] maintained as ordinary watermarked
    * window-aggregation state (≤ depth·width counter rows per live window,
    * regardless of key cardinality — counts merge by addition, exactly what
    * the streaming aggregation folds micro-batch partials with). Point
    * estimates for ANY key are answered after the fact by joining
    * [[graft.ops.Sketches.cmsProbes]] against the emitted rows — the
    * extraction step, batch-side and sketch-sized, like the histogram's
    * quantile derivation. Deterministic hash rows make the streamed sketch
    * a function of each window's key multiset, so it must equal the batch
    * re-derivation exactly under in-watermark disorder.
    *
    * Output per retired window: `win_start`, `win_end`, `d`, `bucket`,
    * `cnt`.
    */
  def windowedCms(
      stream: DataFrame,
      widthSeconds: Long,
      watermarkDelay: String,
      depth: Int,
      width: Long,
      tsCol: String = "ts",
      keyCol: String = "user_id"): DataFrame = {
    require(widthSeconds > 0, s"window width must be positive, got $widthSeconds")
    require(depth >= 1, s"CMS depth must be >= 1, got $depth")
    require(width >= 2, s"CMS width must be >= 2, got $width")
    stream
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol), col(keyCol),
        explode(array((0 until depth).map(r => lit(r)): _*)).as("d"))
      .groupBy(
        window(col(tsCol), s"$widthSeconds seconds"),
        col("d"),
        pmod(graft.ops.Sketches.hash32(
          col(keyCol).cast("long") + col("d").cast("long") * lit(7919L)),
          lit(width)).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("d"), col("bucket"), col("cnt"))
  }

  /** Stream-STATIC enrichment join — the dimension-lookup shape (events ⋈
    * user/customer attributes) that complements the stream-stream interval
    * join: the static side is a bounded table, so the join carries NO
    * streaming state at all (nothing to watermark — only the downstream
    * aggregation holds state), and the broadcast hint keeps each
    * micro-batch's join a map-side lookup instead of shuffling the batch.
    * Spark re-plans the static side per micro-batch; callers joining
    * against a slowly-changing dimension get each batch enriched against
    * the dimension AS OF that batch — the usual lookup-table semantics
    * (snapshot-pin by caching the dim if that drift is unwanted). Inner
    * join: stream rows without a dimension match drop, exactly like the
    * batch join the gate replays against.
    */
  def enrichStatic(
      stream: DataFrame,
      dim: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "enrichStatic needs at least one join key")
    stream.join(broadcast(dim), keys)
  }

  /** Watermark-bounded stream-stream INNER interval join — the streaming
    * attribution shape (purchase within `windowMs` after the same user's
    * click, impression→conversion, span→trace). Both sides carry
    * watermarks, and the join's time-range condition is what BOUNDS state:
    * Spark evicts a left row once the right watermark passes
    * `leftTs + windowMs` (it can no longer match), so neither side's state
    * grows with the stream — only with the disorder horizon plus the join
    * window. Inner-join matches emit as soon as both rows have arrived
    * (the watermark gates eviction, not emission), so the emitted set
    * equals the batch theta join whenever disorder stays within
    * `watermarkDelay` — which is exactly what the driver gate replays.
    * The right side's key column is renamed `__rk` internally so callers
    * can join two streams derived from the same source.
    *
    * `joinType = "left_outer"` additionally emits each unmatched left row
    * (right columns null) — but only once the watermark has CLOSED that
    * row's window (`leftTs + windowMs + delay` behind the watermark), since
    * until then a matching right row could still arrive; the "which clicks
    * never converted" stream therefore trails the watermark by the window,
    * and a replay must advance the watermark past the last left row's
    * window (a far-future sentinel) to flush the tail.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      windowMs: Long,
      watermarkDelay: String,
      joinType: String = "inner"): DataFrame = {
    require(windowMs >= 0, s"windowMs must be >= 0, got $windowMs")
    require(joinType == "inner" || joinType == "left_outer",
      s"intervalJoin supports inner and left_outer, got $joinType")
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withColumnRenamed(keyCol, "__rk").withWatermark(rightTs, watermarkDelay)
    l.join(r, l(keyCol) === r("__rk") &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $windowMs MILLISECONDS"),
      joinType)
      .drop("__rk")
  }

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

  /** One event through the derivative state machine — shared by the trusting
    * [[streamingDerivative]] and the watermark-ordered
    * [[streamingDerivativeOrdered]] so the two formulations cannot drift.
    * `st == null` means no state yet: the first point anchors the grid and
    * contributes delta 0 (uts.ts:476-479).
    */
  private def derivStep(
      key: String,
      st: DerivState,
      e: KeyedEvent,
      intervalMs: Long): (DerivState, List[DerivPoint]) =
    if (st == null) (DerivState(e.tsMs, e.value, 1L, 0.0), Nil)
    else {
      val delta = e.value - st.lastVal
      val k = math.max(math.ceil((e.tsMs - st.t0).toDouble / intervalMs).toLong, 1L)
      if (k > st.curK) {
        val out = List.newBuilder[DerivPoint]
        out += DerivPoint(key, st.t0 + st.curK * intervalMs, st.acc)
        var j = st.curK + 1
        while (j < k) { out += DerivPoint(key, st.t0 + j * intervalMs, 0.0); j += 1 }
        (DerivState(st.t0, e.value, k, delta), out.result())
      } else (st.copy(lastVal = e.value, acc = st.acc + delta), Nil)
    }

  /** Streaming counterpart of [[graft.uts.Derivative]] (reference semantics at
    * uts.ts:458-507) as explicit keyed state: per-key rate-of-change resampled
    * onto a grid anchored at the key's FIRST point, emitting a grid point each
    * time an event crosses a bucket boundary (empty intermediate buckets emit
    * 0, matching the batch op's gap fill).
    *
    * Deviation from batch, inherent to unboundedness: the trailing partial
    * bucket stays in state instead of being flushed at the last point's time —
    * a stream has no last point. Events are ordered per micro-batch; across
    * batches arrival order is trusted (the reference's same in-order
    * assumption, Q12). For sources that disorder events across batches use
    * [[streamingDerivativeOrdered]], which buys batch equivalence under a
    * bounded disorder horizon.
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
            val (next, emitted) = derivStep(key, st, e, intervalMs)
            st = next
            out ++= emitted
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** Admit/release split at the watermark — the reorder buffer behind the
    * `*Ordered` streaming ops. Arrivals strictly older than the watermark
    * are beyond the declared disorder bound and DROPPED — mirroring Spark's
    * own late-row filter, which keeps the `eventTime == watermark` boundary
    * row and discards only strictly-older ones before a stateful operator
    * sees them (so this filter is a defensive twin, load-bearing only if
    * the event-time column got projected away upstream of the exec).
    * Buffered events strictly older than the watermark are released: the
    * watermark guarantees no admissible future arrival can sort below
    * them. The boundary is symmetric — an event AT the watermark is
    * admitted and held pending, whether it was buffered earlier or just
    * arrived; it releases once the watermark passes it. Release is
    * exhaustive per batch, so emissions are monotone in event time across
    * batches: anything still buffered is ≥ the watermark every released
    * event was below.
    */
  private[streaming] def splitAtWatermark[E](
      buffered: Seq[E],
      arrivals: Iterator[E],
      watermarkMs: Long,
      ts: E => Long): (Seq[E], Seq[E]) =
    (buffered ++ arrivals.filter(ts(_) >= watermarkMs))
      .partition(ts(_) < watermarkMs)

  final case class DerivOrdState(buffer: Seq[KeyedEvent], inner: Option[DerivState])

  /** [[streamingDerivative]] with the in-order assumption REPLACED by a
    * watermark reorder buffer: events wait in per-key state until the event-
    * time watermark (driven by `maxDisorder`) passes them, then replay
    * through the shared [[derivStep]] transition in exact (tsMs, seq) order.
    * Under disorder bounded by `maxDisorder` the emitted grid points equal
    * the batch op's on the same rows; events later than the bound are
    * dropped, never emitted out of order (Spark's initial watermark is 0,
    * so an epoch-0 event counts as late from the very first batch). State
    * per key is the disorder horizon's worth of events plus the O(1)
    * derivative state; an event-time timeout flushes keys that go quiet,
    * so releases don't wait for the key's next arrival.
    */
  def streamingDerivativeOrdered(
      spark: SparkSession,
      stream: Dataset[KeyedEvent],
      intervalMs: Long,
      maxDisorder: String): Dataset[DerivPoint] = {
    import spark.implicits._
    val withWm = stream.toDF()
      .withColumn("__evt", timestamp_millis(col("tsMs")))
      .withWatermark("__evt", maxDisorder)
      .as[KeyedEvent]
    withWm
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: String, events: Iterator[KeyedEvent], state: GroupState[DerivOrdState]) =>
          val st0 = state.getOption.getOrElse(DerivOrdState(Vector.empty, None))
          val wm = state.getCurrentWatermarkMs()
          val (ready, pending) = splitAtWatermark(st0.buffer, events, wm, (e: KeyedEvent) => e.tsMs)
          val out = scala.collection.mutable.ArrayBuffer.empty[DerivPoint]
          var inner = st0.inner.orNull
          for (e <- ready.sortBy(e => (e.tsMs, e.seq))) {
            val (next, emitted) = derivStep(key, inner, e, intervalMs)
            inner = next
            out ++= emitted
          }
          state.update(DerivOrdState(pending, Option(inner)))
          // Flush when the watermark passes the oldest buffered event even
          // if this key never receives another row (clamped: a timeout
          // timestamp at or below the current watermark is rejected).
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(math.max(pending.map(_.tsMs).min, wm + 1L))
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
    * [[streamingDerivative]]; [[streamingFunnelOrdered]] replaces the
    * assumption with a watermark reorder buffer). State is two fields per
    * user — O(users), not O(events).
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

  final case class FunnelOrdState(buffer: Seq[TypedEvent], step: Int, arrivalMs: Long)

  /** [[streamingFunnel]] with the in-order assumption replaced by the same
    * watermark reorder buffer as [[streamingDerivativeOrdered]]: events wait
    * in per-key state until the watermark passes them, then replay through
    * the shared [[graft.ops.Funnel.advances]] transition in event-time
    * order — first-touch batch semantics hold under disorder bounded by
    * `maxDisorder`, and beyond-bound stragglers are dropped rather than
    * advancing the funnel out of order.
    */
  def streamingFunnelOrdered(
      spark: SparkSession,
      stream: Dataset[TypedEvent],
      stepTypes: Seq[String],
      withinMs: Long,
      maxDisorder: String): Dataset[FunnelReach] = {
    require(stepTypes.nonEmpty, "funnel needs at least one step")
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    import spark.implicits._
    val withWm = stream.toDF()
      .withColumn("__evt", timestamp_millis(col("tsMs")))
      .withWatermark("__evt", maxDisorder)
      .as[TypedEvent]
    withWm
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, events: Iterator[TypedEvent], state: GroupState[FunnelOrdState]) =>
          val st0 = state.getOption.getOrElse(
            FunnelOrdState(Vector.empty, 0, Long.MinValue))
          val wm = state.getCurrentWatermarkMs()
          val (ready, pending) = splitAtWatermark(st0.buffer, events, wm, (e: TypedEvent) => e.tsMs)
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelReach]
          var step = st0.step
          var arrival = st0.arrivalMs
          for (e <- ready.sortBy(e => (e.tsMs, e.tpe))) {
            if (graft.ops.Funnel.advances(step, arrival, e.tpe, e.tsMs, stepTypes, withinMs)) {
              out += FunnelReach(key, step.toLong, stepTypes(step), e.tsMs)
              step += 1
              arrival = e.tsMs
            }
          }
          state.update(FunnelOrdState(pending, step, arrival))
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(math.max(pending.map(_.tsMs).min, wm + 1L))
          out.iterator
      }
  }

  final case class CountEvent(key: String, sub: Long)
  final case class TopKState(counts: Map[Long, Long], gen: Long)
  final case class TopKRow(key: String, gen: Long, rank: Long, sub: Long, cnt: Long)

  /** Continuous per-key TOP-K leaderboard — "most active sub-keys per key,
    * maintained as events arrive" (the per-type most-active-users board).
    * Per-key state holds exact sub-key counts; each micro-batch that touches
    * a key re-emits its full top-k stamped with a GENERATION counter, so a
    * consumer keeps each key's max-generation rows for the current board
    * (append sinks never retract). Ties break (count desc, sub asc) —
    * deterministic for any replay of the same multiset, so the batch
    * count+rank derivation gates the final board exactly; counts are
    * order-insensitive, so no reorder buffer is needed.
    *
    * Scale contract: state is O(distinct sub-keys) per key — exact, and
    * right while sub-key cardinality is bounded (users per event type here).
    * For unbounded sub-keys use [[runningTopKApprox]], which swaps the map
    * for a Misra-Gries summary of fixed capacity — the board then carries
    * ε = n/(capacity+1) count slack.
    */
  def runningTopK(
      spark: SparkSession,
      stream: Dataset[CountEvent],
      k: Int): Dataset[TopKRow] = {
    require(k > 0, s"k must be positive, got $k")
    import spark.implicits._
    stream
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, events: Iterator[CountEvent], state: GroupState[TopKState]) =>
          val st0 = state.getOption.getOrElse(TopKState(Map.empty, 0L))
          val counts = events.foldLeft(st0.counts) { (m, e) =>
            m.updated(e.sub, m.getOrElse(e.sub, 0L) + 1L)
          }
          val gen = st0.gen + 1L
          state.update(TopKState(counts, gen))
          counts.toSeq.sortBy { case (sub, c) => (-c, sub) }.take(k).zipWithIndex
            .map { case ((sub, c), i) => TopKRow(key, gen, i + 1L, sub, c) }
            .iterator
      }
  }

  final case class TopKApproxRow(
      key: String, gen: Long, rank: Long, sub: Long, cnt_est: Long, n_tracked: Long)

  /** [[runningTopK]] with BOUNDED per-key state — the 100 TB shape for
    * unbounded sub-key cardinality: the exact count map is replaced by a
    * Misra-Gries summary (Misra & Gries 1982 — the same discipline as
    * [[graft.ops.Text.heavyHitters]]'s batch pass 1) holding at most
    * `capacity` counters, so state per key is O(capacity) FOREVER, no matter
    * how many distinct sub-keys the stream carries.
    *
    * The MG transition per event: an already-tracked sub-key increments its
    * counter; an untracked one takes a free slot if any, else EVERY counter
    * decrements by one (zeroed counters free their slot) and the event is
    * absorbed. The classic guarantee follows: with n events processed for a
    * key, every sub-key's estimate satisfies
    * `true − n/(capacity+1) ≤ est ≤ true`, so any sub-key whose true count
    * exceeds that of another by MORE than n/(capacity+1) provably ranks
    * above it on the board — the gate replays a skewed stream whose top-k
    * gaps all clear the bound, making board identity AND order equal to the
    * exact batch derivation regardless of processing order. Estimated counts
    * themselves ARE order-dependent (only bounded, not unique), which is why
    * the driver gate projects them away and the contract exposes them as
    * `cnt_est`, not `cnt`.
    *
    * `n_tracked` (the summary's live counter count, ≤ capacity by
    * construction) makes the state bound observable in the output — the
    * spec asserts it stays ≤ capacity while the exact twin's state grows
    * with distinct sub-keys.
    */
  def runningTopKApprox(
      spark: SparkSession,
      stream: Dataset[CountEvent],
      k: Int,
      capacity: Int): Dataset[TopKApproxRow] = {
    require(k > 0, s"k must be positive, got $k")
    require(capacity >= k, s"capacity must be >= k=$k, got $capacity")
    import spark.implicits._
    stream
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, events: Iterator[CountEvent], state: GroupState[TopKState]) =>
          val st0 = state.getOption.getOrElse(TopKState(Map.empty, 0L))
          val m = new java.util.HashMap[Long, java.lang.Long](capacity * 2)
          st0.counts.foreach { case (s, c) => m.put(s, c) }
          events.foreach { e =>
            val cur = m.get(e.sub)
            if (cur != null) m.put(e.sub, cur + 1L)
            else if (m.size < capacity) m.put(e.sub, 1L)
            else {
              val it = m.entrySet().iterator()
              while (it.hasNext) {
                val x = it.next()
                if (x.getValue == 1L) it.remove() else x.setValue(x.getValue - 1L)
              }
            }
          }
          val counts = {
            val b = Map.newBuilder[Long, Long]
            m.forEach((s, c) => b += (s -> c.longValue()))
            b.result()
          }
          val gen = st0.gen + 1L
          state.update(TopKState(counts, gen))
          val tracked = counts.size.toLong
          counts.toSeq.sortBy { case (sub, c) => (-c, sub) }.take(k).zipWithIndex
            .map { case ((sub, c), i) =>
              TopKApproxRow(key, gen, i + 1L, sub, c, tracked) }
            .iterator
      }
  }

  final case class SampleEvent(key: String, id: Long)
  final case class SampleState(ids: Seq[Long], gen: Long)
  final case class SampleRow(key: String, gen: Long, sample_rank: Long, id: Long)

  /** Deterministic streaming RESERVOIR: per key, the k ids with the
    * smallest `(idHash, id)` over everything that has arrived — the
    * streaming twin of [[graft.ops.Sampling.stratifiedExactN]], and the
    * reservoir a reproducible pipeline actually wants: classic
    * Vitter reservoir sampling is RNG-and-arrival-order dependent (a
    * restart or replay draws a different sample), while a bottom-k-by-hash
    * set is a pure FUNCTION of the id set — the min-k of a union is the
    * min-k of min-k's, so the result is batch-split-, order- and
    * replay-invariant, and equals the batch derivation on the replayed
    * union EXACTLY (the gate's oracle). State per key is the k ids —
    * O(k) forever, no matter the stream length. The full board re-emits
    * per touched batch under a generation stamp (append sinks never
    * retract), latest generation wins — the [[runningTopK]] discipline.
    */
  def bottomKSample(
      spark: SparkSession,
      stream: Dataset[SampleEvent],
      k: Int): Dataset[SampleRow] = {
    require(k > 0, s"k must be positive, got $k")
    import spark.implicits._
    def hkey(id: Long): (Long, Long) = (graft.ops.Sampling.idHashLong(id), id)
    stream
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, events: Iterator[SampleEvent], state: GroupState[SampleState]) =>
          val st0 = state.getOption.getOrElse(SampleState(Seq.empty, 0L))
          val merged = (st0.ids.iterator ++ events.map(_.id)).toSeq.distinct
            .sortBy(hkey).take(k)
          val gen = st0.gen + 1L
          state.update(SampleState(merged, gen))
          merged.zipWithIndex.map { case (id, i) =>
            SampleRow(key, gen, i + 1L, id)
          }.iterator
      }
  }
}
