package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential event-funnel analysis over an event log.
  *
  * A funnel `A → B → C (each hop within w)` counts, per step, the users who
  * reached that step under FIRST-TOUCH semantics: a user reaches step i+1 if
  * they have a step-i+1 event strictly after their step-i arrival time and
  * within `withinMs` of it, and their step-i+1 arrival is the EARLIEST such
  * event. First-touch is the common product-analytics definition and is
  * deterministic, but it is not a maximal matching: a user whose earliest B
  * leads to no C in range is counted out of step C even if a later B would
  * have led to one. (A maximal-matching funnel needs per-user sequence
  * search — `flatMapGroups` territory, not a join chain.)
  *
  * Plan shape: one aggregation per step (`groupBy(user).agg(min(time))`),
  * each joined against the next step's filtered events. Every join is
  * key-equality on the user id, so at 100 TB each step is one hash shuffle
  * of the (tiny) per-user arrival table against a type-filtered event scan —
  * the event scan is filtered by `event_type` BEFORE the shuffle (scan-level
  * pushdown), so the shuffled volume per step is the step's own events, not
  * the log. Step count is a query constant, so the linear join chain is a
  * fixed-depth plan, not an iteration.
  */
object Funnel {

  /** Per-step reach counts: one row per funnel step,
    * `(step_idx, step, n_users)`, n_users non-increasing in step_idx.
    */
  def steps(
      events: DataFrame,
      stepTypes: Seq[String],
      withinMs: Long,
      userCol: String = "user_id",
      typeCol: String = "event_type",
      timeCol: String = "time"): DataFrame = {
    require(stepTypes.nonEmpty, "funnel needs at least one step")
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")

    // arrivals(i): (user, t) = earliest time the user reached step i.
    val first = events.filter(col(typeCol) === stepTypes.head)
      .groupBy(col(userCol)).agg(min(col(timeCol)).as("t"))
    val arrivals = stepTypes.tail.scanLeft(first) { (prev, tpe) =>
      val next = events.filter(col(typeCol) === tpe)
        .select(col(userCol), col(timeCol).as("t2"))
      prev.join(next, Seq(userCol))
        .filter(col("t2") > col("t") && col("t2") <= col("t") + withinMs)
        .groupBy(col(userCol)).agg(min(col("t2")).as("t"))
    }

    // smallResult, not orderBy: a range sort's boundary sampling would
    // re-execute the whole unioned join chain a second time for a
    // steps-count-sized output.
    Ordered.smallResult(
      arrivals.zip(stepTypes).zipWithIndex.map { case ((df, tpe), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i.toLong).as("step_idx"), lit(tpe).as("step"), col("n_users"))
      }.reduce(_ union _),
      "step_idx")
  }

  /** One greedy first-touch transition test: does event `(tpe, tsMs)` advance
    * a user sitting at `step` (arrived `arrivalMs`)? Shared by the batch
    * [[stepsOneScan]] and the streaming
    * [[graft.streaming.StreamOps.streamingFunnel]] state machine, so the two
    * formulations cannot drift. Over a per-user event-time-ordered scan,
    * greedy first-qualifying ≡ the join chain's min-time-qualifying: the
    * first qualifying event encountered in time order IS the earliest one.
    */
  private[graft] def advances(
      step: Int,
      arrivalMs: Long,
      tpe: String,
      tsMs: Long,
      stepTypes: Seq[String],
      withinMs: Long): Boolean =
    step < stepTypes.length && {
      if (step == 0) tpe == stepTypes.head
      else tpe == stepTypes(step) && tsMs > arrivalMs && tsMs <= arrivalMs + withinMs
    }

  private[graft] final case class FEvent(key: Long, tpe: String, tsMs: Long)

  /** [[steps]] in ONE scan of the event log: the per-user greedy state
    * machine (the streaming formulation's logic, [[advances]]) over
    * `groupByKey(user).flatMapGroups` instead of one type-filtered scan +
    * join per step. Identical first-touch output FOR ITS INPUT DOMAIN:
    * integral user/time columns (checked loudly below — a silent
    * cast('long') would fuse string ids '7' and '007' into one user and
    * turn a timestamp column into SECONDS against a millisecond
    * `withinMs`), and rows with a NULL user or time throw at runtime (the
    * non-nullable state encoder), where the join-chain form would group
    * them — pre-filter NULLs if the log has them.
    *
    * Trade: the join chain reads the log `steps` times but shuffles only
    * per-step arrival tables; this reads it ONCE (with a pushed
    * `type IN (steps)` filter) and shuffles the funnel-type events by user.
    * At 100 TB the one-scan form wins when the log dominates (deep funnels,
    * wide logs); the join chain wins when the funnel types are a tiny, well
    *-pruned slice. Per-user memory is that user's funnel-type events only —
    * bounded by the isin pushdown, not the log.
    */
  def stepsOneScan(
      events: DataFrame,
      stepTypes: Seq[String],
      withinMs: Long,
      userCol: String = "user_id",
      typeCol: String = "event_type",
      timeCol: String = "time"): DataFrame = {
    require(stepTypes.nonEmpty, "funnel needs at least one step")
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    // Loud domain check instead of a lossy cast (see scaladoc).
    for (c <- Seq(userCol, timeCol)) {
      val dt = events.schema(c).dataType
      require(Seq("byte", "short", "integer", "long").contains(dt.typeName),
        s"stepsOneScan needs an integral $c column (got ${dt.typeName}); " +
          "map string ids / timestamps to longs upstream, or use Funnel.steps")
    }
    val spark = events.sparkSession
    import spark.implicits._
    val st = stepTypes // avoid closing over `this`-adjacent state in the lambda
    val within = withinMs
    val typed = events
      .filter(col(typeCol).isin(stepTypes.distinct: _*))
      .select(col(userCol).cast("long").as("key"), col(typeCol).as("tpe"),
        col(timeCol).cast("long").as("tsMs"))
      .as[FEvent]
    val reached = typed
      .groupByKey(_.key)
      .flatMapGroups { (key: Long, it: Iterator[FEvent]) =>
        // (ts, tpe) sort: same deterministic tie order as the streaming twin.
        val sorted = it.toArray.sortBy(e => (e.tsMs, e.tpe))
        var step = 0
        var arrival = Long.MinValue
        val out = scala.collection.mutable.ArrayBuffer.empty[Long]
        for (e <- sorted)
          if (advances(step, arrival, e.tpe, e.tsMs, st, within)) {
            out += step.toLong
            arrival = e.tsMs
            step += 1
          }
        out.iterator.map(si => (si, key))
      }
      .toDF("step_idx", "key")
    // Each user contributes a step_idx at most once (the machine is
    // monotone), so count(*) per step is the user reach count. The literal
    // step spine restores zero rows for unreached steps, matching [[steps]].
    val spine = stepTypes.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("step_idx", "step")
    Ordered.smallResult(
      spine.join(reached.groupBy(col("step_idx")).agg(count(lit(1)).as("n_users")),
          Seq("step_idx"), "left")
        .select(col("step_idx"), col("step"),
          coalesce(col("n_users"), lit(0L)).as("n_users")),
      "step_idx")
  }

  /** Two-step conversion-rate summary: of the users who did `from`, the
    * share with a `to` event within `withinMs` after their FIRST `from`.
    * One output row `(n_start, n_converted, conv_rate)`.
    */
  def conversion(
      events: DataFrame,
      from: String,
      to: String,
      withinMs: Long,
      userCol: String = "user_id",
      typeCol: String = "event_type",
      timeCol: String = "time"): DataFrame = {
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    val starts = events.filter(col(typeCol) === from)
      .groupBy(col(userCol)).agg(min(col(timeCol)).as("t0"))
    val targets = events.filter(col(typeCol) === to)
      .select(col(userCol), col(timeCol).as("t2"))
    starts.join(targets, Seq(userCol), "left")
      .groupBy(col(userCol), col("t0"))
      .agg(max(when(col("t2") > col("t0") && col("t2") <= col("t0") + withinMs, 1L)
        .otherwise(0L)).as("conv"))
      .agg(count(lit(1)).as("n_start"), sum(col("conv")).as("n_converted"))
      .select(col("n_start"), col("n_converted"),
        round(col("n_converted").cast("double") / col("n_start"), 4).as("conv_rate"))
  }
}
