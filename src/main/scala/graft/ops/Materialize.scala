package graft.ops

import org.apache.spark.sql.DataFrame

/** The ONE materialization primitive behind every "compute this narrow
  * frame once, then fan out" site in the engine (double-scan removal,
  * iterative lineage cuts, range-partitioning pins, cached quantizer
  * state).
  *
  * Why it exists: the engine's default primitive is
  * `Dataset.localCheckpoint()` — eager, no filesystem round-trip, exactly
  * right on `local[*]` and healthy clusters. But local checkpoint blocks
  * live on EXECUTOR memory/disk with lineage truncated away: on a real
  * multi-node run, losing one executor makes every consumer of the frame
  * FAIL the job instead of recomputing (Spark cannot rebuild a lost block
  * without lineage). That is the documented trade — speed against
  * fault-tolerance — and the right side of it flips with deployment, so it
  * must be ONE config switch, not forty-five hard-coded call sites.
  *
  * Modes (`spark.graft.materialize.mode`, read per call from the owning
  * session so a session can flip it at runtime):
  *  - `"local"` (default): `localCheckpoint()` — fastest, executor-resident,
  *    NOT fault-tolerant. The single-node / interactive / bench posture.
  *  - `"reliable"`: `checkpoint()` to the SparkContext checkpoint
  *    directory — a filesystem round-trip per materialization, but a lost
  *    executor's blocks reload from storage and the job survives. The
  *    100 TB cluster posture; point `spark.graft.materialize.dir` (or
  *    `SparkContext.setCheckpointDir`) at a location that OUTLIVES
  *    executors (HDFS/object store), which is exactly why there is no
  *    silent local-tmp default — a node-local dir would claim fault
  *    tolerance it does not have. Fails loud when neither is set.
  *
  *    CLEANUP is part of this posture: Spark deletes a non-streaming
  *    checkpoint's files only when
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` (off by
  *    default, and READ ONCE at SparkContext start by the ContextCleaner —
  *    setting it at runtime here would be a silent no-op, so this
  *    primitive does not try). A long-lived reliable-mode job whose
  *    iterative call sites checkpoint repeatedly ([[Graph.pageRankInt]]
  *    every 8 rounds, [[Dedup.connectedComponentsLogRounds]] per round,
  *    k-means‖ per init round) accumulates one directory per
  *    materialization on durable storage until then-unreferenced ones are
  *    GC-collected + cleaner-deleted. Deployments running reliable mode
  *    should launch with that conf set to true (or sweep the checkpoint
  *    dir between jobs).
  *
  * Both modes are EAGER and both truncate lineage, so plan-shape
  * guarantees built on the primitive (pinned range partitionings, bounded
  * iterative plans, one-scan contracts) hold identically;
  * MaterializeSpec pins result equality across modes. Sites with their own
  * richer contract (e.g. [[Dedup.connectedComponents]]'s optional
  * `checkpointDir` reliable-cut parameter) keep it and document why.
  */
object Materialize {
  /** Session conf key selecting the mode: "local" (default) | "reliable". */
  val ModeConf = "spark.graft.materialize.mode"

  /** Session conf key for the reliable mode's checkpoint directory, used
    * when `SparkContext.setCheckpointDir` was not already called. Must be
    * executor-loss-durable storage for the mode to deliver its guarantee.
    */
  val DirConf = "spark.graft.materialize.dir"

  /** Materialize `df` once and truncate lineage, by the session-configured
    * mode. Call it on NARROW frames (projected/aggregated, not raw scans) —
    * the primitive's cost scales with what it stores regardless of mode.
    */
  def narrow(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ModeConf, "local") match {
      case "local" => df.localCheckpoint()
      case "reliable" =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          val dir = df.sparkSession.conf.getOption(DirConf).getOrElse(
            throw new IllegalStateException(
              s"$ModeConf=reliable needs a checkpoint directory: set $DirConf " +
                "or SparkContext.setCheckpointDir to executor-loss-durable storage"))
          sc.setCheckpointDir(dir)
        }
        df.checkpoint()
      case other =>
        throw new IllegalArgumentException(
          s"$ModeConf must be 'local' or 'reliable', got '$other'")
    }

  /** Postfix syntax for plan-chain call sites:
    * `frame.select(...).narrowCheckpoint()` ≡ `Materialize.narrow(...)`.
    */
  implicit class NarrowSyntax(private val df: DataFrame) extends AnyVal {
    def narrowCheckpoint(): DataFrame = narrow(df)
  }
}
