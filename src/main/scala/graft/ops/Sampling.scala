package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Materialize.NarrowSyntax

/** Deterministic sampling for training-data pipelines (data mixing, eval
  * splits, per-stratum caps). Randomness comes from the Knuth multiplicative
  * hash of the row's id — seed-free, reproducible across runs/retries (a
  * `rand()` sample is neither), and one ANSI expression, so the DuckDB
  * oracle re-derives every sample exactly.
  */
object Sampling {

  /** Pseudo-random spread of an id: `(id·2654435761) mod 2³²` (Knuth's
    * multiplicative hash — [[Similarity.centroidsKMeans]] seeds with this
    * same function). Computed overflow-free: a bare `id * 2654435761`
    * exceeds Long for ids ≥ ~3.5e9 and THROWS under Spark 4's default ANSI
    * mode — ids that large are routine at 100 TB. Splitting the (mod 2³²)
    * id into 16-bit halves keeps every product under 2⁴⁸:
    * `(id·C) mod 2³² = (hi·((C·2¹⁶) mod 2³²) + lo·C) mod 2³²`.
    */
  def idHash(id: Column): Column = {
    val a = pmod(id.cast("long"), lit(4294967296L))
    val hi = shiftright(a, 16)
    val lo = a.bitwiseAND(lit(65535L))
    // 2041643008 = 0x79B10000 = (2654435761 * 65536) mod 2^32; OpsSpec pins
    // the decomposition against the naive BigInt product across 2^16/2^31
    // boundaries.
    pmod(hi * lit(2041643008L) + lo * lit(2654435761L), lit(4294967296L))
  }

  /** [[idHash]] as a JVM function — the identical 16-bit-split lattice, for
    * code that hashes inside typed state (streaming reservoirs) instead of
    * a Column expression. Bit-equal to the Column form (OpsSpec pins both
    * against the naive BigInt product). */
  def idHashLong(id: Long): Long = {
    val a = Math.floorMod(id, 4294967296L)
    val hi = a >>> 16
    val lo = a & 65535L
    Math.floorMod(hi * 2041643008L + lo * 2654435761L, 4294967296L)
  }

  /** Shuffle-free fractional sample per stratum: keep rows whose id-hash
    * falls under `frac` of the hash space. The 100 TB shape — a pure filter,
    * pushed to the scan, no shuffle, no window; per-stratum proportions hold
    * in expectation (each stratum sees the same uniform hash). Use for
    * down-weighting a source in a data mix where an exact count is not the
    * contract.
    */
  def fractionByHash(df: DataFrame, idCol: String, frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1], got $frac")
    df.filter(idHash(col(idCol)) < lit((frac * 4294967296.0).toLong))
  }

  /** Per-source weighted mix: each source keeps its own hash fraction — the
    * data-mixing shape (e.g. books 1.0, web 0.1, code 0.5) that builds a
    * training corpus from unevenly-sized sources. Same pure-filter plan as
    * [[fractionByHash]]: the per-source threshold is a CASE literal (a
    * 10⁵-source registry would become a broadcast join against the same
    * hash predicate), so there is still no shuffle and no rand(). Sources
    * absent from `weights` are dropped.
    */
  def weightedBySource(
      df: DataFrame,
      srcCol: String,
      idCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "weightedBySource needs at least one source weight")
    weights.foreach { case (s, w) =>
      require(w >= 0.0 && w <= 1.0, s"weight for $s must be in [0,1], got $w")
    }
    val threshold = weights.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (s, w)) =>
        acc.when(col(srcCol) === lit(s), lit((w * 4294967296.0).toLong))
      }
      .otherwise(lit(0L))
    df.filter(idHash(col(idCol)) < threshold)
  }

  /** Token-budget mixture plan — the step BEFORE [[weightedBySource]] in a
    * training-corpus recipe: given target budget SHARES per source
    * (`weights`, with `defaultWeight` for unlisted sources; caller
    * normalizes shares to ≤ 1) and a total `budget` in `countCol` units,
    * compute per-source availability and the sampling fraction that hits the
    * share, capped at 1 when a source cannot fill its share ("epochs > 1"
    * would be repetition policy, out of scope). Output one row per source:
    * `(source, available, desired, fraction, expected)`.
    *
    * Entirely in-plan: one partial-aggregated groupBy (k = |sources| rows)
    * plus literal CASE arithmetic — at a 10⁵-source registry the CASE
    * becomes a broadcast join, same note as [[weightedBySource]]. All
    * arithmetic is IEEE-deterministic (long sums, one multiply, one divide),
    * so the DuckDB oracle re-derives the plan bit-for-bit — no rounding
    * needed.
    */
  def mixturePlan(
      df: DataFrame,
      srcCol: String,
      countCol: String,
      weights: Map[String, Double],
      defaultWeight: Double,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    (weights.valuesIterator ++ Iterator(defaultWeight)).foreach(w =>
      require(w >= 0.0 && w <= 1.0, s"weights must be in [0,1], got $w"))
    val w = weights.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0.0))) { case (acc, (s, wt)) =>
        acc.when(col("source") === lit(s), lit(wt))
      }
      .otherwise(lit(defaultWeight))
    df.groupBy(col(srcCol).as("source"))
      .agg(sum(col(countCol)).cast("long").as("available"))
      .withColumn("desired", floor(w * lit(budget.toDouble)).cast("long"))
      .withColumn("fraction",
        least(lit(1.0),
          col("desired").cast("double") / greatest(col("available"), lit(1L)).cast("double")))
      .withColumn("expected", least(col("desired"), col("available")))
  }

  /** Temperature-scaled mixture plan — [[mixturePlan]] with the target
    * shares DERIVED FROM THE DATA instead of hand-authored: source `s` gets
    * share ∝ `available_s^alpha`, the multilingual-corpus standard
    * (α < 1 compresses the head so low-resource sources are not drowned by
    * the biggest one, α = 1 is proportional sampling, α → 0 uniform). The
    * default α = 0.5 is computed as `sqrt`, which IEEE 754 requires to be
    * CORRECTLY ROUNDED — identical in every engine — whereas a general
    * `pow(x, α)` is not so guaranteed and may differ in the last ulp
    * between implementations; non-default α therefore trades the bitwise
    * oracle contract for flexibility (stated here, not hidden).
    *
    * Determinism of the normalization: the per-source weights are rounded
    * to 10 fractional digits and summed as DECIMAL(30,10) — an EXACT,
    * associative sum, so the total is independent of partial-merge order
    * (the repo-wide discipline for double sums that feed comparisons).
    * Everything after is scalar IEEE arithmetic with fixed parenthesization.
    *
    * Output one row per source, same schema as [[mixturePlan]] plus the
    * derived `share`: `(source, available, share, desired, fraction,
    * expected)` — feed it to [[applyMixturePlan]] unchanged.
    */
  def mixturePlanTemperature(
      df: DataFrame,
      srcCol: String,
      countCol: String,
      budget: Long,
      alpha: Double = 0.5): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    val avail = df.groupBy(col(srcCol).as("source"))
      .agg(sum(col(countCol)).cast("long").as("available"))
    val weightRaw =
      if (alpha == 0.5) sqrt(col("available").cast("double"))
      else pow(col("available").cast("double"), lit(alpha))
    val weighted = avail.withColumn("__w", round(weightRaw, 10))
    val total = weighted.agg(
      sum(col("__w").cast("decimal(30,10)")).cast("double").as("__tot"))
    weighted.crossJoin(broadcast(total))
      .withColumn("share", col("__w") / col("__tot"))
      .withColumn("desired", floor(col("share") * lit(budget.toDouble)).cast("long"))
      .withColumn("fraction",
        least(lit(1.0),
          col("desired").cast("double") / greatest(col("available"), lit(1L)).cast("double")))
      .withColumn("expected", least(col("desired"), col("available")))
      .select(col("source"), col("available"), round(col("share"), 6).as("share"),
        col("desired"), col("fraction"), col("expected"))
  }

  /** Apply a [[mixturePlan]]: keep each row iff its id-hash falls under its
    * source's planned fraction — the same pure-filter posture as
    * [[weightedBySource]], except the thresholds come from a (k-row,
    * broadcast) plan table instead of literals, so the plan can be derived
    * from the data in the same job. Expected kept `countCol` mass per source
    * ≈ `expected` (hash-uniform, exact only in expectation — the plan's
    * contract is the layout, not an exact-N cut).
    *
    * A source ABSENT from the plan (the corpus gained one after the plan
    * was computed) keeps rows at `unplannedFraction` — default 0.0, i.e.
    * dropped, stated here explicitly because nothing errors; pass 1.0 to
    * fail open instead, or recompute the plan.
    */
  def applyMixturePlan(
      df: DataFrame,
      plan: DataFrame,
      srcCol: String,
      idCol: String,
      unplannedFraction: Double = 0.0): DataFrame = {
    require(unplannedFraction >= 0.0 && unplannedFraction <= 1.0,
      s"unplannedFraction must be in [0,1], got $unplannedFraction")
    // Renamed: the caller's srcCol may itself be named "source", and a
    // post-join drop(name) takes every column of that name with it.
    val thresholds = plan.select(
      col("source").as("__mix_src"), col("fraction").as("__mix_frac"))
    df.join(broadcast(thresholds), df(srcCol) === col("__mix_src"), "left")
      // floor, not cast: engines disagree on double→int casts (truncate vs
      // round-to-nearest); floor is unambiguous on both.
      .filter(idHash(col(idCol)) <
        floor(coalesce(col("__mix_frac"), lit(unplannedFraction)) * lit(4294967296.0)))
      .drop("__mix_src", "__mix_frac")
  }

  /** Deterministic train/validation/test assignment: each row gets the
    * first split whose cumulative hash-fraction bound exceeds its id-hash.
    * `splits` maps split name to fraction; fractions must sum to ≤ 1 (any
    * remainder is labeled NULL — an explicit holdout). The same pure-filter
    * posture as [[fractionByHash]]: one CASE projection, no shuffle, no
    * rand(), so membership is stable across runs, retries, engines — the
    * property that keeps eval sets from leaking into training data when
    * the corpus is re-processed.
    */
  def assignSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "assignSplit needs at least one split")
    require(!df.columns.contains("split"),
      "assignSplit reserves the split column name; a second assignment pass " +
        "would silently relabel membership — rename or drop the existing column")
    splits.foreach { case (s, f) =>
      require(f >= 0.0 && f <= 1.0, s"fraction for $s must be in [0,1], got $f")
    }
    // Cumulative bounds in exact DECIMAL arithmetic: double summation can
    // land 1 ulp under the analytic value (0.7 + 0.2 = 0.8999999999999999),
    // which would shift the integer threshold by one and flip the boundary
    // id's split relative to any oracle that writes floor(0.9·2³²) — the
    // Knuth multiplier is bijective mod 2³², so some id always sits exactly
    // on the threshold. BigDecimal.valueOf sums shortest-decimal values
    // exactly.
    val bounds = splits
      .scanLeft(BigDecimal(0)) { case (acc, (_, f)) => acc + BigDecimal.valueOf(f) }
      .tail
    require(bounds.last <= BigDecimal(1),
      s"split fractions must sum to <= 1, got ${bounds.last}")
    val h = idHash(col(idCol))
    val label = splits.zip(bounds)
      .foldLeft(when(lit(false), lit(null).cast("string"))) {
        case (acc, ((name, _), bound)) =>
          acc.when(h < lit((bound * BigDecimal(4294967296L)).toLong), lit(name))
      }
      .otherwise(lit(null).cast("string"))
    df.withColumn("split", label)
  }

  /** Near-dup-aware (leakage-safe) split assignment: the split decision is
    * made on each document's connected NEAR-DUP-CLUSTER representative,
    * not its own id, so an entire cluster of near-duplicates lands in ONE
    * split — the train/test-leakage guard a plain id-hash split cannot
    * give (a re-crawled copy of a training document landing in test is
    * contamination that `contamination_check` DETECTS; this op PREVENTS
    * it by construction, for near-dups as well as exact copies).
    * `pairs` come from any candidate generator at the caller's recall
    * budget ([[Dedup.jaccardPairs]] / [[Dedup.minhashLshPairs]] /
    * [[Dedup.srpPairs]]); clusters are their [[Dedup.connectedComponents]]
    * closure; the split is [[assignSplit]] hashed on the representative.
    * Scale shape: one CC fold plus one equality join — no new shuffles
    * beyond the pieces'. Output: `df`'s columns + `rep` + `split`
    * (NULL beyond the last band, the [[assignSplit]] contract).
    */
  def leakageSafeSplit(
      df: DataFrame,
      pairs: DataFrame,
      splits: Seq[(String, Double)],
      idCol: String = "doc_id"): DataFrame = {
    val cc = Dedup.connectedComponents(df.select(col(idCol)), pairs, idCol)
      .select(col("id").as(idCol), col("rep"))
    assignSplit(df.join(cc, Seq(idCol)), "rep", splits)
  }

  /** Leakage-safe split assignment for ONE INGEST BATCH — the streaming
    * composition of [[Dedup.nearDupAgainst]] and [[leakageSafeSplit]]: a
    * newly admitted document that near-dups an already-assigned cluster
    * must inherit that cluster's split IN THE SAME ingest step, or a
    * re-crawled copy of a train document lands in test the moment it
    * arrives (the leak [[leakageSafeSplit]] prevents for the batch corpus
    * would reopen at the ingest boundary). Per batch: probe the persisted
    * MinHash index (partition-pruned signature read), verify candidates at
    * `threshold`, AND link the batch against ITSELF
    * ([[Dedup.minhashLshPairs]] under the same family parameters) — two
    * near-duplicate documents that are BOTH new and arrive in the same
    * micro-batch (re-crawled duplicates commonly land in one crawl dump)
    * must not hash-split apart just because neither is indexed yet. The
    * batch's intra-pair connected components and the index matches resolve
    * together: a component inherits the MINIMUM matched representative of
    * ANY member (all matches of one document share a cluster when the
    * corpus was split cluster-consistently; min is the deterministic tie
    * rule either way), an unmatched component falls back to its minimum
    * batch id. Then assign the split by REPRESENTATIVE hash
    * ([[assignSplit]] — identical bands to the batch path), append the
    * `(id, rep, split)` rows to the assignment table, and append the batch
    * into the index so LATER batches can match against it. The intra-batch
    * CC fold is batch-sized (banded candidates, never batch²) — the
    * per-micro-batch cost a correct ingest boundary requires. Call from
    * `foreachBatch`; single-writer like the rest of the persisted-index
    * family.
    */
  def leakageSafeIngestBatch(
      batch: DataFrame,
      indexPath: String,
      assignPath: String,
      splits: Seq[(String, Double)],
      n: Int,
      threshold: Double,
      numHashes: Int = 32,
      bands: Int = 8,
      nBuckets: Int = 16,
      idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    val spark = batch.sparkSession
    val b = batch.narrowCheckpoint()
    val matches = Dedup.nearDupAgainst(b, indexPath, n, threshold,
      numHashes, bands, nBuckets, idCol, textCol)
    val refRep = spark.read.parquet(assignPath)
      .select(col(idCol).as("ref_id"), col("rep").as("__ref_rep"))
    val inherited = matches.join(refRep, "ref_id")
      .groupBy(col("new_id")).agg(min(col("__ref_rep")).as("__irep"))
    // Intra-batch closure: same-batch near-dups share one component even
    // when neither matches the index; an index match anywhere in the
    // component pulls the WHOLE component onto that cluster's rep.
    val intra = Dedup.minhashLshPairs(b, n, threshold,
      numHashes, bands, idCol, textCol)
    val comp = Dedup.connectedComponents(
      b.select(col(idCol).as("id")),
      intra.select(col("d1"), col("d2")))
      .select(col("id").as("new_id"), col("rep").as("__comp"))
    val compRep = comp.join(inherited, Seq("new_id"), "left")
      .groupBy(col("__comp")).agg(min(col("__irep")).as("__crep"))
    val assigned = assignSplit(
      comp.join(compRep, Seq("__comp"))
        .select(col("new_id").as(idCol),
          coalesce(col("__crep"), col("__comp")).as("rep")),
      "rep", splits)
    assigned.select(col(idCol), col("rep"), col("split"))
      .write.mode("append").parquet(assignPath)
    Dedup.minhashIndexAppend(b, indexPath, idCol, textCol)
  }

  /** Deterministic training-shard assignment + per-shard manifest — the
    * EXPORT step of a data pipeline (shard files for a training loader).
    * Shard membership is `idHash(id) mod nShards` — a pure projection, so
    * assignment is stable across runs/engines/retries and costs NO shuffle
    * (the classic fixed-SIZE shard alternative needs a global rank = a
    * total sort; hash-bucketed sharding is the 100 TB-clean form, with
    * shard sizes concentrated ~n/nShards by the hash's uniformity). Within
    * a shard the LOADING ORDER is also pinned: (idHash, id) ascending —
    * the deterministic sequence reproducible training wants. Returns the
    * per-shard manifest `(shard, n_docs, sum_weight, first_id, last_id)`
    * where first/last are the order's endpoints (order-sensitive outputs,
    * so the gate pins the sequence, not just membership); one aggregation,
    * shuffle keyed by shard. The writer side is `df.withColumn("shard",
    * pmod(idHash(id), nShards)).repartition(col("shard")).sortWithinPartitions(hash, id)
    * .write.partitionBy("shard")` — same assignment expression, no
    * additional machinery.
    */
  def shardManifest(
      df: DataFrame,
      nShards: Int,
      idCol: String,
      weightCol: String): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val h = idHash(col(idCol))
    Ordered.smallResult(
      df.select(pmod(h, lit(nShards.toLong)).as("shard"),
          col(idCol).as("__id"), col(weightCol).cast("long").as("__w"), h.as("__h"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("__w")), lit(0L)).as("sum_weight"),
          min_by(col("__id"), struct(col("__h"), col("__id"))).as("first_id"),
          max_by(col("__id"), struct(col("__h"), col("__id"))).as("last_id")),
      "shard")
  }

  /** Deterministic PER-EPOCH reshuffle of the training-shard loading
    * order — the loader-side need [[shardManifest]] leaves open: epochs
    * must traverse each shard in DIFFERENT orders (fixed-order epochs bias
    * curricula) yet every worker/engine/retry must derive the SAME order
    * per epoch with no RNG state. Shard membership stays
    * `idHash(id) mod nShards` — STABLE across epochs, so shard files are
    * written once and only the read order changes. The epoch-`e` order
    * within a shard is `(mix, id)` ascending with
    * `mix = idHash((id mod 2³²)·100003 + e)` — the [[Similarity
    * .negativeSample]] pair-mix discipline on the (id, epoch) pair: a pure
    * function, so epochs are decorrelated without ever materializing a
    * permutation. One aggregation keyed by (shard, epoch); output manifest
    * `(shard, epoch, n_docs, sum_weight, first_id, last_id)` with the
    * order's endpoints (order-sensitive, so a gate pins the sequence).
    */
  def epochShardManifest(
      df: DataFrame,
      nShards: Int,
      epochs: Seq[Int],
      idCol: String,
      weightCol: String): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(epochs.nonEmpty, "epochs must be non-empty")
    val h = idHash(col(idCol))
    val withE = df.select(pmod(h, lit(nShards.toLong)).as("shard"),
        col(idCol).as("__id"), col(weightCol).cast("long").as("__w"))
      .withColumn("epoch", explode(array(epochs.map(e => lit(e.toLong)): _*)))
    val mix = idHash(
      pmod(col("__id"), lit(4294967296L)) * lit(100003L) + col("epoch"))
    Ordered.smallResult(
      withE.withColumn("__m", mix)
        .groupBy(col("shard"), col("epoch"))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("__w")), lit(0L)).as("sum_weight"),
          min_by(col("__id"), struct(col("__m"), col("__id"))).as("first_id"),
          max_by(col("__id"), struct(col("__m"), col("__id"))).as("last_id")),
      "shard", "epoch")
  }

  /** Exactly `n` rows per stratum, chosen by id-hash rank — deterministic
    * stratified sampling with a hard cap (eval sets, per-language caps).
    * One shuffle by stratum; the rank window partitions by the stratum key,
    * so no single-partition fallback. Emits the stratum columns, the id,
    * and the 1-based `sample_rank`.
    */
  def stratifiedExactN(
      df: DataFrame,
      strataCols: Seq[String],
      idCol: String,
      n: Int): DataFrame = {
    require(strataCols.nonEmpty, "stratifiedExactN needs at least one stratum column")
    require(n >= 1, s"n must be >= 1, got $n")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(idHash(col(idCol)), col(idCol))
    df.select((strataCols.map(col) :+ col(idCol)) :+
        row_number().over(w).as("sample_rank"): _*)
      .filter(col("sample_rank") <= n)
  }
}
