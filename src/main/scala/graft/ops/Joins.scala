package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-side shuffle reducers for the 100 TB regime.
  *
  * Two patterns that both preserve EXACT join semantics while changing how
  * many bytes cross the wire:
  *
  *  - [[bloomSemiJoin]]: when the probe side is huge and the build side is
  *    selective-but-not-broadcastable (say 10M surviving keys — too many rows
  *    to broadcast as a hash relation, but only a few MB as a Bloom bitmap),
  *    filter the probe side through an in-plan Bloom filter BEFORE the exact
  *    shuffle semi-join. False positives just ride through to the exact join;
  *    true matches are never dropped, so the result is identical — only the
  *    shuffled volume shrinks (by ~selectivity of the build predicate).
  *
  *  - [[saltedRepJoin]]: when one join key is hot (1% of 100 TB on a single
  *    key pins the whole key's rows on one task), split each probe row across
  *    `replicate` sub-keys and replicate the small side once per sub-key.
  *    Every probe row still meets every matching small row exactly once, so
  *    the join output is row-for-row identical — the hot key's rows just
  *    spread over `replicate` tasks. AQE's skew-join split covers sort-merge
  *    joins after the fact; explicit salting also covers shuffled-hash joins
  *    and keeps the partials bounded from the first shuffle on.
  */
object Joins {

  /** `xxhash64` fails analysis on maps anywhere in a type. */
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType    => true
      case s: StructType => s.fields.exists(f => containsMap(f.dataType))
      case a: ArrayType  => containsMap(a.elementType)
      case _             => false
    }
  }

  /** Bloom-prune `large` against `build`'s `buildKey` set, then exact
    * left-semi join on `largeKey == buildKey`. Output = `large` rows with at
    * least one `build` match, all original `large` columns.
    *
    * The Bloom bitmap is built INSIDE the plan: k hash positions per build
    * key, positions aggregated into 64-bit words with `bit_or`, words
    * collapsed into one map row that is broadcast to the probe side. No
    * driver-side collect — the bitmap travels the same broadcast path a
    * small dim would, and the whole thing is one Catalyst plan (lazy until
    * an action, checked by PlanSpec's zero-jobs listener).
    *
    * `build` is scanned twice (bitmap + exact semi-join) — intended: at
    * scale the build side is orders of magnitude smaller than the probe
    * side, and the second scan is the price of exactness. Callers joining
    * against an expensive build SUBQUERY should cache it.
    *
    * With numBits = 2²⁰ and k = 3 the false-positive rate at 1M build keys
    * is ~(1 − e^(−3·1M/1M))³ ≈ 0.2 — size numBits ≳ 8–10 bits/key to keep
    * leakage low; a power of two keeps pmod/shift cheap.
    */
  def bloomSemiJoin(
      large: DataFrame,
      build: DataFrame,
      largeKey: String,
      buildKey: String,
      numBits: Int = 1 << 20,
      numHashes: Int = 3): DataFrame = {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 64, got $numBits")
    require(numHashes >= 1 && numHashes <= 8,
      s"numHashes must be in [1, 8], got $numHashes")
    val reserved = (0 until numHashes).map(i => s"__bw$i")
    require(!large.columns.exists(c => reserved.contains(c) || c == "__w"),
      "bloomSemiJoin reserves the __w/__bwN column names; rename the input column")
    // xxhash64 is TYPE-sensitive (an INT 5 and a BIGINT 5 hash differently)
    // while the exact semi-join coerces — mismatched key types would prune
    // true matches and silently break the exactness contract. Demand a
    // common type instead of guessing a coercion.
    require(large.schema(largeKey).dataType == build.schema(buildKey).dataType,
      s"bloomSemiJoin keys must share one type (xxhash64 is type-sensitive): " +
        s"$largeKey is ${large.schema(largeKey).dataType}, " +
        s"$buildKey is ${build.schema(buildKey).dataType} — cast one side first")

    // k independent-enough hashes: xxhash64 over (key, hash index).
    def positions(key: Column): Seq[Column] =
      (0 until numHashes).map(i => pmod(xxhash64(key, lit(i)), lit(numBits.toLong)))
    def wordIdx(p: Column): Column = shiftrightunsigned(p, 6)
    def mask(p: Column): Column =
      call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))

    // Sparse bitmap: one (word index, 64-bit word) row per word with any bit
    // set — ≤ k·|build| rows regardless of numBits. The probe reads its k
    // words via k broadcast hash LEFT joins (O(1) lookups in codegen, probe
    // rows gain k longs). Do NOT ship the bitmap as one dense-array row
    // through a join: every probe row then drags the whole numBits/8-byte
    // payload (measured 10× slower than the unpruned join at 2²⁰ bits), and
    // a MAP row is no better — Spark's element_at on maps is a linear key
    // scan. A missing word reads NULL → coalesce(0) → miss, so false
    // negatives stay impossible.
    val sparse = build
      .select(explode(array(positions(col(buildKey)): _*)).as("__pos"))
      .select(wordIdx(col("__pos")).as("__w"), mask(col("__pos")).as("__m"))
      .groupBy(col("__w"))
      .agg(bit_or(col("__m")).as("__word"))

    val probes = positions(col(largeKey))
    val withWords = probes.zipWithIndex.foldLeft(large) { case (df, (p, i)) =>
      df.join(
          broadcast(sparse.select(col("__w"), col("__word").as(s"__bw$i"))),
          wordIdx(p) === col("__w"), "left")
        .drop("__w")
    }
    val probeHit = probes.zipWithIndex
      .map { case (p, i) =>
        coalesce(col(s"__bw$i"), lit(0L)).bitwiseAND(mask(p)) =!= 0
      }
      .reduce(_ && _)
    val pruned = withWords.filter(probeHit).drop(reserved: _*)
    // Name-based using-join: `build`'s lineage is already inside `pruned`
    // (the bitmap subtree), so exprId-based refs like `build(buildKey)`
    // dangle after the analyzer deduplicates the self-join — a renamed
    // projection + using-column resolves by name after dedup instead.
    pruned.join(build.select(col(buildKey).as(largeKey)), Seq(largeKey), "left_semi")
  }

  /** Salted replicated inner join: `large ⋈ small` on `largeKey == smallKey`,
    * exact output, hot probe keys spread over `replicate` tasks.
    *
    * The salt is a CONTENT hash of the probe row, so a task retry recomputes
    * the identical salt — no rand-partitioning retry hazard (contrast
    * [[Skew.saltedAgg]], where a content hash would collapse duplicate rows
    * onto one salt and break the spreading; for a JOIN, identical duplicate
    * rows landing on one replica is a load imbalance of exactly those
    * duplicates, never a correctness issue, because each row joins only the
    * one replica carrying its salt and every replica holds the full small
    * side).
    *
    * `saltBy`: the column(s) to content-hash. Pass a unique-ish row key when
    * one exists — identical duplicate payloads then spread evenly instead of
    * piling on one replica. Default (None) hashes every HASHABLE probe
    * column (map-typed columns are excluded — `xxhash64` rejects maps at
    * analysis time).
    *
    * `small` must be small enough to replicate `replicate`× through a
    * shuffle (it is NOT broadcast — if it were broadcastable, salting would
    * be pointless; the `shuffle_hash` hint models the at-scale shape where
    * the dim exceeds the broadcast threshold).
    */
  def saltedRepJoin(
      large: DataFrame,
      small: DataFrame,
      largeKey: String,
      smallKey: String,
      replicate: Int,
      saltBy: Seq[String] = Nil): DataFrame = {
    require(replicate >= 1, s"replicate must be >= 1, got $replicate")
    require(!(large.columns ++ small.columns).contains("__salt"),
      "saltedRepJoin reserves the __salt column name; rename the input column")
    val saltCols: Seq[Column] =
      if (saltBy.nonEmpty) saltBy.map(col)
      else {
        val hashable = large.schema.fields
          .filterNot(f => containsMap(f.dataType)).map(f => col(f.name)).toSeq
        require(hashable.nonEmpty,
          "saltedRepJoin: every probe column is map-typed (unhashable); " +
            "pass saltBy naming a hashable column")
        hashable
      }
    val salted = large.withColumn(
      "__salt", pmod(xxhash64(saltCols: _*), lit(replicate)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(array((0 until replicate).map(lit): _*)))
      .hint("shuffle_hash")
    salted
      .join(replicated,
        salted(largeKey) === replicated(smallKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Range (interval) join: every `points` row whose `pointCol` lies in
    * `[loCol, hiCol]` of an `intervals` row, matched on the shared `keys`
    * columns first (empty `keys` = pure interval containment). Spark plans
    * a raw `p BETWEEN lo AND hi` predicate as a broadcast-nested-loop or
    * cartesian product — quadratic work that dies at 100 TB. This is the
    * standard GRID decomposition instead: pick a `bucketWidth`, replicate
    * each interval to every width-sized grid cell it touches (floor
    * division in exact long arithmetic — `(x − pmod(x, w)) / w` — so
    * negative values bucket correctly), route each point to its one cell,
    * equi-join on `(cell, keys…)`, then apply the exact BETWEEN as a
    * post-filter. A (point, interval) pair can only meet in the point's own
    * cell, so no dedup is needed and the result is row-identical to the
    * naive theta join (JoinsLayoutSpec). Shuffle volume: points once,
    * intervals × (span/width + 1) — the caller tunes `bucketWidth` to the
    * typical span. An interval spanning more than `maxBucketsPerInterval`
    * cells fails loud IN the plan (`raise_error`, the [[graft.uts.OrderedFold]]
    * guard discipline) instead of silently exploding an executor; an
    * inverted interval (`hi < lo`) matches nothing, like the theta join.
    * Output: all point columns + the interval's `lo`/`hi` (+ its other
    * columns); `keys` columns appear once.
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long,
      keys: Seq[String] = Seq.empty,
      maxBucketsPerInterval: Int = 1 << 12): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(maxBucketsPerInterval >= 1,
      s"maxBucketsPerInterval must be >= 1, got $maxBucketsPerInterval")
    require(!(points.columns ++ intervals.columns).contains("__cell"),
      "rangeJoin reserves the __cell column name; rename the input column")
    // Exact long floor-division: `x − pmod(x, w)` is an exact multiple of
    // `w` (pmod is non-negative), so integral `div` — truncation — equals
    // floor for ANY sign, and nothing routes through a double (a `/` here
    // would round points beyond 2^53, e.g. epoch-nanosecond columns).
    def cellOf(c: Column): Column = {
      val x = c.cast("long")
      call_function("div", x - pmod(x, lit(bucketWidth)), lit(bucketWidth))
    }
    val nCells = cellOf(col(hiCol)) - cellOf(col(loCol)) + lit(1L)
    // The inverted branch comes FIRST: `sequence(lo, hi)` with hi < lo
    // counts DOWN in Spark, so an inverted interval reaching the otherwise
    // branch would materialize its |span| descending cells before the
    // BETWEEN filter discards every row — an empty cell list matches
    // nothing at zero cost, like the theta join.
    val cells = when(nCells <= lit(0L), array().cast("array<long>"))
      .when(
        nCells > lit(maxBucketsPerInterval.toLong),
        raise_error(concat(
          lit(s"rangeJoin: interval [$loCol, $hiCol] spans "), nCells.cast("string"),
          lit(s" cells > maxBucketsPerInterval=$maxBucketsPerInterval; "),
          lit("widen bucketWidth or split the interval"))).cast("array<long>"))
      .otherwise(sequence(cellOf(col(loCol)), cellOf(col(hiCol))))
    val ivb = intervals.withColumn("__cell", explode(cells))
    val ptb = points.withColumn("__cell", cellOf(col(pointCol)))
    ptb.join(ivb, Seq("__cell") ++ keys)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__cell")
  }
}
