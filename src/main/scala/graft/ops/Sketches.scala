package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable sketches for cardinality at 100 TB.
  *
  * `approx_count_distinct` (HLL) is the built-in answer; KMV (k-minimum-
  * values, Bar-Yossef et al. 2002) is kept alongside it because it is
  * EXACTLY REPRODUCIBLE: the sketch is a deterministic function of the key
  * set (the k smallest distinct hash values), so two runs — or two engines —
  * agree bit-for-bit, which makes it both oracle-gateable and auditable
  * (an HLL register array is neither). The estimator is `(k-1)/U(k)` with
  * `U(k)` the k-th smallest hash normalized to [0,1).
  *
  * Scale contract: the aggregation buffer is a sorted distinct array capped
  * at k — map-side partial aggregation keeps at most k hashes per group per
  * partition, merges keep k of the union, so the shuffle carries O(k) per
  * group regardless of group size; nothing ever buffers the group. That is
  * the entire point vs an exact `count_distinct`, whose shuffle carries the
  * full distinct key set.
  */
object Sketches {

  /** murmur3's 32-bit finalizer over the low 32 bits of an integral column —
    * full avalanche (a multiplicative/lattice hash leaves min-order
    * statistics biased, which a KMV estimator reads directly as cardinality
    * error). One scalar codegen'd kernel node
    * ([[org.apache.spark.sql.graftfns.Murmur32Fin]]); the DuckDB oracle
    * replicates its 16-bit-split mod-2³² lattice in exact HUGEINT
    * arithmetic. [[hash32Columns]] is the same lattice in the Column DSL,
    * kept as the spec-pinned reference — as the PLAN hash it was an
    * exponential tree (each mixing stage reads its operand ~4×) that fell
    * out of codegen and cost optimizer passes seconds.
    */
  def hash32(c: Column): Column =
    org.apache.spark.sql.graftfns.TextFunctions.murmur32fin(c.cast("long"))

  /** Column-DSL reference formulation of [[hash32]] (16-bit-split products
    * keep every intermediate ≤ 2⁴⁹ — ANSI mode errors on a wrapped Long
    * multiply). SketchesSpec pins `hash32 ≡ hash32Columns` row-for-row; the
    * oracle SQL is a transliteration of THIS form into HUGEINT.
    */
  private[graft] def hash32Columns(c: Column): Column = {
    val m = lit(4294967296L)
    // z * k mod 2³² with z < 2³², k < 2³²: ((zHi·k mod 2³²)·2¹⁶ + zLo·k) mod 2³²
    def mulMod(z: Column, k: Long): Column =
      pmod(pmod(shiftrightunsigned(z, 16) * lit(k), m) * lit(65536L) +
        z.bitwiseAND(lit(0xFFFFL)) * lit(k), m)
    val z1 = pmod(c.cast("long"), m)
    val z2 = mulMod(z1.bitwiseXOR(shiftrightunsigned(z1, 16)), 2246822507L)
    val z3 = mulMod(z2.bitwiseXOR(shiftrightunsigned(z2, 13)), 3266489909L)
    z3.bitwiseXOR(shiftrightunsigned(z3, 16))
  }

  /** KMV summary: `est` is the cardinality estimate (EXACT — the buffer
    * size — while fewer than k distinct hashes exist), `kth` the largest
    * buffered hash (the k-th minimum once saturated), `n_buf` the buffer
    * fill. */
  final case class KmvEstimate(est: Double, kth: Long, n_buf: Int)

  /** The KMV aggregator: buffer = sorted distinct array of the k smallest
    * hashes seen. `reduce` is an O(log k) membership probe plus an O(k)
    * insert only when the hash beats the current k-th minimum (for a stream
    * of n values that happens O(k·log n) times, not n); `merge` is a linear
    * merge of two sorted arrays capped at k. Commutative and associative by
    * construction — the buffer depends only on the SET of hashes, so the
    * result is partitioning- and order-invariant (SketchesSpec asserts).
    */
  private final class KmvAgg(k: Int)
    extends Aggregator[Long, Array[Long], KmvEstimate] with Serializable {
    def zero: Array[Long] = Array.emptyLongArray

    def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val i = java.util.Arrays.binarySearch(buf, h)
      if (i >= 0) buf // present
      else {
        val ins = -i - 1
        if (buf.length < k) {
          val out = new Array[Long](buf.length + 1)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
          out
        } else if (ins >= k) buf // beyond the k-th minimum
        else {
          val out = new Array[Long](k)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
          out
        }
      }
    }

    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      if (b1.isEmpty) return b2
      if (b2.isEmpty) return b1
      val out = new Array[Long](math.min(k, b1.length + b2.length))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < b1.length || j < b2.length)) {
        val take1 = j >= b2.length || (i < b1.length && b1(i) <= b2(j))
        val v = if (take1) b1(i) else b2(j)
        if (take1) i += 1 else j += 1
        // skip duplicates across the two buffers
        if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    def finish(buf: Array[Long]): KmvEstimate = {
      val kth = if (buf.isEmpty) 0L else buf(buf.length - 1)
      val est =
        if (buf.length < k) buf.length.toDouble // saw < k distinct: exact
        else (k - 1).toDouble * 4294967296.0 / kth.toDouble
      KmvEstimate(est, kth, buf.length)
    }

    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[KmvEstimate] = Encoders.product[KmvEstimate]
  }

  /** Distinct-count sketch of `keyCol` per `groupCols` group: one hash
    * projection, one aggregation whose shuffle carries ≤ k longs per group.
    * Output: groupCols ++ (`est`, `kth`, `n_buf`).
    */
  def kmvDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      k: Int): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(kmvAggColumn(col(keyCol), k).as("__kmv"))
      .select(groupCols.map(col) ++ Seq(
        col("__kmv.est").as("est"),
        col("__kmv.kth").as("kth"),
        col("__kmv.n_buf").as("n_buf")): _*)

  /** The KMV aggregation as a reusable aggregate COLUMN
    * (`struct<est, kth, n_buf>`), so any groupBy — batch or a watermarked
    * streaming window ([[graft.streaming.StreamOps.windowedKmvDistinct]]) —
    * can carry the ≤ k-hash buffer as its aggregation state. The buffer is
    * a [[Aggregator]] with commutative/associative merge, which is exactly
    * what lets Structured Streaming hold it per live window and fold every
    * micro-batch's partial in.
    */
  def kmvAggColumn(keyCol: Column, k: Int): Column = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val agg = udaf(new KmvAgg(k))
    agg(hash32(keyCol))
  }

  /** [[KmvAgg]] with the raw buffer as the output — the mergeable form set
    * algebra needs. */
  private final class KmvBufAgg(k: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] with Serializable {
    private val inner = new KmvAgg(k)
    def zero: Array[Long] = inner.zero
    def reduce(b: Array[Long], h: Long): Array[Long] = inner.reduce(b, h)
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = inner.merge(b1, b2)
    def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[Seq[Long]] = org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[Long]]()
  }

  /** Histogram quantile sketch: per-group quantile ESTIMATES from a
    * fixed-width bucket histogram — the mergeable, bounded-state alternative
    * to sorting a group (exact percentiles shuffle and sort every value; the
    * histogram shuffles one count per OCCUPIED bucket, and bucket counts
    * merge by addition, so partial aggregation already compacts map-side).
    *
    * Bucketing is INTEGER arithmetic (`floor(value) div width`), so the
    * sketch is an exact deterministic function of the data — no float-log
    * boundary whose last ulp could differ across engines (a log-spaced
    * variant is the production choice for wide dynamic ranges; it trades
    * relative-error buckets for a cross-engine `floor(log(v))` hazard the
    * oracle cannot replicate bitwise). The estimate for quantile q is the
    * LOWER BOUND of the first bucket whose cumulative count reaches
    * `ceil(q·n)` — error ≤ width by construction, audited here by the exact
    * rank-statistic (`percentile_disc`-style k-th value, k = ceil(q·n),
    * identical on both engines because it selects an EXISTING value rather
    * than interpolating — interpolation formulas differ across engines in
    * the last bits).
    *
    * Output: groupCols ++ (`n`, and per q: `est_p<q>`, `exact_p<q>`).
    */
  def histQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      width: Long,
      qs: Seq[Double]): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"quantiles in (0,1]: $qs")
    import org.apache.spark.sql.expressions.Window
    def pName(q: Double) = (q * 100).round.toString
    // FLOOR division, not Spark's truncate-toward-zero `div`: for negative
    // values trunc-div rounds the bucket index UP, putting the lower-bound
    // estimate ABOVE the value and breaking `est <= exact < est + width`.
    // `(x - pmod(x, w)) div w` is exact Long arithmetic (pmod ∈ [0, w), the
    // numerator is a multiple of w) — no double rounding, stays codegen'd,
    // and matches the oracle's `//` floor semantics.
    val vals = df.filter(col(valueCol).isNotNull)
    val fv = s"CAST(floor($valueCol) AS BIGINT)"
    // The numerator is an exact multiple of width, so trunc-div IS floor-div.
    val bucket = expr(s"($fv - pmod($fv, ${width}L)) div ${width}L")
    val counts = vals.groupBy((groupCols.map(col) :+ bucket.as("__b")): _*)
      .agg(count(lit(1)).as("__c"))
    val ests = quantilesFromBuckets(counts, groupCols, "__b", "__c", qs,
      b => b * width)
    // Rank-statistic twin over the raw values, joined back per group: the
    // k-th smallest value (ties broken by order — identical k ⇒ identical
    // value on any engine).
    val vw = Window.partitionBy(groupCols.map(col): _*).orderBy(col(valueCol))
    val ranked = vals
      .withColumn("__r", row_number().over(vw))
      .withColumn("__n2", count(lit(1)).over(
        Window.partitionBy(groupCols.map(col): _*)))
    val exactAggs = qs.map { q =>
      min(when(col("__r") === ceil(lit(q) * col("__n2")),
        col(valueCol))).as(s"exact_p${pName(q)}")
    }
    val exacts = ranked.groupBy(groupCols.map(col): _*)
      .agg(exactAggs.head, exactAggs.tail: _*)
    ests.join(exacts, groupCols)
  }

  /** Quantile estimates from an ALREADY-BUILT bucket-count frame
    * (`groupCols ++ (bucketCol, cntCol)`, one row per occupied bucket):
    * cumulative counts per group in bucket order, and for each q the
    * `lowerBound(bucket)` of the first bucket whose cumulative count
    * reaches `ceil(q·n)` — the extraction step of [[histQuantiles]] /
    * [[histQuantilesLog2]], split out because the COUNTS are the mergeable
    * part: a streaming window can maintain them in bounded state
    * ([[graft.streaming.StreamOps.windowedHistogram]]), partial profiles
    * can be unioned and re-summed, and this derivation then runs over the
    * sketch-sized frame (occupied buckets per group), never the data.
    * Callers merging frames must re-aggregate counts per (group, bucket)
    * first — this method assumes one row per bucket.
    *
    * Output: groupCols ++ (`n`, per q `est_p<q>`).
    */
  def quantilesFromBuckets(
      counts: DataFrame,
      groupCols: Seq[String],
      bucketCol: String,
      cntCol: String,
      qs: Seq[Double],
      lowerBound: Column => Column): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"quantiles in (0,1]: $qs")
    def pName(q: Double) = (q * 100).round.toString
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(bucketCol))
    val cum = counts
      .withColumn("__cum", sum(col(cntCol)).over(w))
      .withColumn("__n", sum(col(cntCol)).over(
        Window.partitionBy(groupCols.map(col): _*)))
    val estAggs = qs.map { q =>
      min(when(col("__cum") >= ceil(lit(q) * col("__n")),
        lowerBound(col(bucketCol)))).as(s"est_p${pName(q)}")
    }
    cum.groupBy(groupCols.map(col): _*)
      .agg(max(col("__n")).as("n"), estAggs: _*)
  }

  /** [[histQuantiles]] with POWER-OF-TWO buckets — the relative-error form
    * for wide dynamic ranges (latency-style distributions), where a fixed
    * width either blurs the head or explodes the bucket count. The bucket
    * index is `floor(log2(v))` computed EXACTLY as `length(bin(v)) − 1` —
    * integer bit-length, not float `log()`, whose last ulp differs across
    * engines right at the power-of-two boundaries the buckets live on.
    * Values below 1 land in bucket −1 (lower bound 0). Estimate error is a
    * factor of 2 (the bucket's span); same exact rank-statistic audit twin.
    *
    * Output: groupCols ++ (`n`, and per q: `est_p<q>` = 2^bucket lower
    * bound, `exact_p<q>`).
    */
  def histQuantilesLog2(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"quantiles in (0,1]: $qs")
    import org.apache.spark.sql.expressions.Window
    def pName(q: Double) = (q * 100).round.toString
    // NULL values are excluded outright (matching utsTrendByType/m4Downsample):
    // Spark windows order NULLS FIRST, DuckDB NULLS LAST, so letting NULLs
    // through would silently skew `n`, cumulative counts, and both quantile
    // twins differently per engine.
    val vals = df.filter(col(valueCol).isNotNull)
    val counts = vals.groupBy((groupCols.map(col) :+ log2Bucket(col(valueCol)).as("__b")): _*)
      .agg(count(lit(1)).as("__c"))
    val ests = quantilesFromBuckets(counts, groupCols, "__b", "__c", qs, log2Lower)
    val vw = Window.partitionBy(groupCols.map(col): _*).orderBy(col(valueCol))
    val ranked = vals
      .withColumn("__r", row_number().over(vw))
      .withColumn("__n2", count(lit(1)).over(
        Window.partitionBy(groupCols.map(col): _*)))
    val exactAggs = qs.map { q =>
      min(when(col("__r") === ceil(lit(q) * col("__n2")),
        col(valueCol))).as(s"exact_p${pName(q)}")
    }
    val exacts = ranked.groupBy(groupCols.map(col): _*)
      .agg(exactAggs.head, exactAggs.tail: _*)
    ests.join(exacts, groupCols)
  }

  /** Bucket lower bound for the power-of-two family: 2^b as exact Long via
    * SQL shiftleft (the Scala overload only takes a literal shift), 0 for
    * the below-1 bucket — shared by [[histQuantilesLog2]] and the streaming
    * histogram gate's extraction.
    */
  def log2Lower(b: Column): Column =
    when(b < 0, lit(0L))
      .otherwise(call_function("shiftleft", lit(1L), b.cast("int")))

  /** Power-of-two bucket index: `floor(log2(v))` as exact integer bit-length
    * (`length(bin(floor(v))) − 1`), −1 for values below 1 — the bucketing
    * half of [[histQuantilesLog2]], shared with the streaming histogram
    * ([[graft.streaming.StreamOps.windowedHistogram]]) so batch and stream
    * land every value in the identical bucket.
    */
  def log2Bucket(v: Column): Column =
    when(v < 1, lit(-1L))
      .otherwise(length(bin(floor(v).cast("long"))).cast("long") - 1L)

  /** Count-Min sketch (Cormode & Muthukrishnan 2005): point-query frequency
    * estimates for ANY key from `depth × width` counters — the bounded-state
    * member of the counting family between exact groupBy counts (shuffle
    * carries every distinct key) and Misra-Gries (top-φ only): CMS answers
    * arbitrary keys after the fact, overcounting by at most the collision
    * mass (est ≥ true always; est ≤ true + εN with ε = e/width under the
    * standard analysis — here DETERMINISTIC for a given dataset because the
    * d hash rows are fixed salted murmur finalizers, which is what makes the
    * sketch oracle-replicable bit for bit, like [[kmvDistinct]]).
    *
    * The sketch is a FRAME, `(d, bucket, cnt)` with at most depth·width
    * rows: the groupBy's map-side partial aggregation IS the mergeable CMS
    * (two sketches merge by adding counts — union the frames and re-sum),
    * and the shuffle carries ≤ depth·width rows per partition regardless of
    * input size or key cardinality. Row `r`'s hash is the [[hash32]]
    * finalizer over `key + r·7919` — the same salt lattice the k-means‖
    * oracle already replicates in HUGEINT.
    */
  def cmsSketch(
      df: DataFrame,
      keyCol: String,
      depth: Int,
      width: Long): DataFrame = {
    require(depth >= 1, s"CMS depth must be >= 1, got $depth")
    require(width >= 2, s"CMS width must be >= 2, got $width")
    // Explode the depth index FIRST, hash once after: [[hash32]]'s avalanche
    // tree references its operand ~4× per mixing level, so `depth` copies of
    // it inside one generator blow the expression past codegen's method
    // limit and the whole scan falls back to interpreted evaluation (~8×
    // wall-clock on this path before the split). One instance in a plain
    // projection stays codegen'd with subexpression elimination.
    df.select(col(keyCol),
        explode(array((0 until depth).map(r => lit(r)): _*)).as("d"))
      .select(col("d"),
        pmod(hash32(col(keyCol).cast("long") + col("d").cast("long") * lit(7919L)),
          lit(width)).as("bucket"))
      .groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates off a [[cmsSketch]] frame: for each probe key, the
    * minimum of its `depth` bucket counters (an absent bucket row means no
    * key hashed there — count 0). The probe set is a handful of keys: the
    * probe frame is broadcast against the ≤ depth·width sketch rows, so
    * lookups never rescan the data the sketch summarized.
    */
  def cmsEstimate(
      sketch: DataFrame,
      keys: Seq[Long],
      keyCol: String,
      depth: Int,
      width: Long): DataFrame =
    broadcast(cmsProbes(sketch.sparkSession, keys, keyCol, depth, width))
      .join(sketch, Seq("d", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Probe rows `(d, bucket, keyCol)` for a key set — the lookup half of
    * [[cmsEstimate]], public so per-window consumers (the streaming CMS
    * gate) can join the same probe lattice against window-scoped sketch
    * rows. Same explode-then-hash shape as [[cmsSketch]] (one hash32
    * instance).
    */
  def cmsProbes(
      spark: org.apache.spark.sql.SparkSession,
      keys: Seq[Long],
      keyCol: String,
      depth: Int,
      width: Long): DataFrame = {
    require(keys.nonEmpty, "cmsProbes needs at least one probe key")
    import spark.implicits._
    keys.toDF(keyCol)
      .select(col(keyCol),
        explode(array((0 until depth).map(r => lit(r)): _*)).as("d"))
      .select(col("d"),
        pmod(hash32(col(keyCol).cast("long") + col("d").cast("long") * lit(7919L)),
          lit(width)).as("bucket"),
        col(keyCol))
  }

  /** The driver-gate composition: CMS estimates for a probe key set next to
    * their exact counts — est ≥ exact by construction (hash collisions only
    * ADD), and the overcount is the measured price of depth·width counters
    * vs a full distinct-key shuffle. Output: (keyCol, est, exact).
    */
  def cmsCounts(
      df: DataFrame,
      keyCol: String,
      probeKeys: Seq[Long],
      depth: Int,
      width: Long): DataFrame = {
    val est = cmsEstimate(cmsSketch(df, keyCol, depth, width),
      probeKeys, keyCol, depth, width)
    val exact = df.filter(col(keyCol).isin(probeKeys: _*))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("exact"))
    // Report-shape sort: a bare orderBy's range-sampling pass would execute
    // the whole sketch+probe plan a second time (Ordered.smallResult note).
    Ordered.smallResult(
      est.join(exact, Seq(keyCol), "left")
        .select(col(keyCol), col("est"), coalesce(col("exact"), lit(0L)).as("exact")),
      keyCol)
  }

  /** Theta-style SET ALGEBRA over KMV sketches (Dasgupta et al., the theta
    * sketch framework; KMV is its k-th-minimum instance): union and
    * intersection cardinality of `keyCol` between every PAIR of `partCol`
    * groups, from one sketch per group — never a re-scan of the raw keys.
    *
    * The algebra: each saturated sketch is a uniform sample of its key set
    * below its threshold `θ = kth/2³²`. For a pair, `θ∧ = min(θ_A, θ_B)`;
    * hashes below `θ∧` from either buffer are a uniform sample of the UNION
    * (estimate: `|sample| / θ∧`), and those present in BOTH buffers sample
    * the INTERSECTION (`|common| / θ∧`). An unsaturated buffer holds its
    * whole key set (θ = 1, estimates exact). Deterministic function of the
    * key sets — the DuckDB oracle re-derives it bit for bit, like
    * [[kmvDistinct]].
    *
    * Scale contract: the per-group aggregation shuffle carries ≤ k longs per
    * group (map-side capped, as [[kmvDistinct]]); the pairing joins SKETCH
    * ROWS (one per group — bounded by group cardinality, not data size), so
    * the pair stage is broadcast-sized. Output per (part_a, part_b) pair:
    * exact-while-unsaturated `est_union`, `est_intersect`, and the audit
    * columns (`n_common`, `theta_kth`).
    *
    * Estimator convention: the pair estimates use the INCLUSIVE threshold
    * `θ = kth + 1` with all k buffered hashes counted (`|sample|/θ`) — the
    * theta-sketch formulation, chosen because a pair's `θ∧` must be a single
    * comparable cutoff across two buffers. That carries a small (~1/k)
    * upward bias relative to [[kmvDistinct]]'s unbiased order-statistic
    * estimator `(k-1)/kth`; the two conventions intentionally differ, and
    * the oracle replicates each one exactly.
    */
  def kmvSetOps(
      df: DataFrame,
      partCol: String,
      keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val agg = udaf(new KmvBufAgg(k))
    val sketches = df.groupBy(col(partCol))
      .agg(agg(hash32(col(keyCol))).as("__buf"))
    val a = sketches.select(col(partCol).as("part_a"), col("__buf").as("__ba"))
    val b = sketches.select(col(partCol).as("part_b"), col("__buf").as("__bb"))
    // One sketch row per group: the pair join is over group-cardinality rows.
    a.join(broadcast(b), col("part_a") < col("part_b"))
      // θ∧ as a raw hash threshold: 2³² (exact) while EITHER buffer is
      // unsaturated only if BOTH are — a saturated side caps it at its kth.
      .withColumn("__ka",
        when(size(col("__ba")) < k, lit(4294967296L)).otherwise(element_at(col("__ba"), -1) + 1))
      .withColumn("__kb",
        when(size(col("__bb")) < k, lit(4294967296L)).otherwise(element_at(col("__bb"), -1) + 1))
      .withColumn("theta_kth", least(col("__ka"), col("__kb")))
      .withColumn("__ua",
        filter(col("__ba"), h => h < col("theta_kth")))
      .withColumn("__ub",
        filter(col("__bb"), h => h < col("theta_kth")))
      .withColumn("__common", array_intersect(col("__ua"), col("__ub")))
      .withColumn("n_common", size(col("__common")).cast("long"))
      .select(
        col("part_a"), col("part_b"),
        (size(array_union(col("__ua"), col("__ub"))).cast("double") *
          lit(4294967296.0) / col("theta_kth").cast("double")).as("est_union"),
        (col("n_common").cast("double") *
          lit(4294967296.0) / col("theta_kth").cast("double")).as("est_intersect"),
        col("n_common"), col("theta_kth"))
  }
}
