package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive a larger benchmark corpus from a driver-generated scale factor —
  * the scaling-slope instrument: `ScaleUp <srcDir> <dstDir> <factor>`
  * writes a `factor`×-replicated corpus whose WORKLOAD STRUCTURE matches
  * the source's, so per-family bench ratios between the two measure the
  * engine's scaling slope rather than a different problem.
  *
  * Faithful replication is the whole design problem: naive row copying
  * makes every document have `factor` exact duplicates, which inflates
  * near-dup pair work QUADRATICALLY (Σ df² per shingle) — that would
  * measure a 100×-denser dedup problem, not a 10×-bigger corpus. Instead:
  *
  *  - facts (`orders`/`lineitem`/`events`): replica k shifts the join/
  *    entity keys (order key, event id, user id) by `k·stride`, so per-key
  *    group sizes, join fan-outs, and session shapes are UNCHANGED while
  *    key cardinality scales by `factor`. Dimensions stay as-is (TPC-H
  *    scales facts faster than dims; every replica references the same
  *    dim rows).
  *  - `documents`: replica k > 0 prefixes every token with `r<k>x` — a
  *    BIJECTIVE token renaming, so within-replica shingle-set relations
  *    (jaccard values, duplicate clusters, df distributions) are exactly
  *    the source's while across-replica shingle spaces are disjoint.
  *    Replica 0 keeps the original text verbatim. `n_chars` is recomputed.
  *  - `embeddings`: replica k rotates each vector's dimensions by
  *    `k mod dim` — norms and within-replica geometry preserved, replicas
  *    linearly independent of each other (up to `dim` distinct rotations;
  *    beyond that replicas revisit earlier rotations, which only weakens
  *    cross-replica independence, never corrupts vectors).
  *  - `events.ts` is normalized to the epoch-ns `LongType` leg of
  *    [[graft.uts.Tsdb]]'s documented ts contract (replicated NTZ/NANOS
  *    values would otherwise need per-variant rewrite logic).
  *
  * Replica ids use strides far above any gate's planted-id offsets
  * (gates plant +10000/+100000 synthetic ids; strides are ≥ 10⁷).
  */
object ScaleUp {
  private val KeyStride = 100000000L // orders/lineitem order keys
  private val EvStride = 100000000L  // event ids
  private val UserStride = 10000000L // user ids
  private val DocStride = 10000000L  // doc ids
  private val VecStride = 10000000L  // vec ids

  private def replicate(df: DataFrame, factor: Int)(
      per: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(k => per(df, k)).reduce(_.unionByName(_))

  def main(args: Array[String]): Unit = {
    val Array(srcDir, dstDir, factorStr) = args.take(3)
    val factor = factorStr.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$srcDir/$name.parquet")
    // The driver corpus ships each table as a single parquet FILE (not a
    // directory) and the streaming gates' landing-zone symlinks depend on
    // that — write to a staging dir, then move the one part file into
    // place as a plain file.
    def w(df: DataFrame, name: String): Unit = {
      val stage = s"$dstDir/.stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val fs = new org.apache.hadoop.fs.Path(dstDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      require(part.length == 1, s"$name: expected one part file, got ${part.length}")
      val dst = new org.apache.hadoop.fs.Path(s"$dstDir/$name.parquet")
      fs.delete(dst, false)
      require(fs.rename(part.head.getPath, dst), s"$name: rename failed")
      fs.delete(new org.apache.hadoop.fs.Path(stage), true): Unit
    }

    for (dim <- Seq("region", "nation", "customer", "supplier", "part"))
      w(t(dim), dim)

    w(replicate(t("orders"), factor) { (d, k) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(k * KeyStride))
    }, "orders")

    w(replicate(t("lineitem"), factor) { (d, k) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(k * KeyStride))
    }, "lineitem")

    val ev = graft.uts.Tsdb.normalizeTs(graft.uts.Tsdb.eventsRaw(spark, srcDir))
    w(replicate(ev, factor) { (d, k) =>
      d.withColumn("event_id", col("event_id") + lit(k * EvStride))
        .withColumn("user_id", col("user_id") + lit(k * UserStride))
    }, "events")

    w(replicate(t("documents"), factor) { (d, k) =>
      val text =
        if (k == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          tok => concat(lit(s"r${k}x"), tok)), " ")
      d.withColumn("doc_id", col("doc_id") + lit(k * DocStride))
        .withColumn("text", text)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")

    w(replicate(t("embeddings"), factor) { (d, k) =>
      val e = col("embedding")
      // Rotate by k % dim: a raw k-rotation at factor-1 >= dim would make
      // the slice length non-positive and silently truncate the vectors.
      val r = pmod(lit(k), size(e))
      val rotated =
        if (k == 0) e
        else concat(slice(e, r + lit(1), size(e) - r), slice(e, lit(1), r))
      d.withColumn("vec_id", col("vec_id") + lit(k * VecStride))
        .withColumn("embedding", rotated)
    }, "embeddings")

    for (name <- Seq("orders", "lineitem", "events", "documents", "embeddings"))
      println(s"[scaleup] $name: " + spark.read.parquet(s"$dstDir/$name.parquet").count())
    spark.stop()
  }
}
