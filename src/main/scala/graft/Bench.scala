package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Queries execute into the noop sink — full plan runs (projections,
  * rounding, ordering included); `count()` would let Spark prune most of the
  * work and flatter the numbers.
  *
  * Noise robustness: this VM exhibits multi-second stalls (one random query
  * per run can regress 10-100×; see BASELINE.md). A single-shot-per-query
  * harness therefore produces red runs regardless of plan quality. Each
  * query runs REPS times after warmup; the reported per-query number is the
  * MEDIAN of those runs and "value" is the sum of medians. Per-run raws go
  * to stderr so a stall is visible in the log instead of poisoning the
  * official artifact.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Fixed single-thread CPU workload (~0.2 s on a healthy core), timed at
    * bench start and end and embedded in the artifact — host-level
    * throttling of this VM then shows up as a number in the JSON instead
    * of only as inflated query medians (this VM demonstrably degrades
    * 2-10× for minutes at a time; see BASELINE.md).
    */
  private def cpuCalib(): Double = {
    val t0 = System.nanoTime()
    var x = 0L
    var i = 0L
    while (i < 200000000L) { x += i * 2654435761L; i += 1 }
    if (x == 42L) System.err.print("") // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $reps")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val calibBefore = cpuCalib()
    // JIT + parquet-footer + page-cache warmup so per-query numbers measure
    // the plan, not first-touch JVM/IO costs; excluded from all timings. One
    // cheap query per table family (lineitem+dims, events, documents,
    // embeddings).
    for (w <- Seq("q1_agg", "q5_nation_revenue", "uts_global_metrics",
        "text_stats", "sim_topk_cosine"))
      SparkEntry.queries(w)(spark, sfDir).write.mode("overwrite").format("noop").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val raws = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(
        f"[bench] $name raws=${raws.map(r => f"$r%.3f").mkString(",")} median=${median(raws)}%.3f")
      name -> median(raws)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val calibAfter = cpuCalib()
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"cpu_calib_sec":[$calibBefore%.3f,$calibAfter%.3f]}""")
    spark.stop()
  }
}
