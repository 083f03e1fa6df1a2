package graft

import org.apache.spark.sql.SparkSession
import graft.uts._
import graft.ops.Materialize.NarrowSyntax

/** Manual end-to-end driver: loads the real test corpus and runs the core
  * query surface, printing results + physical plans. Usage:
  *   sbt "runMain graft.Demo [sfDir]"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = Tsdb.events(spark, sfDir)
    val nowMs = ev.df.agg(org.apache.spark.sql.functions.max("time")).head().getLong(0)
    println(s"== events loaded; max time = $nowMs ==")

    val hour = 3600L * 1000
    println("== flagship: mean(value) per 1h bin, last 24h, zero-filled ==")
    val flagship = ev.query(UtsQuery(
      Seq("mean_value" -> Mean("value"), "n" -> CountM()),
      where = Seq(Pred.gt("time", nowMs - 24 * hour)),
      group = IntervalGroup(hour, fill = true, nowMs)))
    flagship.show(30, truncate = false)
    flagship.explain("formatted")

    println("== global multi-metric ==")
    ev.query(UtsQuery(Seq(
      "mean" -> Mean("value"), "sum" -> SumM("value"), "n" -> CountM(),
      "mx" -> MaxM("value"), "mn" -> MinM("value"), "lst" -> Last("value")
    ))).show(truncate = false)

    println("== derivative of sum-like value for user 1, I=6h ==")
    ev.derivative("value", 6 * hour, partitionCols = Seq("user_id")).show(10, truncate = false)

    import org.apache.spark.sql.functions._
    val docs = Tsdb.table(spark, sfDir, "documents")

    println("== near-dup pairs (exact n-gram Jaccard, J >= 0.6) ==")
    // Checkpointed: shown here AND fed to connectedComponents below.
    val pairs = ops.Dedup.jaccardPairs(docs, n = 3, threshold = 0.6).narrowCheckpoint()
    pairs.show(5, truncate = false)

    println("== transitive cluster collapse (connected components) ==")
    ops.Dedup.connectedComponents(
      docs.select(col("doc_id")), pairs.select(col("d1"), col("d2")), idCol = "doc_id")
      .filter(col("rep") =!= col("id")).show(5, truncate = false)

    println("== cosine top-5 neighbors of vec 0 ==")
    ops.Similarity.topK(Tsdb.table(spark, sfDir, "embeddings"), queryId = 0, k = 5)
      .show(truncate = false)

    println("== stitched 7-day trailing moving average (partitioned frames) ==")
    val daily = ev.df.groupBy(expr("time div 86400000").as("day"))
      .agg(count(lit(1)).as("n"))
    ops.Ordered.smallResult(
      ops.Windowed.trailingStitched(daily, "day", "n", 6, c => avg(c), "ma7"), "day")
      .show(8, truncate = false)

    println("== salted aggregation (skew-safe two-phase) ==")
    ops.Ordered.smallResult(
      ops.Skew.saltedAgg(
        ev.df.select(col("event_type"), col("value")), Seq("event_type"), salt = 8,
        Seq("n" -> ((count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c))))),
      "event_type")
      .show(truncate = false)

    println("== unlabeled ANN: IVF over seeded k-means centroids (no label column) ==")
    ops.Similarity.ivfTopKUnlabeled(
      Tsdb.table(spark, sfDir, "embeddings").select(col("vec_id"), col("embedding")),
      queryId = 0, k = 5, nprobe = 3, nCentroids = 8)
      .show(truncate = false)

    println("== per-point map(fn): arbitrary closure per interval bin ==")
    import spark.implicits._
    val s7 = UtsSeries(
      ev.df.filter(col("user_id") === 7).select(col("time"), col("event_id"), col("event_type")),
      timeCol = "time", seqCol = Some("event_id"))
    s7.query(UtsQuery(
      Seq("types" -> OrderedFold.mapMetric[String, String](
        "event_type", t => t.take(2).toUpperCase, newSequenceEncoder)),
      group = IntervalGroup(6 * hour, fill = false, nowMs)))
      .show(4, truncate = false)

    println("== quirk-replica metrics beside standard ones (all-negative max) ==")
    val neg = Seq((1L, 0L, -5.0), (2L, 1L, -3.0)).toDF("time", "seq", "v")
    UtsSeries(neg, timeCol = "time", seqCol = Some("seq"))
      .query(UtsQuery(Seq(
        "max_ref_quirk" -> Quirk.max("v"), "max_standard" -> MaxM("v"))))
      .show(truncate = false)

    println("== token-budget packing (concat-then-chunk, distributed prefix sum) ==")
    ops.Text.packByBudget(docs, budget = 512).orderBy(col("doc_id")).show(6, truncate = false)

    println("== deterministic data mix: weighted per-source hash sampling ==")
    ops.Sampling.weightedBySource(docs, "lang", "doc_id",
      Map("en" -> 0.25, "fr" -> 1.0, "de" -> 0.5))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
      .orderBy(col("lang")).show(truncate = false)

    println("== int8 embedding quantization (4x smaller, bounded cosine error) ==")
    ops.Similarity.quantizeInt8(Tsdb.table(spark, sfDir, "embeddings"))
      .orderBy(col("vec_id")).show(3, truncate = false)

    println("== funnel: signup -> click -> purchase, 3-day hops, first-touch ==")
    ops.Funnel.steps(ev.df, Seq("signup", "click", "purchase"), 3 * 24 * hour)
      .show(truncate = false)

    println("== bloom-pruned semi-join: lineitems of expensive orders ==")
    val li = Tsdb.table(spark, sfDir, "lineitem")
    val expensive = Tsdb.table(spark, sfDir, "orders").filter(col("o_totalprice") > 450000)
    ops.Joins.bloomSemiJoin(li, expensive, "l_orderkey", "o_orderkey")
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag")).show(truncate = false)

    println("== z-order layout: per-bucket coordinate bounds stay tight ==")
    li.select(pmod(col("l_partkey"), lit(1024L)).as("x"),
        pmod(col("l_suppkey"), lit(1024L)).as("y"))
      .withColumn("zb", shiftrightunsigned(ops.Layout.zvalue(col("x"), col("y"), 10), 12))
      .groupBy(col("zb"))
      .agg(count(lit(1)).as("n"), (max(col("x")) - min(col("x"))).as("x_span"),
        (max(col("y")) - min(col("y"))).as("y_span"))
      .orderBy(col("zb")).show(5, truncate = false)

    println("== deterministic train/val/test split + contamination posture ==")
    ops.Sampling.assignSplit(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("split")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("split")).show(truncate = false)

    println("== top bigrams (LM corpus statistics) ==")
    ops.Text.ngramCounts(docs, n = 2, k = 5).show(truncate = false)

    // ---- the round-6 training-data pipeline, composed end to end ----

    println("== canonicalize -> scrub -> exact dedup (the ingest cascade) ==")
    val canon = ops.Text.normalize(docs)
    val scrubbed = ops.Text.redact(canon, textCol = "norm_text")
      .select(col("doc_id"), col("redacted").as("text"))
    ops.Dedup.exact(scrubbed, "text").orderBy(col("doc_id")).show(3, truncate = false)

    println("== SemDeDup: cluster-scoped embedding near-dedup ==")
    ops.Dedup.semanticDedup(Tsdb.table(spark, sfDir, "embeddings"),
        nClusters = None, rounds = 2, threshold = 0.8)
      .filter(col("is_dup") === 1).show(5, truncate = false)

    println("== diversity sample: 2 vectors per embedding cluster ==")
    ops.Similarity.diversitySample(Tsdb.table(spark, sfDir, "embeddings"),
        nClusters = Some(4), rounds = 2, nPer = 2)
      .show(8, truncate = false)

    println("== mixture plan -> apply: budget shares to kept rows per source ==")
    val plan = ops.Sampling.mixturePlan(docs, "source", "n_chars",
      Map("src0" -> 0.3, "src1" -> 0.2), defaultWeight = 0.02, budget = 20000L)
    plan.orderBy(col("source")).show(4, truncate = false)
    ops.Sampling.applyMixturePlan(docs, plan, "source", "doc_id")
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
      .orderBy(col("source")).show(4, truncate = false)

    println("== repeated n-gram spans (the scrub list) + eval decontamination ==")
    ops.Text.repeatedNgramSpans(docs, n = 2, minDf = 10).show(3, truncate = false)
    val split = ops.Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    ops.Text.ngramContamination(
        split.filter(col("split") === "train").select(col("doc_id"), col("text")),
        split.filter(col("split") =!= "train").select(col("doc_id"), col("text")),
        n = 3)
      .orderBy(col("overlap_ratio").desc, col("doc_id")).show(3, truncate = false)

    println("== forward as-of with tolerance: next order within 7 days of each event ==")
    AsofJoinDemo.run(spark, sfDir)

    println("== M4 decimation: 6h pixel-exact min/max/first/last per type ==")
    ops.Windowed.m4Downsample(ev.df, "time", "value", "event_id",
      bucketMs = 6 * hour, partitionCols = Seq("event_type"))
      .orderBy(col("event_type"), col("bucket_start")).show(5, truncate = false)

    println("== one-pass column profile of the documents drop ==")
    ops.Profile.columns(docs, Seq("doc_id", "n_chars", "lang", "source"))
      .orderBy(col("column")).show(truncate = false)

    println("== KMV theta set algebra: user overlap between event types ==")
    ops.Sketches.kmvSetOps(Tsdb.table(spark, sfDir, "events"),
      "event_type", "user_id", 64)
      .orderBy(col("part_a"), col("part_b")).show(5, truncate = false)

    println("== snapshot diff: what changed between two order drops ==")
    val orders0 = Tsdb.table(spark, sfDir, "orders")
    ops.Diff.snapshots(
      orders0,
      orders0.filter(col("o_orderkey") % 7 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice"))),
      Seq("o_orderkey"))
      .groupBy(col("change")).count().orderBy(col("change")).show(truncate = false)

    println("== robust outliers (median/MAD) then winsorized means per type ==")
    ops.Profile.robustOutliers(ev.df.select(col("event_type"), col("value")),
      "event_type", "value").orderBy(col("event_type")).show(truncate = false)
    ops.Profile.winsorize(ev.df.select(col("event_type"), col("value")),
      "event_type", "value")
      .groupBy(col("event_type"))
      .agg(round(avg(col("value")), 2).as("mean_raw"),
        round(avg(col("value_w")), 2).as("mean_winsorized"))
      .orderBy(col("event_type")).show(truncate = false)

    println("== session concurrency: per-type peaks and the one global timeline ==")
    val gap = 1800000L
    val sessions = ops.Windowed.sessionIds(
      ev.df.select(col("event_type"), col("user_id"), col("time"))
        .withColumn("__k", concat_ws(":", col("event_type"), col("user_id"))),
      "__k", "time", gapMs = gap)
      .groupBy(col("event_type"), col("user_id"), col("session_seq"))
      .agg(min(col("time")).as("s"), (max(col("time")) + gap).as("e"))
    ops.Windowed.concurrencySweep(sessions, "event_type", "s", "e")
      .orderBy(col("event_type")).show(truncate = false)
    ops.Windowed.concurrencySweepGlobal(sessions, "s", "e").show(truncate = false)

    println("== temperature mixture (shares ∝ sqrt(mass)) -> applied hash bands ==")
    val docTable = Tsdb.table(spark, sfDir, "documents")
    val tplan = ops.Sampling.mixturePlanTemperature(docTable, "source", "n_chars", budget = 20000L)
    tplan.orderBy(col("source")).show(5, truncate = false)
    ops.Sampling.applyMixturePlan(docTable.select(col("doc_id"), col("source")),
      tplan, "source", "doc_id")
      .groupBy(col("source")).count().orderBy(col("source")).show(5, truncate = false)

    println("== containment pairs: the quotation case Jaccard misses ==")
    val partner = docTable.select((col("doc_id") - 100L).as("doc_id"), col("text").as("t2"))
    val anthologies = docTable.select(col("doc_id"), col("text")).join(partner, "doc_id")
      .filter(col("doc_id") < 5)
      .select((col("doc_id") + 9100L).as("doc_id"),
        concat(col("text"), lit(" "), col("t2")).as("text"))
    ops.Dedup.containmentPairs(
      docTable.select(col("doc_id"), col("text")).unionByName(anthologies),
      n = 3, threshold = 0.8).show(5, truncate = false)

    println("== Count-Min point estimates vs exact (bounded counters) ==")
    ops.Sketches.cmsCounts(ev.df.select(col("user_id")), "user_id",
      probeKeys = (0L until 5L).toSeq, depth = 4, width = 64L).show(truncate = false)
  }

  /** Kept separate so the main flow reads as the pipeline story. */
  private object AsofJoinDemo {
    def run(spark: SparkSession, sfDir: String): Unit = {
      import org.apache.spark.sql.functions._
      val ev = Tsdb.events(spark, sfDir)
      val orders = Tsdb.table(spark, sfDir, "orders")
        .select(col("o_custkey").as("user_id"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("ot"), col("o_orderkey"))
      ops.AsofJoin(
        ev.df.select(col("event_id"), col("user_id"), col("time")), orders,
        Seq("user_id"), "time", "ot", Seq("o_orderkey"), "o_orderkey",
        direction = "forward", tolerance = Some(7L * 24 * 3600 * 1000))
        .filter(col("o_orderkey").isNotNull).show(3, truncate = false)
    }
  }
}
