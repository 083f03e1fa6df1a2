package graft

import org.apache.spark.sql.functions._

/** Physical-plan shape assertions: the properties that matter at 100 TB
  * (broadcasts where a side is small, column pruning reaching the scan,
  * top-k without a global sort, scalar kernels not spawning aggregations).
  * These pin the plan we designed for, not just the answer.
  */
class PlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("dimension joins broadcast the small side") {
    val p = plan("q5_nation_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("narrow text ops prune the parquet scan to the used columns") {
    val p = plan("text_stats")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p.take(1500))
    assert(!p.contains("lang")) // unused column must not be read
  }

  test("fractional hash sample is a pure filter — no exchange anywhere") {
    val df = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.ops.Sampling.fractionByHash(df, "doc_id", 0.25)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(1500))
  }

  test("unlabeled ann plan never reads the label column") {
    val p = plan("ann_ivf_topk_nolabel")
    assert(!p.contains("label"), p.take(1500))
  }

  test("range join is an equality shuffle — never a nested loop or cartesian") {
    val p = plan("range_join_events")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
    // The BETWEEN survives only as a post-join filter on an equi-join.
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q4's correlated non-equi EXISTS stays a hash/merge semi-join") {
    val p = plan("q4_late_orders")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
    // Equi part keys the join; the ship-lag bound is a join residual.
    assert(p.contains("LeftSemi"), p.take(1500))
  }

  test("new TPC-H shapes never cartesian or nested-loop (scalar one-row broadcasts excepted)") {
    for (q <- Seq("q2_min_cost_supplier", "q7_nation_volume", "q8_market_share",
        "q9_product_profit", "q12_priority_class", "q16_part_supplier_count",
        "q20_excess_suppliers")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(800)}")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: ${p.take(800)}")
    }
    // q11/q15 legitimately cross with a ONE-ROW scalar broadcast (q22's
    // shape); everything else about them must still hash-join.
    for (q <- Seq("q11_important_parts", "q15_top_supplier")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(800)}")
    }
  }

  test("q2/q20 region and dominance prunes stay semi-joins; q16 exclusion stays anti") {
    // q2's pruned per-(part, supplier) min-cost aggregate is materialized
    // ONCE since r21 (the decorrelated subquery's two consumers otherwise
    // re-ran the fact scan + both semi-joins); the region/size semi-joins
    // now run inside that materialization pass, so the FINAL plan joins
    // the materialized relation back — pin that shape: a checkpoint scan
    // feeding hash joins, never a nested loop (the semi-join semantics
    // themselves stay pinned by the shared DuckDB oracle).
    val q2 = plan("q2_min_cost_supplier")
    assert(q2.contains("ExistingRDD"))
    assert(!q2.contains("CartesianProduct") && !q2.contains("NestedLoop"))
    assert(plan("q20_excess_suppliers").contains("LeftSemi"))
    assert(plan("q16_part_supplier_count").contains("LeftAnti"))
  }

  test("profiler reads the table once for all columns") {
    val df = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.ops.Profile.columns(df, Seq("doc_id", "n_chars", "lang", "source"))
      .queryExecution.executedPlan.toString
    assert(p.sliding("FileScan".length).count(_ == "FileScan") == 1, p.take(1500))
  }

  test("snapshot diff is one full-outer hash/merge join, never a nested loop") {
    val p = plan("table_diff_snapshots")
    assert(p.contains("FullOuter"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
  }

  test("top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("sim_topk_cosine")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    val q3 = plan("q3_topk_revenue")
    assert(q3.contains("TakeOrderedAndProject"), q3.take(1500))
    val q10 = plan("q10_returned_items")
    assert(q10.contains("TakeOrderedAndProject"), q10.take(1500))
  }

  test("q19's OR-of-ANDs: dim broadcast, superset bounds pushed to both scans") {
    val p = plan("q19_brand_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
    // The derived superset bounds reach BOTH scans' pushed filters (read
    // from scan metadata — the plan string truncates the list). Catalyst
    // even factors the per-side disjunctions out of the OR itself.
    val root = SparkEntry.queries("q19_brand_revenue")(spark, dir)
      .queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case x => x
      }
    val pushedByTable = root.collectWithSubqueries {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.schema.fieldNames.head -> f.metadata("PushedFilters")
    }.toMap
    val fact = pushedByTable("l_partkey")
    assert(fact.contains("GreaterThanOrEqual(l_quantity,1.0)") &&
      fact.contains("LessThanOrEqual(l_quantity,30.0)"), fact)
    val dim = pushedByTable("p_partkey")
    assert(dim.contains("In(p_brand") && dim.contains("LessThanOrEqual(p_size,15)"),
      dim)
  }

  test("q13's outer join keeps the filter in the join condition, q21 keeps " +
      "semi+anti as hash/merge joins") {
    val q13 = plan("q13_custdist")
    // The priority filter must reach the orders scan (join-condition filter
    // on the preserved side pushes to the null-producing side's scan), and
    // the join must stay outer — a WHERE would have collapsed it.
    assert(q13.contains("LeftOuter"), q13.take(2000))
    assert(q13.contains("1-URGENT"), q13.take(2000))
    val q21 = plan("q21_waiting_supplier")
    assert(q21.contains("LeftSemi") && q21.contains("LeftAnti"), q21.take(2000))
    assert(!q21.contains("BroadcastNestedLoopJoin") && !q21.contains("CartesianProduct"),
      q21.take(2000))
    assert(q21.contains("TakeOrderedAndProject"), q21.take(2000))
  }

  test("q17's decorrelated threshold shares the partkey shuffle with the join") {
    val root = SparkEntry.queries("q17_small_qty_revenue")(spark, dir)
      .queryExecution.executedPlan
    val p = root.toString
    // Brand prune broadcasts; the threshold aggregate and the fact join key
    // on l_partkey, so at most ONE exchange hashes on l_partkey (the
    // aggregate reuses it; AQE may reuse the exchange subtree outright).
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    val partkeyExchanges = "hashpartitioning\\(l_partkey".r
      .findAllIn(p).size
    assert(partkeyExchanges <= 2, s"$partkeyExchanges partkey exchanges:\n" + p.take(3000))
  }

  test("q22's global scalar is a one-row broadcast, anti-join stays hashed") {
    val p = plan("q22_global_balance")
    assert(p.contains("LeftAnti"), p.take(2000))
    // The scalar consumes as a nested-loop CROSS against a ONE-ROW broadcast
    // (IdentityBroadcastMode) — the correct plan for a global aggregate; the
    // anti-join itself must never be the nested loop.
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin BuildRight, Cross"), p.take(2000))
    assert(!p.linesIterator.exists(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("LeftAnti")), p.take(2000))
  }

  test("gopher rule battery is one shuffle-free projection over (id, text)") {
    val df = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.ops.Text.gopherQuality(df).queryExecution.executedPlan.toString
    // Even the repetition rule (top-bigram fraction) folds row-locally.
    assert(!p.contains("Exchange"), p.take(1500))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p.take(1500))
  }

  test("simhash is a scalar projection — no aggregate before the band join") {
    import spark.implicits._
    val docs = Seq((0L, "a b c")).toDF("doc_id", "text")
    val p = docs.select(
      org.apache.spark.sql.graftfns.TextFunctions.simhash64($"text"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("HashAggregate") && !p.contains("Exchange"), p)
  }

  test("uts interval queries keep whole-stage codegen on the scan+filter+agg path") {
    // AQE prints codegen spans only once the final plan is materialized.
    val df = SparkEntry.queries("uts_interval_mean")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // Codegen'd operators print as `*(n) Op` in the finalized plan.
    assert(p.contains("*(") , p.take(1500))
    // The time bound must reach the parquet scan through the raw stored
    // column — as a bare GreaterThan on a ns-Long corpus, or inside the
    // null-admitting Or on a timestamp corpus (RawTime).
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts") ||
      p.contains("PushedFilters: [IsNotNull(ts), Or(IsNull(ts),GreaterThanOrEqual(ts"),
      p.take(3000))
  }

  test("pair pipelines sort report output in one partition (no resampling range sort)") {
    for (q <- Seq("dedup_jaccard_pairs", "sim_pairs_threshold", "asof_join_orders",
        // Per-document gate outputs: a range sort's boundary sampling would
        // re-execute the narrow scan (or the multimodal decode pipeline).
        "text_stats", "text_bpe_stats", "text_quality", "text_fingerprint",
        "text_rolling_fp", "multimodal_features", "uts_map_series",
        // The derivative grid sorts via smallResult, and its stitched lag
        // must not reintroduce a range exchange on the data path.
        // (doc_pack_budget is excluded: runningSumStitched's range
        // REPARTITIONING is the prefix-sum's one legitimate range exchange.)
        "uts_derivative", "uts_derivative_by_user",
        // Report-sized round-4 outputs sort via smallResult too.
        "retention_cohorts", "pivot_event_daily", "contamination_check",
        "dedup_srp_pairs",
        // Round-6 gates: per-doc/report outputs must keep the same posture.
        "text_redact", "ngram_contamination", "repeated_ngram_spans",
        "dedup_semantic", "sample_diversity", "mixture_apply")) {
      val p = plan(q)
      // A range sort would appear as Exchange rangepartitioning(...); the
      // report-sort shape is a single-partition exchange + in-partition Sort.
      assert(!p.contains("rangepartitioning"), s"$q:\n${p.take(1500)}")
    }
  }

  test("pair kernels build their plans without driver-side jobs (no collect)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    import spark.implicits._
    val vecs = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    org.apache.spark.GraftTestBus.waitUntilEmpty(spark.sparkContext)
    spark.sparkContext.addSparkListener(l)
    try {
      // In-memory input so the only jobs possible are the kernel's own
      // (parquet gate queries run a footer-read job at construction).
      graft.ops.Similarity.pairsAbove(vecs, 0.5).queryExecution.executedPlan
      graft.ops.Dedup.embeddingNearDups(vecs, 0.5).queryExecution.executedPlan
      org.apache.spark.GraftTestBus.waitUntilEmpty(spark.sparkContext)
      // The old kernel collect()ed the corpus at plan-CONSTRUCTION time; the
      // block-grid kernel must be lazy end to end.
      assert(jobs.get() == 0, s"plan construction ran ${jobs.get()} job(s)")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("tfidf builds its plan without driver-side jobs (corpus N is in-plan)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    import spark.implicits._
    val docs = Seq((0L, "a b"), (1L, "b c")).toDF("doc_id", "text")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    org.apache.spark.GraftTestBus.waitUntilEmpty(spark.sparkContext)
    spark.sparkContext.addSparkListener(l)
    try {
      // The old implementation ran df.count() at construction time; N must
      // now be a broadcast scalar inside the one plan.
      graft.ops.Text.tfidfTopTerms(docs, 5).queryExecution.executedPlan
      org.apache.spark.GraftTestBus.waitUntilEmpty(spark.sparkContext)
      assert(jobs.get() == 0, s"plan construction ran ${jobs.get()} job(s)")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("tfidf plan has exactly one aggregation exchange (TermCounts folds per-doc counts)") {
    import spark.implicits._
    val docs = Seq((0L, "a b a"), (1L, "b c")).toDF("doc_id", "text")
    val p = graft.ops.Text.tfidfTopTerms(docs, 5).queryExecution.executedPlan
    // The per-(doc, term) aggregation is gone: the per-term rollup's shuffle
    // is the only hash exchange in the plan (corpus-N arrives via a
    // single-partition global agg + broadcast, and the top-k is a
    // TakeOrderedAndProject — no extra hash partitioning anywhere). String
    // match because AQE's executed plan doesn't expose children to collect.
    val nShuffles = "Exchange hashpartitioning".r.findAllIn(p.toString).length
    assert(nShuffles == 1, s"expected 1 hash-partitioning exchange, got $nShuffles:\n$p")
  }

  test("new aggregate queries prune the events scan to used columns") {
    // salted agg reads (event_type, value); sessions read (ts, event_type,
    // value) — neither may drag props/user_id through the shuffle.
    for ((q, banned) <- Seq(
        "salted_agg_by_type" -> Seq("props", "user_id"),
        "session_counts_by_type" -> Seq("props", "user_id"))) {
      val p = plan(q)
      for (c <- banned) assert(!p.contains(c), s"$q reads $c:\n${p.take(1200)}")
    }
  }

  test("pair kernel plan has no cartesian/broadcast-nested-loop join") {
    val p = plan("sim_pairs_threshold")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
  }

  test("q6 predicates all reach the parquet scan") {
    // The plan's toString truncates PushedFilters; read the scan node's
    // metadata directly for the untruncated list.
    val root = SparkEntry.queries("q6_revenue")(spark, dir)
      .queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
    val scans = root.collectWithSubqueries {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val pushed = scans.head.metadata("PushedFilters")
    for (f <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
        "LessThan(l_quantity"))
      assert(pushed.contains(f), s"missing pushed filter $f in: $pushed")
    // Only the four referenced columns may be read.
    val p = plan("q6_revenue")
    assert(!p.contains("l_orderkey") && !p.contains("l_returnflag"), p.take(2500))
  }

  test("salted join honors the shuffle-hash shape (no broadcast of the dim)") {
    val p = plan("join_skew_salted")
    assert(p.contains("ShuffledHashJoin"), p.take(2000))
  }

  test("bloom semi-join builds its bitmap lazily (zero jobs at construction)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    import spark.implicits._
    val l0 = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val b0 = Seq(Tuple1(1L)).toDF("bk")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    org.apache.spark.GraftTestBus.waitUntilEmpty(spark.sparkContext)
    spark.sparkContext.addSparkListener(l)
    try {
      graft.ops.Joins.bloomSemiJoin(l0, b0, "k", "bk").queryExecution.executedPlan
      org.apache.spark.GraftTestBus.waitUntilEmpty(spark.sparkContext)
      assert(jobs.get() == 0, s"plan construction ran ${jobs.get()} job(s)")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("contamination and mixture apply broadcast their small sides") {
    // Eval-split grams / the k-row plan table broadcast; the corpus side
    // must never reach a sort-merge join.
    for (q <- Seq("ngram_contamination", "mixture_apply")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q:\n${p.take(2000)}")
    }
  }

  test("mixture plan never reads the text column; redact reads only id+text") {
    val mix = plan("mixture_plan")
    assert(!mix.contains("text:string"), mix.take(1500))
    val red = plan("text_redact")
    assert(!red.contains("lang") && !red.contains("source"), red.take(1500))
  }

  test("funnel step scans push the event-type filter down") {
    val p = plan("funnel_steps")
    assert(p.contains("EqualTo(event_type,signup)"), p.take(3000))
    assert(p.contains("EqualTo(event_type,purchase)"), p.take(3000))
  }

  test("report windows run inside an explicit partition (no empty window spec)") {
    // An empty partitionSpec sends WindowExec down its move-everything-to-one-
    // partition warning path; report windows state the single frame explicitly,
    // and per-key operators must actually partition by the key.
    for (q <- Seq("moving_avg_daily", "uts_derivative_by_user")) {
      val wins = SparkEntry.queries(q)(spark, dir).queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w.partitionSpec
      }
      assert(wins.nonEmpty && wins.forall(_.nonEmpty), s"$q: $wins")
    }
  }

  test("robust outliers and concurrency sweep partition every window by the key") {
    // Rank-statistic medians and the sweep's running sum are key-partitioned
    // windows — a single-partition fallback here would serialize the whole
    // corpus through one task at 100 TB.
    for (q <- Seq("robust_outliers_value", "concurrency_sweep")) {
      val wins = SparkEntry.queries(q)(spark, dir).queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w.partitionSpec
      }
      assert(wins.nonEmpty && wins.forall(_.nonEmpty), s"$q: $wins")
    }
  }

  test("containment pairs join on shingle-hash equality — never a cartesian") {
    val p = plan("dedup_containment")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"), p.take(1500))
  }

  test("PQ family never plans an empty-partition window (seed pick is a top-k limit)") {
    // pqBlocks once ranked the whole corpus through Window.orderBy to pick
    // k seeds — one task sorting every vector at 100 TB. Seeds now come
    // from orderBy+limit (TakeOrderedAndProject); no window may be global.
    for (q <- Seq("pq_adc_topk", "ann_ivfpq_topk", "ann_ivfpq_recall")) {
      val wins = SparkEntry.queries(q)(spark, dir).queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w.partitionSpec
      }
      assert(wins.forall(_.nonEmpty), s"$q: $wins")
    }
  }

  test("persisted-PQ probes fold broadcast LUTs; rerank broadcasts its shortlist") {
    // Probe-time plans must be broadcast-only on the join side: the m LUT
    // frames are k-row broadcasts folded into the codes scan, and rerank's
    // stage-2 joins a C-row broadcast shortlist into the embedding source —
    // nothing corpus-sized may shuffle or sort-merge at probe time.
    for (q <- Seq("pq_persisted_topk", "ann_ivfpq_persisted", "ann_ivfpq_rerank")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q: ${p.take(1500)}")
      assert(p.contains("BroadcastHashJoin"), s"$q: ${p.take(1500)}")
      assert(!p.contains("SortMergeJoin"), s"$q: ${p.take(1500)}")
    }
  }

  test("temperature mixture plan reads only source and count columns") {
    val p = plan("mixture_temperature")
    assert(!p.contains("text"), p.take(1500)) // never drags the payload
    assert(p.contains("ReadSchema: struct<source:string,n_chars:bigint>"), p.take(1500))
  }

  test("graph-family plans: no cartesian/nested loop; the kNN candidate join is hashed") {
    // knn_graph: within-cluster candidates via the SHUFFLE_HASH equality
    // self-join, per-source rank — never an all-pairs product.
    val knn = plan("knn_graph")
    assert(!knn.contains("CartesianProduct"), knn.take(1500))
    assert(knn.contains("ShuffledHashJoin"), knn.take(1500))
    // pagerank / negatives read the persisted edge parquet (the build runs
    // once per JVM before planning) and must stay product-free; the
    // negatives' pool side is a broadcast, never a corpus x corpus join.
    for (q <- Seq("graph_pagerank", "contrastive_negatives")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(1500)}")
    }
    val neg = plan("contrastive_negatives")
    assert(neg.contains("BroadcastNestedLoopJoin") || neg.contains("BroadcastHashJoin"),
      neg.take(1500)) // anchors x broadcast pool — the bounded side ships, not the corpus
  }

  test("shard manifest is one aggregation, no global sort, no text read") {
    val p = plan("export_shards")
    assert(!p.contains("text"), p.take(1500)) // weight column only
    assert(!p.contains("rangepartitioning"), p.take(2000)) // membership is hash-mod, not rank
  }

  test("span-pair dedup joins on the span hash only — no array or text shuffle") {
    val p = plan("dedup_span_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
    assert(p.contains("ShuffledHashJoin"), p.take(1500))
  }
}
