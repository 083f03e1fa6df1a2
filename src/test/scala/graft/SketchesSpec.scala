package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches

class SketchesSpec extends SparkSpec {

  private def users(n: Int, perUser: Int) = {
    import spark.implicits._
    (0 until n).flatMap(u => Seq.fill(perUser)(u.toLong * 17 + 3)).toDF("uid")
      .withColumn("g", lit("a"))
  }

  test("hash32 matches the murmur finalizer reference values (oracle cross-pin)") {
    import spark.implicits._
    // Expected values computed independently in DuckDB HUGEINT arithmetic —
    // this is the cross-engine contract the kmv oracle depends on.
    val got = Seq(1L, 150L, 99991L).toDF("x")
      .select(Sketches.hash32(col("x")).as("h")).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1364076727L, 3062336361L, 1776730240L), got.toSeq)
  }

  test("kmv is exact below k and invariant to partitioning and duplication") {
    val df = users(40, 3) // 40 distinct, heavy duplicates
    val r = Sketches.kmvDistinct(df, Seq("g"), "uid", 64).collect().head
    assert(r.getAs[Double]("est") == 40.0, r)
    assert(r.getAs[Int]("n_buf") == 40, r)

    val big = users(1000, 2)
    val a = Sketches.kmvDistinct(big.repartition(1), Seq("g"), "uid", 64).collect().head
    val b = Sketches.kmvDistinct(big.repartition(13), Seq("g"), "uid", 64).collect().head
    assert(a.getAs[Long]("kth") == b.getAs[Long]("kth"), s"$a vs $b")
    assert(a.getAs[Double]("est") == b.getAs[Double]("est"), s"$a vs $b")
  }

  test("kmv estimate lands within the k=64 error envelope on real keys") {
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val r = Sketches.kmvDistinct(orders, Seq.empty, "o_custkey", 64).collect().head
    val exact = orders.select(countDistinct(col("o_custkey"))).collect().head.getLong(0)
    val est = r.getAs[Double]("est")
    // 1/sqrt(k-2) ≈ 12.7% standard error; 4 sigma is a deterministic bound
    // here (fixed hash, fixed data — this pins the estimator, not luck).
    assert(math.abs(est - exact) / exact < 0.5, s"est=$est exact=$exact")
    assert(r.getAs[Int]("n_buf") == 64)
  }

  test("kmv set ops are exact while both sketches are unsaturated") {
    import spark.implicits._
    // A = {0..29}, B = {20..49}: |A∪B| = 50, |A∩B| = 10 — both below k=64,
    // so θ∧ = 2³² and every estimate is the exact count.
    val df = ((0 until 30).map(i => ("a", i.toLong)) ++
      (20 until 50).map(i => ("b", i.toLong))).toDF("g", "uid")
    val r = Sketches.kmvSetOps(df, "g", "uid", 64).collect().head
    assert(r.getAs[String]("part_a") == "a" && r.getAs[String]("part_b") == "b")
    assert(r.getAs[Double]("est_union") == 50.0, r)
    assert(r.getAs[Double]("est_intersect") == 10.0, r)
    assert(r.getAs[Long]("n_common") == 10L, r)
  }

  test("kmv set ops stay inside the error envelope once saturated, and are partition-invariant") {
    import spark.implicits._
    // A = {0..999}, B = {500..1499}: union 1500, intersection 500.
    val rows = ((0 until 1000).map(i => ("a", i.toLong * 7 + 1)) ++
      (500 until 1500).map(i => ("b", i.toLong * 7 + 1)))
    val df = rows.toDF("g", "uid")
    val r1 = Sketches.kmvSetOps(df.repartition(1), "g", "uid", 256).collect().head
    val r13 = Sketches.kmvSetOps(df.repartition(13), "g", "uid", 256).collect().head
    assert(r1.getAs[Double]("est_union") == r13.getAs[Double]("est_union"), s"$r1 vs $r13")
    assert(r1.getAs[Double]("est_intersect") == r13.getAs[Double]("est_intersect"))
    assert(math.abs(r1.getAs[Double]("est_union") - 1500.0) / 1500.0 < 0.5, r1)
    assert(math.abs(r1.getAs[Double]("est_intersect") - 500.0) / 500.0 < 0.6, r1)
  }

  test("CMS never undercounts, is exact without collisions, and bounds its sketch size") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i % 50).toLong).toDF("k") // 50 keys x 20
    // Wide sketch: 50 keys into 4x4096 buckets — no collisions at depth 4
    // with overwhelming margin for this fixed hash, so est == exact.
    val wide = Sketches.cmsCounts(df, "k", probeKeys = Seq(0L, 7L, 49L, 999L),
      depth = 4, width = 4096L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(wide.toSeq == Seq((0L, 20L, 20L), (7L, 20L, 20L), (49L, 20L, 20L),
      (999L, 0L, 0L)), wide.toSeq) // absent key: est 0, exact 0
    // Tiny sketch: heavy collisions — est >= exact for every key, always.
    val tiny = Sketches.cmsCounts(df, "k", probeKeys = (0L until 50L).toSeq,
      depth = 2, width = 8L).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(tiny.forall { case (est, exact) => est >= exact }, tiny.toSeq)
    assert(tiny.exists { case (est, exact) => est > exact }) // collisions real
    // Sketch frame is bounded by depth x width regardless of input size.
    assert(Sketches.cmsSketch(df, "k", 2, 8L).count() <= 16L)
  }

  test("CMS sketches merge by adding counts (union of halves equals the whole)") {
    import spark.implicits._
    val df = (0 until 400).map(i => (i % 23).toLong).toDF("k")
    val whole = Sketches.cmsSketch(df, "k", 3, 64L)
    val halves = Sketches.cmsSketch(df.filter(col("k") < 12), "k", 3, 64L)
      .unionByName(Sketches.cmsSketch(df.filter(col("k") >= 12), "k", 3, 64L))
      .groupBy(col("d"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
    val a = whole.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = halves.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("histogram quantiles sit within one bucket width below the exact rank statistic") {
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val r = Sketches.histQuantiles(
      orders, Seq("o_orderpriority"), "o_totalprice", width = 8192L,
      qs = Seq(0.5, 0.9)).collect()
    assert(r.length == 5)
    for (row <- r; p <- Seq("50", "90")) {
      val est = row.getAs[Long](s"est_p$p").toDouble
      val exact = row.getAs[Double](s"exact_p$p")
      // The estimate is the containing bucket's LOWER bound.
      assert(est <= exact && exact < est + 8192.0, s"$row p$p est=$est exact=$exact")
    }
  }

  test("log2 histogram quantiles bound the exact value within a factor of two") {
    val events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .select(col("event_type"), col("value"))
    val r = Sketches.histQuantilesLog2(
      events, Seq("event_type"), "value", qs = Seq(0.5)).collect()
    assert(r.length == 5)
    for (row <- r) {
      val est = row.getAs[Long]("est_p50").toDouble
      val exact = row.getAs[Double]("exact_p50")
      // est = 2^floor(log2(exact-ish)): lower bound ≤ exact < 2·bound.
      assert(est <= exact && exact < math.max(est * 2, 1.0), s"$row")
    }
  }

  test("histogram quantiles keep the lower-bound contract on negative values (floor division)") {
    import spark.implicits._
    // Values straddling zero: trunc-div would drop -0.5 into bucket 0 with
    // lower bound 0 > -0.5 — the floor-div fix pins bucket -1 (bound -10).
    val df = Seq(-15.0, -0.5, -10.0, 0.5, 3.0, 9.9, 12.0, 25.0)
      .toDF("v").withColumn("g", lit("a"))
    val r = Sketches.histQuantiles(df, Seq("g"), "v", width = 10L,
      qs = Seq(0.25, 0.5, 0.9)).collect().head
    for (p <- Seq("25", "50", "90")) {
      val est = r.getAs[Long](s"est_p$p").toDouble
      val exact = r.getAs[Double](s"exact_p$p")
      assert(est <= exact && exact < est + 10.0, s"p$p est=$est exact=$exact")
    }
  }

  test("histogram quantiles ignore NULL values on both the sketch and audit sides") {
    import spark.implicits._
    val df = Seq(Some(1.0), None, Some(5.0), None, Some(9.0))
      .toDF("v").withColumn("g", lit("a"))
    val r = Sketches.histQuantiles(df, Seq("g"), "v", 4L, Seq(0.5)).collect().head
    assert(r.getAs[Long]("n") == 3L, r) // NULLs excluded from n
    assert(r.getAs[Double]("exact_p50") == 5.0, r)
    val r2 = Sketches.histQuantilesLog2(df, Seq("g"), "v", Seq(0.5)).collect().head
    assert(r2.getAs[Long]("n") == 3L, r2)
    assert(r2.getAs[Double]("exact_p50") == 5.0, r2)
  }

  test("histogram quantile sketch is partition-invariant (mergeable counts)") {
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    def run(parts: Int) = Sketches.histQuantiles(
      orders.repartition(parts), Seq("o_orderpriority"), "o_totalprice", 8192L,
      Seq(0.5, 0.99)).collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Long]("est_p50"), r.getAs[Long]("est_p99"))).toMap
    assert(run(1) == run(17))
  }

  test("profile folds all columns into one scan-aggregate and matches naive per-column answers") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = graft.ops.Profile.columns(docs, Seq("doc_id", "lang"))
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    val n = docs.count()
    assert(p("doc_id").getAs[Long]("n_rows") == n)
    assert(p("doc_id").getAs[Long]("n_distinct") == n) // ids unique
    assert(p("doc_id").getAs[Double]("min_num") == 0.0)
    assert(p("doc_id").isNullAt(p("doc_id").fieldIndex("min_str")))
    val langs = docs.select(min(col("lang")), max(col("lang"))).collect().head
    assert(p("lang").getAs[String]("min_str") == langs.getString(0))
    assert(p("lang").getAs[String]("max_str") == langs.getString(1))
    assert(p("lang").isNullAt(p("lang").fieldIndex("min_num")))
  }

  test("snapshot diff emits exactly the planted delta and nothing for untouched keys") {
    import spark.implicits._
    val old = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "z", 3.0), (4L, "w", 4.0))
      .toDF("k", "s", "v")
    val neu = Seq((1L, "x", 1.0), (2L, "y", 9.0), (4L, "w", 4.0), (5L, "new", 5.0))
      .toDF("k", "s", "v")
    val d = graft.ops.Diff.snapshots(old, neu, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "changed", 3L -> "removed", 5L -> "added"), d)
  }

  test("snapshot diff treats NULL vs value as a change and NULL vs NULL as equal") {
    import spark.implicits._
    val old = Seq((1L, Option("a")), (2L, Option.empty[String])).toDF("k", "s")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "s")
    val d = graft.ops.Diff.snapshots(old, neu, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "changed"), d) // key 2: NULL <=> NULL, untouched
  }

  test("snapshot diff matches NULL keys null-safely instead of reporting added+removed") {
    import spark.implicits._
    val old = Seq((Option(1L), "a"), (Option.empty[Long], "x")).toDF("k", "s")
    val neu = Seq((Option(1L), "a"), (Option.empty[Long], "y")).toDF("k", "s")
    val d = graft.ops.Diff.snapshots(old, neu, Seq("k"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1))
    // The NULL-keyed row exists on both sides with a differing value: ONE
    // `changed` row, not an added/removed pair.
    assert(d.toSeq == Seq(None -> "changed"), d.toSeq)
  }

  test("hash32 kernel equals the Column-DSL reference lattice (incl. negatives and 2^32 edges)") {
    import spark.implicits._
    val ids = (Seq(-5L, -1L, 0L, 1L, 65535L, 65536L, 2246822507L,
      4294967295L, 4294967296L, 4294967297L, Long.MaxValue, Long.MinValue) ++
      (0L until 1000L).map(_ * 2654435761L)).toDF("v")
    val mismatch = ids
      .select(Sketches.hash32(col("v")).as("a"),
        Sketches.hash32Columns(col("v")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatch == 0L)
  }
}
