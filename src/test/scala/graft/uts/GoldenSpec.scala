package graft.uts

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}

/** 1:1 port of the reference's mocha suite (`/root/reference/test.js`) with
  * the fake clock (`sinon.useFakeTimers(1000)`, test.js:14-18) replaced by an
  * explicit `now = 1000` ms parameter. Fixtures per FIXTURES.md §A.
  */
class GoldenSpec extends SparkSpec {
  import spark.implicits._

  val now = 1000L

  // Series a: 5 points at 100 ms spacing ending at now (test.js:19-24).
  def a: DataFrame =
    Seq((600L, 0.0, 0.0), (700L, 1.0, 2.0), (800L, 2.0, 4.0), (900L, 3.0, 6.0), (1000L, 4.0, 8.0))
      .toDF("time", "my_col1", "my_col2")
  // Series b: squares (test.js:25-29).
  def b: DataFrame =
    Seq((600L, 0.0), (700L, 1.0), (800L, 4.0), (900L, 9.0), (1000L, 16.0))
      .toDF("time", "my_col1")
  // Series q: empty (test.js:130-136).
  def q: DataFrame = Seq.empty[(Long, Double)].toDF("time", "my_col1")

  def series(df: DataFrame) = UtsSeries(df)

  test("map() over a column (test.js:34-46)") {
    val out = series(a).query(UtsQuery(Seq("data" -> MapCol("my_col1")))).collect()
    assert(out.length == 1)
    assert(out(0).getSeq[Double](0) == Seq(0.0, 1.0, 2.0, 3.0, 4.0))
  }

  test("map() over a second column (test.js:47-57)") {
    val out = series(a).query(UtsQuery(Seq("data" -> MapCol("my_col2")))).collect()
    assert(out(0).getSeq[Double](0) == Seq(0.0, 2.0, 4.0, 6.0, 8.0))
  }

  test("mean() (test.js:60-70)") {
    val out = series(a).query(UtsQuery(Seq("mean" -> Mean("my_col1")))).collect()
    assert(out(0).getDouble(0) == 2.0)
  }

  test("max() (test.js:72-82)") {
    val out = series(a).query(UtsQuery(Seq("max" -> MaxM("my_col1")))).collect()
    assert(out(0).getDouble(0) == 4.0)
  }

  test("min() (test.js:84-94)") {
    val out = series(a).query(UtsQuery(Seq("min" -> MinM("my_col1")))).collect()
    assert(out(0).getDouble(0) == 0.0)
  }

  test("last() with interval grouping (test.js:138-154)") {
    val out = series(a)
      .query(UtsQuery(Seq("last" -> Last("my_col1")), group = IntervalGroup(250, fill = false, now)))
      .collect()
    assert(out.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))) ==
      Seq((750L, 250L, 4.0), (500L, 250L, 1.0)))
  }

  test("time-shifted interval grouper (test.js:174-190)") {
    val out = series(a)
      .query(UtsQuery(Seq("data" -> MapCol("my_col1")), group = IntervalGroup(250, fill = false, now - 100)))
      .collect()
    assert(out.toSeq.map(r => (r.getLong(0), r.getSeq[Double](2))) ==
      Seq((650L, Seq(1.0, 2.0, 3.0)), (400L, Seq(0.0))))
  }

  test("interval grouping (test.js:192-208)") {
    val out = series(a)
      .query(UtsQuery(Seq("data" -> MapCol("my_col1")), group = IntervalGroup(250, fill = false, now)))
      .collect()
    assert(out.toSeq.map(r => (r.getLong(0), r.getSeq[Double](2))) ==
      Seq((750L, Seq(2.0, 3.0, 4.0)), (500L, Seq(0.0, 1.0))))
  }

  test("interval grouping bounded by where time > (test.js:210-231)") {
    val out = series(a)
      .query(UtsQuery(
        Seq("data" -> MapCol("my_col1")),
        where = Seq(Pred.gt("time", now - 300)),
        group = IntervalGroup(100, fill = false, now)))
      .collect()
    assert(out.toSeq.map(r => (r.getLong(0), r.getSeq[Double](2))) ==
      Seq((900L, Seq(4.0)), (800L, Seq(3.0)), (700L, Seq(2.0))))
  }

  test("interval grouping with future-only bound yields empty (test.js:233-241)") {
    val out = series(a)
      .query(UtsQuery(
        Seq("data" -> MapCol("my_col1")),
        where = Seq(Pred.gt("time", now)),
        group = IntervalGroup(100, fill = false, now)))
      .collect()
    assert(out.isEmpty)
  }

  test("single where clause (test.js:243-256)") {
    val out = series(a)
      .query(UtsQuery(Seq("data" -> MapCol("my_col1")), where = Seq(Pred.gt("time", now - 300))))
      .collect()
    assert(out(0).getSeq[Double](0) == Seq(2.0, 3.0, 4.0))
  }

  test("multiple where clauses AND together (test.js:258-276)") {
    val out = series(a)
      .query(UtsQuery(
        Seq("data" -> MapCol("my_col1")),
        where = Seq(Pred.gt("time", now - 300), Pred.lt("time", now))))
      .collect()
    assert(out(0).getSeq[Double](0) == Seq(2.0, 3.0))
  }

  test("remove() drops all data (test.js:278-291)") {
    val out = series(a).remove()
      .query(UtsQuery(Seq("total" -> CountM())))
      .collect()
    assert(out(0).getLong(0) == 0L)
  }

  test("remove() by clause keeps non-matching rows (test.js:293-312)") {
    val out = series(a)
      .remove(Seq(Pred.gt("time", now - 300), Pred.lt("time", now)))
      .query(UtsQuery(Seq("time" -> MapCol("time"))))
      .collect()
    assert(out(0).getSeq[Long](0) == Seq(600L, 700L, 1000L))
  }

  // ---- Beyond the ported suite: fill, empties, multi-metric, quirks ----

  test("zero-fill emits empty bins with per-metric fill values (Q2/Q9)") {
    val out = series(a)
      .query(UtsQuery(
        Seq("mean" -> Mean("my_col1"), "n" -> CountM(), "mx" -> MaxM("my_col1")),
        where = Seq(Pred.gt("time", 500L)),
        group = IntervalGroup(100, fill = true, now)))
      .collect()
    // count = floor((1000-500)/100)+1 = 6 bins, newest first.
    assert(out.length == 6)
    assert(out.map(_.getLong(0)).toSeq == Seq(900L, 800L, 700L, 600L, 500L, 400L))
    val empty = out(5) // (400,500] holds no points
    assert(empty.getDouble(2) == 0.0) // mean fills 0 (Q2)
    assert(empty.getLong(3) == 0L)    // count fills 0
    assert(empty.isNullAt(4))         // max fills NULL (Q1 standard decision)
    assert(out(0).getDouble(2) == 4.0 && out(0).getLong(3) == 1L)
  }

  test("zero-fill without a time bound derives the spine from min(time)") {
    val out = series(a)
      .query(UtsQuery(Seq("n" -> CountM()), group = IntervalGroup(250, fill = true, now)))
      .collect()
    // start = first point (600): count = floor(400/250)+1 = 2 bins.
    assert(out.toSeq.map(r => (r.getLong(0), r.getLong(2))) == Seq((750L, 3L), (500L, 2L)))
  }

  test("zero-fill casts each fill literal to the metric's aggregated type (emptyValue(dt) path)") {
    // An INTEGER-typed column: Sum aggregates to LONG (fill literal 0L cast
    // to long) and MapCol to ARRAY<INT> (fill literal array() cast to the
    // element type) — the coalesce in the fill-join must adopt the
    // aggregated side's type for every metric, or the join's schema drifts
    // from the unfilled bins'.
    val ints = Seq((600L, 1), (700L, 2), (1000L, 4)).toDF("time", "iv")
    val out = series(ints)
      .query(UtsQuery(
        Seq("s" -> SumM("iv"), "vals" -> MapCol("iv")),
        where = Seq(Pred.gt("time", 500L)),
        group = IntervalGroup(100, fill = true, now)))
    val schema = out.schema
    assert(schema("s").dataType == org.apache.spark.sql.types.LongType, schema)
    assert(schema("vals").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == org.apache.spark.sql.types.IntegerType, schema)
    val rows = out.collect()
    assert(rows.length == 6)
    val filled = rows(2) // (700,800]: no points
    assert(filled.getLong(2) == 0L, filled)
    assert(filled.getSeq[Int](3) == Seq.empty, filled)
    val populated = rows(0) // (900,1000]: the iv=4 point
    assert(populated.getLong(2) == 4L && populated.getSeq[Int](3) == Seq(4))
  }

  test("empty series + interval + no bound yields empty, not a crash (Q8-S)") {
    val out = series(q)
      .query(UtsQuery(Seq("n" -> CountM()), group = IntervalGroup(250, fill = true, now)))
      .collect()
    assert(out.isEmpty)
  }

  test("empty series global aggregates: mean 0, sum 0, count 0 (uts seeds)") {
    val out = series(q)
      .query(UtsQuery(Seq(
        "mean" -> Mean("my_col1"), "sum" -> SumM("my_col1"),
        "n" -> CountM(), "mx" -> MaxM("my_col1"), "lst" -> Last("my_col1"))))
      .collect()
    val r = out(0)
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0 && r.getLong(2) == 0L)
    assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("last keeps a NULL on the final point (uts.ts:613-617 reduce semantics)") {
    // The reference's last is reduce((x, pt) => pt.get(column), null): the
    // final point's value wins even when the column is missing there. Spark's
    // max_by keeps the value at the max key, NULL included — pinned here
    // because DuckDB's arg_max would SKIP the null (oracles therefore use
    // row_number windows, not arg_max, wherever a last-value can be null).
    val withNullLast = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(600L, 5.0), Row(700L, 2.0), Row(800L, null))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("time", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("my_col1", org.apache.spark.sql.types.DoubleType))))
    val out = UtsSeries(withNullLast)
      .query(UtsQuery(Seq("lst" -> Last("my_col1"))))
      .collect()
    assert(out(0).isNullAt(out(0).fieldIndex("lst")))
  }

  test("count(col) counts only rows having the column (uts.ts:631-641)") {
    val withNulls = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(600L, 1.0), Row(700L, null), Row(800L, 3.0))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("time", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("my_col1", org.apache.spark.sql.types.DoubleType))))
    val out = UtsSeries(withNulls)
      .query(UtsQuery(Seq(
        "all" -> CountM(), "col" -> CountM(Some("my_col1")), "mean" -> Mean("my_col1"))))
      .collect()
    assert(out(0).getLong(0) == 3L)
    assert(out(0).getLong(1) == 2L)
    assert(out(0).getDouble(2) == 2.0) // Average skips missing (uts.ts:446-451)
  }

  test("retention keeps rows within ttl (uts.ts:250-269)") {
    val out = series(a).retain(ttlMs = 300, nowMs = now)
      .query(UtsQuery(Seq("time" -> MapCol("time"))))
      .collect()
    assert(out(0).getSeq[Long](0) == Seq(700L, 800L, 900L, 1000L))
  }

  test("equality predicate is typed equality (Q5)") {
    val out = series(a)
      .query(UtsQuery(Seq("n" -> CountM()), where = Seq(Pred.eq("my_col1", 2.0))))
      .collect()
    assert(out(0).getLong(0) == 1L)
  }
}
