package graft.uts

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OrderedFoldSpec extends SparkSpec {
  import spark.implicits._

  // Shuffled insertion: rows arrive out of time order on purpose.
  private def df = Seq(
    (900L, 3L, 3.0), (600L, 0L, 0.0), (1000L, 4L, 4.0), (700L, 1L, 1.0), (800L, 2L, 2.0)
  ).toDF("time", "seq", "v").repartition(4)

  test("ordered fold reproduces a non-commutative sequential reduce") {
    // acc*2 + v is order-sensitive: over v=0,1,2,3,4 in time order = 26.
    val out = df.agg(
      OrderedFold.foldDouble(0.0, (acc, v) => acc * 2 + v)(col("time"), col("seq"), col("v"))
        .as("folded")).head().getDouble(0)
    assert(out == 26.0)
  }

  test("fold fails loud when a group buffers past maxGroupRows") {
    // The O(group size) caveat as contract: a 5-row group against a 3-row
    // bound must throw with the bound and the buffered time range, not OOM.
    val e = intercept[org.apache.spark.SparkException] {
      df.agg(OrderedFold.foldDouble(0.0, _ + _, maxGroupRows = 3L)(
        col("time"), col("seq"), col("v"))).head()
    }
    val msg = Option(e.getCause).fold(e.getMessage)(_.getMessage)
    assert(msg.contains("maxGroupRows=3"))
    // At-or-under the bound still folds.
    val ok = df.limit(3).agg(OrderedFold.foldDouble(0.0, _ + _, maxGroupRows = 3L)(
      col("time"), col("seq"), col("v"))).head().getDouble(0)
    assert(!ok.isNaN)
    // A nonsensical bound is rejected at plan time.
    intercept[IllegalArgumentException] {
      OrderedFold.foldDouble(0.0, _ + _, maxGroupRows = 0L)(
        col("time"), col("seq"), col("v"))
    }
  }

  test("fold reproduces the reference's seed-0 max (quirk Q1 exact replica)") {
    // The reference's max folds Math.max from seed 0 (uts.ts:592-594) — the
    // user-fold surface can replicate the quirk our Metric algebra deviates from.
    val allNeg = Seq((1L, 0L, -5.0), (2L, 1L, -3.0)).toDF("time", "seq", "v")
    val out = allNeg.agg(
      OrderedFold.foldDouble(0.0, (acc, v) => math.max(acc, v))(col("time"), col("seq"), col("v")))
      .head().getDouble(0)
    assert(out == 0.0) // seed-0 quirk, not -3
  }

  test("generic payload: string fold concatenates in (time, seq) order") {
    // The reference's reduce(fn, initial) folds arbitrary values
    // (uts.ts:416-434) — here a non-numeric accumulator over a string column.
    val words = Seq(
      (900L, 3L, "d"), (600L, 0L, "a"), (1000L, 4L, "e"), (700L, 1L, "b"), (800L, 2L, "c")
    ).toDF("time", "seq", "w").repartition(4)
    val out = words.agg(
      OrderedFold.fold[String, String, String](
        "", (acc, w) => acc + w, identity, org.apache.spark.sql.Encoders.STRING)(
        col("time"), col("seq"), col("w")).as("folded")).head().getString(0)
    assert(out == "abcde")
  }

  test("generic payload: fold into a non-scalar accumulator (min,max pair)") {
    val out = df.agg(
      OrderedFold.fold[Double, (Double, Double), Double](
        (Double.MaxValue, Double.MinValue),
        (acc, v) => (math.min(acc._1, v), math.max(acc._2, v)),
        acc => acc._2 - acc._1,
        org.apache.spark.sql.Encoders.scalaDouble)(
        col("time"), col("seq"), col("v"))).head().getDouble(0)
    assert(out == 4.0) // max 4.0 − min 0.0
  }

  test("map(fn) metric applies a lambda per point, ordered, inside interval bins") {
    // A NON-numeric column through an arbitrary closure — the reference's
    // Mapper surface (uts.ts:562-571) beyond what column expressions cover.
    val words = Seq(
      (900L, 3L, "dd"), (600L, 0L, "a"), (1000L, 4L, "eee"), (700L, 1L, "bb"), (800L, 2L, "c")
    ).toDF("time", "seq", "w").repartition(4)
    val s = UtsSeries(words, timeCol = "time", seqCol = Some("seq"))
    val out = s.query(UtsQuery(
      Seq("mapped" -> OrderedFold.mapMetric[String, String](
        "w", w => s"${w.toUpperCase}:${w.length}", newSequenceEncoder)),
      group = IntervalGroup(250, fill = false, 1000L)))
      .collect().map(r => (r.getLong(0), r.getSeq[String](2).toList))
    // (750,1000] → c, dd, eee in time order; (500,750] → a, bb.
    assert(out.toSeq == Seq(
      (750L, List("C:1", "DD:2", "EEE:3")),
      (500L, List("A:1", "BB:2"))))
  }

  test("fold works per interval bin through the Metric adapter") {
    val s = UtsSeries(df, timeCol = "time", seqCol = Some("seq"))
    val out = s.query(UtsQuery(
      Seq("folded" -> OrderedFold.metric("v", 0.0, (acc, v) => acc * 2 + v)),
      group = IntervalGroup(250, fill = false, 1000L)))
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // Bins as in GoldenSpec: (750,1000]→v=2,3,4 fold=2*4+... = ((0*2+2)*2+3)*2+4 = 18
    // (500,750]→v=0,1 fold= (0*2+0)*2+1 = 1
    assert(out.toSeq == Seq((750L, 18.0), (500L, 1.0)))
  }

  test("metric skips NULL values instead of crashing (missing-column rows)") {
    // The uts insert model leaves missing columns NULL; the fold must skip
    // them like every built-in aggregate (the reference's NaN-poisoning is
    // the opt-in Quirk surface).
    val withNulls = Seq(
      (100L, 1L, Some(2.0)), (200L, 2L, None), (300L, 3L, Some(5.0))
    ).toDF("time", "seq", "v")
    val out = UtsSeries(withNulls, timeCol = "time", seqCol = Some("seq"))
      .query(UtsQuery(Seq("s" -> OrderedFold.metric("v", 0.0, _ + _))))
      .head().getDouble(0)
    assert(out == 7.0)
  }
}
