package graft.uts

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.util.Random

/** Randomized (fixed-seed, deterministic) properties: the engine must agree
  * with a naive in-memory evaluation of the reference semantics on arbitrary
  * data — missing values, duplicate timestamps, random bounds included.
  */
class PropertySpec extends SparkSpec {

  private case class Pt(t: Long, seq: Long, v: Option[Double])

  private def mkDf(pts: Seq[Pt]) = {
    val rows = pts.map(p => Row(p.t, p.seq, p.v.map(Double.box).orNull))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("time", LongType), StructField("seq", LongType),
        StructField("v", DoubleType))))
  }

  private def genPts(rnd: Random, n: Int): Seq[Pt] =
    (0 until n).map { i =>
      Pt(rnd.between(0L, 2000L), i.toLong,
        if (rnd.nextInt(5) == 0) None else Some(rnd.between(-100, 100).toDouble))
    }

  test("interval metrics agree with naive evaluation on random data") {
    for (trial <- 0 until 12) {
      val rnd = new Random(42 + trial)
      val pts = genPts(rnd, rnd.between(0, 60))
      val now = rnd.between(500L, 2500L)
      val width = rnd.between(50L, 400L)
      val out = UtsSeries(mkDf(pts), "time", Some("seq"))
        .query(UtsQuery(
          Seq("mean" -> Mean("v"), "sum" -> SumM("v"), "n" -> CountM(),
            "nv" -> CountM(Some("v")), "mx" -> MaxM("v"), "lst" -> Last("v")),
          group = IntervalGroup(width, fill = false, now)))
        .collect()
        .map(r => (r.getLong(0),
          (r.getDouble(2), r.getDouble(3), r.getLong(4), r.getLong(5),
            if (r.isNullAt(6)) None else Some(r.getDouble(6)),
            if (r.isNullAt(7)) None else Some(r.getDouble(7)))))
        .toMap

      val naive = pts.filter(_.t <= now)
        .groupBy(p => (now - p.t) / width)
        .map { case (k, ps) =>
          val vs = ps.flatMap(_.v)
          val lastP = ps.maxBy(p => (p.t, p.seq))
          (now - (k + 1) * width,
            (if (vs.isEmpty) 0.0 else vs.sum / vs.size,
              vs.sum,
              ps.size.toLong, vs.size.toLong,
              if (vs.isEmpty) None else Some(vs.max),
              lastP.v))
        }
      assert(out == naive, s"trial $trial now=$now width=$width pts=$pts")
    }
  }

  test("zero-filled bins tile (bound, now] exactly, newest first") {
    for (trial <- 0 until 8) {
      val rnd = new Random(1000 + trial)
      val pts = genPts(rnd, rnd.between(1, 40))
      val now = rnd.between(1000L, 2500L)
      val width = rnd.between(50L, 300L)
      val bound = now - rnd.between(1L, 1500L)
      val rows = UtsSeries(mkDf(pts), "time", Some("seq"))
        .query(UtsQuery(Seq("n" -> CountM()),
          where = Seq(Pred.gt("time", bound)),
          group = IntervalGroup(width, fill = true, now)))
        .collect()
      val expectedBins = (now - bound) / width + 1
      assert(rows.length == expectedBins, s"trial $trial")
      val starts = rows.map(_.getLong(0)).toSeq
      assert(starts == (0L until expectedBins).map(i => now - (i + 1) * width))
      // Total count across bins = points in (bound, now].
      val total = rows.map(_.getLong(2)).sum
      assert(total == pts.count(p => p.t > bound && p.t <= now))
    }
  }

  test("derivative deltas telescope: sum(der_value) = last - first") {
    for (trial <- 0 until 8) {
      val rnd = new Random(7 + trial)
      val n = rnd.between(2, 50)
      // Distinct times so first/last are unambiguous.
      val times = rnd.shuffle((0L until 3000L).toList).take(n).sorted
      val pts = times.zipWithIndex.map { case (t, i) => (t, i.toLong, rnd.between(-50, 50).toDouble) }
      val interval = rnd.between(20L, 500L)
      import spark.implicits._
      val df = pts.toDF("time", "seq", "v")
      val out = Derivative(df, "v", interval, "time", Nil, Some("seq"))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(math.abs(out.map(_._2).sum - (pts.last._3 - pts.head._3)) < 1e-9, s"trial $trial")
      // Emission times strictly increasing, last = max input time.
      assert(out.map(_._1).toSeq == out.map(_._1).sorted.toSeq)
      assert(out.last._1 == times.last)
    }
  }

  test("ordered fold equals naive foldLeft in (t, seq) order") {
    for (trial <- 0 until 6) {
      val rnd = new Random(99 + trial)
      val pts = (0 until rnd.between(1, 40)).map(i =>
        (rnd.between(0L, 500L), i.toLong, rnd.between(-10, 10).toDouble))
      import spark.implicits._
      val out = pts.toDF("time", "seq", "v").repartition(4)
        .agg(OrderedFold.foldDouble(1.0, (acc, v) => acc * 0.5 + v)(
          org.apache.spark.sql.functions.col("time"),
          org.apache.spark.sql.functions.col("seq"),
          org.apache.spark.sql.functions.col("v")))
        .head().getDouble(0)
      val naive = pts.sortBy(p => (p._1, p._2)).foldLeft(1.0)((acc, p) => acc * 0.5 + p._3)
      assert(math.abs(out - naive) < 1e-12, s"trial $trial")
    }
  }
}
