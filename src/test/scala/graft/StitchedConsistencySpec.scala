package graft

import org.apache.spark.sql.functions._

/** Regression pin for the stitched-operator seam bug: range-partitioner
  * bounds are SAMPLED per execution, so when a stitched op's ranged frame
  * feeds two jobs (windowed rows + boundary-summary broadcast) without
  * exchange reuse, seam rows stitch against the wrong bucket's boundary —
  * a handful of silently corrupted rows per million. The ops pin ONE
  * physical partitioning via localCheckpoint; this spec drives enough rows
  * through enough partitions that the unpinned version reproducibly fails
  * (observed: 3 corrupted seams at 39k rows before the fix).
  */
class StitchedConsistencySpec extends SparkSpec {
  import spark.implicits._

  test("global concurrency sweep equals a sequential sweep on 20k random intervals") {
    val rnd = new scala.util.Random(7)
    val iv = (1 to 20000).map { i =>
      val s = rnd.nextInt(1000000).toLong
      (s, s + 1 + rnd.nextInt(5000))
    }
    val df = iv.toDF("s", "e").repartition(13)
    val out = graft.ops.Windowed.concurrencySweepGlobal(df, "s", "e").head()
    val events = iv.flatMap { case (s, e) => Seq((s, 1L), (e, -1L)) }
      .groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).sum) }
      .filter(_._2 != 0L).toSeq.sortBy(_._1)
    var run = 0L; var peak = 0L; var busy = 0L; var prev = 0L; var prevRun = 0L
    for (((t, d), i) <- events.zipWithIndex) {
      if (i > 0 && prevRun > 0) busy += t - prev
      run += d; if (run > peak) peak = run
      prev = t; prevRun = run
    }
    assert(out.getLong(0) == 20000L)
    assert(out.getLong(1) == peak, s"peak ${out.getLong(1)} vs $peak")
    assert(out.getLong(2) == busy, s"busy ${out.getLong(2)} vs $busy")
  }

  test("stitched lag has no seam corruption at 39k rows across partitions") {
    val rnd = new scala.util.Random(11)
    val ts = (1 to 39000).map(_ => rnd.nextInt(10000000).toLong).distinct.sorted
    val df = ts.toDF("t").repartition(17)
    val got = graft.ops.Windowed.lagStitched(df, Seq("t"), "t", "pt")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1)
    val naive = ts.zip(-1L +: ts.init)
    assert(got.toSeq == naive.toSeq)
  }
}
