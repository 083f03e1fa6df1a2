package graft.uts

import graft.SparkSpec

/** Opt-in quirk-replica metrics vs the reference's fold-from-0 aggregates
  * (uts.ts:592-601, 622-624) — and vs our standard-semantics defaults, so
  * the deviation each replica exists for is pinned in one place.
  */
class QuirkSpec extends SparkSpec {
  import spark.implicits._

  test("quirk max/min clamp at the 0 seed; standard metrics do not") {
    val allNeg = Seq((1L, 0L, -5.0), (2L, 1L, -3.0)).toDF("time", "seq", "v")
    val s = UtsSeries(allNeg, timeCol = "time", seqCol = Some("seq"))
    val out = s.query(UtsQuery(
      Seq("qmax" -> Quirk.max("v"), "qmin" -> Quirk.min("v"),
        "smax" -> MaxM("v"), "smin" -> MinM("v")),
      group = AnyGroup)).head()
    assert(out.getDouble(0) == 0.0)  // Math.max folded from 0
    assert(out.getDouble(1) == -5.0) // Math.min: seed 0 above all values
    assert(out.getDouble(2) == -3.0) // standard max
    assert(out.getDouble(3) == -5.0) // standard min
    // Positive data: quirk min is capped at <= 0 even when every value > 0.
    val allPos = Seq((1L, 0L, 5.0), (2L, 1L, 3.0)).toDF("time", "seq", "v")
    val p = UtsSeries(allPos, timeCol = "time", seqCol = Some("seq"))
      .query(UtsQuery(Seq("qmin" -> Quirk.min("v")), group = AnyGroup)).head()
    assert(p.getDouble(0) == 0.0)
  }

  test("quirk sum/max NaN-poison on a point missing the column; standard skip it") {
    val withMissing = Seq(
      (1L, 0L, Some(2.0)), (2L, 1L, None), (3L, 2L, Some(4.0))
    ).toDF("time", "seq", "v")
    val s = UtsSeries(withMissing, timeCol = "time", seqCol = Some("seq"))
    val out = s.query(UtsQuery(
      Seq("qsum" -> Quirk.sum("v"), "qmax" -> Quirk.max("v"), "ssum" -> SumM("v")),
      group = AnyGroup)).head()
    assert(out.getDouble(0).isNaN) // 2 + undefined + 4 = NaN
    assert(out.getDouble(1).isNaN)
    assert(out.getDouble(2) == 6.0) // standard null-skipping sum
  }

  test("quirk min/max/sum NaN-poison on NaN VALUES, not just missing columns") {
    // Math.min(NaN, x) = NaN in the reference; Spark's min orders NaN as the
    // LARGEST double and would silently skip it — the replica must not.
    val withNaN = Seq((1L, 0L, Double.NaN), (2L, 1L, 5.0)).toDF("time", "seq", "v")
    val s = UtsSeries(withNaN, timeCol = "time", seqCol = Some("seq"))
    val out = s.query(UtsQuery(
      Seq("qmin" -> Quirk.min("v"), "qmax" -> Quirk.max("v"), "qsum" -> Quirk.sum("v")),
      group = AnyGroup)).head()
    assert(out.getDouble(0).isNaN && out.getDouble(1).isNaN && out.getDouble(2).isNaN)
  }

  test("quirk metrics report the bare 0 seed on empty and zero-filled bins") {
    val df = Seq((600L, 0L, 1.0)).toDF("time", "seq", "v")
    val s = UtsSeries(df, timeCol = "time", seqCol = Some("seq"))
    // fill=true with now=1000, width=250: bins (750,1000] empty-filled.
    val out = s.query(UtsQuery(
      Seq("qsum" -> Quirk.sum("v"), "qmax" -> Quirk.max("v")),
      group = IntervalGroup(250, fill = true, 1000L)))
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    val empty = out.filter(_._1 == 750L)
    assert(empty.toSeq == Seq((750L, 0.0, 0.0)))
    assert(out.filter(_._1 == 500L).toSeq == Seq((500L, 1.0, 1.0)))
  }
}
