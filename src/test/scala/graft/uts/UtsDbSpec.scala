package graft.uts

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UtsDbSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ps: (Long, Double)*) = ps.toSeq.toDF("time", "v")

  test("get-or-create: unknown series is empty, insert rebinds, destroy clears") {
    val db = new UtsDb(spark)
    assert(db.series("a").df.count() == 0)
    db.insert("a", rows(100L -> 1.0, 200L -> 2.0))
    assert(db.series("a").df.count() == 2)
    // missing columns on later inserts become NULL (uts.ts:187-196 model)
    db.insert("a", Seq((300L, "x")).toDF("time", "tag"))
    val s = db.series("a").df.orderBy($"time").collect()
    assert(s.length == 3 && s(2).isNullAt(1))
    db.destroy()
    assert(db.series("a").df.count() == 0)
  }

  test("remove with predicates keeps non-matching and NULL-predicate rows") {
    val db = new UtsDb(spark)
    db.insert("a", rows(100L -> 1.0, 200L -> 5.0, 300L -> 9.0))
    db.remove("a", Seq(Pred.gt("v", 4.0), Pred.lt("v", 8.0)))
    assert(db.series("a").df.select($"v").as[Double].collect().sorted.toSeq == Seq(1.0, 9.0))
  }

  test("disjunction trees: OR keeps a row any alternative admits, incl. NULL OR TRUE") {
    val df = Seq[(Long, Option[Double], String)](
      (1L, Some(1.0), "a"), (2L, Some(9.0), "b"),
      (3L, None, "a"),      (4L, None, "b")
    ).toDF("id", "v", "tag")
    // (v > 5 OR tag = 'a'): row 2 via the comparator, rows 1 & 3 via the
    // tag — row 3's NULL v must not poison the disjunction (NULL OR TRUE
    // = TRUE, the reference's eval-each-then-combine result). Row 4 is
    // NULL OR FALSE = NULL → dropped.
    val kept = df.filter(
      Pred.disj(Pred.gt("v", 5.0), Pred.eq("tag", "a")).toColumn)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L))
    // Nested: conj of (disj, pred) — one filter Column, ordinary 3VL.
    val nested = df.filter(Pred.conj(Seq(
      Pred.disj(Pred.gt("v", 5.0), Pred.eq("tag", "a")), Pred.lt("id", 3L))))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(nested == Seq(1L, 2L))
    // Empty disjunction keeps nothing (OR identity); empty conjunction
    // keeps everything (AND identity).
    assert(df.filter(Or(Nil).toColumn).count() == 0L)
    assert(df.filter(Pred.conj(Nil)).count() == 4L)
    // remove() with a disjunction: drops rows the tree admits, keeps the
    // NULL-predicate row (remove's keep-on-NULL contract).
    val db = new UtsDb(spark)
    db.insert("d", df.withColumnRenamed("id", "time"))
    db.remove("d", Seq(Pred.disj(Pred.gt("v", 5.0), Pred.eq("tag", "a"))))
    assert(db.series("d").df.select($"time").as[Long].collect().sorted.toSeq == Seq(4L))
  }

  test("default retention stamps new series and binds interval queries") {
    val db = new UtsDb(spark).defaultRetention(150L)
    db.insert("a", rows(100L -> 1.0, 200L -> 2.0, 300L -> 3.0))
    // now=300, ttl=150 → keep time >= 150: points at 200 and 300.
    val out = db.query("a",
      UtsQuery(Seq("n" -> CountM()), group = IntervalGroup(100L, fill = false, 300L)))
    assert(out.agg(sum($"n")).head().getLong(0) == 2L)
    // A series created after retention is reset to 0 keeps everything.
    val db2 = new UtsDb(spark)
    db2.insert("b", rows(100L -> 1.0, 300L -> 3.0))
    val all = db2.query("b",
      UtsQuery(Seq("n" -> CountM()), group = IntervalGroup(100L, fill = false, 300L)))
    assert(all.agg(sum($"n")).head().getLong(0) == 2L)
  }

  test("retention applies to anchor-less queries via the series' newest point") {
    val db = new UtsDb(spark).defaultRetention(150L)
    db.insert("a", rows(100L -> 1.0, 200L -> 2.0, 300L -> 3.0))
    // Global group carries no time anchor; retention must still hold,
    // anchored at max(time)=300 → keep time >= 150 → 2 points.
    val out = db.query("a", UtsQuery(Seq("n" -> CountM())))
    assert(out.head().getLong(0) == 2L)
  }

  test("zero-fill spine is empty when the time bound exceeds now (floor, not trunc)") {
    // bound ∈ (now, now+width): floorDiv(now−b, w)+1 = 0 bins; Scala's
    // truncating division would emit one spurious zero-filled bin.
    val s = UtsSeries(rows(100L -> 1.0))
    val out = s.query(UtsQuery(
      Seq("n" -> CountM()),
      where = Seq(Pred.gt("time", 105L)),
      group = IntervalGroup(10L, fill = true, 100L)))
    assert(out.count() == 0L)
  }

  test("binds a corpus directory: events table resolves, unknown name is empty") {
    val db = new UtsDb(spark, dir = Some("/root/testdata/sf0.001"), timeCol = "event_id")
    assert(db.series("orders").df.count() > 0)
    assert(db.series("no_such_table").df.count() == 0)
  }

  test("corpus directory resolves through Hadoop FileSystem (scheme URIs work)") {
    // java.io.File("file:/x").exists is always false — the probe must go
    // through the path's FileSystem so HDFS/S3-style scheme URIs resolve.
    val db = new UtsDb(spark, dir = Some("file:/root/testdata/sf0.001"), timeCol = "event_id")
    assert(db.series("orders").df.count() > 0)
    assert(db.series("no_such_table").df.count() == 0)
  }

  test("a corpus ts table resolved through the facade is immediately queryable") {
    // The events table stores `ts` (type varies by corpus generation) and no
    // `time` — the facade must attach the same typed boundary Tsdb.events
    // uses, or every query on the resolved series dies on the missing column.
    val db = new UtsDb(spark, dir = Some("/root/testdata/sf0.001"))
    val s = db.series("events")
    val viaFacade = s.query(UtsQuery(Seq("n" -> CountM()), group = AnyGroup))
      .head().getLong(0)
    val direct = Tsdb.events(spark, "/root/testdata/sf0.001")
      .query(UtsQuery(Seq("n" -> CountM()), group = AnyGroup)).head().getLong(0)
    assert(viaFacade == direct && viaFacade > 0, s"$viaFacade vs $direct")
    // The typed raw bound must also ride along (scan-prunable retention).
    assert(s.rawTimeNs.contains("ts"))
  }
}
