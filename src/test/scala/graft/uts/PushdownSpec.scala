package graft.uts

import graft.SparkSpec

/** Raw-time pushdown: queries on the derived ms `time` column must also emit
  * scan-prunable predicates on the stored `ts` column — whatever type the
  * corpus generation stored it as (epoch-ns Long or a parquet timestamp) —
  * and the redundant predicate must not change results.
  */
class PushdownSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("time predicates reach the parquet scan via the raw stored column") {
    val e = Tsdb.events(spark, dir)
    val now = e.df.agg(org.apache.spark.sql.functions.max("time")).head().getLong(0)
    val q = UtsQuery(
      Seq("n" -> CountM()),
      where = Seq(Pred.gt("time", now - 3600_000L)),
      group = AnyGroup)
    val plan = e.query(q).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan.take(2000))
    // Long corpus pushes GreaterThan(Equal)(ts,…); timestamp corpora push the
    // same bound as a timestamp literal (possibly inside a null-admitting Or).
    assert(plan.contains("GreaterThan(ts") || plan.contains("GreaterThanOrEqual(ts"),
      plan.take(2000))
  }

  test("conjunct-level time bounds still push with an Or in the where; Or itself never prunes") {
    val e = Tsdb.events(spark, dir)
    val now = e.df.agg(org.apache.spark.sql.functions.max("time")).head().getLong(0)
    // A disjunction beside a conjunct-level time bound: the bound must keep
    // emitting its raw-column scan predicate…
    val q = UtsQuery(
      Seq("n" -> CountM()),
      where = Seq(
        Pred.gt("time", now - 3600_000L),
        Pred.disj(Pred.eq("event_type", "click"), Pred.gt("value", 100.0))),
      group = AnyGroup)
    val plan = e.query(q).queryExecution.executedPlan.toString
    // The PushedFilters display truncates with the extra Or in the list, so
    // assert on the Filter node: the raw bound appears as `ts#N >= <lit>`
    // (Long corpora) or inside the null-admitting `isnull(ts#N) OR ts#N >=`
    // (timestamp corpora).
    assert("""ts#\d+ (as timestamp\)*)? *>=?""".r.findFirstIn(plan).isDefined &&
      (plan.contains("GreaterThan(ts") || plan.contains("GreaterThanOrEqual(ts") ||
        """ts#\d+ >= """.r.findFirstIn(plan).isDefined),
      plan.take(2000))
    // …while a time comparator INSIDE a disjunction must NOT emit one: it
    // does not bound the result set (the other alternative admits rows
    // outside it), so a raw bound would silently drop rows at the scan.
    val disjOnly = UtsQuery(
      Seq("n" -> CountM()),
      where = Seq(
        Pred.disj(Pred.gt("time", now - 3600_000L), Pred.eq("event_type", "click"))),
      group = AnyGroup)
    val got = e.query(disjOnly).head().getLong(0)
    val want = UtsSeries(e.df, "time", Some("event_id"), rawTimeNs = None)
      .query(disjOnly).head().getLong(0)
    assert(got == want && got > 0)
    // The disjunction admits click rows older than the bound — rows a
    // wrongly-emitted conjunctive raw bound would have dropped.
    val boundedOnly = e.query(UtsQuery(Seq("n" -> CountM()),
      where = Seq(Pred.gt("time", now - 3600_000L)))).head().getLong(0)
    assert(got > boundedOnly)
  }

  test("redundant raw predicate does not change results") {
    val e = Tsdb.events(spark, dir)
    val now = e.df.agg(org.apache.spark.sql.functions.max("time")).head().getLong(0)
    val where = Seq(Pred.gt("time", now - 86400_000L), Pred.lt("time", now - 3600_000L))
    val withRaw = e.query(UtsQuery(Seq("n" -> CountM()), where)).head().getLong(0)
    val withoutRaw = UtsSeries(e.df, "time", Some("event_id"), rawTimeNs = None)
      .query(UtsQuery(Seq("n" -> CountM()), where)).head().getLong(0)
    assert(withRaw == withoutRaw && withRaw > 0)
  }

  test("retention with raw bound matches plain retention") {
    val e = Tsdb.events(spark, dir)
    val now = e.df.agg(org.apache.spark.sql.functions.max("time")).head().getLong(0)
    val a = e.retain(7 * 86400_000L, now).df.count()
    val b = UtsSeries(e.df, "time", Some("event_id"))
      .retain(7 * 86400_000L, now).df.count()
    assert(a == b && a > 0)
  }
}
