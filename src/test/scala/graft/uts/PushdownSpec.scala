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
