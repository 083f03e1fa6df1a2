package graft.uts

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Comparator operators mirroring the reference's `BinaryOperator`
  * (`/root/reference/uts.ts:217`: `">" | "<" | "="`).
  */
sealed trait Cmp
object Cmp {
  case object Gt extends Cmp
  case object Lt extends Cmp
  case object Eq extends Cmp
}

/** Boolean filter tree over comparators. [[Pred]] is the leaf; [[Or]] the
  * disjunction node. The reference surface is AND-only (uts.ts:308-319
  * folds a predicate LIST through `&&`), so a query's `where` stays a
  * conjunction of filters — but each conjunct may now be a disjunction of
  * sub-trees, which the reference cannot express at all. Everything
  * compiles to ONE `Column` consumed by a single `filter`, so Catalyst
  * sees a plain boolean expression: conjuncts still split and push to the
  * scan individually, and a disjunction whose alternatives share a column
  * can still prune row groups via min/max stats.
  */
sealed trait Filter {
  def toColumn: Column
}

/** One `{is, than}` comparator on a column (uts.ts:223-226, eval at
  * uts.ts:296-306). A missing column evaluates to `false` in the reference
  * (uts.ts:297); SQL three-valued logic gives the same result natively,
  * because `NULL > v` is not true and a `filter` drops non-true rows —
  * and under [[Or]] a NULL alternative still lets a TRUE sibling keep the
  * row (`NULL OR TRUE = TRUE`), exactly the eval-each-then-OR result the
  * reference's per-comparator `false` would produce.
  */
final case class Pred(col: String, cmp: Cmp, than: Any) extends Filter {
  def toColumn: Column = cmp match {
    case Cmp.Gt => column(col) > lit(than)
    case Cmp.Lt => column(col) < lit(than)
    case Cmp.Eq => column(col) === lit(than)
  }
}

/** OR-of-alternatives; alternatives may themselves be [[Or]] trees. The
  * empty disjunction keeps nothing (the OR identity), mirroring
  * [[Pred.conj]]'s keep-everything for the empty conjunction. */
final case class Or(alts: Seq[Filter]) extends Filter {
  def toColumn: Column =
    alts.map(_.toColumn).reduceOption(_ || _).getOrElse(lit(false))
}

object Pred {
  def gt(col: String, v: Any): Pred = Pred(col, Cmp.Gt, v)
  def lt(col: String, v: Any): Pred = Pred(col, Cmp.Lt, v)
  def eq(col: String, v: Any): Pred = Pred(col, Cmp.Eq, v)

  /** OR-of-alternatives — the disjunction surface the reference omits. */
  def disj(alts: Filter*): Filter = Or(alts)

  /** AND-of-all conjunction (uts.ts:311-319); empty list ⇒ keep everything. */
  def conj(preds: Seq[Filter]): Column =
    preds.map(_.toColumn).reduceOption(_ && _).getOrElse(lit(true))
}

/** Grouping spec. `AnyGroup` (uts.ts:153-162) emits one global bin.
  * `IntervalGroup` (uts.ts:103-147) is tumbling windows of `widthMs` ms,
  * END-ALIGNED at `nowMs` (not epoch-aligned like Spark's `window()`):
  * bucket `i = floor((now − t) / width)` covers `(now−(i+1)·w, now−i·w]`,
  * emitted newest-first. `fill=true` zero-fills empty bins (uts.ts:141-145).
  */
sealed trait Grouper
case object AnyGroup extends Grouper
final case class IntervalGroup(widthMs: Long, fill: Boolean, nowMs: Long) extends Grouper
/** Group by arbitrary columns — our distributed generalization of the
  * reference's single-bin grouper (it has no categorical GROUP BY; §2.4).
  */
final case class ColumnGroup(cols: Seq[String]) extends Grouper

/** Ordering context for order-sensitive metrics (`last`, `map`, folds).
  * The reference relies on insertion order (uts.ts:275-278 appends); we make
  * it explicit: time column + a sequence tiebreak (e.g. `event_id`).
  */
final case class OrderCtx(time: Column, seq: Column) {
  /** Lexicographic (time, seq) ordering key — structs compare field-wise. */
  def key: Column = struct(time, seq)
}

/** Metric algebra — each metric knows its Spark aggregate expression and the
  * value an empty (zero-filled) bin reports (quirks Q2/Q9 in SURVEY.md §1.4).
  *
  * Execution model note: the reference pushes points one at a time into
  * per-bin `Aggregate` instances (uts.ts:38-47) with no merge step (single
  * threaded). All metrics below are expressed as Spark built-in aggregates,
  * which already carry partial/final (map-side combine) semantics — the
  * distributed generalization the reference lacks.
  */
trait Metric {
  /** Aggregate expression, evaluated inside `groupBy(...).agg(...)`. */
  def agg(ord: OrderCtx): Column

  /** Value a zero-filled empty bin reports, given the aggregated column's
    * data type; `None` leaves SQL NULL (our standard-semantics decision for
    * min/max/last — SURVEY.md Q1/Q4).
    */
  def emptyValue: Option[DataType => Column]
}

/** Arithmetic mean skipping missing values; `0` when no value is present
  * (uts.ts:436-456, quirk Q2 replicated via coalesce).
  */
final case class Mean(c: String) extends Metric {
  def agg(ord: OrderCtx): Column = coalesce(avg(column(c)), lit(0.0))
  def emptyValue = Some(dt => lit(0.0).cast(dt))
}

/** Sum with standard null-skipping (decision Q3-S; the reference's
  * NaN-poisoning at uts.ts:622-624 is unobservable in its own tests);
  * `0` on empty, matching the reference's fold seed.
  */
final case class SumM(c: String) extends Metric {
  def agg(ord: OrderCtx): Column = coalesce(sum(column(c)), lit(0))
  def emptyValue = Some(dt => lit(0).cast(dt))
}

/** `count()` / `count(col)` — all points vs points having the column
  * (uts.ts:631-641); SQL `count(col)` is null-skipping, an exact match.
  */
final case class CountM(c: Option[String] = None) extends Metric {
  def agg(ord: OrderCtx): Column = c.map(n => count(column(n))).getOrElse(count(lit(1)))
  def emptyValue = Some(dt => lit(0L).cast(dt))
}

/** Standard max (decision Q1-S: the reference's fold-from-0 at uts.ts:592-594
  * is a bug-shaped simplification; we return NULL on empty).
  */
final case class MaxM(c: String) extends Metric {
  def agg(ord: OrderCtx): Column = max(column(c))
  def emptyValue = None
}

/** Standard min (decision Q1-S, see [[MaxM]]; uts.ts:599-601). */
final case class MinM(c: String) extends Metric {
  def agg(ord: OrderCtx): Column = min(column(c))
  def emptyValue = None
}

/** Value of the column on the last point in (time, seq) order — the
  * reference's insertion-order `last` (uts.ts:615-617, quirk Q4: ts order ≡
  * insertion order in every reference test). `max_by` over a struct key keeps
  * this a single mergeable aggregate (no window + second shuffle).
  */
final case class Last(c: String) extends Metric {
  def agg(ord: OrderCtx): Column = max_by(column(c), ord.key)
  def emptyValue = None
}

/** Ordered list of the column's values within the bin — the reference's
  * `map('col')` (uts.ts:398-414, 562-571). `collect_list` alone has no order
  * guarantee under shuffle, so we collect `(time, seq, value)` structs and
  * sort before projecting — deterministic at the cost of a per-group buffer
  * (documented scale caveat: bound your groups; at 100 TB use interval bins,
  * never a global map).
  */
final case class MapCol(c: String) extends Metric {
  def agg(ord: OrderCtx): Column =
    transform(
      array_sort(collect_list(struct(ord.time.as("t"), ord.seq.as("s"), column(c).as("v")))),
      x => x.getField("v"))
  def emptyValue = Some(dt => array().cast(dt))
}

/** Escape hatch: any caller-supplied aggregate Column (the Spark analogue of
  * the reference's third-party `Aggregate` interface, uts.ts:386-396).
  */
final case class AggExpr(e: Column, fill: Option[DataType => Column] = None) extends Metric {
  def agg(ord: OrderCtx): Column = e
  def emptyValue = fill
}

/** OPT-IN replicas of the reference's fold-quirk aggregates, for callers
  * porting code that depends on them (our default [[MaxM]]/[[MinM]]/[[SumM]]
  * use standard SQL semantics — decisions Q1-S/Q3-S in SURVEY.md §1.4).
  *
  * The reference builds these on `reduce(fn, 0)` over `pt.get(column)`
  * (uts.ts:592-601, 622-624): the seed 0 caps `min` at ≤ 0 and floors `max`
  * at ≥ 0, and a point MISSING the column makes `fn` see `undefined`, which
  * poisons the whole fold to NaN (`Math.max(undefined, x)` and
  * `x + undefined` are both NaN). Both behaviors replicate here: missing ⇒
  * NaN via the count mismatch, seed 0 via the greatest/least clamp; empty
  * bins report the bare seed, 0 — all mergeable aggregates, no fold buffer.
  */
object Quirk {
  import org.apache.spark.sql.{functions => F}

  /** A bin is poisoned when any point misses the column (count mismatch) OR
    * any value is NaN: Spark ORDERS NaN as the largest double, so `F.min`
    * would silently skip NaNs where the reference's `Math.min(NaN, x)`
    * poisons the fold — `isnan(max(c))` is true iff any value is NaN and
    * restores that. (`F.max`/`F.sum` happen to propagate NaN on their own;
    * routing all three through one predicate keeps the replicas uniform.)
    */
  private def poisoned(c: String): Column =
    F.count(lit(1)) =!= F.count(column(c)) ||
      coalesce(isnan(F.max(column(c)).cast("double")), lit(false))

  /** `Analysis.max` (uts.ts:592-594): fold `Math.max` from 0. */
  def max(c: String): Metric = AggExpr(
    when(poisoned(c), lit(Double.NaN))
      .otherwise(greatest(coalesce(F.max(column(c)).cast("double"), lit(0.0)), lit(0.0))),
    Some(dt => lit(0.0).cast(dt)))

  /** `Analysis.min` (uts.ts:599-601): fold `Math.min` from 0 — always ≤ 0. */
  def min(c: String): Metric = AggExpr(
    when(poisoned(c), lit(Double.NaN))
      .otherwise(least(coalesce(F.min(column(c)).cast("double"), lit(0.0)), lit(0.0))),
    Some(dt => lit(0.0).cast(dt)))

  /** `Analysis.sum` (uts.ts:622-624): `sum + pt.get(col)` from 0 — one
    * missing value poisons the bin's sum to NaN.
    */
  def sum(c: String): Metric = AggExpr(
    when(poisoned(c), lit(Double.NaN))
      .otherwise(coalesce(F.sum(column(c)).cast("double"), lit(0.0))),
    Some(dt => lit(0.0).cast(dt)))
}
