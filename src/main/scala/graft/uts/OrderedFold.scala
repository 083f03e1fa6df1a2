package graft.uts

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** The reference's `reduce(fn, initial)` — a sequential, insertion-ordered
  * left-fold over the bin's points (`/root/reference/uts.ts:416-434,578-580`,
  * the primitive its `max`/`min`/`last`/`sum`/`count` are built on) — as a
  * distributed Spark `Aggregator`.
  *
  * An arbitrary non-commutative fold cannot be partial-aggregated, so the
  * buffer gathers `(t, seq, payload)` stamps, `merge` concatenates, and
  * `finish` sorts once and folds in (t, seq) order — (ts, tiebreak) order ≡
  * insertion order in every reference test (SURVEY.md Q4).
  *
  * The payload is generic, like the reference's (`uts.ts:416-434` folds
  * arbitrary row values): [[fold]] takes any encodable `V` — fold structs,
  * strings, arrays — with [[foldDouble]] as the common numeric shorthand.
  *
  * Scale contract (enforced, not just documented): state is O(group size),
  * so every fold carries a `maxGroupRows` bound (default
  * [[DefaultMaxGroupRows]]) and FAILS LOUD — with the offending group's
  * buffered time range in the message — the moment one group buffers past
  * it, instead of OOMing an executor mid-shuffle at 100 TB. Use only on
  * bounded groups — interval bins, per-key windows — never a global fold
  * over an unbounded table; the mergeable metric algebra in [[Metric]]
  * covers every built-in aggregate without buffering.
  */
object OrderedFold {

  /** Default per-group row bound: 2²⁰ stamps ≈ tens of MB of kryo buffer —
    * far above any sane bin, far below an executor heap.
    */
  val DefaultMaxGroupRows: Long = 1L << 20

  final case class Stamped[V](t: Long, seq: Long, v: V)

  /** Buffer with its size tracked inline: List.length is O(n) and reduce
    * runs per row, so the guard needs the count carried, not recomputed.
    * (Public because encoder resolution rejects non-public buffer classes.)
    */
  final case class GroupBuf[V](n: Long, items: List[Stamped[V]])

  private def guard[V](n: Long, maxRows: Long, items: List[Stamped[V]]): Unit =
    if (n > maxRows) {
      val ts = items.iterator.map(_.t)
      val (lo, hi) = ts.foldLeft((Long.MaxValue, Long.MinValue)) {
        case ((a, b), t) => (math.min(a, t), math.max(b, t))
      }
      throw new IllegalStateException(
        s"OrderedFold group exceeded maxGroupRows=$maxRows (buffered time range " +
          s"[$lo, $hi]): ordered folds buffer O(group size) — bound the group " +
          "(interval bins, per-key windows) or raise maxGroupRows explicitly")
    }

  private final class FoldAgg[V, B, O](
      z: B,
      step: (B, V) => B,
      done: B => O,
      outEnc: Encoder[O],
      maxRows: Long)
    extends Aggregator[Stamped[V], GroupBuf[V], O] with Serializable {
    def zero: GroupBuf[V] = GroupBuf(0L, Nil)
    def reduce(buf: GroupBuf[V], a: Stamped[V]): GroupBuf[V] = {
      val next = GroupBuf(buf.n + 1, a :: buf.items)
      guard(next.n, maxRows, next.items)
      next
    }
    def merge(b1: GroupBuf[V], b2: GroupBuf[V]): GroupBuf[V] = {
      val next = GroupBuf(b1.n + b2.n, b1.items ::: b2.items)
      guard(next.n, maxRows, next.items)
      next
    }
    def finish(buf: GroupBuf[V]): O =
      done(buf.items.sortBy(s => (s.t, s.seq)).foldLeft(z)((acc, s) => step(acc, s.v)))
    def bufferEncoder: Encoder[GroupBuf[V]] = Encoders.kryo[GroupBuf[V]]
    def outputEncoder: Encoder[O] = outEnc
  }

  /** Ordered fold of an arbitrary (product-encodable) payload column:
    * `fold[String, String, String]("", _ + _, identity, Encoders.STRING)(
    *    col("time"), col("event_id"), col("word"))`.
    */
  def fold[V: TypeTag, B, O](z: B, step: (B, V) => B, done: B => O, outEnc: Encoder[O],
      maxGroupRows: Long = DefaultMaxGroupRows)(
      t: Column, seq: Column, v: Column): Column = {
    require(maxGroupRows > 0, s"maxGroupRows must be positive, got $maxGroupRows")
    udaf(new FoldAgg[V, B, O](z, step, done, outEnc, maxGroupRows),
      Encoders.product[Stamped[V]]).apply(t, seq, v)
  }

  /** Ordered fold of a double column to a double, as an aggregate Column:
    * `foldDouble(0.0, (acc, v) => ...)(col("time"), col("event_id"), col("value"))`.
    */
  def foldDouble(z: Double, step: (Double, Double) => Double,
      maxGroupRows: Long = DefaultMaxGroupRows)(
      t: Column, seq: Column, v: Column): Column =
    fold[Double, Double, Double](z, step, identity, Encoders.scalaDouble, maxGroupRows)(
      t, seq, v)

  /** [[Metric]] adapter so a user fold drops into `UtsQuery.metrics` beside
    * the built-ins — the reference's third-party `Aggregate` surface
    * (uts.ts:386-396). NULL values are SKIPPED, the SQL-aggregate
    * convention every built-in [[Metric]] follows (the uts data model makes
    * missing columns NULL, so a primitive-encoded fold would crash on the
    * first absent value; the reference's NaN-poisoning fold lives in
    * [[Quirk]], opt-in).
    */
  def metric(c: String, z: Double, step: (Double, Double) => Double,
      maxGroupRows: Long = DefaultMaxGroupRows): Metric = {
    // Hoisted OUTSIDE the anonymous Metric: a lambda written inside it would
    // close over the (non-serializable) anonymous instance and fail task
    // serialization; this one captures only `step`.
    val nullSkipping: (Double, Option[Double]) => Double =
      (acc, v) => v.fold(acc)(x => step(acc, x))
    new Metric {
      def agg(ord: OrderCtx): Column =
        fold[Option[Double], Double, Double](
          z, nullSkipping, identity, Encoders.scalaDouble, maxGroupRows)(
          ord.time, ord.seq, org.apache.spark.sql.functions.col(c))
      def emptyValue: Option[org.apache.spark.sql.types.DataType => Column] = None
    }
  }

  /** The reference's per-point `map(fn)` over ARBITRARY lambdas
    * (`uts.ts:562-571`, its `Mapper` aggregate): apply `fn` to each point's
    * payload in (t, seq) order and emit the ordered result list. Column
    * expressions ([[MapCol]]) cover expressible projections — this is the
    * escape hatch for genuine closures, built on the same stamped buffer as
    * [[fold]], with the same bounded-group scale caveat. `outEnc` comes from
    * `spark.implicits` (e.g. `newSequenceEncoder`).
    */
  def mapFn[V: TypeTag, O](fn: V => O, outEnc: Encoder[Seq[O]],
      maxGroupRows: Long = DefaultMaxGroupRows)(
      t: Column, seq: Column, v: Column): Column =
    fold[V, List[O], Seq[O]](Nil, (acc, x) => fn(x) :: acc, _.reverse, outEnc,
      maxGroupRows)(t, seq, v)

  /** [[Metric]] adapter for [[mapFn]] — the reference's `map(fn)` as a
    * packaged metric beside `MapCol`: empty bins report an empty list, like
    * the reference's `Mapper` (fresh instance per empty bin ⇒ `[]`).
    */
  def mapMetric[V: TypeTag, O](c: String, fn: V => O, outEnc: Encoder[Seq[O]],
      maxGroupRows: Long = DefaultMaxGroupRows): Metric =
    new Metric {
      def agg(ord: OrderCtx): Column =
        mapFn(fn, outEnc, maxGroupRows)(ord.time, ord.seq,
          org.apache.spark.sql.functions.col(c))
      def emptyValue: Option[org.apache.spark.sql.types.DataType => Column] =
        Some(dt => org.apache.spark.sql.functions.array().cast(dt))
    }
}
