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
  * Scale caveat (documented, by design): state is O(group size). Use only on
  * bounded groups — interval bins, per-key windows — never a global fold over
  * an unbounded table; the mergeable metric algebra in [[Metric]] covers
  * every built-in aggregate without buffering.
  */
object OrderedFold {

  final case class Stamped[V](t: Long, seq: Long, v: V)

  private final class FoldAgg[V, B, O](
      z: B,
      step: (B, V) => B,
      done: B => O,
      outEnc: Encoder[O])
    extends Aggregator[Stamped[V], List[Stamped[V]], O] with Serializable {
    def zero: List[Stamped[V]] = Nil
    def reduce(buf: List[Stamped[V]], a: Stamped[V]): List[Stamped[V]] = a :: buf
    def merge(b1: List[Stamped[V]], b2: List[Stamped[V]]): List[Stamped[V]] = b1 ::: b2
    def finish(buf: List[Stamped[V]]): O =
      done(buf.sortBy(s => (s.t, s.seq)).foldLeft(z)((acc, s) => step(acc, s.v)))
    def bufferEncoder: Encoder[List[Stamped[V]]] = Encoders.kryo[List[Stamped[V]]]
    def outputEncoder: Encoder[O] = outEnc
  }

  /** Ordered fold of an arbitrary (product-encodable) payload column:
    * `fold[String, String, String]("", _ + _, identity, Encoders.STRING)(
    *    col("time"), col("event_id"), col("word"))`.
    */
  def fold[V: TypeTag, B, O](z: B, step: (B, V) => B, done: B => O, outEnc: Encoder[O])(
      t: Column, seq: Column, v: Column): Column =
    udaf(new FoldAgg[V, B, O](z, step, done, outEnc), Encoders.product[Stamped[V]])
      .apply(t, seq, v)

  /** Ordered fold of a double column to a double, as an aggregate Column:
    * `foldDouble(0.0, (acc, v) => ...)(col("time"), col("event_id"), col("value"))`.
    */
  def foldDouble(z: Double, step: (Double, Double) => Double)(
      t: Column, seq: Column, v: Column): Column =
    fold[Double, Double, Double](z, step, identity, Encoders.scalaDouble)(t, seq, v)

  /** [[Metric]] adapter so a user fold drops into `UtsQuery.metrics` beside
    * the built-ins — the reference's third-party `Aggregate` surface
    * (uts.ts:386-396). NULL values are SKIPPED, the SQL-aggregate
    * convention every built-in [[Metric]] follows (the uts data model makes
    * missing columns NULL, so a primitive-encoded fold would crash on the
    * first absent value; the reference's NaN-poisoning fold lives in
    * [[Quirk]], opt-in).
    */
  def metric(c: String, z: Double, step: (Double, Double) => Double): Metric = {
    // Hoisted OUTSIDE the anonymous Metric: a lambda written inside it would
    // close over the (non-serializable) anonymous instance and fail task
    // serialization; this one captures only `step`.
    val nullSkipping: (Double, Option[Double]) => Double =
      (acc, v) => v.fold(acc)(x => step(acc, x))
    new Metric {
      def agg(ord: OrderCtx): Column =
        fold[Option[Double], Double, Double](
          z, nullSkipping, identity, Encoders.scalaDouble)(
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
  def mapFn[V: TypeTag, O](fn: V => O, outEnc: Encoder[Seq[O]])(
      t: Column, seq: Column, v: Column): Column =
    fold[V, List[O], Seq[O]](Nil, (acc, x) => fn(x) :: acc, _.reverse, outEnc)(t, seq, v)

  /** [[Metric]] adapter for [[mapFn]] — the reference's `map(fn)` as a
    * packaged metric beside `MapCol`: empty bins report an empty list, like
    * the reference's `Mapper` (fresh instance per empty bin ⇒ `[]`).
    */
  def mapMetric[V: TypeTag, O](c: String, fn: V => O, outEnc: Encoder[Seq[O]]): Metric =
    new Metric {
      def agg(ord: OrderCtx): Column =
        mapFn(fn, outEnc)(ord.time, ord.seq, org.apache.spark.sql.functions.col(c))
      def emptyValue: Option[org.apache.spark.sql.types.DataType => Column] =
        Some(dt => org.apache.spark.sql.functions.array().cast(dt))
    }
}
