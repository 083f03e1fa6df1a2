package graft.uts

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
  * Scale caveat (documented, by design): state is O(group size). Use only on
  * bounded groups — interval bins, per-key windows — never a global fold over
  * an unbounded table; the mergeable metric algebra in [[Metric]] covers
  * every built-in aggregate without buffering.
  */
object OrderedFold {

  final case class Stamped(t: Long, seq: Long, v: Double)

  private final class FoldAgg[B, O](
      z: B,
      step: (B, Double) => B,
      done: B => O,
      outEnc: Encoder[O])
    extends Aggregator[Stamped, List[Stamped], O] with Serializable {
    def zero: List[Stamped] = Nil
    def reduce(buf: List[Stamped], a: Stamped): List[Stamped] = a :: buf
    def merge(b1: List[Stamped], b2: List[Stamped]): List[Stamped] = b1 ::: b2
    def finish(buf: List[Stamped]): O =
      done(buf.sortBy(s => (s.t, s.seq)).foldLeft(z)((acc, s) => step(acc, s.v)))
    def bufferEncoder: Encoder[List[Stamped]] = Encoders.kryo[List[Stamped]]
    def outputEncoder: Encoder[O] = outEnc
  }

  /** Ordered fold of a double column to a double, as an aggregate Column:
    * `orderedFoldDouble(0.0, (acc, v) => ...)(col("time"), col("event_id"), col("value"))`.
    */
  def foldDouble(z: Double, step: (Double, Double) => Double)(
      t: Column, seq: Column, v: Column): Column =
    udaf(new FoldAgg[Double, Double](z, step, identity, Encoders.scalaDouble),
      Encoders.product[Stamped]).apply(t, seq, v)

  /** Generic buffer/finish variant (e.g. fold into a case-class accumulator). */
  def fold[B, O](z: B, step: (B, Double) => B, done: B => O, outEnc: Encoder[O])(
      t: Column, seq: Column, v: Column): Column =
    udaf(new FoldAgg[B, O](z, step, done, outEnc), Encoders.product[Stamped]).apply(t, seq, v)

  /** [[Metric]] adapter so a user fold drops into `UtsQuery.metrics` beside
    * the built-ins — the reference's third-party `Aggregate` surface
    * (uts.ts:386-396).
    */
  def metric(c: String, z: Double, step: (Double, Double) => Double): Metric =
    new Metric {
      def agg(ord: OrderCtx): Column = foldDouble(z, step)(ord.time, ord.seq, org.apache.spark.sql.functions.col(c))
      def emptyValue: Option[org.apache.spark.sql.types.DataType => Column] = None
    }
}
