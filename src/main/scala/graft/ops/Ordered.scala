package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Deterministic total order for small "report" outputs (near-dup pairs,
  * top-k lists, confusion matrices) — and for per-document GATE outputs,
  * where the total order exists only for the oracle's hash compare.
  *
  * A plain `orderBy` compiles to a range sort whose boundary-sampling pass
  * executes the child plan a second time — for a pipeline whose output is
  * small relative to its input (a pair scan emitting a few hundred matches,
  * a narrow per-document projection), that doubles the whole query.
  * Shuffling the result into one partition and sorting there executes the
  * child once. Only for outputs that fit one task comfortably (reports,
  * gate-scale doc projections); at 100 TB a row-per-document output drops
  * the global sort entirely (it is a gate artifact, not a semantic
  * requirement — use `sortWithinPartitions` if write locality matters).
  */
object Ordered {
  def smallResult(df: DataFrame, cols: String*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols.map(col): _*)
}
