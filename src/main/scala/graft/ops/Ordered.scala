package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Deterministic total order for small "report" outputs (near-dup pairs,
  * top-k lists, confusion matrices).
  *
  * A plain `orderBy` compiles to a range sort whose boundary-sampling pass
  * executes the child plan a second time — for a pipeline whose output is
  * tiny relative to its input (a pair scan emitting a few hundred matches),
  * that doubles the whole query. Shuffling the (small) result into one
  * partition and sorting there executes the child once. Only for outputs
  * known to be report-sized; a big result wants the parallel range sort.
  */
object Ordered {
  def smallResult(df: DataFrame, cols: String*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols.map(col): _*)
}
