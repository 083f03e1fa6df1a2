package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graftfns.DotProduct

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions at session build. Enable with
  * `--conf spark.sql.extensions=graft.GraftExtensions` — the standard way to
  * ship custom expressions to every session on a cluster (no per-session
  * registration code). For an already-built session, use
  * [[org.apache.spark.sql.graftfns.VectorFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
  }
}
