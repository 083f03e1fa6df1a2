package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftfns.{BpeRunCount, DotProduct, MinHashSignature, RollingFp, ShingleHashes, SimHash64, StopHits, WordGrams}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions at session build. Enable with
  * `--conf spark.sql.extensions=graft.GraftExtensions` — the standard way to
  * ship custom expressions to every session on a cluster (no per-session
  * registration code). For an already-built session, use
  * [[org.apache.spark.sql.graftfns.VectorFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, clazz: Class[_], builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder))
    inject("dot_product", classOf[DotProduct], es => DotProduct(es(0), es(1)))
    inject("shingle_hashes", classOf[ShingleHashes], es => ShingleHashes(es(0), es(1)))
    inject("minhash_signature", classOf[MinHashSignature], es => MinHashSignature(es(0), es(1)))
    inject("simhash64", classOf[SimHash64], es => SimHash64(es(0)))
    inject("bpe_run_count", classOf[BpeRunCount], es => BpeRunCount(es(0)))
    inject("rolling_fp", classOf[RollingFp], es => RollingFp(es(0)))
    inject("word_grams", classOf[WordGrams], es => WordGrams(es(0), es(1)))
    inject("stop_hits", classOf[StopHits], es => StopHits(es(0)))
  }
}
