// Lives under org.apache.spark.sql because Expression-building blocks
// (AbstractDataType, ExpressionUtils.column) are private[sql] — the standard
// extension-point placement for custom Catalyst expressions.
package org.apache.spark.sql.graftfns

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * Why a custom Catalyst `Expression`: the declarative formulation
  * (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) is correct but its higher-order
  * functions have no whole-stage codegen — every element evaluates through the
  * interpreted expression tree, which made all-pairs similarity ~25× slower
  * than this primitive loop. Per the escalation ladder (compose built-ins →
  * custom Expression → custom operator), a scalar kernel like this is exactly
  * the custom-Expression case.
  *
  * Semantics match the HOF formulation (`aggregate(zip_with(a, b, _*_),
  * 0d, _+_)`) bit-for-bit: sequential left-to-right double accumulation;
  * NULL if either side is NULL, if the lengths differ (zip_with pads the
  * short side with NULL — a truncated partial sum would be a plausible-
  * looking WRONG similarity for mixed-dimension corpora), or if any element
  * is NULL. The DuckDB oracle's double-cast cosine reproduces the same fold.
  */
final case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var sum = 0.0
      var i = 0
      var hasNull = false
      while (i < n && !hasNull) {
        if (x.isNullAt(i) || y.isNullAt(i)) hasNull = true
        else { sum += x.getDouble(i) * y.getDouble(i); i += 1 }
      }
      if (hasNull) null else java.lang.Double.valueOf(sum)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** `dot(a, b)` as a Column over two array<double> columns (cast float
    * arrays with `.cast("array<double>")` — the cast is codegen'd too).
    */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Register `dot_product` as a SQL function on an existing session, making
    * the kernel reachable from `spark.sql("SELECT dot_product(a, b) ...")`.
    * For cluster deployment, configure [[graft.GraftExtensions]] via
    * `spark.sql.extensions` instead — same builder, applied at session build.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "shingle_hashes", exprs => ShingleHashes(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "minhash_signature", exprs => MinHashSignature(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "bpe_run_count", exprs => BpeRunCount(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "rolling_fp", exprs => RollingFp(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "word_grams", exprs => WordGrams(exprs(0), exprs(1)), "scala_udf")
  }
}
