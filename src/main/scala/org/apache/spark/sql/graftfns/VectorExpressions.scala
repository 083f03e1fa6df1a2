// Lives under org.apache.spark.sql because Expression-building blocks
// (AbstractDataType, ExpressionUtils.column) are private[sql] — the standard
// extension-point placement for custom Catalyst expressions.
package org.apache.spark.sql.graftfns

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

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

/** All `bands` signed-random-projection band signatures of an
  * `array<double>` vector in ONE fused loop — `numBits` hyperplane dot
  * products, sign bits packed `bandBits = numBits/bands` per long.
  * Hyperplane weights are ±1 from the two-round integer mixer
  * (`graft.ops.Similarity.srpWeight`'s recipe, inlined here so the kernel
  * owns its whole arithmetic), derived on the fly from (bit, dimension) —
  * no weight literals at all.
  *
  * Why a custom Expression (the [[DotProduct]] escalation rationale, one
  * rung further): the Column formulation builds `numBits` separate
  * dot-product nodes each carrying a `dim`-element literal array; at the
  * threshold-derived geometries (253 bits for threshold 0.9) the generated
  * consume-function exceeds janino's 64 KB method limit, so the WHOLE
  * stage falls back to interpreted eval — the hot signature pass of the
  * sub-quadratic pairs path running tree-walking per row. This kernel is
  * one compiled loop: O(numBits·dim) multiplies, constant bytecode size,
  * stays inside whole-stage codegen at any geometry.
  *
  * Semantics are BIT-IDENTICAL to the Column formulation for well-formed
  * vectors (same weight mixer, same sequential double fold per plane, same
  * `dot ≥ 0` sign rule, same bit packing) — a spec pins equality. The two
  * degenerate cases tighten: a vector whose length ≠ `dim`, or with a NULL
  * element, yields a NULL signature array (the row drops out of the band
  * explode) where the literal formulation silently gave every such row
  * signature 0 in every band — colliding all malformed rows into one
  * giant candidate bucket.
  */
final case class SrpBandSigs(child: Expression, dim: Int, numBits: Int, bands: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_band_sigs"
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    SrpBandSigs.compute(v.asInstanceOf[ArrayData], dim, numBits, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("sigs")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  org.apache.spark.sql.graftfns.SrpBandSigs.compute($v, $dim, $numBits, $bands);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBandSigs {
  def compute(v: ArrayData, dim: Int, numBits: Int, bands: Int): ArrayData = {
    require(dim >= 1 && bands >= 1 && numBits % bands == 0 &&
      numBits / bands >= 1 && numBits / bands <= 62,
      s"bad SRP geometry: dim=$dim numBits=$numBits bands=$bands")
    if (v.numElements() != dim) return null
    val bandBits = numBits / bands
    val x = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      if (v.isNullAt(d)) return null
      x(d) = v.getDouble(d)
      d += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var k = 0
      while (k < bandBits) {
        val j = b * bandBits + k
        var dot = 0.0
        var i = 0
        while (i < dim) {
          // srpWeight's two-round mixer, inlined: sign = top bit of h2.
          val h1 = ((j.toLong * 65599L + i.toLong + 1L) * 2654435761L) & 0xffffffffL
          val h2 = (((h1 >> 16) + h1) * 2246822519L) & 0xffffffffL
          dot += (if ((h2 >> 31) == 1L) x(i) else -x(i))
          i += 1
        }
        if (dot >= 0) sig |= 1L << k
        k += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }
}

object VectorFunctions {
  /** `dot(a, b)` as a Column over two array<double> columns (cast float
    * arrays with `.cast("array<double>")` — the cast is codegen'd too).
    */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** All SRP band signatures of an array<double> vector as `array<long>`
    * (length `bands`) — see [[SrpBandSigs]].
    */
  def srpBandSigs(v: Column, dim: Int, numBits: Int, bands: Int): Column =
    ExpressionUtils.column(
      SrpBandSigs(ExpressionUtils.expression(v), dim, numBits, bands))

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
