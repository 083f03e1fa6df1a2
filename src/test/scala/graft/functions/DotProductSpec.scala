package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfns.VectorFunctions

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("dot kernel matches the HOF formulation on random vectors") {
    val rnd = new scala.util.Random(5)
    val df = (0 until 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat()), Array.fill(64)(rnd.nextFloat()))
    }.toDF("id", "a", "b")
    val hof = df.select(
      aggregate(
        zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("d")).collect().map(_.getDouble(0))
    val kernel = df.select(
      VectorFunctions.dot(col("a").cast("array<double>"), col("b").cast("array<double>")).as("d"))
      .collect().map(_.getDouble(0))
    // Same sequential fold — bit-identical, not merely close.
    assert(hof.toSeq == kernel.toSeq)
  }

  test("dot_product registers as a SQL function") {
    VectorFunctions.register(spark)
    val out = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head().getDouble(0)
    assert(out == 11.0)
  }

  test("null and length-mismatch behavior") {
    val out = spark.sql(
      """SELECT dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS a,
        |       dot_product(array(1.0d, 2.0d, 9.0d), array(3.0d, 4.0d)) AS b""".stripMargin)
      .head()
    assert(out.isNullAt(0))
    // Length mismatch is NULL (the zip_with HOF's null-pad semantics): a
    // truncated min-length partial sum would be a plausible-looking wrong
    // similarity for mixed-dimension corpora.
    assert(out.isNullAt(1))
  }

  test("srpBandSigs kernel is bit-identical to the per-bit Column formulation") {
    // The mixer restated independently (srpWeight's documented recipe) so
    // the equality check does not share code with the kernel under test.
    def srpWeight(bit: Int, d: Int): Double = {
      val h1 = ((bit.toLong * 65599L + d.toLong + 1L) * 2654435761L) & 0xffffffffL
      val h2 = (((h1 >> 16) + h1) * 2246822519L) & 0xffffffffL
      if ((h2 >> 31) == 1L) 1.0 else -1.0
    }
    val rnd = new scala.util.Random(17)
    val dim = 24
    val df = (0 until 80).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    }.toDF("id", "v")
    for ((numBits, bands) <- Seq((48, 4), (55, 5), (30, 3), (62, 2))) {
      val bandBits = numBits / bands
      // The r18 formulation this kernel replaces: one dot node per bit,
      // each with a dim-element ±1 weight literal.
      val colSigs = (0 until bands).map { b =>
        (0 until bandBits).map { k =>
          val j = b * bandBits + k
          val w = typedlit((0 until dim).map(d => srpWeight(j, d)))
          when(VectorFunctions.dot(col("v"), w) >= 0, lit(1L << k)).otherwise(lit(0L))
        }.reduce(_ + _)
      }
      val expected = df.orderBy("id")
        .select(array(colSigs: _*).as("s")).collect().map(_.getSeq[Long](0))
      val got = df.orderBy("id")
        .select(VectorFunctions.srpBandSigs(col("v"), dim, numBits, bands).as("s"))
        .collect().map(_.getSeq[Long](0))
      assert(expected.toSeq == got.toSeq, s"geometry ($numBits, $bands)")
    }
    // Degenerate inputs: wrong length or a NULL element → NULL signature
    // array (the row drops out of the band explode) — strictly better than
    // the literal formulation's all-zero signature that bucketed every
    // malformed row together.
    val weird = spark.sql(
      """SELECT * FROM VALUES (array(1.0d, 2.0d)), (CAST(NULL AS ARRAY<DOUBLE>)),
        |  (array(1.0d, CAST(NULL AS DOUBLE), 3.0d)) AS t(v)""".stripMargin)
    val sigs = weird.select(
      VectorFunctions.srpBandSigs(col("v"), 3, 12, 2).as("s")).collect()
    assert(sigs.forall(_.isNullAt(0)))
    // ...and a valid dim-3 vector still signs.
    val ok = Seq(Tuple1(Array(1.0, -2.0, 0.5))).toDF("v")
      .select(VectorFunctions.srpBandSigs(col("v"), 3, 12, 2).as("s")).head()
    assert(!ok.isNullAt(0) && ok.getSeq[Long](0).length == 2)
  }
}
