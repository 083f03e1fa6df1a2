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
}
