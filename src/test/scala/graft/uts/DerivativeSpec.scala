package graft.uts

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Golden port of the reference's derivative cases (test.js:96-136) plus
  * distributed-shape cases the single-threaded reference cannot express.
  */
class DerivativeSpec extends SparkSpec {
  import spark.implicits._

  val now = 1000L
  def b: DataFrame =
    Seq((600L, 0.0), (700L, 1.0), (800L, 4.0), (900L, 9.0), (1000L, 16.0))
      .toDF("time", "my_col1")

  private def run(df: DataFrame, interval: Long): Seq[(Long, Double)] =
    Derivative(df, "my_col1", interval)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))

  test("derivative I=100 (test.js:96-107)") {
    assert(run(b, 100) == Seq((700L, 1.0), (800L, 3.0), (900L, 5.0), (1000L, 7.0)))
  }

  test("derivative I=200 (test.js:109-118)") {
    assert(run(b, 200) == Seq((800L, 4.0), (1000L, 12.0)))
  }

  test("derivative I=500 flushes the partial interval at the last ts (test.js:120-128)") {
    assert(run(b, 500) == Seq((1000L, 16.0)))
  }

  test("derivative of empty series is empty (test.js:130-136)") {
    val q = Seq.empty[(Long, Double)].toDF("time", "my_col1")
    assert(run(q, 500) == Seq.empty)
  }

  test("derivative gap-fills empty grid slots with 0 (uts.ts:481-483)") {
    // Points at 0,100,500: grid anchors at 0, I=100 → emissions at
    // 100(Δ1), 200(0), 300(0), 400(0), 500(Δ4 flushed at last ts = grid).
    val df = Seq((0L, 0.0), (100L, 1.0), (500L, 5.0)).toDF("time", "my_col1")
    assert(run(df, 100) ==
      Seq((100L, 1.0), (200L, 0.0), (300L, 0.0), (400L, 0.0), (500L, 4.0)))
  }

  test("single point emits one zero delta at its own time") {
    val df = Seq((400L, 7.0)).toDF("time", "my_col1")
    assert(run(df, 100) == Seq((400L, 0.0)))
  }

  test("partitioned derivative computes independent grids per key") {
    val df = Seq(
      ("u1", 600L, 0.0), ("u1", 700L, 1.0), ("u1", 800L, 4.0),
      ("u2", 650L, 10.0), ("u2", 850L, 30.0)
    ).toDF("user", "time", "my_col1")
    val out = Derivative(df, "my_col1", 100, partitionCols = Seq("user"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out == Seq(
      ("u1", 700L, 1.0), ("u1", 800L, 3.0),
      ("u2", 750L, 0.0), ("u2", 850L, 20.0)))
  }

  test("points form nests the grid as the reference's array-of-points value") {
    // Same numbers as the exploded form, shaped like the reference's
    // Aggregate output (uts.ts:500-506): a time-ordered points list.
    val out = Derivative.points(b, "my_col1", 100)
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out == Seq((700L, 1.0), (800L, 3.0), (900L, 5.0), (1000L, 7.0)))
    val perKey = Derivative.points(
      Seq(("u1", 600L, 0.0), ("u1", 700L, 1.0), ("u2", 650L, 10.0), ("u2", 850L, 30.0))
        .toDF("user", "time", "my_col1"),
      "my_col1", 100, partitionCols = Seq("user"))
      .collect().map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1).length).toMap
    assert(perKey == Map("u1" -> 1, "u2" -> 2))
  }
}
