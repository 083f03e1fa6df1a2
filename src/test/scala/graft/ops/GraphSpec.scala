package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer-exact PageRank: the distributed recurrence must equal a naive
  * single-threaded evaluation of the SAME integer formula, dangling and
  * isolated nodes behave as documented, and iteration 0 is the uniform
  * floor split.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000000L

  // 1 -> 2, 1 -> 3, 2 -> 3, 3 -> 1; node 4 isolated (keeps only teleport
  // mass after the first step), node 3 is the hub.
  private val nodeIds = Seq(1L, 2L, 3L, 4L)
  private val edgeSeq = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))

  private def naive(iters: Int): Map[Long, Long] = {
    val n = nodeIds.size
    val deg = edgeSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val tele = (3L * S) / (20L * n)
    var r = nodeIds.map(_ -> S / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edgeSeq.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => (r(u) * 17L) / (20L * deg(u)) }.sum).toMap
      r = nodeIds.map(v => v -> (tele + contrib.getOrElse(v, 0L))).toMap
    }
    r
  }

  private def run(iters: Int): Map[Long, Long] =
    Graph.pageRankInt(
      nodeIds.toDF("id"), edgeSeq.toDF("src", "dst"), iters)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap

  test("pageRankInt equals the naive integer recurrence at 0, 1, 3 and 9 iterations") {
    for (iters <- Seq(0, 1, 3, 9)) { // 9 crosses the every-8th checkpoint cut
      assert(run(iters) == naive(iters), s"iters=$iters")
    }
  }

  test("structure: the hub outranks its feeders; the isolated node holds only teleport mass") {
    val r = run(5)
    val tele = (3L * S) / (20L * nodeIds.size)
    assert(r(3L) > r(2L), r.toString)     // 3 receives from 1 and 2
    assert(r(4L) == tele, r.toString)     // isolated: teleport only
    assert(r(1L) > tele, r.toString)      // 1 receives the hub's full mass
  }
}
