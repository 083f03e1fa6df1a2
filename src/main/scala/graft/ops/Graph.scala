package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Materialize.NarrowSyntax

/** Graph analytics over edge relations (the kNN graph, near-dup pair sets).
  *
  * Everything here is INTEGER-EXACT by design: ranks are scaled longs and
  * every update is integer multiply/floor-divide/sum — deterministic under
  * any partial-aggregation order and bit-identical across engines, so a
  * DuckDB oracle can re-derive a fixed-point iteration verbatim (a
  * floating-point PageRank's sums differ at the ulp per partition order,
  * which is exactly the class of nondeterminism the correctness gates
  * exclude everywhere else in this repo).
  */
object Graph {

  /** PageRank with integer arithmetic: `iterations` synchronous power
    * steps of `r'(v) = ⌊3·S/(20·n)⌋ + Σ_{u→v} ⌊r(u)·17/(20·deg(u))⌋` —
    * the classic 0.85 damping as the exact rational 17/20, all mass in
    * units of `S = 10¹²` so floors lose at most deg units per node per
    * step (deterministically; dangling nodes' mass evaporates, the
    * standard simplification, documented rather than redistributed).
    *
    * Scale shape: the Pregel loop as `iterations` join+aggregate rounds —
    * contributions are an equality join of the rank frame against the
    * (edge, out-degree) relation, shuffled by dst, summed. Rounds CHAIN in
    * one lazy plan (each rank frame is consumed exactly once by the next
    * round, so nothing replays — unlike [[Dedup.connectedComponents]]'
    * convergence loop, whose per-round actions need per-round cuts);
    * a `localCheckpoint` every 8th round bounds plan depth for large
    * iteration counts without paying a per-round execution.
    * The one driver-side scalar is `n` (node count — the teleport term's
    * denominator). Long overflow is impossible by construction:
    * per-edge products are ≤ S·17 and per-node sums are bounded by the
    * total mass.
    *
    * `nodes` must be one row per node id; `edges` directed `(src, dst)`.
    * Output: `(id, pr)` with `pr` the exact scaled-long rank.
    */
  def pageRankInt(
      nodes: DataFrame,
      edges: DataFrame,
      iterations: Int,
      idCol: String = "id",
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    val S = 1000000000000L
    val ns = nodes.select(col(idCol).cast("long").as("id")).narrowCheckpoint()
    val n = ns.count()
    require(n > 0, "pageRankInt needs at least one node")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val edgesDeg = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .narrowCheckpoint()
    val tele = (3L * S) / (20L * n)
    var ranks = ns.select(col("id"), lit(S / n).as("r"))
    for (i <- 1 to iterations) {
      val contribs = edgesDeg
        .join(ranks.select(col("id").as("src"), col("r")), "src")
        .select(col("dst").as("id"),
          expr("(r * 17) div (20 * deg)").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__m"))
      ranks = ns
        .join(contribs, Seq("id"), "left")
        .select(col("id"), (lit(tele) + coalesce(col("__m"), lit(0L))).as("r"))
      if (i % 8 == 0 && i < iterations) ranks = ranks.narrowCheckpoint()
    }
    ranks.select(col("id"), col("r").as("pr"))
  }
}
