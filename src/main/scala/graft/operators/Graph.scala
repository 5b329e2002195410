package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph centrality over the trading network (SURVEY.md §2B).
  *
  * The reference's Lambda fan-out graph is static; the analytics analog
  * is a real iterative computation over a data-derived graph — the kind
  * of workload (PageRank, label propagation) that usually forces users
  * off SQL engines onto Pregel. Expressed here as a bounded DataFrame
  * loop with per-round materialization, like Dedup.nearDupComponents'
  * pointer jumping: each round is one join + one aggregate, both on the
  * node key, so the plan stays a pair of keyed exchanges per round at
  * any scale.
  */
object Graph {

  /** B51: supplier influence rank — PageRank over the symmetrized
    * customer↔supplier bipartite graph (an edge per distinct trading
    * pair), run a FIXED number of rounds in exact fixed-point integer
    * arithmetic: ranks live in millionths (1e6 = 1.0), each node
    * contributes `r div deg` to its neighbors, and the damping step is
    * `150000 + (Σ·85) div 100` — floor division end to end, so the
    * result is bit-identical in any engine regardless of join order,
    * partitioning, or float summation order (the reason textbook
    * float PageRank can never be hash-gated). Rank mass is bounded by
    * n·1e6, so a 64-bit sum never overflows below ~10^11 nodes.
    *
    * Scale: the adjacency (edge, degree) table is materialized ONCE and
    * reused every round; only the node-sized rank table moves per
    * round. Convergence is the consumer's choice of `iterations` —
    * fixed rounds keep the oracle expressible as chained CTEs.
    */
  def supplierRank(t: Tables, iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "rank needs at least one propagation round")
    // node ids: customers even (2k), suppliers odd (2k+1) — one bigint
    // key space, no string concat in the hot path
    val pairs = t.lineitem
      .select("l_orderkey", "l_suppkey")
      .join(t.orders.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .select(
        (col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")
      )
      .distinct()
    val edges = pairs.unionAll(pairs.select(col("dst").as("src"), col("src").as("dst")))
    val adj = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint() // computed once; rounds must not replay the fact join
    var ranks = adj.select(col("src").as("node")).distinct().withColumn("r", lit(1000000L))
    for (_ <- 1 to iterations) {
      ranks = ranks
        .join(adj, col("node") === col("src"))
        .select(col("dst"), expr("r div deg").as("contrib"))
        .groupBy("dst")
        .agg(sum(col("contrib")).as("s"))
        .select(col("dst").as("node"), expr("150000 + (s * 85) div 100").as("r"))
        .localCheckpoint() // cut the lineage: plan depth stays O(1) per round
    }
    ranks
      .filter(col("node") % 2 === 1)
      .select(expr("(node - 1) div 2").as("s_suppkey"), col("r").as("rank_units"))
      .orderBy("s_suppkey")
  }
}
